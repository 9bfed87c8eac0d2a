"""Connected components over a near-duplicate pair list — the
transitive-closure step that turns pairwise dedup output (A~B, B~C)
into dedup CLUSTERS ({A,B,C} → representative A).

Min-label propagation: every node starts labeled with itself; each
iteration relabels a node to the minimum label in its neighborhood;
converged when an iteration changes nothing. Label monotonically
decreases, so termination is guaranteed in at most `diameter`
iterations — near-dup graphs are unions of small cliques-ish clusters,
so 3-5 iterations cover real corpora (``max_iters`` bounds the worst
case; the returned frame is exact whenever convergence is reached and
reported via the ``converged`` flag).

Scale shape: per iteration, one join of the label frame against the
edge list + one min-aggregation — both shuffle on the node key, the
natural partitioning. Lineage is truncated with ``localCheckpoint``
every iteration (iterative plans otherwise grow exponentially in the
optimizer). The per-iteration convergence check is one tiny count
action. Edge lists under ``small_graph_threshold`` skip the loop for a
one-pass driver union-find — a thresholded near-dup pair list is
metadata-sized, and N driver round-trips for 50 edges is the wrong
trade; the distributed loop remains the path for genuinely large
graphs.

The components fixpoint is oracle-checked via a ``WITH RECURSIVE``
transitive closure (r5) AND pytest-verified against a brute-force
union-find; ``pagerank_quantized`` below is oracle-checked via unrolled
iteration CTEs — its integer quantization is what makes an iterative
rank bit-comparable across engines at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "id_a",
    right: str = "id_b",
    max_iters: int = 10,
    small_graph_threshold: int = 100_000,
) -> tuple[DataFrame, bool]:
    """(components, converged): one row per node with its component
    representative (the minimum node id reachable via the pair list).

    Adaptive execution: a near-dup pair list is usually METADATA-sized
    (thresholded output, not corpus-sized), so below
    ``small_graph_threshold`` edges the exact union-find runs on the
    driver in one pass — no iteration, no per-round jobs. Above it, the
    distributed min-label loop takes over (same result). The size probe
    is one count over the (already tiny) pair frame."""
    # Materialize the pair list FIRST: the symmetrize union references
    # ``pairs`` twice, and an un-cached expensive source plan (e.g. the
    # whole jaccard pipeline) would execute once per branch — measured
    # 2.2x on dedup_components when the jaccard rewrite dropped its
    # internal persist boundaries. The pair list itself is tiny.
    # persist + count, NOT eager localCheckpoint: the RDD conversion a
    # checkpoint forces freezes the pre-AQE shuffle layout (64 uncoalesced
    # partitions through the whole upstream pipeline) — measured ~2.5s of
    # pure overhead over the identical jaccard plan at sf0.1. Lineage
    # truncation matters only inside the iteration loop below, which
    # checkpoints its own frames.
    from airbnb_cdc_spark.session import persist_tracked

    # NULL endpoints: a null id never equi-joins in the distributed
    # loop (silently inert) but would crash the driver union-find's
    # rank comparison — drop them up front so both paths agree.
    pairs = persist_tracked(
        pairs.select(F.col(left).alias("src"), F.col(right).alias("dst")).filter(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        )
    )
    n_pairs = pairs.count()
    if 2 * n_pairs <= small_graph_threshold:
        # Union-find is direction- and duplicate-insensitive, so the
        # raw checkpointed pair list feeds it directly — no symmetrize
        # union, no distinct shuffle, no second checkpoint (those exist
        # only for the distributed label-propagation loop below).
        return _driver_union_find(pairs.sparkSession, pairs), True
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    return labels.select(F.col("node"), F.col("label").alias("component")), converged


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left: str = "id_a",
    right: str = "id_b",
    max_iters: int = 10,
) -> DataFrame:
    """The dedup APPLY step: drop every near-dup cluster member except
    its representative (the minimum id — ``connected_components``'
    component label). Returns the surviving corpus keyed rows with an
    ``in_cluster`` flag (1 = this doc headed a duplicate cluster,
    0 = it was never duplicated).

    Scale shape: the component frame covers only CLUSTERED docs
    (near-dup pair output is thresholded/metadata-sized, not
    corpus-sized), so both the drop-list anti-join and the flag join
    run with a broadcast-sized right side against one corpus scan.
    The corpus itself is never shuffled."""
    comp, converged = connected_components(pairs, left, right, max_iters=max_iters)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters}"
        )
    return keep_canonical_from_components(df, comp, id_col=id_col)


def keep_canonical_from_components(
    df: DataFrame, comp: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The apply half of ``keep_canonical``, taking an already-derived
    (node, component) assignment — e.g. one read back from
    ``read_components``. At 100 TB components are derived ONCE per
    corpus snapshot and every keeper/weighting/split policy applies
    from the store; re-deriving the pair closure per policy would
    rescan the corpus for what is a metadata-sized input."""
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    reps = comp.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col), F.lit(1).alias("in_cluster")
    )
    return (
        df.join(F.broadcast(drop), on=id_col, how="left_anti")
        .join(F.broadcast(reps), on=id_col, how="left")
        .withColumn("in_cluster", F.coalesce("in_cluster", F.lit(0)).cast("int"))
    )


def write_components(comp: DataFrame, path: str) -> None:
    """Persist a (node, component) assignment as a single tiny parquet
    — the near-dup closure covers only CLUSTERED docs (thresholded
    pair output), so the store is metadata-sized at any corpus scale.
    The same store-not-rescan contract as the fingerprint / MinHash /
    DSIR stores (operators/dedup.py, operators/importance.py): derive
    the transitive closure once, then every downstream dedup POLICY
    (keep-canonical, quality keeper, soft weights, leakage-safe split,
    yield report) is a broadcast-sized read + apply."""
    comp.coalesce(1).write.mode("overwrite").parquet(path)


def read_components(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _driver_union_find(spark, edges: DataFrame) -> DataFrame:
    """Exact one-pass union-find for metadata-sized edge lists."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    # collect, not toLocalIterator: the frame is <= the small-graph
    # threshold by construction, and toLocalIterator schedules one job
    # PER PARTITION (32 sequential tiny jobs measured slower than the
    # whole distributed loop).
    for row in edges.collect():
        ra, rb = find(row.src), find(row.dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    schema = edges.schema["src"].dataType.simpleString()
    # pure-JVM local relation (r18): every downstream broadcast of the
    # component table used to re-run the parallelized Python RDD this
    # createDataFrame would build — one Python-worker round-trip per
    # partition per consuming action
    from airbnb_cdc_spark.session import local_rows_df

    return local_rows_df(spark, rows, f"node {schema}, component {schema}")


def pagerank_quantized(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank with QUANTIZED exact arithmetic: ranks
    live as integers in units of 1/``scale``, every division is floor
    division, so each iteration is bit-deterministic — across
    partitionings, re-runs, AND engines (the DuckDB oracle unrolls the
    same iterations as CTEs and matches exactly; floating-point
    PageRank cannot be oracle-checked because distributed float
    summation is order-sensitive).

        pr_0(v)   = scale // N
        contrib(u)= pr_t(u) // outdeg(u)                (floor)
        pr_t+1(v) = (1-d)*scale//den//N
                    + (d_num * SUM contrib over in-edges) // d_den

    Dangling mass (outdeg-0 nodes) is dropped, the common simplified
    formulation — totals shrink slightly per iteration; ranks remain
    exactly comparable. Quantization error vs real PageRank is
    <= iterations/scale per node — 3e-12 at the defaults, far below any
    ranking decision.

    Scale shape: per iteration one equi-join of the rank frame with the
    out-degree frame (node key) + one edge-fanout join (src key) + one
    sum-aggregation (dst key) — the standard distributed PageRank
    stages, all map-side-combining; N arrives as a one-row broadcast
    (no driver action). For iteration counts beyond ~6, truncate
    lineage with ``localCheckpoint`` as ``connected_components`` does;
    at the default 3 the single Catalyst plan is fine (and keeps the
    whole thing lazily composable).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("__n"))
    base_lit = (scale * (damping_den - damping_num)) // damping_den
    pr = nodes.join(F.broadcast(n_row)).select(
        "node", F.expr(f"{scale} div __n").alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            pr.join(deg, "node")
            .select(F.col("node").alias("src"), F.expr("pr div outdeg").alias("c"))
        )
        inflow = (
            e.join(contrib, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("m"))
        )
        pr = (
            nodes.join(inflow, "node", "left")
            .join(F.broadcast(n_row))
            .select(
                "node",
                F.expr(
                    f"{base_lit} div __n"
                    f" + ({damping_num} * coalesce(m, 0)) div {damping_den}"
                ).alias("pr"),
            )
        )
    return pr
