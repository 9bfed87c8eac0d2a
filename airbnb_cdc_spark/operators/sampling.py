"""Deterministic sampling / dataset-split operators for training-data
pipelines: stratified sampling by a hash of the row key, and
train/valid/test assignment.

Design stance (100 TB): sampling decisions must be (a) reproducible
run-to-run and engine-to-engine — no ``rand()`` — and (b) computable
per-row with no shuffle. Both operators hash the ROW KEY with md5 and
decide from ``hash mod 100``, so they are pure projections/filters that
run at scan speed, compose with pushdown, and give every downstream
stage the same sample. The md5-derived bucket matches the DuckDB
oracles digit-for-digit (same trick as the dedup family's 60-bit
shingle hash).

The reference has no sampling surface; these extend the engine for the
LLM-data-pipeline brief (stratified subsampling per language / quality
tier and held-out split carving are standard corpus-prep steps).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, mod: int) -> Column:
    """Deterministic [0, mod) bucket from md5 of the stringified key.
    DuckDB mirror: CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1,
    15)) AS BIGINT) % mod. NULL keys hash to NULL — every consumer
    states its own NULL-key policy."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
        % mod
    )


def _bucket100(key: Column) -> Column:
    return _bucket(key, 100)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_pct: Mapping[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Keep each row iff its key-hash bucket falls under its stratum's
    rate (percent, integer). E.g. ``{"en": 10}`` with ``default_pct=50``
    downsamples English to 10% and everything else to 50% — the standard
    re-balancing step for over-represented languages/sources.

    Deterministic: the same key always lands in the same bucket, so the
    sample is stable across runs, engines, and partitionings. Pure
    filter — no shuffle, no driver-side state. NULL keys hash to NULL
    and are DROPPED regardless of rate (no stable identity → no stable
    sample membership)."""
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pct)).otherwise(rate)
    return df.withColumn("__bucket", _bucket100(F.col(key_col))).filter(
        F.col("__bucket") < rate
    ).drop("__bucket")


def split_assign(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Attach a deterministic ``split`` column: 'train' for buckets
    [0, train_pct), 'valid' for [train_pct, train_pct+valid_pct),
    'test' for the rest. Hash-of-key assignment keeps a document in the
    same split forever (corpus grows, splits stay disjoint) — the
    property random assignment loses. NULL keys land in 'test' (both
    when() conditions are NULL-false): never in training, and the
    policy is explicit rather than a silent drop."""
    b = _bucket100(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def mixture_by_token_budget(
    df: DataFrame,
    source_col: str,
    tokens_col,
    budgets: Mapping[str, int],
    default_budget: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-mixture carving: keep a deterministic prefix of each source
    worth ~``budgets[source]`` tokens — the standard step that turns
    per-source sampling WEIGHTS into an actual pretraining mixture
    ("2 parts web, 1 part code" becomes token budgets per source).

    Documents are walked per source in md5-of-key order (reproducible,
    engine-mirrorable, uncorrelated with any corpus ordering) and a doc
    is kept iff its starting offset lies inside the budget. Stability,
    stated precisely: re-running on the SAME corpus always selects the
    same set (pure function of keys and budgets). Growing the corpus is
    NOT append-only for the selection — a new doc hashing ahead of a
    previously-kept one shifts offsets behind it and can push boundary
    docs out. For mixtures that must stay frozen across ingests, pin
    the corpus snapshot (or record the kept id list) rather than
    re-carving.

    Scale shape: ONE window per source (running sum inside each
    source's partition — exactly ``pack_sequences``' shard shape), no
    global sort, no driver state. Returns the kept rows with their
    (source, n_tokens, token_offset) lineage."""
    from pyspark.sql import Window

    budget = F.lit(int(default_budget))
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(int(b))).otherwise(budget)
    order = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(order.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = tokens_col.cast("long")
    offset = (F.sum(n_tok).over(w) - n_tok).cast("long")
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            n_tok.alias("n_tokens"),
            offset.alias("token_offset"),
            budget.cast("long").alias("__budget"),
        )
        .filter(F.col("token_offset") < F.col("__budget"))
        .drop("__budget")
    )


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic shuffle-shard assignment — the training-export
    step that turns a filtered/deduped corpus into ``n_shards``
    pseudo-randomly ordered shards (the global shuffle every
    pretraining run performs before writing its data files), with no
    ``rand()`` and no global total sort: each row's key is hashed with
    a seed (the family 60-bit md5 bucket over ``seed || ':' || key``),
    ``shard = h % n_shards``, and the within-shard order is
    ``(h, key)``. A new seed yields an entirely different permutation;
    the same seed replays bit-identically on any engine and any input
    partitioning (the sampling-family determinism stance).

    Scale shape: ONE hash-shuffle on shard + a per-shard sort window —
    never a single global order, so 100 TB exports shard-parallel.
    This is exactly the frame ``pack_sequences`` consumes
    (``shard_col="shard"``, ``order_col="shard_pos"``) — the two
    compose into the complete shuffle-shard-pack export.

    NULL keys have no stable identity and are dropped (the
    ``stratified_sample`` convention); DUPLICATE keys have no
    deterministic within-shard position (they tie exactly on (h, key))
    and fail LOUD at action time — ``key_col`` must be unique, i.e.
    shard a DEDUPED corpus (run exact dedup first). The guard is free:
    duplicate keys are adjacent in the existing (h, key) sort, so a
    ``lag`` over the same window spec catches them with no extra
    exchange and no extra sort. Output: every input column plus
    ``(shard: int, shard_pos: long)``."""
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy(
        F.col("__h").asc(), F.col(key_col).asc()
    )
    dup = F.lag(F.col(key_col)).over(w) == F.col(key_col)
    pos = F.when(
        dup,
        F.raise_error(
            F.concat(
                F.lit("shard_assign: duplicate key "),
                F.col(key_col).cast("string"),
                F.lit(
                    f" in {key_col} — within-shard order is (hash, key),"
                    " so duplicate keys have no deterministic shard_pos;"
                    " dedup the corpus on the key first"
                ),
            )
        ).cast("long"),
    ).otherwise(F.row_number().over(w).cast("long"))
    return (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("shard_pos", pos)
        .drop("__h")
    )


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col,
    budget: int,
    id_col: str = "doc_id",
    keep_order_col: bool = False,
) -> DataFrame:
    """Offset-based greedy sequence packing: walk each shard's
    documents in a deterministic order and assign each to the training
    sequence (``seq_id``) in which its first token falls —
    ``floor(running_offset / budget)`` where ``running_offset`` is the
    sum of token counts of all earlier docs in the shard. This is the
    standard concat-then-chunk packing used to build fixed-length
    pretraining batches (documents straddling a boundary spill into the
    next chunk exactly as a flat token stream would).

    Scale shape: ONE window per shard (``partitionBy(shard_col)``) — a
    running sum inside each shard, never a global single-partition
    window, so 100 TB packs shard-parallel; shards are the unit
    real pipelines pack within anyway (one output file/worker). The
    token count is passed as a COLUMN (``tokens_col``) so callers can
    feed whitespace counts, BPE-ish regex counts, or a precomputed
    column without re-tokenizing."""
    from pyspark.sql import Window

    if budget <= 0:
        # fail fast here, not as a DIVIDE_BY_ZERO from deep inside the
        # lazy plan at action time
        raise ValueError(f"budget must be a positive token count, got {budget}")

    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = tokens_col.cast("long")
    offset = (F.sum(n_tok).over(w) - n_tok).cast("long")
    # Integral `div`, not floor(double /): the oracle uses integer `//`,
    # and double division loses exactness once a shard's running offset
    # exceeds 2^53 tokens — unreachable today, but the exact-integer
    # discipline costs nothing here.
    # keep_order_col lets shard_assign-composed callers carry shard_pos
    # through instead of paying a join-back on id (shard_pack_export's
    # full contract) — the column is already in the window's sort.
    cols = [F.col(id_col), F.col(shard_col)]
    if keep_order_col:
        cols.append(F.col(order_col))
    return df.select(
        *cols,
        n_tok.alias("n_tokens"),
        offset.alias("token_offset"),
    ).withColumn("seq_id", F.expr(f"token_offset div {int(budget)}"))


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_permille: Column,
) -> DataFrame:
    """Per-row weighted Bernoulli sampling, deterministic: keep a row
    iff its key's md5 bucket in [0, 1000) falls under the row's weight
    (integer permille — exact, no float thresholds). Quality-weighted
    downsampling is the standard shape (weight high-quality docs up
    without dropping the tail to zero); the weight being a COLUMN means
    any exact-integer quality signal works. Pure filter — no shuffle,
    stable across runs, engines, and partitionings.

    DuckDB mirror of the bucket:
    ``CAST(('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15)) AS
    BIGINT) % 1000``.
    """
    return df.filter(_bucket(F.col(key_col), 1000) < weight_permille)


def diversity_sample(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "doc_id",
    per_cluster: int = 2,
    rank_col: str = "pick_rank",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: at most ``per_cluster``
    rows from every cluster, picked by md5-hash order of the id
    (deterministic, engine-reproducible) — the standard counter to
    near-duplicate over-representation: a template with 10,000 copies
    and a unique document contribute the same ``per_cluster`` rows.

    Pair it with any clustering the engine produces (simhash_cluster,
    dedup_components, IVF/k-means cells). Runs on the salted two-phase
    ``topk_per_group``, so a mega-cluster never serializes into one
    task (see aggregate.topk_per_group).
    """
    from airbnb_cdc_spark.functions.textfns import h60
    from airbnb_cdc_spark.operators.aggregate import topk_per_group

    key = h60(F.col(id_col).cast("string"))
    return topk_per_group(
        df,
        [cluster_col],
        [key, F.col(id_col)],
        per_cluster,
        rank_col=rank_col,
    )


def hash_negatives(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str | None = None,
    k: int = 3,
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic negative sampling for contrastive-pair
    construction: each row draws ``k`` pseudo-uniform negatives — the
    minimum-id member of ``k`` md5-derived hash buckets — with zero
    randomness, so the pair set is reproducible across engines, runs,
    and partitionings (the property every sampler in this module
    holds; rand()-based negatives are not replayable).

    Scale shape: the bucket-representative table is ``n_buckets`` rows
    (one groupBy), broadcast into an explode-join — the corpus is
    scanned once and never self-joined. Probes that land on the row's
    own id are dropped (a row can be its probed bucket's minimum);
    with ``label_col`` set, same-label collisions are dropped too
    (supervised-contrastive hygiene), so callers get UP TO ``k``
    negatives per row, deterministically."""
    from airbnb_cdc_spark.functions.textfns import h60

    cols = [F.col(id_col)] + ([F.col(label_col)] if label_col else [])
    base = df.select(*cols)
    bucketed = base.withColumn(
        "__b", F.pmod(h60(F.col(id_col).cast("string")), F.lit(n_buckets))
    )
    reps = bucketed.groupBy("__b").agg(F.min(F.col(id_col)).alias("__neg"))
    if label_col:
        # representative's label via a join on its id — the same shape
        # the oracle uses (arg-min aggregates differ across engines on
        # NULL labels; a key join cannot).
        reps = reps.join(
            base.select(
                F.col(id_col).alias("__neg"),
                F.col(label_col).alias("__neg_label"),
            ),
            "__neg",
            "left",
        )
    probes = base.select(
        *cols,
        F.explode(
            F.array(*[F.lit(j) for j in range(k)])
        ).alias("__j"),
    ).withColumn(
        "__b",
        F.pmod(
            h60(
                F.concat(
                    F.col("__j").cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            F.lit(n_buckets),
        ),
    )
    joined = probes.join(F.broadcast(reps), "__b")
    cond = F.col("__neg") != F.col(id_col)
    if label_col:
        cond = cond & (
            F.col("__neg_label").isNull()
            | F.col(label_col).isNull()
            | (F.col("__neg_label") != F.col(label_col))
        )
    return joined.filter(cond).select(
        F.col(id_col),
        (F.col("__j") + 1).cast("int").alias("neg_rank"),
        F.col("__neg").alias("neg_id"),
    )


def pack_concat_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
) -> DataFrame:
    """Concatenation packing (the GPT-style pretraining layout):
    conceptually concatenate every document's tokens in ``id_col``
    order into one global stream and cut it into fixed ``seq_len``
    windows — documents SPLIT across sequence boundaries (unlike
    ``pack_sequences``' greedy whole-doc bins, which trade fill for
    boundary alignment). The output is the SAMPLE-BOUNDARY INDEX:
    one row per (sequence, document) overlap with the doc-relative
    token slice ``[tok_start, tok_end)`` that lands in that sequence —
    exactly what a training loader needs to materialize sequence
    ``seq_id`` without re-tokenizing anything else.

    The only global coordination is each doc's starting offset in the
    concatenated stream — a running sum of token counts over the id
    order, computed with the distributed two-phase Blelloch scan
    (``prefix.global_running_sum``): no single-partition window at any
    corpus size. Everything after is per-row integer arithmetic plus a
    ``sequence()`` explode bounded by each doc's own span count.

    Zero-token docs are dropped (they occupy no stream positions).
    Deterministic: offsets are exact integer sums over a total order,
    so sequence boundaries are bit-identical across engines and
    partitionings."""
    from airbnb_cdc_spark.functions.textfns import token_count
    from airbnb_cdc_spark.operators.prefix import global_running_sum

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from airbnb_cdc_spark.session import persist_tracked

    # persisted (r17): the scan's approxQuantile action, its totals
    # collect, and the final windowed pass each consume this frame —
    # unpersisted, every action re-TOKENIZED the corpus (the expensive
    # projection; three full passes measured). The cached frame is two
    # ints per doc (guide §5 — recompute here is the expensive side).
    counts = persist_tracked(
        df.select(
            F.col(id_col), token_count(F.col(text_col)).alias("__n")
        ).filter(F.col("__n") > 0)
    )
    scanned = global_running_sum(
        counts, order_col=id_col, value_col="__n", tie_breaks=[], out_col="__ge"
    )
    gs = F.col("__ge") - F.col("__n")
    L = F.lit(seq_len).cast("long")
    spans = scanned.select(
        F.col(id_col),
        gs.alias("__gs"),
        F.col("__ge"),
        F.explode(
            F.sequence(
                F.floor(gs / L).cast("long"),
                F.floor((F.col("__ge") - 1) / L).cast("long"),
            )
        ).alias("seq_id"),
    )
    return spans.select(
        "seq_id",
        id_col,
        (F.greatest(F.col("__gs"), F.col("seq_id") * L) - F.col("__gs"))
        .cast("long")
        .alias("tok_start"),
        (F.least(F.col("__ge"), (F.col("seq_id") + 1) * L) - F.col("__gs"))
        .cast("long")
        .alias("tok_end"),
    )


# power-of-two padding buckets for batch construction; docs past the
# last bucket are truncated to it (the training-time context cut)
LENGTH_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)


def length_bucket_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: tuple[int, ...] = LENGTH_BUCKETS,
) -> DataFrame:
    """Padding-efficiency report for length-bucketed batch
    construction: each document lands in the smallest power-of-two
    bucket holding its token count (longer docs truncate to the last
    bucket), and per bucket we report how many pad tokens a
    fixed-length batch of that bucket size would waste —
    ``waste_ratio = padded / (n_docs * bucket)``. This is the standard
    pre-training dataloader question (bucketed batching vs packing);
    the packing answer is ``pack_concat_split``, and this report is
    how you decide between them per corpus.

    One projection + one tiny groupBy (|buckets| rows, map-side
    combined) — scan-speed at any corpus size. Ratios from exact
    integer sums with a single final double division.
    """
    from airbnb_cdc_spark.functions.textfns import tokens
    from airbnb_cdc_spark.session import ensure_parallelism

    n = F.size(tokens(F.col(text_col))).cast("long")
    last = buckets[-1]
    bucket = F.lit(last)
    for b in reversed(buckets[:-1]):
        bucket = F.when(n <= b, F.lit(b)).otherwise(bucket)
    used = F.least(n, F.lit(last))
    base = ensure_parallelism(df).select(
        F.col(id_col),
        bucket.cast("long").alias("bucket"),
        used.alias("__used"),
        (n > last).cast("long").alias("__trunc"),
    )
    agg = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__used").cast("long").alias("used_tokens"),
        F.sum("__trunc").cast("long").alias("n_truncated"),
    )
    padded = F.col("bucket") * F.col("n_docs") - F.col("used_tokens")
    return agg.select(
        "bucket",
        "n_docs",
        "used_tokens",
        padded.alias("padded_tokens"),
        (
            padded.cast("double")
            / (F.col("bucket") * F.col("n_docs")).cast("double")
        ).alias("waste_ratio"),
        "n_truncated",
    )


def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    valid_pct: int = 10,
) -> DataFrame:
    """Train/valid/test assignment that CANNOT leak near-duplicates
    across splits: documents are split by their near-dup CLUSTER, not
    individually, so every member of a duplicate cluster lands in the
    same split (the eval-contamination failure mode of per-doc random
    splitting — a test doc whose near-copy sits in train). ``components``
    is the (node, component) frame from ``graph.connected_components``
    over any near-dup pair source (Jaccard, MinHash, winnowing);
    singleton documents are their own cluster. The bucket formula is
    ``split_assign``'s md5-of-key mod 100, applied to the CLUSTER id —
    same determinism contract, split membership stable as the corpus
    grows.

    Scale: the component frame is metadata-sized (thresholded pair
    output, not corpus-sized — the keep_canonical precedent), so the
    mark-back is a broadcast left join; the split column itself is a
    pure projection. One row per input document: (id, cluster, split).
    """
    comp = components.select(
        F.col("node").alias(id_col), F.col("component")
    )
    base = df.select(id_col).join(F.broadcast(comp), id_col, "left")
    clustered = base.select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col))
        .cast("long")
        .alias("cluster"),
    )
    return split_assign(clustered, "cluster", train_pct, valid_pct)


def temperature_mixture_plan(
    df: DataFrame,
    group_col: str,
    budget: int,
    weight_scale: int = 1 << 20,
) -> DataFrame:
    """Temperature-scaled sampling quotas at tau = 0.5 — the standard
    multilingual/domain rebalancing step (raw proportions ^ tau, here
    sqrt) that keeps head domains from drowning the mixture while
    still weighting by size. Quotas are apportioned by the largest-
    remainder (Hamilton) method, so they sum to ``budget`` EXACTLY.

    Engine-exact by construction — the whole computation is integers:
    ``sqrt`` is IEEE correctly-rounded on both engines, multiplying by
    a power-of-two ``weight_scale`` is exact in double, and ``floor``
    lands on BIGINT — so group weights are exact integers, the total
    is an order-free integer sum, base quotas use integral division,
    and remainders compare as exact integers over the common
    denominator (no double is ever summed across rows).

    Scale: one map-combined groupBy to a GROUPS-sized frame (dozens of
    languages / thousands of domains — metadata); everything after is
    arithmetic on that frame. The apportionment window sorts the tiny
    frame, never the corpus. Output: (group, n_docs, weight_scaled,
    quota); callers feed quotas into topk_per_group / split sampling.
    """
    from pyspark.sql.window import Window

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if weight_scale <= 0 or (weight_scale & (weight_scale - 1)):
        raise ValueError(
            f"weight_scale must be a positive power of two (exact in "
            f"double), got {weight_scale}"
        )
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = g.select(
        "grp",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(weight_scale))
        .alias("weight_scaled"),
    )
    tot = w.agg(F.sum("weight_scaled").alias("W"))
    # budget * weight_scaled widened to DECIMAL(38,0) (DuckDB mirror:
    # HUGEINT): at web scale sqrt(n)*scale*budget can pass 2^63 and a
    # BIGINT product would wrap silently in non-ANSI mode. `div` on the
    # positive decimals equals floor; base/rem re-land in BIGINT.
    prod = (
        f"CAST({budget} AS DECIMAL(19,0))"
        " * CAST(weight_scaled AS DECIMAL(19,0))"
    )
    base = w.join(F.broadcast(tot)).select(
        "grp",
        "n_docs",
        "weight_scaled",
        F.expr(f"CAST(({prod}) div W AS BIGINT)").alias("base"),
        # remainder numerator over the common denominator W — exact.
        F.expr(
            f"CAST(({prod}) - (({prod}) div W) * W AS BIGINT)"
        ).alias("rem"),
    )
    leftover = base.agg(
        (F.lit(budget) - F.sum("base")).alias("leftover")
    )
    rk = Window.orderBy(F.col("rem").desc(), F.col("grp"))
    return (
        base.join(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(rk))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "weight_scaled",
            (
                F.col("base")
                + (F.col("rk") <= F.col("leftover")).cast("long")
            ).alias("quota"),
        )
    )
