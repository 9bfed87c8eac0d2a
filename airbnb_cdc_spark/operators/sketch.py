"""Mergeable frequency sketches — count-min over an item column.

A count-min sketch (Cormode & Muthukrishnan 2005) summarizes item
frequencies in a fixed ``depth x width`` integer grid: cell
``(j, h_j(item) % width)`` accumulates the item's count; a point query
reads the MINIMUM of the item's ``depth`` cells (over-estimates only,
error ~ N/width with probability 1 - 2^-depth). The reason it earns a
place in a 100 TB engine:

- **Fixed size.** The sketch is ``depth·width`` rows no matter how many
  distinct items exist — heavy-hitter monitoring over an unbounded
  vocabulary in kilobytes.
- **Mergeable.** Two sketches over disjoint corpora merge by summing
  cells (one groupBy(j, bucket)); shards/streams/micro-batches compose
  without re-scanning anything.
- **Engine-exact.** Hashes are md5-derived 60-bit integers (the repo's
  standard trick), so every cell — and therefore every estimate — is
  bit-identical in the DuckDB oracle. No randomness, no libm.

Build shape: one vocabulary aggregation (the only corpus-sized
shuffle), then a ``depth``-way fan-out of the VOCAB (not the corpus)
into cells — the second shuffle is vocab-sized input, sketch-sized
output with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The ONE engine-exactness-critical hash, shared across families
# (a second definition could silently drift from the oracle convention).
from airbnb_cdc_spark.functions.textfns import h60 as _h60


def cms_bucket(item: Column, j: int, width: int) -> Column:
    """Row-j bucket for an item: h(j || ':' || item) % width."""
    return _h60(F.concat(F.lit(str(j)), F.lit(":"), item)) % width


def cms_from_counts(
    counts: DataFrame,
    item_col: str,
    count_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(j, bucket, c): count-min sketch built from a pre-aggregated
    (item, count) frame. Fanning out the VOCABULARY instead of raw
    instances keeps the fan-out input at distinct-item volume; the
    groupBy output is at most ``depth·width`` rows (the sketch itself).
    Sketches over different corpora/batches merge by unioning and
    re-summing on (j, bucket)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                cms_bucket(F.col(item_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        counts.select(F.explode(cells).alias("cell"), F.col(count_col).alias("__c"))
        .groupBy("cell.j", "cell.bucket")
        .agg(F.sum("__c").alias("c"))
    )


def cms_delta_write(delta: DataFrame, sketch_dir: str, batch_id: int) -> None:
    """Idempotent per-batch sketch write: the batch OWNS its
    ``batch_id=<n>`` partition and overwrites it, so a foreachBatch
    retry replaces its own cells instead of double-adding them — the
    same trick the CDC quarantine sink uses. The additive merge happens
    at READ time (``read_cms`` sums cells across partitions), which is
    what makes the write path retry-safe without transactions."""
    import posixpath

    delta.write.mode("overwrite").parquet(
        posixpath.join(sketch_dir, f"batch_id={batch_id}")
    )


def read_cms(spark, sketch_dir: str) -> DataFrame:
    """(j, bucket, c): the merged sketch — cells summed across every
    batch partition. The scan is at most ``n_batches·depth·width`` rows
    of three integers; compact by rewriting the summed frame as a
    single ``batch_id=-1`` partition if batch count ever matters.
    Before the first batch commits, the dir does not exist — return the
    typed empty sketch instead of failing schema inference (a monitor
    may poll during stream startup)."""
    from pyspark.errors import AnalysisException

    try:
        raw = spark.read.parquet(sketch_dir)
    except AnalysisException:  # PATH_NOT_FOUND: no batch committed yet
        return spark.createDataFrame([], "j long, bucket long, c long")
    return raw.groupBy("j", "bucket").agg(F.sum("c").alias("c"))


def streaming_cms(
    stream_df: DataFrame,
    sketch_dir: str,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    checkpoint_dir: str | None = None,
):
    """Streaming heavy-hitter monitoring: each micro-batch's item
    frequencies fold into the persistent count-min sketch. Per batch:
    one vocabulary aggregation (batch-sized), one sketch build
    (vocab-sized fan-out, sketch-sized output), one partition write.
    The merged sketch is always ``read_cms(spark, sketch_dir)`` —
    exactly equal, cell-for-cell, to the batch sketch of the union of
    all processed batches (the pytest proves it), because cell addition
    is associative and the per-batch partitions are retry-idempotent.

    Returns the started StreamingQuery; await/stop is the caller's."""

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        vocab = batch_df.groupBy(F.col(item_col).alias("__item")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        delta = cms_from_counts(vocab, "__item", "__c", depth, width)
        cms_delta_write(delta, sketch_dir, epoch)

    writer = stream_df.writeStream.foreachBatch(_batch).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def kmv_minhashes(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """(group, h, rn): each group's k smallest distinct 60-bit key
    hashes, rank attached. The KMV synopsis (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD'07 for the multi-set algebra): fixed k rows per
    group regardless of cardinality, engine-exact, and composable —
    distinct counts, unions, and intersection sizes all derive from
    k-min sets. Spark executes the per-group k-th-min as a rank window
    with WindowGroupLimit partial pruning before the shuffle."""
    from pyspark.sql import Window

    uh = df.select(
        F.col(group_col).alias("group"),
        _h60(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("group").orderBy("h")
    return (
        uh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_intersection_estimate(
    sketches: DataFrame,
    group_a,
    group_b,
    k: int = 64,
) -> DataFrame:
    """One-row estimate of |A ∩ B| from two groups' k-min sets (Beyer
    et al. SIGMOD'07): pool both sketches, let h_k be the k-th smallest
    distinct pooled hash; among pooled hashes <= h_k (the union's KMV
    synopsis), the fraction ρ present in BOTH sketches estimates the
    Jaccard similarity, and |A∩B| ≈ ρ · (k-1)·2⁶⁰/h_k (the union's KMV
    cardinality estimate). Every quantity is an exact integer except
    the final arithmetic, so the estimate is engine-reproducible.

    Input is ``kmv_minhashes`` output; the whole computation touches
    2k rows — driver-free, broadcast-sized, usable as a join-size
    planning primitive at any corpus scale."""
    pair = sketches.filter(F.col("group").isin([group_a, group_b]))
    # pooled k-min of the union, as ONE global aggregate: the per-hash
    # side-count frame is <= 2k rows by construction, so
    # sort_array(collect_list(...))[1:k] partial-aggregates map-side and
    # never plans the single-partition WindowExec a constant-key
    # row_number would (the list is bounded at 2k structs; hashes are
    # distinct after the groupBy, so the struct sort is a total order).
    pooled = pair.groupBy("h").agg((F.count(F.lit(1)) == 2).alias("both"))
    kept = pooled.agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct(F.col("h"), F.col("both")))),
            1,
            k,
        ).alias("__kmin")
    )
    return kept.select(
        # try_element_at: NULL (not ANSI INVALID_ARRAY_INDEX) when the
        # pooled array is empty (neither group has rows); the m = 0
        # branch below then yields 0.0 without touching hk.
        F.try_element_at(F.col("__kmin"), F.lit(-1)).getField("h").alias("hk"),
        F.size("__kmin").alias("m"),
        F.size(F.filter(F.col("__kmin"), lambda s: s.getField("both"))).alias(
            "rho_k"
        ),
    ).select(
        # m = 0 (both sides empty) must not reach the division — Spark's
        # ANSI mode throws DIVIDE_BY_ZERO even for doubles
        F.when(
            F.col("m") > 0,
            F.col("rho_k").cast("double")
            / F.col("m").cast("double")
            * F.when(
                F.col("m") < k,
                # union smaller than k: the pooled set IS the union —
                # its size is exact, no extrapolation
                F.col("m").cast("double"),
            ).otherwise(
                F.lit(float(k - 1)) * F.lit(1152921504606846976.0)
                / F.col("hk").cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("est_intersection")
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point queries: each probe item joined to its ``depth`` cells,
    estimate = MIN over them. The sketch is sketch-sized (broadcast);
    probes fan out ``depth``-way only. The join is LEFT with a zero
    fill: a cell absent from the sparse sketch means nothing ever
    hashed there, so its count is 0 — an inner join would drop (or
    over-estimate) items outside the sketched corpus instead of
    returning the correct estimate 0."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                cms_bucket(F.col(item_col), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    fanned = probes.select(
        F.col(item_col), F.explode(cells).alias("cell")
    ).select(item_col, F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
    return (
        fanned.join(F.broadcast(sketch), on=["j", "bucket"], how="left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


def kmv_write(sketches: DataFrame, out_dir: str) -> None:
    """Persist ``kmv_minhashes`` output partitioned by ``group`` — the
    sketch-table layout for pre-aggregated rollups: one partition per
    group (e.g. per day), each holding that group's fixed-k k-min set.
    At 100 TB the raw corpus is scanned ONCE per new partition (build
    today's sketch, append it); every later range query touches only
    k-row sketch partitions, never the corpus. Re-writing an existing
    group replaces exactly that partition (dynamic partition
    overwrite), so daily rebuilds are idempotent."""
    (
        sketches.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("group")
        .parquet(out_dir)
    )


def kmv_read_range(spark, out_dir: str, lo=None, hi=None) -> DataFrame:
    """Sketch partitions for groups in the inclusive ``[lo, hi]`` range
    (``None`` = unbounded) — the filter is on the partition column, so
    the scan PRUNES to the requested partitions (PartitionFilters, no
    data files outside the range are opened)."""
    df = spark.read.parquet(out_dir)
    if lo is not None:
        df = df.filter(F.col("group") >= lo)
    if hi is not None:
        df = df.filter(F.col("group") <= hi)
    return df


def kmv_union_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """One-row distinct-count estimate for the UNION of the input
    sketch groups (Beyer et al. SIGMOD'07 multi-set algebra): the k
    smallest distinct hashes pooled across the groups' k-min sets ARE
    the union's KMV synopsis — valid because any hash among the
    union's k smallest is necessarily among its own group's k smallest
    — so pre-aggregated per-day sketches answer any date-range
    distinct query without touching the corpus.

    Returns ``(m, est_distinct)``: ``m < k`` means the pooled set is
    the exact union (estimate = m); otherwise the standard
    ``(k-1)·2^60 / h_k`` estimator. The k-cut is a distributed
    TakeOrdered over the pooled hashes (groups·k rows — never a
    single-partition window); every quantity except the one final
    division is an exact integer, so the estimate is engine-exact and
    oracle-checkable."""
    pooled = sketches.select("h").distinct()
    kmin = pooled.orderBy("h").limit(k)
    agg = kmin.agg(
        F.count(F.lit(1)).cast("long").alias("m"), F.max("h").alias("hk")
    )
    return agg.select(
        "m",
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(1152921504606846976.0)
            / F.col("hk").cast("double")
        )
        .alias("est_distinct"),
    )
