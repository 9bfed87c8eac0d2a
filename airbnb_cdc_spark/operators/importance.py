"""DSIR-style data selection via hashed-n-gram importance weights
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) — the standard pretraining-corpus stage
that picks raw-web documents which LOOK LIKE a small high-quality
target set: fit bag-of-hashed-unigram models over the target and the
source (raw) corpus, score every candidate by its likelihood ratio,
keep the top slice.

Spark-first shape (this is part of the LLM-training-data surface,
like operators/dedup.py — the reference ADF pipeline has no analog):

- The two "models" are just bucket-count aggregations — a map-side
  combined ``groupBy(bucket)`` each, producing AT MOST ``n_buckets``
  rows regardless of corpus size. At 100 TB those tables are a few KB.
- The per-bucket score table is densified over ``spark.range(
  n_buckets)`` and **broadcast** into candidate scoring, so the
  scoring pass is scan → explode → broadcast-hash-join → one
  ``groupBy(doc)`` partial-agg shuffle. The corpus shuffles once, on
  the doc key, at token-count ≪ raw-byte volume.
- No Python anywhere: tokenization/hashing are Catalyst expressions
  (functions/textfns.py), so the whole score sits in whole-stage
  codegen.

Determinism (the DuckDB oracle replays this bit-for-bit): the DSIR
log-likelihood-ratio is replaced by a MONOTONE integer proxy — the
Laplace-smoothed probability ratio, scaled and floor-divided:

    score(b) = floor( (t_b + 1) * SCALE * (S + n_buckets)
                      / ((s_b + 1) * (T + n_buckets)) )

with t_b/s_b the target/source bucket counts and T/S their totals.
All-integer arithmetic: numerator and denominator are computed in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so nothing overflows even at
web-corpus counts, and ``div`` (truncating integral division, equal to
floor for the positive operands here) is exact on both engines. A doc
score is then an exact BIGINT sum of per-token bucket scores. Summing
scores (instead of summing ``count * log-ratio``) preserves DSIR's
ranking whenever the log is replaced by any fixed monotone transform
applied bucket-wise; the scaled ratio is that transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import h60, tokens

DEFAULT_N_BUCKETS = 512
DEFAULT_SCALE = 1 << 16


def token_buckets(
    df: DataFrame, text_col: str, n_buckets: int = DEFAULT_N_BUCKETS
) -> DataFrame:
    """One row per token instance with its hashed feature bucket.
    ``h60`` is non-negative (60-bit md5 prefix), so plain ``%`` is
    already the canonical bucket on both engines."""
    return df.select(
        *df.columns,
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).withColumn("bucket", (h60(F.col("__tok")) % F.lit(n_buckets)))


def _bucket_counts(tok: DataFrame) -> DataFrame:
    return tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))


def dsir_bucket_scores(
    target_tok: DataFrame,
    source_tok: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Dense per-bucket integer score table (exactly ``n_buckets``
    rows: bucket, score). Both inputs are ``token_buckets`` outputs.

    The dense frame (``spark.range``) guarantees every candidate
    token joins a score row even for buckets the target never hit,
    and pins the broadcast size to ``n_buckets`` rows."""
    spark = target_tok.sparkSession
    t = _bucket_counts(target_tok).withColumnRenamed("c", "tc")
    s = _bucket_counts(source_tok).withColumnRenamed("c", "sc")
    # Totals are 1-row aggregates over the (metadata-sized) count
    # tables; the cross joins below broadcast single rows.
    t_tot = t.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("T"))
    s_tot = s.agg(F.coalesce(F.sum("sc"), F.lit(0)).alias("S"))
    dense = (
        spark.range(n_buckets)
        .withColumnRenamed("id", "bucket")
        .join(t, "bucket", "left")
        .join(s, "bucket", "left")
        .join(F.broadcast(t_tot))
        .join(F.broadcast(s_tot))
        .select(
            "bucket",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("sc"), F.lit(0)).alias("sc"),
            "T",
            "S",
        )
    )
    # Every factor is promoted to DECIMAL BEFORE any product — a
    # BIGINT (tc+1)*scale first step would silently wrap past ~1.4e14
    # tokens in one bucket. `div` truncates, which equals floor for
    # these positive operands. DuckDB mirror uses HUGEINT `//`.
    num = (
        (F.col("tc") + 1).cast("decimal(19,0)")
        * F.lit(scale).cast("decimal(19,0)")
        * (F.col("S") + F.lit(n_buckets)).cast("decimal(19,0)")
    )
    den = (F.col("sc") + 1).cast("decimal(19,0)") * (
        F.col("T") + F.lit(n_buckets)
    ).cast("decimal(19,0)")
    return dense.select(
        "bucket",
        num.alias("__num"),
        den.alias("__den"),
    ).select(
        "bucket",
        F.expr("CAST(__num div __den AS BIGINT)").alias("score"),
    )


def dsir_select(
    candidates: DataFrame,
    scores: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Top-``k`` candidate docs by summed bucket score (ties broken by
    ``id_col`` ascending — a total order, so the cut is deterministic).

    Plan shape: explode → broadcast join with the n_buckets-row score
    table → partial-agg groupBy(doc). The only full shuffle is on the
    doc key; the final top-k is a TakeOrdered over (score, id) — no
    single-partition global sort materializes."""
    tok = token_buckets(candidates, text_col, n_buckets)
    per_doc = (
        tok.join(F.broadcast(scores), "bucket")
        .groupBy(id_col)
        .agg(F.sum("score").alias("dsir_score"))
    )
    return per_doc.orderBy(
        F.col("dsir_score").desc(), F.col(id_col)
    ).limit(k)


def write_dsir_scores(scores: DataFrame, path: str) -> None:
    """Persist the dense bucket-score table (the fitted "model") as a
    single tiny parquet — n_buckets rows regardless of the corpus that
    fitted it. Incremental ingest then scores ANY new batch against
    the stored model without rescanning the corpus (the same
    store-not-rescan contract as the fingerprint / MinHash-signature
    stores in operators/dedup.py)."""
    scores.coalesce(1).write.mode("overwrite").parquet(path)


def read_dsir_scores(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _dsir_select_batch(
    batch_df: DataFrame,
    epoch: int,
    scores_path: str,
    out_dir: str,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int,
) -> None:
    """One ``streaming_dsir_select`` micro-batch (module-level so
    replay idempotence is directly testable). The fitted model is
    READ-ONLY — nothing accumulates — so a crash-replay of an epoch
    simply overwrites ``out_dir/batch_id=N`` with the identical
    deterministic selection: no run-id protocol needed (contrast the
    mutating chunk/MinHash stores)."""
    import posixpath

    spark = batch_df.sparkSession
    scores = read_dsir_scores(spark, scores_path)
    top = dsir_select(batch_df, scores, text_col, id_col, k, n_buckets)
    top.write.mode("overwrite").parquet(
        posixpath.join(out_dir, f"batch_id={epoch}")
    )


def streaming_dsir_select(
    stream_docs: DataFrame,
    scores_path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    n_buckets: int = DEFAULT_N_BUCKETS,
    checkpoint_dir: str | None = None,
):
    """Streaming DSIR ingest: score each arriving micro-batch against
    the PERSISTED score model (``write_dsir_scores`` output — fitted
    once, n_buckets rows, never refit in-stream) and land the batch's
    top-k selection idempotently under ``out_dir/batch_id=N``. The
    streaming sibling of ``incremental_dsir_select``: per-batch cost
    is O(batch), the corpus that fitted the model is never rescanned,
    and the selection is per-batch (a global top-k across batches is a
    batch job over the landed selections — metadata-sized at k rows
    per batch).

    Returns the started StreamingQuery; await/stop is the caller's."""

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        _dsir_select_batch(
            batch_df,
            epoch,
            scores_path,
            out_dir,
            text_col,
            id_col,
            k,
            n_buckets,
        )

    writer = stream_docs.writeStream.foreachBatch(_batch).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def distribution_drift(
    ref_tok: DataFrame,
    new_tok: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Per-bucket corpus-drift table — the ingest-monitoring stage a
    production pretraining pipeline runs between snapshots (did this
    crawl's token distribution shift against the reference corpus?).
    Both inputs are ``token_buckets`` outputs; the result is DENSE
    (exactly ``n_buckets`` rows: bucket, ref_count, new_count,
    drift_num) where ``drift_num = |new_count * R - ref_count * N|``
    with R/N the reference/new token totals — the cross-multiplied
    numerator of ``|new_share - ref_share|``, so ranking buckets by it
    IS ranking by share drift without a single division. Products run
    in DECIMAL(38,0) (HUGEINT on DuckDB): web-scale counts (1e12
    tokens) squared overflow int64, the classifier/DSIR discipline.

    Scale shape: two map-side-combined groupBy(bucket) aggregations
    (metadata-sized outputs at any corpus size) + a dense range join —
    nothing corpus-sized survives the aggregation.

    A bucketing mismatch (``token_buckets`` built with a LARGER
    n_buckets than this call's) fails loud instead of silently
    understating drift: totals are taken from the RAW bucket counts
    before densification, guarded by a runtime assert on the max
    bucket id — the dense left join would otherwise quietly discard
    the out-of-range buckets from both the rows and the totals."""
    spark = ref_tok.sparkSession
    r = _bucket_counts(ref_tok).withColumnRenamed("c", "ref_count")
    n = _bucket_counts(new_tok).withColumnRenamed("c", "new_count")
    return _drift_from_counts(spark, r, n, n_buckets)


def _drift_from_counts(
    spark, r: DataFrame, n: DataFrame, n_buckets: int
) -> DataFrame:
    """``distribution_drift`` over already-aggregated bucket-count
    frames ``(bucket, ref_count)`` / ``(bucket, new_count)`` — shared
    by the two-snapshot batch form and the persisted-reference
    streaming form (where the reference side is a stored model, not a
    corpus rescan)."""
    dense = (
        spark.range(n_buckets)
        .withColumnRenamed("id", "bucket")
        .join(F.broadcast(r), "bucket", "left")
        .join(F.broadcast(n), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ref_count", F.lit(0)).alias("ref_count"),
            F.coalesce("new_count", F.lit(0)).alias("new_count"),
        )
    )
    # totals from the RAW counts (pre-densify), with the bucket-range
    # guard fused into the consumed column so Catalyst cannot prune it
    rt = r.agg(
        F.coalesce(F.sum("ref_count"), F.lit(0)).cast("decimal(38,0)").alias("__r"),
        F.max("bucket").alias("__rmax"),
    )
    nt = n.agg(
        F.coalesce(F.sum("new_count"), F.lit(0)).cast("decimal(38,0)").alias("__n"),
        F.max("bucket").alias("__nmax"),
    )
    in_range = (
        F.coalesce(F.col("__rmax"), F.lit(-1)) < F.lit(n_buckets)
    ) & (F.coalesce(F.col("__nmax"), F.lit(-1)) < F.lit(n_buckets))
    guard = F.assert_true(
        in_range,
        F.lit(
            f"token bucket id >= n_buckets={n_buckets}: the inputs were "
            "bucketed with a different n_buckets — rebuild token_buckets "
            "with the same value"
        ),
    )
    totals = rt.crossJoin(nt).select(
        # assert_true is NULL on success and raises otherwise; routing
        # __r through it (NO otherwise branch — when(c, x).otherwise(x)
        # would constant-fold the guard away) keeps the check in the
        # evaluated plan
        F.when(guard.isNull(), F.col("__r")).alias("__r"),
        F.col("__n"),
    )
    return dense.join(F.broadcast(totals)).select(
        "bucket",
        "ref_count",
        "new_count",
        F.abs(
            F.col("new_count").cast("decimal(38,0)") * F.col("__r")
            - F.col("ref_count").cast("decimal(38,0)") * F.col("__n")
        )
        .cast("decimal(38,0)")
        .alias("drift_num"),
    )


def drift_summary(
    per_bucket: DataFrame, empty_is_disjoint: bool = False
) -> DataFrame:
    """One-row drift report over a ``distribution_drift`` table:
    ``total_variation = sum(drift_num) / (2 * R * N)`` — the exact
    total-variation distance between the two bucket distributions
    (0 = identical, 1 = disjoint), integer arithmetic throughout with
    ONE final double division, plus the count of buckets whose share
    moved. An alerting pipeline thresholds ``total_variation``; the
    per-bucket table names the drifted vocabulary regions.

    An EMPTY snapshot (R or N = 0) does not yield a silent NULL an
    alert threshold would ignore: by default it RAISES (an empty side
    is an ingest failure, not zero drift); with
    ``empty_is_disjoint=True`` it reports ``total_variation = 1.0`` —
    the disjoint-distributions value, which FIRES the alert. The
    streaming monitor uses the latter so one degenerate micro-batch
    alerts instead of killing the stream."""
    tv = F.col("__d").cast("double") / (
        F.lit(2.0) * F.col("__r").cast("double") * F.col("__n").cast("double")
    )
    if empty_is_disjoint:
        tv_out = F.when(
            (F.col("__r") > 0) & (F.col("__n") > 0), tv
        ).otherwise(F.lit(1.0))
    else:
        nonempty_guard = F.assert_true(
            (F.col("__r") > 0) & (F.col("__n") > 0),
            F.lit(
                "drift_summary over an empty snapshot: reference and new "
                "corpora must both contain tokens (an empty side is an "
                "ingest failure, not zero drift); pass "
                "empty_is_disjoint=True to report total_variation=1.0 "
                "instead"
            ),
        )
        tv_out = F.when(nonempty_guard.isNull(), tv)
    return per_bucket.agg(
        F.sum("ref_count").cast("decimal(38,0)").alias("__r"),
        F.sum("new_count").cast("decimal(38,0)").alias("__n"),
        F.sum(F.col("drift_num").cast("decimal(38,0)")).alias("__d"),
        F.sum((F.col("drift_num") > 0).cast("long")).alias("buckets_moved"),
    ).select(
        F.col("__r").cast("long").alias("ref_tokens"),
        F.col("__n").cast("long").alias("new_tokens"),
        tv_out.alias("total_variation"),
        "buckets_moved",
    )


def write_drift_reference(
    ref_tok: DataFrame, path: str, n_buckets: int = DEFAULT_N_BUCKETS
) -> None:
    """Persist the DENSE reference bucket-count model (exactly
    ``n_buckets`` rows: bucket, ref_count) as one tiny parquet — the
    drift siblings of ``write_dsir_scores``: fit once over the
    reference corpus, then every arriving batch is monitored against
    the store without rescanning the reference. The dense shape makes
    the model self-describing — ``read_drift_reference`` derives
    ``n_buckets`` from the row count, so a monitor can never silently
    re-bucket with the wrong geometry (the ``_stored_pq_geometry``
    principle). Write-time cost is two passes over the metadata-sized
    count table; the same bucket-range guard as
    ``distribution_drift`` fails loud if ``ref_tok`` was bucketed
    wider than ``n_buckets``."""
    spark = ref_tok.sparkSession
    r = _bucket_counts(ref_tok).withColumnRenamed("c", "ref_count")
    rmax = r.agg(F.max("bucket").alias("__rmax"))
    # fail loud at WRITE time on both degeneracies: a token-free
    # reference (every later monitor call would raise or report
    # TV=1.0, surfacing the failure far from its cause) and a
    # bucketing mismatch (the dense write would silently drop
    # out-of-range buckets)
    guard = F.assert_true(
        F.col("__rmax").isNotNull() & (F.col("__rmax") < F.lit(n_buckets)),
        F.when(
            F.col("__rmax").isNull(),
            F.lit(
                "drift reference corpus has no tokens: refusing to persist "
                "an all-zero model (an empty reference is an ingest "
                "failure, not a baseline)"
            ),
        ).otherwise(
            F.lit(
                f"token bucket id >= n_buckets={n_buckets}: the reference "
                "was bucketed with a different n_buckets — rebuild "
                "token_buckets with the same value"
            )
        ),
    )
    dense = (
        spark.range(n_buckets)
        .withColumnRenamed("id", "bucket")
        .join(F.broadcast(r), "bucket", "left")
        .crossJoin(F.broadcast(rmax))
        .select(
            "bucket",
            # guard fused into the consumed column (no otherwise branch
            # — see _drift_from_counts) so Catalyst cannot prune it
            F.when(
                guard.isNull(), F.coalesce("ref_count", F.lit(0))
            ).alias("ref_count"),
        )
    )
    dense.coalesce(1).write.mode("overwrite").parquet(path)


def read_drift_reference(spark, path: str) -> tuple[DataFrame, int]:
    """(reference bucket counts, n_buckets) — the model is dense, so
    its row count IS its bucket geometry."""
    ref = spark.read.parquet(path)
    return ref, ref.count()


def batch_drift_vs_reference(
    batch_df: DataFrame, ref_path: str, text_col: str = "text"
) -> DataFrame:
    """Per-bucket drift of one document batch against the PERSISTED
    reference model: bucket the batch with the STORED geometry (never
    a caller guess), count, and reuse the exact ``distribution_drift``
    arithmetic with the stored counts as the reference side. Per-call
    cost is O(batch) + the n_buckets-row model read — the reference
    corpus is never rescanned."""
    ref, n_buckets = read_drift_reference(batch_df.sparkSession, ref_path)
    return _batch_drift_vs_counts(batch_df, ref, n_buckets, text_col)


def _batch_drift_vs_counts(
    batch_df: DataFrame, ref: DataFrame, n_buckets: int, text_col: str
) -> DataFrame:
    """Per-bucket drift of a batch against an already-loaded reference
    count table — shared by the store-path batch form and the
    cached-store stream closure."""
    tok = token_buckets(batch_df, text_col, n_buckets)
    n = _bucket_counts(tok).withColumnRenamed("c", "new_count")
    return _drift_from_counts(batch_df.sparkSession, ref, n, n_buckets)


def _monitor_and_land(
    batch_df: DataFrame,
    ref: DataFrame,
    n_buckets: int,
    epoch: int,
    out_dir: str,
    text_col: str,
) -> None:
    """Score one batch against a reference bucket-count table and land
    one summary row — (batch_id, ref_tokens, new_tokens,
    total_variation, buckets_moved) — idempotently under
    ``out_dir/batch_id=N``. ONE implementation for both the
    store-path batch form and the cached-store stream closure. A
    row-empty micro-batch (no data this trigger) lands nothing; a
    batch whose documents carry no tokens reports the disjoint value
    1.0 — alert, don't kill the stream."""
    import posixpath

    if batch_df.isEmpty():
        return
    summary = drift_summary(
        _batch_drift_vs_counts(batch_df, ref, n_buckets, text_col),
        empty_is_disjoint=True,
    )
    # batch_id comes from the batch_id=N directory alone (the
    # _dsir_select_batch contract): ALSO writing it as a data column
    # collides with partition discovery on read — Spark 4 emits
    # COLUMN_ALREADY_EXISTS and silently shadows the written long with
    # the inferred partition column (r14 ADVICE)
    summary.coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(out_dir, f"batch_id={epoch}")
    )


def _drift_monitor_batch(
    batch_df: DataFrame,
    epoch: int,
    ref_path: str,
    out_dir: str,
    text_col: str,
) -> None:
    """One ``streaming_drift_monitor`` micro-batch against the store
    path (module-level so replay idempotence is directly testable;
    the stream itself caches the model once and calls
    ``_monitor_and_land`` with the cached table — the same code this
    delegates to). The model is READ-ONLY, so a crash-replay
    overwrites the partition with identical content (the
    ``_dsir_select_batch`` contract)."""
    ref, n_buckets = read_drift_reference(batch_df.sparkSession, ref_path)
    _monitor_and_land(batch_df, ref, n_buckets, epoch, out_dir, text_col)


def streaming_drift_monitor(
    stream_docs: DataFrame,
    ref_path: str,
    out_dir: str,
    text_col: str = "text",
    checkpoint_dir: str | None = None,
):
    """Streaming corpus-drift monitor: score each arriving micro-batch
    of documents against the PERSISTED reference model
    (``write_drift_reference`` output — fitted once, n_buckets rows,
    never refit in-stream) and land one drift-summary row per batch
    under ``out_dir/batch_id=N``. Completes the ingest-monitoring
    story the other foreachBatch legs tell: the same alerting
    pipeline that thresholds the batch ``drift_summary`` now
    thresholds the landed stream rows.

    Returns the started StreamingQuery; await/stop is the caller's.

    The model is read, counted, and cached ONCE at stream start (it is
    read-only and a crash-restart rebuilds this closure, re-reading
    it), so each trigger pays only its own batch's scoring — not a
    model re-read, re-count, and re-aggregation (the
    ``streaming_decontam`` store discipline)."""
    from airbnb_cdc_spark.session import persist_tracked

    spark = stream_docs.sparkSession
    ref, n_buckets = read_drift_reference(spark, ref_path)
    ref = persist_tracked(ref)

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        _monitor_and_land(batch_df, ref, n_buckets, epoch, out_dir, text_col)

    writer = stream_docs.writeStream.foreachBatch(_batch).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
