"""fastText-style supervised quality classifier — the "quality
classifier inference" stage of LLaMA/RedPajama-style pretraining
pipelines (Joulin et al., "Bag of Tricks for Efficient Text
Classification", 2017; Touvron et al. 2023 filter CommonCrawl with a
fastText classifier trained to recognize reference-quality pages).
A document is scored by a LINEAR model over hashed bag-of-words
features and kept when its margin clears a threshold.

Spark-first shape (the lm.py / importance.py model discipline):

- The fitted "model" is ONE dense integer weight table over hashed
  token buckets — exactly ``n_buckets`` rows at ANY corpus size (a
  few KB). Persist with ``write_classifier``; new batches score
  against the store without rescanning the corpora that fitted it.
- Scoring is scan → token explode → broadcast weight join → one
  ``groupBy(doc)`` partial-agg shuffle on the doc key. No Python
  anywhere — tokenization and hashing are Catalyst expressions
  inside whole-stage codegen, identical to the DSIR scoring pass.
- Inference also accepts EXTERNALLY-trained weights (the production
  case — an SGD-trained fastText model exported as a (bucket, w)
  table): the scorer is just a broadcast join + sum, so any linear
  model over the same hashed feature space drops in.

Determinism (exact cross-engine replay, the importance.py proxy):
true fastText trains by SGD — order-dependent and float-accumulating,
not reproducible across engines. The closed-form stand-in is the
Naive-Bayes log-count-ratio weight (the NBSVM baseline of Wang &
Manning 2012), with the log replaced by the repo's standard monotone
floored-ratio transform:

    w(b) = floor( (pos_b + 1) * SCALE * (NEG + n_buckets)
                  / ((neg_b + 1) * (POS + n_buckets)) )

pos_b/neg_b the class bucket counts, POS/NEG their totals — the
exact-integer arithmetic proven in ``dsir_bucket_scores`` (DECIMAL(38)
products, truncating division, bit-identical in DuckDB). A weight of
``SCALE`` is class-neutral (ratio 1); a doc's margin is the exact
BIGINT sum of its token weights, its mean margin one final double
division, and its LABEL the pure-integer comparison

    margin_sum >= SCALE * n_tokens    (mean token weight >= neutral)

so prediction, ranking, and tie-breaks replay bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.importance import token_buckets  # noqa: F401

DEFAULT_N_BUCKETS = 512
DEFAULT_SCALE = 1 << 16


def fit_quality_classifier(
    pos_tok: DataFrame,
    neg_tok: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Dense per-bucket integer weight table (exactly ``n_buckets``
    rows: bucket, w) from ``token_buckets`` frames over the POSITIVE
    (reference-quality) and NEGATIVE (random web) training corpora.
    Two map-side-combined groupBys fit the counts; the densify is a
    ``spark.range`` join so every candidate token joins a weight row,
    which pins the broadcast size to a constant."""
    spark = pos_tok.sparkSession
    pc = pos_tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("pc"))
    nc = neg_tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("nc"))
    pt = pos_tok.agg(F.count(F.lit(1)).alias("PT"))
    nt = neg_tok.agg(F.count(F.lit(1)).alias("NT"))
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(pc, "bucket", "left")
        .join(nc, "bucket", "left")
        .join(F.broadcast(pt))
        .join(F.broadcast(nt))
    )
    # Every factor is promoted to DECIMAL BEFORE any product, so the
    # headroom is decimal end to end — (pc+1)*scale in BIGINT first
    # would silently wrap past ~1.4e14 tokens in one bucket. `div`
    # truncates, which equals floor for these positive operands.
    # DuckDB mirror uses HUGEINT `//` (the dsir_bucket_scores
    # overflow discipline).
    num = (
        (F.coalesce(F.col("pc"), F.lit(0)) + 1).cast("decimal(19,0)")
        * F.lit(scale).cast("decimal(19,0)")
        * (F.col("NT") + F.lit(n_buckets)).cast("decimal(19,0)")
    )
    den = (F.coalesce(F.col("nc"), F.lit(0)) + 1).cast("decimal(19,0)") * (
        F.col("PT") + F.lit(n_buckets)
    ).cast("decimal(19,0)")
    return dense.select(
        "bucket",
        num.alias("__num"),
        den.alias("__den"),
    ).select(
        "bucket",
        F.expr("CAST(__num div __den AS BIGINT)").alias("w"),
    )


def classify(
    candidates: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Per-doc classifier output: exact BIGINT margin sum and token
    count, the mean margin (one final double division), and the
    integer-exact predicted label (1 = quality) — mean token weight
    at or above the class-neutral ``scale``. Docs with zero tokens
    yield no rows (no evidence either way). Plan: token explode →
    broadcast weight join → one doc-key groupBy.

    ``n_buckets`` MUST match the fitted model — a mismatch silently
    drops tokens at the inner join (the lm_score contract)."""
    tok = token_buckets(
        candidates.select(id_col, text_col), text_col, n_buckets
    )
    return (
        tok.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("w").alias("margin_sum"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            id_col,
            "margin_sum",
            "n_tokens",
            (
                F.col("margin_sum").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("margin"),
            (
                F.col("margin_sum") >= F.lit(scale) * F.col("n_tokens")
            )
            .cast("int")
            .alias("label"),
        )
    )


def keep_quality(
    candidates: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Top-``k`` candidates by mean margin (ties broken by ``id_col``
    ascending — a total order, deterministic cut); the RedPajama-style
    "keep the classifier's most reference-like slice" selection. The
    final top-k is a TakeOrdered, no single-partition global sort."""
    scored = classify(candidates, model, text_col, id_col, n_buckets, scale)
    return scored.orderBy(F.col("margin").desc(), F.col(id_col)).limit(k)


def write_classifier(model: DataFrame, path: str) -> None:
    """Persist the dense (bucket, w) weight table — ``n_buckets`` rows
    regardless of the corpora that fitted it. The store-not-rescan
    contract of write_lm_model / write_dsir_scores: fit once per
    training snapshot, score any number of arriving batches from the
    store. An externally-trained fastText export with the same
    (bucket, w) shape drops into the same store."""
    model.coalesce(1).write.mode("overwrite").parquet(path)


def read_classifier(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _classify_batch(
    batch_df: DataFrame,
    epoch: int,
    model_path: str,
    out_dir: str,
    text_col: str,
    id_col: str,
    n_buckets: int,
    scale: int,
) -> None:
    """One ``streaming_classify`` micro-batch (module-level so replay
    idempotence is directly testable — the _dsir_select_batch
    pattern). The weight table is READ-ONLY, so a crash-replay of an
    epoch overwrites ``out_dir/batch_id=N`` with the identical
    deterministic verdicts."""
    import posixpath

    spark = batch_df.sparkSession
    model = read_classifier(spark, model_path)
    out = classify(batch_df, model, text_col, id_col, n_buckets, scale)
    out.write.mode("overwrite").parquet(
        posixpath.join(out_dir, f"batch_id={epoch}")
    )


def streaming_classify(
    stream_docs: DataFrame,
    model_path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
    checkpoint_dir: str | None = None,
):
    """Streaming quality-classifier inference: score each arriving
    micro-batch against the PERSISTED weight table (fitted once or
    imported from an external trainer — never refit in-stream) and
    land per-doc verdicts idempotently under ``out_dir/batch_id=N``.
    Completes the batch / incremental / streaming triple exactly as
    the DSIR and LM families do: per-batch cost is O(batch), the
    corpora that fitted the model are never rescanned.

    Returns the started StreamingQuery; await/stop is the caller's."""

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        _classify_batch(
            batch_df,
            epoch,
            model_path,
            out_dir,
            text_col,
            id_col,
            n_buckets,
            scale,
        )

    writer = stream_docs.writeStream.foreachBatch(_batch).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
