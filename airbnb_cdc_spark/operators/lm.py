"""KenLM-style n-gram LM fluency scoring — the second axis of the
CCNet quality-filter pair (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", 2020). DSIR
(operators/importance.py) ranks documents by TARGET-LIKENESS of their
unigram mix; this module ranks them by FLUENCY — how plausible each
adjacent-token transition is under a bigram model fitted on a
high-quality target corpus. Real pretraining pipelines run both: a
doc can look topically target-like while being word salad, and vice
versa.

Spark-first shape (mirrors importance.py's store contract):

- The fitted "model" is ONE dense integer score table over hashed
  bucket pairs — exactly ``n_buckets**2`` rows at ANY corpus size
  (65,536 at the default 256). Persist with ``write_lm_model``; new
  batches score against the store without rescanning the corpus that
  fitted it.
- Scoring is scan → transition explode → broadcast join with the
  dense model → one ``groupBy(doc)`` partial-agg shuffle on the doc
  key. No Python anywhere — tokenization, hashing, and the transition
  zip are Catalyst expressions inside whole-stage codegen.
- Transitions are built with ``zip_with(slice, slice)`` — the token
  array is referenced only as a whole-row argument, never inside a
  per-element lambda, so Catalyst cannot inline the tokenizer
  per-element (the O(n_tokens^2) trap operators/text.py's winnowing
  rewrite documented).

Determinism (the DuckDB oracle replays this bit-for-bit): true
perplexity needs log/exp, which are not IEEE-exact across engines.
Instead each transition gets an exact-integer Laplace-smoothed
likelihood proxy

    s(p, c) = floor( (bi(p, c) + 1) * SCALE / (uni(p) + n_buckets) )

— ``bi`` the target's (prev, cur) bucket-pair count, ``uni(p)`` the
target's prev-bucket transition-source count (so probabilities
condition correctly: SUM_c bi(p, c) = uni(p)) — and a document's
fluency is the MEAN transition likelihood: an exact BIGINT sum over
an exact BIGINT count with one final double division, reproduced
bit-for-bit by DuckDB. A fixed monotone transform of each smoothed
conditional probability, averaged — the log-free fluency ranking,
same discipline as the DSIR score proxy. Integer bounds: the
numerator is (count + 1) * 2**16 with count < 2**40 even at web
scale, far inside BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import h60, tokens

DEFAULT_N_BUCKETS = 256
DEFAULT_SCALE = 1 << 16


def transition_buckets(
    df: DataFrame, text_col: str, n_buckets: int = DEFAULT_N_BUCKETS
) -> DataFrame:
    """One row per adjacent-token transition with hashed feature
    buckets ``pb`` (prev) and ``cb`` (cur). Docs with fewer than two
    tokens yield no rows (no transitions exist — their fluency is
    undefined, and they drop out of scoring)."""
    arr = tokens(F.col(text_col))
    n = F.size(arr)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("pa"), b.alias("pc")),
    )
    return (
        df.select(*df.columns, F.explode(pairs).alias("__tr"))
        .select(
            *df.columns,
            (h60(F.col("__tr.pa")) % F.lit(n_buckets)).alias("pb"),
            (h60(F.col("__tr.pc")) % F.lit(n_buckets)).alias("cb"),
        )
    )


def fit_bigram_lm(
    target_tr: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Dense per-transition integer score table (exactly
    ``n_buckets**2`` rows: pb, cb, score) from a ``transition_buckets``
    frame over the TARGET corpus. Two map-side-combined groupBys fit
    the counts; the densify is a ``spark.range`` join so every
    candidate transition — including pairs the target never produced —
    joins a score row, which pins the broadcast size to a constant."""
    spark = target_tr.sparkSession
    bi = target_tr.groupBy("pb", "cb").agg(F.count(F.lit(1)).alias("bc"))
    # uni(p) = SUM_c bi(p, c) — derived from the pair counts, so the
    # target corpus is scanned and transition-exploded exactly ONCE;
    # the rollup runs over the <= n_buckets^2-row count table.
    uni = bi.groupBy("pb").agg(F.sum("bc").alias("uc"))
    dense = (
        spark.range(n_buckets * n_buckets)
        .select(
            F.expr(f"id div {n_buckets}").alias("pb"),
            (F.col("id") % n_buckets).alias("cb"),
        )
        .join(bi, ["pb", "cb"], "left")
        .join(uni, "pb", "left")
    )
    # BIGINT throughout: numerator is (count + 1) * 2**16 — exact far
    # past web-scale counts; `div` truncates, equal to floor for these
    # positive operands, and DuckDB `//` mirrors it.
    num = ((F.coalesce(F.col("bc"), F.lit(0)) + 1) * F.lit(scale)).cast("long")
    den = (F.coalesce(F.col("uc"), F.lit(0)) + F.lit(n_buckets)).cast("long")
    return dense.select(
        "pb", "cb", num.alias("__num"), den.alias("__den")
    ).select(
        "pb",
        "cb",
        F.expr("CAST(__num div __den AS BIGINT)").alias("score"),
    )


def fit_interpolated_lm(
    target_tr: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Jelinek-Mercer interpolated model (λ = 3/4 bigram, 1/4 unigram
    backoff): unseen transitions no longer collapse to the flat
    Laplace floor — they back off to the target's unigram frequency of
    the CURRENT token, the standard n-gram smoothing step beyond pure
    Laplace. Same dense ``n_buckets**2``-row contract as
    ``fit_bigram_lm`` (drop-in for lm_score/lm_select/the store).

    Exactness: the score is the SUM OF TWO FLOORED integer terms

        s(p,c) = floor( 3·SCALE·(bi(p,c)+1) / (4·(uni(p)+V)) )
               + floor(   SCALE·(tgt(c)+1)  / (4·(T+V)) )

    with uni(p) = Σ_c bi(p,c), tgt(c) = Σ_p bi(p,c), T = Σ bi, V =
    n_buckets — every operand BIGINT (≤ counts·2¹⁸, far inside
    int64), both divisions truncating, so DuckDB replays it with
    ``//`` bit-for-bit. Splitting the interpolation into two floors
    (instead of one floor over a common denominator) keeps every
    intermediate in int64; the ≤2/SCALE quantization difference is
    far below any ranking decision. All three count tables roll up
    from ONE pair-count aggregation — the target corpus is scanned
    and transition-exploded exactly once, as in ``fit_bigram_lm``."""
    spark = target_tr.sparkSession
    bi = target_tr.groupBy("pb", "cb").agg(F.count(F.lit(1)).alias("bc"))
    uni = bi.groupBy("pb").agg(F.sum("bc").alias("uc"))
    tgt = bi.groupBy("cb").agg(F.sum("bc").alias("tc"))
    tot = bi.agg(F.coalesce(F.sum("bc"), F.lit(0)).alias("T"))
    dense = (
        spark.range(n_buckets * n_buckets)
        .select(
            F.expr(f"id div {n_buckets}").alias("pb"),
            (F.col("id") % n_buckets).alias("cb"),
        )
        .join(bi, ["pb", "cb"], "left")
        .join(uni, "pb", "left")
        .join(tgt, "cb", "left")
        .join(F.broadcast(tot))
    )
    bi_num = (
        (F.coalesce(F.col("bc"), F.lit(0)) + 1) * F.lit(3 * scale)
    ).cast("long")
    bi_den = (
        (F.coalesce(F.col("uc"), F.lit(0)) + F.lit(n_buckets)) * 4
    ).cast("long")
    un_num = (
        (F.coalesce(F.col("tc"), F.lit(0)) + 1) * F.lit(scale)
    ).cast("long")
    un_den = ((F.col("T") + F.lit(n_buckets)) * 4).cast("long")
    return dense.select(
        "pb",
        "cb",
        bi_num.alias("__bn"),
        bi_den.alias("__bd"),
        un_num.alias("__un"),
        un_den.alias("__ud"),
    ).select(
        "pb",
        "cb",
        F.expr(
            "CAST((__bn div __bd) + (__un div __ud) AS BIGINT)"
        ).alias("score"),
    )


def fit_kneser_ney_lm(
    target_tr: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Kneser-Ney model (absolute discount d = 3/4): the third rung of
    the smoothing ladder — Laplace backs off to a flat floor, JM to
    the target's unigram FREQUENCY, KN to continuation DIVERSITY
    (in how many distinct contexts does this token appear?), which is
    what separates genuinely-versatile tokens from frequent-but-bound
    ones ("Francisco" is frequent yet follows only "San"). Same dense
    ``n_buckets**2``-row score contract, drop-in for
    lm_score/lm_select/the store.

    Exactness: with d = 3/4 and the continuation distribution
    pcont(c) = cc(c)/NP,

        s(p,c) = floor( SCALE·max(4·bi(p,c) - 3, 0) / (4·uni(p)) )
               + floor( SCALE·3·n1p(p)·cc(c) / (4·uni(p)·NP) )

    for seen contexts, and floor(SCALE·cc(c)/NP) when uni(p) = 0
    (pure continuation backoff). cc(c) = #distinct predecessors of c,
    n1p(p) = #distinct successors of p, NP = #distinct pairs — every
    count rolls up from ONE pair aggregation, every operand stays in
    int64 (SCALE·3·n1p·cc <= 2^16·3·256·256 ~ 1.3e10; denominators
    4·uni·NP <= ~2.6e11 at web-scale counts), both divisions truncate,
    so DuckDB replays the model with ``//`` bit-for-bit."""
    spark = target_tr.sparkSession
    bi = target_tr.groupBy("pb", "cb").agg(F.count(F.lit(1)).alias("bc"))
    uni = bi.groupBy("pb").agg(
        F.sum("bc").alias("uc"), F.count(F.lit(1)).alias("n1p")
    )
    cont = bi.groupBy("cb").agg(F.count(F.lit(1)).alias("cc"))
    tot = bi.agg(F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("NP"))
    dense = (
        spark.range(n_buckets * n_buckets)
        .select(
            F.expr(f"id div {n_buckets}").alias("pb"),
            (F.col("id") % n_buckets).alias("cb"),
        )
        .join(bi, ["pb", "cb"], "left")
        .join(uni, "pb", "left")
        .join(cont, "cb", "left")
        .join(F.broadcast(tot))
    )
    return dense.select(
        "pb",
        "cb",
        (
            F.greatest(
                F.coalesce(F.col("bc"), F.lit(0)) * 4 - 3, F.lit(0)
            )
            * F.lit(scale)
        ).cast("long").alias("__dn"),
        (F.coalesce(F.col("uc"), F.lit(0)) * 4).cast("long").alias("__dd"),
        (
            F.lit(3 * scale)
            * F.coalesce(F.col("n1p"), F.lit(0))
            * F.coalesce(F.col("cc"), F.lit(0))
        ).cast("long").alias("__cn"),
        (
            F.coalesce(F.col("uc"), F.lit(0))
            * 4
            * F.greatest(F.col("NP"), F.lit(1))
        ).cast("long").alias("__cd"),
        (
            F.lit(scale) * F.coalesce(F.col("cc"), F.lit(0))
        ).cast("long").alias("__bn"),
        F.greatest(F.col("NP"), F.lit(1)).cast("long").alias("__bd"),
    ).select(
        "pb",
        "cb",
        F.expr(
            "CAST(CASE WHEN __dd = 0 THEN __bn div __bd"
            " ELSE (__dn div __dd) + (__cn div __cd) END AS BIGINT)"
        ).alias("score"),
    )


def lm_score(
    candidates: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Per-doc fluency: exact BIGINT sum of transition scores and
    transition count, plus their double ratio. Plan: transition
    explode → broadcast model join → one doc-key groupBy.

    ``n_buckets`` MUST match the value the model was fitted with —
    a mismatch makes the inner join silently drop transitions whose
    rehashed bucket falls outside the model grid (no error, wrong
    scores). Pass it explicitly alongside any non-default model."""
    tr = transition_buckets(candidates, text_col, n_buckets)
    return (
        tr.join(F.broadcast(model), ["pb", "cb"])
        .groupBy(id_col)
        .agg(
            F.sum("score").alias("fluency_sum"),
            F.count(F.lit(1)).alias("n_transitions"),
        )
        .select(
            id_col,
            "fluency_sum",
            "n_transitions",
            (
                F.col("fluency_sum").cast("double")
                / F.col("n_transitions").cast("double")
            ).alias("fluency"),
        )
    )


def lm_select(
    candidates: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Top-``k`` candidates by mean transition likelihood (ties broken
    by ``id_col`` ascending — a total order, deterministic cut). The
    final top-k is a TakeOrdered, no single-partition global sort."""
    scored = lm_score(candidates, model, text_col, id_col, n_buckets)
    return scored.orderBy(
        F.col("fluency").desc(), F.col(id_col)
    ).limit(k)


def ppl_tercile_thresholds(
    scored: DataFrame, lang_col: str = "lang", id_col: str = "doc_id"
) -> DataFrame:
    """Per-language tercile BOUNDARIES of the fluency ranking — the
    CCNet production shape: cutoffs are computed once (here exactly;
    CCNet itself samples) and FROZEN, then any number of docs — today's
    corpus, tomorrow's batch, a stream — are bucketed by comparison,
    never by re-ranking. The boundary is the full (fluency, id) SORT
    KEY of the first row of buckets 1 and 2, so threshold assignment
    reproduces the rank assignment EXACTLY, ties included (a bare
    fluency cutoff could not split boundary ties). Output is one row
    per language: (lang, b1_f, b1_id, b2_f, b2_id), NULL-padded for
    languages with fewer than 3 docs."""
    from pyspark.sql import Window

    w = Window.partitionBy(lang_col).orderBy(
        F.col("fluency").desc(), F.col(id_col)
    )
    ranked = scored.select(
        lang_col, id_col, "fluency",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(lang_col)).alias("__cnt"),
    )
    # first row of bucket k sits at rn = ceil(k*cnt/3) + 1
    b1 = F.expr("CAST((__cnt + 2) div 3 AS BIGINT) + 1")
    b2 = F.expr("CAST((2 * __cnt + 2) div 3 AS BIGINT) + 1")
    return (
        ranked.groupBy(lang_col)
        .agg(
            F.max(F.when(F.col("__rn") == b1, F.col("fluency"))).alias("b1_f"),
            F.max(F.when(F.col("__rn") == b1, F.col(id_col))).alias("b1_id"),
            F.max(F.when(F.col("__rn") == b2, F.col("fluency"))).alias("b2_f"),
            F.max(F.when(F.col("__rn") == b2, F.col(id_col))).alias("b2_id"),
        )
    )


def assign_ppl_buckets(
    scored: DataFrame,
    thresholds: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bucket docs against FROZEN tercile boundaries: one broadcast
    join on language + a pure projection — no window, no shuffle of
    the scored corpus beyond what its own derivation needed. A doc is
    head if its (fluency desc, id asc) sort key precedes the bucket-1
    boundary row, middle if it precedes the bucket-2 boundary, else
    tail; a NULL boundary (language smaller than the bucket) keeps
    everything above it. The join is LEFT so a language absent from
    the frozen threshold table — a new language arriving in a later
    batch or stream — is not silently dropped: its boundaries are all
    NULL, which the NULL-boundary rule resolves to 'head' (nothing is
    known to outrank it yet); the next threshold refresh re-buckets
    it properly."""
    before = lambda bf, bid: (  # noqa: E731 — local sort-key comparator
        F.col(bf).isNull()
        | (F.col("fluency") > F.col(bf))
        | ((F.col("fluency") == F.col(bf)) & (F.col(id_col) < F.col(bid)))
    )
    return (
        scored.join(F.broadcast(thresholds), lang_col, "left")
        .withColumn(
            "bucket",
            F.when(before("b1_f", "b1_id"), F.lit("head"))
            .when(before("b2_f", "b2_id"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("b1_f", "b1_id", "b2_f", "b2_id")
    )


def write_lm_model(model: DataFrame, path: str) -> None:
    """Persist the dense (pb, cb, score) table — ``n_buckets**2`` rows
    regardless of the corpus that fitted it (~0.5 MB at the default
    256). The store-not-rescan contract of write_dsir_scores /
    write_components: fit once per target snapshot, score any number
    of arriving batches from the store."""
    model.coalesce(1).write.mode("overwrite").parquet(path)


def read_lm_model(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _lm_select_batch(
    batch_df: DataFrame,
    epoch: int,
    model_path: str,
    out_dir: str,
    text_col: str,
    id_col: str,
    k: int,
    n_buckets: int,
) -> None:
    """One ``streaming_lm_select`` micro-batch (module-level so replay
    idempotence is directly testable — the _dsir_select_batch
    pattern). The fitted model is READ-ONLY, so a crash-replay of an
    epoch overwrites ``out_dir/batch_id=N`` with the identical
    deterministic selection."""
    import posixpath

    spark = batch_df.sparkSession
    model = read_lm_model(spark, model_path)
    top = lm_select(batch_df, model, text_col, id_col, k, n_buckets)
    top.write.mode("overwrite").parquet(
        posixpath.join(out_dir, f"batch_id={epoch}")
    )


def streaming_lm_select(
    stream_docs: DataFrame,
    model_path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 100,
    n_buckets: int = DEFAULT_N_BUCKETS,
    checkpoint_dir: str | None = None,
):
    """Streaming LM-fluency ingest: score each arriving micro-batch
    against the PERSISTED dense transition model (``write_lm_model``
    output — fitted once, n_buckets**2 rows, never refit in-stream)
    and land the batch's top-k fluent docs idempotently under
    ``out_dir/batch_id=N``. Completes the batch / incremental /
    streaming triple exactly as the DSIR family does: per-batch cost
    is O(batch), the corpus that fitted the model is never rescanned.

    Returns the started StreamingQuery; await/stop is the caller's."""

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        _lm_select_batch(
            batch_df,
            epoch,
            model_path,
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


def write_ppl_thresholds(thresholds: DataFrame, path: str) -> None:
    """Persist the frozen per-language tercile boundary table (one row
    per language — metadata-sized at any corpus). The CCNet production
    contract: boundaries are extracted once per corpus snapshot, then
    any number of batches/streams bucket against the store with no
    re-rank."""
    thresholds.coalesce(1).write.mode("overwrite").parquet(path)


def read_ppl_thresholds(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _assign_buckets_batch(
    batch_df: DataFrame,
    epoch: int,
    model_path: str,
    thresholds_path: str,
    out_dir: str,
    text_col: str,
    id_col: str,
    lang_col: str,
    n_buckets: int,
) -> None:
    """One ``streaming_ppl_bucket_assign`` micro-batch (module-level so
    replay idempotence is directly testable). Both stores are
    READ-ONLY — scoring model and frozen thresholds — so a
    crash-replay of an epoch overwrites ``out_dir/batch_id=N`` with
    the identical deterministic assignment."""
    import posixpath

    spark = batch_df.sparkSession
    model = read_lm_model(spark, model_path)
    thresholds = read_ppl_thresholds(spark, thresholds_path)
    scored = lm_score(
        batch_df.select(id_col, text_col), model, text_col, id_col, n_buckets
    ).join(batch_df.select(id_col, lang_col), id_col)
    out = assign_ppl_buckets(scored, thresholds, lang_col, id_col).select(
        id_col, lang_col, "fluency", "bucket"
    )
    out.write.mode("overwrite").parquet(
        posixpath.join(out_dir, f"batch_id={epoch}")
    )


def streaming_ppl_bucket_assign(
    stream_docs: DataFrame,
    model_path: str,
    thresholds_path: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = DEFAULT_N_BUCKETS,
    checkpoint_dir: str | None = None,
):
    """Streaming frozen-threshold perplexity bucketing — the CCNet
    production shape end to end: each arriving micro-batch scores
    against the PERSISTED dense model and buckets against the
    PERSISTED frozen tercile boundary table (one broadcast join +
    lexicographic comparison), landing head/middle/tail assignments
    idempotently under ``out_dir/batch_id=N``. Nothing re-ranks,
    nothing refits, nothing rescans the corpus that produced either
    store — per-batch cost is O(batch). A language unseen by the
    thresholds buckets to 'head' (the ``assign_ppl_buckets``
    unknown-language rule) rather than dropping.

    Returns the started StreamingQuery; await/stop is the caller's."""

    def _batch(batch_df: DataFrame, epoch: int) -> None:
        _assign_buckets_batch(
            batch_df,
            epoch,
            model_path,
            thresholds_path,
            out_dir,
            text_col,
            id_col,
            lang_col,
            n_buckets,
        )

    writer = stream_docs.writeStream.foreachBatch(_batch).outputMode("update")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
