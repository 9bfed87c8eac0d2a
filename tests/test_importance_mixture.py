"""Semantic unit tests for the r10 selection/planning operators —
properties the oracle hash compare can't state: DSIR actually prefers
target-like docs, temperature quotas flatten the head and sum exactly,
vocab coverage is a monotone curve."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.importance import (
    dsir_bucket_scores,
    dsir_select,
    token_buckets,
)
from airbnb_cdc_spark.operators.sampling import temperature_mixture_plan
from airbnb_cdc_spark.operators.text import vocab_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_dsir_prefers_target_like_docs(spark):
    # Target talks about "spark shuffle join"; candidate 10 matches it,
    # candidate 11 is off-distribution. DSIR must rank 10 first.
    df = _docs(
        spark,
        [
            (0, "tgt", "spark shuffle join spark shuffle join"),
            (1, "tgt", "join shuffle spark plan"),
            (10, "raw", "spark shuffle join plan"),
            (11, "raw", "banana apple cherry mango"),
        ],
    )
    tok = token_buckets(df, "text")
    scores = dsir_bucket_scores(tok.filter(F.col("source") == "tgt"), tok)
    top = dsir_select(
        df.filter(F.col("source") == "raw"), scores, "text", "doc_id", k=2
    ).collect()
    assert [r.doc_id for r in top] == [10, 11]
    assert top[0].dsir_score > top[1].dsir_score


def test_dsir_empty_target_still_total_order(spark):
    # No target docs at all: smoothing keeps every score defined and
    # the k-cut remains a total order (score desc, doc_id asc).
    df = _docs(spark, [(0, "raw", "a b c"), (1, "raw", "a b c")])
    tok = token_buckets(df, "text")
    scores = dsir_bucket_scores(
        tok.filter(F.col("source") == "nope"), tok
    )
    got = dsir_select(df, scores, "text", "doc_id", k=2).collect()
    assert [r.doc_id for r in got] == [0, 1]
    assert got[0].dsir_score == got[1].dsir_score


def test_temperature_quotas_sum_exactly_and_flatten(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 90 else "fr") for i in range(100)],
        "doc_id long, lang string",
    )
    plan = {
        r.lang: r for r in temperature_mixture_plan(df, "lang", 777).collect()
    }
    assert sum(r.quota for r in plan.values()) == 777
    # raw head share 90% -> tau=0.5 share sqrt(90)/(sqrt(90)+sqrt(10)) = 75%
    assert plan["en"].quota < 0.9 * 777
    assert plan["en"].quota > plan["fr"].quota


def test_temperature_single_group_takes_all(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = temperature_mixture_plan(df, "lang", 5000).collect()
    assert len(plan) == 1 and plan[0].quota == 5000


def test_vocab_coverage_monotone_and_clamped(spark):
    df = spark.createDataFrame(
        [(0, "a a a a b b c"), (1, "a b c d")],
        "doc_id long, text string",
    )
    rows = {
        r.vocab_size: r
        for r in vocab_coverage(df, [1, 2, 100], id_col="doc_id").collect()
    }
    assert rows[1].covered_tokens == 5  # "a" x5
    assert rows[1].coverage < rows[2].coverage <= rows[100].coverage
    assert rows[100].coverage == 1.0  # clamp past n_distinct
    assert rows[100].n_distinct == 4
    assert rows[100].total_tokens == 11


def test_dsir_score_store_roundtrip_scores_new_batch(spark, tmp_path):
    # Fit on the corpus, persist the model, then score a NEW batch in
    # a fresh lineage — the corpus is never touched again (O(batch)
    # incremental ingest).
    from airbnb_cdc_spark.operators.importance import (
        read_dsir_scores,
        write_dsir_scores,
    )

    corpus = _docs(
        spark,
        [(0, "tgt", "spark shuffle join"), (1, "raw", "banana apple")],
    )
    tok = token_buckets(corpus, "text")
    scores = dsir_bucket_scores(tok.filter(F.col("source") == "tgt"), tok)
    path = str(tmp_path / "dsir_model")
    write_dsir_scores(scores, path)

    stored = read_dsir_scores(spark, path)
    assert stored.count() == 512
    batch = _docs(
        spark,
        [(10, "raw", "spark shuffle join"), (11, "raw", "banana mango")],
    )
    top = dsir_select(batch, stored, "text", "doc_id", k=2).collect()
    assert [r.doc_id for r in top] == [10, 11]
    # identical to scoring against the un-persisted model
    live = dsir_select(batch, scores, "text", "doc_id", k=2).collect()
    assert [(r.doc_id, r.dsir_score) for r in top] == [
        (r.doc_id, r.dsir_score) for r in live
    ]


def test_temperature_sample_sizes_are_the_quotas(spark):
    from airbnb_cdc_spark.operators.sampling import temperature_mixture_plan
    from airbnb_cdc_spark.operators.aggregate import topk_per_group
    from airbnb_cdc_spark.functions.textfns import h60

    docs = spark.createDataFrame(
        [(i, "en" if i < 40 else "fr") for i in range(50)],
        "doc_id long, lang string",
    )
    plan = temperature_mixture_plan(docs, "lang", 20).select("lang", "quota")
    ranked = topk_per_group(
        docs.select(
            "lang", "doc_id", h60(F.col("doc_id").cast("string")).alias("__h")
        ),
        ["lang"],
        [F.col("__h"), F.col("doc_id")],
        20,
    )
    sample = (
        ranked.join(F.broadcast(plan), "lang")
        .filter(F.col("rnk") <= F.col("quota"))
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r.lang: r["count"] for r in sample}
    want = {r.lang: r.quota for r in plan.collect()}
    assert got == want and sum(got.values()) == 20


def test_guards_reject_bad_inputs(spark):
    import pytest

    df = spark.createDataFrame([(1, "en", "a b")], "doc_id long, lang string, text string")
    with pytest.raises(ValueError, match="budget"):
        temperature_mixture_plan(df, "lang", -1)
    with pytest.raises(ValueError, match="power of two"):
        temperature_mixture_plan(df, "lang", 10, weight_scale=1000)
    with pytest.raises(ValueError, match="positive"):
        vocab_coverage(df, [0, 4])
    # duplicate sizes collapse to one row each
    rows = vocab_coverage(df, [4, 4, 2]).collect()
    assert sorted(r.vocab_size for r in rows) == [2, 4]


def test_streaming_dsir_batches_match_batch_scoring(spark, tmp_path):
    """The foreachBatch leg: per-batch selections against the stored
    model equal batch dsir_select on the same rows, and a crash-replay
    of an epoch overwrites its partition with identical content."""
    from airbnb_cdc_spark.operators.importance import (
        _dsir_select_batch,
        read_dsir_scores,
        write_dsir_scores,
    )

    corpus = _docs(
        spark,
        [(0, "tgt", "spark shuffle join plan"), (1, "raw", "banana apple")],
    )
    tok = token_buckets(corpus, "text")
    model_path = str(tmp_path / "model")
    write_dsir_scores(
        dsir_bucket_scores(tok.filter(F.col("source") == "tgt"), tok),
        model_path,
    )
    out = str(tmp_path / "sel")

    b0 = spark.createDataFrame(
        [(10, "spark shuffle join"), (11, "banana mango")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(20, "join plan shuffle spark")], "doc_id long, text string"
    )
    _dsir_select_batch(b0, 0, model_path, out, "text", "doc_id", 1, 512)
    _dsir_select_batch(b1, 1, model_path, out, "text", "doc_id", 1, 512)

    landed = {
        (r.doc_id, r.dsir_score, r.batch_id)
        for r in spark.read.parquet(out).collect()
    }
    stored = read_dsir_scores(spark, model_path)
    want = set()
    for df, ep in ((b0, 0), (b1, 1)):
        row = dsir_select(df, stored, "text", "doc_id", 1).collect()[0]
        want.add((row.doc_id, row.dsir_score, ep))
    assert landed == want
    assert {r[0] for r in landed} == {10, 20}  # target-like docs win

    # crash-replay of epoch 0: identical partition content
    _dsir_select_batch(b0, 0, model_path, out, "text", "doc_id", 1, 512)
    assert {
        (r.doc_id, r.dsir_score, r.batch_id)
        for r in spark.read.parquet(out).collect()
    } == want
