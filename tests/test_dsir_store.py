"""DSIR derive-once stores (queries.dsir_model_store /
queries.dsir_scored_store): store reads must be value-identical to a
fresh refit/re-score and the scoring pass must run once per process —
the lm_scored_store contract applied to the target-likeness axis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import airbnb_cdc_spark.queries as q
from airbnb_cdc_spark.operators import importance as imp

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def fresh_dsir_memos(monkeypatch):
    monkeypatch.setattr(q, "_DSIR_MODEL_PATHS", {})
    monkeypatch.setattr(q, "_DSIR_SCORED_PATHS", {})


def test_model_and_scored_store_equal_refit(spark, fresh_dsir_memos):
    from airbnb_cdc_spark.session import load_table

    stored_model = q.dsir_model_store(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents")
    tok = imp.token_buckets(
        docs.select("doc_id", "source", "text"), "text", q._DSIR_BUCKETS
    )
    fresh_model = imp.dsir_bucket_scores(
        tok.filter(F.col("source") == q._DSIR_TARGET),
        tok,
        q._DSIR_BUCKETS,
        q._DSIR_SCALE,
    )
    assert stored_model.count() == q._DSIR_BUCKETS
    assert sorted(map(tuple, stored_model.collect())) == sorted(
        map(tuple, fresh_model.collect())
    )
    # the per-doc scored store equals a fresh scoring pass
    stored_scored = {
        (r.doc_id, r.dsir_score)
        for r in q.dsir_scored_store(spark, SF_DIR).collect()
    }
    cand = docs.filter(F.col("source") != q._DSIR_TARGET).select(
        "doc_id", "text"
    )
    ctok = imp.token_buckets(cand, "text", q._DSIR_BUCKETS)
    fresh_scored = {
        (r.doc_id, r.dsir_score)
        for r in ctok.join(F.broadcast(fresh_model), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("score").alias("dsir_score"))
        .collect()
    }
    assert stored_scored == fresh_scored


def test_select_from_store_equals_direct_select(spark, fresh_dsir_memos):
    from airbnb_cdc_spark.session import load_table

    via_store = q.QUERIES["dsir_select"](spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    tok = imp.token_buckets(
        docs.select("doc_id", "source", "text"), "text", q._DSIR_BUCKETS
    )
    scores = imp.dsir_bucket_scores(
        tok.filter(F.col("source") == q._DSIR_TARGET),
        tok,
        q._DSIR_BUCKETS,
        q._DSIR_SCALE,
    )
    cand = docs.filter(F.col("source") != q._DSIR_TARGET).select(
        "doc_id", "text"
    )
    direct = imp.dsir_select(
        cand, scores, "text", "doc_id", q._DSIR_K, q._DSIR_BUCKETS
    ).collect()
    assert sorted(map(tuple, via_store)) == sorted(map(tuple, direct))


def test_scoring_pass_runs_once(spark, fresh_dsir_memos, monkeypatch):
    calls = {"n": 0}
    real = imp.dsir_bucket_scores

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(imp, "dsir_bucket_scores", counting)
    q.QUERIES["dsir_select"](spark, SF_DIR).count()
    q.QUERIES["target_fluency_gate"](spark, SF_DIR).count()
    assert calls["n"] == 1  # the gate read the store, no refit
