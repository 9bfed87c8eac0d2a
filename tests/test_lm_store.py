"""LM derive-once stores (queries.lm_model_store /
queries.lm_scored_store): a store read must be value-identical to a
fresh refit/re-score, derivation must run once per (sf_dir, kind,
process), and the three smoothing kinds must stay distinct — the
store layer is a cache, never a semantic change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import airbnb_cdc_spark.queries as q
from airbnb_cdc_spark.operators import lm as lm_ops

SF_DIR = "/root/testdata/sf0.001"
KINDS = ["laplace", "jm", "kn"]


@pytest.fixture()
def fresh_lm_memos(monkeypatch):
    monkeypatch.setattr(q, "_LM_MODEL_PATHS", {})
    monkeypatch.setattr(q, "_LM_SCORED_PATHS", {})


@pytest.mark.parametrize("kind", KINDS)
def test_model_store_equals_refit(spark, fresh_lm_memos, kind):
    from airbnb_cdc_spark.session import load_table

    stored = q.lm_model_store(spark, SF_DIR, kind)
    docs = load_table(spark, SF_DIR, "documents")
    tr = lm_ops.transition_buckets(
        docs.select("doc_id", "source", "text"), "text", q._LM_BUCKETS
    )
    fit = getattr(lm_ops, q._LM_FITTERS[kind])
    fresh = fit(
        tr.filter(F.col("source") == q._LM_TARGET),
        q._LM_BUCKETS,
        q._LM_SCALE,
    )
    assert stored.count() == q._LM_BUCKETS * q._LM_BUCKETS
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_scored_store_equals_rescore(spark, fresh_lm_memos):
    from airbnb_cdc_spark.session import load_table

    stored = q.lm_scored_store(spark, SF_DIR, "laplace")
    docs = load_table(spark, SF_DIR, "documents")
    cand = docs.filter(F.col("source") != q._LM_TARGET).select(
        "doc_id", "text"
    )
    fresh = lm_ops.lm_score(
        cand,
        q.lm_model_store(spark, SF_DIR, "laplace"),
        "text",
        "doc_id",
        q._LM_BUCKETS,
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_model_store_fits_once_per_kind(spark, fresh_lm_memos, monkeypatch):
    calls = {"n": 0}
    real = lm_ops.fit_bigram_lm

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(lm_ops, "fit_bigram_lm", counting)
    first = q.lm_model_store(spark, SF_DIR, "laplace").collect()
    second = q.lm_model_store(spark, SF_DIR, "laplace").collect()
    assert calls["n"] == 1  # second call read the store, no refit
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_kinds_are_distinct_models(spark, fresh_lm_memos):
    """The memo key includes the smoothing kind — JM/KN reads must not
    alias the Laplace store (they produce different score tables)."""
    scores = {
        kind: {
            (r.pb, r.cb): r.score
            for r in q.lm_model_store(spark, SF_DIR, kind).collect()
        }
        for kind in KINDS
    }
    assert scores["laplace"] != scores["jm"]
    assert scores["jm"] != scores["kn"]
    assert scores["laplace"] != scores["kn"]
