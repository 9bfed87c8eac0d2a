"""On-cluster BPE (operators/bpe.py): textbook merge selection and
greedy non-overlapping application, early stop, rule-order-sensitive
apply, and the zero-shuffle apply plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.bpe import bpe_apply, bpe_fit


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fit_picks_most_frequent_pair_and_retokenizes(spark):
    # "a b" occurs 3x (most frequent); after merging it, "a b c"
    # occurs 2x and becomes merge #2
    docs = _docs(spark, ["a b c", "a b c", "a b d"])
    rules = bpe_fit(docs, n_merges=2)
    assert [(r[1], r[2]) for r in rules] == [("a", "b"), ("a b", "c")]
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, rules).collect()
    }
    assert out[0] == ["a b c"]
    assert out[1] == ["a b c"]
    assert out[2] == ["a b", "d"]


def test_greedy_merge_is_nonoverlapping_left_to_right(spark):
    # "x x x x x": (x,x) pairs count 4, but the greedy left-to-right
    # apply joins positions (1,2) and (3,4), leaving the 5th alone
    docs = _docs(spark, ["x x x x x"])
    rules = bpe_fit(docs, n_merges=1)
    assert (rules[0][1], rules[0][2]) == ("x", "x")
    out = bpe_apply(docs, rules).collect()[0].bpe_tokens
    assert out == ["x x", "x x", "x"]


def test_tiebreak_is_lexicographic_total_order(spark):
    # (a,z) and (b,y) both occur twice — the (count desc, left asc,
    # right asc) key must pick (a,z) deterministically
    docs = _docs(spark, ["a z q b y", "b y q a z"])
    rules = bpe_fit(docs, n_merges=1)
    assert (rules[0][1], rules[0][2]) == ("a", "z")


def test_early_stop_below_min_count(spark):
    # every pair unique -> nothing reaches min_count=2 -> no rules
    docs = _docs(spark, ["a b", "c d", "e f"])
    assert bpe_fit(docs, n_merges=5, min_count=2) == []
    # min_count=1 fits something
    assert len(bpe_fit(docs, n_merges=5, min_count=1)) >= 1


def test_empty_and_single_token_docs_survive(spark):
    docs = _docs(spark, ["", "solo", "a b a b"])
    rules = bpe_fit(docs, n_merges=1)
    out = {r.doc_id: r.bpe_tokens for r in bpe_apply(docs, rules).collect()}
    assert out[0] == []
    assert out[1] == ["solo"]
    assert out[2] == ["a b", "a b"]


def test_apply_plan_is_shuffle_free(spark):
    docs = _docs(spark, ["a b c d", "a b a b"])
    rules = bpe_fit(docs, n_merges=3, min_count=1)
    plan = (
        bpe_apply(docs, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pure per-row projection: the fitted rules are literals in the
    # expression, so the apply fuses into any scan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
