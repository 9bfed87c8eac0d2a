"""Incremental MinHash near-dup against a stored signature table: the
corpus text must never be needed again — detection, thresholding, and
best-match selection all run on the fixed-k signatures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.dedup import (
    incremental_minhash_neardup,
    minhash_signatures,
)


def _corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight nine"),
        (3, "red orange yellow green blue indigo violet pink"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_minhash_detects_planted_neardup(spark):
    corpus = _corpus(spark)
    store = minhash_signatures(corpus, max_doc_freq=None)
    # signatures only — k bigints per doc, no text column in the store
    assert set(store.columns) == {"doc_id"} | {f"mh{j}" for j in range(8)}

    batch = spark.createDataFrame(
        [
            # identical to corpus doc 1 -> all k signatures agree
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            # one word changed vs doc 2 -> most signatures agree
            (11, "one two three four five six seven eight ten"),
            # unrelated -> below min_agree, absent from the result
            (12, "completely different words about other topics entirely"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.match_id, r.n_agree)
        for r in incremental_minhash_neardup(batch, store).collect()
    }
    assert got[10] == (1, 8)
    assert 11 in got and got[11][0] == 2 and got[11][1] >= 4
    assert 12 not in got


def test_incremental_minhash_best_match_tiebreak(spark):
    # two identical corpus docs: the batch copy agrees 8/8 with both;
    # the tie must deterministically pick the SMALLEST corpus id
    corpus = spark.createDataFrame(
        [
            (5, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id long, text string",
    )
    store = minhash_signatures(corpus, max_doc_freq=None)
    batch = spark.createDataFrame(
        [(9, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    [r] = incremental_minhash_neardup(batch, store).collect()
    assert (r.doc_id, r.match_id, r.n_agree) == (9, 4, 8)


def test_incremental_minhash_validates_inputs(spark):
    corpus = _corpus(spark)
    store = minhash_signatures(corpus, max_doc_freq=None)
    batch = _corpus(spark)
    with pytest.raises(ValueError, match="band_size"):
        incremental_minhash_neardup(batch, store, band_size=3)
    with pytest.raises(ValueError, match="min_agree"):
        incremental_minhash_neardup(batch, store, min_agree=9)
    with pytest.raises(ValueError, match="signature columns"):
        incremental_minhash_neardup(batch, store.drop("mh3"))


def test_incremental_minhash_empty_batch(spark):
    corpus = _corpus(spark)
    store = minhash_signatures(corpus, max_doc_freq=None)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_minhash_neardup(empty, store).count() == 0
