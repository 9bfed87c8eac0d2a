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


def test_streaming_minhash_batches_replay_and_cross_run(spark, tmp_path):
    """The foreachBatch leg: (a) keepers' signatures accumulate so a
    later batch's recurrence is suppressed against the STORE, (b) a
    crash-replay of an epoch under the same run_id is a no-op, (c) a
    second run reusing epoch 0 still sees the first run's history."""
    from airbnb_cdc_spark.operators.dedup import _minhash_neardup_batch
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    store = ParquetMergeTable(spark, str(tmp_path / "sigstore"), ["doc_id"])
    report = str(tmp_path / "report")
    text = "alpha beta gamma delta epsilon zeta eta theta"

    def run(rows, epoch, run_id):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        _minhash_neardup_batch(
            df, epoch, store, report, "doc_id", "text", 3, 8, 2, 4,
            run_id=run_id,
        )

    run([(1, text), (2, "one two three four five six seven")], 0, "runA")
    # batch 1 re-sends doc 1's text -> matched against the store
    run([(3, text)], 1, "runA")
    rep = {
        (r.doc_id, r.match_id)
        for r in spark.read.parquet(report).collect()
    }
    assert rep == {(3, 1)}
    store_rows = {
        (r.doc_id, r.batch_id, r.run_id) for r in store.read().collect()
    }
    assert store_rows == {(1, 0, "runA"), (2, 0, "runA")}  # 3 was a dup

    # crash-replay of epoch 1: identical report, store unchanged
    run([(3, text)], 1, "runA")
    assert {
        (r.doc_id, r.match_id) for r in spark.read.parquet(report).collect()
    } == rep
    assert {
        (r.doc_id, r.batch_id, r.run_id) for r in store.read().collect()
    } == store_rows

    # a NEW run restarting at epoch 0 must still be suppressed by
    # run A's epoch-0 signatures (the cross-run advice protocol)
    report_b = str(tmp_path / "report_b")
    df = spark.createDataFrame([(9, text)], "doc_id long, text string")
    _minhash_neardup_batch(
        df, 0, store, report_b, "doc_id", "text", 3, 8, 2, 4, run_id="runB"
    )
    assert {
        (r.doc_id, r.match_id)
        for r in spark.read.parquet(report_b).collect()
    } == {(9, 1)}
    assert {
        (r.doc_id, r.batch_id, r.run_id) for r in store.read().collect()
    } == store_rows
