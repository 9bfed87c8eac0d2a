"""Corpus-drift monitor (importance.distribution_drift /
drift_summary): exact total-variation semantics, planted-drift
detection, and the dense metadata-sized output contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.importance import (
    distribution_drift,
    drift_summary,
    token_buckets,
)

N_BUCKETS = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket_of(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % N_BUCKETS


def _tok(df):
    return token_buckets(df, "text", N_BUCKETS)


def test_identical_corpora_have_zero_drift(spark):
    docs = _docs(spark, [(i, f"alpha beta gamma w{i}") for i in range(20)])
    per = distribution_drift(_tok(docs), _tok(docs), N_BUCKETS)
    assert per.count() == N_BUCKETS  # dense at any corpus
    assert per.filter(F.col("drift_num") != 0).count() == 0
    row = drift_summary(per).first()
    assert row.total_variation == 0.0
    assert row.buckets_moved == 0
    assert row.ref_tokens == row.new_tokens == 80


def test_planted_drift_tops_the_report(spark):
    """The new snapshot floods one token ('spam'): its bucket must
    carry the largest drift_num, and total variation must equal the
    exact hand-computed rational."""
    ref = _docs(spark, [(i, "alpha beta") for i in range(10)])  # 20 tokens
    new = _docs(
        spark,
        [(i, "alpha beta") for i in range(10)]
        + [(100 + i, "spam spam spam spam") for i in range(5)],  # +20 spam
    )
    per = distribution_drift(_tok(ref), _tok(new), N_BUCKETS)
    top = per.orderBy(F.col("drift_num").desc(), "bucket").first()
    assert top.bucket == _bucket_of("spam")
    assert (top.ref_count, top.new_count) == (0, 20)
    # exact TV: ref = {alpha:10, beta:10}/20; new = {alpha:10, beta:10,
    # spam:20}/40 -> |0.5-0.25|*2 + |0-0.5| = 0.5, halved twice = 0.5
    row = drift_summary(per).first()
    assert row.total_variation == 0.5
    assert row.buckets_moved == 3  # alpha, beta, spam all moved share


def test_drift_output_is_metadata_sized_and_exact_integer(spark):
    """The per-bucket frame is exactly n_buckets rows regardless of
    corpus size, and drift_num replays as |new*R - ref*N| in exact
    integers (the DECIMAL(38,0) discipline)."""
    ref = _docs(spark, [(i, " ".join(f"w{j}" for j in range(10))) for i in range(50)])
    new = _docs(spark, [(i, " ".join(f"w{j}" for j in range(7))) for i in range(80)])
    per = distribution_drift(_tok(ref), _tok(new), N_BUCKETS)
    rows = per.collect()
    assert len(rows) == N_BUCKETS
    R = sum(r.ref_count for r in rows)
    N = sum(r.new_count for r in rows)
    assert (R, N) == (500, 560)
    for r in rows:
        assert int(r.drift_num) == abs(r.new_count * R - r.ref_count * N)


def test_bucketing_mismatch_fails_loud(spark):
    """token_buckets built with MORE buckets than the drift call's
    n_buckets is a bucketing mismatch: the dense join would silently
    discard the out-of-range buckets and understate drift — it must
    raise instead."""
    import pytest

    docs = _docs(spark, [(i, f"alpha beta w{i}") for i in range(30)])
    wide = token_buckets(docs, "text", 512)  # buckets up to 511
    with pytest.raises(Exception, match="different n_buckets"):
        distribution_drift(wide, wide, 8).collect()


def test_empty_snapshot_fails_loud(spark):
    """An empty reference or new snapshot must raise, not emit a NULL
    total_variation an alerting threshold would silently ignore."""
    import pytest

    docs = _docs(spark, [(i, "alpha beta") for i in range(5)])
    empty = _docs(spark, [])
    per = distribution_drift(_tok(docs), _tok(empty), N_BUCKETS)
    assert per.count() == N_BUCKETS  # the per-bucket table itself is fine
    with pytest.raises(Exception, match="empty snapshot"):
        drift_summary(per).collect()
    with pytest.raises(Exception, match="empty snapshot"):
        drift_summary(
            distribution_drift(_tok(empty), _tok(docs), N_BUCKETS)
        ).collect()
