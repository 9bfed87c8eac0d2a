"""Persisted-reference drift monitoring (importance.write_drift_reference /
batch_drift_vs_reference / streaming_drift_monitor): the stored model
is dense and self-describing, batch monitoring equals the in-session
two-snapshot drift, micro-batch landings are replay-idempotent, and a
degenerate batch alerts (TV=1.0) instead of killing the stream."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.importance import (
    _drift_monitor_batch,
    batch_drift_vs_reference,
    distribution_drift,
    drift_summary,
    read_drift_reference,
    streaming_drift_monitor,
    token_buckets,
    write_drift_reference,
)

N_BUCKETS = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_reference_store_is_dense_and_self_describing(spark, tmp_path):
    ref = _docs(spark, [(i, "alpha beta gamma") for i in range(10)])
    path = str(tmp_path / "model")
    write_drift_reference(token_buckets(ref, "text", N_BUCKETS), path, N_BUCKETS)
    stored, n_buckets = read_drift_reference(spark, path)
    assert n_buckets == N_BUCKETS  # geometry derived from the artifact
    rows = stored.collect()
    assert len(rows) == N_BUCKETS
    assert sum(r.ref_count for r in rows) == 30
    assert {r.bucket for r in rows} == set(range(N_BUCKETS))


def test_reference_write_bucketing_mismatch_fails_loud(spark, tmp_path):
    ref = _docs(spark, [(i, f"alpha w{i}") for i in range(30)])
    wide = token_buckets(ref, "text", 512)  # buckets up to 511
    with pytest.raises(Exception, match="different n_buckets"):
        write_drift_reference(wide, str(tmp_path / "model"), 8)


def test_batch_monitor_equals_in_session_drift(spark, tmp_path):
    ref = _docs(spark, [(i, "alpha beta") for i in range(10)])
    new = _docs(
        spark,
        [(i, "alpha beta") for i in range(10)]
        + [(100 + i, "spam spam spam spam") for i in range(5)],
    )
    path = str(tmp_path / "model")
    ref_tok = token_buckets(ref, "text", N_BUCKETS)
    write_drift_reference(ref_tok, path, N_BUCKETS)

    got = sorted(
        map(tuple, batch_drift_vs_reference(new, path, "text").collect())
    )
    want = sorted(
        map(
            tuple,
            distribution_drift(
                ref_tok, token_buckets(new, "text", N_BUCKETS), N_BUCKETS
            ).collect(),
        )
    )
    assert got == want
    row = drift_summary(batch_drift_vs_reference(new, path, "text")).first()
    assert row.total_variation == 0.5  # the planted-spam exact value


def test_monitor_batches_land_idempotently(spark, tmp_path):
    ref = _docs(spark, [(i, "alpha beta") for i in range(10)])
    path = str(tmp_path / "model")
    write_drift_reference(token_buckets(ref, "text", N_BUCKETS), path, N_BUCKETS)
    out = str(tmp_path / "landed")

    b0 = _docs(spark, [(10, "alpha beta"), (11, "alpha beta")])  # no drift
    b1 = _docs(spark, [(20, "spam spam spam spam")])  # all-new vocab
    _drift_monitor_batch(b0, 0, path, out, "text")
    _drift_monitor_batch(b1, 1, path, out, "text")

    landed = {
        r.batch_id: (r.ref_tokens, r.new_tokens, r.total_variation, r.buckets_moved)
        for r in spark.read.parquet(out).collect()
    }
    assert landed[0] == (20, 4, 0.0, 0)
    # disjoint vocab: ref {alpha,beta} vs new {spam} -> TV = 1.0
    assert landed[1] == (20, 4, 1.0, 3)

    # crash-replay of epoch 1: identical partition content
    _drift_monitor_batch(b1, 1, path, out, "text")
    assert {
        r.batch_id: (r.ref_tokens, r.new_tokens, r.total_variation, r.buckets_moved)
        for r in spark.read.parquet(out).collect()
    } == landed

    # a row-empty micro-batch lands nothing (no data != drift)
    _drift_monitor_batch(_docs(spark, []), 2, path, out, "text")
    assert set(
        r.batch_id for r in spark.read.parquet(out).collect()
    ) == {0, 1}


def test_token_empty_batch_alerts_instead_of_crashing(spark, tmp_path):
    """Documents with no tokens at all: the streaming leg must report
    the disjoint value 1.0 (alert fires) rather than raise and kill
    the stream — the empty_is_disjoint contract."""
    ref = _docs(spark, [(i, "alpha beta") for i in range(5)])
    path = str(tmp_path / "model")
    write_drift_reference(token_buckets(ref, "text", N_BUCKETS), path, N_BUCKETS)
    out = str(tmp_path / "landed")
    _drift_monitor_batch(_docs(spark, [(1, ""), (2, "   ")]), 0, path, out, "text")
    row = spark.read.parquet(out).first()
    assert row.new_tokens == 0
    assert row.total_variation == 1.0


def test_streaming_drift_monitor_end_to_end(spark, tmp_path):
    """A real readStream -> foreachBatch run over a JSON file feed:
    the landed summary rows equal the batch computation."""
    ref = _docs(spark, [(i, "alpha beta") for i in range(10)])
    model = str(tmp_path / "model")
    write_drift_reference(token_buckets(ref, "text", N_BUCKETS), model, N_BUCKETS)

    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "b0.json", "w") as f:
        for i in range(4):
            f.write(json.dumps({"doc_id": i, "text": "alpha beta"}) + "\n")
        for i in range(4):
            f.write(json.dumps({"doc_id": 100 + i, "text": "spam spam"}) + "\n")

    out = str(tmp_path / "landed")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = streaming_drift_monitor(
        stream, model, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()

    row = spark.read.parquet(out).first()
    # ref {alpha:10, beta:10}/20, batch {alpha:4, beta:4, spam:8}/16
    # TV = (|4*20-10*16|*2 + |8*20-0|) / (2*20*16) = (80+80+160)/640
    assert (row.ref_tokens, row.new_tokens) == (20, 16)
    assert row.total_variation == 0.5
    assert row.buckets_moved == 3


def test_batch_monitor_plan_never_rescans_the_reference(spark, tmp_path):
    """Scale shape: the per-batch drift plan must read the persisted
    n_buckets-row model — never re-tokenize the reference corpus. The
    reference frame carries a distinctively-named text column (`body`)
    so its scan is identifiable: it must not appear anywhere in the
    monitored plan, while the model parquet scan must."""
    ref = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)],
        "doc_id long, body string",
    )
    path = str(tmp_path / "model")
    write_drift_reference(token_buckets(ref, "body", N_BUCKETS), path, N_BUCKETS)

    batch = _docs(spark, [(1, "alpha delta")])
    monitored = batch_drift_vs_reference(batch, path, "text")
    plan = monitored._jdf.queryExecution().executedPlan().toString()
    assert "body" not in plan  # the reference corpus is never rescanned
    assert "Scan parquet" in plan  # the model store is what's read


def test_empty_reference_write_fails_loud(spark, tmp_path):
    """A token-free reference corpus must refuse to persist an
    all-zero model (the failure would otherwise surface batches later,
    far from its cause)."""
    with pytest.raises(Exception, match="no tokens"):
        write_drift_reference(
            token_buckets(_docs(spark, []), "text", N_BUCKETS),
            str(tmp_path / "m1"),
            N_BUCKETS,
        )
    with pytest.raises(Exception, match="no tokens"):
        write_drift_reference(
            token_buckets(_docs(spark, [(1, "  ")]), "text", N_BUCKETS),
            str(tmp_path / "m2"),
            N_BUCKETS,
        )
