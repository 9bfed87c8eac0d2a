"""Persisted-benchmark streaming decontamination
(text.write_benchmark_set / batch_benchmark_overlap /
streaming_decontam): the store carries its own shingle width, batch
screening equals the in-session benchmark_overlap, landings are
replay-idempotent, and thresholded verdicts flag planted leakage."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.text import (
    _decontam_batch,
    batch_benchmark_overlap,
    benchmark_overlap,
    read_benchmark_set,
    streaming_decontam,
    write_benchmark_set,
)

BENCH_TEXT = "the quick brown fox jumps over the lazy dog near the river bank"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_roundtrip_carries_width(spark, tmp_path):
    bench = _docs(spark, [(0, BENCH_TEXT)])
    path = str(tmp_path / "bench")
    write_benchmark_set(bench, path, n=5)
    hashes, n = read_benchmark_set(spark, path)
    assert n == 5  # geometry from the artifact, not the caller
    # 13 tokens -> 9 distinct 5-gram shingles
    assert hashes.count() == 9


def test_batch_overlap_equals_in_session(spark, tmp_path):
    bench = _docs(spark, [(0, BENCH_TEXT)])
    corpus = _docs(
        spark,
        [
            (1, BENCH_TEXT),  # verbatim leak
            (2, "the quick brown fox jumps over something else entirely"),
            (3, "completely unrelated text about spark shuffles and joins"),
        ],
    )
    path = str(tmp_path / "bench")
    write_benchmark_set(bench, path, n=3)
    got = sorted(
        map(tuple, batch_benchmark_overlap(corpus, path).collect())
    )
    want = sorted(
        map(tuple, benchmark_overlap(corpus, bench, n=3).collect())
    )
    assert got == want
    ratios = {r[0]: r[3] for r in got}
    assert ratios[1] == 1.0  # verbatim leak: every shingle hits
    assert 0.0 < ratios[2] < 1.0  # shared prefix only
    assert ratios[3] == 0.0


def test_verdicts_land_idempotently_and_flag_leaks(spark, tmp_path):
    bench = _docs(spark, [(0, BENCH_TEXT)])
    path = str(tmp_path / "bench")
    write_benchmark_set(bench, path, n=3)
    out = str(tmp_path / "landed")

    b0 = _docs(spark, [(10, BENCH_TEXT), (11, "no overlap at all here")])
    _decontam_batch(b0, 0, path, out, 0.8, "text", "doc_id")
    landed = {
        r.doc_id: (r.batch_id, r.contaminated, r.overlap_ratio)
        for r in spark.read.parquet(out).collect()
    }
    assert landed[10] == (0, True, 1.0)
    assert landed[11][1] is False

    # crash-replay: identical partition content
    _decontam_batch(b0, 0, path, out, 0.8, "text", "doc_id")
    assert {
        r.doc_id: (r.batch_id, r.contaminated, r.overlap_ratio)
        for r in spark.read.parquet(out).collect()
    } == landed

    # a row-empty micro-batch lands nothing
    _decontam_batch(_docs(spark, []), 1, path, out, 0.8, "text", "doc_id")
    assert {r.batch_id for r in spark.read.parquet(out).collect()} == {0}


def test_streaming_decontam_end_to_end(spark, tmp_path):
    """A real readStream -> foreachBatch run over a JSON feed: the
    landed verdicts equal the batch screening."""
    bench = _docs(spark, [(0, BENCH_TEXT)])
    store = str(tmp_path / "bench")
    write_benchmark_set(bench, store, n=3)

    feed = tmp_path / "feed"
    feed.mkdir()
    with open(feed / "b0.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": BENCH_TEXT}) + "\n")
        f.write(
            json.dumps({"doc_id": 2, "text": "nothing shared with the suite"})
            + "\n"
        )

    out = str(tmp_path / "landed")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    q = streaming_decontam(
        stream, store, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                if spark.read.parquet(out).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()

    rows = {r.doc_id: r.contaminated for r in spark.read.parquet(out).collect()}
    assert rows == {1: True, 2: False}


def test_batch_screen_plan_never_reshingles_the_benchmark(spark, tmp_path):
    """Scale shape: the per-batch screening plan reads the persisted
    hash store — never re-shingles the benchmark corpus. The benchmark
    frame carries a distinctively-named text column (`body`) so its
    scan is identifiable: it must not appear in the screening plan,
    while the store parquet scan must."""
    bench = spark.createDataFrame([(0, BENCH_TEXT)], "doc_id long, body string")
    path = str(tmp_path / "bench")
    write_benchmark_set(bench, path, text_col="body", n=3)
    batch = _docs(spark, [(1, "the quick brown fox")])
    screened = batch_benchmark_overlap(batch, path)
    plan = screened._jdf.queryExecution().executedPlan().toString()
    assert "body" not in plan  # the benchmark is never re-shingled
    assert "Scan parquet" in plan  # the hash store is what's read


def test_empty_benchmark_store_write_fails_loud(spark, tmp_path):
    """An empty hash set would disable decontamination forever and
    silently — the write must refuse (the write_pq_index degenerate-
    build contract)."""
    import pytest

    with pytest.raises(ValueError, match="no 3-gram shingles"):
        write_benchmark_set(_docs(spark, []), str(tmp_path / "b1"), n=3)
    # texts shorter than n produce no shingles either
    with pytest.raises(ValueError, match="no 5-gram shingles"):
        write_benchmark_set(
            _docs(spark, [(0, "too short")]), str(tmp_path / "b2"), n=5
        )
