"""Streaming document-ingestion pipeline: quality gate → watermarked
exact dedup → parquet sink, with checkpointed restart. Exercises the
text operators' stream-composability (pure projections/filters chain
onto a readStream without modification).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.dedup import streaming_exact_dedup
from airbnb_cdc_spark.operators.text import quality_filter, quality_predicate

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

GOOD = (
    "the quick brown fox jumps over a lazy dog and then the fox runs "
    "into the woods to find a quiet place for a long nap today"
)
GOOD2 = (
    "a ship sails across the wide sea and the crew watches stars to "
    "steer by while the wind pushes them toward a distant port of call"
)
BAD_SHORT = "too short"
BAD_REPEAT = "spam " * 40  # long enough, but distinct_ratio ~ 0


def _write_feed(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_quality_dedup_pipeline(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2025, 6, 1, 9, 0)

    def doc(i, minutes, text):
        return {
            "doc_id": i,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(sep=" "),
            "text": text,
        }

    _write_feed(
        feed / "b0.json",
        [
            doc(1, 0, GOOD),
            doc(2, 1, BAD_SHORT),
            doc(3, 2, BAD_REPEAT),
            doc(4, 3, GOOD),  # exact dup of doc 1
            doc(5, 4, GOOD2),
        ],
    )
    now = time.time()
    os.utime(feed / "b0.json", (now - 60, now - 60))

    def run():
        stream = spark.readStream.schema(DOC_SCHEMA).json(str(feed))
        cleaned = streaming_exact_dedup(stream.filter(quality_predicate()))
        q = (
            cleaned.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {1, 5}  # bad docs gated, dup dropped, one good survivor each

    # restart with one new file: only the new docs are processed
    _write_feed(
        feed / "b1.json",
        [doc(6, 10, GOOD2), doc(7, 11, "the stars and the sea of " * 8)],
    )
    os.utime(feed / "b1.json", (now, now))
    run()
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    # doc 6 is a within-horizon dup of doc 5; doc 7 fails distinct_ratio
    assert got == {1, 5}


def test_quality_predicate_matches_quality_filter(spark):
    rows = [
        (1, GOOD),
        (2, BAD_SHORT),
        (3, BAD_REPEAT),
        (4, GOOD2),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    via_pred = {r.doc_id for r in df.filter(quality_predicate()).collect()}
    via_filter = {r.doc_id for r in quality_filter(df).collect()}
    assert via_pred == via_filter


def test_streaming_quality_chain_batches_match_batch_run(spark, tmp_path):
    """The quality-chain foreachBatch leg: per-batch landed verdicts
    equal the batch composition (boilerplate_strip + chain) on the
    same rows, and a crash-replay of an epoch overwrites its partition
    with identical content (the _dsir_select_batch pattern)."""
    from airbnb_cdc_spark.operators.text import (
        _quality_chain_batch,
        boilerplate_strip,
        quality_filter_chain,
    )

    boiler = "nav home about contact login search " * 3  # 18-token bar
    b0 = spark.createDataFrame(
        [
            (10, boiler + GOOD),
            (11, boiler + GOOD2),
            (12, BAD_SHORT),
        ],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(20, GOOD), (21, BAD_REPEAT)], "doc_id long, text string"
    )
    out = str(tmp_path / "verdicts")
    _quality_chain_batch(b0, 0, out, "doc_id", "text", 16, 2)
    _quality_chain_batch(b1, 1, out, "doc_id", "text", 16, 2)

    landed = {
        (r.doc_id, r.n_tokens, r.reason, r.keep, r.n_segments, r.n_dropped, r.batch_id)
        for r in spark.read.parquet(out).collect()
    }
    want = set()
    for df, ep in ((b0, 0), (b1, 1)):
        strip = boilerplate_strip(df, "doc_id", "text", window=16, min_df=2)
        chain = quality_filter_chain(df, "doc_id", "text")
        joined = chain.join(
            strip.select("doc_id", "n_segments", "n_dropped"), "doc_id"
        )
        for r in joined.collect():
            want.add(
                (r.doc_id, r.n_tokens, r.reason, r.keep, r.n_segments, r.n_dropped, ep)
            )
    assert landed == want
    got = {r[0]: (r[2], r[5]) for r in landed}
    # the shared nav bar is within-batch boilerplate for docs 10/11
    assert got[10][1] >= 1 and got[11][1] >= 1
    # batch 1 has no repeated segment: nothing stripped
    assert got[20] == ("ok", 0)
    # audit order: the all-"spam" doc has zero stopwords, so
    # low_stopword fires before low_distinct ever evaluates
    assert got[12][0] == "too_short" and got[21][0] == "low_stopword"

    # crash-replay of epoch 0: identical partition content
    _quality_chain_batch(b0, 0, out, "doc_id", "text", 16, 2)
    assert {
        (r.doc_id, r.n_tokens, r.reason, r.keep, r.n_segments, r.n_dropped, r.batch_id)
        for r in spark.read.parquet(out).collect()
    } == want


def test_streaming_quality_chain_end_to_end(spark, tmp_path):
    """Drive streaming_quality_chain through a real readStream with
    maxFilesPerTrigger=1: every fed doc gets exactly one verdict row,
    batch partitions land per input file."""
    from airbnb_cdc_spark.operators.text import streaming_quality_chain

    feed = tmp_path / "feed"
    feed.mkdir()
    _write_feed(
        feed / "f0.json",
        [{"doc_id": 1, "text": GOOD}, {"doc_id": 2, "text": BAD_SHORT}],
    )
    _write_feed(
        feed / "f1.json",
        [{"doc_id": 3, "text": GOOD2}],
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    out = str(tmp_path / "out")
    q = streaming_quality_chain(
        stream, out, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3}
    assert len(rows) == 3
    verdicts = {r.doc_id: r.reason for r in rows}
    assert verdicts[1] == "ok" and verdicts[2] == "too_short"
