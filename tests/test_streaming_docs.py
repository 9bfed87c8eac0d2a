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
