"""Streaming count-min sketch: per-batch deltas fold into a persistent
sketch that exactly equals the batch sketch of the same data — the
mergeability claim under the production ingest shape."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.sketch import (
    cms_delta_write,
    cms_from_counts,
    read_cms,
    streaming_cms,
)

TOK_SCHEMA = T.StructType([T.StructField("token", T.StringType())])

B0 = ["alpha", "beta", "alpha", "gamma", "beta", "alpha"]
B1 = ["beta", "delta", "delta", "alpha"]


def _write_feed(feed, files):
    feed.mkdir()
    now = time.time()
    for n, (name, toks) in enumerate(files):
        with open(feed / name, "w") as f:
            for t in toks:
                f.write(json.dumps({"token": t}) + "\n")
        os.utime(feed / name, (now - 60 + n, now - 60 + n))


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    sketch_dir = str(tmp_path / "sketch")
    _write_feed(tmp_path / "feed", [("b0.json", B0), ("b1.json", B1)])

    stream = (
        spark.readStream.schema(TOK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "feed"))
    )
    q = streaming_cms(
        stream,
        sketch_dir,
        "token",
        depth=4,
        width=64,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    streamed = read_cms(spark, sketch_dir)
    batch_vocab = (
        spark.createDataFrame([(t,) for t in B0 + B1], TOK_SCHEMA)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    expected = cms_from_counts(batch_vocab, "token", "c", depth=4, width=64)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_cms_delta_write_retry_idempotent(spark, tmp_path):
    """A retried micro-batch (same batch id, same input) overwrites its
    own partition — cells are not double-added; a different batch id
    accumulates."""
    sketch_dir = str(tmp_path / "sketch")
    vocab = spark.createDataFrame([("alpha", 3), ("beta", 1)], "token string, c long")
    delta = cms_from_counts(vocab, "token", "c", depth=2, width=16)

    cms_delta_write(delta, sketch_dir, batch_id=0)
    cms_delta_write(delta, sketch_dir, batch_id=0)  # simulated retry
    once = {(r.j, r.bucket): r.c for r in read_cms(spark, sketch_dir).collect()}
    assert sum(once.values()) == 2 * (3 + 1)  # depth 2 rows of each count

    cms_delta_write(delta, sketch_dir, batch_id=1)  # genuinely new batch
    twice = {(r.j, r.bucket): r.c for r in read_cms(spark, sketch_dir).collect()}
    assert all(twice[k] == 2 * v for k, v in once.items())
