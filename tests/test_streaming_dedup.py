"""Streaming exact dedup: first arrival per fingerprint wins; re-arrivals
within the watermark horizon are dropped, including across micro-batches."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql import types as T

from airbnb_cdc_spark.operators.dedup import streaming_exact_dedup

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    feed = tmp_path / "feed"
    feed.mkdir()
    t0 = datetime(2025, 6, 1, 9, 0)

    def doc(i, minutes, text):
        return {
            "doc_id": i,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(sep=" "),
            "text": text,
        }

    # batch 0: three distinct texts + one duplicate of doc 1
    b0 = [
        doc(1, 0, "alpha beta gamma"),
        doc(2, 1, "delta epsilon zeta"),
        doc(3, 2, "alpha  BETA gamma"),  # normalized dup of doc 1
        doc(4, 3, "eta theta iota"),
    ]
    # batch 1 (separate file → separate micro-batch): a cross-batch dup
    # of doc 2 within the horizon, plus a genuinely new doc
    b1 = [
        doc(5, 10, "delta epsilon zeta"),
        doc(6, 11, "kappa lambda mu"),
    ]
    import os
    import time

    with open(feed / "b0.json", "w") as f:
        for r in b0:
            f.write(json.dumps(r) + "\n")
    with open(feed / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    # the file source orders micro-batches by modification time — pin it
    now = time.time()
    os.utime(feed / "b0.json", (now - 60, now - 60))
    os.utime(feed / "b1.json", (now, now))

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    deduped = streaming_exact_dedup(stream, watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r.doc_id for r in spark.table("dedup_out").collect()}
    # docs 3 (in-batch dup) and 5 (cross-batch dup) dropped
    assert out == {1, 2, 4, 6}


def test_batch_fallback_matches_streaming_semantics(spark):
    rows = [
        (1, datetime(2025, 6, 1), "alpha beta"),
        (2, datetime(2025, 6, 1), "alpha   beta"),
        (3, datetime(2025, 6, 1), "other text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    out = streaming_exact_dedup(df)
    assert out.count() == 2
    assert {r[0] for r in out.select("fingerprint").distinct().collect()} == {
        r[0] for r in out.select("fingerprint").collect()
    }


def test_streaming_incremental_dedup_against_store(spark, tmp_path):
    """Stream → per-batch dedup vs the persistent fingerprint store →
    insert-only append. First writer of a fingerprint wins across
    batches AND across query restarts (store state, not stream state)."""
    import os
    import time

    from airbnb_cdc_spark.operators.dedup import streaming_incremental_dedup
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    t0 = datetime(2025, 6, 1, 9, 0)

    def doc(i, minutes, text):
        return {
            "doc_id": i,
            "ts": (t0 + timedelta(minutes=minutes)).isoformat(sep=" "),
            "text": text,
        }

    store = ParquetMergeTable(
        spark, str(tmp_path / "fp_store"), keys=["fingerprint"], num_buckets=4
    )

    def run_feed(feed_dir, files):
        feed_dir.mkdir()
        now = time.time()
        for n, (name, rows) in enumerate(files):
            with open(feed_dir / name, "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")
            os.utime(feed_dir / name, (now - 60 + n, now - 60 + n))
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed_dir))
        )
        q = streaming_incremental_dedup(
            stream, store, checkpoint_dir=str(feed_dir) + "_ckpt"
        )
        q.processAllAvailable()
        q.stop()

    # run 1: two micro-batches with an in-batch dup and a cross-batch dup
    run_feed(
        tmp_path / "feed1",
        [
            ("b0.json", [doc(1, 0, "alpha beta"), doc(2, 1, "ALPHA  beta")]),
            ("b1.json", [doc(3, 2, "alpha beta"), doc(4, 3, "gamma delta")]),
        ],
    )
    got = {r.doc_id for r in store.read().collect()}
    assert got == {1, 4}  # first writer per fingerprint, across batches

    # run 2 (fresh query, same store): historical dup dropped, new kept
    run_feed(
        tmp_path / "feed2",
        [("b0.json", [doc(9, 60, "gamma delta"), doc(10, 61, "epsilon zeta")])],
    )
    got = {r.doc_id for r in store.read().collect()}
    assert got == {1, 4, 10}  # doc 9 deduped against run-1 history


def test_streaming_chunk_dedup_against_store(spark, tmp_path):
    """Chunk-granularity streaming leg: a paragraph ingested in batch 0
    suppresses its recurrence in batch 1 (cross-batch, via the
    persistent chunk-hash store) and in a restarted query (store
    state); dropped spans land idempotently per micro-batch."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.dedup import streaming_chunk_dedup
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    feed = tmp_path / "feed"
    feed.mkdir()
    # window=4/stride=4 via the op kwargs keeps chunk boundaries exact:
    # "p q r s" is one chunk everywhere it appears.
    boiler = "p q r s"
    b0 = [
        {"doc_id": 1, "text": f"{boiler} a b c d"},
        {"doc_id": 2, "text": "e f g h"},
    ]
    b1 = [
        {"doc_id": 3, "text": f"{boiler} x y z w"},  # boiler dup of b0
        {"doc_id": 4, "text": "n o v q"},
    ]
    with open(feed / "b0.json", "w") as f:
        for r in b0:
            f.write(json.dumps(r) + "\n")
    with open(feed / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    now = time.time()
    os.utime(feed / "b0.json", (now - 60, now - 60))
    os.utime(feed / "b1.json", (now, now))

    schema = "doc_id long, text string"
    store = ParquetMergeTable(spark, str(tmp_path / "store"), ["chunk_hash"])
    spans_dir = str(tmp_path / "spans")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = streaming_chunk_dedup(
            stream,
            store,
            spans_dir,
            window=4,
            stride=4,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()

    run()
    spans = spark.read.parquet(spans_dir)
    dropped = {(r.doc_id, r.chunk_idx) for r in spans.collect()}
    # doc 3's first chunk is the boilerplate — dropped against the
    # store; everything else is first-occurrence and kept
    assert dropped == {(3, 0)}
    n_store = store.read().count()
    # store holds every distinct kept chunk hash: docs 1 (2 chunks),
    # 2 (1), 3 (1 fresh), 4 (1)
    assert n_store == 5

    # restart over the same feed: checkpoint skips consumed files; a
    # NEW file re-sending doc 1's boilerplate is dropped against the
    # STORE (not stream state)
    b2 = [{"doc_id": 9, "text": boiler}]
    with open(feed / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    run()
    spans = spark.read.parquet(spans_dir)
    dropped = {(r.doc_id, r.chunk_idx) for r in spans.collect()}
    assert dropped == {(3, 0), (9, 0)}
    assert store.read().count() == 5  # nothing new to insert


def test_chunk_dedup_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch's crash contract replays an epoch AFTER its side
    effects may have landed (store.merge ran, checkpoint commit did
    not). The replay must reproduce the original marking — not mark the
    batch's own keeper hashes as duplicates — and leave the store
    unchanged. Regression test for the pre-r9 corruption where a
    replayed epoch rewrote its spans dir with every chunk droppable."""
    from airbnb_cdc_spark.operators.dedup import _chunk_dedup_batch
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    store = ParquetMergeTable(spark, str(tmp_path / "store"), ["chunk_hash"])
    spans_dir = str(tmp_path / "spans")
    boiler = "p q r s"

    def batch_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = batch_df([(1, f"{boiler} a b c d"), (2, "e f g h")])
    _chunk_dedup_batch(b0, 0, store, spans_dir, "doc_id", "text", 4, 4)
    b1 = batch_df([(3, f"{boiler} x y z w"), (4, "n o v q")])
    _chunk_dedup_batch(b1, 1, store, spans_dir, "doc_id", "text", 4, 4)

    def snapshot():
        spans = {
            (r.doc_id, r.chunk_idx)
            for r in spark.read.parquet(spans_dir).collect()
        }
        st = {
            (r.chunk_hash, r.batch_id) for r in store.read().collect()
        }
        return spans, st

    spans1, store1 = snapshot()
    assert spans1 == {(3, 0)}  # only the boilerplate recurrence dropped
    assert len(store1) == 5
    assert {b for _, b in store1} == {0, 1}

    # Crash-replay epoch 1: same data, same epoch, store already holds
    # epoch 1's keeper hashes. Must be a no-op.
    _chunk_dedup_batch(b1, 1, store, spans_dir, "doc_id", "text", 4, 4)
    assert snapshot() == (spans1, store1)

    # And replaying epoch 0 (a lagging restart) is equally safe.
    _chunk_dedup_batch(b0, 0, store, spans_dir, "doc_id", "text", 4, 4)
    assert snapshot() == (spans1, store1)


def test_chunk_dedup_store_safe_across_runs(spark, tmp_path):
    """Epoch ids are only unique per checkpoint location: a restart
    with a fresh checkpoint dir (or a second stream sharing the store)
    restarts at epoch 0. The replay exclusion must key on
    (run_id, batch_id), not batch_id alone — otherwise the new run's
    epoch 0 wrongly excludes the OLD run's epoch-0 inserts from the
    seen-set, re-marks already-ingested chunks as keepers, and rewrites
    their store rows. Regression test for the r9 advice finding."""
    from airbnb_cdc_spark.operators.dedup import _chunk_dedup_batch
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    store = ParquetMergeTable(spark, str(tmp_path / "store"), ["chunk_hash"])
    spans_a = str(tmp_path / "spans_a")
    spans_b = str(tmp_path / "spans_b")
    boiler = "p q r s"

    def batch_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # Run A, epoch 0: ingests the boilerplate as a keeper.
    b0 = batch_df([(1, f"{boiler} a b c d")])
    _chunk_dedup_batch(
        b0, 0, store, spans_a, "doc_id", "text", 4, 4, run_id="runA"
    )
    store_a = {(r.chunk_hash, r.batch_id, r.run_id) for r in store.read().collect()}
    assert {rid for _, _, rid in store_a} == {"runA"}

    # Run B (fresh checkpoint -> epochs restart at 0) re-sends the
    # boilerplate. It must be SUPPRESSED against run A's history, and
    # run A's store rows must keep their original (run_id, batch_id).
    b0b = batch_df([(9, boiler)])
    _chunk_dedup_batch(
        b0b, 0, store, spans_b, "doc_id", "text", 4, 4, run_id="runB"
    )
    dropped_b = {
        (r.doc_id, r.chunk_idx) for r in spark.read.parquet(spans_b).collect()
    }
    assert dropped_b == {(9, 0)}
    assert {
        (r.chunk_hash, r.batch_id, r.run_id) for r in store.read().collect()
    } == store_a

    # Run A's own crash-replay of epoch 0 is still idempotent.
    _chunk_dedup_batch(
        b0, 0, store, spans_a, "doc_id", "text", 4, 4, run_id="runA"
    )
    assert {
        (r.chunk_hash, r.batch_id, r.run_id) for r in store.read().collect()
    } == store_a


# -- streaming winnow near-dup (the MOSS-style streaming leg) --------------
#
# Shared fixture geometry: winnow defaults k=3/w=4, so docs sharing a
# substring of >= w+k-1 = 6 tokens share fingerprints; BOILER is 8
# tokens, giving multiple shared fps (>= min_shared 2).
_WBOILER = "alpha beta gamma delta epsilon zeta eta theta"


def test_streaming_winnow_neardup_against_store(spark, tmp_path):
    """A document ingested in batch 0 suppresses a near-substring
    recurrence in batch 1 (cross-batch, via the persistent posting
    store) and in a restarted query (store state); near-dup reports
    land idempotently per micro-batch and keepers' postings append."""
    import os
    import time

    from airbnb_cdc_spark.operators.dedup import streaming_winnow_neardup
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    feed = tmp_path / "feed"
    feed.mkdir()
    b0 = [
        {"doc_id": 1, "text": f"{_WBOILER} one two three"},
        {"doc_id": 2, "text": "unrelated words only here now yes"},
    ]
    b1 = [
        {"doc_id": 3, "text": f"{_WBOILER} four five six"},  # near-dup of 1
        {"doc_id": 4, "text": "other fresh tokens appear here too"},
    ]
    with open(feed / "b0.json", "w") as f:
        for r in b0:
            f.write(json.dumps(r) + "\n")
    with open(feed / "b1.json", "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    now = time.time()
    os.utime(feed / "b0.json", (now - 60, now - 60))
    os.utime(feed / "b1.json", (now, now))

    schema = "doc_id long, text string"
    store = ParquetMergeTable(
        spark, str(tmp_path / "store"), ["doc_id", "fp"]
    )
    report_dir = str(tmp_path / "report")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        q = streaming_winnow_neardup(
            stream,
            store,
            report_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()

    run()
    matches = {
        (r.doc_id, r.match_id)
        for r in spark.read.parquet(report_dir).collect()
    }
    assert matches == {(3, 1)}  # doc 3 matched against the store
    # store holds keepers' postings only (docs 1, 2, 4 — not 3)
    assert {
        r.doc_id for r in store.read().select("doc_id").distinct().collect()
    } == {1, 2, 4}

    # restart over the same feed: checkpoint skips consumed files; a
    # NEW file re-sending the boilerplate run is matched against the
    # STORE (not stream state)
    b2 = [{"doc_id": 9, "text": f"{_WBOILER} nine ten"}]
    with open(feed / "b2.json", "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    run()
    matches = {
        (r.doc_id, r.match_id)
        for r in spark.read.parquet(report_dir).collect()
    }
    assert matches == {(3, 1), (9, 1)}
    assert {
        r.doc_id for r in store.read().select("doc_id").distinct().collect()
    } == {1, 2, 4}  # nothing new to insert


def test_winnow_neardup_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch's crash contract: replaying an epoch whose
    store.merge already landed must reproduce the original marking —
    the batch's own keeper postings are excluded from the seen-set, so
    keepers stay keepers — and leave the store unchanged (the
    _chunk_dedup_batch protocol)."""
    from airbnb_cdc_spark.operators.dedup import _winnow_neardup_batch
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    store = ParquetMergeTable(
        spark, str(tmp_path / "store"), ["doc_id", "fp"]
    )
    report_dir = str(tmp_path / "report")

    def batch_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = batch_df(
        [
            (1, f"{_WBOILER} one two three"),
            (2, "unrelated words only here now yes"),
        ]
    )
    _winnow_neardup_batch(b0, 0, store, report_dir, "doc_id", "text", 3, 4, 2)
    b1 = batch_df(
        [
            (3, f"{_WBOILER} four five six"),
            (4, "other fresh tokens appear here too"),
        ]
    )
    _winnow_neardup_batch(b1, 1, store, report_dir, "doc_id", "text", 3, 4, 2)

    def snapshot():
        matches = {
            (r.doc_id, r.match_id, r.shared_fps)
            for r in spark.read.parquet(report_dir).collect()
        }
        st = {
            (r.doc_id, r.fp, r.batch_id) for r in store.read().collect()
        }
        return matches, st

    m1, s1 = snapshot()
    assert {(d, m) for d, m, _ in m1} == {(3, 1)}
    assert {d for d, _, _ in s1} == {1, 2, 4}
    assert {b for _, _, b in s1} == {0, 1}

    # Crash-replay epoch 1: same data, same epoch, store already holds
    # epoch 1's keeper postings. Must be a no-op.
    _winnow_neardup_batch(b1, 1, store, report_dir, "doc_id", "text", 3, 4, 2)
    assert snapshot() == (m1, s1)

    # And replaying epoch 0 (a lagging restart) is equally safe.
    _winnow_neardup_batch(b0, 0, store, report_dir, "doc_id", "text", 3, 4, 2)
    assert snapshot() == (m1, s1)


def test_winnow_neardup_store_safe_across_runs(spark, tmp_path):
    """(run_id, batch_id) exclusion, not batch_id alone: a second run
    restarting at epoch 0 must be matched AGAINST the first run's
    history, and must not rewrite its rows."""
    from airbnb_cdc_spark.operators.dedup import _winnow_neardup_batch
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    store = ParquetMergeTable(
        spark, str(tmp_path / "store"), ["doc_id", "fp"]
    )
    rep_a = str(tmp_path / "rep_a")
    rep_b = str(tmp_path / "rep_b")

    def batch_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = batch_df([(1, f"{_WBOILER} one two three")])
    _winnow_neardup_batch(
        b0, 0, store, rep_a, "doc_id", "text", 3, 4, 2, run_id="runA"
    )
    store_a = {
        (r.doc_id, r.fp, r.batch_id, r.run_id)
        for r in store.read().collect()
    }
    assert {rid for _, _, _, rid in store_a} == {"runA"}

    # Run B (fresh checkpoint -> epoch 0) re-sends the boilerplate run:
    # matched against run A's history, store rows untouched.
    b0b = batch_df([(9, f"{_WBOILER} nine ten")])
    _winnow_neardup_batch(
        b0b, 0, store, rep_b, "doc_id", "text", 3, 4, 2, run_id="runB"
    )
    matches_b = {
        (r.doc_id, r.match_id)
        for r in spark.read.parquet(rep_b).collect()
    }
    assert matches_b == {(9, 1)}
    assert {
        (r.doc_id, r.fp, r.batch_id, r.run_id)
        for r in store.read().collect()
    } == store_a

    # Run A's own crash-replay of epoch 0 is still idempotent.
    _winnow_neardup_batch(
        b0, 0, store, rep_a, "doc_id", "text", 3, 4, 2, run_id="runA"
    )
    assert {
        (r.doc_id, r.fp, r.batch_id, r.run_id)
        for r in store.read().collect()
    } == store_a
