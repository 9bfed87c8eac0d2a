"""Streaming-leg throughput at sf0.1-comparable volume.

Two legs, each printing one JSON line (feed generation outside the
timed region; maxFilesPerTrigger=1 so every file is its own
micro-batch — per-batch cost is what's measured, not one giant batch):

- ``merge`` (default; VERDICT r7 ask #8): run_booking_fact_stream
  foreachBatch-merge rows/sec — split, contract cast, bucket-pruned
  LWW upsert per micro-batch.
- ``session`` (VERDICT r9 ask #6): engine session windows
  (F.session_window + watermark, append mode) rows/sec over an events
  feed whose files advance in event time, so closed sessions EMIT and
  their state EVICTS across micro-batches; the JSON carries the
  per-batch state-rows trajectory from the query progress records —
  flat-ish state, not monotone growth, is the eviction evidence.

- ``minhash`` (r10): streaming MinHash near-dup ingest docs/sec —
  each micro-batch banded against the persistent signature store,
  keepers appended; a planted 10% cross-file near-dup cohort must be
  suppressed by the STORE (earlier files' signatures), so the number
  reflects the real band-join + verify + merge cost per batch.

- ``dsir`` (r10): streaming DSIR selection docs/sec — each
  micro-batch scored against the persisted read-only score model
  (broadcast n_buckets-row join + doc-key groupBy per batch), top-k
  landed idempotently per batch_id; the number is the per-batch
  scoring cost, model fit excluded (it is a one-time batch job).

- ``quality`` (r11): streaming quality gate docs/sec — per
  micro-batch within-batch boilerplate stats + the reason-coded
  quality chain, one verdict row per doc landed idempotently per
  batch_id (stateless across batches, crash-replay overwrites). The
  synthetic feed's docs are stopword-free token soup, so the gate
  rejects all of them (kept=0 is expected); the throughput number is
  the per-batch segment-groupBy + projection cost.

- ``sq8`` (r11): streaming SQ8 index ingest vectors/sec — the code
  table is built from the first file (scale frozen), then each
  micro-batch quantizes against the frozen scale and appends via the
  idempotent id anti-join; the first file re-arriving in batch 0 must
  append 0 rows (replay safety measured on real traffic, not a unit
  fixture).

- ``buckets`` (r12): streaming frozen-threshold perplexity bucketing
  docs/sec — each micro-batch scores against the persisted dense
  model and buckets against the persisted per-language tercile
  boundary table (one broadcast join + lexicographic comparison per
  batch); no refit, no re-rank, both stores read-only — the CCNet
  production shape end to end. Fit + threshold freeze excluded
  (one-time batch jobs).

- ``classify`` (r12): streaming quality-classifier inference
  docs/sec — each micro-batch scores against the persisted hashed
  bag-of-words weight table (one-time closed-form fit, or an
  external fastText export) with one broadcast join + one doc-key
  groupBy per batch, per-doc verdicts landed idempotently.

- ``lm`` (r11): streaming bigram-LM fluency selection docs/sec —
  each micro-batch scored against the persisted dense transition
  model (broadcast n_buckets^2-row join + doc-key groupBy per
  batch), top-k landed idempotently per batch_id; model fit excluded
  (one-time batch job), the DSIR leg's second-order sibling.

- ``ivfpq`` (r14): streaming IVF-PQ ingest vecs/sec — the composed
  disk index grown batch-by-batch against frozen centroids+codebook,
  one file per touched list per append, replay-zero on the build file.

- ``drift`` (r14): streaming corpus-drift monitor docs/sec — each
  micro-batch scored against the persisted dense reference model
  (read+cached once per stream), one summary row landed per batch.

- ``decontam`` (r14): streaming decontamination docs/sec — each
  micro-batch screened against the persisted benchmark shingle store;
  a planted 10% verbatim-leak cohort must be flagged exactly.

- ``lsh`` (r16): streaming sign-LSH bucket-table ingest vecs/sec —
  the store is built from the first file (freezing the (bits, dim)
  hash family), each micro-batch hashes against the frozen family and
  appends into the touched ``bucket=`` partitions, replay-zero on the
  build file.

- ``mixed`` (r15, VERDICT r14 #7): store-program INTERFERENCE —
  drift + decontam + ivfpq ingest each run solo, then all three
  concurrently in the same session (fresh outputs/checkpoints/index),
  with identical correctness assertions in both phases; the JSON
  carries per-leg solo vs concurrent throughput and the interference
  ratio. Production runs the store programs together; the solo legs
  only measure each under suite load.

Usage: python scripts/bench_streaming.py
           [merge|session|minhash|dsir|quality|lm|sq8|pq|buckets|classify|drift|ivfpq|decontam|mixed|lsh] [n_rows] [n_files]
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.fixtures import booking_doc  # noqa: E402


def write_feed(feed: Path, n_rows: int, n_files: int, cancel_pct: float) -> int:
    rng = random.Random(11)
    t0 = datetime(2025, 10, 1, 12, 0, 0)
    customer_ids = list(range(1, 15001))
    per_file = n_rows // n_files
    sampled_for_cancel: list[dict] = []
    total = 0
    for fi in range(n_files):
        with open(feed / f"feed_{fi:03d}_inserts.json", "w") as f:
            for _ in range(per_file):
                d = booking_doc(rng, customer_ids, t0)
                f.write(json.dumps(d) + "\n")
                total += 1
                if rng.random() < cancel_pct:
                    sampled_for_cancel.append(d)
    with open(feed / f"feed_{n_files:03d}_cancels.json", "w") as f:
        for d in sampled_for_cancel:
            upd = dict(d)
            ts = datetime.fromisoformat(d["updated_at"]) + timedelta(hours=6)
            upd["status"] = "Cancelled"
            upd["cancellation_ts"] = ts.isoformat(sep=" ")
            upd["updated_at"] = ts.isoformat(sep=" ")
            f.write(json.dumps(upd) + "\n")
            total += 1
    return total


def write_events_feed(feed: Path, n_rows: int, n_files: int) -> int:
    """Events whose files ADVANCE in event time (file fi covers hour
    fi): with a 10-minute watermark and 30-minute gap, sessions from
    earlier files close and evict while later files stream in. Events
    sit in the first 20 minutes of each hour so the inter-hour silence
    (≥ 40 min) always exceeds the gap — at sf0.1 volume (~30 events
    per user-hour, ~2 min apart) uniform timestamps would otherwise
    bridge every hour into one never-closing session per user and the
    bench would measure state growth, not eviction."""
    rng = random.Random(23)
    t0 = datetime(2025, 10, 1, 0, 0, 0)
    per_file = n_rows // n_files
    total = 0
    for fi in range(n_files):
        with open(feed / f"events_{fi:03d}.json", "w") as f:
            for _ in range(per_file):
                ts = t0 + timedelta(hours=fi, seconds=rng.randrange(1200))
                f.write(
                    json.dumps(
                        {
                            "user_id": rng.randrange(500),
                            "ts": ts.isoformat(sep=" "),
                            "value": rng.randrange(1000) / 4.0,
                        }
                    )
                    + "\n"
                )
                total += 1
    return total


def bench_session(n_rows: int, n_files: int) -> None:
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.windowed import session_window_agg
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-session")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_sess_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_events_feed(feed, n_rows, n_files)

        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        sessions = session_window_agg(
            stream, gap="30 minutes", watermark="10 minutes"
        )
        t0 = time.time()
        q = (
            sessions.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(work / "out"))
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        progress = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in q.recentProgress
        ]
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in progress
            if p.get("stateOperators") and p["numInputRows"] > 0
        ]
        n_sessions = spark.read.parquet(str(work / "out")).count()
        print(
            json.dumps(
                {
                    "metric": "session_window_stream_rows_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "rows/sec",
                    "feed_rows": total,
                    "emitted_sessions": n_sessions,
                    "micro_batches": len(state_rows),
                    "state_rows_per_batch": state_rows,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def write_docs_feed(feed: Path, n_docs: int, n_files: int) -> int:
    """10% of docs (i % 10 == 7, beyond the first file) are 39/40-token
    near-copies of a FILE-0 original (a non-cohort doc, so its
    signatures are in the store) — every later file's cohort is caught
    only via the store, file after file."""
    per_file = n_docs // n_files
    total = 0
    for fi in range(n_files):
        with open(feed / f"docs_{fi:03d}.json", "w") as f:
            for j in range(per_file):
                i = fi * per_file + j
                if i % 10 == 7 and i >= per_file:
                    base = i % per_file
                    if base % 10 == 7:  # keep the base an original
                        base -= 1
                    toks = [f"w{base}_{t}" for t in range(39)] + ["changed"]
                else:
                    toks = [f"w{i}_{t}" for t in range(40)]
                f.write(
                    json.dumps({"doc_id": i, "text": " ".join(toks)}) + "\n"
                )
                total += 1
    return total


def bench_minhash(n_docs: int, n_files: int) -> None:
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.dedup import streaming_minhash_neardup
    from airbnb_cdc_spark.operators.merge import ParquetMergeTable
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-minhash")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_mh_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        store = ParquetMergeTable(spark, str(work / "sigstore"), ["doc_id"])
        report = str(work / "report")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_minhash_neardup(
            stream, store, report, checkpoint_dir=str(work / "ckpt")
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        n_dups = spark.read.parquet(report).count()
        n_store = store.read().count()
        print(
            json.dumps(
                {
                    "metric": "minhash_neardup_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "dup_reports": n_dups,
                    "store_signatures": n_store,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_dsir(n_docs: int, n_files: int) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.importance import (
        dsir_bucket_scores,
        streaming_dsir_select,
        token_buckets,
        write_dsir_scores,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-dsir")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_dsir_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        # one-time model fit on a small planted target/source corpus
        # (fit cost is a batch job; the stream pays only scoring)
        fit = spark.read.schema(
            "doc_id long, text string"
        ).json(str(feed)).withColumn(
            "source",
            F.when(F.col("doc_id") % 10 == 0, "tgt").otherwise("raw"),
        )
        tok = token_buckets(fit, "text")
        model_path = str(work / "model")
        write_dsir_scores(
            dsir_bucket_scores(tok.filter(F.col("source") == "tgt"), tok),
            model_path,
        )

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        out = str(work / "sel")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_dsir_select(
            stream, model_path, out, k=100,
            checkpoint_dir=str(work / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        n_selected = spark.read.parquet(out).count()
        print(
            json.dumps(
                {
                    "metric": "dsir_select_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "selected": n_selected,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_lm(n_docs: int, n_files: int) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.lm import (
        fit_bigram_lm,
        streaming_lm_select,
        transition_buckets,
        write_lm_model,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-lm")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_lm_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        # one-time model fit on the planted target cohort (fit cost is
        # a batch job; the stream pays only scoring)
        fit = spark.read.schema("doc_id long, text string").json(
            str(feed)
        ).filter(F.col("doc_id") % 10 == 0)
        model_path = str(work / "model")
        write_lm_model(
            fit_bigram_lm(transition_buckets(fit, "text")), model_path
        )

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        out = str(work / "sel")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_lm_select(
            stream, model_path, out, k=100,
            checkpoint_dir=str(work / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        n_selected = spark.read.parquet(out).count()
        print(
            json.dumps(
                {
                    "metric": "lm_select_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "selected": n_selected,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_buckets(n_docs: int, n_files: int) -> None:
    """Frozen-threshold perplexity bucketing in-stream: arriving docs
    score against the persisted dense model and bucket against the
    persisted tercile boundary table — no refit, no re-rank, both
    stores read-only. The fit + threshold freeze are one-time batch
    jobs; the stream pays scoring + one broadcast join per batch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.lm import (
        fit_bigram_lm,
        lm_score,
        ppl_tercile_thresholds,
        streaming_ppl_bucket_assign,
        transition_buckets,
        write_lm_model,
        write_ppl_thresholds,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-buckets")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_buckets_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        # one-time: fit the model on the planted target cohort, then
        # freeze per-language tercile boundaries from a scored snapshot
        full = spark.read.schema("doc_id long, text string").json(
            str(feed)
        ).withColumn("lang", (F.col("doc_id") % 3).cast("string"))
        fit = full.filter(F.col("doc_id") % 10 == 0)
        model = fit_bigram_lm(transition_buckets(fit, "text"))
        model_path = str(work / "model")
        write_lm_model(model, model_path)
        snapshot = lm_score(
            full.select("doc_id", "text"), model, "text", "doc_id"
        ).join(full.select("doc_id", "lang"), "doc_id")
        th_path = str(work / "thresholds")
        write_ppl_thresholds(ppl_tercile_thresholds(snapshot), th_path)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        out = str(work / "buckets")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
            .withColumn("lang", (F.col("doc_id") % 3).cast("string"))
        )
        t0 = time.time()
        q = streaming_ppl_bucket_assign(
            stream,
            model_path,
            th_path,
            out,
            checkpoint_dir=str(work / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        landed = spark.read.parquet(out)
        n_out = landed.count()
        n_buckets_seen = landed.select("bucket").distinct().count()
        print(
            json.dumps(
                {
                    "metric": "ppl_bucket_assign_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "bucketed": n_out,
                    "buckets_seen": n_buckets_seen,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_classify(n_docs: int, n_files: int) -> None:
    """Streaming quality-classifier inference: arriving docs score
    against the persisted hashed bag-of-words weight table (fitted
    once — or imported from an external fastText trainer) and land
    per-doc verdicts idempotently per batch. The fit is a one-time
    batch job; the stream pays one broadcast join + one doc-key
    groupBy per micro-batch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.classifier import (
        fit_quality_classifier,
        streaming_classify,
        token_buckets,
        write_classifier,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-classify")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_classify_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        # one-time fit: planted positive cohort (doc_id % 10 == 0) vs
        # the rest as the negative class
        full = spark.read.schema("doc_id long, text string").json(str(feed))
        tok = token_buckets(full, "text")
        model = fit_quality_classifier(
            tok.filter(F.col("doc_id") % 10 == 0),
            tok.filter(F.col("doc_id") % 10 != 0),
        )
        model_path = str(work / "clf")
        write_classifier(model, model_path)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        out = str(work / "verdicts")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_classify(
            stream,
            model_path,
            out,
            checkpoint_dir=str(work / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        landed = spark.read.parquet(out)
        n_out = landed.count()
        n_quality = landed.filter(F.col("label") == 1).count()
        print(
            json.dumps(
                {
                    "metric": "classifier_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "scored": n_out,
                    "kept_quality": n_quality,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_quality(n_docs: int, n_files: int) -> None:
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.text import streaming_quality_chain
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-quality")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_q_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        out = str(work / "verdicts")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_quality_chain(
            stream, out, checkpoint_dir=str(work / "ckpt")
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        verdicts = spark.read.parquet(out)
        n_rows = verdicts.count()
        n_kept = verdicts.filter("keep = 1").count()
        print(
            json.dumps(
                {
                    "metric": "quality_chain_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "verdicts": n_rows,
                    "kept": n_kept,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def write_vectors_feed(feed: Path, n_vecs: int, n_files: int) -> int:
    """JSON files of (vec_id, 64-dim float list) — deterministic
    values spanning [-1, 1] so the SQ8 scale is stable across runs."""
    per = n_vecs // n_files
    total = 0
    for f in range(n_files):
        lines = []
        for i in range(per):
            vid = f * per + i
            vec = [(((vid * 31 + d * 7) % 257) - 128) / 128.0 for d in range(64)]
            lines.append(json.dumps({"vec_id": vid, "embedding": vec}))
        (feed / f"part-{f:04d}.json").write_text("\n".join(lines) + "\n")
        total += per
    return total


def bench_sq8(n_vecs: int, n_files: int) -> None:
    """Streaming SQ8 ingest vectors/sec: the index is built from the
    first file (freezing the quantizer scale), then every micro-batch
    quantizes against the frozen scale and appends via the idempotent
    id anti-join — the per-batch cost is one batch-sized quantization
    pass + the column-pruned existing-id probe, independent of index
    size. The final code count must equal the distinct feed ids (the
    first file's vectors arrive again in batch 0 and must be skipped
    by the anti-join, proving replay safety on real traffic)."""
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.similarity import (
        append_sq8_index,
        write_sq8_index,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-sq8")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_sq8_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_vectors_feed(feed, n_vecs, n_files)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        index = str(work / "sq8")
        # build from the first file — scale frozen here
        first = spark.read.schema(schema).json(
            str(sorted(feed.iterdir())[0])
        )
        write_sq8_index(first, index)

        appended = []

        def _ingest(batch_df, batch_id):
            appended.append(append_sq8_index(spark, index, batch_df))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_codes = spark.read.parquet(index + "/codes").count()
        assert n_codes == total, (n_codes, total)
        print(
            json.dumps(
                {
                    "metric": "sq8_ingest_stream_vecs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "vecs/sec",
                    "feed_vecs": total,
                    "micro_batches": n_files,
                    "code_rows": n_codes,
                    "appended_per_batch": appended,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_pq(n_vecs: int, n_files: int) -> None:
    """Streaming PQ ingest vectors/sec: the index is built from the
    first file (freezing the codebook), then every micro-batch encodes
    against the frozen codebook and appends via the idempotent id
    anti-join — the per-batch cost is one batch-sized encode + the
    column-pruned existing-id probe, independent of index size. The
    final code count must equal m x the distinct feed ids (batch 0
    replays the first file's vectors and must be skipped — replay
    safety on real traffic)."""
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.similarity import (
        append_pq_index,
        write_pq_index,
    )
    from airbnb_cdc_spark.session import get_spark

    m = 16
    spark = get_spark("bench-streaming-pq")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_pq_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_vectors_feed(feed, n_vecs, n_files)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        index = str(work / "pq")
        # build from the first file — codebook frozen here
        first = spark.read.schema(schema).json(
            str(sorted(feed.iterdir())[0])
        )
        write_pq_index(first, index, m=m)

        appended = []

        def _ingest(batch_df, batch_id):
            appended.append(append_pq_index(spark, index, batch_df, m=m))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_codes = spark.read.parquet(index + "/codes").count()
        assert n_codes == total * m, (n_codes, total, m)
        print(
            json.dumps(
                {
                    "metric": "pq_ingest_stream_vecs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "vecs/sec",
                    "feed_vecs": total,
                    "micro_batches": n_files,
                    "code_rows": n_codes,
                    "appended_per_batch": appended,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_ivfpq(n_vecs: int, n_files: int) -> None:
    """Streaming IVF-PQ ingest vectors/sec — the REAL production path
    for the composed disk index (the one-time build cost is paid once;
    growth arrives as micro-batches): the index is built from the
    first file (freezing centroids AND codebook), then every
    micro-batch assigns to frozen centroids, encodes against the
    frozen codebook, and appends into the touched ``cid=`` partitions
    via the partition-pruned existence probe. Batch 0 replays the
    first file and must append zero (replay safety)."""
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.similarity import (
        append_ivf_pq_index,
        build_ivf_pq_index,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-ivfpq")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_ivfpq_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_vectors_feed(feed, n_vecs, n_files)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        index = str(work / "ivfpq")
        first = spark.read.schema(schema).json(
            str(sorted(feed.iterdir())[0])
        )
        # ~sqrt(first-file) centroids via the derive-from-count rule
        build_ivf_pq_index(first, index, centroid_mod=None)

        appended = []

        def _ingest(batch_df, batch_id):
            appended.append(append_ivf_pq_index(spark, index, batch_df))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_rows = spark.read.parquet(index + "/lists").count()
        assert n_rows == total, (n_rows, total)
        # exactly one batch is the replay of the build file and appends
        # zero; checking membership (not position) because the file
        # stream orders batches by mtime, which can tie and differ from
        # the path sort the build used
        assert appended.count(0) == 1, appended
        assert sum(appended) == total - (total // n_files), appended
        print(
            json.dumps(
                {
                    "metric": "ivf_pq_ingest_stream_vecs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "vecs/sec",
                    "feed_vecs": total,
                    "micro_batches": n_files,
                    "list_rows": n_rows,
                    "appended_per_batch": appended,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_lsh(n_vecs: int, n_files: int) -> None:
    """Streaming sign-LSH ingest vectors/sec — the bucket table's
    production growth path: the store is built from the first file
    (freezing the (bits, dim) hash family), then every micro-batch
    hashes against the frozen family and appends into the touched
    ``bucket=`` partitions via the partition-pruned existence probe.
    Batch 0 replays the first file and must append zero."""
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.similarity import (
        append_lsh_index,
        build_lsh_index,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-lsh")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_lsh_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_vectors_feed(feed, n_vecs, n_files)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )
        index = str(work / "lsh")
        first = spark.read.schema(schema).json(
            str(sorted(feed.iterdir())[0])
        )
        build_lsh_index(first, index, bits=None)  # derive from count

        appended = []

        def _ingest(batch_df, batch_id):
            appended.append(append_lsh_index(spark, index, batch_df))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = (
            stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", str(work / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_rows = spark.read.parquet(index + "/lists").count()
        assert n_rows == total, (n_rows, total)
        assert appended.count(0) == 1, appended
        assert sum(appended) == total - (total // n_files), appended
        print(
            json.dumps(
                {
                    "metric": "lsh_ingest_stream_vecs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "vecs/sec",
                    "feed_vecs": total,
                    "micro_batches": n_files,
                    "bucket_rows": n_rows,
                    "appended_per_batch": appended,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_drift(n_docs: int, n_files: int) -> None:
    """Streaming drift-monitor docs/sec: the reference model is fitted
    from the first file (dense n_buckets-row store, frozen), then
    every micro-batch is scored against the stored model and lands one
    summary row — per-batch cost is O(batch) + the model read, the
    reference corpus is never rescanned. Every batch must land a row
    and every landed total_variation must be finite."""
    import math

    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.importance import (
        streaming_drift_monitor,
        token_buckets,
        write_drift_reference,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-drift")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_drift_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_docs_feed(feed, n_docs, n_files)

        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        model = str(work / "model")
        first = spark.read.schema(schema).json(str(sorted(feed.iterdir())[0]))
        write_drift_reference(token_buckets(first, "text"), model)

        out = str(work / "landed")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(feed))
        )
        t0 = time.time()
        q = streaming_drift_monitor(
            stream, model, out, checkpoint_dir=str(work / "ckpt")
        )
        # availableNow isn't exposed through the helper; drain manually
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        rows = spark.read.parquet(out).collect()
        assert len(rows) == n_files, (len(rows), n_files)
        assert all(
            r.total_variation is not None and math.isfinite(r.total_variation)
            for r in rows
        )
        print(
            json.dumps(
                {
                    "metric": "drift_monitor_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "tv_range": [
                        round(min(r.total_variation for r in rows), 4),
                        round(max(r.total_variation for r in rows), 4),
                    ],
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_decontam(n_docs: int, n_files: int) -> None:
    """Streaming decontamination docs/sec: the benchmark shingle store
    is built once from a small synthetic eval suite (plus a planted
    10% leak cohort in the feed built from benchmark text), then every
    micro-batch is screened against the store — per-batch cost is
    O(batch) + the store read, the benchmark is never re-shingled.
    Every landed verdict row must carry a finite ratio and the planted
    leaks must be flagged."""
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.text import (
        streaming_decontam,
        write_benchmark_set,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-decontam")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_decontam_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        bench_texts = [
            " ".join(f"eval{q}_{t}" for t in range(30)) for q in range(200)
        ]
        per_file = n_docs // n_files
        total = 0
        for fi in range(n_files):
            with open(feed / f"docs_{fi:03d}.json", "w") as f:
                for j in range(per_file):
                    i = fi * per_file + j
                    if i % 10 == 7:  # planted leak: verbatim eval doc
                        text = bench_texts[i % len(bench_texts)]
                    else:
                        text = " ".join(f"w{i}_{t}" for t in range(40))
                    f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
                    total += 1

        store = str(work / "bench")
        bench_df = spark.createDataFrame(
            list(enumerate(bench_texts)), "doc_id long, text string"
        )
        write_benchmark_set(bench_df, store, n=3)

        out = str(work / "landed")
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
        t0 = time.time()
        q = streaming_decontam(
            stream, store, out, checkpoint_dir=str(work / "ckpt")
        )
        q.processAllAvailable()
        q.stop()
        wall = time.time() - t0
        rows = spark.read.parquet(out)
        n_rows = rows.count()
        n_flagged = rows.filter("contaminated").count()
        assert n_rows == total, (n_rows, total)
        assert n_flagged == sum(1 for i in range(total) if i % 10 == 7)
        print(
            json.dumps(
                {
                    "metric": "decontam_stream_docs_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "docs/sec",
                    "feed_docs": total,
                    "micro_batches": n_files,
                    "flagged": n_flagged,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_mixed(n_docs: int, n_files: int) -> None:
    """Store-program interference (VERDICT r14 #7): production runs
    the streaming store programs TOGETHER, while the solo legs measure
    each only under incidental suite load. Runs drift + decontam +
    ivfpq ingest each SOLO, then all three CONCURRENTLY in the same
    session — fresh outputs, checkpoints, and a fresh ivfpq index per
    phase (append idempotence would otherwise zero the concurrent
    leg) — with identical correctness assertions in both phases, and
    prints per-leg solo vs concurrent throughput plus the interference
    ratio (solo/concurrent; 1.0 = no interference)."""
    import threading

    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.importance import (
        streaming_drift_monitor,
        token_buckets,
        write_drift_reference,
    )
    from airbnb_cdc_spark.operators.similarity import (
        append_ivf_pq_index,
        build_ivf_pq_index,
    )
    from airbnb_cdc_spark.operators.text import (
        streaming_decontam,
        write_benchmark_set,
    )
    from airbnb_cdc_spark.session import get_spark

    spark = get_spark("bench-streaming-mixed")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_mixed_"))
    n_vecs = max(n_docs // 2, n_files)
    try:
        doc_schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        vec_schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        )

        drift_feed = work / "drift_feed"
        drift_feed.mkdir()
        drift_total = write_docs_feed(drift_feed, n_docs, n_files)

        dec_feed = work / "dec_feed"
        dec_feed.mkdir()
        bench_texts = [
            " ".join(f"eval{q}_{t}" for t in range(30)) for q in range(200)
        ]
        per_file = n_docs // n_files
        dec_total = 0
        for fi in range(n_files):
            with open(dec_feed / f"docs_{fi:03d}.json", "w") as f:
                for j in range(per_file):
                    i = fi * per_file + j
                    if i % 10 == 7:  # planted leak: verbatim eval doc
                        text = bench_texts[i % len(bench_texts)]
                    else:
                        text = " ".join(f"w{i}_{t}" for t in range(40))
                    f.write(json.dumps({"doc_id": i, "text": text}) + "\n")
                    dec_total += 1
        expected_flagged = sum(1 for i in range(dec_total) if i % 10 == 7)

        vec_feed = work / "vec_feed"
        vec_feed.mkdir()
        vec_total = write_vectors_feed(vec_feed, n_vecs, n_files)

        # one-time fits, excluded from every timed region
        model = str(work / "drift_model")
        first_docs = spark.read.schema(doc_schema).json(
            str(sorted(drift_feed.iterdir())[0])
        )
        write_drift_reference(token_buckets(first_docs, "text"), model)
        store = str(work / "bench_store")
        write_benchmark_set(
            spark.createDataFrame(
                list(enumerate(bench_texts)), "doc_id long, text string"
            ),
            store,
            n=3,
        )
        first_vecs = spark.read.schema(vec_schema).json(
            str(sorted(vec_feed.iterdir())[0])
        )
        # per-tag IVF-PQ base indexes, built HERE with the other
        # one-time fits (r15 ADVICE): building inside run_ivfpq put an
        # untimed index build concurrent with the OTHER legs' timed
        # windows, inflating their solo/concurrent interference ratios
        # beyond pure store-program interference
        for _tag in ("solo", "conc"):
            build_ivf_pq_index(
                first_vecs, str(work / f"ivfpq_{_tag}"), centroid_mod=None
            )

        def run_drift(tag: str) -> float:
            out = str(work / f"drift_out_{tag}")
            stream = (
                spark.readStream.schema(doc_schema)
                .option("maxFilesPerTrigger", 1)
                .json(str(drift_feed))
            )
            t0 = time.time()
            q = streaming_drift_monitor(
                stream, model, out,
                checkpoint_dir=str(work / f"drift_ckpt_{tag}"),
            )
            q.processAllAvailable()
            q.stop()
            wall = time.time() - t0
            assert spark.read.parquet(out).count() == n_files
            return round(drift_total / wall, 1)

        def run_decontam(tag: str) -> float:
            out = str(work / f"dec_out_{tag}")
            stream = (
                spark.readStream.schema(doc_schema)
                .option("maxFilesPerTrigger", 1)
                .json(str(dec_feed))
            )
            t0 = time.time()
            q = streaming_decontam(
                stream, store, out,
                checkpoint_dir=str(work / f"dec_ckpt_{tag}"),
            )
            q.processAllAvailable()
            q.stop()
            wall = time.time() - t0
            rows = spark.read.parquet(out)
            assert rows.count() == dec_total
            assert rows.filter("contaminated").count() == expected_flagged
            return round(dec_total / wall, 1)

        def run_ivfpq(tag: str) -> float:
            index = str(work / f"ivfpq_{tag}")  # prebuilt in setup
            stream = (
                spark.readStream.schema(vec_schema)
                .option("maxFilesPerTrigger", 1)
                .json(str(vec_feed))
            )

            def _ingest(batch_df, batch_id):
                append_ivf_pq_index(spark, index, batch_df)

            t0 = time.time()
            q = (
                stream.writeStream.foreachBatch(_ingest)
                .option("checkpointLocation", str(work / f"ivfpq_ckpt_{tag}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            n_rows = spark.read.parquet(index + "/lists").count()
            assert n_rows == vec_total, (n_rows, vec_total)
            return round(vec_total / wall, 1)

        legs = {"drift": run_drift, "decontam": run_decontam,
                "ivfpq": run_ivfpq}
        solo = {name: fn("solo") for name, fn in legs.items()}

        conc: dict[str, float] = {}
        errs: list[tuple[str, Exception]] = []

        def _wrap(name, fn):
            try:
                conc[name] = fn("conc")
            except Exception as ex:  # noqa: BLE001 — re-raised below
                errs.append((name, ex))

        threads = [
            threading.Thread(target=_wrap, args=(name, fn), daemon=True)
            for name, fn in legs.items()
        ]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        conc_wall = time.time() - t0
        if errs:
            raise RuntimeError(f"concurrent legs failed: {errs}")

        print(
            json.dumps(
                {
                    "metric": "mixed_contention_stream_wall_sec",
                    "value": round(conc_wall, 2),
                    "unit": "sec",
                    "feed_docs": n_docs,
                    "feed_vecs": vec_total,
                    "micro_batches": n_files,
                    "solo": solo,
                    "concurrent": conc,
                    "interference": {
                        name: round(solo[name] / conc[name], 2)
                        for name in legs
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    args = sys.argv[1:]
    leg = "merge"
    if args and args[0] in ("merge", "session", "minhash", "dsir", "quality", "lm", "sq8", "pq", "buckets", "classify", "drift", "ivfpq", "decontam", "mixed", "lsh"):
        leg = args.pop(0)
    n_rows = int(args[0]) if args else 150_000
    n_files = int(args[1]) if len(args) > 1 else 10
    if leg == "session":
        bench_session(n_rows, n_files)
        return
    if leg == "minhash":
        bench_minhash(n_rows, n_files)
        return
    if leg == "dsir":
        bench_dsir(n_rows, n_files)
        return
    if leg == "quality":
        bench_quality(n_rows, n_files)
        return
    if leg == "lm":
        bench_lm(n_rows, n_files)
        return
    if leg == "sq8":
        bench_sq8(n_rows, n_files)
        return
    if leg == "pq":
        bench_pq(n_rows, n_files)
        return
    if leg == "buckets":
        bench_buckets(n_rows, n_files)
        return
    if leg == "classify":
        bench_classify(n_rows, n_files)
        return
    if leg == "drift":
        bench_drift(n_rows, n_files)
        return
    if leg == "ivfpq":
        bench_ivfpq(n_rows, n_files)
        return
    if leg == "lsh":
        bench_lsh(n_rows, n_files)
        return
    if leg == "decontam":
        bench_decontam(n_rows, n_files)
        return
    if leg == "mixed":
        bench_mixed(n_rows, n_files)
        return

    from airbnb_cdc_spark.operators.merge import ParquetMergeTable
    from airbnb_cdc_spark.session import get_spark
    from airbnb_cdc_spark.streaming.cdc import run_booking_fact_stream

    spark = get_spark("bench-streaming")
    work = Path(tempfile.mkdtemp(prefix="bench_stream_"))
    try:
        feed = work / "feed"
        feed.mkdir()
        total = write_feed(feed, n_rows, n_files, cancel_pct=0.05)

        fact = ParquetMergeTable(
            spark,
            str(work / "fact_booking"),
            ["booking_id"],
            version_col="updated_at",
        )
        t0 = time.time()
        run_booking_fact_stream(
            spark,
            str(feed),
            fact,
            str(work / "ckpt"),
            max_files_per_trigger=1,
        )
        wall = time.time() - t0
        n_fact = fact.read().count()
        print(
            json.dumps(
                {
                    "metric": "booking_stream_merge_rows_per_sec",
                    "value": round(total / wall, 1),
                    "unit": "rows/sec",
                    "feed_rows": total,
                    "fact_rows": n_fact,
                    "micro_batches": n_files + 1,
                    "wall_sec": round(wall, 2),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
