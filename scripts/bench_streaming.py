"""Streaming-leg throughput: run_booking_fact_stream foreachBatch-merge
rows/sec at sf0.1-comparable volume (VERDICT r7 ask #8).

Generates a booking JSON feed sized like the sf0.1 orders table
(~150k rows) as N_FILES files + one cancellation wave, then drives the
checkpointed Trigger.AvailableNow stream with maxFilesPerTrigger=1 so
every file is its own micro-batch (the per-batch merge cost — split,
contract cast, bucket-pruned LWW upsert — is what's being measured,
not one giant batch). Prints one JSON line; feed generation is outside
the timed region.

Usage: python scripts/bench_streaming.py [n_rows] [n_files]
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


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
