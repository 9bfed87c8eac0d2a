"""Interleaved same-session A/B for bench drift adjudication.

The repo rule (COVERAGE.md "bench drifters"): a cross-session bench
delta on untouched code is only a regression if an interleaved
same-session A/B reproduces it. Runs the named queries alternately for
N reps in ONE Spark session at the bench SF and prints per-rep wall
times plus min-of-N, the only number the protocol trusts.

    python scripts/ab_drift.py ann_topk_ivf_recall ann_topk_ivf_nprobe
    REPS=4 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ab_drift.py a b
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from airbnb_cdc_spark.session import get_spark, release_cached  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "4"))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: ab_drift.py query [query ...]", file=sys.stderr)
        return 2
    qs = e.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("ab_drift")
    times: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(REPS):
        for n in names:
            t0 = time.monotonic()
            # .count(), matching bench.py's measurement — .collect()
            # would add driver-side row serialization the bench never
            # pays (first A/B run of repetition_filter mismeasured
            # 2.2s vs the bench's 0.6s for exactly this reason).
            qs[n](spark, SF_DIR).count()
            dt = time.monotonic() - t0
            release_cached()
            times[n].append(dt)
            print(f"rep {rep + 1} {n}: {dt:.3f}s", flush=True)
    print("---")
    for n in names:
        reps = ", ".join(f"{t:.3f}" for t in times[n])
        print(f"{n}: [{reps}] min={min(times[n]):.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
