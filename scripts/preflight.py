"""Round-start environment-drift preflight.

Round 4 lost 13 correctness rows and the entire bench to a silent
testdata format change (events.ts switched physical type between
rounds). This script is the cheap early-warning: it reads EVERY driver
table once at the smallest SF, prints the resolved schema, and runs a
3-query smoke (one scan-side, one join-side, one events query — the
table whose format has actually drifted). Run it FIRST each round:

    python scripts/preflight.py [sf_dir]

Exit 0 = environment matches the engine's assumptions; any failure
prints the offending table/query before a single turn is spent
elsewhere.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from airbnb_cdc_spark.session import TABLES, get_spark, load_table  # noqa: E402

SMOKE_QUERIES = ("filter_by_status", "booking_customer_aggregation", "user_funnel")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("preflight")
    spark.sparkContext.setLogLevel("ERROR")
    failures = []

    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            failures.append(f"{name}: MISSING at {path}")
            continue
        try:
            df = load_table(spark, sf_dir, name)
            n = df.count()
            print(f"{name}: {n} rows  {df.dtypes}")
        except Exception as exc:  # noqa: BLE001 — report every table
            failures.append(f"{name}: {type(exc).__name__}: {exc}")

    from airbnb_cdc_spark import queries as q

    for qname in SMOKE_QUERIES:
        try:
            n = q.QUERIES[qname](spark, sf_dir).count()
            print(f"query {qname}: {n} rows")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"query {qname}: {type(exc).__name__}: {exc}")

    if failures:
        print("\nPREFLIGHT FAILURES:")
        for f in failures:
            print(f"  {f}")
        return 1
    print("preflight green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
