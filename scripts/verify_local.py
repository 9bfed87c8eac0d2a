"""Local replica of the driver's t2 correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01 (override with $SPARK_GRAFT_VERIFY_SF_DIR), then compares row
count, column names, and an order-insensitive value representation. Use
while iterating:

    python scripts/verify_local.py [query_name ...]
    SPARK_GRAFT_VERIFY_SF_DIR=/root/testdata/sf0.001 python scripts/verify_local.py
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as e  # noqa: E402
from airbnb_cdc_spark.session import TABLES, get_spark, release_cached  # noqa: E402

import os

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        release_cached()
        if name not in oracles:
            print(f"{name}: rows-only check, {len(s_rows)} rows")
            continue
        d = con.execute(oracles[name])
        d_cols = [c[0] for c in d.description]
        d_rows = [tuple(r) for r in d.fetchall()]

        ok = True
        if sorted(s_cols) != sorted(d_cols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}")
            ok = False
        if len(s_rows) != len(d_rows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}")
            ok = False
        if ok:
            cols, sn = _normalize(s_rows, s_cols)
            _, dn = _normalize(d_rows, d_cols)
            if sn != dn:
                ok = False
                ndiff = 0
                for a, b in zip(sn, dn):
                    if a != b:
                        ndiff += 1
                        if ndiff <= 3:
                            for c, x, y in zip(cols, a, b):
                                if x != y:
                                    print(f"{name}: col {c}: spark={x} duck={y}")
                print(f"{name}: VALUE MISMATCH in {ndiff}/{len(sn)} rows")
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(s_rows)} rows)")
        if not ok:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
