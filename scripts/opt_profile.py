"""r17 optimization measurement harness (guide §1).

Two modes over registered queries:

    # Capture .explain("formatted") snapshots (plans/r17/<q>_<tag>.txt):
    python scripts/opt_profile.py plans --tag before q1 q2 ...

    # Time queries with the noop sink (computes EVERY column — §1.4),
    # min-of-N, labeled jobs; prints one JSON line per query:
    python scripts/opt_profile.py time --reps 3 q1 q2 ...

`time` uses the noop sink *in addition to* the bench's count() so the
two methodologies stay distinguishable: bench.py remains the driver
contract (count()), this harness is the isolation instrument.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from airbnb_cdc_spark import queries as q  # noqa: E402
from airbnb_cdc_spark.session import get_spark, release_cached  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["plans", "time"])
    ap.add_argument("names", nargs="*", help="query names; empty = all")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--round", default="r18", help="plans/<round>/ output dir")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", action="store_true", help="run each query once untimed first")
    args = ap.parse_args()

    names = args.names or list(q.QUERIES)
    unknown = [n for n in names if n not in q.QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "plans":
        outdir = REPO / "plans" / args.round
        outdir.mkdir(parents=True, exist_ok=True)
        for name in names:
            df = q.QUERIES[name](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            release_cached()
            (outdir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
            print(f"wrote plans/{args.round}/{name}_{args.tag}.txt")
        return

    # time mode
    for name in names:
        fn = q.QUERIES[name]
        if args.warm:
            try:
                fn(spark, args.sf_dir).count()
            except Exception:
                pass
            release_cached()
        best, runs = float("inf"), []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            release_cached()
            runs.append(round(dt, 3))
            best = min(best, dt)
        print(json.dumps({"query": name, "best": round(best, 3), "runs": runs, "sink": args.sink}))


if __name__ == "__main__":
    main()
