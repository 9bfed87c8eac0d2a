"""Property test: asof_join agrees with a brute-force per-row reference
on random key/timestamp data (including duplicate timestamps)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from airbnb_cdc_spark.operators.asof import asof_join

T0 = datetime(2025, 1, 1)


@st.composite
def _tables(draw):
    left = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, minute)
            min_size=1,
            max_size=12,
        )
    )
    right = draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
            min_size=0,
            max_size=12,
        )
    )
    return left, right


@settings(max_examples=12, deadline=None)
@given(_tables())
def test_asof_matches_bruteforce(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(left_rows)],
        "lid long, k long, ts timestamp",
    )
    # dedupe right to one row per (k, ts) keeping max payload — the
    # determinism precondition asof_join documents
    best = {}
    for k, m, p in right_rows:
        key = (k, m)
        best[key] = max(best.get(key, -1), p)
    right = spark.createDataFrame(
        [(k, T0 + timedelta(minutes=m), p) for (k, m), p in best.items()],
        "k long, ts timestamp, payload long",
    )
    out = {
        r.lid: r.r_payload
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    for i, (k, m) in enumerate(left_rows):
        candidates = [p for (rk, rm), p in best.items() if rk == k and rm <= m]
        expected = (
            max(
                ((rm, p) for (rk, rm), p in best.items() if rk == k and rm <= m),
                key=lambda t: t[0],
            )[1]
            if candidates
            else None
        )
        assert out[i] == expected, (i, k, m, out[i], expected)


@settings(max_examples=12, deadline=None)
@given(_tables())
def test_asof_forward_matches_bruteforce(spark, data):
    """direction="forward": earliest right row at-or-after, smallest
    tie_breaks tuple winning among equal timestamps (no dedupe — the
    tie-break itself is under test)."""
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(i, k, T0 + timedelta(minutes=m)) for i, (k, m) in enumerate(left_rows)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, T0 + timedelta(minutes=m), p) for (k, m, p) in right_rows],
        "k long, ts timestamp, payload long",
    )
    out = {
        r.lid: r.r_payload
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            tie_breaks=["payload"],
            direction="forward",
        ).collect()
    }
    for i, (k, m) in enumerate(left_rows):
        cands = [(rm, p) for (rk, rm, p) in right_rows if rk == k and rm >= m]
        expected = min(cands)[1] if cands else None
        assert out[i] == expected, (i, k, m, out[i], expected)
