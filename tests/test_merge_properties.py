"""Property-based check of MERGE semantics against a pure-Python model:
for arbitrary (key, version, value) batches, merge_dataframes must equal
"per key: row from updates if key present (highest version, with the
engine's deterministic tie-handling), else row from existing"."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airbnb_cdc_spark.operators.merge import merge_dataframes

KEYS = st.integers(min_value=0, max_value=9)
INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
ROWS = st.lists(
    st.tuples(KEYS, st.integers(min_value=0, max_value=5), INT64),
    max_size=12,
)


def _model(existing, updates):
    # updates win per key; within updates the highest version wins
    # (merge's latest_per_key guarantees a deterministic pick; on exact
    # version ties any tied row is admissible — the property below only
    # asserts key/version-level agreement, plus exact values when unique)
    upd_best: dict[int, list[tuple]] = {}
    for k, ver, v in updates:
        cur = upd_best.get(k)
        if cur is None or ver > cur[0][1]:
            upd_best[k] = [(k, ver, v)]
        elif ver == cur[0][1]:
            cur.append((k, ver, v))
    out = {}
    for k, ver, v in existing:
        out[k] = [(k, ver, v)]
    out.update(upd_best)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing=ROWS, updates=ROWS)
def test_merge_matches_model(spark, existing, updates):
    # one row per key on the existing side (tables are keyed)
    existing = list({k: (k, ver, v) for k, ver, v in existing}.values())
    if not existing and not updates:
        return
    schema = "k int, ver int, v long"
    e_df = spark.createDataFrame(existing or [], schema)
    u_df = spark.createDataFrame(updates or [], schema)
    merged = merge_dataframes(e_df, u_df, keys=["k"], version_col="ver")
    got = {r.k: (r.k, r.ver, r.v) for r in merged.collect()}

    want = _model(existing, updates)
    assert set(got) == set(want)
    for k, admissible in want.items():
        assert got[k][1] == admissible[0][1]  # version agrees
        if len(admissible) == 1:
            assert got[k] == admissible[0]
