"""CI gate for the driver-rotation coverage ledger: no registered
query may go more than MAX_AGE rounds without a driver correctness
record under the proposed ``_DRIVER_PRIORITY`` cut (the
contrastive_negatives failure mode — registered r1, first record r10
— must never recur silently)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from rotation_audit import MAX_AGE, audit  # noqa: E402


def test_no_query_ages_out_of_the_record():
    rows, upcoming = audit()
    stale = [(n, last, age) for n, last, age in rows if age > MAX_AGE]
    assert not stale, (
        f"rotation for r{upcoming} leaves {len(stale)} queries with a "
        f"record older than {MAX_AGE} rounds: {stale[:5]} — swap them "
        "into _DRIVER_PRIORITY (see scripts/rotation_audit.py output)"
    )


def test_rotation_is_exactly_the_driver_cap():
    from airbnb_cdc_spark import queries as q

    assert len(q._DRIVER_PRIORITY) == 50
    assert len(set(q._DRIVER_PRIORITY)) == 50
    unknown = [n for n in q._DRIVER_PRIORITY if n not in q.QUERIES]
    assert not unknown


def test_planned_next_round_cut_stays_fresh():
    """The written-ahead _NEXT_ROUND_PLAN must survive the audit when
    the upcoming round records the current cut — proving next round
    won't open in the saturation squeeze this guard fired on at r11."""
    rows, upcoming = audit(simulate_next=True)
    stale = [(n, last, age) for n, last, age in rows if age > MAX_AGE]
    assert not stale, (
        f"planned rotation for r{upcoming} leaves {len(stale)} queries "
        f"stale: {stale[:5]} — rebuild _NEXT_ROUND_PLAN in queries.py"
    )


def test_planned_next_round_cut_shape():
    from airbnb_cdc_spark import queries as q

    assert len(q._NEXT_ROUND_PLAN) == 50
    assert len(set(q._NEXT_ROUND_PLAN)) == 50
    unknown = [n for n in q._NEXT_ROUND_PLAN if n not in q.QUERIES]
    assert not unknown
    assert not set(q._NEXT_ROUND_PLAN) & set(q._DRIVER_PRIORITY)
