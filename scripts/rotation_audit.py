"""Registry-rotation coverage ledger: which round last RECORDED each
query, and does the proposed 50-slot rotation keep everyone fresh?

The driver caps CORRECTNESS at 50 queries per round, taken in
``queries()`` iteration order — i.e. the ``_DRIVER_PRIORITY`` cut. As
the registry grows past 150, a query can silently age out of the
record (the contrastive_negatives situation: registered r1, first
driver record r10). This audit makes that failure loud:

- prints, per registered query, its most recent CORRECTNESS_r*.json
  appearance and the age that record would have AFTER the upcoming
  round runs the current rotation;
- exits 1 if any query would be more than ``MAX_AGE`` rounds stale
  (or has never been recorded and is not in the upcoming cut).

Run directly (``python scripts/rotation_audit.py``) or via the
CI-style pytest in tests/test_rotation_audit.py.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MAX_AGE = 3


def load_records() -> dict[int, set[str]]:
    recs: dict[int, set[str]] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", f.name)
        if not m:
            continue
        try:
            recs[int(m.group(1))] = set(json.loads(f.read_text()))
        except (json.JSONDecodeError, TypeError):
            continue
    return recs


def audit(simulate_next: bool = False) -> tuple[list[tuple[str, int | None, int]], int]:
    """(rows, upcoming_round): rows are (query, last_recorded_round,
    projected_age_after_upcoming_round); age 0 = in the upcoming cut.

    With ``simulate_next``, assume the upcoming round records the
    current ``_DRIVER_PRIORITY`` cut verbatim, then audit the round
    AFTER against the planned ``_NEXT_ROUND_PLAN`` cut — so a rotation
    plan written this round is proven feasible before the squeeze."""
    from airbnb_cdc_spark import queries as q

    recs = load_records()
    upcoming = max(recs, default=0) + 1
    cut = set(q._DRIVER_PRIORITY)
    if simulate_next:
        recs = dict(recs)
        recs[upcoming] = set(q._DRIVER_PRIORITY)
        upcoming += 1
        cut = set(q._NEXT_ROUND_PLAN)
    rows = []
    for name in q.QUERIES:
        last = max((r for r, names in recs.items() if name in names), default=None)
        if name in cut:
            age = 0  # records this round
        elif last is None:
            age = upcoming + 1  # never recorded, not scheduled: fail
        else:
            age = upcoming - last
        rows.append((name, last, age))
    return rows, upcoming


def main() -> int:
    simulate = "--simulate-next" in sys.argv[1:]
    rows, upcoming = audit(simulate_next=simulate)
    rows.sort(key=lambda r: (-r[2], r[0]))
    stale = [r for r in rows if r[2] > MAX_AGE]
    print(f"upcoming round: r{upcoming}; registry: {len(rows)} queries; "
          f"cut: 50; max allowed post-round age: {MAX_AGE}")
    for name, last, age in rows:
        mark = "STALE" if age > MAX_AGE else ("cut" if age == 0 else "ok")
        print(f"  {name:40s} last={('r%d' % last) if last else 'never':>6s} "
              f"age_after=r{upcoming}:{age} {mark}")
    if stale:
        print(f"FAIL: {len(stale)} queries would exceed age {MAX_AGE}: "
              + ", ".join(r[0] for r in stale))
        return 1
    print("rotation OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
