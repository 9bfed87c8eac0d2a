"""Registry-wide physical-plan lint: structural anti-patterns must not
exist in ANY registered query, not just the ones a human remembered to
.explain(). Two invariants:

- No ``CartesianProduct``: an unconditioned cross product is the one
  join shape that cannot survive a 100x scale-up. (One-row broadcast
  joins — totals, caps, hot-sets — plan as BroadcastNestedLoopJoin
  with a bounded build side, which is fine and distinct.)
- No row-at-a-time Python UDF (``BatchEvalPython``): Python may touch
  data only through Arrow batches (``ArrowEvalPython`` / ``MapInPandas``
  / ``FlatMapGroupsInPandas*``), per the repo's §2.9 stance.

Planning only — nothing executes; the whole registry lints in about a
minute at sf0.001.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from airbnb_cdc_spark import queries as Q
from airbnb_cdc_spark.session import release_cached

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = {
    "CartesianProduct": "unconditioned cross product",
    "BatchEvalPython": "row-at-a-time Python UDF",
}


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("qname", sorted(Q.QUERIES))
def test_no_plan_antipatterns(spark, qname):
    try:
        df = Q.QUERIES[qname](spark, SF_DIR)
        plan = _plan_text(df)
    finally:
        release_cached()
    for node, why in FORBIDDEN.items():
        assert node not in plan, f"{qname}: plan contains {node} ({why})"
