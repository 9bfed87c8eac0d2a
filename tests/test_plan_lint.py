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


def test_minhash_store_query_never_rescans_text(spark):
    """The r16 re-lead contract for dedup_minhash_lsh: banding + bucket
    join + exact verify consume the PERSISTED signature store only —
    the plan must read zero bytes of documents.parquet (the signature
    derivation runs once per corpus via _derive_once, not per pass)."""
    try:
        df = Q.QUERIES["dedup_minhash_lsh"](spark, SF_DIR)
        files = df.inputFiles()
    finally:
        release_cached()
    assert files, "query reads no input at all?"
    assert not any("documents.parquet" in f for f in files), files
