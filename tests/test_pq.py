"""Product-quantization family (operators/similarity.py: pq_codebook,
pq_codes, pq_topk, ivf_pq_topk, pq_refine_topk): exact coding
semantics on planted vectors, recall against the exact baseline, and
the plan shapes the 100 TB posture rests on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    ivf_pq_topk,
    pq_codebook,
    pq_codes,
    pq_refine_topk,
    pq_topk,
    brute_force_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _planted(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_codes_copy_of_codebook_entry_codes_to_it(spark):
    """A vector identical to a codebook entry must take that entry's
    cid in EVERY subspace (distance 0 beats everything)."""
    base = [float(i) / 100 for i in range(64)]
    other = [float(63 - i) / 100 for i in range(64)]
    rows = [
        (1, base),  # codebook entry (odd id, cb_mod=2 rem=1)
        (3, other),  # codebook entry
        (4, base),  # exact copy of entry 1
    ]
    cb = pq_codebook(_planted(spark, rows), m=16, cb_mod=2, cb_rem=1)
    codes = pq_codes(_planted(spark, rows), cb, m=16).collect()
    got = {(r.vec_id, r.j): r.cid for r in codes}
    assert all(got[(4, j)] == 1 for j in range(16))
    assert all(got[(1, j)] == 1 for j in range(16))
    assert all(got[(3, j)] == 3 for j in range(16))


def test_pq_codes_tie_breaks_to_smaller_cid(spark):
    """Two equidistant codebook entries -> the smaller cid wins (the
    total order the oracle replays)."""
    a = [0.0] * 64
    b = [2e-6] * 64  # quantizes to 2 in every component
    mid = [1e-6] * 64  # quantizes to 1: equidistant from both
    rows = [(1, a), (3, b), (4, mid)]
    cb = pq_codebook(_planted(spark, rows), m=16, cb_mod=2, cb_rem=1)
    codes = pq_codes(_planted(spark, rows), cb, m=16).collect()
    got = {(r.vec_id, r.j): r.cid for r in codes}
    assert all(got[(4, j)] == 1 for j in range(16))


def test_pq_codebook_fails_loud(spark):
    rows = [(2, [0.1] * 64), (4, [0.2] * 64)]
    with pytest.raises(ValueError, match="no vec_id satisfies"):
        pq_codebook(_planted(spark, rows), m=16, cb_mod=2, cb_rem=1)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebook(_planted(spark, rows), m=7)


def test_pq_refine_recall_at_sf0001(spark):
    """The registry-facing shape: ADC shortlist (refine*k) + exact
    re-rank. Measured 1.00 recall@5 at sf0.001/sf0.01 and 0.99 at
    sf0.1 with the derived ~256-entry codebook; gate at 0.95."""
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = brute_force_topk(emb, qs, k=5).select("query_id", "neighbor_id")
    approx = pq_refine_topk(emb, qs, k=5).select("query_id", "neighbor_id")
    tot = exact.count()
    hit = exact.join(approx, ["query_id", "neighbor_id"]).count()
    assert hit / tot >= 0.95
    # same schema + tie-break as brute_force_topk: directly comparable
    assert approx.columns == ["query_id", "neighbor_id"]


def test_ivf_pq_consistent_with_flat_pq_scores(spark):
    """IVF x PQ prunes candidates but must score survivors with the
    SAME ADC sums as the flat scan: every (query, neighbor, score)
    ivf_pq emits appears identically in pq_topk's full scoring."""
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    # flat scan ranked over everything: k large enough to contain any
    # pruned candidate the IVF leg can emit
    flat = pq_topk(emb, qs, k=10_000, m=16, cb_mod=7, cb_rem=1).select(
        "query_id", "neighbor_id", "pq_score"
    )
    ivf = ivf_pq_topk(emb, qs, k=5, m=16, cb_mod=7, cb_rem=1).select(
        "query_id", "neighbor_id", "pq_score"
    )
    n_ivf = ivf.count()
    assert n_ivf > 0
    agree = ivf.join(flat, ["query_id", "neighbor_id", "pq_score"]).count()
    assert agree == n_ivf


def test_pq_plan_shapes(spark):
    """100 TB posture: the codebook join is broadcast (never a
    corpus-side shuffle join against the codebook), and nothing in the
    PQ pipeline plans a cartesian product."""
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    for df in (
        pq_topk(emb, qs, k=5, m=16, cb_mod=7, cb_rem=1),
        pq_refine_topk(emb, qs, k=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # codebook/LUT/shortlist sides
