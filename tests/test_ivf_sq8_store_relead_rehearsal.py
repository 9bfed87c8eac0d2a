"""Rehearsal for a planned r17 RE-LEAD of `ann_topk_ivf_sq8` onto the
persisted IVF×SQ8 store (the ivf/pq/sq8/ivf-pq re-lead pattern, VERDICT
r14 #6 / r15 #4: slot-free implementation swaps over net-new
registrations): pins that ``build_ivf_sq8_index`` (registry defaults:
centroid_mod=37/rem=3, frozen corpus-derived scale) +
``query_ivf_sq8_index`` with the registry query's exact probe set
(vec_id % 50 == 0, k=5, nprobe=2) reproduces the `ann_topk_ivf_sq8`
DuckDB oracle value for value at sf0.001 — the store freezes the same
deterministic centroids and SQ8 scale the in-session ``ivf_sq8_topk``
recomputes per run, and the integer dot scores replay exactly. With
this green, the r17 re-lead is a move-the-implementation edit with a
pre-pinned bit-exact oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    build_ivf_sq8_index,
    query_ivf_sq8_index,
)
from airbnb_cdc_spark.oracles import _IVF_SQ8_ORACLE

SF_DIR = "/root/testdata/sf0.001"


def test_store_backed_ivf_sq8_matches_registry_oracle(spark, tmp_path):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.score8)
        for r in query_ivf_sq8_index(
            spark, path, queries, k=5, nprobe=2
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = {
        (row[0], row[3]): (row[1], row[2])
        for row in con.execute(_IVF_SQ8_ORACLE).fetchall()
    }
    assert got == want  # bit-exact: the store replays the oracle
    assert len(got) > 0
