"""Rehearsal for the planned r16 RE-LEAD of `ann_topk_ivf_pq` onto
the persisted store (VERDICT r14 #6: prefer re-leading existing
queries onto stores over net-new registrations): the registry query
currently replays codebook+encode in session so its first driver
record reproduces the rehearsal oracle exactly; the production path
is ``build_ivf_pq_index`` once + ``query_ivf_pq_index`` per batch.
This pins that the STORE-BACKED path — built with the registry
query's exact parameters (centroid_mod=37/rem=3, m=16, derived
codebook) and queried with its exact probe set (vec_id % 50 == 0,
k=5, nprobe=2) — reproduces the SAME DuckDB oracle value for value at
sf0.001, so the r16 re-lead is a move-the-implementation edit with a
pre-pinned bit-exact oracle (the registration pattern every r14/r15
first record followed)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    build_ivf_pq_index,
    query_ivf_pq_index,
)
from airbnb_cdc_spark.oracles import _ANN_IVF_PQ_ORACLE, _IVFPQ_K, _IVFPQ_NPROBE

SF_DIR = "/root/testdata/sf0.001"


def test_store_backed_ivf_pq_matches_registry_oracle(spark, tmp_path):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfpq")
    # registry-query parameters: centroid_mod/rem and m are the
    # build_ivf_pq_index defaults; cb_mod=None derives max(2, n//256)
    # exactly as the oracle's params CTE does
    build_ivf_pq_index(emb, path)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.pq_score)
        for r in query_ivf_pq_index(
            spark, path, queries, k=_IVFPQ_K, nprobe=_IVFPQ_NPROBE
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = {
        (row[0], row[3]): (row[1], row[2])
        for row in con.execute(_ANN_IVF_PQ_ORACLE).fetchall()
    }
    assert got == want  # bit-exact: the store replays the oracle
    assert len(got) > 0
