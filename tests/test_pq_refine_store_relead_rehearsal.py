"""Rehearsal for a possible r16+ RE-LEAD of `ann_topk_pq` onto the
persisted PQ store (the ivf-pq/sq8 re-lead pattern, VERDICT r14 #6):
pins that the on-disk FAISS ``IndexRefineFlat`` —
``write_pq_index`` once + ``query_pq_index_refined`` (ADC shortlist
from the STORED code table, exact re-rank of only refine*k against
the float corpus frame) with the registry query's exact parameters
(k=5, refine=10, m=16, queries vec_id % 50 == 0) — reproduces the
`ann_topk_pq` DuckDB oracle value for value at sf0.001. The registry
query deliberately replays codebook+encode in session; this is its
amortized production path with a pre-pinned bit-exact oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    query_pq_index_refined,
    write_pq_index,
)
from airbnb_cdc_spark.oracles import (
    _ANN_PQ_K,
    _ANN_PQ_M,
    _ANN_PQ_ORACLE,
    _ANN_PQ_REFINE,
)

SF_DIR = "/root/testdata/sf0.001"


def test_store_backed_pq_refine_matches_registry_oracle(spark, tmp_path):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "pq")
    write_pq_index(emb, path, m=_ANN_PQ_M)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_pq_index_refined(
            spark, path, emb, queries, k=_ANN_PQ_K, refine=_ANN_PQ_REFINE
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = {
        (row[0], row[3]): (row[1], row[2])
        for row in con.execute(_ANN_PQ_ORACLE).fetchall()
    }
    # exact-integer shortlist + deterministic double cosine: bit-exact
    assert set(got) == set(want)
    for key, (nid, cos) in got.items():
        wnid, wcos = want[key]
        assert nid == wnid and repr(cos) == repr(wcos), (key, got[key], want[key])
    assert len(got) > 0
