"""Pins `ann_topk_ivf_sq8`'s SHIPPED store-backed registry path (the
re-lead landed in r17; this file started as its rehearsal and now
guards the live path against the unchanged registry oracle): pins
that ``build_ivf_sq8_index`` (registry defaults:
centroid_mod=37/rem=3, frozen corpus-derived scale) +
``query_ivf_sq8_index`` with the registry query's exact probe set
(vec_id % 50 == 0, k=5, nprobe=2) reproduces the `ann_topk_ivf_sq8`
DuckDB oracle value for value at sf0.001 — the store freezes the same
deterministic centroids and SQ8 scale the in-session ``ivf_sq8_topk``
recomputes per run, and the integer dot scores replay exactly. With
this green, the live store-backed registry implementation is
value-identical to the oracle the in-session form was recorded
against."""

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
