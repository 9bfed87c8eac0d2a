"""Pins the SHIPPED store-backed registry path of `ann_topk_lsh` and
`ann_topk_lsh_multiprobe` (the shared-store re-lead landed in r17;
this file started as its rehearsal and now guards the live path
against the unchanged registry oracles): pins that ONE
``build_lsh_index`` store (bits=4, the registry parameter) +
``query_lsh_index`` at nprobe=1 and nprobe=3 reproduces both DuckDB
oracles value for value at sf0.001 — the store freezes (bits, dim),
the hyperplanes re-derive deterministically, and the exact-cosine
re-rank replays bit-exactly. With this green, both live
store-backed registry implementations are value-identical to their
oracles, and every ANN registry query runs on a persisted store."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    build_lsh_index,
    query_lsh_index,
)
from airbnb_cdc_spark.oracles import _ANN_LSH_MP_ORACLE, _ANN_LSH_ORACLE

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "nprobe,sql",
    [(1, _ANN_LSH_ORACLE), (3, _ANN_LSH_MP_ORACLE)],
    ids=["nprobe1", "nprobe3"],
)
def test_store_backed_lsh_matches_registry_oracles(
    spark, tmp_path, nprobe, sql
):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "lsh")
    build_lsh_index(emb, path, bits=4)  # the registry parameter
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_lsh_index(
            spark, path, queries, k=5, nprobe=nprobe
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = {
        (row[0], row[3]): (row[1], row[2])
        for row in con.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for key, (nid, cos) in got.items():
        wnid, wcos = want[key]
        assert nid == wnid and repr(cos) == repr(wcos), (key, got[key], want[key])
    assert len(got) > 0
