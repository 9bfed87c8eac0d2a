"""Pins the plain-IVF ANN family's SHIPPED store-backed registry path
(`ann_topk_ivf`, `ann_topk_ivf_nprobe`, `ann_topk_ivf_recall`,
`ann_topk_ivf_kmeans` were RE-LED onto build_ivf_index/query_ivf_index
in r16 — this file started as that re-lead's rehearsal and now guards
the live path against the unchanged registry oracles): pins that

- ``build_ivf_index`` (registry defaults) + ``query_ivf_index`` at
  nprobe 1/2/8 reproduces the `ann_topk_ivf` / `_nprobe` / `_recall`
  DuckDB oracles value for value at sf0.001 — ONE store serves all
  three recall points, and
- ``build_ivf_index(refine_iters=1)`` + ``query_ivf_index(nprobe=2)``
  reproduces the `ann_topk_ivf_kmeans` oracle — the store freezes the
  SAME deterministic Lloyd refinement (``_lloyd_refine``, element-wise
  floor-integer means) the in-session query recomputes per run, so the
  most expensive in-session IVF leg collapses to the amortized
  read-the-lists path.

With these green, the live store-backed registry implementations are
value-identical to the oracles the in-session forms were recorded
against (the registration pattern every r14-r16 first record
followed)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.similarity import (
    build_ivf_index,
    query_ivf_index,
)
from airbnb_cdc_spark.oracles import (
    _IVF_KMEANS_ORACLE,
    _IVF_ORACLE,
    _ivf_nprobe_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _oracle_rows(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return {
        (row[0], row[3]): (row[1], row[2]) for row in con.execute(sql).fetchall()
    }


@pytest.mark.parametrize(
    "nprobe,sql",
    [(1, _IVF_ORACLE), (2, _ivf_nprobe_sql(2)), (8, _ivf_nprobe_sql(8))],
    ids=["nprobe1", "nprobe2", "nprobe8"],
)
def test_store_backed_ivf_matches_registry_oracles(
    spark, tmp_path, nprobe, sql
):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)  # registry defaults: centroid_mod=37/rem=3
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_ivf_index(
            spark, path, queries, k=5, nprobe=nprobe
        ).collect()
    }
    want = _oracle_rows(sql)
    assert set(got) == set(want)
    for key, (nid, cos) in got.items():
        wnid, wcos = want[key]
        assert nid == wnid and repr(cos) == repr(wcos), (key, got[key], want[key])
    assert len(got) > 0


def test_store_backed_ivf_kmeans_matches_registry_oracle(spark, tmp_path):
    from airbnb_cdc_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfk")
    build_ivf_index(emb, path, refine_iters=1)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in query_ivf_index(spark, path, queries, k=5, nprobe=2).collect()
    }
    want = _oracle_rows(_IVF_KMEANS_ORACLE)
    assert set(got) == set(want)
    for key, (nid, cos) in got.items():
        wnid, wcos = want[key]
        assert nid == wnid and repr(cos) == repr(wcos), (key, got[key], want[key])
    assert len(got) > 0
