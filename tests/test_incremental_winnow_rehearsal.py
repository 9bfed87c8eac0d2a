"""Oracle REHEARSAL for the `incremental_winnow_neardup` registry
query (the r16 `shard_pack_export` registration pattern: pin the full
registry path bit-exact against the oracle BEFORE the registration
takes a driver slot): the winnow family's incremental leg — a NEW
batch (upper half of doc ids) checked against the ingested half's
PERSISTED hot-fp-capped fingerprint store
(`dedup.py incremental_winnow_neardup` + `capped_winnow_posts`) —
compared value for value against the exact DuckDB SQL at sf0.001.

Mirrors the minhash/chunk incremental discipline: the store derives
once per corpus snapshot (here written to a tmp dir exactly as the
registry `_derive_once` leg will), per run only the arriving half is
fingerprinted, and the corpus text is never rescanned. Everything is
md5-h60 integer arithmetic, so the replay is bit-exact."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.dedup import (
    capped_winnow_posts,
    incremental_winnow_neardup,
    winnowed_fingerprints,
)
from airbnb_cdc_spark.oracles import _INCR_WINNOW_ORACLE

SF_DIR = "/root/testdata/sf0.001"


def test_incremental_winnow_matches_duckdb_rehearsal(spark, tmp_path):
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cut = docs.agg(
        (F.max("doc_id").cast("long") / 2).cast("long").alias("cut")
    )
    with_cut = docs.join(F.broadcast(cut))
    corpus = with_cut.filter(F.col("doc_id") <= F.col("cut")).select(
        "doc_id", "text"
    )
    batch = with_cut.filter(F.col("doc_id") > F.col("cut")).select(
        "doc_id", "text"
    )

    # the store derivation the registry leg will run once per sf_dir:
    # fingerprint the ingested half, cap hot fps over the FROZEN
    # corpus snapshot, persist the capped postings
    path = str(tmp_path / "winnow_posts")
    posts = winnowed_fingerprints(corpus)
    total = corpus.select(F.count(F.lit(1)).alias("__n"))
    capped_winnow_posts(posts, total).select("doc_id", "fp").write.mode(
        "overwrite"
    ).parquet(path)

    got = {
        r.doc_id: (r.match_id, r.shared_fps)
        for r in incremental_winnow_neardup(
            batch, spark.read.parquet(path)
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(_INCR_WINNOW_ORACLE).fetchall()
    }
    assert got == want  # bit-exact: ids, best match, shared counts
    assert len(got) > 0
