"""Pins for the r17 optimization-round memoization contracts.

Three caches were added in r17, all of which cache ANALYSIS (logical
plans, bounded metadata), never query results:

- ``session.load_table``: per (session, sf_dir, table) DataFrame memo;
- ``queries._store_df``: per (session, path) memo for immutable
  _derive_once store paths;
- ``similarity._read_store_part`` / ``_store_part_row`` /
  ``_stored_width_cached``: per (session, path, DIR MTIME) memo for
  build-frozen store artifacts — the mtime key is what makes serving a
  stale plan after an in-place rebuild impossible.

And two operators grew result-invariant parameters:

- ``chunk_dedup``'s ``chunks=`` pass-through (the shared chunk-table
  store re-lead) must be row-identical to the default self-chunking
  path;
- ``bloom_semi_join``'s xxhash64 probe must stay exactly the plain
  left-semi (covered for sizing in test_bloomjoin; re-pinned here via
  the survivor-superset property the hash change must preserve).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from airbnb_cdc_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_load_table_memo_identity_and_isolation(spark):
    a = load_table(spark, SF, "orders")
    b = load_table(spark, SF, "orders")
    assert a is b, "same (session, sf_dir, table) must hit the memo"
    c = load_table(spark, "/root/testdata/sf0.01", "orders")
    assert c is not a, "a different sf_dir must not share the entry"
    # the memo caches the plan, not data: actions still scan parquet
    assert a.count() == b.count() > 0


def test_store_part_cache_invalidates_on_rebuild(spark, tmp_path):
    from airbnb_cdc_spark.operators.similarity import (
        _read_store_part,
        _store_part_row,
    )

    path = str(tmp_path / "meta")
    spark.createDataFrame([(4, 8)], "bits int, dim int").write.parquet(path)
    df1 = _read_store_part(spark, path)
    assert _read_store_part(spark, path) is df1, "stable dir must memo-hit"
    row1 = _store_part_row(spark, path)
    assert (row1.bits, row1.dim) == (4, 8)

    # in-place rebuild: the directory mtime changes, so the cache MUST
    # serve a fresh plan and a fresh row (never the stale ones)
    time.sleep(0.05)  # local-fs mtime granularity guard
    spark.createDataFrame([(6, 16)], "bits int, dim int").write.mode(
        "overwrite"
    ).parquet(path)
    df2 = _read_store_part(spark, path)
    assert df2 is not df1, "rebuild must invalidate the DataFrame memo"
    row2 = _store_part_row(spark, path)
    assert (row2.bits, row2.dim) == (6, 16), "stale meta row served"


def test_stored_width_cache_tracks_rebuild(spark, tmp_path):
    from airbnb_cdc_spark.operators.similarity import _stored_width_cached

    path = str(tmp_path / "codes")
    spark.createDataFrame(
        [(1, [1, 2, 3])], "vec_id long, c8 array<int>"
    ).write.parquet(path)
    assert _stored_width_cached(spark, path, "c8") == 3
    time.sleep(0.05)
    spark.createDataFrame(
        [(1, [1, 2, 3, 4])], "vec_id long, c8 array<int>"
    ).write.mode("overwrite").parquet(path)
    assert _stored_width_cached(spark, path, "c8") == 4


def test_chunk_dedup_precomputed_chunks_is_identical(spark, tmp_path):
    from airbnb_cdc_spark.operators.dedup import chunk_dedup
    from airbnb_cdc_spark.operators.text import chunk_documents

    docs = load_table(spark, SF, "documents")
    default = chunk_dedup(docs, window=64, stride=48)

    store = str(tmp_path / "chunks")
    chunk_documents(docs, window=64, stride=48).write.parquet(store)
    via_store = chunk_dedup(
        docs, window=64, stride=48, chunks=spark.read.parquet(store)
    )
    cols = default.columns
    assert via_store.columns == cols
    assert (
        default.exceptAll(via_store).count() == 0
        and via_store.exceptAll(default).count() == 0
    ), "chunks= pass-through changed the marking"


def test_bloom_semi_join_xxh_probe_stays_exact(spark):
    from airbnb_cdc_spark.operators.bloomjoin import (
        bloom_prune,
        bloom_semi_join,
    )

    fact = spark.range(0, 2000).select(F.col("id").alias("k"))
    dim = spark.range(0, 2000).filter("id % 17 = 3").select(
        F.col("id").alias("dk")
    )
    got = {
        r.k
        for r in bloom_semi_join(
            fact, dim, "k", "dk", num_bits=512, num_hashes=3
        ).collect()
    }
    want = {r.dk for r in dim.collect()}
    assert got == want, "xxh64 probe broke the exact semi-join contract"
    # and the xxh64 survivor set is a superset of the true matches
    # (no false negatives — the property the verify join relies on)
    survivors = {
        r.k
        for r in bloom_prune(
            fact, dim, "k", "dk", num_bits=512, num_hashes=3,
            hash_fn="xxh64",
        ).collect()
    }
    assert want <= survivors
