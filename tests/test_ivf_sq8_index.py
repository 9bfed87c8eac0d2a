"""Persisted IVF×SQ8 store contract: store queries equal the
in-session ivf_sq8_topk, the lists scan prunes to the probed
partitions, appends use the FROZEN centroids+scale with replay-zero,
width drift fails loud, and the generic lists compactor applies —
the same on-disk contract as the sibling IVF / SQ8 / PQ / IVF-PQ
stores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.similarity import (
    append_ivf_sq8_index,
    build_ivf_sq8_index,
    ivf_sq8_topk,
    query_ivf_sq8_index,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vecs(spark, ids):
    rows = [
        (i, [((((i * 31 + d * 7) % 257) - 128) / 128.0) for d in range(64)])
        for i in ids
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_store_query_equals_in_session_and_prunes(spark, tmp_path):
    import os
    import re

    corpus = _vecs(spark, range(120))
    queries = _vecs(spark, range(0, 120, 60))
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_index(corpus, path, centroid_mod=11, centroid_rem=3)
    out = query_ivf_sq8_index(spark, path, queries, k=3, nprobe=2)
    stored = sorted(map(tuple, out.collect()))
    insess = sorted(
        map(
            tuple,
            ivf_sq8_topk(
                corpus, queries, k=3, centroid_mod=11, centroid_rem=3, nprobe=2
            ).collect(),
        )
    )
    assert stored == insess
    assert len(stored) > 0

    # partition pruning: the lists relation is BUILT from only the
    # probed cid= directories (2 queries x nprobe 2 <= 4 of ~11 lists)
    n_parts = len(
        [d for d in os.listdir(path + "/lists") if d.startswith("cid=")]
    )
    lists_files = [f for f in out.inputFiles() if "/lists/" in f]
    assert lists_files, "lists scan reads no list directory"
    probed = {re.search(r"cid=(\d+)", f).group(1) for f in lists_files}
    assert len(probed) <= 4 < n_parts, (sorted(probed), n_parts)


def test_append_frozen_geometry_and_replay_zero(spark, tmp_path):
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_index(_vecs(spark, range(80)), path)
    n_cents = spark.read.parquet(path + "/centroids").count()
    scale_before = spark.read.parquet(path + "/scale").collect()
    batch = _vecs(spark, range(200, 220))
    assert append_ivf_sq8_index(spark, path, batch) == 20
    assert append_ivf_sq8_index(spark, path, batch) == 0  # replay-zero
    # frozen geometry: centroids and scale untouched
    assert spark.read.parquet(path + "/centroids").count() == n_cents
    assert spark.read.parquet(path + "/scale").collect() == scale_before
    # the store answers over old + new under the same geometry
    qs = _vecs(spark, [0])
    got = {
        r.neighbor_id
        for r in query_ivf_sq8_index(
            spark, path, qs, k=200, nprobe=99
        ).collect()
    }
    assert got == (set(range(1, 80)) | set(range(200, 220)))


def test_wrong_and_mixed_width_fail_loud(spark, tmp_path):
    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_index(_vecs(spark, range(60)), path, centroid_mod=11,
                        centroid_rem=3)
    wide = spark.createDataFrame([(0, [0.5] * 128)], _SCHEMA)
    with pytest.raises(ValueError, match="components"):
        query_ivf_sq8_index(spark, path, wide, k=3)
    with pytest.raises(ValueError, match="components"):
        append_ivf_sq8_index(spark, path, wide)
    n_before = spark.read.parquet(path + "/lists").count()
    mixed = spark.createDataFrame(
        [(100, [0.5] * 64), (101, [0.5] * 128)], _SCHEMA
    ).coalesce(1)
    with pytest.raises(ValueError, match="mixed|components"):
        append_ivf_sq8_index(spark, path, mixed)
    assert spark.read.parquet(path + "/lists").count() == n_before


def test_generic_compactor_and_crash_window_apply(spark, tmp_path):
    """The layout shares the lists/cid= contract, so compact_ivf_lists
    defragments it and the append-side recovery preamble covers the
    crashed-compaction S1 window — same guarantees as every sibling
    store."""
    import os

    from airbnb_cdc_spark.operators.similarity import compact_ivf_lists

    path = str(tmp_path / "ivfsq8")
    build_ivf_sq8_index(_vecs(spark, range(60)), path, centroid_mod=11,
                        centroid_rem=3)
    for lo in range(100, 160, 10):
        assert append_ivf_sq8_index(
            spark, path, _vecs(spark, range(lo, lo + 10))
        ) == 10
    lists_dir = os.path.join(path, "lists")
    qs = _vecs(spark, [0, 105])
    want = sorted(map(tuple, query_ivf_sq8_index(spark, path, qs, k=5,
                                                 nprobe=3).collect()))
    assert compact_ivf_lists(spark, path, max_files=4) > 0
    got = sorted(map(tuple, query_ivf_sq8_index(spark, path, qs, k=5,
                                                nprobe=3).collect()))
    assert got == want and got

    # S1 crash window: park a victim list, then append replayed+new ids
    by_cid = (
        spark.read.parquet(lists_dir)
        .groupBy("cid")
        .agg(F.collect_list("vec_id").alias("ids"))
        .collect()
    )
    victim = max(by_cid, key=lambda r: len(r.ids))
    replayed = sorted(victim.ids)[:3]
    live = os.path.join(lists_dir, f"cid={victim.cid}")
    os.rename(live, live + ".old")
    assert append_ivf_sq8_index(
        spark, path, _vecs(spark, replayed + [500, 501])
    ) == 2
    assert os.path.exists(live) and not os.path.exists(live + ".old")
    ids = [r.vec_id for r in spark.read.parquet(lists_dir).collect()]
    assert len(ids) == len(set(ids))  # no double-write
    assert set(ids) == set(range(60)) | set(range(100, 160)) | {500, 501}
