"""Lifecycle contract of the `_derive_once` store mechanism every
re-led registry query now rides (r16 verdict #7): distinct corpus
snapshots (sf_dirs) never share a store path, a key derives exactly
once even under concurrent first use, and a mid-session
``release_cached()`` sweep — which unpersists CACHED frames — cannot
invalidate a published on-disk store another query is reading (stores
are parquet in atexit-cleaned temp dirs, outside the cache tracker;
the ``cache_scope`` contract isolates persisted frames the same way).
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from airbnb_cdc_spark.queries import _derive_once
from airbnb_cdc_spark.session import (
    cache_scope,
    persist_tracked,
    release_cached,
)

SF_DIR = "/root/testdata/sf0.001"


def test_distinct_keys_get_distinct_paths_and_derive_once(tmp_path):
    memo: dict = {}
    calls: list[str] = []

    def derive(p: str) -> None:
        calls.append(p)

    p_a = _derive_once(memo, "sfA", "test_lifecycle_", derive)
    p_b = _derive_once(memo, "sfB", "test_lifecycle_", derive)
    assert p_a != p_b  # two snapshots never share a store path
    assert len(calls) == 2

    def boom(p: str) -> None:
        raise AssertionError("memo hit must not re-derive")

    assert _derive_once(memo, "sfA", "test_lifecycle_", boom) == p_a
    assert _derive_once(memo, "sfB", "test_lifecycle_", boom) == p_b


def test_concurrent_first_use_derives_exactly_once():
    memo: dict = {}
    calls: list[str] = []
    lock = threading.Lock()
    paths: list[str] = []

    def derive(p: str) -> None:
        with lock:
            calls.append(p)

    def worker() -> None:
        paths.append(_derive_once(memo, "sfC", "test_lifecycle_", derive))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1  # double-checked per-key lock: one derivation
    assert len(set(paths)) == 1


def test_release_cached_sweep_cannot_break_a_published_store(spark):
    """The sweep a bench/driver loop runs between queries unpersists
    tracked frames only — a store published by `_derive_once` is disk
    parquet and must read back identically after the sweep, including
    when the sweep fires while OTHER work holds persisted frames
    (the cache_scope isolation the registry's concurrent derivations
    rely on)."""
    memo: dict = {}

    def derive(p: str) -> None:
        spark.range(100).select(
            F.col("id"), (F.col("id") * 3).alias("v")
        ).write.mode("overwrite").parquet(p)

    path = _derive_once(memo, str(SF_DIR), "test_lifecycle_", derive)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert len(before) == 100

    # simulate another query's in-flight cached index + the sweep
    other = persist_tracked(spark.range(10).select(F.col("id")))
    assert other.count() == 10
    with cache_scope():
        inner = persist_tracked(spark.range(5).select(F.col("id")))
        assert inner.count() == 5
        assert release_cached() >= 1  # the mid-session sweep

    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before  # the published store is untouched
    # and the memo still serves the same path with no re-derivation
    def boom(p: str) -> None:
        raise AssertionError("memo hit must not re-derive")

    assert _derive_once(memo, str(SF_DIR), "test_lifecycle_", boom) == path
