"""ParquetMergeTable: keyed upsert semantics + bucket-pruned rewrites.

Behavior tests run through `create_merge_table`, parameterized over
backends: the parquet shim always, the Delta backend when delta-spark
is importable (skipped otherwise — this container ships no Delta jar).
Bucket-layout-specific tests stay pinned to the parquet shim.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import Row

from airbnb_cdc_spark.operators.merge import (
    BUCKET_COL,
    ParquetMergeTable,
    create_merge_table,
    delta_available,
)

BACKENDS = [
    "parquet",
    pytest.param(
        "delta",
        marks=pytest.mark.skipif(
            not delta_available(), reason="delta-spark not installed"
        ),
    ),
]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def _table(spark, tmp_path, backend="parquet", **kw):
    return create_merge_table(
        spark, str(tmp_path / "t"), keys=["k"], num_buckets=8, backend=backend, **kw
    )


def test_merge_insert_then_update(spark, tmp_path, backend):
    t = _table(spark, tmp_path, backend, version_col="ver")
    t.merge(spark.createDataFrame([Row(k="a", v=1, ver=1), Row(k="b", v=2, ver=1)]))
    assert {r.k: r.v for r in t.read().collect()} == {"a": 1, "b": 2}

    t.merge(spark.createDataFrame([Row(k="b", v=20, ver=2), Row(k="c", v=3, ver=1)]))
    assert {r.k: r.v for r in t.read().collect()} == {"a": 1, "b": 20, "c": 3}


def test_merge_within_batch_last_writer_wins(spark, tmp_path, backend):
    t = _table(spark, tmp_path, backend, version_col="ver")
    t.merge(
        spark.createDataFrame(
            [Row(k="a", v=1, ver=1), Row(k="a", v=9, ver=5), Row(k="a", v=2, ver=3)]
        )
    )
    assert [r.v for r in t.read().collect()] == [9]


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(spark.createDataFrame([Row(k=f"k{i}", v=i) for i in range(100)]))
    before = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in Path(t.path).glob(f"{BUCKET_COL}=*")
    }
    t.merge(spark.createDataFrame([Row(k="k0", v=-1)]))
    after = {
        p.name: max(f.stat().st_mtime_ns for f in p.glob("*.parquet"))
        for p in Path(t.path).glob(f"{BUCKET_COL}=*")
    }
    changed = [b for b in before if after[b] != before[b]]
    assert len(changed) == 1  # only k0's bucket rewritten
    assert {r.v for r in t.read().filter("k = 'k0'").collect()} == {-1}
    assert t.read().count() == 100


def test_overwrite_replaces_all(spark, tmp_path, backend):
    t = _table(spark, tmp_path, backend)
    t.merge(spark.createDataFrame([Row(k="a", v=1)]))
    t.overwrite(spark.createDataFrame([Row(k="z", v=9)]))
    assert [(r.k, r.v) for r in t.read().collect()] == [("z", 9)]


def test_merge_idempotent(spark, tmp_path, backend):
    t = _table(spark, tmp_path, backend, version_col="ver")
    batch = spark.createDataFrame([Row(k="a", v=1, ver=1), Row(k="b", v=2, ver=1)])
    t.merge(batch)
    t.merge(batch)  # replay = no change (exactly-once-by-key)
    assert sorted((r.k, r.v) for r in t.read().collect()) == [("a", 1), ("b", 2)]


def test_delete_keys(spark, tmp_path, backend):
    t = _table(spark, tmp_path, backend)
    t.merge(spark.createDataFrame([Row(k=f"k{i}", v=i) for i in range(20)]))
    t.delete(spark.createDataFrame([Row(k="k3"), Row(k="k7"), Row(k="nope")]))
    remaining = sorted(r.k for r in t.read().collect())
    assert "k3" not in remaining and "k7" not in remaining
    assert len(remaining) == 18


def test_delete_entire_bucket(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "t1"), keys=["k"], num_buckets=2)
    t.merge(spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)]))
    t.delete(spark.createDataFrame([Row(k="a"), Row(k="b")]))
    assert t.read().count() == 0


def test_compact_preserves_rows(spark, tmp_path):
    t = _table(spark, tmp_path, version_col="ver")
    t.merge(spark.createDataFrame([Row(k=f"k{i}", v=i, ver=1) for i in range(50)]))
    t.merge(spark.createDataFrame([Row(k="k1", v=-1, ver=2)]))
    before = sorted(map(tuple, t.read().collect()))
    t.compact()
    assert sorted(map(tuple, t.read().collect())) == before


def test_merge_lww_across_batches(spark, tmp_path, backend):
    """An update older than the stored row is discarded; a tie goes to
    the update (whole-row replace)."""
    t = _table(spark, tmp_path, backend, version_col="ver")
    t.merge(spark.createDataFrame([Row(k="a", v=1, ver=5)]))
    t.merge(spark.createDataFrame([Row(k="a", v=99, ver=3)]))  # stale: ignored
    assert [(r.v, r.ver) for r in t.read().collect()] == [(1, 5)]
    t.merge(spark.createDataFrame([Row(k="a", v=7, ver=5)]))  # tie: update wins
    assert [(r.v, r.ver) for r in t.read().collect()] == [(7, 5)]
    t.merge(spark.createDataFrame([Row(k="a", v=8, ver=6)]))  # newer: wins
    assert [(r.v, r.ver) for r in t.read().collect()] == [(8, 6)]


def test_merge_after_delete_all(spark, tmp_path):
    """Emptying every bucket leaves only the schema sidecar; the next
    merge/delete must behave like a fresh load, not throw."""
    t = ParquetMergeTable(spark, str(tmp_path / "t2"), keys=["k"], num_buckets=2)
    t.merge(spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)]))
    t.delete(spark.createDataFrame([Row(k="a"), Row(k="b")]))
    assert t.read().count() == 0
    t.delete(spark.createDataFrame([Row(k="a")]))  # no-op on empty
    t.merge(spark.createDataFrame([Row(k="c", v=3)]))
    assert [(r.k, r.v) for r in t.read().collect()] == [("c", 3)]


def test_merge_without_evolution_fails_fast_on_missing_column(spark, tmp_path):
    """After the table evolved, a merge lacking the evolved column must
    fail fast (S5) rather than silently dropping it from the bucket."""
    import pytest

    t = _table(spark, tmp_path)
    t.merge(spark.createDataFrame([Row(k="a", v=1)]))
    t.merge(
        spark.createDataFrame([Row(k="b", v=2, extra="x")]),
        allow_schema_evolution=True,
    )
    with pytest.raises(Exception):
        t.merge(spark.createDataFrame([Row(k="a", v=10)]))
    # the evolved column survives an allowed-evolution merge of old-shape rows
    t.merge(spark.createDataFrame([Row(k="a", v=10)]), allow_schema_evolution=True)
    out = {r.k: r for r in t.read().collect()}
    assert out["b"].extra == "x" and out["a"].v == 10 and out["a"].extra is None


def test_merge_schema_evolution(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.merge(spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)]))
    t.merge(
        spark.createDataFrame([Row(k="b", v=20, extra="x"), Row(k="c", v=3, extra="y")]),
        allow_schema_evolution=True,
    )
    out = {r.k: r for r in t.read().collect()}
    assert out["b"].extra == "x" and out["c"].extra == "y"
    assert out["a"].extra is None  # old rows widened with NULL
    assert out["a"].v == 1 and out["b"].v == 20


# -- SCD2 ------------------------------------------------------------------


def _scd2(spark, tmp_path):
    from airbnb_cdc_spark.operators.merge import Scd2MergeTable

    return Scd2MergeTable(
        spark, str(tmp_path / "scd2"), keys=["cid"], ts_col="ts", num_buckets=4
    )


def _rows(df):
    return sorted(
        (r.cid, str(r.valid_from), str(r.valid_to), r.is_current, r.status)
        for r in df.collect()
    )


def test_scd2_initial_and_change(spark, tmp_path):
    from datetime import datetime

    t = lambda d: datetime(2025, 1, d)  # noqa: E731
    tab = _scd2(spark, tmp_path)
    tab.merge(
        spark.createDataFrame(
            [(1, t(1), "bronze"), (2, t(1), "silver")], ["cid", "ts", "status"]
        )
    )
    out = tab.read()
    assert out.filter("is_current = 1").count() == 2
    assert out.count() == 2

    # change cid 1, no-op update for cid 2
    tab.merge(
        spark.createDataFrame(
            [(1, t(5), "gold"), (2, t(5), "silver")], ["cid", "ts", "status"]
        )
    )
    out = tab.read()
    assert _rows(out) == sorted(
        [
            (1, str(t(1)), str(t(5)), 0, "bronze"),
            (1, str(t(5)), "None", 1, "gold"),
            (2, str(t(1)), "None", 1, "silver"),  # no-op created no version
        ]
    )


def test_scd2_multi_change_batch_and_late_discard(spark, tmp_path):
    from datetime import datetime

    t = lambda d: datetime(2025, 1, d)  # noqa: E731
    tab = _scd2(spark, tmp_path)
    # one batch containing a whole chain, out of storage order
    tab.merge(
        spark.createDataFrame(
            [(1, t(7), "gold"), (1, t(1), "bronze"), (1, t(3), "silver")],
            ["cid", "ts", "status"],
        )
    )
    out = tab.read()
    assert _rows(out) == sorted(
        [
            (1, str(t(1)), str(t(3)), 0, "bronze"),
            (1, str(t(3)), str(t(7)), 0, "silver"),
            (1, str(t(7)), "None", 1, "gold"),
        ]
    )

    # a late update older than the open version is discarded
    tab.merge(spark.createDataFrame([(1, t(5), "iron")], ["cid", "ts", "status"]))
    out = tab.read()
    assert out.count() == 3
    assert out.filter("status = 'iron'").count() == 0

    # a genuine newer change still applies
    tab.merge(spark.createDataFrame([(1, t(9), "platinum")], ["cid", "ts", "status"]))
    out = tab.read()
    assert out.filter("is_current = 1").count() == 1
    cur = out.filter("is_current = 1").collect()[0]
    assert cur.status == "platinum" and str(cur.valid_from) == str(t(9))
    # the previously-open gold row is now closed at t(9)
    gold = out.filter("status = 'gold'").collect()[0]
    assert gold.is_current == 0 and str(gold.valid_to) == str(t(9))


def test_reattach_with_wrong_num_buckets_refused(spark, tmp_path):
    """The table remembers its bucket count: a mismatched handle would
    route existing keys to unread buckets and silently insert
    duplicates instead of upserting."""
    import pytest as _pytest

    from airbnb_cdc_spark.operators.merge import ParquetMergeTable

    t = ParquetMergeTable(spark, str(tmp_path / "t"), ["id"], num_buckets=8)
    t.merge(spark.createDataFrame([(1, "a")], "id long, v string"))
    wrong = ParquetMergeTable(spark, str(tmp_path / "t"), ["id"], num_buckets=4)
    with _pytest.raises(ValueError, match="num_buckets"):
        wrong.merge(spark.createDataFrame([(1, "b")], "id long, v string"))
    # the correctly-configured handle still works
    t.merge(spark.createDataFrame([(1, "b")], "id long, v string"))
    assert {(r.id, r.v) for r in t.read().collect()} == {(1, "b")}
