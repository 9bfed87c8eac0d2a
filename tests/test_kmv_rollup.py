"""Persisted KMV sketch tables: per-group partitions, partition-pruned
range reads, and the union estimate's equivalence to the in-plan form
(the oracle-checked `kmv_range_rollup` path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.sketch import (
    kmv_minhashes,
    kmv_read_range,
    kmv_union_estimate,
    kmv_write,
)


def _events(spark):
    # 2000 events, 30 days, ~200 distinct users with day-varying subsets
    return spark.range(2000).select(
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 30).cast("int")).alias("d"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("user_id"),
    )


def test_kmv_persisted_range_matches_in_plan(spark, tmp_path):
    ev = _events(spark)
    daily = kmv_minhashes(ev, "user_id", "d", k=32)
    out = str(tmp_path / "kmv")
    kmv_write(daily, out)

    lo, hi = "2024-01-05", "2024-01-18"
    stored = kmv_read_range(
        spark, out, F.lit(lo).cast("date"), F.lit(hi).cast("date")
    )
    in_plan = daily.filter(
        (F.col("group") >= F.lit(lo).cast("date"))
        & (F.col("group") <= F.lit(hi).cast("date"))
    )
    got = kmv_union_estimate(stored, k=32).collect()[0]
    want = kmv_union_estimate(in_plan, k=32).collect()[0]
    assert (got.m, got.est_distinct) == (want.m, want.est_distinct)

    # range filter reaches the scan as a PARTITION filter (the point of
    # the per-group layout: a range query opens only its partitions)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "group" in plan.split("PartitionFilters")[1][:200]


def test_kmv_rebuild_one_group_is_idempotent(spark, tmp_path):
    ev = _events(spark)
    daily = kmv_minhashes(ev, "user_id", "d", k=32)
    out = str(tmp_path / "kmv")
    kmv_write(daily, out)
    before = {
        (r.group, r.h, r.rn) for r in spark.read.parquet(out).collect()
    }
    # dynamic partition overwrite: rewriting one day touches only it
    one_day = daily.filter(F.col("group") == F.lit("2024-01-07").cast("date"))
    kmv_write(one_day, out)
    after = {(r.group, r.h, r.rn) for r in spark.read.parquet(out).collect()}
    assert after == before


def test_kmv_union_exact_below_k(spark):
    # 10 distinct users < k: the pooled set IS the union, estimate exact
    ev = spark.range(100).select(
        F.lit("2024-01-01").cast("date").alias("d"),
        (F.col("id") % 10).alias("user_id"),
    )
    est = kmv_union_estimate(kmv_minhashes(ev, "user_id", "d", k=64), k=64)
    r = est.collect()[0]
    assert r.m == 10 and r.est_distinct == 10.0
