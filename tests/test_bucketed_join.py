"""Bucketed co-located join: the big-big join answer at scale.

Asserts the actual physical plan: two tables bucketed on the join key
join with NO shuffle Exchange on either side (broadcast disabled so the
assertion tests bucketing, not the broadcast fallback).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_join_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bk_left", str(tmp_path / "bk_left"), ["k"], 8)
    write_bucketed(right, "bk_right", str(tmp_path / "bk_right"), ["k"], 8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            l, r = read_bucketed(spark, "bk_left"), read_bucketed(spark, "bk_right")
            joined = l.join(r, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            # bucket-sorted writes also drop the per-task Sort
            assert joined.count() == 5000
            total = joined.agg(F.sum(F.col("a") + F.col("b"))).collect()[0][0]
            # sum over k in {0,2,...,9998}: a+b = 2k+3k = 5k
            assert total == 5 * sum(range(0, 10000, 2))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_groupby_no_shuffle(spark, tmp_path):
    """Bucketing also feeds aggregation: groupBy on the bucket key of a
    bucketed table needs no Exchange (partial = final, data already
    co-located)."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("v")
    )
    write_bucketed(df, "bk_agg", str(tmp_path / "bk_agg"), ["k"], 4)
    try:
        agg = read_bucketed(spark, "bk_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_agg")
