"""topk_per_group: the salted two-phase cut must equal the window
row_number() result exactly (same rows, same ranks) and be invariant
to the salt count — salting is load-balancing only."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.aggregate import topk_per_group


def _data(spark):
    # 3 groups with skewed sizes (1, 40, 200) and duplicate metric
    # values so the id tie-break matters.
    rows = [("a", 0, 0)]
    rows += [("b", i, i % 7) for i in range(1, 41)]
    rows += [("c", i + 100, i % 3) for i in range(200)]
    return spark.createDataFrame(rows, "g string, id long, metric long")


def _window_expected(df, k):
    w = Window.partitionBy("g").orderBy(F.col("metric").asc(), F.col("id").asc())
    return {
        (r.g, r.id, r.metric, r.rnk)
        for r in df.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .collect()
    }


def test_topk_matches_window_rank(spark):
    df = _data(spark)
    for k in (1, 5, 50, 1000):
        got = {
            (r.g, r.id, r.metric, r.rnk)
            for r in topk_per_group(
                df, ["g"], [F.col("metric"), F.col("id")], k
            ).collect()
        }
        assert got == _window_expected(df, k), f"k={k}"


def test_topk_salt_invariant(spark):
    df = _data(spark)
    runs = [
        {
            (r.g, r.id, r.rnk)
            for r in topk_per_group(
                df, ["g"], [F.col("metric"), F.col("id")], 7, n_salts=s
            ).collect()
        }
        for s in (1, 2, 64)
    ]
    assert runs[0] == runs[1] == runs[2]


def test_topk_rejects_nonpositive_k(spark):
    import pytest

    df = _data(spark)
    with pytest.raises(ValueError):
        topk_per_group(df, ["g"], [F.col("id")], 0)


def test_topk_full_row_duplicates_spread_across_salts(spark):
    """Bit-identical duplicate rows (the 10k-copy-template skew case)
    must not all collapse into one salt sub-group: the salt mixes
    spark_partition_id() into the row hash, so copies arriving in
    different input partitions land in different sub-groups. Asserts
    (a) stage-1 actually produces multiple sub-groups for a
    duplicates-only hot group and (b) the result is still the correct,
    deterministic k-cut. Regression for the r9 advice finding."""
    dup = spark.range(0, 4000, 1, 16).select(
        F.lit("hot").alias("g"),
        F.lit(99).alias("metric"),
        F.lit(7).alias("id"),
    )
    tail = spark.createDataFrame(
        [("hot", m, m) for m in range(3)], "g string, metric int, id int"
    )
    df = dup.unionByName(tail)
    out = topk_per_group(df, ["g"], [F.col("metric"), F.col("id")], 5, n_salts=8)
    got = [(r.metric, r.id, r.rnk) for r in out.orderBy("rnk").collect()]
    assert got == [(0, 0, 1), (1, 1, 2), (2, 2, 3), (99, 7, 4), (99, 7, 5)]
    # the duplicates-only frame spreads over >1 salt sub-group
    n_subgroups = (
        dup.withColumn(
            "__s",
            F.pmod(
                F.xxhash64(F.spark_partition_id(), "g", "metric", "id"),
                F.lit(8),
            ),
        )
        .select("__s")
        .distinct()
        .count()
    )
    assert n_subgroups > 1
