"""Scale smoke: the merge path at millions of rows — bucket pruning must
keep a small update wave cheap relative to the table size."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.merge import ParquetMergeTable


def test_merge_small_wave_into_large_table(spark, tmp_path):
    n, wave = 2_000_000, 20_000
    t = ParquetMergeTable(
        spark, str(tmp_path / "big"), keys=["k"], version_col="ver", num_buckets=64
    )
    base = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"), F.lit(1).alias("ver")
    )
    t.overwrite(base)

    updates = spark.range(wave).select(
        (F.col("id") * 100).alias("k"),  # spread across buckets
        F.lit(-7).alias("v"),
        F.lit(2).alias("ver"),
    )
    t0 = time.perf_counter()
    t.merge(updates)
    merge_sec = time.perf_counter() - t0

    out = t.read()
    assert out.count() == n  # all updates hit existing keys
    assert out.filter(F.col("v") == -7).count() == wave
    assert out.filter((F.col("k") == 100) & (F.col("v") == -7)).count() == 1
    assert out.filter((F.col("k") == 101) & (F.col("v") == 202)).count() == 1
    # loose wall-clock sanity: a 1% wave over 2M rows must not behave
    # like a full rewrite (which takes ~the overwrite's time x read+write)
    assert merge_sec < 120
