"""Spark-native bucketed tables: co-located big-big joins.

Broadcast covers dimension-sized sides; for FACT x FACT joins at 100 TB
the shuffle of both sides is the dominant cost. Spark's native bucketing
(``bucketBy`` + ``sortBy`` at write time) pre-partitions AND pre-sorts
each table by the join key into a fixed bucket count; a join between two
tables bucketed the same way reads bucket i of each side into the same
task — a SortMergeJoin with ZERO Exchange on either side (and with
``sortBy``, zero Sort too). Write once, join shuffle-free forever: the
right trade for keys joined repeatedly (customer_id, booking_id).

The bucket files are ordinary parquet; only the table-catalog entry
carries the bucket spec, which is why reads must go through the table
name (``spark.table``), not ``spark.read.parquet`` on the path.

``test_bucketed_join_no_shuffle`` asserts the plan: no
ShuffleExchange feeding the SortMergeJoin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) external parquet
    table at ``path`` registered as ``name``. ``num_buckets`` must match
    across tables meant to join shuffle-free."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — the bucket spec lives
    on the table entry; ``spark.read.parquet(path)`` would read the same
    bytes but lose the co-location guarantee."""
    return spark.table(name)
