"""Pipelines E1/E2/E3 — the ADF control flow as plain Python (SURVEY.md §3).

- ``run_customer_dim``  = New_LoadCustomerDim (GetMetadata → ForEach →
  Copy-upsert → archive → delete), ``pipeline/New_LoadCustomerDim.json``.
- ``run_booking_fact``  = New_LoadBookingFact (ExecuteDataFlow with
  checkpoint + PopulateAggregateTable), ``pipeline/New_LoadBookingFact.json``.
- ``run_all``           = New_FinalAirBnBPipeline (strictly sequential,
  fail-fast), ``pipeline/New_FinalAirBnBPipeline.json:5-43``.

ADF's dependency conditions (``dependencyConditions: ["Succeeded"]``,
C3) map to exception propagation: a failed upsert aborts before archive,
a failed archive aborts before delete, and a failed fact load skips the
aggregation refresh. Retry policy is the reference's ``retry: 0`` — any
failure surfaces immediately.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from airbnb_cdc_spark.operators.aggregate import booking_customer_aggregation
from airbnb_cdc_spark.operators.merge import ParquetMergeTable
from airbnb_cdc_spark.sources.customer_csv import (
    archive_file,
    list_files,
    read_customer_csv,
)
from airbnb_cdc_spark.streaming.cdc import run_booking_fact_stream


def run_customer_dim(
    spark: SparkSession,
    raw_dir: str,
    archive_dir: str,
    dim_table: ParquetMergeTable,
    rewrite_quoted: bool = False,
) -> list[str]:
    """E2: replay every feed file (sorted name order = arrival order)
    through the keyed upsert, then archive it. Returns processed names.

    ``rewrite_quoted=True`` archives through the reference's
    quoteAllText Copy (every field re-quoted, original text preserved)
    instead of the rename fast path — see ``archive_file``."""
    processed = []
    for name in list_files(spark, raw_dir):
        df = read_customer_csv(spark, f"{raw_dir}/{name}")
        dim_table.merge(df)
        archive_file(spark, raw_dir, archive_dir, name, rewrite_quoted=rewrite_quoted)
        processed.append(name)
    return processed


def refresh_booking_aggregation(
    spark: SparkSession,
    fact_table: ParquetMergeTable,
    dim_table: ParquetMergeTable,
    agg_table: ParquetMergeTable,
) -> None:
    """C5/O8: the stored proc — truncate-and-reload the aggregate."""
    agg = booking_customer_aggregation(fact_table.read(), dim_table.read())
    agg_table.overwrite(agg)


def run_booking_fact(
    spark: SparkSession,
    feed_dir: str,
    checkpoint_dir: str,
    fact_table: ParquetMergeTable,
    dim_table: ParquetMergeTable,
    agg_table: ParquetMergeTable,
) -> None:
    """E3: stream-merge the change feed, then refresh the aggregation."""
    run_booking_fact_stream(spark, feed_dir, fact_table, checkpoint_dir)
    refresh_booking_aggregation(spark, fact_table, dim_table, agg_table)


def run_all(
    spark: SparkSession,
    raw_dir: str,
    archive_dir: str,
    feed_dir: str,
    checkpoint_dir: str,
    warehouse_dir: str,
) -> dict[str, ParquetMergeTable]:
    """E1: the final pipeline — dim load, then fact load, then aggregate."""
    dim = ParquetMergeTable(spark, f"{warehouse_dir}/dim_customer", ["customer_id"])
    fact = ParquetMergeTable(
        spark, f"{warehouse_dir}/fact_booking", ["booking_id"], version_col="updated_at"
    )
    agg = ParquetMergeTable(
        spark, f"{warehouse_dir}/booking_customer_aggregation", ["country"]
    )
    run_customer_dim(spark, raw_dir, archive_dir, dim)
    run_booking_fact(spark, feed_dir, checkpoint_dir, fact, dim, agg)
    return {"dim_customer": dim, "fact_booking": fact, "booking_customer_aggregation": agg}
