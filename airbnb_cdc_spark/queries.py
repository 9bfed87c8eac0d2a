"""Driver-contract queries: one entry per SURVEY.md §2 operator.

Each ``q_*`` takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching entry in ``ORACLE_SQL`` is ANSI SQL DuckDB runs on the same
parquet views. The driver compares row count + schema + order-insensitive
value hash, so every computed column is aliased identically on both
sides and float results are derived from exact decimal sums (see
operators/aggregate.py docstring).

The driver tables are TPC-H-ish; the reference's booking/customer domain
maps onto them as: ``orders`` = fact_booking (status 'F'≈Confirmed,
'O'≈Cancelled), ``customer``+``nation`` = dim_customer (nation name ≈
country), ``events`` = the CDC change feed (user_id = key, ts = version).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.aggregate import booking_customer_aggregation
from airbnb_cdc_spark.session import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _orders_as_bookings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders reshaped into the booking-fact column contract."""
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("booking_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_amount"),
        F.col("o_orderdate").alias("booking_created_at"),
        (F.col("o_orderkey") % 30).alias("nights"),
    )


def _customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer × nation reshaped into the dim_customer contract."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("c_custkey").alias("customer_id"),
        F.col("n_name").alias("country"),
    )


# --------------------------------------------------------------------------
# Flagship: the reference's 17-measure BookingAggregation proc (A1-A17, O6)
# sql_queries/synapse_table_creation.sql:79-107
# --------------------------------------------------------------------------

_AGG_ORACLE = """
WITH fact AS (
    SELECT o_orderkey AS booking_id,
           o_custkey AS customer_id,
           o_orderstatus AS status,
           o_totalprice AS total_amount,
           o_orderdate AS booking_created_at,
           o_orderkey % 30 AS nights
    FROM orders
), dim AS (
    SELECT c_custkey AS customer_id, n_name AS country
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT
    d.country AS country,
    COUNT(*) AS total_bookings,
    CAST(SUM(CASE WHEN status = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS confirmed_bookings,
    CAST(SUM(CASE WHEN status = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cancelled_bookings,
    CAST(SUM(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
    CAST(SUM(CASE WHEN status = 'F' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS confirmed_amount,
    CAST(SUM(CASE WHEN status = 'O' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS cancelled_amount,
    CASE WHEN COUNT(*) = 0 THEN 0.0
         ELSE CAST(SUM(CASE WHEN status = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    END AS cancellation_rate,
    MAX(booking_created_at) AS last_booking_date,
    MIN(booking_created_at) AS first_booking_date,
    CAST(SUM(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_amount,
    CAST(SUM(CASE WHEN status = 'F' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(NULLIF(SUM(CASE WHEN status = 'F' THEN 1 END), 0) AS DOUBLE) AS confirmed_avg_amount,
    CAST(SUM(CASE WHEN status = 'O' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(NULLIF(SUM(CASE WHEN status = 'O' THEN 1 END), 0) AS DOUBLE) AS cancelled_avg_amount,
    CAST(MIN(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS min_amount,
    CAST(MAX(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS max_amount,
    COUNT(DISTINCT f.customer_id) AS distinct_customers,
    CAST(SUM(CAST(COALESCE(nights, 0) AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_stay_duration
FROM fact f JOIN dim d ON f.customer_id = d.customer_id
GROUP BY d.country
"""


@query("booking_customer_aggregation", _AGG_ORACLE)
def q_booking_customer_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = _orders_as_bookings(spark, sf_dir)
    dim = _customer_dim(spark, sf_dir)
    return booking_customer_aggregation(fact, dim, confirmed="F", cancelled="O")
