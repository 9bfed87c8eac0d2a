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
from airbnb_cdc_spark.operators.alter_row import with_action_flags
from airbnb_cdc_spark.operators.lookup import latest_per_key, lookup_latest
from airbnb_cdc_spark.operators.merge import merge_dataframes
from airbnb_cdc_spark.operators.project import cast_to_contract, select_columns
from airbnb_cdc_spark.operators.split import conditional_split
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


# --------------------------------------------------------------------------
# O1 — conditional split (disjoint), dataflow:106-107
# --------------------------------------------------------------------------


@query(
    "conditional_split_bad",
    "SELECT * FROM lineitem WHERE l_discount > l_tax",
)
def q_split_bad(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bad, _ = conditional_split(li, F.col("l_discount") > F.col("l_tax"))
    return bad


@query(
    "conditional_split_accepted",
    "SELECT * FROM lineitem WHERE NOT COALESCE(l_discount > l_tax, FALSE)",
)
def q_split_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    _, accepted = conditional_split(li, F.col("l_discount") > F.col("l_tax"))
    return accepted


# --------------------------------------------------------------------------
# O2/O3 — projection + sink-contract casts, dataflow:115-141 / :144-168
# --------------------------------------------------------------------------


@query(
    "project_cast",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS booking_id,
           CAST(o_custkey AS INTEGER) AS customer_id,
           o_orderstatus AS status,
           CAST(o_totalprice AS DECIMAL(14,2)) AS total_amount,
           CAST(o_orderdate AS DATE) AS booking_created_at
    FROM orders
    """,
)
def q_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    projected = select_columns(
        orders,
        {
            "o_orderkey": "booking_id",
            "o_custkey": "customer_id",
            "o_orderstatus": "status",
            "o_totalprice": "total_amount",
            "o_orderdate": "booking_created_at",
        },
    )
    return cast_to_contract(
        projected,
        {
            "booking_id": "string",
            "customer_id": "int",
            "total_amount": "decimal(14,2)",
            "booking_created_at": "date",
        },
    )


# --------------------------------------------------------------------------
# O4 — parameterized filter (mock_data_in_cosmosdb.py:179-189)
# --------------------------------------------------------------------------


@query(
    "filter_by_status",
    "SELECT event_id, user_id FROM events WHERE event_type = 'purchase'",
)
def q_filter_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == F.lit("purchase")).select(
        "event_id", "user_id"
    )


# --------------------------------------------------------------------------
# O5 — lookup: left join against latest-per-key right side, dataflow:108-112
# --------------------------------------------------------------------------

_LOOKUP_ORACLE = """
WITH latest AS (
    SELECT user_id AS customer_id, ts AS t_ts, event_type AS t_event_type,
           value AS t_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT c.c_custkey AS customer_id, c.c_name AS name, c.c_mktsegment AS segment,
       l.t_ts AS t_ts, l.t_event_type AS t_event_type, l.t_value AS t_value
FROM customer c
LEFT JOIN (SELECT * FROM latest WHERE rn = 1) l ON c.c_custkey = l.customer_id
"""


@query("lookup_latest_event", _LOOKUP_ORACLE)
def q_lookup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("customer_id"), "ts", "event_type", "value", "event_id"
    )
    joined = lookup_latest(
        customer, events, keys=["customer_id"], version_col="ts", tie_breaks=["event_id"]
    )
    return joined.select(
        "customer_id", "name", "segment", "t_ts", "t_event_type", "t_value"
    )


# --------------------------------------------------------------------------
# O7 — alter-row insert/update flags, dataflow:113-114
# --------------------------------------------------------------------------

_FLAGS_ORACLE = """
WITH incoming AS (
    SELECT user_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), target AS (
    SELECT c_custkey FROM customer WHERE c_custkey < 100
)
SELECT i.user_id AS user_id, i.ts AS ts, i.event_type AS event_type,
       i.value AS value,
       CASE WHEN t.c_custkey IS NULL THEN 'insert' ELSE 'update' END AS action
FROM (SELECT * FROM incoming WHERE rn = 1) i
LEFT JOIN target t ON i.user_id = t.c_custkey
"""


@query("alter_row_flags", _FLAGS_ORACLE)
def q_alter_row_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming = latest_per_key(
        load_table(spark, sf_dir, "events"),
        keys=["user_id"],
        version_col="ts",
        tie_breaks=["event_id"],
    )
    target = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(F.col("c_custkey").alias("user_id"), F.col("c_custkey").alias("t_key"))
    )
    flagged = with_action_flags(
        incoming.join(target, on="user_id", how="left"), target_probe_col="t_key"
    )
    return flagged.select(
        "user_id", "ts", "event_type", "value", F.col("_action").alias("action")
    )


# --------------------------------------------------------------------------
# S4/S5 — MERGE upsert semantics (anti-join + union), as a pure query:
# base state (events before the cutoff) merged with an update wave
# --------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH base AS (
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
), upd AS (
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
)
SELECT b.user_id, b.ts, b.event_type, b.value FROM base b
WHERE b.user_id NOT IN (SELECT user_id FROM upd)
UNION ALL
SELECT u.user_id, u.ts, u.event_type, u.value FROM upd u
"""


@query("cdc_merge_upsert", _MERGE_ORACLE)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    events = load_table(spark, sf_dir, "events")
    cols = ["user_id", "ts", "event_type", "value"]
    base = latest_per_key(
        events.filter(F.col("ts") < cutoff), ["user_id"], "ts", ["event_id"]
    ).select(cols)
    upd = latest_per_key(
        events.filter(F.col("ts") >= cutoff), ["user_id"], "ts", ["event_id"]
    ).select(cols)
    return merge_dataframes(base, upd, keys=["user_id"])
