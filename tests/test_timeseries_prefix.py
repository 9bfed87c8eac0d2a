"""Tests for operators/timeseries.py and operators/prefix.py.

global_running_sum is checked for exact equality against the
single-partition ``Window.orderBy`` scan it replaces, on random data
with duplicate order values (the tie-break leg) and NULL values;
resample_ffill against a pandas-style sequential reference.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.prefix import global_running_sum
from airbnb_cdc_spark.operators.timeseries import resample_ffill

T0 = datetime(2025, 3, 1)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),
            # NULL values included: the two-phase scan must reproduce
            # SQL window-sum NULL semantics (NULL only while no
            # non-NULL value has appeared in the GLOBAL order)
            st.one_of(
                st.none(), st.decimals("-99.99", "99.99", places=2)
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.booleans(),
)
def test_running_sum_matches_sequential(spark, rows, descending):
    df = spark.createDataFrame(
        [
            (i, int(k), None if v is None else Decimal(v))
            for i, (k, v) in enumerate(rows)
        ],
        "rid long, k long, v decimal(8,2)",
    )
    got = {
        r.rid: r.running_total
        for r in global_running_sum(
            df,
            order_col="k",
            value_col="v",
            tie_breaks=["rid"],
            descending=descending,
            num_buckets=4,
        ).collect()
    }
    order = F.col("k").desc() if descending else F.col("k").asc()
    w = Window.orderBy(order, F.col("rid").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.rid: r.rt
        for r in df.withColumn("rt", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_running_sum_few_distinct_values(spark):
    # 1 distinct order value → every quantile boundary collapses; the
    # whole frame lands in one bucket and the scan must still be exact.
    df = spark.createDataFrame(
        [(i, 7, Decimal(i)) for i in range(10)], "rid long, k long, v decimal(8,2)"
    )
    out = global_running_sum(
        df, order_col="k", value_col="v", tie_breaks=["rid"], num_buckets=4
    )
    got = {r.rid: int(r.running_total) for r in out.collect()}
    assert got == {i: sum(range(i + 1)) for i in range(10)}


def test_resample_ffill_fills_interior_gaps(spark):
    rows = [
        # key "a": readings at hour 0 and hour 3 → hours 1, 2 are gaps
        # carrying the hour-0 reading; NULL value at hour 1 is ignored.
        (1, T0, "a", 10.0),
        (2, T0 + timedelta(hours=1), "a", None),
        (3, T0 + timedelta(hours=3), "a", 40.0),
        # key "b": two readings in one hour → latest (by ts, event_id) wins
        (4, T0 + timedelta(minutes=5), "b", 1.0),
        (5, T0 + timedelta(minutes=50), "b", 2.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    out = {
        (r.event_type, r.bucket.hour): (r.reading, r.is_gap)
        for r in resample_ffill(events).collect()
    }
    assert out == {
        ("a", 0): (10.0, False),
        ("a", 1): (10.0, True),
        ("a", 2): (10.0, True),
        ("a", 3): (40.0, False),
        ("b", 0): (2.0, False),
    }


def test_resample_ffill_15_minute_grid(spark):
    rows = [
        (1, T0, "a", 10.0),
        (2, T0 + timedelta(minutes=40), "a", 20.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    out = {
        r.bucket.minute: (r.reading, r.is_gap)
        for r in resample_ffill(events, step="15 minutes").collect()
    }
    assert out == {0: (10.0, False), 15: (10.0, True), 30: (20.0, False)}


def test_resample_ffill_rejects_bad_step(spark):
    import pytest as _pytest

    events = spark.createDataFrame(
        [], "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    with _pytest.raises(ValueError, match="step must be"):
        resample_ffill(events, step="fortnight")
