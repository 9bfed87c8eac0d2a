"""Time-series resampling and trend extraction (beyond-reference).

The reference's event surface is change-feed replay only; a production
event pipeline also needs the classic time-series shapes: regularize an
irregular event stream onto a fixed-step grid (gap-fill + forward-fill)
and extract per-key linear trends from exact aggregates.

Scale notes
-----------
``resample_ffill``: the spine (one row per key × step) is generated
*distributed* — each key's (min, max) span becomes one `sequence()`
array exploded on the executor that owns the key, so spine generation
parallelizes by key and never touches the driver. The forward-fill is
one window per key over the already-aggregated grid (grid cardinality =
keys × span/step, orders of magnitude below the raw event count), after
a single shuffle on the key. At 100 TB the raw events aggregate
map-side into the per-(key, bucket) frame before anything wide happens.

``linear_trend``: ordinary least squares per key from one pass of exact
sums (count, Σx, Σy, Σxy, Σx²) — a single map-side-combining groupBy;
the slope/intercept arithmetic runs on the tiny per-key frame. Sums are
exact (BIGINT / DECIMAL(38,·)), so the final double arithmetic is
deterministic and bit-reproducible across partitionings — the same
discipline as operators/aggregate.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    tie_breaks: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Regularize an event stream onto a fixed ``step`` grid per key.

    Per (key, bucket): the latest non-NULL reading in the bucket (by
    (ts, *tie_breaks) — deterministic under duplicate timestamps). Empty
    buckets inside the key's observed span are emitted with the previous
    bucket's reading (forward fill) and ``is_gap = true``.

    Returns (key, bucket, reading, is_gap). The leading bucket of each
    key always has a reading (the span starts at the first observation).
    """
    # Epoch-floor bucketing: floor(epoch / step_s) * step_s — works for
    # any "N unit" step ("15 minutes", "2 hours"), and for sub-week unit
    # steps equals date_trunc under the pinned-UTC session (which is
    # what the driver oracle uses for the hourly grid). NOT for week:
    # epoch 0 is a Thursday, so '1 week' grids align to Thursday
    # boundaries while date_trunc('week') aligns to Monday — a weekly
    # oracle must bucket by epoch floor too (or offset by 4 days), not
    # by date_trunc.
    units = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}
    try:
        count_str, unit = step.split()
        step_s = int(count_str) * units[unit.rstrip("s")]
    except (ValueError, KeyError):
        raise ValueError(
            f"step must be 'N second|minute|hour|day|week[s]', got {step!r}"
        ) from None
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    bucket = F.timestamp_seconds(epoch - epoch % F.lit(step_s)).cast(
        "timestamp_ntz"
    )
    # Latest non-NULL reading per bucket: max_by over the unique
    # (ts, *tie_breaks) tuple — exact, no ordering sensitivity.
    ordk = F.struct(F.col(ts_col), *[F.col(c) for c in tie_breaks])
    hourly = (
        events.filter(F.col(value_col).isNotNull())
        .select(F.col(key_col), bucket.alias("bucket"), F.col(value_col), ordk.alias("__o"))
        .groupBy(key_col, "bucket")
        .agg(F.max_by(F.col(value_col), F.col("__o")).alias("__reading"))
    )
    # Distributed spine: sequence(min, max, step) per key, exploded where
    # the key lives. Span length is bounded by wall-clock range / step,
    # not by event count.
    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [key_col, "bucket"], "left")
        .withColumn("reading", F.last(F.col("__reading"), ignorenulls=True).over(w))
        .select(
            key_col,
            "bucket",
            "reading",
            F.col("__reading").isNull().alias("is_gap"),
        )
    )


def linear_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key OLS trend of ``value_col`` over time, from exact sums.

    x = epoch seconds (BIGINT, floored), y = value as DECIMAL(18,6);
    all five sufficient statistics are exact, so the closed-form
    slope/intercept doubles are deterministic (same IEEE expression on
    exact inputs — reproducible across partitionings and vs the oracle).

    Returns (key, n, slope_per_day, intercept): value units per day and
    the value at epoch 0 projected by the fit; NULL slope when the key
    has < 2 distinct timestamps (zero x-variance).
    """
    rows = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.col(key_col),
        # timestamp_ntz carries wall-clock; the pinned-UTC session makes
        # the epoch conversion identical to DuckDB's epoch_us(ts) //
        # 1_000_000 (both floor the subsecond part).
        F.col(ts_col).cast("timestamp").cast("long").alias("__x"),
        # y scaled to integer micro-units: EVERYTHING through the
        # numerator/denominator stays exact integer arithmetic, so the
        # final decimal→double casts are single correctly-rounded
        # conversions on both engines — no double-arithmetic
        # cancellation (a naive `n·Σxy − Σx·Σy` in doubles amplifies
        # operand rounding by ~1e7 here and diverges from the oracle in
        # the 8th digit).
        (F.col(value_col).cast("decimal(18,6)") * F.lit(1000000))
        .cast("decimal(24,0)")
        .alias("__yi"),
    )
    sums = rows.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__yi").alias("__syi"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__yi")).alias("__sxy"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__x").cast("decimal(19,0)")).alias(
            "__sxx"
        ),
    )
    num = (
        F.col("__n").cast("decimal(19,0)") * F.col("__sxy")
        - F.col("__sx").cast("decimal(19,0)") * F.col("__syi").cast("decimal(19,0)")
    ).cast("double")
    den = (
        F.col("__n").cast("decimal(19,0)") * F.col("__sxx")
        - F.col("__sx").cast("decimal(19,0)") * F.col("__sx").cast("decimal(19,0)")
    ).cast("double")
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    syi = F.col("__syi").cast("double")
    # Identical expression shape on the oracle side; nullif guards the
    # zero-variance (single-timestamp) key.
    slope_sec = num / F.nullif(den, F.lit(0.0)) / F.lit(1000000.0)
    return sums.select(
        F.col(key_col),
        F.col("__n").alias("n"),
        (slope_sec * F.lit(86400.0)).alias("slope_per_day"),
        ((syi / F.lit(1000000.0) - slope_sec * sx) / n).alias("intercept"),
    )
