"""Event-time windowed aggregation (beyond-reference streaming surface).

The reference achieves "near-realtime" purely by change-feed replay —
no watermarks or windows (SURVEY.md §2.8). A production event pipeline
needs event-time windowing too, so this operator provides tumbling-window
aggregation usable identically in batch (over the events table) and in
Structured Streaming (with a watermark for late data).

Scale: one shuffle on (window, group key); partial aggregation runs
map-side. In streaming mode the watermark bounds state: windows older
than the watermark are finalized and evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
) -> DataFrame:
    """Interval (time-bounded) join: each purchase attributed to every
    view by the same user in the preceding ``horizon_minutes``.

    Works identically in batch and Structured Streaming: in streaming,
    set watermarks on BOTH inputs first — the time-bound condition is
    what lets Spark evict join state (a view older than the horizon plus
    the watermark can never match a future purchase). This is the
    stream-stream join the reference has no analog for; at scale the
    equi-key (user_id) keeps it a hash join with a range residual, NOT a
    cross product, and state is bounded by horizon x arrival rate."""
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    cond = (
        (v.user_id == p.p_user_id)
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            < F.col("view_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return v.join(p, cond).select(
        "user_id", "view_event_id", "purchase_event_id", "view_ts", "purchase_ts"
    )


def tumbling_event_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_duration: str = "1 day",
    watermark: str | None = None,
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling-window counts + exact-decimal value sums per key.

    ``watermark`` (e.g. "2 hours") enables streaming use: late events
    beyond it are dropped and window state is evicted after emission.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration)
    # Streaming state cannot hold exact distinct sets — use the HLL
    # sketch there (the standard scale answer too); batch stays exact.
    distinct_users = (
        F.approx_count_distinct(user_col)
        if events.isStreaming
        else F.count_distinct(F.col(user_col))
    )
    return (
        events.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
            distinct_users.alias("distinct_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "total_value",
            "distinct_users",
        )
    )


def hopping_event_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Hopping (sliding) windows: each event lands in
    duration/slide overlapping windows (2 for 1h/30min), so trend
    curves update every slide instead of once per window. Spark's
    ``window(ts, duration, slide)`` expands the row to its windows
    BEFORE the shuffle — map-side fan-out, aggregation stays one
    Exchange on the window start, and the same plan runs streaming
    with a watermark (state per open window, evicted on emission)."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide)
    return (
        events.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows via the ENGINE's ``session_window`` (dynamic-gap
    event-time sessions): a session extends while consecutive events
    per user arrive within ``gap``, and closes ``gap`` after the last
    one — Spark merges the per-event candidate windows inside the
    aggregation, so this is one shuffle on (user, merged window),
    streaming-capable with watermark-driven state eviction.

    The custom ``applyInPandasWithState`` sessionizer
    (operators/sessionize.py) remains the shape for semantics the
    built-in can't express (per-session ordered event payloads, custom
    close conditions); for plain gap sessions the built-in keeps the
    whole pipeline JVM-side — no Python state worker in the hot path.
    Boundary semantics (pinned by the streaming pytest): an event at
    EXACTLY ``prev + gap`` still MERGES — the split is strictly
    ``diff > gap``, the same rule as ``sessionize_batch``, and the
    oracle mirrors it. ``session_end`` is ``last_event + gap`` — the
    engine's close time, not the last event time."""
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    return (
        events.groupBy(F.col(user_col), win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
