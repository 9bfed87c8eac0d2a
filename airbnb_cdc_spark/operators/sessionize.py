"""Sessionization: gap-based event sessions, batch and streaming.

Batch: the classic lag + cumulative-sum window pipeline — a new session
starts where the gap from the previous event of the same user exceeds
the threshold; session id = running count of session starts. Two window
passes over one shuffle on user_id (both windows share the partitioning,
Catalyst plans a single Exchange).

Streaming: ``applyInPandasWithState`` keeps one open session per user in
state, emits sessions closed by the gap timeout — the custom-stateful-
operator pattern for semantics Structured Streaming's built-in windows
can't express (session windows keyed by activity gaps with per-group
logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Session aggregates per (user, gap-delimited session)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # Gap compared in exact MICROSECONDS: unix_timestamp truncates to
    # whole seconds while event timestamps carry microseconds, so a gap
    # within 1s of the threshold would split sessions differently from
    # the fractional-epoch oracle (latent — driver data has no such gap;
    # the review pass caught it before the differential did).
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.col(ts_col)).over(w)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.unix_micros(prev_ts.cast("timestamp"))
    is_new = F.when(
        prev_ts.isNull() | ((ts_us - prev_us) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_session = events.withColumn("__new", is_new).withColumn(
        "__session", F.sum("__new").over(w)
    )
    return (
        with_session.groupBy(F.col(user_col).alias("user_id"), F.col("__session"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming sessionization. Emits a session when the gap
    timeout passes with no new events for the user. Requires watermark
    upstream; grouped per user."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    state_schema = "start long, end long, n long"

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_us = []
        for pdf in pdfs:
            # drop NaT: a null-ts event has no position in gap time and
            # pd.NaT.value is INT64_MIN — one such row would seed state
            # with year-1677 garbage and instantly close every session
            ts_us.extend(
                int(t.value // 1000) for t in pdf[ts_col] if not pd.isna(t)
            )
        ts_us.sort()
        if not ts_us:
            if state.exists:
                state.setTimeoutDuration(gap_ms)
            return
        closed = []
        if state.exists:
            start, end, n = state.get
        else:
            start = end = ts_us[0]
            n = 0
        for t in ts_us:
            if t - end > gap_ms * 1000:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        state.setTimeoutDuration(gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
