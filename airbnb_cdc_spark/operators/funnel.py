"""Ordered-event funnel analysis: how many users reach each stage of a
step sequence, where step k+1 counts only if it happens at or after the
user's first occurrence of step k.

The reference has no funnel surface; this extends the engine's event
analytics (sessionize / windowed / asof family) with the classic
product-analytics query, built from min-timestamp chaining:

    v_k(u) = min ts of step-k events of u with ts >= v_{k-1}(u)

Spark shape: one filtered aggregation per step, chained by an equi-join
on the user key — k-1 shuffles of per-user ONE-ROW frames (not raw
events; each step's aggregation reduces to at most one row per user
before joining). No window over the full event stream, no self-join of
raw events. At 100 TB the per-step frames are |users|-sized, and AQE
picks broadcast sides automatically when a step's survivors are small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validate_steps(steps: Sequence[str]) -> None:
    if not steps:
        raise ValueError("need at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {list(steps)}")
    for s in steps:
        if not s.replace("_", "").isalnum():
            raise ValueError(
                f"step {s!r} is not identifier-safe (it becomes a column "
                "name and a stack() literal)"
            )


def funnel_stage_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-completion timestamp of every funnel prefix:
    columns (user, ts_<step0>, ts_<step1>, ...), NULL once a stage was
    never reached in order.

    Step names become column names and stack() literals, so they must
    be distinct identifier-safe strings — a repeated step would create
    two ``ts_<step>`` columns (ambiguous-reference downstream) and a
    quote/dot would break the generated SQL; validated up front. For a
    re-engagement funnel (view → click → view), alias the repeat
    ("view_again") in a pre-projection."""
    _validate_steps(steps)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"ts_{steps[0]}"))
    )
    prev = steps[0]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(cur.select(user_col, f"ts_{prev}"), user_col)
            .filter(F.col(ts_col) >= F.col(f"ts_{prev}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"ts_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
        prev = step
    return cur


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(stage, stage_idx, n_users): users whose ordered funnel reached
    each stage. Monotonically non-increasing by construction. One
    aggregation pass (all stage counts in one row), then an unpivot —
    the funnel frame is computed once, not once per stage."""
    times = funnel_stage_times(events, steps, user_col, type_col, ts_col)
    one = times.agg(
        *[F.count(F.col(f"ts_{s}")).alias(f"__n{i}") for i, s in enumerate(steps)]
    )
    stack = ", ".join(
        f"'{s}', {i}, __n{i}" for i, s in enumerate(steps)
    )
    return one.select(
        F.expr(
            f"stack({len(steps)}, {stack}) AS (stage, stage_idx, n_users)"
        )
    ).select("stage", F.col("stage_idx").cast("int").alias("stage_idx"), "n_users")
