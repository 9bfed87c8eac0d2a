"""As-of (point-in-time) join — for each left row, the latest right row
with the same key and timestamp <= the left row's timestamp.

The reference has no such operator; it belongs to the standard warehouse
surface this engine provides beyond parity (time-series enrichment:
"state of X as of event time T"). Delta/warehouse users know it as
ASOF JOIN (DuckDB/QuestDB/kdb) or pandas.merge_asof.

Spark-first shape: NOT a range join (which explodes to O(n·m) candidate
pairs before pruning) but the union + ordered-window formulation:

    union both sides tagged with a side marker
    → one shuffle on the join keys
    → sort by (ts, side)
    → last(payload, ignorenulls) over rows-unbounded-preceding
    → keep left rows

One Exchange total, no candidate blow-up, no skew amplification beyond
the key distribution itself — the same plan shape a latest-per-key
lookup compiles to (WindowGroupLimit partial sort applies map-side).
At equal timestamps the right row sorts first, so the join is inclusive
(right.ts == left.ts matches), matching DuckDB's `ASOF JOIN ... ON
r.ts <= l.ts`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "r_",
    tie_breaks: Sequence[str] = (),
    direction: str = "backward",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the payload of
    the latest ``right`` row (same ``on`` key, ``right_ts <= left_ts``),
    or NULLs when no such row exists.

    ``tie_breaks``: right-side columns ordering equal-timestamp right
    rows (ascending — the LAST one wins), keeping results deterministic.

    ``direction="forward"`` mirrors the join: the EARLIEST right row
    with ``right_ts >= left_ts`` (inclusive), and among equal-timestamp
    right rows the SMALLEST tie_breaks tuple wins — the first row
    at-or-after. Same plan shape (one Exchange, one ordered window);
    only the traversal order flips.

    ``tolerance_sec`` (pandas ``merge_asof(tolerance=...)`` semantics):
    a match farther than this many seconds from the left timestamp is
    DROPPED — the enrich columns come back NULL, exactly like no-match.
    A pure post-projection on the filled struct (the matched right
    timestamp rides inside the payload), so the plan shape is
    unchanged: one Exchange, one window, zero extra joins. The bound
    compares the native timestamp difference (a day-time interval) at
    exact microsecond precision — no epoch cast, no truncation, NTZ
    and LTZ alike.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if tolerance_sec is not None and tolerance_sec < 0:
        raise ValueError(f"tolerance_sec must be >= 0, got {tolerance_sec}")
    on = list(on)
    payload = [c for c in right.columns if c not in on]
    left_cols = [c for c in left.columns if c not in on and c != left_ts]

    # Payload travels as ONE struct: per-column last(ignorenulls) would
    # stitch together fields from DIFFERENT right rows when a payload
    # field is legitimately NULL; a struct is non-null as a whole, so the
    # fill always carries one consistent right row.
    # SQL ASOF semantics for NULLs: `r.ts <= l.ts` is never satisfied by
    # a NULL on either side, so NULL-ts right rows can match nothing
    # (drop them) and NULL-ts left rows match nothing (they sort before
    # every non-NULL right row under asc_nulls_first, so their
    # last(payload) fill is NULL once NULL right rows are gone).
    right = right.filter(F.col(right_ts).isNotNull())
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload)
            + ">"
        )
        .alias("__payload"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb_{c}") for c in tie_breaks],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        *[F.col(c).alias(f"__tb_{c}") for c in tie_breaks],
    )
    combined = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.col("__ts").asc_nulls_first(), F.col("__side").asc()] + [
            F.col(f"__tb_{c}").asc_nulls_first() for c in tie_breaks
        ]
    else:
        # Forward: traverse timestamps descending so the fill carries
        # the nearest at-or-after right row. NULL-ts left rows sort
        # first (no right row precedes them → NULL fill), equal-ts
        # right rows sort tb-DESC so last() picks the smallest tuple.
        order = [F.col("__ts").desc_nulls_first(), F.col("__side").asc()] + [
            F.col(f"__tb_{c}").desc_nulls_last() for c in tie_breaks
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.withColumn(
        "__filled", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    if tolerance_sec is not None:
        matched_ts = F.col(f"__filled.{right_ts}")
        if direction == "backward":
            delta = F.col("__ts") - matched_ts
        else:
            delta = matched_ts - F.col("__ts")
        # timestamp difference is a DayTimeInterval — exact microsecond
        # comparison, works for NTZ and LTZ alike (no epoch cast).
        # NULL match -> NULL condition -> otherwise(NULL): stays no-match
        filled = filled.withColumn(
            "__filled",
            F.when(
                delta <= F.expr(f"INTERVAL {int(tolerance_sec)} SECOND"),
                F.col("__filled"),
            ),
        )
    return filled.filter(F.col("__side") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *left_cols,
        *[F.col(f"__filled.{c}").alias(f"{right_prefix}{c}") for c in payload],
    )
