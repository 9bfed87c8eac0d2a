"""Lookup (O5) — left outer equi-join picking the latest right row per key.

Reference: ``LookupForInsertUpdateFlag``
(``dataflow/New_BookingTransformation.json:108-112``): enrich accepted
records with the existing fact row on ``booking_id``; ``multiple: false,
pickup: 'first'`` ordered by ``desc(updated_at, true)`` — i.e. keep only
the latest target row per key; ``broadcast: 'auto'``.

Spark shape: window-dedup the right side (row_number over
partitionBy(key) orderBy desc(version)) then a plain left join. A stable
tie-break column keeps the result deterministic when versions tie
(SURVEY.md §7 "what's hard" (d)).

Scale notes:
- The window dedup shuffles the right side once on the join key; the join
  then reuses that partitioning (no second shuffle of the right side).
- ``broadcast: 'auto'`` maps to AQE's dynamic broadcast: if the deduped
  right side is small, AQE converts the sort-merge join to broadcast-hash
  at runtime. We expose an explicit ``hint_broadcast`` switch for when the
  caller *knows* the right side is dimension-sized.
- Last-writer-wins by key is exactly how out-of-order CDC arrivals are
  absorbed without watermarks (SURVEY.md §2.8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tie_breaks: Sequence[str] = (),
) -> DataFrame:
    """Keep the single latest row per key (descending version, then
    descending tie-break columns for determinism).

    Determinism requires the (version, *tie_breaks) order to be TOTAL
    within each key: with the empty default, exact version ties (shared
    commit timestamps; NULL versions, which all sort last) pick an
    arbitrary winner per run. Pass a unique column (event_id, file
    offset) whenever the right side can carry duplicates per key —
    sides already unique per key (e.g. a merge table read) need none."""
    order = [F.col(version_col).desc_nulls_last()] + [
        F.col(c).desc_nulls_last() for c in tie_breaks
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def lookup_latest(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    version_col: str,
    right_prefix: str = "t_",
    tie_breaks: Sequence[str] = (),
    hint_broadcast: bool = False,
) -> DataFrame:
    """Left join ``left`` to the latest-per-key slice of ``right``;
    right-side non-key columns come back prefixed (the dataflow keeps
    them stream-qualified until the final select strips them)."""
    deduped = latest_per_key(right, keys, version_col, tie_breaks)
    renamed = deduped.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"{right_prefix}{c}") for c in deduped.columns if c not in keys],
    )
    if hint_broadcast:
        renamed = F.broadcast(renamed)
    return left.join(renamed, on=list(keys), how="left")
