"""Distributed global prefix sum (running total over a global order).

Spark's Window API can only express a global running sum as
``Window.orderBy(...)`` with no partitioning — a single-partition sort
that funnels the whole frame through one task. This operator implements
the classic two-phase scan (Blelloch) on Spark primitives instead:

    1. bucket rows by quantile boundaries of the order column — the
       boundaries are collected ONCE (bounded metadata: num_buckets - 1
       doubles) and baked into the plan as literals, so the bucket of a
       row is a pure deterministic function of the row, stable across
       actions and recomputations (unlike ``repartitionByRange``, whose
       sampled boundaries can differ between the offset pass and the
       final pass);
    2. per-bucket running sum — an ordinary partitioned window, one
       shuffle on the bucket id, each bucket sorted in parallel;
    3. one bounded collect of per-bucket totals (≤ num_buckets rows),
       turned into exclusive offsets and added back as literals.

The result equals the single-partition global window exactly: the value
sums are exact (integer / decimal), so addition order cannot change
them. Every phase is parallel; the only serial work is the
num_buckets-row offset scan on the driver. This is the 100 TB shape for
Pareto / cumulative-share analytics where the frame being scanned is
itself too large for a one-task sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tie_breaks: Sequence[str],
    descending: bool = False,
    out_col: str = "running_total",
    num_buckets: int = 32,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` over the global
    order (``order_col`` [``descending``], then ``tie_breaks`` asc —
    together they must form a total order), without a single-partition
    sort.

    ``order_col`` must be numeric (bucket boundaries come from
    ``approxQuantile``); ``value_col`` should be an exact type
    (integer / decimal) so the two-phase addition is bit-identical to
    the sequential scan. NULL ``order_col`` rows are excluded (a global
    order over NULLs is caller policy, not ours).
    """
    return _running_sum_scan(
        df, order_col, value_col, tie_breaks, descending, out_col, num_buckets
    )[0]


def global_running_sum_with_total(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tie_breaks: Sequence[str],
    descending: bool = False,
    out_col: str = "running_total",
    num_buckets: int = 32,
) -> tuple[DataFrame, Column]:
    """``global_running_sum`` plus the exact GRAND TOTAL of
    ``value_col``, as a ready-to-use literal Column of the same sum
    dtype (r18, guide §1.2/§5): the scan's pass 2 already collects
    every bucket's exact sum to build the offsets — their inclusive
    accumulation IS the grand total (exact types, so addition order
    cannot change it; the all-NULL input yields a NULL total, exactly
    like ``F.sum`` over it). Callers that previously ran a second
    aggregate branch over the input for the total (Pareto share,
    decile boundary ranks) read it from here instead — one fewer
    subtree recomputing the input per action."""
    return _running_sum_scan(
        df, order_col, value_col, tie_breaks, descending, out_col, num_buckets
    )


def _running_sum_scan(
    df: DataFrame,
    order_col: str,
    value_col: str,
    tie_breaks: Sequence[str],
    descending: bool,
    out_col: str,
    num_buckets: int,
) -> tuple[DataFrame, Column]:
    df = df.filter(F.col(order_col).isNotNull())
    # Pass 1 — bucket boundaries, collected once and frozen as literals.
    # approxQuantile is itself a bounded-metadata aggregation; boundary
    # placement only affects load balance, never values.
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = df.stat.approxQuantile(order_col, probs, 0.001)
    bounds = sorted(set(bounds), reverse=descending)
    pid = F.lit(0)
    for b in bounds:
        hit = (F.col(order_col) < F.lit(b)) if descending else (F.col(order_col) > F.lit(b))
        pid = pid + hit.cast("int")
    bucketed = df.withColumn("__pid", pid)

    # Pass 2 — per-bucket exact totals → exclusive offsets (driver-side
    # scan over ≤ num_buckets rows of metadata).
    totals = bucketed.groupBy("__pid").agg(F.sum(F.col(value_col)).alias("__t")).collect()
    offsets = {}
    acc = None
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        if row["__t"] is not None:
            acc = row["__t"] if acc is None else acc + row["__t"]

    # Pass 3 — parallel per-bucket running sum plus the frozen offset.
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        *[F.col(c).asc() for c in tie_breaks],
    ]
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sum_type = bucketed.select(F.sum(F.col(value_col)).alias("__s")).schema["__s"].dataType
    offset_expr = F.lit(None).cast(sum_type)
    for p, off in offsets.items():
        if off is not None:
            offset_expr = F.when(F.col("__pid") == p, F.lit(off)).otherwise(offset_expr)
    local = F.sum(F.col(value_col)).over(w)
    # SQL window-sum NULL semantics, matched exactly: a row whose frame
    # holds only NULLs gets NULL from the sequential global scan ONLY
    # when no prior bucket contributed either — with a prior offset the
    # carried total must flow through (a bucket-local all-NULL prefix
    # must not blank it).
    running = F.when(
        local.isNull() & offset_expr.isNull(), F.lit(None).cast(sum_type)
    ).otherwise(F.coalesce(local, F.lit(0)) + F.coalesce(offset_expr, F.lit(0)))
    out = bucketed.withColumn(out_col, running.cast(sum_type)).drop("__pid")
    # inclusive accumulation over ALL buckets = the exact grand total
    # (``acc`` after the offsets loop); NULL when every bucket was NULL
    total_col = F.lit(acc).cast(sum_type)
    return out, total_col
