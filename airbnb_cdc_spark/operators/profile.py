"""Column profiling: per-column data-quality stats in one scan.

A pipeline-health primitive (null-rate drift, cardinality explosions,
range shifts are the standard early-warning signals for a corpus or
fact-table feed). All profiled columns are aggregated in a SINGLE
hash-aggregate pass over one scan — profiling N columns costs one job,
not N — then unpivoted driver-free with ``stack``.

min/max are rendered as strings so heterogeneous column types share one
output schema; exact count_distinct keeps the result oracle-checkable
(swap in approx_count_distinct at extreme cardinalities — noted, not
default, because sketches differ across engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(col_name, n_rows, n_null, n_distinct, min_val, max_val) per
    profiled column. One aggregation pass; NULLs excluded from
    n_distinct and min/max (SQL aggregate semantics)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null{i}"),
            F.count_distinct(F.col(c)).alias(f"__dist{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max{i}"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __null{i}, __dist{i}, __min{i}, __max{i}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack})"
            " AS (col_name, n_null, n_distinct, min_val, max_val)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
