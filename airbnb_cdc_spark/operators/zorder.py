"""Z-order (Morton-curve) layout clustering — the data-layout
optimization that makes 100 TB scans cheap on MULTI-dimensional
predicates, the Delta ``OPTIMIZE ZORDER BY`` analog built from plain
DataFrame ops.

Min/max file skipping (parquet row-group stats, Delta file stats)
prunes scans only when the file layout correlates with the predicate
columns. A sort by ``(a, b)`` gives perfect skipping on ``a`` and none
on ``b``; interleaving the BITS of both dimensions into one Morton key
and range-partitioning on it gives every file a tight bounding box in
BOTH dimensions — a predicate on either (or both) prunes most files.

Everything here is exact integer bit arithmetic (shift/AND/OR unrolled
per bit, whole-stage codegen) — deterministic and reproducible in
DuckDB from the same generated expression, so the layout assignment
itself is oracle-checkable. ``zorder_write`` is the physical leg:
``repartitionByRange`` on the z-value (one range shuffle — sampling
the key like any global sort) + within-partition sort, so row-group
stats inside each file are tight too.

At 100 TB: the z-value is a pure projection on the scan; the only
shuffle is the range partitioning you would pay for ANY clustering
rewrite; downstream queries with ``x BETWEEN``/``y BETWEEN``
predicates touch the few files whose z-range intersects the query box
(~O(perimeter) of the box instead of all files).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of two already-quantized non-negative ints
    (``bits`` bits each) into a ``2*bits``-bit z-value: x occupies the
    even bit positions, y the odd. Unrolled shift/AND/OR — exact,
    codegen-friendly, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB mirror of ``zvalue`` — generated from the same bit
    loop so both engines compute literally the same expression."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    file_bits: int = 6,
) -> DataFrame:
    """Layout audit: assign each row a z-value and a FILE bucket (the
    top ``file_bits`` of the z-value — equal z-ranges, the deterministic
    stand-in for range-partition boundaries), then the per-file
    bounding box ``(n_rows, min/max x, min/max y)``. Tight boxes ARE
    the skipping guarantee: a query box prunes every file whose bbox
    misses it. One groupBy on a small key space — metadata-sized
    output."""
    z = zvalue(x, y, bits)
    bucket = F.shiftright(z, 2 * bits - file_bits)
    return (
        df.select(
            bucket.alias("zfile"),
            x.alias("__x"),
            y.alias("__y"),
        )
        .groupBy("zfile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
    )


def zorder_write(
    df: DataFrame,
    out_dir: str,
    x: Column,
    y: Column,
    bits: int = 8,
    n_files: int = 64,
) -> None:
    """Physically rewrite ``df`` z-order-clustered: range-partition on
    the z-value into ``n_files`` tasks and sort within each, so both
    the per-file and per-row-group min/max stats are tight on BOTH
    dimensions. The z column is dropped from the output — layout is
    the product, not a schema change."""
    (
        df.withColumn("__z", zvalue(x, y, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
