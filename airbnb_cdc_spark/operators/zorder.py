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


MANIFEST_NAME = "_zorder_manifest.json"


def zorder_write(
    df: DataFrame,
    out_dir: str,
    x: Column,
    y: Column,
    bits: int = 8,
    n_files: int = 64,
) -> dict:
    """Physically rewrite ``df`` z-order-clustered: range-partition on
    the z-value into ``n_files`` tasks and sort within each, so both
    the per-file and per-row-group min/max stats are tight on BOTH
    dimensions. The z column is dropped from the output — layout is
    the product, not a schema change.

    Also records ``_zorder_manifest.json`` beside the files: each
    written file's exact per-dimension bounding box, computed by
    READING BACK the written files (one extra metadata-sized scan — so
    the manifest describes what is actually on disk, never what the
    writer intended; the export-manifest precedent). ``zorder_read``
    consumes it to prune the file listing BEFORE the scan — the
    engine-independent analog of Delta's per-file stats + data
    skipping, usable by any reader without a transaction log. The
    leading underscore keeps parquet readers ignoring it. Returns the
    manifest dict."""
    import json
    import posixpath

    spark = df.sparkSession
    (
        df.withColumn("__z", zvalue(x, y, bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    rows = (
        spark.read.parquet(out_dir)
        .select(
            F.input_file_name().alias("__f"), x.alias("__x"), y.alias("__y")
        )
        .groupBy("__f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("__x").alias("x_min"),
            F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"),
            F.max("__y").alias("y_max"),
        )
        .collect()
    )
    manifest = {
        "files": {
            posixpath.basename(r["__f"]): {
                "n_rows": r["n_rows"],
                "x_min": r["x_min"],
                "x_max": r["x_max"],
                "y_min": r["y_min"],
                "y_max": r["y_max"],
            }
            for r in rows
        }
    }
    from airbnb_cdc_spark.sources.export import _write_text_file

    _write_text_file(
        spark,
        posixpath.join(out_dir, MANIFEST_NAME),
        json.dumps(manifest, indent=2, sort_keys=True),
    )
    return manifest


def zorder_candidate_files(
    spark,
    out_dir: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> list[str]:
    """File names (relative to ``out_dir``) whose manifest bbox
    INTERSECTS the inclusive query box — ``None`` leaves a dimension
    unconstrained. The superset guarantee is the contract: a candidate
    file may hold non-matching rows (the caller re-applies the exact
    predicate), but no matching row lives outside the candidates,
    because the bbox is an exact min/max of the file's contents."""
    import json

    from airbnb_cdc_spark.operators.merge import _fs

    fs, _ = _fs(spark, out_dir)
    Path = spark._jvm.org.apache.hadoop.fs.Path
    p = Path(f"{out_dir}/{MANIFEST_NAME}")
    if not fs.exists(p):
        raise FileNotFoundError(
            f"no {MANIFEST_NAME} under {out_dir} — was it written by zorder_write?"
        )
    stream = fs.open(p)
    try:
        data = bytes(
            spark._jvm.org.apache.hadoop.io.IOUtils.readFullyToByteArray(stream)
        )
    finally:
        stream.close()
    manifest = json.loads(data.decode("utf-8"))

    def hits(box, rng):
        if rng is None:
            return True
        lo, hi = rng
        return not (hi < box[0] or lo > box[1])

    return sorted(
        name
        for name, b in manifest["files"].items()
        if hits((b["x_min"], b["x_max"]), x_range)
        and hits((b["y_min"], b["y_max"]), y_range)
    )


def zorder_read(
    spark,
    out_dir: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> DataFrame:
    """Read a ``zorder_write`` directory touching ONLY the files whose
    recorded bbox intersects the query box — manifest-driven file
    skipping ahead of the scan (the row-group stats then prune further
    inside each file). Returns the candidate-file rows; apply the
    exact predicate on top — candidates are a superset by design.
    An empty candidate set returns the empty table with the full
    schema."""
    files = zorder_candidate_files(spark, out_dir, x_range, y_range)
    if not files:
        return spark.read.parquet(out_dir).limit(0)
    return spark.read.parquet(*[f"{out_dir}/{name}" for name in files])
