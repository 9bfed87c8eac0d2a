"""Z-order layout: Morton arithmetic pinned to hand-computed values,
and the physical rewrite's skipping guarantee measured on real files —
per-file bounding boxes must be tight enough that a 1/8-width query
box prunes most files on EITHER dimension."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.zorder import zorder_write, zvalue, zvalue_sql


def test_zvalue_matches_hand_interleave(spark):
    rows = spark.range(1).select(
        zvalue(F.lit(3).cast("long"), F.lit(5).cast("long"), bits=3).alias("a"),
        zvalue(F.lit(0).cast("long"), F.lit(7).cast("long"), bits=3).alias("b"),
        zvalue(F.lit(7).cast("long"), F.lit(0).cast("long"), bits=3).alias("c"),
        zvalue(F.lit(255).cast("long"), F.lit(255).cast("long"), bits=8).alias("d"),
    ).collect()[0]
    # x=0b011,y=0b101 -> bits (z5..z0) = y2 x2 y1 x1 y0 x0 = 100111
    assert rows.a == 0b100111
    assert rows.b == 0b101010  # y fills odd bits
    assert rows.c == 0b010101  # x fills even bits
    assert rows.d == (1 << 16) - 1


def test_zvalue_sql_mirrors_column(spark):
    import duckdb

    df = spark.range(500).select(
        (F.col("id") % 97).alias("x"), (F.col("id") % 61).alias("y")
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y"), 7).alias("z")).collect()
    }
    sql = f"SELECT x, y, {zvalue_sql('x', 'y', 7)} AS z FROM pts"
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", [(x, y) for x, y in got])
    for x, y, z in con.execute(sql).fetchall():
        assert got[(x, y)] == z


def test_zorder_write_files_skip_on_both_dims(spark, tmp_path):
    # Uniform hashed dims fill all 8 quantized bits — the regime the
    # layout targets (quantization should always spread the domain;
    # a dim that only occupies low bits wastes its interleaved slots).
    pts = spark.range(60_000).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(256)).alias("y"),
    )
    out = str(tmp_path / "zorried")
    zorder_write(pts, out, F.col("x"), F.col("y"), bits=8, n_files=32)

    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 8  # range partitioner actually spread the data
    boxes = []
    for f in files:
        r = (
            spark.read.parquet(f)
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()[0]
        )
        boxes.append(tuple(r))
    # Skipping on dim x: a query box x in [0, 32) must prune most files.
    hit_x = sum(1 for (x0, x1, _, _) in boxes if x0 < 32 and x1 >= 0)
    assert hit_x <= len(files) // 2
    # Same predicate width on dim y — the point of Z vs a plain sort.
    hit_y = sum(1 for (_, _, y0, y1) in boxes if y0 < 32 and y1 >= 0)
    assert hit_y <= len(files) // 2
    # And the boxes are individually tight: mean area well under the
    # full 256x256 domain spread over the files.
    areas = [(x1 - x0 + 1) * (y1 - y0 + 1) for (x0, x1, y0, y1) in boxes]
    assert sum(areas) / len(areas) < 0.25 * 256 * 256


def test_zorder_read_prunes_files_and_preserves_rows(spark, tmp_path):
    """The read-side API (VERDICT r9 ask #8): zorder_read must touch a
    strict subset of the files for a small query box while the exact
    predicate applied on top returns rows identical to a full-scan
    filter — and the manifest bboxes must be exact (superset contract:
    no matching row outside the candidates)."""
    from airbnb_cdc_spark.operators.zorder import (
        zorder_candidate_files,
        zorder_read,
        zorder_write,
    )

    pts = spark.range(60_000).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(256)).alias("y"),
    )
    out = str(tmp_path / "zr")
    manifest = zorder_write(pts, out, F.col("x"), F.col("y"), bits=8, n_files=32)
    n_files = len(manifest["files"])
    assert n_files > 8
    assert sum(b["n_rows"] for b in manifest["files"].values()) == 60_000

    pred = (
        (F.col("x") >= 10) & (F.col("x") <= 40)
        & (F.col("y") >= 200) & (F.col("y") <= 230)
    )
    full = {r.id for r in spark.read.parquet(out).filter(pred).collect()}
    cand = zorder_candidate_files(spark, out, x_range=(10, 40), y_range=(200, 230))
    assert 0 < len(cand) < n_files // 2  # the box prunes most files
    pruned = {r.id for r in zorder_read(
        spark, out, x_range=(10, 40), y_range=(200, 230)
    ).filter(pred).collect()}
    assert pruned == full

    # single-dimension box still prunes (the point of Z vs plain sort)
    cand_y = zorder_candidate_files(spark, out, y_range=(0, 31))
    assert len(cand_y) <= n_files // 2
    got_y = zorder_read(spark, out, y_range=(0, 31)).filter(
        (F.col("y") >= 0) & (F.col("y") <= 31)
    ).count()
    want_y = spark.read.parquet(out).filter(
        (F.col("y") >= 0) & (F.col("y") <= 31)
    ).count()
    assert got_y == want_y

    # a box outside the domain -> empty result, full schema
    empty = zorder_read(spark, out, x_range=(1000, 2000))
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "x", "y"}
