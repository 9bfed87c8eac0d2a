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
