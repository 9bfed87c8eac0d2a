"""Training-set export: the pipeline's last mile — packed sequences
written as a partitioned, file-size-bounded parquet layout plus a
driver-written manifest, the hand-off contract a training job's data
loader consumes.

Spark-native size bounding: ``maxRecordsPerFile`` splits each writer
task's output at the bound (the engine's own mechanism — no custom
file juggling), and ``partitionBy(shard_col)`` gives the
one-directory-per-shard layout loaders shard-assign workers by. The
manifest is shard-level metadata (row/token/sequence counts) — a
metadata-sized aggregate, collected once on the driver and written as
one JSON file next to the data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_training_shards(
    packed: DataFrame,
    out_dir: str,
    shard_col: str = "source",
    tokens_col: str = "n_tokens",
    seq_col: str = "seq_id",
    max_records_per_file: int = 100_000,
) -> dict:
    """Write ``pack_sequences`` output (or any frame with a shard
    column) to ``out_dir`` as ``<shard_col>=<v>/`` parquet directories
    whose files hold at most ``max_records_per_file`` rows, then write
    ``_manifest.json`` with per-shard ``rows`` / ``tokens`` /
    ``sequences`` and corpus totals. Returns the manifest dict.

    Rows are repartitioned by the shard column so each shard's files
    come from writers holding only that shard (no tiny cross-shard
    files), and sorted by ``seq_col`` within partitions so sequences
    lie contiguously in file order — what a sequential loader wants.
    At 100 TB this is one hash shuffle on the shard key; skewed shards
    simply produce more files at the same bound.

    The manifest's stats are computed by READING BACK the written
    output (not by re-running ``packed``'s plan, which could disagree
    with the files if the input is non-deterministic), and the JSON is
    written through the Hadoop FileSystem API so it lands next to the
    data on ANY scheme (``hdfs://``, ``s3a://``) — a local ``open()``
    would write the shards remotely and then crash on the manifest."""
    if max_records_per_file <= 0:
        raise ValueError(
            f"max_records_per_file must be positive, got {max_records_per_file}"
        )
    spark = packed.sparkSession
    (
        packed.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, seq_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .mode("overwrite")
        .parquet(out_dir)
    )
    written = spark.read.parquet(out_dir)
    stats = (
        written.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(F.col(tokens_col)).cast("long").alias("tokens"),
            F.count_distinct(F.col(seq_col)).cast("long").alias("sequences"),
        )
        .collect()
    )
    shards = {
        str(r[shard_col]): {
            "rows": r["rows"],
            "tokens": r["tokens"],
            "sequences": r["sequences"],
        }
        for r in stats
    }
    manifest = {
        "shard_col": shard_col,
        "tokens_col": tokens_col,
        "seq_col": seq_col,
        "max_records_per_file": max_records_per_file,
        "shards": dict(sorted(shards.items())),
        "total_rows": sum(s["rows"] for s in shards.values()),
        "total_tokens": sum(s["tokens"] for s in shards.values()),
    }
    _write_text_file(
        spark,
        os.path.join(out_dir, "_manifest.json"),
        json.dumps(manifest, indent=2, sort_keys=True),
    )
    return manifest


def _write_text_file(spark, path: str, content: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so it
    follows the data's scheme (local, hdfs://, s3a://) instead of
    assuming a local path."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()


def _read_text_file(spark, path: str) -> str:
    """Read a small text file through the Hadoop FileSystem API (same
    scheme-following contract as ``_write_text_file``)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        lines = []
        line = reader.readLine()
        while line is not None:
            lines.append(line)
            line = reader.readLine()
        return "\n".join(lines)
    finally:
        stream.close()


def verify_training_shards(
    spark,
    out_dir: str,
    tokens_col: str | None = None,
    seq_col: str | None = None,
) -> dict:
    """Integrity check of an exported shard layout against its own
    ``_manifest.json`` — the receiving-side handshake a training job
    runs BEFORE burning GPU hours on a partial or stale export (a
    failed driver between shard write and manifest write, a manual
    directory edit, an overwrite race).

    Recomputes per-shard rows / tokens / sequences by reading the
    parquet back (one map-combined groupBy — same cost as the export's
    own stats pass) over the SAME columns the manifest declares
    (recorded at export time; explicit args only override for older
    manifests) and diffs against the manifest. Returns
    ``{"ok": bool, "mismatches": {shard: {field: (manifest, actual)}},
    "missing_shards": [...], "extra_shards": [...]}``; raises
    ``FileNotFoundError`` if the manifest itself is absent (an export
    that never finished must not read as an empty-but-valid one)."""
    import os as _os

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        _os.path.join(out_dir, "_manifest.json")
    )
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise FileNotFoundError(
            f"no _manifest.json under {out_dir} — incomplete export"
        )
    manifest = json.loads(
        _read_text_file(spark, _os.path.join(out_dir, "_manifest.json"))
    )
    shard_col = manifest["shard_col"]
    # the manifest records which columns its stats were computed over;
    # explicit args override only for pre-r10 manifests that lack them
    tokens_col = tokens_col or manifest.get("tokens_col", "n_tokens")
    seq_col = seq_col or manifest.get("seq_col", "seq_id")
    try:
        written = spark.read.parquet(out_dir)
    except Exception:
        # every data file gone (only the manifest survives): schema
        # inference fails — that is "all declared shards missing", a
        # report, not a crash.
        return {
            "ok": not manifest["shards"],
            "mismatches": {},
            "missing_shards": sorted(manifest["shards"]),
            "extra_shards": [],
        }
    stats = (
        written.groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(F.col(tokens_col)).cast("long").alias("tokens"),
            F.count_distinct(F.col(seq_col)).cast("long").alias("sequences"),
        )
        .collect()
    )
    actual = {
        str(r[shard_col]): {
            "rows": r["rows"],
            "tokens": r["tokens"],
            "sequences": r["sequences"],
        }
        for r in stats
    }
    declared = manifest["shards"]
    mismatches: dict = {}
    for shard in sorted(set(declared) & set(actual)):
        diff = {
            f: (declared[shard][f], actual[shard][f])
            for f in ("rows", "tokens", "sequences")
            if declared[shard][f] != actual[shard][f]
        }
        if diff:
            mismatches[shard] = diff
    missing = sorted(set(declared) - set(actual))
    extra = sorted(set(actual) - set(declared))
    return {
        "ok": not mismatches and not missing and not extra,
        "mismatches": mismatches,
        "missing_shards": missing,
        "extra_shards": extra,
    }
