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
    simply produce more files at the same bound."""
    if max_records_per_file <= 0:
        raise ValueError(
            f"max_records_per_file must be positive, got {max_records_per_file}"
        )
    (
        packed.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, seq_col)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .mode("overwrite")
        .parquet(out_dir)
    )
    stats = (
        packed.groupBy(shard_col)
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
        "max_records_per_file": max_records_per_file,
        "shards": dict(sorted(shards.items())),
        "total_rows": sum(s["rows"] for s in shards.values()),
        "total_tokens": sum(s["tokens"] for s in shards.values()),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
