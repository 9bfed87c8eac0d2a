"""Training-shard export: size-bounded files, shard layout, manifest
agreement, and lossless round-trip."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.sampling import pack_sequences
from airbnb_cdc_spark.sources.export import export_training_shards
from airbnb_cdc_spark.functions.textfns import token_count


def test_export_training_shards_roundtrip(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(
        docs, "source", "doc_id", token_count(F.col("text")), budget=256
    )
    out = str(tmp_path / "shards")
    manifest = export_training_shards(
        packed, out, shard_col="source", max_records_per_file=50
    )

    # manifest totals agree with the input frame
    assert manifest["total_rows"] == packed.count()
    assert (
        manifest["total_tokens"]
        == packed.agg(F.sum("n_tokens")).first()[0]
    )
    on_disk = json.loads((Path(out) / "_manifest.json").read_text())
    assert on_disk == manifest

    # every shard dir exists and no data file exceeds the record bound
    for shard, s in manifest["shards"].items():
        d = Path(out) / f"source={shard}"
        assert d.is_dir()
        files = list(d.glob("*.parquet"))
        assert files
        sizes = [
            spark.read.parquet(str(f)).count() for f in files
        ]
        assert all(n <= 50 for n in sizes)
        assert sum(sizes) == s["rows"]

    # lossless round-trip (partition column comes back via discovery)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.select(*sorted(back.columns)).collect())) == sorted(
        map(tuple, packed.select(*sorted(packed.columns)).collect())
    )


def test_export_rejects_bad_bound(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1, "s", 2, 0)], "doc_id long, source string, n_tokens long, seq_id long")
    with pytest.raises(ValueError, match="positive"):
        export_training_shards(df, str(tmp_path / "x"), max_records_per_file=0)
