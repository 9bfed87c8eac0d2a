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


def test_verify_training_shards_clean_and_tampered(spark, tmp_path):
    import shutil

    import pytest

    from airbnb_cdc_spark.sources.export import verify_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(
        docs, "source", "doc_id", token_count(F.col("text")), budget=256
    )
    out = str(tmp_path / "shards")
    export_training_shards(
        packed, out, shard_col="source", max_records_per_file=50
    )

    # clean export verifies ok
    report = verify_training_shards(spark, out)
    assert report["ok"] and not report["mismatches"]

    # tamper: drop a whole shard directory -> missing shard reported
    victim = sorted(
        p.name.split("=", 1)[1]
        for p in Path(out).glob("source=*")
    )[0]
    shutil.rmtree(Path(out) / f"source={victim}")
    report = verify_training_shards(spark, out)
    assert not report["ok"]
    assert report["missing_shards"] == [victim]

    # no manifest at all must raise, not return ok-on-empty
    (Path(out) / "_manifest.json").unlink()
    with pytest.raises(FileNotFoundError, match="incomplete export"):
        verify_training_shards(spark, out)

    # tamper: delete ONE of a multi-file shard's data files -> counts
    # diverge from the manifest (not a missing shard)
    big = spark.range(240).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
        F.lit(3).cast("long").alias("n_tokens"),
        (F.col("id") % 7).alias("seq_id"),
    )
    out2 = str(tmp_path / "shards2")
    export_training_shards(
        big, out2, shard_col="source", max_records_per_file=50
    )
    assert verify_training_shards(spark, out2)["ok"]
    files_a = sorted((Path(out2) / "source=a").glob("*.parquet"))
    assert len(files_a) >= 2  # the tamper must leave the shard present
    files_a[0].unlink()
    report = verify_training_shards(spark, out2)
    assert not report["ok"]
    assert "rows" in report["mismatches"]["a"]
    assert report["mismatches"]["a"]["rows"][0] == 120  # manifest value
    assert report["missing_shards"] == [] and report["extra_shards"] == []


def test_verify_training_shards_all_data_gone(spark, tmp_path):
    import shutil

    from airbnb_cdc_spark.sources.export import verify_training_shards

    df = spark.createDataFrame(
        [(1, "s", 2, 0)],
        "doc_id long, source string, n_tokens long, seq_id long",
    )
    out = str(tmp_path / "shards")
    export_training_shards(df, out, shard_col="source")
    shutil.rmtree(Path(out) / "source=s")
    report = verify_training_shards(spark, out)
    assert not report["ok"]
    assert report["missing_shards"] == ["s"]
