"""Persisted IVF index geometry guard: query/append frames whose
vector width disagrees with the stored centroids must fail loud (the
_stored_pq_geometry class of drift — zip_with truncates silently)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.similarity import (
    append_ivf_index,
    build_ivf_index,
    query_ivf_index,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _vecs(spark, ids):
    rows = [
        (i, [((((i * 31 + d * 7) % 257) - 128) / 128.0) for d in range(64)])
        for i in ids
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_wrong_width_frame_fails_loud(spark, tmp_path):
    """A query or append frame wider than the stored centroids must
    raise instead of scoring silently-truncated cosines (the centroid
    table carries the width)."""
    path = str(tmp_path / "ivf")
    build_ivf_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3
    )
    wide = spark.createDataFrame([(0, [0.5] * 128)], _SCHEMA)
    with pytest.raises(ValueError, match="components"):
        query_ivf_index(spark, path, wide, k=3)
    with pytest.raises(ValueError, match="components"):
        append_ivf_index(spark, path, wide)


def test_mixed_width_append_batch_fails_loud(spark, tmp_path):
    """A mixed-width append batch whose FIRST row matches the stored
    centroid width slipped past the limit-1 probe (r14 ADVICE); the
    post-persist full min/max check over the quantized batch must
    refuse the whole batch before any list is touched."""
    import pytest
    from pyspark.sql import types as T

    from airbnb_cdc_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(_vecs(spark, range(60)), path)
    n_before = spark.read.parquet(path + "/lists").count()
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    mixed = spark.createDataFrame(
        [(100, [0.5] * 64), (101, [0.5] * 128)], schema
    ).coalesce(1)
    with pytest.raises(ValueError, match="mixed|components"):
        append_ivf_index(spark, path, mixed)
    assert spark.read.parquet(path + "/lists").count() == n_before
