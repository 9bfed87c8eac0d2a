"""fastText-style quality classifier (operators/classifier.py):
closed-form NB-ratio weights separate planted vocabularies, labels
are integer-exact, the model is constant-size, external weights drop
in, and the streaming leg is replay-idempotent and stream≡batch."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.classifier import (
    _classify_batch,
    classify,
    fit_quality_classifier,
    keep_quality,
    read_classifier,
    streaming_classify,
    token_buckets,
    write_classifier,
)

N_BUCKETS = 64
SCALE = 1 << 16


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model(spark):
    pos = _docs(
        spark,
        [
            (0, "theorem proof lemma rigorous analysis"),
            (1, "proof analysis theorem careful rigorous"),
        ],
    )
    neg = _docs(
        spark,
        [
            (0, "click buy cheap pills now"),
            (1, "cheap click pills buy free"),
        ],
    )
    return fit_quality_classifier(
        token_buckets(pos, "text", N_BUCKETS),
        token_buckets(neg, "text", N_BUCKETS),
        N_BUCKETS,
        SCALE,
    )


def test_model_is_dense_and_separates_planted_vocab(spark):
    model = _model(spark)
    assert model.count() == N_BUCKETS  # constant-size at any corpus
    cand = _docs(
        spark,
        [
            (10, "rigorous proof of the theorem"),
            (11, "buy cheap pills"),
            (12, ""),  # zero tokens: no evidence, no row
        ],
    )
    got = {
        r.doc_id: (r.label, r.margin)
        for r in classify(cand, model, "text", "doc_id", N_BUCKETS, SCALE).collect()
    }
    assert set(got) == {10, 11}
    assert got[10][0] == 1 and got[11][0] == 0
    assert got[10][1] > got[11][1]


def test_label_is_integer_exact_neutral_cut(spark):
    """label == (margin_sum >= SCALE * n_tokens) in pure BIGINT — no
    double compare anywhere in the decision."""
    model = _model(spark)
    cand = _docs(spark, [(10, "theorem proof"), (11, "click click buy")])
    rows = classify(cand, model, "text", "doc_id", N_BUCKETS, SCALE).collect()
    for r in rows:
        assert r.label == int(r.margin_sum >= SCALE * r.n_tokens)


def test_keep_quality_deterministic_topk(spark):
    model = _model(spark)
    cand = _docs(
        spark,
        [
            (10, "rigorous proof theorem"),
            (11, "buy cheap pills"),
            (12, "lemma analysis proof"),
        ],
    )
    top = keep_quality(cand, model, "text", "doc_id", 2, N_BUCKETS, SCALE)
    assert {r.doc_id for r in top.collect()} == {10, 12}


def test_store_roundtrip_and_external_weights(spark, tmp_path):
    model = _model(spark)
    path = str(tmp_path / "clf")
    write_classifier(model, path)
    back = read_classifier(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, model.collect())
    )
    # an externally-trained linear model with the same (bucket, w)
    # shape drops into the same scorer: hand-written weights that
    # up-weight one known bucket flip the verdict for a doc of that
    # token alone
    from airbnb_cdc_spark.functions.textfns import h60

    b = (
        spark.range(1)
        .select((h60(F.lit("zzz")) % N_BUCKETS).alias("b"))
        .collect()[0]
        .b
    )
    external = spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        F.when(F.col("id") == b, F.lit(10 * SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("w"),
    )
    got = classify(
        _docs(spark, [(1, "zzz")]), external, "text", "doc_id", N_BUCKETS, SCALE
    ).collect()
    assert got[0].label == 1 and got[0].margin_sum == 10 * SCALE


def test_streaming_classify_matches_batch_and_replays(spark, tmp_path):
    model = _model(spark)
    model_path = str(tmp_path / "clf")
    write_classifier(model, model_path)
    out = str(tmp_path / "verdicts")

    b0 = _docs(spark, [(10, "theorem proof"), (11, "cheap pills")])
    b1 = _docs(spark, [(20, "rigorous lemma analysis")])
    args = (model_path, out, "text", "doc_id", N_BUCKETS, SCALE)
    _classify_batch(b0, 0, *args)
    _classify_batch(b1, 1, *args)

    landed = {
        (r.doc_id, r.margin_sum, r.label, r.batch_id)
        for r in spark.read.parquet(out).collect()
    }
    stored = read_classifier(spark, model_path)
    want = set()
    for df, ep in ((b0, 0), (b1, 1)):
        for r in classify(df, stored, "text", "doc_id", N_BUCKETS, SCALE).collect():
            want.add((r.doc_id, r.margin_sum, r.label, ep))
    assert landed == want

    # crash-replay of epoch 0: identical partition content
    _classify_batch(b0, 0, *args)
    assert {
        (r.doc_id, r.margin_sum, r.label, r.batch_id)
        for r in spark.read.parquet(out).collect()
    } == want


def test_streaming_classify_end_to_end(spark, tmp_path):
    import json

    model = _model(spark)
    model_path = str(tmp_path / "clf")
    write_classifier(model, model_path)

    feed = tmp_path / "feed"
    feed.mkdir()
    for fi, rows in enumerate(
        [
            [{"doc_id": 1, "text": "theorem proof lemma"}],
            [{"doc_id": 2, "text": "buy cheap pills now"}],
        ]
    ):
        with open(feed / f"f{fi}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    out = str(tmp_path / "verdicts")
    q = streaming_classify(
        stream,
        model_path,
        out,
        n_buckets=N_BUCKETS,
        scale=SCALE,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id: r.label for r in spark.read.parquet(out).collect()}
    assert got == {1: 1, 2: 0}
