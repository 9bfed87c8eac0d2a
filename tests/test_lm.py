"""Bigram-LM fluency operator: transition edge cases, store
round-trip, and the streaming leg's replay idempotence + stream≡batch
equivalence (the DSIR-family test shape)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.lm import (
    _lm_select_batch,
    fit_bigram_lm,
    lm_score,
    lm_select,
    read_lm_model,
    streaming_lm_select,
    transition_buckets,
    write_lm_model,
)

N_BUCKETS = 16


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model(spark, target_rows):
    tr = transition_buckets(_docs(spark, target_rows), "text", N_BUCKETS)
    return fit_bigram_lm(tr, N_BUCKETS)


def test_transitions_edge_cases(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c"),  # 2 transitions
            (2, "solo"),  # 1 token -> no transitions
            (3, ""),  # empty -> none
            (4, None),  # NULL -> none
            (5, "  x   y  "),  # whitespace runs collapse -> 1
        ],
    )
    tr = transition_buckets(docs, "text", N_BUCKETS)
    got = {r.doc_id: 0 for r in tr.collect()}
    counts = tr.groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in counts} == {1: 2, 5: 1}
    model = _model(spark, [(0, "a b c a b")])
    scored = {
        r.doc_id
        for r in lm_score(docs, model, "text", "doc_id", N_BUCKETS).collect()
    }
    assert scored == {1, 5}  # transition-less docs drop out


def test_model_dense_and_store_roundtrip(spark, tmp_path):
    model = _model(spark, [(0, "a b a b c")])
    assert model.count() == N_BUCKETS * N_BUCKETS
    path = str(tmp_path / "model")
    write_lm_model(model, path)
    back = read_lm_model(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, model.collect())
    )
    # seen transitions outscore unseen ones
    seen = lm_score(
        _docs(spark, [(1, "a b"), (2, "q r")]), back, "text", "doc_id", N_BUCKETS
    ).collect()
    by_id = {r.doc_id: r.fluency for r in seen}
    assert by_id[1] > by_id[2]


def test_streaming_lm_batches_match_batch_scoring(spark, tmp_path):
    model = _model(spark, [(0, "spark shuffle join plan spark shuffle")])
    model_path = str(tmp_path / "model")
    write_lm_model(model, model_path)
    out = str(tmp_path / "sel")

    b0 = _docs(spark, [(10, "spark shuffle join"), (11, "banana mango kiwi")])
    b1 = _docs(spark, [(20, "join plan spark shuffle")])
    _lm_select_batch(b0, 0, model_path, out, "text", "doc_id", 1, N_BUCKETS)
    _lm_select_batch(b1, 1, model_path, out, "text", "doc_id", 1, N_BUCKETS)

    landed = {
        (r.doc_id, r.fluency_sum, r.batch_id)
        for r in spark.read.parquet(out).collect()
    }
    stored = read_lm_model(spark, model_path)
    want = set()
    for df, ep in ((b0, 0), (b1, 1)):
        row = lm_select(df, stored, "text", "doc_id", 1, N_BUCKETS).collect()[0]
        want.add((row.doc_id, row.fluency_sum, ep))
    assert landed == want
    assert {r[0] for r in landed} == {10, 20}  # fluent docs win

    # crash-replay of epoch 0: identical partition content
    _lm_select_batch(b0, 0, model_path, out, "text", "doc_id", 1, N_BUCKETS)
    assert {
        (r.doc_id, r.fluency_sum, r.batch_id)
        for r in spark.read.parquet(out).collect()
    } == want


def test_streaming_lm_end_to_end(spark, tmp_path):
    import json

    model = _model(spark, [(0, "spark shuffle join plan")])
    model_path = str(tmp_path / "model")
    write_lm_model(model, model_path)

    feed = tmp_path / "feed"
    feed.mkdir()
    for fi, rows in enumerate(
        [
            [{"doc_id": 1, "text": "spark shuffle join"}],
            [{"doc_id": 2, "text": "unrelated words here"}],
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
    out = str(tmp_path / "sel")
    q = streaming_lm_select(
        stream,
        model_path,
        out,
        k=5,
        n_buckets=N_BUCKETS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2}


def test_interpolated_backoff_orders_vocab_over_oov(spark):
    """Unseen transitions between TARGET-vocabulary tokens must
    outscore unseen transitions over out-of-vocabulary tokens — the
    backoff term pure Laplace cannot express (both docs would tie at
    the flat floor under fit_bigram_lm)."""
    from airbnb_cdc_spark.operators.lm import fit_interpolated_lm

    target = _docs(spark, [(0, "a b c d a b c d")])
    tr = transition_buckets(target, "text", N_BUCKETS)
    interp = fit_interpolated_lm(tr, N_BUCKETS)
    assert interp.count() == N_BUCKETS * N_BUCKETS
    docs = _docs(
        spark,
        [
            (1, "d c b a"),  # target vocab, novel transitions
            (2, "q r s t"),  # out-of-vocabulary
        ],
    )
    fi = {
        r.doc_id: r.fluency
        for r in lm_score(docs, interp, "text", "doc_id", N_BUCKETS).collect()
    }
    assert fi[1] > fi[2]  # backoff separates them
    # sanity: seen transitions still dominate under interpolation
    seen = lm_score(
        _docs(spark, [(3, "a b c d")]), interp, "text", "doc_id", N_BUCKETS
    ).collect()[0].fluency
    assert seen > fi[1]


def test_kneser_ney_prefers_continuation_diversity(spark):
    """The KN signature Laplace/JM cannot express: for unseen
    contexts, a token that follows MANY distinct contexts ("y") must
    outrank one that is MORE FREQUENT but context-bound ("x" always
    follows "a" — the "Francisco follows only San" case). JM backs
    off to raw frequency and prefers x; KN backs off to continuation
    diversity and must prefer y."""
    from airbnb_cdc_spark.operators.lm import (
        fit_interpolated_lm,
        fit_kneser_ney_lm,
    )

    # 64 buckets, not the file-default 16: at 16 a context token
    # collides into x's bucket and muddies both backoff terms
    nb = 64
    target = _docs(
        spark,
        [
            (0, "a x a x a x a x a x a x"),  # x: freq 6, one context
            (1, "p y q y r y s y t y"),  # y: freq 5, five contexts
        ],
    )
    tr = transition_buckets(target, "text", nb)
    kn = fit_kneser_ney_lm(tr, nb)
    assert kn.count() == nb * nb
    docs = _docs(
        spark,
        [
            (10, "w x u x"),  # unseen contexts -> backoff decides
            (11, "w y u y"),
        ],
    )
    fkn = {
        r.doc_id: r.fluency
        for r in lm_score(docs, kn, "text", "doc_id", nb).collect()
    }
    assert fkn[11] > fkn[10]  # KN: diversity wins
    jm = fit_interpolated_lm(tr, nb)
    fjm = {
        r.doc_id: r.fluency
        for r in lm_score(docs, jm, "text", "doc_id", nb).collect()
    }
    assert fjm[10] > fjm[11]  # JM: raw frequency wins — the contrast


def test_ppl_thresholds_freeze_and_assign(spark):
    """Threshold assignment must equal rank assignment on the fitting
    corpus (ties included), and FROZEN thresholds must bucket unseen
    docs without any re-ranking — the CCNet production contract."""
    from pyspark.sql import Window

    from airbnb_cdc_spark.operators.lm import (
        assign_ppl_buckets,
        ppl_tercile_thresholds,
    )

    rows = []
    # two languages; lang "a" has deliberate fluency TIES so the
    # boundary can land inside a tie run (the bare-cutoff failure)
    for i in range(9):
        rows.append((i, "a", [3.0, 2.0, 2.0, 2.0, 1.0, 1.0, 0.5, 0.2, 0.1][i]))
    for i in range(4):
        rows.append((100 + i, "b", float(4 - i)))
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, fluency double"
    )
    th = ppl_tercile_thresholds(scored)
    got = {
        r.doc_id: r.bucket
        for r in assign_ppl_buckets(scored, th).collect()
    }
    w = Window.partitionBy("lang").orderBy(
        F.col("fluency").desc(), F.col("doc_id")
    )
    want = {
        r.doc_id: ["head", "middle", "tail"][r.b]
        for r in scored.select(
            "doc_id",
            F.expr(
                "CAST(((row_number() OVER (PARTITION BY lang ORDER BY"
                " fluency DESC, doc_id)) - 1) * 3 AS BIGINT)"
            ).alias("__x"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("__c"),
        )
        .select("doc_id", F.expr("CAST(__x div __c AS INT)").alias("b"))
        .collect()
    }
    assert got == want
    # frozen thresholds bucket NEW docs with no re-rank: a doc more
    # fluent than lang-a's head boundary is head; one below the tail
    # boundary is tail
    new = spark.createDataFrame(
        [(200, "a", 10.0), (201, "a", 0.01)],
        "doc_id long, lang string, fluency double",
    )
    nb = {r.doc_id: r.bucket for r in assign_ppl_buckets(new, th).collect()}
    assert nb == {200: "head", 201: "tail"}


def test_assign_buckets_keeps_unknown_languages(spark):
    """A language absent from the frozen threshold table (a new
    language arriving in a later batch/stream) must not be silently
    dropped: all-NULL boundaries resolve to 'head' via the
    NULL-boundary rule, and the doc survives until the next
    threshold refresh re-buckets it."""
    from airbnb_cdc_spark.operators.lm import (
        assign_ppl_buckets,
        ppl_tercile_thresholds,
    )

    fitted = spark.createDataFrame(
        [(i, "a", float(9 - i)) for i in range(9)],
        "doc_id long, lang string, fluency double",
    )
    th = ppl_tercile_thresholds(fitted)
    arriving = spark.createDataFrame(
        [(300, "a", 5.0), (301, "zz", 1.0)],
        "doc_id long, lang string, fluency double",
    )
    got = {r.doc_id: r.bucket for r in assign_ppl_buckets(arriving, th).collect()}
    assert set(got) == {300, 301}  # the unknown-lang doc is kept
    assert got[301] == "head"


def test_streaming_bucket_assign_matches_batch_and_replays(spark, tmp_path):
    """Frozen-threshold bucketing's streaming leg: per-batch
    assignments against the persisted model + threshold stores equal
    the batch assign_ppl_buckets on the same rows, and a crash-replay
    of an epoch overwrites its partition with identical content. Both
    stores are read-only in-stream — the CCNet contract."""
    from airbnb_cdc_spark.operators.lm import (
        _assign_buckets_batch,
        assign_ppl_buckets,
        ppl_tercile_thresholds,
        read_lm_model,
        read_ppl_thresholds,
        write_ppl_thresholds,
    )

    model = _model(spark, [(0, "spark shuffle join plan spark shuffle")])
    model_path = str(tmp_path / "model")
    write_lm_model(model, model_path)

    # freeze thresholds from a fitted corpus of 9 lang-a docs
    fit_docs = spark.createDataFrame(
        [(i, "a", f"spark shuffle join w{i} plan") for i in range(9)],
        "doc_id long, lang string, text string",
    )
    scored_fit = lm_score(
        fit_docs.select("doc_id", "text"), model, "text", "doc_id", N_BUCKETS
    ).join(fit_docs.select("doc_id", "lang"), "doc_id")
    th = ppl_tercile_thresholds(scored_fit)
    th_path = str(tmp_path / "thresholds")
    write_ppl_thresholds(th, th_path)

    out = str(tmp_path / "buckets")
    b0 = spark.createDataFrame(
        [(10, "a", "spark shuffle join plan"), (11, "a", "banana mango kiwi")],
        "doc_id long, lang string, text string",
    )
    b1 = spark.createDataFrame(
        [(20, "zz", "join plan spark")],  # lang unseen by the thresholds
        "doc_id long, lang string, text string",
    )
    args = (model_path, th_path, out, "text", "doc_id", "lang", N_BUCKETS)
    _assign_buckets_batch(b0, 0, *args)
    _assign_buckets_batch(b1, 1, *args)

    landed = {
        (r.doc_id, r.lang, r.bucket, r.batch_id)
        for r in spark.read.parquet(out).collect()
    }
    # batch equivalence on the same rows through the same stores
    stored_model = read_lm_model(spark, model_path)
    stored_th = read_ppl_thresholds(spark, th_path)
    want = set()
    for df, ep in ((b0, 0), (b1, 1)):
        scored = lm_score(
            df.select("doc_id", "text"), stored_model, "text", "doc_id", N_BUCKETS
        ).join(df.select("doc_id", "lang"), "doc_id")
        for r in assign_ppl_buckets(scored, stored_th).collect():
            want.add((r.doc_id, r.lang, r.bucket, ep))
    assert landed == want
    # the unknown-language doc is kept and heads (nothing outranks it yet)
    assert (20, "zz", "head", 1) in landed

    # crash-replay of epoch 0: identical partition content
    _assign_buckets_batch(b0, 0, *args)
    assert {
        (r.doc_id, r.lang, r.bucket, r.batch_id)
        for r in spark.read.parquet(out).collect()
    } == want


def test_streaming_bucket_assign_end_to_end(spark, tmp_path):
    import json

    from airbnb_cdc_spark.operators.lm import (
        ppl_tercile_thresholds,
        streaming_ppl_bucket_assign,
        write_ppl_thresholds,
    )

    model = _model(spark, [(0, "spark shuffle join plan")])
    model_path = str(tmp_path / "model")
    write_lm_model(model, model_path)
    fit_docs = spark.createDataFrame(
        [(i, "a", f"spark shuffle join w{i}") for i in range(6)],
        "doc_id long, lang string, text string",
    )
    scored_fit = lm_score(
        fit_docs.select("doc_id", "text"), model, "text", "doc_id", N_BUCKETS
    ).join(fit_docs.select("doc_id", "lang"), "doc_id")
    th_path = str(tmp_path / "thresholds")
    write_ppl_thresholds(ppl_tercile_thresholds(scored_fit), th_path)

    feed = tmp_path / "feed"
    feed.mkdir()
    for fi, rows in enumerate(
        [
            [{"doc_id": 1, "lang": "a", "text": "spark shuffle join"}],
            [{"doc_id": 2, "lang": "a", "text": "unrelated words here"}],
        ]
    ):
        with open(feed / f"f{fi}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(feed))
    )
    out = str(tmp_path / "buckets")
    q = streaming_ppl_bucket_assign(
        stream,
        model_path,
        th_path,
        out,
        n_buckets=N_BUCKETS,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    assert {r.bucket for r in rows} <= {"head", "middle", "tail"}
