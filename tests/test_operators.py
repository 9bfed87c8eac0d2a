"""Unit tests for the row-level operators (SURVEY.md §2.2-2.5) on tiny
in-memory frames — including the reference's null/cast edge cases."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.aggregate import AGG_COLUMNS, booking_customer_aggregation
from airbnb_cdc_spark.operators.alter_row import with_action_flags
from airbnb_cdc_spark.operators.lookup import latest_per_key, lookup_latest
from airbnb_cdc_spark.operators.project import cast_to_contract, select_columns
from airbnb_cdc_spark.operators.split import conditional_split

D = datetime.date


def test_conditional_split_null_goes_to_rest(spark):
    """ADF 2-way disjoint split: NULL condition rows fall to the else
    branch (dataflow:106-107) — a naive ~cond filter would drop them."""
    df = spark.createDataFrame(
        [
            Row(id=1, checkin=D(2025, 1, 10), checkout=D(2025, 1, 5)),   # bad
            Row(id=2, checkin=D(2025, 1, 10), checkout=D(2025, 1, 12)),  # ok
            Row(id=3, checkin=D(2025, 1, 10), checkout=None),            # NULL → ok
        ]
    )
    bad, ok = conditional_split(df, F.col("checkout") < F.col("checkin"))
    assert [r.id for r in bad.collect()] == [1]
    assert sorted(r.id for r in ok.collect()) == [2, 3]
    assert bad.count() + ok.count() == df.count()  # disjoint + complete


def test_cast_to_contract_lenient(spark):
    """allowDataTruncation: unparseable values become NULL, not errors
    (pipeline/New_LoadCustomerDim.json:94-101)."""
    df = spark.createDataFrame(
        [Row(cid="12", amt="99.955", day="2025-01-05", junk="xx"),
         Row(cid="not-a-number", amt=None, day="nope", junk="yy")]
    )
    out = cast_to_contract(
        df, {"cid": "int", "amt": "decimal(12,2)", "day": "date"}
    ).collect()
    assert out[0].cid == 12 and out[0].day == D(2025, 1, 5)
    assert out[0].amt == Decimal("99.96")
    assert out[1].cid is None and out[1].day is None and out[1].junk == "yy"


def test_select_columns_rename(spark):
    df = spark.createDataFrame([Row(a=1, b="x", c=2.0)])
    out = select_columns(df, {"b": "name", "a": "id"})
    assert out.columns == ["name", "id"]


def test_latest_per_key_and_tiebreak(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", v=1, ver=10, tb=1),
            Row(k="a", v=2, ver=20, tb=1),
            Row(k="a", v=3, ver=20, tb=2),  # tie on ver → tb wins
            Row(k="b", v=4, ver=5, tb=1),
        ]
    )
    out = {r.k: r.v for r in latest_per_key(df, ["k"], "ver", ["tb"]).collect()}
    assert out == {"a": 3, "b": 4}


def test_lookup_latest_left_join_prefix(spark):
    left = spark.createDataFrame([Row(k="a", x=1), Row(k="z", x=2)])
    right = spark.createDataFrame(
        [Row(k="a", ver=1, payload="old"), Row(k="a", ver=2, payload="new")]
    )
    out = {r.k: r for r in lookup_latest(left, right, ["k"], "ver").collect()}
    assert out["a"].t_payload == "new"
    assert out["z"].t_payload is None


def test_alter_row_flags(spark):
    df = spark.createDataFrame([Row(k="a", t_key="a"), Row(k="b", t_key=None)])
    out = {r.k: r._action for r in with_action_flags(df, "t_key").collect()}
    assert out == {"a": "update", "b": "insert"}


def test_aggregation_measures_tiny(spark):
    """Hand-checked 17-measure aggregation incl. the ELSE-less AVG edge
    (A11/A12: average over the matching subset only) and NULL amounts."""
    fact = spark.createDataFrame(
        [
            Row(customer_id=1, status="Confirmed", total_amount=100.0,
                booking_created_at=D(2025, 1, 1), nights=2),
            Row(customer_id=1, status="Cancelled", total_amount=50.0,
                booking_created_at=D(2025, 1, 5), nights=4),
            Row(customer_id=2, status="Confirmed", total_amount=None,
                booking_created_at=D(2025, 1, 3), nights=None),
        ]
    )
    dim = spark.createDataFrame(
        [Row(customer_id=1, country="FR"), Row(customer_id=2, country="FR"),
         Row(customer_id=3, country="JP")]
    )
    rows = booking_customer_aggregation(fact, dim).collect()
    assert len(rows) == 1  # inner join: JP has no bookings
    r = rows[0]
    assert list(rows[0].asDict()) == list(AGG_COLUMNS)
    assert r.country == "FR"
    assert r.total_bookings == 3
    assert r.confirmed_bookings == 2 and r.cancelled_bookings == 1
    assert r.total_amount == 150.0
    assert r.confirmed_amount == 100.0 and r.cancelled_amount == 50.0
    assert abs(r.cancellation_rate - 1 / 3) < 1e-12
    assert r.last_booking_date == D(2025, 1, 5)
    assert r.first_booking_date == D(2025, 1, 1)
    assert r.avg_amount == 50.0
    assert r.confirmed_avg_amount == 50.0  # (100+0)/2 — NULL coalesced to 0
    assert r.cancelled_avg_amount == 50.0
    assert r.min_amount == 0.0 and r.max_amount == 100.0
    assert r.distinct_customers == 2
    assert r.avg_stay_duration == 2.0


def test_aggregation_empty_group_avgs_null(spark):
    """No cancelled rows → cancelled_avg_amount NULL (AVG over empty)."""
    fact = spark.createDataFrame(
        [Row(customer_id=1, status="Confirmed", total_amount=10.0,
             booking_created_at=D(2025, 1, 1), nights=1)]
    )
    dim = spark.createDataFrame([Row(customer_id=1, country="FR")])
    r = booking_customer_aggregation(fact, dim).collect()[0]
    assert r.cancelled_avg_amount is None
    assert r.cancelled_bookings == 0 and r.cancelled_amount == 0.0


def test_archive_rewrite_quoted(spark, tmp_path):
    """S6 fidelity: rewrite_quoted archives a re-quoted CSV (every field
    quoted, reference's quoteAllText) and deletes the raw file; the
    archived file round-trips through the dialect reader."""
    from airbnb_cdc_spark.sources.customer_csv import archive_file, read_customer_csv
    from tests.fixtures import write_customer_csvs

    raw, archive = tmp_path / "raw", tmp_path / "archive"
    write_customer_csvs(raw, n_base=10)
    name = "customer_feed_00_base.csv"
    before = read_customer_csv(spark, str(raw / name)).collect()

    archive_file(spark, str(raw), str(archive), name, rewrite_quoted=True)
    assert not (raw / name).exists()
    assert (archive / name).is_file()

    text = (archive / name).read_text().splitlines()
    # every data field is quoted (quoteAllText: true): re-serializing the
    # parsed fields with QUOTE_ALL reproduces the line byte-for-byte
    import csv as _csv
    import io

    for line in text[1:4]:
        fields = next(_csv.reader([line]))
        buf = io.StringIO()
        _csv.writer(buf, quoting=_csv.QUOTE_ALL, lineterminator="").writerow(fields)
        assert buf.getvalue() == line

    after = read_customer_csv(spark, str(archive / name)).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_asof_join_edges(spark):
    """As-of join: inclusivity at equal ts, NULL fill when no prior row,
    struct fill never mixes columns from different right rows."""
    from datetime import datetime

    from airbnb_cdc_spark.operators.asof import asof_join

    t = lambda m: datetime(2025, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(5), "A"), (1, t(10), "B"), (2, t(1), "C"), (3, t(9), "D")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(5), "r5", None), (1, t(7), "r7", 70), (2, t(2), "r2", 20)],
        "k long, ts timestamp, name string, score int",
    )
    out = {
        (r.k, r.tag): (r.r_name, r.r_score)
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    assert out[(1, "A")] == ("r5", None)  # equal ts matches (inclusive);
    # r5's NULL score must NOT be backfilled from another row
    assert out[(1, "B")] == ("r7", 70)  # latest <= 10
    assert out[(2, "C")] == (None, None)  # right row is later than left
    assert out[(3, "D")] == (None, None)  # key with no right rows at all


def test_asof_join_null_ts(spark):
    """SQL ASOF NULL semantics: a NULL-ts right row never fills anyone;
    a NULL-ts left row matches nothing."""
    from datetime import datetime

    from airbnb_cdc_spark.operators.asof import asof_join

    t = lambda m: datetime(2025, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, None, "A"), (1, t(10), "B")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, None, "rnull"), (1, t(5), "r5")], "k long, ts timestamp, name string"
    )
    out = {
        (r.k, r.tag): r.r_name
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    assert out[(1, "A")] is None  # NULL left ts: unmatched, not filled by rnull
    assert out[(1, "B")] == "r5"  # NULL right row invisible to ordering


def test_ivf_recall_at_nprobe8(spark):
    """The pinned high-recall IVF configuration reaches >= 0.8 recall@5
    against the exact brute-force baseline at sf0.01."""
    from airbnb_cdc_spark import queries as q

    sf = "/root/testdata/sf0.01"
    truth = {
        (r.query_id, r.neighbor_id)
        for r in q.QUERIES["ann_topk_bruteforce"](spark, sf).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in q.QUERIES["ann_topk_ivf_recall"](spark, sf).collect()
    }
    assert truth, "baseline produced no rows"
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} < 0.8"


def test_connected_components(spark):
    """Min-label propagation matches brute-force union-find, including
    multi-hop chains and singleton-free node sets."""
    import random

    from airbnb_cdc_spark.operators.graph import connected_components

    rng = random.Random(7)
    nodes = list(range(40))
    edges = [(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.05]
    edges += [(50, 51), (51, 52), (52, 53)]  # a 4-node chain (diameter 3)

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    # canonical: min node per component
    expected = {}
    for a, b in edges:
        for x in (a, b):
            expected[x] = None
    for x in expected:
        r = find(x)
        while parent[r] != r:
            r = parent[r]
        expected[x] = r

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    # small-graph fast path (driver union-find)
    comp, converged = connected_components(df, max_iters=15)
    assert converged
    got = {r.node: r.component for r in comp.collect()}
    assert got == expected
    # distributed min-label loop (force past the threshold)
    comp2, converged2 = connected_components(
        df, max_iters=15, small_graph_threshold=0
    )
    assert converged2
    got2 = {r.node: r.component for r in comp2.collect()}
    assert got2 == expected


def test_canonicalize_keys_symspell_block_is_lossless(spark):
    """Deletion-key blocking must catch every distance-1 pair shape:
    substitution, insertion/deletion (including at the first char),
    and exact equality; distance-2 pairs stay separate."""
    from airbnb_cdc_spark.operators.entity import canonicalize_keys

    rows = [
        (1, "red"),
        (2, "red"),     # exact dup
        (3, "rad"),     # substitution
        (4, "ed"),      # first-char deletion
        (5, "reds"),    # trailing insertion
        (6, "blue"),    # unrelated
        (7, "rzzd"),    # distance 2 from red — must NOT merge
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r.id: r.canonical for r in canonicalize_keys(df, "name").collect()}
    # single-hop neighborhoods (transitive closure is
    # connected_components' job): red sees {red, rad, ed, reds} -> ed;
    # rad sees only {rad, red} -> rad; reds sees {reds, red} -> red.
    assert got[1] == got[2] == got[4] == "ed"
    assert got[3] == "rad"
    assert got[5] == "red"
    assert got[6] == "blue"
    assert got[7] == "rzzd"


def test_canonicalize_keys_null_passthrough(spark):
    """NULL keys never equi-join; they must pass through with a NULL
    canonical instead of being dropped (round-3 ADVICE)."""
    from airbnb_cdc_spark.operators.entity import canonicalize_keys

    rows = [(1, "red"), (2, None), (3, "rad")]
    df = spark.createDataFrame(rows, "id int, name string")
    out = {r.id: r.canonical for r in canonicalize_keys(df, "name").collect()}
    assert out == {1: "rad", 2: None, 3: "rad"}


def test_archive_rewrite_failure_keeps_old_archive(spark, tmp_path):
    """Failure injection: when the quoted rewrite fails (unreadable raw
    file), the previous archive copy must survive and no _tmp_ dir may
    be left behind."""
    import pytest as _pytest

    from airbnb_cdc_spark.sources.customer_csv import archive_file
    from tests.fixtures import write_customer_csvs

    raw, archive = tmp_path / "raw", tmp_path / "archive"
    write_customer_csvs(raw, n_base=5)
    name = "customer_feed_00_base.csv"
    archive_file(spark, str(raw), str(archive), name, rewrite_quoted=True)
    old_bytes = (archive / name).read_bytes()

    # raw file is gone → the rewrite fails before any swap
    with _pytest.raises(Exception):
        archive_file(spark, str(raw), str(archive), name, rewrite_quoted=True)
    assert (archive / name).read_bytes() == old_bytes
    assert not list(archive.glob("_tmp_*"))


def test_cache_scope_releases_only_inner(spark):
    """cache_scope must unpersist frames persisted inside the scope and
    leave earlier registrations cached (concurrent-consumer safety)."""
    from airbnb_cdc_spark.session import cache_scope, persist_tracked, release_cached

    outer = persist_tracked(spark.range(100).selectExpr("id", "id * 2 AS v"))
    outer.count()
    with cache_scope():
        inner = persist_tracked(spark.range(50).selectExpr("id", "id * 3 AS w"))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory  # released by scope exit
    assert outer.storageLevel.useMemory      # untouched
    release_cached()
    assert not outer.storageLevel.useMemory


def test_repetition_stats_brute_force(spark):
    """repetition_ratio must equal 1 - distinct/total trigrams, with
    short docs (< n tokens) scoring exactly 0."""
    from airbnb_cdc_spark.operators.text import repetition_stats

    rows = [
        (1, "a b c a b c a b c"),          # trigrams repeat heavily
        (2, "one two three four five"),    # all trigrams unique
        (3, "tiny doc"),                   # < 3 tokens -> no trigrams
        (4, "x x x x x x"),                # single repeated trigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}

    def brute(text):
        t = text.lower().split()
        g = [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
        total, distinct = len(g), len(set(g))
        return total, distinct, 0.0 if not g else 1.0 - distinct / total

    for doc_id, text in rows:
        total, distinct, ratio = brute(text)
        r = got[doc_id]
        assert (r.n_ngrams, r.n_distinct_ngrams) == (total, distinct)
        assert abs(r.repetition_ratio - ratio) < 1e-12
        assert r.is_repetitive == int(ratio > 0.2)


def test_pack_sequences_offsets_and_chunks(spark):
    """Offsets are the per-shard running sum of earlier docs' tokens and
    seq_id chunks them by the budget; shards pack independently."""
    from airbnb_cdc_spark.operators.sampling import pack_sequences

    rows = [
        (1, "s1", 4), (2, "s1", 5), (3, "s1", 3), (4, "s1", 9),
        (5, "s2", 10), (6, "s2", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    out = {
        r.doc_id: r
        for r in pack_sequences(
            df, "shard", "doc_id", F.col("n"), budget=8, id_col="doc_id"
        ).collect()
    }
    # s1 offsets: 0, 4, 9, 12 -> seqs 0, 0, 1, 1 ; s2: 0, 10 -> 0, 1
    expect = {1: (0, 0), 2: (4, 0), 3: (9, 1), 4: (12, 1), 5: (0, 0), 6: (10, 1)}
    for doc_id, (off, seq) in expect.items():
        assert (out[doc_id].token_offset, out[doc_id].seq_id) == (off, seq)
        assert out[doc_id].n_tokens == dict((r[0], r[2]) for r in rows)[doc_id]


def test_pack_sequences_partition_invariant(spark):
    """Packing must be a pure function of (shard, order) — identical
    output no matter how the input happens to be partitioned."""
    from airbnb_cdc_spark.operators.sampling import pack_sequences

    rows = [(i, f"s{i % 3}", (i * 7) % 11 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    outs = []
    for parts in (1, 7):
        out = pack_sequences(
            df.repartition(parts), "shard", "doc_id", F.col("n"), budget=16
        )
        outs.append(sorted(tuple(r) for r in out.collect()))
    assert outs[0] == outs[1]


def test_persisted_ivf_index_matches_in_session(spark, tmp_path):
    """build_ivf_index + query_ivf_index must reproduce ivf_topk exactly
    AND read only the probed cid= partitions from disk."""
    import os

    from airbnb_cdc_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        query_ivf_index,
    )
    from airbnb_cdc_spark.session import load_table, release_cached

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") % 250 == 0)  # 2 queries
    idx = str(tmp_path / "ivf")

    build_ivf_index(emb, idx)
    from_index = query_ivf_index(spark, idx, queries, k=5, nprobe=2)
    in_session = ivf_topk(emb, queries, k=5, nprobe=2)
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, in_session.collect())
    )

    # partition pruning: the lists relation is BUILT from only the
    # probed cid= directories (_read_lists: 2 queries x nprobe 2 = at
    # most 4 of the ~14 list partitions), so inputFiles() itself now
    # proves both the pruned data read AND the pruned LISTING.
    import re

    n_parts = len(
        [d for d in os.listdir(idx + "/lists") if d.startswith("cid=")]
    )
    lists_files = [f for f in from_index.inputFiles() if "/lists/" in f]
    assert lists_files, "lists scan reads no list directory"
    probed = {re.search(r"cid=(\d+)", f).group(1) for f in lists_files}
    assert len(probed) <= 4 < n_parts, (
        f"expected <=4 probed of {n_parts} partitions, got {sorted(probed)}"
    )
    release_cached()


def test_cms_merge_and_overestimate(spark):
    """The count-min sketch's two load-bearing claims: (a) MERGEABLE —
    sketches of two corpus halves, unioned and re-summed on (j, bucket),
    equal the whole-corpus sketch cell-for-cell; (b) point estimates
    never under-count."""
    from airbnb_cdc_spark.operators.sketch import cms_from_counts, cms_lookup
    from airbnb_cdc_spark.functions.textfns import tokens
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    whole = cms_from_counts(vocab, "token", "c", depth=4, width=64)

    halves = [
        docs.filter(F.col("doc_id") % 2 == r)
        .select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        for r in (0, 1)
    ]
    merged = (
        cms_from_counts(halves[0], "token", "c", depth=4, width=64)
        .unionByName(cms_from_counts(halves[1], "token", "c", depth=4, width=64))
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )

    # width 64 forces collisions on this vocab: estimates must only ever
    # exceed truth, and at least one must (collision really happened)
    est = cms_lookup(whole, vocab.select("token"), "token", depth=4, width=64)
    joined = vocab.join(est, "token").select("c", "cms_estimate").collect()
    assert all(r.cms_estimate >= r.c for r in joined)
    assert any(r.cms_estimate > r.c for r in joined)


def test_kmv_intersection_accuracy(spark):
    """Controlled overlap: groups a = users [0, 1000), b = [500, 1500)
    → exact intersection 500. The md5 hashes are fixed, so the KMV
    estimate is one deterministic number; k=256 gives σ ≈ 1/sqrt(k-2)
    ≈ 6.3% and the observed error must sit well inside a few σ."""
    from airbnb_cdc_spark.operators.sketch import (
        kmv_intersection_estimate,
        kmv_minhashes,
    )

    rows = [(u, "a") for u in range(1000)] + [
        (u, "b") for u in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "user_id long, grp string")
    sk = kmv_minhashes(df, "user_id", "grp", k=256)
    est = kmv_intersection_estimate(sk, "a", "b", k=256).collect()[0].est_intersection
    assert abs(est - 500) / 500 < 0.25, f"estimate {est} vs exact 500"


def test_sessionize_subsecond_gap_boundary(spark):
    """Gap decided in exact microseconds: 1800.5s apart splits the
    session, 1799.5s does not — whole-second truncation (the pre-r6
    unix_timestamp formulation) got both wrong within 1s of the
    threshold."""
    from datetime import datetime, timedelta

    from airbnb_cdc_spark.operators.sessionize import sessionize_batch

    t0 = datetime(2025, 5, 1, 0, 0, 0, 200000)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + timedelta(seconds=1800, microseconds=500000)),  # split
        (3, 2, t0),
        (4, 2, t0 + timedelta(seconds=1799, microseconds=500000)),  # same
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    out = sessionize_batch(events, gap_minutes=30)
    per_user = {}
    for r in out.collect():
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 1]
    assert per_user[2] == [2]


def test_review_guards_raise(spark):
    """The r6 review-pass guards: misuse fails fast instead of
    silently corrupting results."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.project import cast_to_contract, select_columns
    from airbnb_cdc_spark.operators.skew import salted_join, with_salt
    from airbnb_cdc_spark.operators.split import conditional_split

    df = spark.createDataFrame([(1, "a")], "id long, v string")

    with _pytest.raises(TypeError, match="bare string"):
        select_columns(df, "id")
    with _pytest.raises(ValueError, match="absent from frame"):
        cast_to_contract(df, {"id": "long", "missing_col": "string"})
    with _pytest.raises(ValueError, match="deterministic"):
        conditional_split(df, F.rand() < 0.5)
    with _pytest.raises(ValueError, match="inner"):
        salted_join(df, df, ["id"], how="full")
    with _pytest.raises(ValueError, match="__salt"):
        with_salt(df.withColumn("__salt", F.lit(1)), 4)


def test_rank_bounded_order_and_null_keys(spark):
    """rank_bounded attaches the 1-based rank of the (negated-DESC)
    order over a limit-cut frame, with NULL order keys ranked LAST —
    the desc-nulls-last default of the row_number window it replaces."""
    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.aggregate import rank_bounded

    df = spark.createDataFrame(
        [("a", 3.0), ("b", None), ("c", 9.0), ("d", 5.0)],
        "k string, score double",
    )
    top = df.orderBy(F.col("score").desc_nulls_last(), F.col("k").asc()).limit(4)
    got = {
        (r.k, r.rnk)
        for r in rank_bounded(
            top, (-F.col("score")).alias("__o1"), F.col("k")
        ).collect()
    }
    assert got == {("c", 1), ("d", 2), ("a", 3), ("b", 4)}


def test_chunk_dedup_interval_merge(spark):
    """Pinned interval semantics: within-doc repetition collapses the
    overlapping dup chunks into ONE merged span that starts at the
    first non-keeper chunk; a cross-doc copy at a distance stays a
    separate span from an unrelated one (gap > 0 splits)."""
    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.dedup import chunk_dedup_intervals

    # window=4, stride=2 keeps the arithmetic inspectable.
    # doc 0: 10 identical tokens -> 4 chunks [0,4)[2,6)[4,8)[6,10),
    #        all hash-equal; keeper is chunk 0, dups idx 1..3 coalesce
    #        into ONE merged span [2,10).
    # doc 1: 12 tokens — copies the all-x window at the head and the
    #        tail with a unique middle -> 5 chunks; idx 0 ([0,4)) and
    #        idx 4 ([8,12)) are dups of doc 0's keeper, the middle
    #        chunks carry u-tokens and stay unique -> two separate
    #        spans (the gap keeps them apart).
    d0 = " ".join(["x"] * 10)
    d1 = "x x x x u1 u2 u3 u4 x x x x"
    df = spark.createDataFrame(
        [(0, d0), (1, d1)], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.span_start, r.span_end, r.n_chunks)
        for r in chunk_dedup_intervals(df, window=4, stride=2).collect()
    }
    assert out == {
        (0, 2, 10, 3),
        (1, 0, 4, 1),
        (1, 8, 12, 1),
    }


def test_winnowing_detects_shifted_copy(spark):
    """The winnowing guarantee (Schleimer et al.): any shared substring
    of >= w + k - 1 tokens contributes at least one shared fingerprint
    REGARDLESS of its offset in either document — the shifted-copy case
    fixed-stride chunking misses. Also: unrelated docs share nothing."""
    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.dedup import winnow_pairs

    boiler = "c1 c2 c3 c4 c5 c6 c7 c8"  # 8 tokens >= w+k-1 = 6
    rows = [
        (0, f"{boiler} a1 a2 a3 a4"),          # copy at offset 0
        (1, f"b1 b2 b3 b4 b5 {boiler} b6"),    # same copy at offset 5
        (2, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),     # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(df, min_shared=1).collect()
    }
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_ivf_append_equals_full_build_and_is_idempotent(spark, tmp_path):
    """append_ivf_index's load-bearing claims: (a) build-on-400 +
    append-100 answers queries IDENTICALLY to a one-shot build on all
    500 (the centroid residue class 3 mod 37 tops out at vec_id 484,
    so both layouts share the exact centroid set and assignments);
    (b) re-appending the same batch is a no-op (skip_existing's
    insert-only-merge idempotence — the crash-replay contract)."""
    from airbnb_cdc_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )
    from airbnb_cdc_spark.session import load_table, release_cached

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    base, batch = (
        emb.filter(F.col("vec_id") < 490),
        emb.filter(F.col("vec_id") >= 490),
    )
    queries = emb.filter(F.col("vec_id") % 250 == 1)
    full_idx, incr_idx = str(tmp_path / "full"), str(tmp_path / "incr")

    build_ivf_index(emb, full_idx)
    build_ivf_index(base, incr_idx)
    n1 = append_ivf_index(spark, incr_idx, batch)
    assert n1 == 10

    expect = sorted(
        map(tuple, query_ivf_index(spark, full_idx, queries, k=5, nprobe=2).collect())
    )
    got = sorted(
        map(tuple, query_ivf_index(spark, incr_idx, queries, k=5, nprobe=2).collect())
    )
    assert got == expect

    # replaying the identical batch appends nothing and changes nothing
    n2 = append_ivf_index(spark, incr_idx, batch)
    assert n2 == 0
    again = sorted(
        map(tuple, query_ivf_index(spark, incr_idx, queries, k=5, nprobe=2).collect())
    )
    assert again == expect
    release_cached()
