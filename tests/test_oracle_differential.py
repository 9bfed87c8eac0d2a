"""Randomized Spark-vs-DuckDB differential tests: the newest
query/oracle pairs must agree on GENERATED corpora, not just the
driver's fixed one — catches formula drift on edge shapes (empty
strings, single-token docs, whitespace runs, skewed sources)."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from airbnb_cdc_spark import queries as Q

# "good"/"bad" are in the sentiment lexicon, so doc_sentiment draws
# nonzero polarity; "order"/"fast" are the frozen bpe_apply rule
# tokens, so merge rules fire (incl. self-pair runs) in random draws;
# the other queries are content-agnostic.
WORDS = ["agg", "row", "scan", "the", "a", "of", "and", "is", "to", "in", "zz",
         "good", "bad", "order", "fast"]


@st.composite
def _docs_table(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for i in range(n):
        words = draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=30))
        text = draw(st.sampled_from([" ", "  ", "\t"])).join(words)
        lang = draw(st.sampled_from(["en", "fr"]))
        source = draw(st.sampled_from(["s1", "s2", "s3"]))
        rows.append((i, text, lang, source, len(text)))
    return rows


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 10))
    return str(v)


def _run_both(spark, tmp_path, rows, qname):
    pdir = tmp_path / "sf"
    pdir.mkdir(exist_ok=True)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(pdir / "documents.parquet"))

    sdf = Q.QUERIES[qname](spark, str(pdir))
    s_cols = sorted(sdf.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{pdir}/documents.parquet/*.parquet'"
    )
    res = con.execute(Q.ORACLE_SQL[qname])
    d_cols = sorted(c[0] for c in res.description)
    assert s_cols == d_cols, f"{qname}: schema {s_cols} vs {d_cols}"
    # align both sides' column order to sorted names, like the driver
    d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
    d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
    s_idx = [sdf.columns.index(name) for name in d_cols]
    s_rows = sorted(
        tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect()
    )
    assert s_rows == d_rows, f"{qname}: value mismatch"


DIFF_QUERIES = [
    "repetition_filter",
    "pack_sequences",
    "oov_rate",
    "corpus_prep_summary",
    "text_stats",
    # r6 additions — all documents-only, so the same generator covers
    # them (bigram_pmi's min_count means tiny corpora usually produce
    # empty results: the agreement-on-empty is itself the check).
    "dedup_keep_canonical",
    "bigram_pmi",
    # r8: chunk-level exact dedup — random short docs force shared and
    # repeated chunks through the keeper choice
    "chunk_dedup_spans",
    "chunk_dedup_summary",
    "chunk_dedup_intervals",
    # r8: winnowing — random short docs exercise the truncated-window
    # and shared-substring paths
    "winnow_fingerprints",
    "winnow_pairs",
    # r8: PII scrub over word-only random text (agreement-on-no-match);
    # forced matches live in test_pii_pinned_rows
    "pii_scrub",
    "mixture_by_token_budget",
    "token_count_cms",
    "doc_sentiment",
    "weighted_sample_by_length",
    # Arrow mapInPandas legs: deterministic fake payloads derive from
    # text, so the whole batch pipeline is differential-checkable
    "multimodal_features",
    "mm_resize",
    "mm_frame_sample",
    # r9: cluster-balanced sampling — tiny corpora draw single-doc and
    # shared-fingerprint clusters, exercising the per-cluster cut and
    # the md5 pick order against the window-rank oracle
    "diversity_sample_by_cluster",
    # r10: web-corpus stage — random (doc_id, source) draws vary which
    # planted URL-noise dimensions fire per doc (case/www/port/slash/
    # tracking/fragment), differentially checking the canonicalizer
    # against the analytic ground-truth form; the domain cap exercises
    # salted topk vs the window-rank oracle on skewed source draws
    "url_canonical_dedup",
    "domain_capped_sample",
    # r10: incremental near-dup from stored signatures — random tiny
    # corpora exercise the empty-batch, no-candidate, and tie-break
    # paths of the signature-agreement verify
    "incremental_minhash_neardup",
    # r10: concatenation packing — random token counts exercise docs
    # spanning 0, 1, and multiple sequence boundaries and the
    # empty-doc drop against the window running-sum oracle
    "pack_concat_split",
    # r10: boilerplate strip — random short docs plant cross-doc
    # repeated segments (small word pool), exercising the all-copies
    # drop, the everything-stripped doc, and the empty-doc row
    "boilerplate_strip",
    # r10: BM25 retrieval — the query terms ('the','scan','zz') are in
    # WORDS, so random corpora draw real tf/df spreads; checks the
    # fixed-order double score is bit-identical cross-engine (repr
    # compare through _norm's 10-place round, plus the driver's strict
    # hash at sf0.01)
    "bm25_topk",
    # r10: quality chain — random corpora drive the too_short /
    # low_stopword / low_distinct / repetitive legs and the CASE
    # short-circuit on empty docs
    "quality_filter_chain",
    # r10: length buckets — random token counts land in the smallest
    # buckets and the empty-doc row; boundary equality (n == bucket)
    # draws at n=16 exercise the <=-vs-< edge on both engines
    "length_bucket_stats",
    # r10: leakage-safe split — random corpora draw multi-doc near-dup
    # clusters AND singletons, checking cluster inheritance and the
    # coalesce-to-own-id leg against the recursive-closure oracle
    "leakage_safe_split",
    # r10: DSIR importance selection — random corpora draw an EMPTY
    # target set (sources s1-s3 never match src0), all-stopword docs,
    # and tiny vocabularies, exercising the Laplace smoothing and the
    # dense-bucket default score path of the integer ratio
    "dsir_select",
    # r10: vocab coverage — random corpora exercise the clamp
    # (vocab < requested size), count ties broken by token order, and
    # the empty-corpus 0-row contract on both engines
    "vocab_coverage",
    # r10: temperature mixture — random lang draws exercise 1-group
    # and 2-group apportionment and the quota-sums-to-budget invariant
    # (checked exactly by the hash compare, all-integer arithmetic)
    "temperature_mixture",
    # r10: dedup yield report — random corpora draw singleton-only
    # histograms and multi-size cluster mixes against the
    # recursive-closure oracle
    "neardup_cluster_sizes",
    # r10: quality-keeper apply — random corpora draw equal-length
    # cluster members (doc_id tie-break) and singleton keepers against
    # the window-rank oracle
    "keep_best_quality",
    # r10: incremental DSIR — random corpora draw empty model halves
    # (cut excludes every doc), empty batches, and batches whose
    # source never matched the target, exercising the smoothing and
    # arrival semantics
    "incremental_dsir_select",
    # r10: quota execution — random lang draws exercise quota == group
    # size and the quota-exceeds-group clamp (every member sampled)
    "temperature_mixture_sample",
    # r10: source forensics — random (source, lang) draws exercise
    # majority-lang ties (lang asc) and all-fail quality cohorts
    "source_quality_profile",
    # r10: soft dedup — random corpora draw singleton weights (1.0)
    # and multi-member clusters against the recursive-closure oracle
    "soft_dedup_weights",
    # r11: store-backed apply — each example derives, writes, and
    # reads back the component store on a fresh corpus (fresh tmp dir
    # per example, so the per-sf_dir memo never aliases), checking the
    # round-trip against the same recursive-closure oracle as
    # dedup_keep_canonical
    "components_store_apply",
    # r11: bigram-LM fluency — random corpora draw empty targets
    # (all-smoothed scores), 0/1-token docs (no transitions, absent
    # from scoring on both engines), and mean-fluency ties broken by
    # doc_id, against the exact integer transition-score replay
    "lm_quality_score",
    # r11: ...and the store round-trip variant under the half-split
    # arrival convention (empty model halves, empty batches)
    "incremental_lm_quality",
    # r11: Jelinek-Mercer interpolation — random corpora draw unseen
    # transitions between seen tokens, exercising the unigram-backoff
    # term against the two-floored-divisions replay
    "interpolated_lm_score",
    # r11: Kneser-Ney — random corpora draw unseen CONTEXTS (the
    # uc = 0 pure-continuation branch) and empty targets (NP floor)
    # against the floored-division replay
    "kneser_ney_lm_score",
    # r11: frozen-threshold bucket assignment — random corpora draw
    # sub-3-doc languages (NULL boundaries), score ties at tercile
    # edges, and empty candidate sets; the oracle computes buckets the
    # RANK way, so every passing example re-proves the equivalence
    "ppl_bucket_assign",
    # r13: fastText-style classifier selection — random corpora draw
    # an EMPTY positive class (sources s1-s3 never match src0,
    # all-Laplace weights), 0-token candidates (no verdict row), and
    # mean-margin ties broken by doc_id, against the exact integer
    # NB log-count-ratio replay; the store round-trip runs per
    # example (fresh tmp dir, so the per-sf_dir memo never aliases)
    "quality_classifier_topk",
    # r13: BPE apply with the frozen rule table — random word draws
    # exercise agreement-on-no-fire, and draws containing
    # 'order'/'fast' runs exercise the greedy non-overlap fold
    # against the sentinel-replace replay
    "bpe_apply",
]


@pytest.mark.parametrize("qname", DIFF_QUERIES)
@settings(max_examples=8, deadline=None)
@given(rows=_docs_table())
def test_oracle_differential(spark, tmp_path_factory, qname, rows):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("diff")
    try:
        _run_both(spark, tmp, rows, qname)
    finally:
        release_cached()


# -- events-table differential: the queries that went red in r4 before
# -- ever reaching a hash check get randomized cross-engine coverage.

EVENT_TYPES = ["view", "click", "purchase", "refund"]


@st.composite
def _events_table(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        # Half the draws land in a 6-minute window over <=4 users, so
        # equal-(user_id, ts) collisions occur nearly every example —
        # the tie-break class that r5's pit_state_at_purchase bug
        # (alphabetical-state vs event_id ordering) hid behind.
        if draw(st.booleans()):
            minutes = draw(st.integers(min_value=0, max_value=5))
        else:
            minutes = draw(st.integers(min_value=0, max_value=600))
        # ~1 in 8 values NULL: aggregates must skip them identically on
        # both engines (driver data has no NULL values, so only the
        # differential exercises this class)
        value = draw(
            st.one_of(
                st.none(),
                st.integers(min_value=0, max_value=400).map(lambda k: k / 4.0),
                st.integers(min_value=0, max_value=400).map(lambda k: k / 4.0),
                st.integers(min_value=0, max_value=400).map(lambda k: k / 4.0),
            )
        )
        rows.append(
            (
                i,
                f"2025-03-01 00:00:00",
                minutes,
                draw(st.integers(min_value=0, max_value=3)),
                draw(st.sampled_from(EVENT_TYPES)),
                value,
                None,
            )
        )
    return rows


EVENT_DIFF_QUERIES = [
    "events_ohlc",
    "value_histogram",
    "user_funnel",
    "scd2_user_state_history",
    "pit_state_at_purchase",
    "user_sessions",
    "events_hopping_agg",
    "event_gaps_leadlag",
    # r6: every remaining events-only asof/window consumer joins the
    # differential so equal-timestamp ties are exercised on all of them,
    # not just the family that went red in r5.
    "asof_last_view_before_purchase",
    "interval_join_attribution",
    "trailing_hour_activity",
    "events_windowed_agg",
    "cohort_retention",
    "trailing_7d_users",
    "distinct_users_kmv",
    # r10: the same sketch composed with event-time windows — random
    # day spreads draw sub-k windows (exact branch) and the k-th-min
    # estimator branch side by side
    "windowed_kmv_distinct",
    "user_overlap_kmv",
    # r6 time-series additions: forward as-of (equal-ts ties hit the
    # direction="forward" tie-break), grid resample (random gap shapes),
    # OLS trend (NULL values + single-point zero-variance keys).
    "asof_next_purchase_after_view",
    # r10: the tolerance bound — random tight timestamps draw matches
    # exactly AT the bound (inclusive <=) and far outside it
    "asof_view_within_tolerance",
    "events_resample_ffill",
    "value_trend_by_type",
    "value_outliers_by_type",
    # exact-decimal profile distances; draws without 'purchase' rows
    # exercise the empty-query-profile leg (d² degenerates to Σc²).
    "ts_profile_similarity",
    # lag pairs under the (ts, event_id) total order — forced equal-ts
    # collisions exercise the ordering directly.
    "event_transitions",
    # r9: Morton-interleave arithmetic on random (user, ts) draws —
    # NULL user_id/ts rows must drop identically on both engines.
    "zorder_events_layout",
    # r9: engine session windows — forced equal-ts collisions and
    # random gaps hit the strict > gap split and exact-microsecond
    # comparison against the lag/cumsum oracle.
    "session_window_stats",
]


def _write_events(spark, pdir, rows):
    from datetime import datetime, timedelta

    from pyspark.sql import types as T

    base = datetime(2025, 3, 1)
    data = [
        (i, base + timedelta(minutes=m), u, et, v, props)
        for (i, _b, m, u, et, v, props) in rows
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.createDataFrame(data, schema).coalesce(1).write.mode("overwrite").parquet(
        str(pdir / "events.parquet")
    )


def _run_events_both(spark, tmp_path, rows, qname):
    pdir = tmp_path / "sf"
    pdir.mkdir(exist_ok=True)
    _write_events(spark, pdir, rows)

    sdf = Q.QUERIES[qname](spark, str(pdir))
    s_cols = sorted(sdf.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{pdir}/events.parquet/*.parquet'"
    )
    res = con.execute(Q.ORACLE_SQL[qname])
    d_cols = sorted(c[0] for c in res.description)
    assert s_cols == d_cols, f"{qname}: schema {s_cols} vs {d_cols}"
    d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
    d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
    s_idx = [sdf.columns.index(name) for name in d_cols]
    s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
    assert s_rows == d_rows, f"{qname}: value mismatch"


@pytest.mark.parametrize("qname", EVENT_DIFF_QUERIES)
@settings(max_examples=6, deadline=None)
@given(rows=_events_table())
def test_events_oracle_differential(spark, tmp_path_factory, qname, rows):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("ediff")
    try:
        _run_events_both(spark, tmp, rows, qname)
    finally:
        release_cached()


# The minimal counterexample from r5's pit_state_at_purchase bug, pinned
# as a deterministic regression: a 'view' and a 'purchase' for the same
# user at the SAME timestamp. The oracle's LEAD-interval semantics give
# the newest same-ts change point (max event_id) the non-empty validity
# interval; any other tie-break (r5 used alphabetical state) diverges.
_TIE_ROWS = [
    (0, "2025-03-01 00:00:00", 3, 1, "view", 1.0, None),
    (1, "2025-03-01 00:00:00", 3, 1, "purchase", 2.0, None),
    (2, "2025-03-01 00:00:00", 3, 1, "refund", 3.0, None),
    (3, "2025-03-01 00:00:00", 7, 2, "purchase", 4.0, None),
    (4, "2025-03-01 00:00:00", 7, 2, "view", 5.0, None),
]

# Grid-edge ties (r6 ask #7): events EXACTLY on the hour grid the
# resample/OHLC/windowed family buckets by, with equal-(user, ts)
# collisions AND equal values at the edge — open/close by total order
# (events_ohlc), lag pairs (event_transitions), and the bucket-boundary
# reading pick (events_resample_ffill) all have their tie-break forced,
# plus a NULL value sitting on an edge (the reading must skip it, the
# gap logic must not).
_TIE_ROWS_GRID = [
    (0, "2025-03-01 00:00:00", 0, 1, "view", 10.0, None),
    (1, "2025-03-01 00:00:00", 0, 1, "purchase", 10.0, None),
    (2, "2025-03-01 00:00:00", 60, 1, "view", 20.0, None),
    (3, "2025-03-01 00:00:00", 60, 1, "view", 20.0, None),
    (4, "2025-03-01 00:00:00", 60, 2, "purchase", None, None),
    (5, "2025-03-01 00:00:00", 120, 2, "view", 5.0, None),
    (6, "2025-03-01 00:00:00", 180, 2, "view", 5.0, None),
    (7, "2025-03-01 00:00:00", 180, 2, "refund", 5.0, None),
]


@pytest.mark.parametrize("rows", [_TIE_ROWS, _TIE_ROWS_GRID], ids=["same_ts", "grid_edge"])
@pytest.mark.parametrize("qname", EVENT_DIFF_QUERIES)
def test_events_equal_timestamp_ties(spark, tmp_path_factory, qname, rows):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("etie")
    try:
        _run_events_both(spark, tmp, rows, qname)
    finally:
        release_cached()


# -- lookup (customer x events) ties: latest-per-key must pick the same
# -- row as the oracle's ROW_NUMBER(ORDER BY ts DESC, event_id DESC)
# -- when a user's newest events share a timestamp, and customers with
# -- no events must keep NULL lookup columns.


@settings(max_examples=6, deadline=None)
@given(rows=_events_table(), n_cust=st.integers(min_value=1, max_value=6))
def test_lookup_latest_event_ties(spark, tmp_path_factory, rows, n_cust):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("lkdiff")
    pdir = tmp / "sf"
    pdir.mkdir()
    _write_events(spark, pdir, rows)
    customers = [
        (i, f"Customer#{i}", 0, 0.0, "SEG") for i in range(n_cust)
    ]
    spark.createDataFrame(
        customers,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(pdir / "customer.parquet"))

    try:
        sdf = Q.QUERIES["lookup_latest_event"](spark, str(pdir))
        s_cols = sorted(sdf.columns)
        con = duckdb.connect()
        for t in ("events", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{pdir}/{t}.parquet/*.parquet'"
            )
        res = con.execute(Q.ORACLE_SQL["lookup_latest_event"])
        d_cols = sorted(c[0] for c in res.description)
        assert s_cols == d_cols
        d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
        d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
        s_idx = [sdf.columns.index(name) for name in d_cols]
        s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
        assert s_rows == d_rows, "lookup_latest_event: value mismatch"
    finally:
        release_cached()


# -- embeddings-table differential: integer quantization must make the
# -- cosine math engine-exact for arbitrary vectors. Values are k/8
# -- floats so quantization (x*1e6) is exact and rounding-mode
# -- differences cannot hide.

EMB_DIFF_QUERIES = [
    "ann_topk_bruteforce",
    "knn_label_vote",
    "embedding_outliers",
    "dedup_embedding_cosine",
    # r11 batch 3: SQ8 codes — the fixture's dyadic i/8 components make
    # the quantizer scale exact, every vector is a query (ids are all
    # multiples of 50), and the coarse integer scores collide
    # constantly, hammering the (score desc, neighbor id) tie-break
    "ann_topk_sq8",
    # r11 batch 3: the recall rollup joins the two rankings — tiny
    # corpora produce short top-k lists, so the denominator must count
    # actual exact pairs, not 5 * queries
    "ann_topk_sq8_recall",
]


@st.composite
def _embeddings_table(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    rows = []
    for i in range(n):
        vec = [
            draw(st.integers(min_value=-8, max_value=8)) / 8.0 for _ in range(64)
        ]
        if all(v == 0.0 for v in vec):
            vec[0] = 0.125  # zero vectors make cosine undefined
        rows.append((i * 50, vec, draw(st.integers(min_value=0, max_value=2))))
    return rows


def _run_embeddings_both(spark, tmp_path, rows, qname):
    from pyspark.sql import types as T

    pdir = tmp_path / "sf"
    pdir.mkdir(exist_ok=True)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(pdir / "embeddings.parquet")
    )

    sdf = Q.QUERIES[qname](spark, str(pdir))
    s_cols = sorted(sdf.columns)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{pdir}/embeddings.parquet/*.parquet'"
    )
    res = con.execute(Q.ORACLE_SQL[qname])
    d_cols = sorted(c[0] for c in res.description)
    assert s_cols == d_cols, f"{qname}: schema {s_cols} vs {d_cols}"
    d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
    d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
    s_idx = [sdf.columns.index(name) for name in d_cols]
    s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
    assert s_rows == d_rows, f"{qname}: value mismatch"


@pytest.mark.parametrize("qname", EMB_DIFF_QUERIES)
@settings(max_examples=6, deadline=None)
@given(rows=_embeddings_table())
def test_embeddings_oracle_differential(spark, tmp_path_factory, qname, rows):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("embdiff")
    try:
        _run_embeddings_both(spark, tmp, rows, qname)
    finally:
        release_cached()


# -- TPC-H-family differential: the lineitem/orders analytic queries on
# -- random star tables — date filters that sometimes keep nothing,
# -- orders with no lineitems, HAVING thresholds straddled, exact-
# -- decimal money on k/100 values.

LI_DIFF_QUERIES = [
    "pricing_summary",
    "linestatus_priority_class",
    "late_ship_priority_check",
    "large_orders",
    "promo_revenue_share",
    "orders_profile",
    # r6: the distributed prefix-sum consumer — random draws collide on
    # spend (totalprice is drawn at cent granularity), exercising the
    # customer_id tie-break of the global order.
    "revenue_pareto",
    # r6: quantized PageRank — random small graphs (multi-edges collapse
    # via DISTINCT, dangling customers, empty-lineitem draws) must match
    # the unrolled-CTE oracle bit-for-bit.
    "supplier_customer_pagerank",
    # r6: distributed exact deciles — duplicate prices make the
    # rank-span boundary matching non-trivial.
    "price_deciles_distributed",
    # r7: the other duplicate-price-sensitive orders consumers join the
    # differential (percentile interpolation inside duplicate spans;
    # equal-(date, key) prefix-sum ordering).
    "status_percentiles",
    "running_customer_spend",
    # the generator draws clean frames (distinct keys, in-range values,
    # resolving custkeys), so this is the agreement-on-zero leg; actual
    # violation counting is covered by test_expectations.py.
    "orders_expectations",
    # r9: the Bloom runtime filter — random tiny fact/dim draws check
    # the position arithmetic (md5-h60 % m, word/mask test) against the
    # oracle's position-set membership, including empty-dim and
    # all-match draws.
    "bloom_prune_effect",
    "bloom_semi_join_orders",
    # r11: Q13-shape — random draws produce customers whose orders are
    # ALL excluded by the priority condition (they must land in the
    # zero bucket, the left-join-vs-where trap) and empty-order draws
    "customer_order_distribution",
    # r11: Q22-shape — the fixed balances pin the positive-mean
    # threshold while random order draws decide who counts as lapsed
    # (generator dates predate the cutoff, so the anti-join keeps all;
    # the exact-decimal threshold and per-nation rollup still replay)
    "idle_customers_balance",
    # r11: Q21-shape — suppkey draws collide within orders, and equal
    # ship-date draws exercise the strict-max (n_at_max = 1) tie
    # suppression on nearly every example
    "supplier_wait_chain",
    # r11: Q17-shape — the generator's /4 quantities keep the
    # quarter-unit exactness contract; single-line parts (qty never
    # below its own average) and duplicate-quantity draws exercise the
    # strict < boundary
    "small_quantity_revenue",
    # r9: delete-1 fuzzy linkage — the fixture's "part N" names are all
    # pairwise distance 1, so probes match MULTIPLE masters and the
    # block's completeness is exercised beyond 1:1 self-matches.
    "fuzzy_link_part_names",
    # r11 batch 3: Q19-shape — the fixture's Brand#1/size-1 parts make
    # bracket 1 live while brackets 2-3 never match (the disjunction's
    # dead legs must contribute nothing), and fractional quantities
    # (x.25/x.5/x.75 from the /4 draws) exercise the BETWEEN bounds as
    # real-valued comparisons, not integer ones
    "bracket_revenue",
    # r11 batch 3: Q8-shape — supplier draws split lines between
    # NATION_0/NATION_1, exercising the conditional numerator against
    # the unconditional denominator (all-NATION_0 draws must yield
    # share 0.0, not a missing group)
    "market_share_by_year",
    # r11 batch 3: Q2-shape — repeated (part, supplier) draws collapse
    # into offers, and equal-price draws across suppliers exercise the
    # min-suppkey tie-break of the argmin
    "cheapest_supplier_per_part",
    # r11 batch 3: Q16-shape — the fixture's PROMO parts must drop at
    # the exclusion filter while STANDARD/ECONOMY survive, and repeated
    # pair draws must not inflate the distinct counts
    "supplier_variety_by_part",
    # r11 batch 3: Q20-shape — few-supplier parts make the
    # above-2x-average cut live on small draws (a single-supplier part
    # has share exactly 1x the average and must NOT pass the strict
    # inequality), and repeated (part, supplier) draws roll up first
    "outsized_supplier_share",
]

_PRIORITIES_TPCH = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@st.composite
def _tpch_tables(draw):
    n_orders = draw(st.integers(min_value=1, max_value=15))
    orders = []
    for i in range(n_orders):
        orders.append(
            (
                i,
                draw(st.integers(min_value=0, max_value=3)),
                draw(st.sampled_from(["F", "O", "P"])),
                # ~half the prices come from a 3-value pool, FORCING
                # duplicates (r6 ask #7): decile/percentile boundaries
                # then land inside duplicate spans and the rank-span /
                # tie-break logic is exercised on nearly every draw
                # (free-range cents almost never collide at n<=15).
                draw(
                    st.one_of(
                        st.sampled_from([100.0, 250.0, 250.0, 777.77]),
                        st.integers(min_value=0, max_value=99999).map(
                            lambda c: c / 100.0
                        ),
                    )
                ),
                f"1996-{draw(st.integers(min_value=1, max_value=12)):02d}-"
                f"{draw(st.integers(min_value=1, max_value=28)):02d}",
                draw(st.sampled_from(_PRIORITIES_TPCH)),
            )
        )
    n_li = draw(st.integers(min_value=0, max_value=40))
    lineitems = []
    for i in range(n_li):
        lineitems.append(
            (
                draw(st.integers(min_value=0, max_value=n_orders - 1)),
                draw(st.integers(min_value=0, max_value=3)),
                1,
                i,
                # quantities up to 120 so a 3-item order can straddle
                # large_orders' HAVING qty > 300 threshold
                draw(st.integers(min_value=1, max_value=480)) / 4.0,
                draw(st.integers(min_value=0, max_value=99999)) / 100.0,
                draw(st.integers(min_value=0, max_value=10)) / 100.0,
                draw(st.integers(min_value=0, max_value=8)) / 100.0,
                draw(st.sampled_from(["A", "N", "R"])),
                draw(st.sampled_from(["O", "F"])),
                f"199{draw(st.integers(min_value=5, max_value=8))}-"
                f"{draw(st.integers(min_value=1, max_value=12)):02d}-"
                f"{draw(st.integers(min_value=1, max_value=28)):02d}",
            )
        )
    return orders, lineitems


def _write_tpch(spark, pdir, orders, lineitems):
    from datetime import datetime

    from pyspark.sql import types as T

    o_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    o_rows = [
        (k, c, s, p, datetime.fromisoformat(d), pr)
        for (k, c, s, p, d, pr) in orders
    ]
    spark.createDataFrame(o_rows, o_schema).coalesce(1).write.parquet(
        str(pdir / "orders.parquet")
    )
    l_schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    )
    l_rows = [
        (ok, pk, sk, ln, q, ep, dc, tx, rf, ls, datetime.fromisoformat(sd))
        for (ok, pk, sk, ln, q, ep, dc, tx, rf, ls, sd) in lineitems
    ]
    spark.createDataFrame(l_rows, l_schema).coalesce(1).write.parquet(
        str(pdir / "lineitem.parquet")
    )
    parts = [
        (i, f"part {i}", "Brand#1", t, 1, 10.0)
        for i, t in enumerate(["PROMO", "STANDARD", "PROMO", "ECONOMY"])
    ]
    spark.createDataFrame(
        parts,
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(pdir / "part.parquet"))
    # acctbal straddles the bloom queries' 8000 cut: custkeys 1-2 form
    # the dim, 0/3 are non-matches — so generated orders exercise both
    # bloom hits and misses (and custkey draws of 0..3 guarantee the
    # false-positive arithmetic sees real traffic).
    custs = [
        (i, f"Customer#{i}", i % 2, [0.0, 9000.0, 8500.0, -100.0][i % 4], "SEG")
        for i in range(4)
    ]
    spark.createDataFrame(
        custs,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(pdir / "customer.parquet"))
    # r11: supplier + nation dims for the Q21/Q22-shape queries
    # (suppkeys 0-3 match the lineitem draws; two nations split the
    # customers so idle_customers_balance groups non-trivially)
    supps = [(i, f"Supplier#{i}", i % 2, 100.0) for i in range(4)]
    spark.createDataFrame(
        supps,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).coalesce(1).write.parquet(str(pdir / "supplier.parquet"))
    nations = [(0, "NATION_0", 0), (1, "NATION_1", 0)]
    spark.createDataFrame(
        nations, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.parquet(str(pdir / "nation.parquet"))
    # r11 batch 3: region dim for the Q8-shape market share (both
    # nations sit in AFRICA so every draw lands in the market; the
    # conditional num/den split is decided by the supplier draws)
    regions = [(0, "AFRICA"), (1, "AMERICA")]
    spark.createDataFrame(
        regions, "r_regionkey int, r_name string"
    ).coalesce(1).write.parquet(str(pdir / "region.parquet"))


@pytest.mark.parametrize("qname", LI_DIFF_QUERIES)
@settings(max_examples=6, deadline=None)
@given(tables=_tpch_tables())
def test_tpch_oracle_differential(spark, tmp_path_factory, qname, tables):
    from airbnb_cdc_spark.session import release_cached

    orders, lineitems = tables
    tmp = tmp_path_factory.mktemp("tpchdiff")
    pdir = tmp / "sf"
    pdir.mkdir()
    _write_tpch(spark, pdir, orders, lineitems)
    try:
        sdf = Q.QUERIES[qname](spark, str(pdir))
        s_cols = sorted(sdf.columns)
        con = duckdb.connect()
        for t in ("orders", "lineitem", "part", "customer", "supplier", "nation", "region"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{pdir}/{t}.parquet/*.parquet'"
            )
        res = con.execute(Q.ORACLE_SQL[qname])
        d_cols = sorted(c[0] for c in res.description)
        assert s_cols == d_cols, f"{qname}: schema {s_cols} vs {d_cols}"
        d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
        d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
        s_idx = [sdf.columns.index(name) for name in d_cols]
        s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
        assert s_rows == d_rows, f"{qname}: value mismatch"
    finally:
        release_cached()


# Duplicate-boundary prices, pinned deterministically (r6 ask #7): 20
# orders whose totalprice takes only TWO values, so every decile
# boundary except the middle one lands strictly INSIDE a duplicate
# span — the rank-span decile assignment, percentile interpolation
# between equal values, and the prefix-scan (date, key) tie-break all
# diverge from the oracle under any off-by-one or unstable ordering.
_DUP_PRICE_ORDERS = [
    (
        i,
        i % 3,
        ["F", "O"][i % 2],
        100.0 if i < 12 else 500.0,
        f"1996-01-{(i % 4) + 1:02d}",
        _PRIORITIES_TPCH[i % 5],
    )
    for i in range(20)
]


@pytest.mark.parametrize(
    "qname",
    ["price_deciles_distributed", "status_percentiles", "running_customer_spend", "revenue_pareto"],
)
def test_tpch_duplicate_price_boundaries(spark, tmp_path_factory, qname):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("duppx")
    pdir = tmp / "sf"
    pdir.mkdir()
    _write_tpch(spark, pdir, _DUP_PRICE_ORDERS, [])
    try:
        sdf = Q.QUERIES[qname](spark, str(pdir))
        s_cols = sorted(sdf.columns)
        con = duckdb.connect()
        for t in ("orders", "lineitem", "part", "customer", "supplier", "nation", "region"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{pdir}/{t}.parquet/*.parquet'"
            )
        res = con.execute(Q.ORACLE_SQL[qname])
        d_cols = sorted(c[0] for c in res.description)
        assert s_cols == d_cols, f"{qname}: schema {s_cols} vs {d_cols}"
        d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
        d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
        s_idx = [sdf.columns.index(name) for name in d_cols]
        s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
        assert s_rows == d_rows, f"{qname}: value mismatch"
    finally:
        release_cached()


# -- flagship differential: all 17 reference measures on random
# -- star-schema inputs — null amounts, empty status subsets, customers
# -- without orders — the exact-decimal discipline has nowhere to hide.


@st.composite
def _star_tables(draw):
    n_nations = draw(st.integers(min_value=1, max_value=3))
    nations = [(i, f"NATION_{i}", 0) for i in range(n_nations)]
    n_cust = draw(st.integers(min_value=1, max_value=6))
    customers = [
        (
            i,
            f"Customer#{i}",
            draw(st.integers(min_value=0, max_value=n_nations - 1)),
            0.0,
            "SEG",
        )
        for i in range(n_cust)
    ]
    n_orders = draw(st.integers(min_value=0, max_value=25))
    orders = []
    for i in range(n_orders):
        amount = draw(
            st.one_of(
                st.none(),
                st.integers(min_value=0, max_value=99999).map(lambda k: k / 100.0),
            )
        )
        orders.append(
            (
                i,
                draw(st.integers(min_value=0, max_value=n_cust - 1)),
                draw(st.sampled_from(["F", "O", "P"])),
                amount,
                f"1996-0{draw(st.integers(min_value=1, max_value=9))}-15",
                "1-URGENT",
            )
        )
    return nations, customers, orders


@settings(max_examples=10, deadline=None)
@given(tables=_star_tables())
def test_flagship_oracle_differential(spark, tmp_path_factory, tables):
    from datetime import datetime

    from pyspark.sql import types as T

    from airbnb_cdc_spark.session import release_cached

    nations, customers, orders = tables
    tmp = tmp_path_factory.mktemp("stardiff")
    pdir = tmp / "sf"
    pdir.mkdir()

    spark.createDataFrame(
        nations, "n_nationkey int, n_name string, n_regionkey int"
    ).coalesce(1).write.parquet(str(pdir / "nation.parquet"))
    spark.createDataFrame(
        customers,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.parquet(str(pdir / "customer.parquet"))
    o_schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    o_rows = [
        (k, c, s, a, datetime.fromisoformat(d), p) for (k, c, s, a, d, p) in orders
    ]
    spark.createDataFrame(o_rows, o_schema).coalesce(1).write.parquet(
        str(pdir / "orders.parquet")
    )

    try:
        sdf = Q.QUERIES["booking_customer_aggregation"](spark, str(pdir))
        s_cols = sorted(sdf.columns)
        con = duckdb.connect()
        for t in ("nation", "customer", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{pdir}/{t}.parquet/*.parquet'"
            )
        res = con.execute(Q.ORACLE_SQL["booking_customer_aggregation"])
        d_cols = sorted(c[0] for c in res.description)
        assert s_cols == d_cols
        d_idx = [[c[0] for c in res.description].index(name) for name in d_cols]
        d_rows = sorted(tuple(_norm(r[i]) for i in d_idx) for r in res.fetchall())
        s_idx = [sdf.columns.index(name) for name in d_cols]
        s_rows = sorted(tuple(_norm(r[i]) for i in s_idx) for r in sdf.collect())
        assert s_rows == d_rows, "flagship value mismatch"
    finally:
        release_cached()


# NULL-text documents: the whole token family normalizes NULL ≡ empty
# (textfns.tokens' coalesce, mirrored in every oracle after the r6
# review pass) — pinned deterministically here because the randomized
# generator draws only non-NULL text.
_NULL_TEXT_ROWS = [
    (0, None, "en", "s1", 0),
    (1, "the good row", "en", "s1", 12),
    (2, "", "fr", "s2", 0),
]

NULL_TEXT_QUERIES = [
    "text_stats",
    "token_counts",
    "doc_sentiment",
    "language_id",
    "dedup_exact",
    "doc_fingerprint",
    "repetition_filter",
    "pack_sequences",
    "mixture_by_token_budget",
    "weighted_sample_by_length",
    "chunk_dedup_spans",
    "chunk_dedup_summary",
    "winnow_fingerprints",
    "quality_classifier_topk",
    "bpe_apply",
]


@pytest.mark.parametrize("qname", NULL_TEXT_QUERIES)
def test_null_text_documents(spark, tmp_path_factory, qname):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("nulltext")
    try:
        _run_both(spark, tmp, _NULL_TEXT_ROWS, qname)
    finally:
        release_cached()


# PII scrub: the randomized generator draws word-only text, so every
# class is forced here — including the ordering traps (an email whose
# digits must not re-match as an ID, a phone inside prose, an ID
# glued to letters that \b must NOT match, adjacent/overlapping spans)
# and NULL/empty text.
_PII_ROWS = [
    (0, "contact bob.smith+spam@mail.example.org today", "en", "s1", 44),
    (1, "call 415-555-0199 or +1 650.555.0123 now", "en", "s1", 40),
    (2, "order 123456789 shipped; ref 00042 kept", "en", "s2", 39),
    (3, "user123456789 is not an id, 987654321 is", "en", "s2", 40),
    (4, "a1@b.co 123-456-7890123456 double trouble", "fr", "s3", 41),
    (5, None, "fr", "s3", 0),
    (6, "", "en", "s3", 0),
    (7, "plain text with no pii at all", "en", "s1", 29),
]


@pytest.mark.parametrize("qname", ["pii_scrub", "pii_report"])
def test_pii_pinned_rows(spark, tmp_path_factory, qname):
    from airbnb_cdc_spark.session import release_cached

    tmp = tmp_path_factory.mktemp("pii")
    try:
        _run_both(spark, tmp, _PII_ROWS, qname)
    finally:
        release_cached()
