"""DuckDB oracle SQL for the driver-contract queries.

Split out of ``queries.py`` (VERDICT r9 ask #7 — the query/oracle file
was 4.7k lines and growing ~450/round): this module holds every oracle
string constant, the shared SQL CTE fragments, and the oracle-SQL
generator helpers; ``queries.py`` keeps the Spark-side query bodies and
the ``@query`` registry. ``queries.py`` does ``from .oracles import *``
(``__all__`` below exports the underscore names), so every constant
keeps its historical name and the registry hashes byte-identically
across the split.

No imports from ``queries.py`` here (that would be circular) — shared
constants used by BOTH an oracle and its Spark query body live in this
module and reach the query bodies through the star import.
"""

from __future__ import annotations

from airbnb_cdc_spark.functions.textfns import LANG_PRIORITY, LANG_STOPWORDS
from airbnb_cdc_spark.operators import text as _text

# shared by the hash-negatives oracle AND its Spark query body
_NEG_K, _NEG_B = 3, 64
# shared by the bloom semi-join oracle AND its Spark query body
_BLOOM_BITS, _BLOOM_K, _BLOOM_BAL = 4096, 3, 8000
# shared by the z-order oracle AND its Spark query body
_ZORDER_BITS, _ZORDER_FILE_BITS = 8, 6
# shared by the chunk-dedup oracles AND their Spark query bodies
_CHUNK_W, _CHUNK_S = 64, 48

__all__ = ['_TRADE_VOLUME_ORACLE', '_SEMDEDUP_KEEPER_ORACLE', '_SOFT_DEDUP_ORACLE', '_PRIORITY_RETURNS_ORACLE', '_ASOF_TOLERANCE_SEC', '_ASOF_TOL_ORACLE', '_KMV_WINDOWED_ORACLE', '_FORECAST_REV_ORACLE', '_SOURCE_PROFILE_ORACLE', '_temp_mixture_sql', '_TEMP_SAMPLE_BUDGET', '_TEMP_SAMPLE_ORACLE', '_INCR_DSIR_ORACLE', '_BEST_KEEPER_ORACLE', '_PART_SHARE_ORACLE', '_RETURNED_REV_ORACLE', '_TOP_SUPPLIER_ORACLE', '_CLUSTER_SIZE_ORACLE', '_TEMP_BUDGET', '_TEMP_WSCALE', '_TEMP_MIXTURE_ORACLE', '_VOCAB_SIZES', '_VOCAB_COVERAGE_ORACLE', '_DSIR_BUCKETS', '_DSIR_SCALE', '_DSIR_K', '_DSIR_TARGET', '_DSIR_ORACLE', '_LEAKAGE_SPLIT_ORACLE', '_length_bucket_oracle', '_DECON_MOD', '_DECON_REM', '_DECON_TAU', '_SEM_DECONTAM_ORACLE', '_quality_chain_oracle', '_BM25_TERMS', '_BM25_K', '_bm25_oracle', '_BOILER_W', '_BOILER_MIN_DF', '_BOILERPLATE_ORACLE', '_PACK_CONCAT_LEN', '_PACK_CONCAT_ORACLE', '_incr_minhash_oracle', '_KMV_ROLLUP_K', '_KMV_ROLLUP_LO', '_KMV_ROLLUP_HI', '_KMV_ROLLUP_ORACLE', '_ZORDER_BITS', '_ZORDER_FILE_BITS', '_PII_SCRUB_EXPR', '_PII_COUNT_EXPRS', '_CHUNK_W', '_CHUNK_S', '_BLOOM_BITS', '_BLOOM_K', '_BLOOM_BAL', '_NEG_K', '_NEG_B', '_AGG_ORACLE', '_LOOKUP_ORACLE', '_FLAGS_ORACLE', '_MERGE_ORACLE', '_TOKS_CTE', '_SH_CTE', '_SH_CAP_CTE', '_stop_list', '_TEXT_STATS_ORACLE', '_QUALITY_ORACLE', '_TOP_TERMS_ORACLE', '_lang_oracle', '_FINGERPRINT_ORACLE', '_DEDUP_EXACT_ORACLE', '_JACCARD_VERIFY', '_NGRAM_JACCARD_ORACLE', '_CONTAINMENT_ORACLE', '_INCREMENTAL_ORACLE', '_minhash_bands_sql', '_MINHASH_ORACLE', '_simhash_oracle', '_QUANT_CTE', '_cos_sql', '_COS', '_ANN_BF_ORACLE', '_KNN_VOTE_ORACLE', '_NEG_ORACLE', '_bucket_sql', '_ANN_LSH_ORACLE', '_PROJS_SQL', '_ANN_LSH_MP_ORACLE', '_NEARDUP_ORACLE', '_SEMDEDUP_ORACLE', '_MM_ORACLE', '_MM_RESIZE_ORACLE', '_MM_FRAMES_ORACLE', '_WINDOW_ORACLE', '_CMS_ORACLE', '_KMV_ORACLE', '_KMV_OVERLAP_ORACLE', '_COHORT_ORACLE', '_TRAIL7_ORACLE', '_HOPPING_ORACLE', '_SESSION_WINDOW_ORACLE', '_ATTRIB_ORACLE', '_BPE_ORACLE', '_SESSION_ORACLE', '_ROLLUP_ORACLE', '_TOPN_ORACLE', '_bloom_pos_sql', '_BLOOM_EFFECT_ORACLE', '_BLOOM_SEMI_ORACLE', '_JSON_ORACLE', '_PRICING_ORACLE', '_SHIPPING_ORACLE', '_LOCAL_SUPPLIER_ORACLE', '_ROLLING_ORACLE', '_IVF_ORACLE', '_ivf_nprobe_sql', '_IVF_KMEANS_ORACLE', '_ASOF_ORACLE', '_PRIORITIES', '_PRIORITY_ALIASES', '_pivot_oracle', '_TRAILING_ORACLE', '_LEADLAG_ORACLE', '_SETOPS_ORACLE', '_CHUNKS_CTE', '_CHUNKS_ORACLE', '_CHUNK_KEEPER_CTE', '_CHUNK_DEDUP_ORACLE', '_CHUNK_DEDUP_SUMMARY_ORACLE', '_CHUNK_INTERVALS_ORACLE', '_INCR_CHUNK_ORACLE', '_H60_SQL', '_WINNOW_CTE', '_WINNOW_FP_ORACLE', '_WINNOW_PAIRS_ORACLE', '_WINNOW_COMPONENTS_ORACLE', '_WINNOW_CANONICAL_ORACLE', '_INCR_WINNOW_ORACLE', '_pii_sql_exprs', '_PII_SCRUB_ORACLE', '_PII_REPORT_ORACLE', '_BUCKET_SQL', '_SAMPLE_ORACLE', '_SPLIT_ORACLE', '_NTILE_ORACLE', '_OOV_ORACLE', '_PREP_ORACLE', '_REPETITION_ORACLE', '_PACK_ORACLE', '_PAIR_SOURCES_ORACLE', '_simhash_cluster_oracle', '_diversity_oracle', '_FUNNEL_ORACLE', '_PROFILE_COLS', '_profile_oracle', '_LATE_SHIP_ORACLE', '_LINESTATUS_ORACLE', '_LARGE_ORDERS_ORACLE', '_H60_SQL', '_DECONTAM_ORACLE', '_BIGRAM_ORACLE', '_OHLC_ORACLE', '_HIST_ORACLE', '_SCD2_ORACLE', '_OUTLIER_ORACLE', '_COMPONENTS_ORACLE', '_PIT_ORACLE', '_CANON_ORACLE', '_FUZZY_LINK_ORACLE', '_PROMO_ORACLE', '_CANONICAL_ORACLE', '_PMI_ORACLE', '_MIXTURE_ORACLE', '_ASOF_FWD_ORACLE', '_RESAMPLE_ORACLE', '_TREND_ORACLE', '_zorder_oracle', '_WEIGHTED_SAMPLE_ORACLE', '_EXPECTATIONS_ORACLE', '_TRANSITIONS_ORACLE', '_TS_SIM_ORACLE', '_sentiment_oracle', '_DECILES_ORACLE', '_PAGERANK_ORACLE', '_VALUE_OUTLIER_ORACLE', '_PARETO_ORACLE', '_RAW_URL_SQL', '_CANON_URL_SQL', '_URL_DEDUP_ORACLE', '_DOMAIN_CAP', '_DOMAIN_CAP_ORACLE', '_LM_BUCKETS', '_LM_SCALE', '_LM_K', '_LM_TARGET', '_LM_ORACLE', '_INCR_LM_ORACLE', '_ORDER_DIST_ORACLE', '_IDLE_CUSTOMERS_ORACLE', '_WAIT_CHAIN_ORACLE', '_JOINT_GATE_ORACLE', '_IDLE_CUTOFF', '_INTERP_LM_ORACLE', '_SMALL_QTY_ORACLE', '_BRACKET_REV_ORACLE', '_MKT_SHARE_ORACLE', '_CHEAPEST_SUPP_ORACLE', '_SUPP_VARIETY_SIZES', '_SUPP_VARIETY_ORACLE', '_SQ8_ORACLE', '_PPL_BUCKETS_ORACLE', '_SQ8_RECALL_ORACLE', '_IVF_SQ8_ORACLE', '_DOMINANT_SUPP_ORACLE', '_KN_LM_ORACLE', '_BLOCKLIST_RULES', '_BLOCKLIST_ORACLE', '_PPL_ASSIGN_ORACLE', '_CLF_BUCKETS', '_CLF_SCALE', '_CLF_K', '_CLF_TARGET', '_CLF_TOPK_ORACLE', '_BPE_SEP', '_BPE_RULES', '_BPE_APPLY_ORACLE']

_AGG_ORACLE = """
WITH fact AS (
    SELECT o_orderkey AS booking_id,
           o_custkey AS customer_id,
           o_orderstatus AS status,
           o_totalprice AS total_amount,
           o_orderdate AS booking_created_at,
           o_orderkey % 30 AS nights
    FROM orders
), dim AS (
    SELECT c_custkey AS customer_id, n_name AS country
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT
    d.country AS country,
    COUNT(*) AS total_bookings,
    CAST(SUM(CASE WHEN status = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS confirmed_bookings,
    CAST(SUM(CASE WHEN status = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cancelled_bookings,
    CAST(SUM(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
    CAST(SUM(CASE WHEN status = 'F' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS confirmed_amount,
    CAST(SUM(CASE WHEN status = 'O' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS cancelled_amount,
    CASE WHEN COUNT(*) = 0 THEN 0.0
         ELSE CAST(SUM(CASE WHEN status = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
    END AS cancellation_rate,
    MAX(booking_created_at) AS last_booking_date,
    MIN(booking_created_at) AS first_booking_date,
    CAST(SUM(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_amount,
    CAST(SUM(CASE WHEN status = 'F' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(NULLIF(SUM(CASE WHEN status = 'F' THEN 1 END), 0) AS DOUBLE) AS confirmed_avg_amount,
    CAST(SUM(CASE WHEN status = 'O' THEN CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(NULLIF(SUM(CASE WHEN status = 'O' THEN 1 END), 0) AS DOUBLE) AS cancelled_avg_amount,
    CAST(MIN(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS min_amount,
    CAST(MAX(CAST(COALESCE(total_amount, 0) AS DECIMAL(18,2))) AS DOUBLE) AS max_amount,
    COUNT(DISTINCT f.customer_id) AS distinct_customers,
    CAST(SUM(CAST(COALESCE(nights, 0) AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_stay_duration
FROM fact f JOIN dim d ON f.customer_id = d.customer_id
GROUP BY d.country
"""


_LOOKUP_ORACLE = """
WITH latest AS (
    SELECT user_id AS customer_id, ts AS t_ts, event_type AS t_event_type,
           value AS t_value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
SELECT c.c_custkey AS customer_id, c.c_name AS name, c.c_mktsegment AS segment,
       l.t_ts AS t_ts, l.t_event_type AS t_event_type, l.t_value AS t_value
FROM customer c
LEFT JOIN (SELECT * FROM latest WHERE rn = 1) l ON c.c_custkey = l.customer_id
"""


_FLAGS_ORACLE = """
WITH incoming AS (
    SELECT user_id, ts, event_type, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), target AS (
    SELECT c_custkey FROM customer WHERE c_custkey < 100
)
SELECT i.user_id AS user_id, i.ts AS ts, i.event_type AS event_type,
       i.value AS value,
       CASE WHEN t.c_custkey IS NULL THEN 'insert' ELSE 'update' END AS action
FROM (SELECT * FROM incoming WHERE rn = 1) i
LEFT JOIN target t ON i.user_id = t.c_custkey
"""


_MERGE_ORACLE = """
WITH base AS (
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
), upd AS (
    SELECT user_id, ts, event_type, value FROM (
        SELECT user_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1
)
SELECT b.user_id, b.ts, b.event_type, b.value FROM base b
WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.user_id = b.user_id)
UNION ALL
SELECT u.user_id, u.ts, u.event_type, u.value FROM upd u
"""


_TOKS_CTE = """
toks AS (
    SELECT doc_id, length(text) AS n_chars,
           list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       t -> t <> '') AS t
    FROM documents
)
"""


_SH_CTE = """
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, len(t) - 1),
                  i -> concat_ws(' ', t[i], t[i+1], t[i+2])))) AS sh
    FROM toks WHERE len(t) >= 3
)
"""


_SH_CAP_CTE = """
shf AS (
    SELECT sh FROM sh GROUP BY sh
    HAVING count(*) <= (SELECT greatest(2, count(*) // 100) FROM documents)
),
shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN shf USING (sh))
"""


def _stop_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])


_TEXT_STATS_ORACLE = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
    CAST(n_chars AS BIGINT) AS n_chars,
    CAST(len(t) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
    CASE WHEN len(t) > 0
         THEN CAST(COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS DOUBLE) / CAST(len(t) AS DOUBLE)
         ELSE 0.0 END AS avg_token_len,
    CASE WHEN len(t) > 0
         THEN CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
         ELSE 0.0 END AS distinct_ratio,
    CASE WHEN len(t) > 0
         THEN CAST(len(list_filter(t, x -> x IN ({_stop_list('en')}))) AS DOUBLE) / CAST(len(t) AS DOUBLE)
         ELSE 0.0 END AS stopword_ratio
FROM toks
"""


_QUALITY_ORACLE = f"""
WITH stats AS ({_TEXT_STATS_ORACLE})
SELECT * FROM stats
WHERE n_tokens >= 20 AND stopword_ratio >= 0.03 AND distinct_ratio >= 0.35
"""


_TOP_TERMS_ORACLE = f"""
WITH {_TOKS_CTE}, terms AS (
    SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), dfreq AS (
    SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
           ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                              ORDER BY tf.tf DESC, dfreq.df ASC, tf.term) AS rnk
    FROM tf JOIN dfreq USING (term)
) WHERE rnk <= 3
"""


def _lang_oracle() -> str:
    hits = ",\n    ".join(
        f"CAST(len(list_filter(t, x -> x IN ({_stop_list(lang)}))) AS BIGINT) AS hits_{lang}"
        for lang in LANG_PRIORITY
    )
    greatest = ", ".join(f"hits_{lang}" for lang in LANG_PRIORITY)
    case = " ".join(
        f"WHEN hits_{lang} = __best THEN '{lang}'" for lang in LANG_PRIORITY
    )
    return f"""
WITH {_TOKS_CTE}, hits AS (
    SELECT doc_id, {hits} FROM toks
)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in LANG_PRIORITY)},
       CASE WHEN __best = 0 THEN 'und' {case} END AS predicted_lang
FROM (SELECT *, GREATEST({greatest}) AS __best FROM hits)
"""


_FINGERPRINT_ORACLE = f"""
WITH {_TOKS_CTE}
SELECT doc_id, md5(coalesce(array_to_string(t, ' '), '')) AS fingerprint FROM toks
"""


_DEDUP_EXACT_ORACLE = f"""
WITH {_TOKS_CTE}, fp AS (
    SELECT doc_id, md5(coalesce(array_to_string(t, ' '), '')) AS fingerprint FROM toks
)
SELECT doc_id, fingerprint FROM (
    SELECT doc_id, fingerprint,
           ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp
) WHERE rn = 1
"""


_JACCARD_VERIFY = """
sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
    FROM shc a JOIN shc b USING (sh) WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
)
"""


_NGRAM_JACCARD_ORACLE = f"""
WITH {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_JACCARD_VERIFY}
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
"""


_CONTAINMENT_ORACLE = f"""
WITH {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_JACCARD_VERIFY}
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) AS containment
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE) >= 0.8
"""


_INCREMENTAL_ORACLE = """
WITH fp AS (
    SELECT doc_id,
           md5(coalesce(array_to_string(list_filter(
               regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), t -> t <> ''), ' '),
               ''))
               AS fingerprint
    FROM documents
),
split AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cut FROM fp),
seen AS (SELECT DISTINCT fingerprint FROM fp, split WHERE doc_id <= cut),
batch AS (
    SELECT doc_id, fingerprint,
           row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
    FROM fp, split WHERE doc_id > cut
)
SELECT doc_id, fingerprint FROM batch
WHERE rn = 1 AND fingerprint NOT IN (SELECT fingerprint FROM seen)
"""


def _minhash_bands_sql(k: int = 8, band_size: int = 2) -> str:
    # One-hash MinHash, mirroring dedup._h60/_minhash_cols exactly: one
    # 60-bit md5-derived hash per shingle, truncated to its lower 32
    # bits for the k affine transforms (a_j*(h%2^32) + b_j) % P. With
    # a < 2^31 the product stays < 2^63 — exact BIGINT math in both
    # engines.
    from airbnb_cdc_spark.operators.dedup import (
        _MINHASH_BASE_MOD,
        MINHASH_P,
        minhash_params,
    )

    mins = ", ".join(
        f"min(({a} * (h % {_MINHASH_BASE_MOD}) + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(minhash_params(k))
    )
    # signatures, like the verify stage, are built from the CAPPED index
    bands = ", ".join(
        "concat_ws('|', '%d', %s)"
        % (b, ", ".join(f"mh{b * band_size + r}" for r in range(band_size)))
        for b in range(k // band_size)
    )
    return f"""
hashed AS (SELECT doc_id, CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM shc),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS (SELECT doc_id, unnest([{bands}]) AS bucket FROM sig),
cand AS (
    SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
    FROM bands x JOIN bands y USING (bucket) WHERE x.doc_id < y.doc_id
)
"""


_MINHASH_ORACLE = f"""
WITH {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_minhash_bands_sql()},
sizes AS (SELECT doc_id, count(*) AS sz FROM shc GROUP BY doc_id),
inter AS (
    SELECT c.id_a, c.id_b, count(*) AS i
    FROM cand c
    JOIN shc a ON a.doc_id = c.id_a
    JOIN shc b ON b.doc_id = c.id_b AND b.sh = a.sh
    GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON id_a = sa.doc_id
JOIN sizes sb ON id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
"""


def _simhash_oracle(bits: int = 16) -> str:
    votes = " + ".join(
        f"(CASE WHEN COALESCE(list_sum(list_transform(dt, "
        f"tok -> CASE WHEN substring(md5(tok), {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)), 0) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH {_TOKS_CTE}, dtoks AS (SELECT doc_id, list_distinct(t) AS dt FROM toks)
SELECT doc_id, CAST({votes} AS BIGINT) AS simhash FROM dtoks
"""


_QUANT_CTE = """
q AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
    FROM embeddings
)
"""


def _cos_sql(a: str, b: str, av: str = "qe", bv: str = "qe") -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, 65), i -> {a}.{av}[i] * {b}.{bv}[i])) AS DOUBLE)"
        f" / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> {a}.{av}[i] * {a}.{av}[i])) AS DOUBLE))"
        f" * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> {b}.{bv}[i] * {b}.{bv}[i])) AS DOUBLE)))"
    )


_COS = (
    "CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * b.qe[i])) AS DOUBLE)"
    " / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * a.qe[i])) AS DOUBLE))"
    " * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> b.qe[i] * b.qe[i])) AS DOUBLE)))"
)


_ANN_BF_ORACLE = f"""
WITH {_QUANT_CTE}, scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
    FROM q a, q b
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


_KNN_VOTE_ORACLE = f"""
WITH {_QUANT_CTE}, scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
    FROM q a, q b
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
),
top5 AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
),
votes AS (
    SELECT t.query_id, e.label AS predicted_label, count(*) AS votes
    FROM top5 t JOIN embeddings e ON t.neighbor_id = e.vec_id
    GROUP BY 1, 2
)
SELECT query_id, predicted_label, CAST(votes AS BIGINT) AS votes FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, predicted_label) AS rn
    FROM votes
) WHERE rn = 1
"""


_NEG_ORACLE = f"""
WITH b AS (
    SELECT vec_id, label,
           CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_NEG_B} AS bb
    FROM embeddings
),
reps AS (
    SELECT bb, MIN(vec_id) AS neg FROM b GROUP BY 1
),
repl AS (
    SELECT r.bb, r.neg, e.label AS neg_label
    FROM reps r LEFT JOIN embeddings e ON r.neg = e.vec_id
),
p AS (
    SELECT e.vec_id, e.label, j.j,
           CAST(('0x' || substring(md5(concat(CAST(j.j AS VARCHAR), ':',
                CAST(e.vec_id AS VARCHAR))), 1, 15)) AS BIGINT) % {_NEG_B} AS bb
    FROM embeddings e CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) j
)
SELECT p.vec_id, CAST(p.j + 1 AS INTEGER) AS neg_rank, r.neg AS neg_id
FROM p JOIN repl r USING (bb)
WHERE r.neg <> p.vec_id
  AND (r.neg_label IS NULL OR p.label IS NULL OR r.neg_label <> p.label)
"""


def _bucket_sql(alias: str, bits: int = 4) -> str:
    parts = []
    for j in range(bits):
        plane = f"list_transform(range(1, 65), i -> ((1009 * {j + 1} * (i + 6) + 30011 * {j + 3}) % 2003) - 1001)"
        proj = f"list_sum(list_transform(range(1, 65), i -> {alias}.qe[i] * ({plane})[i]))"
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(parts)


_ANN_LSH_ORACLE = f"""
WITH {_QUANT_CTE},
qb AS (SELECT vec_id, qe, CAST({_bucket_sql('q')} AS INTEGER) AS bucket FROM q),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
    FROM qb a JOIN qb b USING (bucket)
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


_PROJS_SQL = (
    "list_transform(range(0, 4), j -> list_sum(list_transform(range(1, 65),"
    " i -> qe[i] * (((1009 * (j + 1) * (i + 6) + 30011 * (j + 3)) % 2003) - 1001))))"
)


_ANN_LSH_MP_ORACLE = f"""
WITH {_QUANT_CTE},
pb AS (SELECT vec_id, qe, {_PROJS_SQL} AS projs FROM q),
qb AS (
    SELECT vec_id, qe, projs,
           CAST(list_sum(list_transform(range(0, 4),
                j -> CASE WHEN projs[j + 1] > 0 THEN (1 << j) ELSE 0 END)) AS INTEGER) AS bucket
    FROM pb
),
probes AS (
    SELECT vec_id, qe,
           list_prepend(bucket, list_transform(
               list_slice(list_sort(list_transform(range(0, 4),
                   j -> {{'a': abs(projs[j + 1]), 'j': j}})), 1, 2),
               s -> xor(bucket, (1 << s.j)))) AS pbuckets
    FROM qb WHERE vec_id % 50 = 0
),
cand AS (
    SELECT p.vec_id AS query_id, p.qe, u.b AS bucket
    FROM probes p, UNNEST(p.pbuckets) AS u(b)
),
scored AS (
    SELECT a.query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
    FROM cand a JOIN qb b USING (bucket)
    WHERE a.query_id <> b.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


_NEARDUP_ORACLE = f"""
WITH {_QUANT_CTE},
qb AS (SELECT vec_id, qe, CAST({_bucket_sql('q')} AS INTEGER) AS bucket FROM q),
pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
    FROM qb a JOIN qb b USING (bucket)
    WHERE a.vec_id < b.vec_id
)
SELECT DISTINCT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4
"""


_SEMDEDUP_ORACLE = f"""
WITH {_QUANT_CTE},
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
assign AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
)
SELECT id_a, id_b, cid, cosine FROM (
    SELECT p.vec_id AS id_a, n.vec_id AS id_b, p.cid AS cid,
           {_cos_sql('p', 'n')} AS cosine
    FROM assign p JOIN assign n ON p.cid = n.cid
    WHERE p.vec_id < n.vec_id
) WHERE cosine >= 0.4
"""


_MM_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash,
       CAST(CAST(concat('0x', substring(md5(text), 1, 4)) AS INTEGER) % 1920 + 1 AS INTEGER) AS fake_width,
       CAST(CAST(concat('0x', substring(md5(text), 5, 4)) AS INTEGER) % 1080 + 1 AS INTEGER) AS fake_height
FROM documents
"""


_MM_RESIZE_ORACLE = """
WITH dims AS (
    SELECT doc_id, md5(text) AS digest,
           CAST(CAST(concat('0x', substring(md5(text), 1, 4)) AS INTEGER) % 1920 + 1 AS INTEGER) AS w,
           CAST(CAST(concat('0x', substring(md5(text), 5, 4)) AS INTEGER) % 1080 + 1 AS INTEGER) AS h
    FROM documents
), scaled AS (
    SELECT doc_id, digest,
           greatest(1, CAST(floor(w * least(128.0 / w, 128.0 / h)) AS INTEGER)) AS out_width,
           greatest(1, CAST(floor(h * least(128.0 / w, 128.0 / h)) AS INTEGER)) AS out_height
    FROM dims
)
SELECT doc_id, out_width, out_height,
       md5(concat(digest, ':', out_width, ':', out_height)) AS resized_hash
FROM scaled
"""


_MM_FRAMES_ORACLE = """
WITH meta AS (
    SELECT doc_id, md5(text) AS digest,
           octet_length(encode(text)) // 100 + 1 AS n_frames
    FROM documents
), frames AS (
    SELECT doc_id, digest,
           unnest(range(0, least(4, n_frames))) * greatest(1, n_frames // 4) AS frame_idx
    FROM meta
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(concat(digest, ':', frame_idx)) AS frame_hash
FROM frames
"""


_WINDOW_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS distinct_users
FROM events
GROUP BY 1, 2
"""


_CMS_ORACLE = """
WITH toks AS (
    SELECT list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), t -> t <> '') AS t
    FROM documents
),
vocab AS (
    SELECT u.w AS token, CAST(count(*) AS BIGINT) AS exact_count
    FROM toks, unnest(t) AS u(w) GROUP BY 1
),
top AS (
    SELECT token, exact_count FROM vocab
    ORDER BY exact_count DESC, token LIMIT 20
),
sketch AS (
    SELECT j.j AS j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || token), 1, 15)) AS BIGINT) % 1024 AS bucket,
           CAST(SUM(exact_count) AS BIGINT) AS c
    FROM vocab, unnest(range(0, 4)) AS j(j)
    GROUP BY 1, 2
),
probe AS (
    SELECT t.token, t.exact_count, j.j AS j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || t.token), 1, 15)) AS BIGINT) % 1024 AS bucket
    FROM top t, unnest(range(0, 4)) AS j(j)
)
SELECT p.token AS token, CAST(max(p.exact_count) AS BIGINT) AS exact_count,
       CAST(min(COALESCE(s.c, 0)) AS BIGINT) AS cms_estimate
FROM probe p LEFT JOIN sketch s USING (j, bucket)
GROUP BY 1
"""


_KMV_ORACLE = """
WITH uh AS (
    SELECT DISTINCT event_type,
           CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events
),
ranked AS (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM uh
),
ns AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM uh GROUP BY 1
),
kth AS (SELECT event_type, h AS hk FROM ranked WHERE rn = 64)
SELECT ns.event_type AS event_type, ns.n_exact,
       CASE WHEN kth.hk IS NULL THEN CAST(ns.n_exact AS DOUBLE)
            ELSE 63.0 * 1152921504606846976.0 / CAST(kth.hk AS DOUBLE)
       END AS kmv_estimate
FROM ns LEFT JOIN kth USING (event_type)
"""


_KMV_OVERLAP_ORACLE = """
WITH uh AS (
    SELECT DISTINCT event_type AS grp,
           CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events WHERE event_type IN ('view', 'purchase')
),
ranked AS (
    SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn FROM uh
),
sk AS (SELECT grp, h FROM ranked WHERE rn <= 64),
pooled AS (
    SELECT h, sides, ROW_NUMBER() OVER (ORDER BY h) AS prn
    FROM (SELECT h, count(*) AS sides FROM sk GROUP BY h)
),
stats AS (
    SELECT max(h) AS hk, count(*) AS m,
           SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS rho_k
    FROM pooled WHERE prn <= 64
),
est AS (
    SELECT CASE WHEN m > 0 THEN
               CAST(rho_k AS DOUBLE) / CAST(m AS DOUBLE)
               * (CASE WHEN m < 64 THEN CAST(m AS DOUBLE)
                       ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END)
           ELSE 0.0 END AS est_intersection
    FROM stats
),
ex AS (
    SELECT CAST(count(*) AS BIGINT) AS exact_intersection FROM
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'view') v
    JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') p
    USING (user_id)
)
SELECT est.est_intersection, ex.exact_intersection FROM est, ex
"""


_COHORT_ORACLE = """
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('month', min(ts)) AS TIMESTAMP) AS cohort_month
    FROM events GROUP BY 1
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('month', ts) AS TIMESTAMP) AS activity_month
    FROM events
)
SELECT f.cohort_month AS cohort_month, a.activity_month AS activity_month,
       CAST(count(*) AS BIGINT) AS n_users
FROM firsts f JOIN activity a USING (user_id)
GROUP BY 1, 2
"""


_TRAIL7_ORACLE = """
WITH ud AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM ud),
contrib AS (
    SELECT DISTINCT u.user_id, u.day + CAST(r.i AS INTEGER) AS day
    FROM ud u, unnest(range(0, 7)) AS r(i)
)
SELECT c.day AS day, CAST(count(*) AS BIGINT) AS users_7d
FROM contrib c JOIN days d USING (day)
GROUP BY 1
"""


_HOPPING_ORACLE = """
WITH starts AS (
    SELECT unnest([
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
               to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
           ]) AT TIME ZONE 'UTC' AS window_start,
           value
    FROM events
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM starts
GROUP BY 1
"""


_SESSION_WINDOW_ORACLE = """
WITH e AS (
    SELECT user_id, ts, value FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
), m AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_s
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
    SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
    FROM m
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, sid
"""


_ATTRIB_ORACLE = """
SELECT v.user_id AS user_id, v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       v.ts AS view_ts, p.ts AS purchase_ts
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 30 MINUTE
"""


_BPE_ORACLE = r"""
SELECT doc_id,
       CAST(length(coalesce(text, '')) - length(replace(coalesce(text, ''), ' ', '')) + 1
            AS BIGINT) AS ws_token_count,
       CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_token_count
FROM documents
"""


_SESSION_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  OR epoch_us(ts)
                     - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                     > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
), numbered AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session
"""


_ROLLUP_ORACLE = """
SELECT COALESCE(n_name, '<all>') AS country,
       COALESCE(o_orderstatus, '<all>') AS status,
       COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderstatus)
"""


_TOPN_ORACLE = """
WITH spend AS (
    SELECT o_custkey AS customer_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT customer_id, total_spend, n_orders, CAST(rnk AS INTEGER) AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY total_spend DESC, customer_id) AS rnk
    FROM spend
) WHERE rnk <= 20
"""


def _bloom_pos_sql(key_expr: str, i: int) -> str:
    return (
        f"(CAST(('0x' || substring(md5(concat('{i}:', "
        f"CAST({key_expr} AS VARCHAR))), 1, 15)) AS BIGINT) % {_BLOOM_BITS})"
    )


_BLOOM_EFFECT_ORACLE = f"""
WITH dimk AS (
    SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
),
dpos AS (
    SELECT DISTINCT pos FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql("c_custkey", i) for i in range(_BLOOM_K))}]) AS pos
        FROM dimk
    )
),
f AS (
    SELECT {", ".join(f"{_bloom_pos_sql('o_custkey', i)} AS q{i}" for i in range(_BLOOM_K))},
           o_custkey IN (SELECT c_custkey FROM dimk) AS is_match
    FROM orders
),
s AS (
    SELECT is_match,
           ({" AND ".join(f"q{i} IN (SELECT pos FROM dpos)" for i in range(_BLOOM_K))}) AS survives
    FROM f
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
       CAST(SUM(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       CAST(SUM(CASE WHEN survives AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT)
           AS n_false_pos
FROM s
"""


_BLOOM_SEMI_ORACLE = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_totalprice) AS DOUBLE) AS revenue
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_acctbal > {_BLOOM_BAL}
)
GROUP BY o_orderstatus
"""


_JSON_ORACLE = """
WITH docs AS (
    SELECT printf('{"et":"%s","uid":%d,"v":%d.%02d}', event_type, user_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) // 100,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) % 100) AS j
    FROM events
)
SELECT json_extract_string(j, '$.et') AS et,
       COUNT(*) AS n,
       CAST(SUM(CAST(CAST(json_extract_string(j, '$.v') AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS total_v
FROM docs GROUP BY 1
"""


_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


_SHIPPING_ORACLE = """
SELECT o_orderkey AS orderkey, o_orderdate AS orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'O' AND l_shipdate > DATE '1995-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
"""


_LOCAL_SUPPLIER_ORACLE = """
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


_ROLLING_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), t -> t <> '') AS t
    FROM documents
), hashes AS (
    SELECT doc_id,
           list_transform(t, tok -> CAST(concat('0x', substring(md5(tok), 1, 12)) AS BIGINT)) AS h
    FROM toks
)
SELECT doc_id,
       CASE WHEN len(h) = 0 THEN 0
            ELSE list_reduce(h, (a, b) -> (a * 313 + b) % 9007199254740992)
       END AS rolling_hash
FROM hashes
"""


_IVF_ORACLE = f"""
WITH {_QUANT_CTE},
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
assign AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * c.ce[i])) AS DOUBLE)
                            / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * a.qe[i])) AS DOUBLE))
                               * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> c.ce[i] * c.ce[i])) AS DOUBLE))) DESC,
                            c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
scored AS (
    SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(range(1, 65), i -> p.qe[i] * n.qe[i])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> p.qe[i] * p.qe[i])) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> n.qe[i] * n.qe[i])) AS DOUBLE))) AS cosine
    FROM assign p JOIN assign n ON p.cid = n.cid
    WHERE p.vec_id % 50 = 0 AND p.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


def _ivf_nprobe_sql(nprobe: int) -> str:
    return f"""
WITH {_QUANT_CTE},
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
assign AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
probe AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c WHERE a.vec_id % 50 = 0
    ) WHERE rn <= {nprobe}
),
scored AS (
    SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id, {_cos_sql('p', 'n')} AS cosine
    FROM probe p JOIN assign n ON p.cid = n.cid
    WHERE p.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


_IVF_KMEANS_ORACLE = f"""
WITH {_QUANT_CTE},
cent0 AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
a0 AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent0 c
    ) WHERE rn = 1
),
dims AS (
    SELECT cid, i AS pos,
           CAST(floor(CAST(SUM(qe[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
    FROM a0, unnest(range(1, 65)) AS t(i)
    GROUP BY cid, i
),
cent AS (SELECT cid, list(m ORDER BY pos) AS ce FROM dims GROUP BY cid),
assign AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
probe AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c WHERE a.vec_id % 50 = 0
    ) WHERE rn <= 2
),
scored AS (
    SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id, {_cos_sql('p', 'n')} AS cosine
    FROM probe p JOIN assign n ON p.cid = n.cid
    WHERE p.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


_ASOF_ORACLE = """
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), views AS (
    SELECT user_id, ts, max(event_id) AS event_id
    FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT p.user_id AS user_id, p.ts AS ts, p.event_id AS event_id,
       v.ts AS view_ts, v.event_id AS view_event_id
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


_PRIORITY_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def _pivot_oracle() -> str:
    cols = ",\n           ".join(
        f"COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS {a}"
        for p, a in zip(_PRIORITIES, _PRIORITY_ALIASES)
    )
    return f"""
    SELECT o_orderstatus AS status,
           {cols}
    FROM orders GROUP BY o_orderstatus
    """


_TRAILING_ORACLE = """
SELECT event_id, user_id, ts,
       COUNT(*) OVER w - 1 AS n_prior_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
            - CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_prior_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


_LEADLAG_ORACLE = """
SELECT event_id, user_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS prev_gap_us,
       lead(event_type) OVER w AS next_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


_SETOPS_ORACLE = """
SELECT c AS customer_id, 'both' AS tag FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
UNION ALL
SELECT c AS customer_id, 'f_only' AS tag FROM (
    SELECT o_custkey AS c FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
"""


_CHUNKS_CTE = f"""{_TOKS_CTE}, c AS (
    SELECT doc_id, t, len(t) AS n,
           1 + CASE WHEN len(t) > {_CHUNK_W}
                    THEN (len(t) - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S}
                    ELSE 0 END AS nc
    FROM toks
), chunks AS (
    SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
           CAST(len(ck) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(ck, ' ')) AS chunk_hash
    FROM (
        SELECT doc_id, i,
               list_slice(t, (i-1)*{_CHUNK_S} + 1,
                          least((i-1)*{_CHUNK_S} + {_CHUNK_W}, n)) AS ck
        FROM c, unnest(range(1, nc + 1)) AS u(i)
    ) WHERE len(ck) > 0
)"""


_CHUNKS_ORACLE = f"""
WITH {_CHUNKS_CTE}
SELECT doc_id, chunk_idx, chunk_tokens, chunk_hash FROM chunks
"""


_CHUNK_KEEPER_CTE = f"""{_CHUNKS_CTE}, k AS (
    SELECT chunk_hash, doc_id AS keep_doc_id, chunk_idx AS keep_chunk_idx
    FROM (SELECT chunk_hash, doc_id, chunk_idx,
                 row_number() OVER (PARTITION BY chunk_hash
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM chunks) WHERE rn = 1
)"""


_CHUNK_DEDUP_ORACLE = f"""
WITH {_CHUNK_KEEPER_CTE}
SELECT c.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_hash,
       k.keep_doc_id, k.keep_chunk_idx,
       NOT (c.doc_id = k.keep_doc_id AND c.chunk_idx = k.keep_chunk_idx)
           AS is_dup
FROM chunks c JOIN k USING (chunk_hash)
"""


_CHUNK_DEDUP_SUMMARY_ORACLE = f"""
WITH {_CHUNK_KEEPER_CTE}, m AS (
    SELECT c.doc_id,
           NOT (c.doc_id = k.keep_doc_id AND c.chunk_idx = k.keep_chunk_idx)
               AS is_dup
    FROM chunks c JOIN k USING (chunk_hash)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_chunks,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
FROM m GROUP BY doc_id
"""


_CHUNK_INTERVALS_ORACLE = f"""
WITH {_CHUNK_KEEPER_CTE}, d AS (
    SELECT c.doc_id,
           CAST(c.chunk_idx AS BIGINT) * {_CHUNK_S} AS s,
           CAST(c.chunk_idx AS BIGINT) * {_CHUNK_S} + c.chunk_tokens AS e
    FROM chunks c JOIN k USING (chunk_hash)
    WHERE NOT (c.doc_id = k.keep_doc_id AND c.chunk_idx = k.keep_chunk_idx)
), g AS (
    SELECT doc_id, s, e,
           SUM(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s
                     ROWS UNBOUNDED PRECEDING) AS grp
    FROM (
        SELECT doc_id, s, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pe
        FROM d
    )
)
SELECT doc_id, MIN(s) AS span_start, MAX(e) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM g GROUP BY doc_id, grp
"""


_INCR_CHUNK_ORACLE = f"""
WITH {_CHUNKS_CTE},
split AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cut FROM documents),
seen AS (SELECT DISTINCT chunk_hash FROM chunks, split WHERE doc_id <= cut),
batch AS (
    SELECT c.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_hash,
           row_number() OVER (PARTITION BY chunk_hash
                              ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks c, split WHERE doc_id > cut
)
SELECT doc_id, chunk_idx, chunk_tokens, chunk_hash,
       (rn > 1 OR chunk_hash IN (SELECT chunk_hash FROM seen)) AS is_dup
FROM batch
"""


_H60_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


_WINNOW_CTE = f"""{{toks}}, g AS (
    SELECT doc_id,
           list_transform(range(1, len(t) - 1),
               i -> {_H60_SQL.format(x="concat_ws(' ', t[i], t[i+1], t[i+2])")}) AS g
    FROM toks
), wn AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(g) - 3, 1) + 1),
               i -> list_min(list_slice(g, i, i + 3)))) AS wf
    FROM g WHERE len(g) > 0
)"""


_WINNOW_FP_ORACLE = f"""
WITH {_WINNOW_CTE.format(toks=_TOKS_CTE)}
SELECT doc_id, unnest(wf) AS fp FROM wn
"""


_WINNOW_PAIRS_ORACLE = f"""
WITH {_WINNOW_CTE.format(toks=_TOKS_CTE)},
p AS (SELECT doc_id, unnest(wf) AS fp FROM wn),
keep AS (
    SELECT fp FROM p GROUP BY fp
    HAVING count(*) <= (SELECT greatest(2, count(*) // 100) FROM documents)
),
pc AS (SELECT p.doc_id, p.fp FROM p JOIN keep USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM pc a JOIN pc b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


_WINNOW_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_WINNOW_CTE.format(toks=_TOKS_CTE)},
p AS (SELECT doc_id, unnest(wf) AS fp FROM wn),
keep AS (
    SELECT fp FROM p GROUP BY fp
    HAVING count(*) <= (SELECT greatest(2, count(*) // 100) FROM documents)
),
pc AS (SELECT p.doc_id, p.fp FROM p JOIN keep USING (fp)),
np AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM pc a JOIN pc b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM np
    UNION
    SELECT id_b AS src, id_a AS dst FROM np
),
reach(node, r) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node
"""


_WINNOW_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_WINNOW_CTE.format(toks=_TOKS_CTE)},
p AS (SELECT doc_id, unnest(wf) AS fp FROM wn),
keep AS (
    SELECT fp FROM p GROUP BY fp
    HAVING count(*) <= (SELECT greatest(2, count(*) // 100) FROM documents)
),
pc AS (SELECT p.doc_id, p.fp FROM p JOIN keep USING (fp)),
np AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM pc a JOIN pc b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM np
    UNION
    SELECT id_b AS src, id_a AS dst FROM np
),
reach(node, r) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node)
SELECT d.doc_id AS doc_id, d.source AS source,
       CAST(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_cluster
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.node AND c.node = c.component
WHERE NOT EXISTS (
    SELECT 1 FROM comp x WHERE x.node = d.doc_id AND x.node <> x.component
)
"""


# Incremental winnow near-dup: the NEW half of the corpus against the
# ingested half's (hot-fp-capped) fingerprint store — the cap counts
# CORPUS-half doc frequency over CORPUS-half docs only (frozen at
# ingest; a per-batch cap would drift). Best match per batch doc by
# shared-fingerprint count, ties to the smallest corpus id.
_INCR_WINNOW_ORACLE = f"""
WITH {_WINNOW_CTE.format(toks=_TOKS_CTE)},
split AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cut FROM documents),
p AS (SELECT doc_id, unnest(wf) AS fp FROM wn),
sp AS (SELECT p.doc_id, p.fp FROM p, split WHERE p.doc_id <= cut),
keep AS (
    SELECT fp FROM sp GROUP BY fp
    HAVING count(*) <= (SELECT greatest(2, count(*) // 100)
                        FROM documents, split WHERE doc_id <= cut)
),
sc AS (SELECT sp.doc_id, sp.fp FROM sp JOIN keep USING (fp)),
bp AS (SELECT p.doc_id, p.fp FROM p, split WHERE p.doc_id > cut),
shared AS (
    SELECT b.doc_id AS doc_id, s.doc_id AS match_id,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM bp b JOIN sc s ON b.fp = s.fp
    GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT doc_id, match_id, shared_fps FROM (
    SELECT shared.*, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY shared_fps DESC, match_id) AS rn
    FROM shared
) WHERE rn = 1
"""


def _pii_sql_exprs() -> tuple[str, list[str]]:
    # Counts cascade like the replacements (each class counted on the
    # text with earlier classes redacted) — mirrors text.pii_scrub.
    scrub = "coalesce(text, '')"
    counts = []
    for name, pat, repl in _text.PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({scrub}, '{pat}'))"
            f" AS BIGINT) AS n_{name}"
        )
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return scrub, counts



_PII_SCRUB_EXPR, _PII_COUNT_EXPRS = _pii_sql_exprs()
_PII_SCRUB_ORACLE = f"""
SELECT doc_id, {_PII_SCRUB_EXPR} AS scrubbed,
       {", ".join(_PII_COUNT_EXPRS)}
FROM documents
"""


_PII_REPORT_ORACLE = f"""
WITH p AS (
    SELECT {", ".join(_PII_COUNT_EXPRS)} FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN {" + ".join(f"n_{n}" for n, _, _ in _text.PII_PATTERNS)} > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       {", ".join(f"CAST(SUM(n_{n}) AS BIGINT) AS total_{n}" for n, _, _ in _text.PII_PATTERNS)}
FROM p
"""


_BUCKET_SQL = "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"


_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source FROM (
    SELECT doc_id, lang, source, {_BUCKET_SQL} AS b FROM documents
) WHERE b < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
"""


_SPLIT_ORACLE = f"""
SELECT split, lang, COUNT(*) AS n_docs FROM (
    SELECT lang, CASE WHEN b < 80 THEN 'train'
                      WHEN b < 90 THEN 'valid'
                      ELSE 'test' END AS split
    FROM (SELECT lang, {_BUCKET_SQL} AS b FROM documents)
) GROUP BY split, lang
"""


_NTILE_ORACLE = """
SELECT lang, CAST(quartile AS INTEGER) AS quartile,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM (
    SELECT lang, n_chars,
           NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS quartile
    FROM documents
)
GROUP BY 1, 2
"""


_OOV_ORACLE = f"""
WITH {_TOKS_CTE},
ex AS (
    SELECT doc_id, u.tok FROM toks, unnest(toks.t) AS u(tok)
),
freq AS (
    SELECT tok, count(*) AS n FROM ex GROUP BY 1
),
vocab AS (
    SELECT tok FROM freq ORDER BY n DESC, tok LIMIT 10
),
oov AS (
    SELECT e.doc_id, count(*) AS n_oov
    FROM ex e LEFT JOIN vocab v ON e.tok = v.tok
    WHERE v.tok IS NULL
    GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
       CASE WHEN len(t.t) > 0
            THEN CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / CAST(len(t.t) AS DOUBLE)
            ELSE 0.0 END AS oov_rate
FROM toks t LEFT JOIN oov o USING (doc_id)
"""


_PREP_ORACLE = f"""
WITH {_TOKS_CTE},
stats AS (
    SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens
    FROM toks
    WHERE len(t) >= 20
      AND CAST(len(list_filter(t, x -> x IN ({_stop_list('en')}))) AS DOUBLE)
          / CAST(len(t) AS DOUBLE) >= 0.03
      AND CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) >= 0.35
),
fp AS (
    SELECT doc_id, n_tokens, md5(coalesce(array_to_string(t, ' '), '')) AS fingerprint,
           row_number() OVER (PARTITION BY md5(coalesce(array_to_string(t, ' '), ''))
                              ORDER BY doc_id) AS rn
    FROM stats
),
sp AS (
    SELECT f.doc_id, f.n_tokens,
           CASE WHEN {_BUCKET_SQL.replace('doc_id', 'f.doc_id')} < 80 THEN 'train'
                WHEN {_BUCKET_SQL.replace('doc_id', 'f.doc_id')} < 90 THEN 'valid'
                ELSE 'test' END AS split,
           concat(CASE WHEN {_BUCKET_SQL.replace('doc_id', 'f.doc_id')} < 80 THEN 'train'
                       WHEN {_BUCKET_SQL.replace('doc_id', 'f.doc_id')} < 90 THEN 'valid'
                       ELSE 'test' END, '|', d.source) AS shard
    FROM fp f JOIN documents d ON f.doc_id = d.doc_id
    WHERE f.rn = 1
),
packed AS (
    SELECT split, shard, n_tokens,
           (SUM(n_tokens) OVER w - n_tokens) // 512 AS seq_id
    FROM sp
    WINDOW w AS (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT (shard, seq_id)) AS BIGINT) AS n_sequences
FROM packed
GROUP BY 1
"""


_REPETITION_ORACLE = f"""
WITH {_TOKS_CTE},
gr AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                ELSE [] END AS g
    FROM toks
)
SELECT doc_id,
       CAST(len(g) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct_ngrams,
       CASE WHEN len(g) > 0
            THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
            ELSE 0.0 END AS repetition_ratio,
       CAST(CASE WHEN len(g) > 0
                  AND 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE) > 0.2
                 THEN 1 ELSE 0 END AS INTEGER) AS is_repetitive
FROM gr
"""


_PACK_ORACLE = """
WITH tk AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS token_offset,
       CAST((SUM(n_tokens) OVER w - n_tokens) // 512 AS BIGINT) AS seq_id
FROM tk
WINDOW w AS (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


_PAIR_SOURCES_ORACLE = f"""
WITH {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_JACCARD_VERIFY},
np AS (
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
)
SELECT least(da.source, db.source) AS source_lo,
       greatest(da.source, db.source) AS source_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       max(np.jaccard) AS max_jaccard
FROM np
JOIN documents da ON np.id_a = da.doc_id
JOIN documents db ON np.id_b = db.doc_id
GROUP BY 1, 2
"""


def _simhash_cluster_oracle(bits: int = 32, maxh: int = 3) -> str:
    # The oracle runs the plain quadratic join over DISTINCT fingerprints
    # (tiny); the Spark side band-blocks it — lossless for
    # maxh < n_bands, so results match exactly.
    return f"""
WITH sims AS ({_simhash_oracle(bits)}),
fps AS (SELECT simhash, min(doc_id) AS rep FROM sims GROUP BY 1),
cmap AS (
    SELECT a.simhash, min(b.rep) AS cluster_rep
    FROM fps a JOIN fps b ON bit_count(xor(a.simhash, b.simhash)) <= {maxh}
    GROUP BY 1
)
SELECT s.doc_id, c.cluster_rep FROM sims s JOIN cmap c USING (simhash)
"""


def _diversity_oracle(per_cluster: int = 2) -> str:
    # Cluster assignment = the simhash-cluster oracle; the pick order
    # inside each cluster is (md5-h60(doc_id), doc_id) — deterministic,
    # so the sampled SET (not just its size) matches cross-engine.
    return f"""
WITH sims AS ({_simhash_oracle(32)}),
fps AS (SELECT simhash, min(doc_id) AS rep FROM sims GROUP BY 1),
cmap AS (
    SELECT a.simhash, min(b.rep) AS cluster_rep
    FROM fps a JOIN fps b ON bit_count(xor(a.simhash, b.simhash)) <= 3
    GROUP BY 1
),
assigned AS (SELECT s.doc_id, c.cluster_rep FROM sims s JOIN cmap c USING (simhash)),
ranked AS (
    SELECT doc_id, cluster_rep,
           row_number() OVER (
               PARTITION BY cluster_rep
               ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        doc_id
           ) AS rn
    FROM assigned
)
SELECT doc_id, cluster_rep, CAST(rn AS INTEGER) AS pick_rank
FROM ranked WHERE rn <= {per_cluster}
"""


_FUNNEL_ORACLE = """
WITH v AS (SELECT user_id, min(ts) AS tv FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
      JOIN v ON e.user_id = v.user_id AND e.ts >= v.tv
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts >= c.tc
      WHERE e.event_type = 'purchase' GROUP BY 1),
j AS (SELECT v.user_id, tv, tc, tp
      FROM v LEFT JOIN c ON v.user_id = c.user_id
             LEFT JOIN p ON v.user_id = p.user_id)
SELECT 'view' AS stage, CAST(0 AS INT) AS stage_idx, COUNT(tv) AS n_users FROM j
UNION ALL
SELECT 'click', CAST(1 AS INT), COUNT(tc) FROM j
UNION ALL
SELECT 'purchase', CAST(2 AS INT), COUNT(tp) FROM j
"""


_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate"]


def _profile_oracle() -> str:
    aggs = ["COUNT(*) AS n"]
    selects = []
    for i, c in enumerate(_PROFILE_COLS):
        aggs += [
            f"COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS null{i}",
            f"COUNT(DISTINCT {c}) AS dist{i}",
            f"CAST(MIN({c}) AS VARCHAR) AS min{i}",
            f"CAST(MAX({c}) AS VARCHAR) AS max{i}",
        ]
        selects.append(
            f"SELECT '{c}' AS col_name, n AS n_rows, null{i} AS n_null, "
            f"dist{i} AS n_distinct, min{i} AS min_val, max{i} AS max_val FROM a"
        )
    return "WITH a AS (SELECT " + ", ".join(aggs) + " FROM orders)\n" + "\nUNION ALL\n".join(selects)


_LATE_SHIP_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


_LINESTATUS_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


_LARGE_ORDERS_ORACLE = """
WITH big AS (
    SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
    FROM lineitem GROUP BY 1
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c_name, o_orderkey AS orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
       CAST(qty AS DOUBLE) AS total_qty
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
"""


_H60_SQL = "CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT)"


_DECONTAM_ORACLE = f"""
WITH {_TOKS_CTE}, {_SH_CTE},
h AS (SELECT doc_id, {_H60_SQL} AS h FROM sh),
bench AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, h FROM h WHERE doc_id % 97 <> 0),
cd AS (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0),
sizes AS (
    SELECT cd.doc_id, COALESCE(x.cnt, 0) AS n_shingles
    FROM cd LEFT JOIN (SELECT doc_id, count(DISTINCT h) AS cnt FROM corpus GROUP BY 1) x
    USING (doc_id)
),
ov AS (
    SELECT c.doc_id, count(DISTINCT c.h) AS n_overlap
    FROM corpus c JOIN bench USING (h) GROUP BY 1
)
SELECT s.doc_id, s.n_shingles, COALESCE(ov.n_overlap, 0) AS n_overlap,
       CASE WHEN s.n_shingles > 0
            THEN CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / CAST(s.n_shingles AS DOUBLE)
            ELSE 0.0 END AS overlap_ratio
FROM sizes s LEFT JOIN ov ON s.doc_id = ov.doc_id
"""


_BIGRAM_ORACLE = f"""
WITH {_TOKS_CTE}, pairs AS (
    SELECT concat_ws(' ', t[i], t[i+1]) AS bigram
    FROM toks, unnest(range(1, len(t))) AS u(i)
    WHERE len(t) >= 2
)
SELECT bigram, n, CAST(rnk AS INT) AS rnk FROM (
    SELECT bigram, count(*) AS n,
           ROW_NUMBER() OVER (ORDER BY count(*) DESC, bigram) AS rnk
    FROM pairs GROUP BY 1
) WHERE rnk <= 50
"""


_OHLC_ORACLE = """
WITH r AS (
    SELECT event_type, date_trunc('hour', ts) AS hour, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts, event_id) AS ra,
           ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rd
    FROM events
)
SELECT event_type, hour,
       MAX(CASE WHEN ra = 1 THEN value END) AS open_v,
       MAX(value) AS high_v,
       MIN(value) AS low_v,
       MAX(CASE WHEN rd = 1 THEN value END) AS close_v,
       COUNT(*) AS n_events
FROM r GROUP BY 1, 2
"""


_HIST_ORACLE = """
WITH b AS (
    SELECT CAST(floor(value / 25) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM events GROUP BY 1
)
SELECT bucket, n, CAST(n AS DOUBLE) / SUM(n) OVER () AS share FROM b
"""


_SCD2_ORACLE = """
WITH c AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ch AS (SELECT * FROM c WHERE prev_type IS NULL OR prev_type <> event_type)
SELECT user_id, event_type AS state, ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       CAST(CASE WHEN LEAD(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM ch
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


_OUTLIER_ORACLE = f"""
WITH {_QUANT_CTE},
dims AS (
    SELECT i AS pos,
           CAST(floor(CAST(SUM(qe[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
    FROM q, unnest(range(1, 65)) AS t(i)
    GROUP BY i
),
cent AS (SELECT list(m ORDER BY pos) AS ce FROM dims),
scored AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * ce[i])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i])) AS DOUBLE))) AS cos_centroid
    FROM q CROSS JOIN cent
)
SELECT vec_id, cos_centroid,
       CAST(CASE WHEN cos_centroid < 0.0 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM scored
"""


_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_JACCARD_VERIFY},
np AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM np
    UNION
    SELECT id_b AS src, id_a AS dst FROM np
),
reach(node, r) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
)
SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node
"""


_PIT_ORACLE = """
WITH c AS (
    SELECT user_id, ts, event_id, event_type,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hist AS (
    SELECT user_id, event_type AS state, ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
    FROM c WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT p.event_id, p.user_id, p.ts, h.state AS state_at_purchase
FROM events p
JOIN hist h ON p.user_id = h.user_id
           AND h.valid_from <= p.ts
           AND (h.valid_to IS NULL OR p.ts < h.valid_to)
WHERE p.event_type = 'purchase'
"""


_CANON_ORACLE = """
WITH n AS (SELECT DISTINCT p_name FROM part),
cmap AS (
    SELECT a.p_name, min(b.p_name) AS canonical
    FROM n a JOIN n b ON levenshtein(a.p_name, b.p_name) <= 1
    GROUP BY 1
)
SELECT p.p_partkey, p.p_name, c.canonical
FROM part p JOIN cmap c USING (p_name)
"""


_FUZZY_LINK_ORACLE = """
WITH names AS (SELECT DISTINCT p_name FROM part WHERE length(p_name) > 0),
probes AS (
    SELECT DISTINCT
        substring(p_name, 1, dp - 1) || substring(p_name, dp + 1) AS probe_name
    FROM (
        SELECT p_name,
               CAST(('0x' || substring(md5(p_name), 1, 15)) AS BIGINT)
                   % length(p_name) + 1 AS dp
        FROM names
    )
)
SELECT p.probe_name, n.p_name,
       CAST(levenshtein(p.probe_name, n.p_name) AS INTEGER) AS dist
FROM probes p JOIN names n ON levenshtein(p.probe_name, n.p_name) <= 1
"""


_PROMO_ORACLE = """
SELECT date_trunc('month', l_shipdate) AS month,
       CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CASE WHEN SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) = 0 THEN NULL
            ELSE 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) END AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_TOKS_CTE}, {_SH_CTE}, {_SH_CAP_CTE}, {_JACCARD_VERIFY},
np AS (
    SELECT id_a, id_b
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM np
    UNION
    SELECT id_b AS src, id_a AS dst FROM np
),
reach(node, r) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node)
SELECT d.doc_id AS doc_id, d.source AS source,
       CAST(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END AS INT) AS in_cluster
FROM documents d
LEFT JOIN comp c ON d.doc_id = c.node AND c.node = c.component
WHERE NOT EXISTS (
    SELECT 1 FROM comp x WHERE x.node = d.doc_id AND x.node <> x.component
)
"""


_PMI_ORACLE = f"""
WITH {_TOKS_CTE},
uni AS (
    SELECT u.w AS w, CAST(count(*) AS BIGINT) AS c
    FROM toks, unnest(t) AS u(w) GROUP BY 1
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni),
nb AS (
    SELECT CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bi FROM toks
),
bi AS (
    SELECT t[i] AS w1, t[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c_ab
    FROM toks, unnest(range(1, len(t))) AS r(i)
    GROUP BY 1, 2
    HAVING count(*) >= 5
),
scored AS (
    SELECT bi.w1 || ' ' || bi.w2 AS bigram, bi.c_ab, a.c AS c_a, b.c AS c_b,
           CAST(bi.c_ab * tot.n_uni * tot.n_uni AS DOUBLE)
           / CAST(nb.n_bi * a.c * b.c AS DOUBLE) AS pmi_ratio
    FROM bi JOIN uni a ON bi.w1 = a.w JOIN uni b ON bi.w2 = b.w, tot, nb
)
SELECT bigram, c_ab, c_a, c_b, pmi_ratio,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi_ratio DESC, bigram) AS INT) AS rnk
FROM scored
ORDER BY pmi_ratio DESC, bigram
LIMIT 50
"""


_MIXTURE_ORACLE = """
WITH tk AS (
    SELECT doc_id, source,
           CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                t -> t <> '')) AS BIGINT) AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS ok
    FROM documents
),
off AS (
    SELECT doc_id, source, n_tokens,
           CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS token_offset
    FROM tk
    WINDOW w AS (PARTITION BY source ORDER BY ok
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT doc_id, source, n_tokens, token_offset
FROM off
WHERE token_offset < (CASE source WHEN 'src0' THEN 200
                                  WHEN 'src1' THEN 100000000
                                  ELSE 600 END)
"""


_ASOF_FWD_ORACLE = """
WITH views AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
    SELECT user_id, ts, min(event_id) AS event_id
    FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT v.user_id AS user_id, v.ts AS ts, v.event_id AS event_id,
       p.ts AS purchase_ts, p.event_id AS purchase_event_id
FROM views v
ASOF LEFT JOIN purchases p ON v.user_id = p.user_id AND v.ts <= p.ts
"""


_RESAMPLE_ORACLE = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket,
           last(value ORDER BY ts, event_id) AS r
    FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), spans AS (
    SELECT event_type, min(bucket) AS mn, max(bucket) AS mx
    FROM hourly GROUP BY 1
), spine AS (
    SELECT event_type,
           unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
    FROM spans
)
SELECT s.event_type, s.bucket,
       LAST_VALUE(h.r IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reading,
       (h.r IS NULL) AS is_gap
FROM spine s LEFT JOIN hourly h USING (event_type, bucket)
"""


_TREND_ORACLE = """
WITH pts AS (
    SELECT event_type,
           epoch_us(ts) // 1000000 AS x,
           CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), s AS (
    SELECT event_type, COUNT(*) AS n,
           SUM(x) AS sx, SUM(yi) AS syi,
           SUM(CAST(x AS HUGEINT) * yi) AS sxy,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
    FROM pts GROUP BY 1
), d AS (
    SELECT event_type, n,
           CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
           CAST(syi AS DOUBLE) AS syid,
           CAST(CAST(n AS HUGEINT) * sxy
                - CAST(sx AS HUGEINT) * syi AS DOUBLE) AS numd,
           CAST(CAST(n AS HUGEINT) * sxx
                - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE) AS dend
    FROM s
)
SELECT event_type, n,
       (numd / NULLIF(dend, 0.0) / 1000000.0) * 86400.0 AS slope_per_day,
       (syid / 1000000.0
        - (numd / NULLIF(dend, 0.0) / 1000000.0) * sxd) / nd AS intercept
FROM d
"""


def _zorder_oracle() -> str:
    from airbnb_cdc_spark.operators.zorder import zvalue_sql

    shift = 2 * _ZORDER_BITS - _ZORDER_FILE_BITS
    return f"""
WITH q AS (
    SELECT (user_id % 256) AS x,
           ((epoch_us(ts) // 1000000 // 3600) % 256) AS y
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), z AS (
    SELECT x, y, {zvalue_sql("x", "y", _ZORDER_BITS)} AS zv FROM q
)
SELECT (zv >> {shift}) AS zfile,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY 1
"""


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(LEAST(1000, len(t) * 10) AS BIGINT) AS weight
FROM toks
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 < LEAST(1000, len(t) * 10)
"""


_EXPECTATIONS_ORACLE = """
SELECT 'not_null(o_custkey)' AS "constraint",
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_violations,
       COUNT(*) AS n_checked
FROM orders
UNION ALL
SELECT 'in_range(o_totalprice, 0.0, 1000000.0)',
       CAST(COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL
                             AND (o_totalprice < 0 OR o_totalprice > 1000000)) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'unique(o_orderkey)',
       CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c - 1 END), 0) AS BIGINT),
       CAST(COALESCE(SUM(c), 0) AS BIGINT)
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'foreign_key(o_custkey)',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       COUNT(*)
FROM orders
"""


_TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type AS cur,
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev
    FROM events
), pairs AS (
    SELECT prev, cur, COUNT(*) AS n FROM seq WHERE prev IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev, cur, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev) AS prob
FROM pairs
"""


_TS_SIM_ORACLE = """
WITH hourly AS (
    SELECT event_type, CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS s
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
), qd AS (
    SELECT MIN(CAST(ts AS DATE)) AS qd FROM events WHERE value IS NOT NULL
), q AS (
    SELECT h, s AS qs FROM hourly, qd
    WHERE event_type = 'purchase' AND d = qd.qd
), sq2 AS (
    SELECT COALESCE(SUM(qs * qs), 0) AS v FROM q
), cand AS (
    SELECT hourly.* FROM hourly, qd
    WHERE NOT (event_type = 'purchase' AND d = qd.qd)
), per AS (
    SELECT c.event_type, c.d,
           SUM(c.s * c.s) AS sc2,
           SUM(c.s * COALESCE(q.qs, CAST(0 AS DECIMAL(19,6)))) AS dot
    FROM cand c LEFT JOIN q ON c.h = q.h
    GROUP BY 1, 2
)
SELECT event_type, d,
       CAST(sc2 + sq2.v - 2 * dot AS DOUBLE) AS dist2
FROM per, sq2
ORDER BY dist2, event_type, d
LIMIT 10
"""


def _sentiment_oracle() -> str:
    from airbnb_cdc_spark.functions.textfns import SENTIMENT_LEXICON

    pos = ", ".join(f"'{w}'" for w in SENTIMENT_LEXICON["pos"])
    neg = ", ".join(f"'{w}'" for w in SENTIMENT_LEXICON["neg"])
    return f"""
WITH {_TOKS_CTE}
SELECT doc_id,
       CAST(len(list_filter(t, x -> x IN ({pos}))) AS BIGINT) AS pos_hits,
       CAST(len(list_filter(t, x -> x IN ({neg}))) AS BIGINT) AS neg_hits,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(t, x -> x IN ({pos})))
            - len(list_filter(t, x -> x IN ({neg}))) AS DOUBLE)
           / NULLIF(CAST(len(t) AS BIGINT), 0) AS polarity
FROM toks
"""


_DECILES_ORACLE = """
WITH c AS (
    SELECT o_totalprice AS v, COUNT(*) AS n FROM orders GROUP BY 1
), s AS (
    SELECT v, n,
           SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS r
    FROM c
), t AS (SELECT SUM(n) AS total FROM c),
qs AS (SELECT unnest(range(1, 10)) AS q)
SELECT CAST(qs.q AS INT) AS decile, s.v AS value
FROM qs CROSS JOIN t JOIN s
  ON (s.r - s.n) < (qs.q * t.total + 9) // 10
 AND (qs.q * t.total + 9) // 10 <= s.r
"""


_PAGERANK_ORACLE = """
WITH e AS (
    SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                    'c' || CAST(o_custkey AS VARCHAR) AS dst
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM nodes),
p0 AS (SELECT node, 1000000000000 // n AS pr FROM nodes, nn),
i1 AS (
    SELECT nodes.node, 150000000000 // n + (85 * COALESCE(s.m, 0)) // 100 AS pr
    FROM nodes CROSS JOIN nn
    LEFT JOIN (SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS m
               FROM e JOIN p0 p ON e.src = p.node
                      JOIN deg d ON e.src = d.node
               GROUP BY 1) s ON nodes.node = s.node
),
i2 AS (
    SELECT nodes.node, 150000000000 // n + (85 * COALESCE(s.m, 0)) // 100 AS pr
    FROM nodes CROSS JOIN nn
    LEFT JOIN (SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS m
               FROM e JOIN i1 p ON e.src = p.node
                      JOIN deg d ON e.src = d.node
               GROUP BY 1) s ON nodes.node = s.node
),
i3 AS (
    SELECT nodes.node, 150000000000 // n + (85 * COALESCE(s.m, 0)) // 100 AS pr
    FROM nodes CROSS JOIN nn
    LEFT JOIN (SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS m
               FROM e JOIN i2 p ON e.src = p.node
                      JOIN deg d ON e.src = d.node
               GROUP BY 1) s ON nodes.node = s.node
)
SELECT node, CAST(pr AS BIGINT) AS pr FROM i3
"""


_VALUE_OUTLIER_ORACLE = """
WITH yi AS (
    SELECT event_id, event_type, value,
           CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS y
    FROM events WHERE value IS NOT NULL
), s AS (
    SELECT event_type, COUNT(*) AS n, SUM(y) AS s1, SUM(y * y) AS s2
    FROM yi GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       (CAST(n AS HUGEINT) * e.y - s1) * (CAST(n AS HUGEINT) * e.y - s1)
           > 9 * (CAST(n AS HUGEINT) * s2 - s1 * s1) AS is_outlier
FROM yi e JOIN s USING (event_type)
"""


_PARETO_ORACLE = """
WITH spend AS (
    SELECT o_custkey AS customer_id,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
    FROM orders GROUP BY 1
), scanned AS (
    SELECT customer_id, spend,
           SUM(spend) OVER (ORDER BY spend DESC, customer_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_spend,
           SUM(spend) OVER () AS total
    FROM spend
)
SELECT customer_id,
       CAST(spend AS DOUBLE) AS spend,
       CAST(running_spend AS DOUBLE) AS running_spend,
       CAST(running_spend AS DOUBLE) / NULLIF(CAST(total AS DOUBLE), 0.0)
           AS cum_share,
       (CAST(running_spend AS DOUBLE) / NULLIF(CAST(total AS DOUBLE), 0.0))
           <= 0.8 AS in_top80
FROM scanned
"""


_RAW_URL_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END)
    || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN upper(source || '.Example.com')
             ELSE source || '.Example.com' END)
    || (CASE WHEN doc_id % 7 = 0 AND doc_id % 2 = 0 THEN ':443' ELSE '' END)
    || '/docs/' || CAST(doc_id % 150 AS VARCHAR)
    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR)
             WHEN doc_id % 11 = 0
             THEN '?id=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_campaign=x'
             ELSE '?id=' || CAST(doc_id % 10 AS VARCHAR) END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
"""


_CANON_URL_SQL = (
    "'https://' || lower(source) || '.example.com/docs/' "
    "|| CAST(doc_id % 150 AS VARCHAR) || '?id=' || CAST(doc_id % 10 AS VARCHAR)"
)


_URL_DEDUP_ORACLE = f"""
WITH urls AS (
    SELECT doc_id, {_RAW_URL_SQL} AS url, {_CANON_URL_SQL} AS canonical_url
    FROM documents
)
SELECT canonical_url,
       MIN(doc_id) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_raw
FROM urls GROUP BY 1
"""


_DOMAIN_CAP = 5


_DOMAIN_CAP_ORACLE = f"""
WITH ranked AS (
    SELECT lower(source) || '.example.com' AS domain, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                             AS BIGINT), doc_id
           ) AS rnk
    FROM documents
)
SELECT domain, doc_id, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {_DOMAIN_CAP}
"""


# KMV range rollup: replays the sketch algebra exactly — per-day k-min
# sets, pooled union k-min, the (k-1)*2^60/h_k estimator (exact-m
# branch when the union undershoots k). Shares the h60 convention.
_KMV_ROLLUP_K = 64
_KMV_ROLLUP_LO, _KMV_ROLLUP_HI = "2024-01-08", "2024-01-21"

_KMV_ROLLUP_ORACLE = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS d, user_id FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{_KMV_ROLLUP_LO}' AND DATE '{_KMV_ROLLUP_HI}'
), uh AS (
    SELECT DISTINCT d,
           CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM ev
), ranked AS (
    SELECT d, h, ROW_NUMBER() OVER (PARTITION BY d ORDER BY h) AS rn FROM uh
), pooled AS (
    SELECT DISTINCT h FROM ranked WHERE rn <= {_KMV_ROLLUP_K}
), kmin AS (
    SELECT h FROM pooled ORDER BY h LIMIT {_KMV_ROLLUP_K}
), ag AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS m, MAX(h) AS hk FROM kmin
), nd AS (
    SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days FROM ev
)
SELECT n_days, m,
       CASE WHEN m < {_KMV_ROLLUP_K} THEN CAST(m AS DOUBLE)
            ELSE {float(_KMV_ROLLUP_K - 1)} * 1152921504606846976.0
                 / CAST(hk AS DOUBLE) END AS est_distinct
FROM ag, nd
"""


def _incr_minhash_oracle(k: int = 8, band_size: int = 2, min_agree: int = 4) -> str:
    """Replays incremental_minhash_neardup exactly: UNCAPPED shingle
    hashes (signature comparability across time forbids a corpus-
    frequency cap), the k affine minhash transforms, batch-vs-corpus
    band candidates, integer signature-agreement verify, best match
    per batch doc (highest agreement, ties to smallest corpus id)."""
    from airbnb_cdc_spark.operators.dedup import (
        _MINHASH_BASE_MOD,
        MINHASH_P,
        minhash_params,
    )

    mins = ", ".join(
        f"min(({a} * (h % {_MINHASH_BASE_MOD}) + {b}) % {MINHASH_P}) AS mh{j}"
        for j, (a, b) in enumerate(minhash_params(k))
    )
    bands = ", ".join(
        "concat_ws('|', '%d', %s)"
        % (b, ", ".join(f"mh{b * band_size + r}" for r in range(band_size)))
        for b in range(k // band_size)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh{j} = c.mh{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    return f"""
WITH {_TOKS_CTE}, {_SH_CTE},
hashed AS (SELECT doc_id, CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
split AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS cut FROM documents),
bands AS (SELECT doc_id, unnest([{bands}]) AS bucket FROM sig),
cand AS (
    SELECT DISTINCT b.doc_id AS bid, c.doc_id AS cid
    FROM bands b JOIN bands c USING (bucket), split
    WHERE b.doc_id > cut AND c.doc_id <= cut
),
ver AS (
    SELECT cand.bid, cand.cid, ({agree}) AS agree
    FROM cand
    JOIN sig a ON a.doc_id = cand.bid
    JOIN sig c ON c.doc_id = cand.cid
    WHERE ({agree}) >= {min_agree}
),
best AS (
    SELECT bid, cid, agree,
           ROW_NUMBER() OVER (PARTITION BY bid ORDER BY agree DESC, cid) AS rn
    FROM ver
)
SELECT bid AS doc_id, cid AS match_id, CAST(agree AS INT) AS n_agree
FROM best WHERE rn = 1
"""


# Concatenation packing: running token-sum offsets over doc_id order,
# cut into fixed windows; one row per (sequence, doc) overlap with the
# doc-relative slice. Exact integer arithmetic end to end.
_PACK_CONCAT_LEN = 512

_PACK_CONCAT_ORACLE = f"""
WITH {_TOKS_CTE},
cnt AS (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM toks WHERE len(t) > 0
),
sc AS (
    SELECT doc_id, n,
           -- DuckDB widens SUM(BIGINT) to HUGEINT; range() needs BIGINT
           CAST(SUM(n) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS ge
    FROM cnt
),
spans AS (
    SELECT doc_id, ge - n AS gs, ge,
           unnest(range((ge - n) // {_PACK_CONCAT_LEN},
                        (ge - 1) // {_PACK_CONCAT_LEN} + 1)) AS seq_id
    FROM sc
)
SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
       CAST(greatest(gs, seq_id * {_PACK_CONCAT_LEN}) - gs AS BIGINT) AS tok_start,
       CAST(least(ge, (seq_id + 1) * {_PACK_CONCAT_LEN}) - gs AS BIGINT) AS tok_end
FROM spans
"""


# CCNet-style boilerplate strip: non-overlapping W-token segments,
# drop every segment whose hash appears in >= min_df DISTINCT docs
# (ALL copies, unlike first-wins chunk dedup), re-join survivors in
# order. Shared constants with the Spark query body.
_BOILER_W, _BOILER_MIN_DF = 16, 2

_BOILERPLATE_ORACLE = f"""
WITH {_TOKS_CTE}, c AS (
    SELECT doc_id, t, len(t) AS n,
           CAST((len(t) + {_BOILER_W - 1}) // {_BOILER_W} AS INT) AS ns
    FROM toks
), segs AS (
    SELECT doc_id, CAST(i - 1 AS INT) AS seg_idx,
           array_to_string(list_slice(t, (i-1)*{_BOILER_W} + 1,
                                      least(i*{_BOILER_W}, n)), ' ') AS seg
    FROM c, unnest(range(1, ns + 1)) AS u(i)
), freq AS (
    SELECT md5(seg) AS h, count(DISTINCT doc_id) AS df
    FROM segs GROUP BY md5(seg)
), kept AS (
    SELECT s.doc_id, s.seg_idx, s.seg FROM segs s
    WHERE md5(s.seg) NOT IN (SELECT h FROM freq WHERE df >= {_BOILER_MIN_DF})
), perdoc AS (
    SELECT doc_id, count(*) AS nk,
           string_agg(seg, ' ' ORDER BY seg_idx) AS clean
    FROM kept GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(c.ns AS BIGINT) AS n_segments,
       CAST(c.ns - COALESCE(p.nk, 0) AS BIGINT) AS n_dropped,
       md5(COALESCE(p.clean, '')) AS clean_fingerprint
FROM c LEFT JOIN perdoc p USING (doc_id)
"""


# BM25 top-k retrieval: rational Robertson-Sparck-Jones idf (no float
# log — same monotone df ordering), binary-exact k1=1.25 / b=0.75, and
# a fixed left-to-right score expression generated from the SAME term
# constants as the Spark body, so both engines run the identical
# sequence of correctly-rounded IEEE double ops. See
# operators/retrieval.py for the full determinism contract.
# term choice: all three are in the differential generator's word pool
# (tests/test_oracle_differential.py WORDS) so randomized corpora draw
# real matches, and the driver corpus contains the first two at high /
# medium frequency ('zz' exercises the tf=0 -> zero-contribution leg).
_BM25_TERMS = ("the", "scan", "zz")
_BM25_K = 10


def _bm25_oracle(terms: tuple[str, ...] = _BM25_TERMS, k: int = _BM25_K) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    idx = range(1, len(terms) + 1)
    tf_cols = ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE term = '{t}') AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms, 1)
    )
    df_cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE tf_{i} > 0) AS DOUBLE) AS df_{i}"
        for i in idx
    )
    norm = "(CAST(dl AS DOUBLE) * __n / __t)"
    s = " + ".join(
        f"(((2.0*__n - 2.0*df_{i} + 1.0) / (2.0*df_{i} + 1.0))"
        f" * ((CAST(tf_{i} AS DOUBLE) * 2.25)"
        f" / (CAST(tf_{i} AS DOUBLE) + 1.25 * (0.25 + 0.75 * {norm}))))"
        for i in idx
    )
    matched = " + ".join(f"CAST(tf_{i} > 0 AS INT)" for i in idx)
    return f"""
WITH {_TOKS_CTE}, base AS (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
), stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS __n,
           CAST(sum(dl) AS DOUBLE) AS __t FROM base
), postings AS (
    SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id,
           {tf_cols}
    FROM (SELECT doc_id, term FROM postings WHERE term IN ({in_list}))
    GROUP BY doc_id
), dfs AS (
    SELECT {df_cols} FROM tf
)
SELECT doc_id, CAST({matched} AS INT) AS n_matched,
       {s} AS score
FROM tf JOIN base USING (doc_id), stats, dfs
ORDER BY score DESC, doc_id
LIMIT {k}
"""


# Composite quality gate with first-failing-rule reason codes; rule
# definitions shared verbatim with _TEXT_STATS_ORACLE / _REPETITION_
# ORACLE / _lang_oracle so the chain cannot drift from the individual
# filters. CASE short-circuits: the n=0 doc never divides.
def _quality_chain_oracle() -> str:
    hit_cols = ",\n           ".join(
        f"len(list_filter(t, x -> x IN ({_stop_list(lang)}))) AS h_{lang}"
        for lang in LANG_PRIORITY
    )
    greatest = ", ".join(f"h_{lang}" for lang in LANG_PRIORITY)
    return f"""
WITH {_TOKS_CTE}, sig AS (
    SELECT doc_id,
           len(t) AS n,
           len(list_distinct(t)) AS nd,
           {hit_cols},
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                ELSE [] END AS g
    FROM toks
), verdict AS (
    SELECT doc_id, n,
           CASE WHEN n < 20 THEN 'too_short'
                WHEN CAST(h_en AS DOUBLE) / CAST(n AS DOUBLE) < 0.03
                     THEN 'low_stopword'
                WHEN CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) < 0.35
                     THEN 'low_distinct'
                WHEN len(g) > 0 AND 1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                                         / CAST(len(g) AS DOUBLE) > 0.2
                     THEN 'repetitive'
                WHEN NOT (GREATEST({greatest}) > 0
                          AND h_en = GREATEST({greatest}))
                     THEN 'non_english'
                ELSE 'ok' END AS reason
    FROM sig
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, reason,
       CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM verdict
"""


# Semantic decontamination: corpus vs the eval split (vec_id % 50 = 7
# = a stand-in benchmark), quantized-cosine >= threshold, best match
# per contaminated vector. Threshold 0.35 is pinned to draw a
# non-trivial hit set from the deliberately unclustered synthetic
# embeddings (their max pair cosine is ~0.51; a production 0.95+ cut
# is the same plan with a different literal).
_DECON_MOD, _DECON_REM, _DECON_TAU = 50, 7, 0.35

_SEM_DECONTAM_ORACLE = f"""
WITH {_QUANT_CTE}, ev AS (
    SELECT vec_id AS eid, qe FROM q WHERE vec_id % {_DECON_MOD} = {_DECON_REM}
), hits AS (
    SELECT a.vec_id AS vec_id, b.eid AS eval_id,
           {_cos_sql('a', 'b', 'qe', 'qe')} AS cosine
    FROM q a, ev b
    WHERE a.vec_id % {_DECON_MOD} <> {_DECON_REM}
), best AS (
    SELECT vec_id, eval_id, cosine,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cosine DESC, eval_id) AS rn
    FROM hits WHERE cosine >= {_DECON_TAU}
)
SELECT vec_id, eval_id, cosine FROM best WHERE rn = 1
"""


# Length-bucket padding report; bucket boundaries shared with
# sampling.LENGTH_BUCKETS via this generator.
def _length_bucket_oracle(buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)) -> str:
    last = buckets[-1]
    case = " ".join(f"WHEN n <= {b} THEN {b}" for b in buckets[:-1])
    return f"""
WITH {_TOKS_CTE}, sized AS (
    SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM toks
), bucketed AS (
    SELECT doc_id,
           CAST(CASE {case} ELSE {last} END AS BIGINT) AS bucket,
           least(n, {last}) AS used,
           CASE WHEN n > {last} THEN 1 ELSE 0 END AS trunc
    FROM sized
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(used) AS BIGINT) AS used_tokens,
       CAST(bucket * count(*) - sum(used) AS BIGINT) AS padded_tokens,
       CAST(bucket * count(*) - sum(used) AS DOUBLE)
           / CAST(bucket * count(*) AS DOUBLE) AS waste_ratio,
       CAST(sum(trunc) AS BIGINT) AS n_truncated
FROM bucketed GROUP BY bucket
"""


# Leakage-safe split: cluster docs by the SAME recursive closure the
# dedup_components oracle uses, then bucket the CLUSTER id with
# split_assign's md5 formula — every near-dup cluster lands whole in
# one split.
_LEAKAGE_SPLIT_ORACLE = f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
cl AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
)
SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
       CASE WHEN b < 80 THEN 'train'
            WHEN b < 90 THEN 'valid'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id, cluster,
           CAST(('0x' || substring(md5(CAST(cluster AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
    FROM cl
)
"""


# DSIR importance selection (operators/importance.py): the oracle
# replays the integer Laplace-ratio score exactly — HUGEINT `//`
# mirrors Spark's DECIMAL(38,0) `div` (both truncate; operands are
# positive). Constants shared with the Spark query body.
_DSIR_BUCKETS, _DSIR_SCALE, _DSIR_K, _DSIR_TARGET = 512, 1 << 16, 120, "src0"

_DSIR_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(u.tok), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
    FROM (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(t) AS u(tok)
),
tcnt AS (
    SELECT bucket, count(*) AS tc FROM tok
    WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
),
scnt AS (
    SELECT bucket, count(*) AS sc FROM tok GROUP BY bucket
),
tot AS (
    SELECT (SELECT COALESCE(SUM(tc), 0) FROM tcnt) AS T,
           (SELECT COALESCE(SUM(sc), 0) FROM scnt) AS S
),
scores AS (
    SELECT r.range AS bucket,
           CAST(
               (CAST((COALESCE(tc.tc, 0) + 1) * {_DSIR_SCALE} AS HUGEINT)
                    * (tot.S + {_DSIR_BUCKETS}))
               // (CAST(COALESCE(sc.sc, 0) + 1 AS HUGEINT)
                    * (tot.T + {_DSIR_BUCKETS}))
           AS BIGINT) AS score
    FROM range({_DSIR_BUCKETS}) r
    LEFT JOIN tcnt tc ON tc.bucket = r.range
    LEFT JOIN scnt sc ON sc.bucket = r.range
    CROSS JOIN tot
)
SELECT t.doc_id AS doc_id, CAST(SUM(s.score) AS BIGINT) AS dsir_score
FROM tok t JOIN scores s ON t.bucket = s.bucket
WHERE t.source <> '{_DSIR_TARGET}'
GROUP BY t.doc_id
ORDER BY dsir_score DESC, doc_id
LIMIT {_DSIR_K}
"""


# Vocabulary coverage curve (operators/text.py:vocab_coverage) —
# exact-integer rank/cumsum over the token-count table; the single
# double division at the end is the only float. Sizes shared with the
# Spark query body.
_VOCAB_SIZES = (4, 8, 16, 32)

_VOCAB_COVERAGE_ORACLE = f"""
WITH counts AS (
    SELECT u.w AS token, CAST(count(*) AS BIGINT) AS c
    FROM (
        SELECT list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(t) AS u(w)
    GROUP BY 1
),
ordered AS (
    SELECT token, c,
           row_number() OVER (ORDER BY c DESC, token) AS rn,
           SUM(c) OVER (ORDER BY c DESC, token ROWS UNBOUNDED PRECEDING) AS cum
    FROM counts
),
stats AS (
    SELECT COALESCE(SUM(c), 0) AS total_tokens, COUNT(*) AS n_distinct
    FROM counts
)
SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
       CAST(o.cum AS BIGINT) AS covered_tokens,
       CAST(s.total_tokens AS BIGINT) AS total_tokens,
       CAST(s.n_distinct AS BIGINT) AS n_distinct,
       CAST(o.cum AS DOUBLE) / CAST(s.total_tokens AS DOUBLE) AS coverage
FROM (SELECT unnest([{", ".join(str(v) for v in _VOCAB_SIZES)}]) AS vocab_size) v
CROSS JOIN stats s
JOIN ordered o ON o.rn = least(v.vocab_size, s.n_distinct)
"""


# Temperature mixture quotas (operators/sampling.py:
# temperature_mixture_plan): tau=0.5 via IEEE sqrt scaled to exact
# integers; Hamilton apportionment replayed with the same integer
# arithmetic (`//` == Spark `div` for positive operands).
_TEMP_BUDGET, _TEMP_WSCALE = 10000, 1 << 20

def _temp_mixture_sql(budget: int) -> str:
    """Apportionment chain parameterized by budget — reused by the
    plan query (10000) and the sample-execution query (200)."""
    return f"""
WITH g AS (
    SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
),
w AS (
    SELECT grp, n_docs,
           CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * {_TEMP_WSCALE}) AS BIGINT)
               AS weight_scaled
    FROM g
),
tot AS (SELECT SUM(weight_scaled) AS W FROM w),
base AS (
    SELECT grp, n_docs, weight_scaled,
           CAST((CAST({budget} AS HUGEINT) * weight_scaled) // W AS BIGINT)
               AS base,
           CAST(CAST({budget} AS HUGEINT) * weight_scaled
               - ((CAST({budget} AS HUGEINT) * weight_scaled) // W) * W
               AS BIGINT) AS rem
    FROM w CROSS JOIN tot
),
lv AS (SELECT {budget} - SUM(base) AS leftover FROM base),
ranked AS (
    SELECT *, row_number() OVER (ORDER BY rem DESC, grp) AS rk FROM base
)
SELECT grp AS lang, n_docs, weight_scaled,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
           AS quota
FROM ranked CROSS JOIN lv
"""


_TEMP_MIXTURE_ORACLE = _temp_mixture_sql(_TEMP_BUDGET)


# Near-dup cluster-size distribution (dedup yield report): histogram
# of transitive-closure cluster sizes INCLUDING singletons, with the
# per-size removal count a keep-one-per-cluster dedup would realize.
_CLUSTER_SIZE_ORACLE = f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
cl AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
sizes AS (
    SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
    FROM cl GROUP BY cluster
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_docs FROM documents)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS docs_total,
       CAST((cluster_size - 1) * count(*) AS BIGINT) AS docs_removed,
       CAST((cluster_size - 1) * count(*) AS DOUBLE)
           / CAST(total_docs AS DOUBLE) AS removed_share
FROM sizes CROSS JOIN tot
GROUP BY cluster_size, total_docs
"""


# Returned-item customer revenue (TPC-H Q10 shape): exact DECIMAL(18,2)
# revenue sums; the top-20 cut orders by the EXACT decimal sum (ties
# then by custkey), so the boundary is engine-independent; the double
# cast happens after the cut.
_RETURNED_REV_ORACLE = """
WITH g AS (
    SELECT c_custkey, c_name, n_name AS nation,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, nation, CAST(rev AS DOUBLE) AS revenue
FROM g
ORDER BY rev DESC, c_custkey
LIMIT 20
"""


# Top supplier(s) by revenue (TPC-H Q15 shape): the max is joined on
# the EXACT decimal revenue, so "all suppliers tied at max" is
# engine-exact; no window needed.
_TOP_SUPPLIER_ORACLE = """
WITH g AS (
    SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
),
m AS (SELECT MAX(rev) AS mx FROM g)
SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
FROM g JOIN m ON g.rev = m.mx
JOIN supplier ON s_suppkey = l_suppkey
"""


# Important parts by revenue share (TPC-H Q11 shape): the HAVING
# against a fraction of the GLOBAL total compares exact decimals
# (rev * 1500 > total), never doubles — the boundary is engine-exact.
# DECIMAL(32,4) keeps the native scale (the cast never rounds) and
# every product within the p1+p2 <= 38 cap.
_PART_SHARE_ORACLE = """
WITH g AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2)))
               AS DECIMAL(32,4)) AS rev
    FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT CAST(SUM(rev) AS DECIMAL(32,4)) AS total FROM g)
SELECT p_partkey, p_name,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS share
FROM g JOIN part ON p_partkey = l_partkey
CROSS JOIN tot
WHERE rev * 1500 > total
"""


# Quality-keeper dedup apply (the C4/RefinedWeb keeper choice: keep
# the LONGEST doc per near-dup cluster, not the min id): closure +
# per-cluster argmax replayed with a window rank.
_BEST_KEEPER_ORACLE = f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
toks AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                                t -> t <> '')) AS BIGINT) AS n_tokens
    FROM documents
),
cl AS (
    SELECT t.doc_id, COALESCE(c.component, t.doc_id) AS cluster, t.n_tokens
    FROM toks t LEFT JOIN comp c ON t.doc_id = c.node
),
ranked AS (
    SELECT doc_id, cluster, n_tokens,
           row_number() OVER (PARTITION BY cluster
                              ORDER BY n_tokens DESC, doc_id) AS rk,
           CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
               AS cluster_size
    FROM cl
)
SELECT CAST(cluster AS BIGINT) AS cluster,
       doc_id AS keeper_doc_id,
       n_tokens AS keeper_tokens,
       cluster_size
FROM ranked WHERE rk = 1
"""


# Incremental DSIR: the bucket models are fitted on the INGESTED half
# only; the new batch is scored against them without rescanning the
# corpus (store-not-rescan, the dedup-store convention). `// 2` is
# floor == Spark's truncating cast for the positive max.
_INCR_DSIR_ORACLE = f"""
WITH cut AS (SELECT max(doc_id) // 2 AS c FROM documents),
tok AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(u.tok), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket
    FROM (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(t) AS u(tok)
),
tcnt AS (
    SELECT bucket, count(*) AS tc FROM tok CROSS JOIN cut
    WHERE source = '{_DSIR_TARGET}' AND doc_id <= c GROUP BY bucket
),
scnt AS (
    SELECT bucket, count(*) AS sc FROM tok CROSS JOIN cut
    WHERE doc_id <= c GROUP BY bucket
),
tot AS (
    SELECT (SELECT COALESCE(SUM(tc), 0) FROM tcnt) AS T,
           (SELECT COALESCE(SUM(sc), 0) FROM scnt) AS S
),
scores AS (
    SELECT r.range AS bucket,
           CAST(
               (CAST((COALESCE(tc.tc, 0) + 1) * {_DSIR_SCALE} AS HUGEINT)
                    * (tot.S + {_DSIR_BUCKETS}))
               // (CAST(COALESCE(sc.sc, 0) + 1 AS HUGEINT)
                    * (tot.T + {_DSIR_BUCKETS}))
           AS BIGINT) AS score
    FROM range({_DSIR_BUCKETS}) r
    LEFT JOIN tcnt tc ON tc.bucket = r.range
    LEFT JOIN scnt sc ON sc.bucket = r.range
    CROSS JOIN tot
)
SELECT t.doc_id AS doc_id, CAST(SUM(s.score) AS BIGINT) AS dsir_score
FROM tok t JOIN scores s ON t.bucket = s.bucket CROSS JOIN cut
WHERE t.doc_id > c
GROUP BY t.doc_id
ORDER BY dsir_score DESC, doc_id
LIMIT {_DSIR_K}
"""


# Executing the quotas: deterministic md5-order sample of exactly
# `quota` docs per language (the plan made real). Budget 200 keeps
# every quota below its group size on the driver corpus.
_TEMP_SAMPLE_BUDGET = 200

_TEMP_SAMPLE_ORACLE = f"""
WITH plan AS ({_temp_mixture_sql(200)}),
ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                        doc_id
           ) AS rnk
    FROM documents
)
SELECT r.lang AS lang, r.doc_id AS doc_id, CAST(r.rnk AS BIGINT) AS rnk
FROM ranked r JOIN plan p ON r.lang = p.lang
WHERE r.rnk <= p.quota
"""


# Per-source corpus forensics (the RedPajama-style "data card" rollup):
# quality-chain verdicts + token volume + majority language per source.
_SOURCE_PROFILE_ORACLE = f"""
WITH chain AS ({_quality_chain_oracle()}),
j AS (
    SELECT d.source, c.n_tokens, c.keep
    FROM documents d JOIN chain c ON d.doc_id = c.doc_id
),
agg AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(keep) AS BIGINT) AS n_quality_ok
    FROM j GROUP BY source
),
langs AS (
    SELECT source, lang, CAST(count(*) AS BIGINT) AS c
    FROM documents GROUP BY source, lang
),
toplang AS (
    SELECT source, lang, c,
           row_number() OVER (PARTITION BY source ORDER BY c DESC, lang)
               AS rk
    FROM langs
)
SELECT a.source AS source, a.n_docs, a.total_tokens,
       CAST(a.total_tokens AS DOUBLE) / CAST(a.n_docs AS DOUBLE)
           AS avg_tokens,
       a.n_quality_ok,
       CAST(a.n_quality_ok AS DOUBLE) / CAST(a.n_docs AS DOUBLE)
           AS ok_share,
       t.lang AS majority_lang,
       CAST(t.c AS DOUBLE) / CAST(a.n_docs AS DOUBLE)
           AS majority_lang_share
FROM agg a JOIN toplang t ON a.source = t.source AND t.rk = 1
"""


# Forecast revenue change (TPC-H Q6 shape): a pure one-scan filtered
# aggregate — every predicate lands in PushedFilters; the exact
# decimal sum is the whole query.
_FORECAST_REV_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue_delta,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# Windowed KMV distinct (the sketch composed with event-time windows):
# per-day distinct users, exact + k=64 KMV estimate — the streaming-
# dashboard shape (approximate uniques per window at sketch cost).
_KMV_WINDOWED_ORACLE = """
WITH uh AS (
    SELECT DISTINCT CAST(ts AS DATE) AS day,
           CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
    FROM events
),
ranked AS (
    SELECT day, h,
           ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM uh
),
ns AS (
    SELECT day, CAST(count(*) AS BIGINT) AS n_exact FROM uh GROUP BY 1
),
kth AS (SELECT day, h AS hk FROM ranked WHERE rn = 64)
SELECT ns.day AS day, ns.n_exact,
       CASE WHEN kth.hk IS NULL THEN CAST(ns.n_exact AS DOUBLE)
            ELSE 63.0 * 1152921504606846976.0 / CAST(kth.hk AS DOUBLE)
       END AS kmv_estimate
FROM ns LEFT JOIN kth USING (day)
"""


# As-of with tolerance (pandas merge_asof(tolerance=...)): a match
# farther than the bound reads as no-match. Both engines compare the
# native timestamp difference against an INTERVAL — exact microsecond
# arithmetic, no epoch cast anywhere.
_ASOF_TOLERANCE_SEC = 21600

_ASOF_TOL_ORACLE = f"""
WITH purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), views AS (
    SELECT user_id, ts, max(event_id) AS event_id
    FROM events WHERE event_type = 'view' GROUP BY user_id, ts
), m AS (
    SELECT p.user_id AS user_id, p.ts AS ts, p.event_id AS event_id,
           v.ts AS vts, v.event_id AS vid
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts
)
SELECT user_id, ts, event_id,
       CASE WHEN vts IS NOT NULL
                 AND ts - vts <= INTERVAL {_ASOF_TOLERANCE_SEC} SECOND
            THEN vts END AS view_ts,
       CASE WHEN vts IS NOT NULL
                 AND ts - vts <= INTERVAL {_ASOF_TOLERANCE_SEC} SECOND
            THEN vid END AS view_event_id
FROM m
"""


# Soft dedup (downweight, don't remove): every doc keeps a sampling
# weight 1/cluster_size so duplicated content contributes ~once in
# expectation — the keep-everything alternative to keep_canonical.
_SOFT_DEDUP_ORACLE = f"""
WITH comp AS ({_COMPONENTS_ORACLE}),
cl AS (
    SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
sizes AS (
    SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
    FROM cl GROUP BY cluster
)
SELECT cl.doc_id AS doc_id, CAST(cl.cluster AS BIGINT) AS cluster,
       s.cluster_size,
       1.0 / CAST(s.cluster_size AS DOUBLE) AS sample_weight
FROM cl JOIN sizes s ON cl.cluster = s.cluster
"""


# Order-priority semi-join count (TPC-H Q4 shape, adapted to this
# schema: "orders in a quarter with at least one returned line"):
# EXISTS decorrelates to a left-semi join, then a priorities-sized
# groupBy.
_PRIORITY_RETURNS_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
"""


# SemDeDup APPLY: keep one representative (min vec_id) per semantic
# near-dup cluster — the embedding-space sibling of
# dedup_keep_canonical; pairs replayed from the semdedup oracle chain,
# closure via WITH RECURSIVE.
_SEMDEDUP_KEEPER_ORACLE = f"""
WITH RECURSIVE {_QUANT_CTE},
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
assign AS (
    SELECT vec_id, cid, qe FROM (
        SELECT a.vec_id, c.cid, a.qe,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
pairs AS (
    SELECT id_a, id_b FROM (
        SELECT p.vec_id AS id_a, n.vec_id AS id_b,
               {_cos_sql('p', 'n')} AS cosine
        FROM assign p JOIN assign n ON p.cid = n.cid
        WHERE p.vec_id < n.vec_id
    ) WHERE cosine >= 0.4
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(node, r) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
),
comp AS (SELECT node, LEAST(node, MIN(r)) AS component FROM reach GROUP BY node)
SELECT e.vec_id AS vec_id, e.label AS label,
       CAST(CASE WHEN c.component IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
           AS in_cluster
FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
WHERE c.component IS NULL OR c.component = e.vec_id
"""


# Bilateral trade volume (TPC-H Q7 shape): revenue shipped between two
# nations, both directions, by year — the two nation dims broadcast
# twice under different aliases; exact decimal sums.
_TRADE_VOLUME_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, l_year
"""


# KenLM-style bigram fluency scoring (operators/lm.py): the oracle
# replays the hashed transition buckets and the integer Laplace
# transition scores exactly — BIGINT `//` mirrors Spark's `div` (both
# truncate; operands positive). The one float is the final mean
# (exact BIGINT sum / exact BIGINT count), bit-identical on both
# engines. Constants shared with the Spark query bodies.
_LM_BUCKETS, _LM_SCALE, _LM_K, _LM_TARGET = 256, 1 << 16, 120, "src0"

_LM_TR_CTE = f"""
tr AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(t[i]), 1, 15)) AS BIGINT)
               % {_LM_BUCKETS} AS pb,
           CAST(('0x' || substring(md5(t[i + 1]), 1, 15)) AS BIGINT)
               % {_LM_BUCKETS} AS cb
    FROM (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(range(1, len(t))) AS r(i)
)"""

_LM_ORACLE = f"""
WITH {_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb, cb
),
uni AS (
    SELECT pb, CAST(count(*) AS BIGINT) AS uc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb
),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(((COALESCE(bi.bc, 0) + 1) * {_LM_SCALE})
                    // (COALESCE(uni.uc, 0) + {_LM_BUCKETS})) AS BIGINT)
               AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    WHERE t.source <> '{_LM_TARGET}'
    GROUP BY t.doc_id
)
SELECT doc_id, fluency_sum, n_transitions,
       CAST(fluency_sum AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS fluency
FROM scored
ORDER BY fluency DESC, doc_id
LIMIT {_LM_K}
"""

_INCR_LM_ORACLE = f"""
WITH cut AS (SELECT max(doc_id) // 2 AS c FROM documents),
{_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr CROSS JOIN cut
    WHERE source = '{_LM_TARGET}' AND doc_id <= c GROUP BY pb, cb
),
uni AS (
    SELECT pb, CAST(count(*) AS BIGINT) AS uc FROM tr CROSS JOIN cut
    WHERE source = '{_LM_TARGET}' AND doc_id <= c GROUP BY pb
),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(((COALESCE(bi.bc, 0) + 1) * {_LM_SCALE})
                    // (COALESCE(uni.uc, 0) + {_LM_BUCKETS})) AS BIGINT)
               AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    CROSS JOIN cut
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    WHERE t.doc_id > c
    GROUP BY t.doc_id
)
SELECT doc_id, fluency_sum, n_transitions,
       CAST(fluency_sum AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS fluency
FROM scored
ORDER BY fluency DESC, doc_id
LIMIT {_LM_K}
"""


# TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders —
# the left-outer count histogram, excluding one "special" order class
# (no o_comment column in the driver data; the urgent-priority
# exclusion plays the NOT LIKE '%special%requests%' role). Counts are
# exact integers throughout.
_ORDER_DIST_ORACLE = """
WITH co AS (
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
         AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM co
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# TPC-H Q22 shape: well-funded customers with no RECENT order, by
# nation ("never ordered" is degenerate on the driver data — every
# customer orders — so the anti-join predicate is date-bounded: no
# order since _IDLE_CUTOFF, the lapsed-customer report). The balance
# threshold is the mean POSITIVE balance — an exact DECIMAL(18,2) sum
# over a BIGINT count, one double division, so the > comparison is
# bit-identical on both engines; per-nation totals stay exact
# decimals until the final cast.
_IDLE_CUTOFF = "2000-01-01"

_IDLE_CUSTOMERS_ORACLE = f"""
WITH thresh AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
),
idle AS (
    SELECT c_custkey, c_nationkey,
           CAST(c_acctbal AS DECIMAL(18,2)) AS bal
    FROM customer, thresh
    WHERE c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '{_IDLE_CUTOFF} 00:00:00'
      )
)
SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(bal) AS DOUBLE) AS totacctbal
FROM idle JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


# TPC-H Q21 shape, adapted to the driver schema (no receipt/commit
# dates): a supplier "held up" a finished multi-supplier order when
# its latest ship date is the order's STRICT maximum (no other
# supplier shipped as late). Exact timestamp comparisons and integer
# counts only.
_WAIT_CHAIN_ORACLE = """
WITH so AS (
    SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY l_orderkey, l_suppkey
),
os AS (
    SELECT l_orderkey, max(s_max) AS o_max,
           CAST(count(*) AS BIGINT) AS n_supp,
           CAST(SUM(CASE WHEN s_max = mx THEN 1 ELSE 0 END) AS BIGINT)
               AS n_at_max
    FROM (
        SELECT l_orderkey, l_suppkey, s_max,
               max(s_max) OVER (PARTITION BY l_orderkey) AS mx
        FROM so
    )
    GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM so
JOIN os ON so.l_orderkey = os.l_orderkey
JOIN supplier ON so.l_suppkey = s_suppkey
WHERE os.n_supp >= 2 AND os.n_at_max = 1 AND so.s_max = os.o_max
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# Joint target-likeness x fluency gate — the modern two-axis corpus
# filter (DSIR picks docs that LOOK like the target, the bigram LM
# picks docs that READ fluently): the intersection of the two
# existing top-K selections, both scores carried. Both member
# selections are already oracle-exact; the gate is their equijoin.
_JOINT_GATE_ORACLE = f"""
WITH dsir AS ({_DSIR_ORACLE}),
lm AS ({_LM_ORACLE})
SELECT dsir.doc_id AS doc_id, dsir.dsir_score AS dsir_score,
       lm.fluency AS fluency
FROM dsir JOIN lm ON dsir.doc_id = lm.doc_id
ORDER BY doc_id
"""


# Jelinek-Mercer interpolated LM (operators/lm.py:fit_interpolated_lm)
# — λ = 3/4 bigram + 1/4 target-unigram backoff, replayed as the SAME
# sum of two truncating integer divisions. tgt(c)/uni(p)/T all roll up
# from the bigram pair counts.
_INTERP_LM_ORACLE = f"""
WITH {_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb, cb
),
uni AS (SELECT pb, CAST(SUM(bc) AS BIGINT) AS uc FROM bi GROUP BY pb),
tgt AS (SELECT cb, CAST(SUM(bc) AS BIGINT) AS tc FROM bi GROUP BY cb),
tot AS (SELECT CAST(COALESCE(SUM(bc), 0) AS BIGINT) AS T FROM bi),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(
               ((COALESCE(bi.bc, 0) + 1) * {3 * _LM_SCALE})
                   // ((COALESCE(uni.uc, 0) + {_LM_BUCKETS}) * 4)
               + ((COALESCE(tgt.tc, 0) + 1) * {_LM_SCALE})
                   // ((tot.T + {_LM_BUCKETS}) * 4)
           ) AS BIGINT) AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    CROSS JOIN tot
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    LEFT JOIN tgt ON tgt.cb = t.cb
    WHERE t.source <> '{_LM_TARGET}'
    GROUP BY t.doc_id
)
SELECT doc_id, fluency_sum, n_transitions,
       CAST(fluency_sum AS DOUBLE) / CAST(n_transitions AS DOUBLE) AS fluency
FROM scored
ORDER BY fluency DESC, doc_id
LIMIT {_LM_K}
"""


# TPC-H Q17 shape: revenue locked up in unusually-small-quantity
# lines (below half the part's average quantity). The correlated AVG
# is decorrelated into a per-part aggregate join, and the threshold
# comparison is DIVISION-FREE: with quantities in exact quarter-units
# (qq = 4*l_quantity, integral on this data — asserted by the
# generator), `qty < 0.5 * avg` becomes `2*qq*cnt < sum_qq`, all
# BIGINT on both engines. No float ever enters the cut.
_SMALL_QTY_ORACLE = """
WITH q AS (
    SELECT l_partkey, l_extendedprice,
           CAST(l_quantity * 4 AS BIGINT) AS qq
    FROM lineitem
),
pa AS (
    SELECT l_partkey, CAST(SUM(qq) AS BIGINT) AS sq,
           CAST(count(*) AS BIGINT) AS cnt
    FROM q GROUP BY l_partkey
)
SELECT CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(DISTINCT q.l_partkey) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(q.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS locked_revenue
FROM q JOIN pa ON q.l_partkey = pa.l_partkey
WHERE 2 * q.qq * pa.cnt < pa.sq
"""


# TPC-H Q19 shape: disjunction-of-conjunction brackets — each bracket
# pins a brand plus a size range plus a quantity range, OR'd together.
# The brand list and the quantity hull are derivable from the
# disjunction, so both sides of the join can be pre-filtered before
# any row crosses the join; per-bracket revenue is an exact decimal
# sum. Quantities and sizes are integral on this data, so the integer
# range bounds compare exactly on both engines.
_BRACKET_REV_ORACLE = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 50
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
"""


# TPC-H Q8 shape: one nation's share of a region's PROMO-part market
# by order year. Numerator and denominator are exact decimal sums
# accumulated in ONE conditional aggregation pass (no second scan);
# the share is their single final double division — both engines
# divide the same two exact values, so the ratio is bit-identical.
_MKT_SHARE_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS nation_rev,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS total_rev,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(1 - l_discount AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO'
  AND r_name = 'AFRICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_year
"""


# TPC-H Q2 shape: the min-cost-supplier correlated subquery,
# decorrelated. A (part, supplier) "offer" is that pair's cheapest
# observed line; the per-part minimum is a window over the offer
# aggregate's own partition key (no join-back, no re-scan), ties
# break to the smallest suppkey so the winner is a total function of
# the data. Offers are exact DECIMAL(18,2) minima — the equality
# against the window minimum cannot drift on either engine.
_CHEAPEST_SUPP_ORACLE = """
WITH offers AS (
    SELECT l_partkey, l_suppkey,
           MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT l_partkey, l_suppkey, offer,
           MIN(offer) OVER (PARTITION BY l_partkey) AS b
    FROM offers
),
win AS (
    SELECT l_partkey, MIN(l_suppkey) AS win_suppkey,
           MIN(offer) AS best_offer
    FROM best WHERE offer = b GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_name,
       CAST(best_offer AS DOUBLE) AS best_price
FROM win
JOIN part ON l_partkey = p_partkey
JOIN supplier ON win_suppkey = s_suppkey
"""


# TPC-H Q16 shape: how many distinct suppliers can furnish each
# surviving (brand, type, size) part class — the distinct-aggregate
# over an exclusion-filtered dim join. The (part, supplier) pair set
# dedups BEFORE the dim join so the join carries one row per pair,
# not one per lineitem.
_SUPP_VARIETY_SIZES = (1, 4, 9, 14, 19, 24, 36, 45)
_SUPP_VARIETY_ORACLE = f"""
WITH pairs AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_type, CAST(p_size AS INTEGER) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS part_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN {_SUPP_VARIETY_SIZES}
GROUP BY p_brand, p_type, p_size
"""


# SQ8 scalar-quantized ANN: codes are floor(x * 127 / max_abs) over a
# corpus-wide exact scale; the score is the exact integer dot product
# of two int8 code vectors, so the whole result — ranking, tie-break,
# values — is integer-valued and replayed bit-for-bit.
_SQ8_ORACLE = """
WITH m AS (
    SELECT CAST(MAX(list_max(list_transform(embedding, x -> abs(x))))
                AS DOUBLE) AS mx
    FROM embeddings
),
c AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> GREATEST(LEAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT), 127), -127))
               AS c8
    FROM embeddings, m
),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(range(1, 65),
                                        i -> a.c8[i] * b.c8[i]))
                AS BIGINT) AS score8
    FROM c a, c b
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, score8, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score8 DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


# CCNet-style perplexity buckets: per-language head/middle/tail split
# by bigram-LM fluency rank. The rank is a total order (fluency is a
# bit-exact double from exact integers; ties break by doc_id), and the
# tercile index is pure integer arithmetic over (rank, count) — both
# engines partition identically. The report aggregates exact BIGINT
# sums per (lang, bucket); the mean is one final double division.
_PPL_BUCKETS_ORACLE = f"""
WITH {_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb, cb
),
uni AS (
    SELECT pb, CAST(count(*) AS BIGINT) AS uc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb
),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(((COALESCE(bi.bc, 0) + 1) * {_LM_SCALE})
                    // (COALESCE(uni.uc, 0) + {_LM_BUCKETS})) AS BIGINT)
               AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    WHERE t.source <> '{_LM_TARGET}'
    GROUP BY t.doc_id
),
ranked AS (
    SELECT d.lang, s.fluency_sum, s.n_transitions,
           ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY CAST(s.fluency_sum AS DOUBLE)
                        / CAST(s.n_transitions AS DOUBLE) DESC,
                        s.doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY d.lang) AS cnt
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT lang,
       CASE ((rn - 1) * 3) // cnt WHEN 0 THEN 'head'
            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(fluency_sum) AS BIGINT) AS fluency_sum_total,
       CAST(SUM(n_transitions) AS BIGINT) AS n_transitions_total,
       CAST(SUM(fluency_sum) AS DOUBLE)
           / CAST(SUM(n_transitions) AS DOUBLE) AS mean_fluency
FROM ranked
GROUP BY lang, bucket
"""


# SQ8 recall vs the exact baseline: overlap of the SQ8 top-5 with the
# exact-cosine top-5, per query, rolled up to one row. Both member
# rankings are already exactly replayable; the recall is exact-integer
# overlap / exact-integer pair count, one final division.
_SQ8_RECALL_ORACLE = f"""
WITH m AS (
    SELECT CAST(MAX(list_max(list_transform(embedding, x -> abs(x))))
                AS DOUBLE) AS mx
    FROM embeddings
),
c AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> GREATEST(LEAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT), 127), -127))
               AS c8
    FROM embeddings, m
),
s8_scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(range(1, 65),
                                        i -> a.c8[i] * b.c8[i]))
                AS BIGINT) AS score8
    FROM c a, c b
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
),
s8_top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score8 DESC, neighbor_id)
                      AS rank
        FROM s8_scored
    ) WHERE rank <= 5
),
{_QUANT_CTE.strip().lstrip()},
ex_scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS} AS cosine
    FROM q a, q b
    WHERE a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
),
ex_top AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id)
                      AS rank
        FROM ex_scored
    ) WHERE rank <= 5
)
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(COALESCE(SUM(CASE WHEN s.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS overlap_total,
       CAST(COALESCE(SUM(CASE WHEN s.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END), 0) AS DOUBLE)
       / CAST(count(*) AS DOUBLE) AS recall
FROM ex_top e
LEFT JOIN s8_top s
       ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
"""


# IVF x SQ8: inverted-file pruning (exact quantized-cosine assignment
# and probing, same deterministic centroid rule as the IVF family)
# with SQ8 integer-dot candidate scoring — the composed 100 TB path.
_IVF_SQ8_ORACLE = f"""
WITH {_QUANT_CTE},
m AS (
    SELECT CAST(MAX(list_max(list_transform(embedding, x -> abs(x))))
                AS DOUBLE) AS mx
    FROM embeddings
),
c8 AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> GREATEST(LEAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / mx) AS BIGINT), 127), -127))
               AS c8
    FROM embeddings, m
),
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % 37 = 3),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
probe AS (
    SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_cos_sql('a', 'c', 'qe', 'ce')} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c WHERE a.vec_id % 50 = 0
    ) WHERE rn <= 2
),
scored AS (
    SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(range(1, 65),
                                        i -> qc.c8[i] * nc.c8[i]))
                AS BIGINT) AS score8
    FROM probe p
    JOIN assign n ON p.cid = n.cid
    JOIN c8 qc ON qc.vec_id = p.vec_id
    JOIN c8 nc ON nc.vec_id = n.vec_id
    WHERE p.vec_id <> n.vec_id
)
SELECT query_id, neighbor_id, score8, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score8 DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
"""


# TPC-H Q20 shape: suppliers shipping an OUTSIZED share of a part —
# more than TWICE the part's per-supplier average — counted per
# supplier (probed first: a strict-majority cut is degenerate on this
# near-uniform data — 0 rows at every SF). The nested aggregate
# threshold is division-free: pair_q > 2*total_q/nsupp becomes
# pair_q*nsupp > 2*total_q in pure BIGINT; per-part total and
# supplier count are windows over the pair aggregate's own partkey
# (the Q2 no-join-back shape).
_DOMINANT_SUPP_ORACLE = """
WITH ps AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_quantity * 4 AS BIGINT)) AS BIGINT) AS pair_q
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
pt AS (
    SELECT l_partkey, l_suppkey, pair_q,
           SUM(pair_q) OVER (PARTITION BY l_partkey) AS total_q,
           COUNT(*) OVER (PARTITION BY l_partkey) AS nsupp
    FROM ps
)
SELECT s_name,
       CAST(count(*) AS BIGINT) AS n_outsized_parts,
       CAST(SUM(pair_q) AS BIGINT) AS outsized_qq
FROM pt JOIN supplier ON l_suppkey = s_suppkey
WHERE pair_q * nsupp > 2 * total_q
GROUP BY s_name
"""


# Kneser-Ney bigram LM (d = 3/4): continuation-diversity backoff —
# the third smoothing rung after Laplace (flat floor) and
# Jelinek-Mercer (unigram frequency). Every count rolls up from one
# pair aggregation; the score is floored integer divisions end to
# end, replayed with // bit-for-bit.
_KN_LM_ORACLE = f"""
WITH {_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb, cb
),
uni AS (
    SELECT pb, CAST(SUM(bc) AS BIGINT) AS uc,
           CAST(count(*) AS BIGINT) AS n1p
    FROM bi GROUP BY pb
),
cont AS (SELECT cb, CAST(count(*) AS BIGINT) AS cc FROM bi GROUP BY cb),
tot AS (SELECT CAST(GREATEST(COALESCE(count(*), 0), 1) AS BIGINT) AS NP
        FROM bi),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(CASE WHEN COALESCE(uni.uc, 0) = 0
               THEN ({_LM_SCALE} * COALESCE(cont.cc, 0)) // tot.NP
               ELSE (GREATEST(COALESCE(bi.bc, 0) * 4 - 3, 0)
                     * {_LM_SCALE}) // (COALESCE(uni.uc, 0) * 4)
                  + ({3 * _LM_SCALE} * COALESCE(uni.n1p, 0)
                     * COALESCE(cont.cc, 0))
                     // (COALESCE(uni.uc, 0) * 4 * tot.NP)
               END) AS BIGINT) AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    CROSS JOIN tot
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    LEFT JOIN cont ON cont.cb = t.cb
    WHERE t.source <> '{_LM_TARGET}'
    GROUP BY t.doc_id
)
SELECT doc_id, fluency_sum, n_transitions,
       CAST(fluency_sum AS DOUBLE) / CAST(n_transitions AS DOUBLE)
           AS fluency
FROM scored
ORDER BY fluency DESC, doc_id
LIMIT {_LM_K}
"""


# URL blocklist filter: a host is blocked when any of its dot-suffix
# levels equals a rule (the UT1/registry convention — "example.com"
# blocks every subdomain). The oracle regenerates the suffix ladder
# and replays the anti-join; the planted rules block two sources via
# exact host matches, while the dead broader rule ("badhost.test")
# must block nothing.
_BLOCKLIST_RULES = ("src3.example.com", "src7.example.com", "badhost.test")
_BLOCKLIST_ORACLE = f"""
WITH urls AS (
    SELECT doc_id, source, {_RAW_URL_SQL} AS url,
           lower(source) || '.example.com' AS domain
    FROM documents
),
sfx AS (
    SELECT doc_id,
           array_to_string(
               list_slice(string_split(domain, '.'), i,
                          len(string_split(domain, '.'))), '.') AS s
    FROM urls, unnest(range(1, len(string_split(domain, '.')) + 1)) AS t(i)
),
blocked AS (
    SELECT DISTINCT doc_id FROM sfx
    WHERE s IN {_BLOCKLIST_RULES}
)
SELECT u.doc_id, u.source, u.url, u.domain
FROM urls u LEFT JOIN blocked b ON u.doc_id = b.doc_id
WHERE b.doc_id IS NULL
"""


# Per-doc perplexity-bucket assignment. Spark runs the FROZEN-
# THRESHOLD path (CCNet production shape: per-language boundary sort
# keys + a broadcast mark-back); the oracle computes the same buckets
# the RANK way — the driver's hash compare is therefore a standing
# equivalence proof between the two forms, re-run every round.
_PPL_ASSIGN_ORACLE = f"""
WITH {_LM_TR_CTE},
bi AS (
    SELECT pb, cb, CAST(count(*) AS BIGINT) AS bc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb, cb
),
uni AS (
    SELECT pb, CAST(count(*) AS BIGINT) AS uc FROM tr
    WHERE source = '{_LM_TARGET}' GROUP BY pb
),
scored AS (
    SELECT t.doc_id,
           CAST(SUM(((COALESCE(bi.bc, 0) + 1) * {_LM_SCALE})
                    // (COALESCE(uni.uc, 0) + {_LM_BUCKETS})) AS BIGINT)
               AS fluency_sum,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM tr t
    LEFT JOIN bi ON bi.pb = t.pb AND bi.cb = t.cb
    LEFT JOIN uni ON uni.pb = t.pb
    WHERE t.source <> '{_LM_TARGET}'
    GROUP BY t.doc_id
),
ranked AS (
    SELECT s.doc_id, d.lang,
           ROW_NUMBER() OVER (
               PARTITION BY d.lang
               ORDER BY CAST(s.fluency_sum AS DOUBLE)
                        / CAST(s.n_transitions AS DOUBLE) DESC,
                        s.doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY d.lang) AS cnt
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
)
SELECT doc_id, lang,
       CASE ((rn - 1) * 3) // cnt WHEN 0 THEN 'head'
            WHEN 1 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
"""


# fastText-style quality-classifier selection (operators/classifier.py
# — registered r13 from the oracle pinned by
# tests/test_classifier_oracle_rehearsal.py). Positive class = the
# _CLF_TARGET source, negative class = the rest of the corpus,
# candidates = the negative pool, output = the TOP-K verdict rows by
# (mean margin desc, doc_id) — the keep_quality selection form. The
# thresholded-label form is DEGENERATE at sf0.001/0.01 (all label=0;
# probed per the Q22 rule), so the cut is the discriminative shape.
# HUGEINT `//` mirrors Spark's DECIMAL(38,0) `div` (both truncate;
# operands positive) — the _DSIR_ORACLE arithmetic with two class
# corpora instead of target-vs-corpus.
_CLF_BUCKETS, _CLF_SCALE, _CLF_K, _CLF_TARGET = 512, 1 << 16, 120, "src0"

_CLF_TOPK_ORACLE = f"""
WITH tok AS (
    SELECT doc_id, source,
           CAST(('0x' || substring(md5(u.tok), 1, 15)) AS BIGINT)
               % {_CLF_BUCKETS} AS bucket
    FROM (
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(t) AS u(tok)
),
pcnt AS (
    SELECT bucket, count(*) AS pc FROM tok
    WHERE source = '{_CLF_TARGET}' GROUP BY bucket
),
ncnt AS (
    SELECT bucket, count(*) AS nc FROM tok
    WHERE source <> '{_CLF_TARGET}' GROUP BY bucket
),
tot AS (
    SELECT (SELECT COALESCE(SUM(pc), 0) FROM pcnt) AS PT,
           (SELECT COALESCE(SUM(nc), 0) FROM ncnt) AS NT
),
weights AS (
    SELECT r.range AS bucket,
           CAST(
               (CAST((COALESCE(pc.pc, 0) + 1) * {_CLF_SCALE} AS HUGEINT)
                    * (tot.NT + {_CLF_BUCKETS}))
               // (CAST(COALESCE(nc.nc, 0) + 1 AS HUGEINT)
                    * (tot.PT + {_CLF_BUCKETS}))
           AS BIGINT) AS w
    FROM range({_CLF_BUCKETS}) r
    LEFT JOIN pcnt pc ON pc.bucket = r.range
    LEFT JOIN ncnt nc ON nc.bucket = r.range
    CROSS JOIN tot
)
SELECT t.doc_id AS doc_id,
       CAST(SUM(ws.w) AS BIGINT) AS margin_sum,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(ws.w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS margin,
       CAST(SUM(ws.w) >= {_CLF_SCALE} * COUNT(*) AS INT) AS label
FROM tok t JOIN weights ws ON t.bucket = ws.bucket
WHERE t.source <> '{_CLF_TARGET}'
GROUP BY t.doc_id
ORDER BY margin DESC, doc_id
LIMIT {_CLF_K}
"""


# BPE tokenizer INFERENCE with a frozen rule table (operators/bpe.py —
# registered r13 from the oracle pinned by
# tests/test_bpe_oracle_rehearsal.py; the FIT is a driver-side argmax
# loop, pytest-proven, not SQL-replayable). DuckDB replays the greedy
# left-to-right non-overlapping merge EXACTLY via literal replace()
# over a sentinel-wrapped encoding: each token is wrapped as
# \x1f||t||\x1f, so the adjacent pair (a, b) is the literal substring
# and one replace per rule IS the fold; rules apply in rank order over
# earlier rules' outputs. Rules were probed to FIRE on the driver
# corpus (('order','fast') 51x, ('order','order') 47x at sf0.001; the
# self-pair exercises greedy non-overlap on runs).
_BPE_SEP = "\x1f"
_BPE_RULES = ((0, "order", "fast"), (1, "order", "order"))


def _bpe_apply_sql() -> str:
    sep = _BPE_SEP
    expr = (
        f"CASE WHEN length(t) = 0 THEN '' ELSE '{sep}' || "
        f"array_to_string(list_transform(t, x -> x), '{sep}{sep}') || '{sep}' END"
    )
    for _, a, b in _BPE_RULES:
        expr = (
            f"replace({expr}, '{sep}{a}{sep}{sep}{b}{sep}', '{sep}{a} {b}{sep}')"
        )
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       x -> x <> '') AS t
    FROM documents
),
merged AS (
    SELECT doc_id, {expr} AS r FROM toks
)
SELECT doc_id,
       CAST(CASE WHEN r = '' THEN 0
            ELSE length(r) - length(replace(r, '{sep}{sep}', '{sep}')) + 1
            END AS BIGINT) AS n_bpe_tokens,
       replace(trim(r, '{sep}'), '{sep}{sep}', '|') AS bpe_text
FROM merged
"""


_BPE_APPLY_ORACLE = _bpe_apply_sql()


# PQ shortlist + exact refine ANN (operators/similarity.py
# pq_refine_topk — registered r14 from the oracle pinned bit-exact by
# tests/test_pq_oracle_rehearsal.py). The FAISS IndexRefineFlat shape:
# ADC scan over m=16 integer codes cuts each query's candidates to
# refine*k=50 by exact-BIGINT PQ score, then ONLY those are re-ranked
# with the exact quantized cosine (recall@5 >= 0.99 vs brute force;
# raw ADC alone is 0.36-0.68 on these synthetic embeddings —
# COVERAGE.md). Every tie (code argmin, shortlist cut, final rank)
# breaks on an id, so the replay is bit-exact.
_ANN_PQ_K, _ANN_PQ_REFINE, _ANN_PQ_M, _ANN_PQ_DIM = 5, 10, 16, 64
_ANN_PQ_D = _ANN_PQ_DIM // _ANN_PQ_M  # 4-dim subvectors

_ANN_PQ_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
    FROM embeddings
),
params AS (
    SELECT GREATEST(2, COUNT(*) // 256) AS cb_mod FROM embeddings
),
cb AS (
    SELECT j.j AS j, q.vec_id AS cid,
           list_transform(range(1, {_ANN_PQ_D + 1}),
                          i -> q.qe[j.j * {_ANN_PQ_D} + i]) AS csub
    FROM q, params, range(0, {_ANN_PQ_M}) AS j(j)
    WHERE q.vec_id % params.cb_mod = 1
),
subs AS (
    SELECT q.vec_id, j.j AS j,
           list_transform(range(1, {_ANN_PQ_D + 1}),
                          i -> q.qe[j.j * {_ANN_PQ_D} + i]) AS xsub
    FROM q, range(0, {_ANN_PQ_M}) AS j(j)
),
codes AS (
    SELECT vec_id, j, cid FROM (
        SELECT s.vec_id, s.j, cb.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id, s.j
                   ORDER BY CAST(list_sum(list_transform(range(1, {_ANN_PQ_D + 1}),
                           i -> (s.xsub[i] - cb.csub[i])
                                * (s.xsub[i] - cb.csub[i]))) AS BIGINT),
                        cb.cid) AS rn
        FROM subs s JOIN cb ON cb.j = s.j
    ) WHERE rn = 1
),
lut AS (
    SELECT a.vec_id AS query_id, cb.j, cb.cid,
           CAST(list_sum(list_transform(range(1, {_ANN_PQ_D + 1}),
                   i -> a.qe[cb.j * {_ANN_PQ_D} + i] * cb.csub[i])) AS BIGINT)
               AS pdot
    FROM q a, cb
    WHERE a.vec_id % 50 = 0
),
adc AS (
    SELECT l.query_id, c.vec_id AS neighbor_id,
           CAST(SUM(l.pdot) AS BIGINT) AS pq_score
    FROM codes c JOIN lut l ON l.j = c.j AND l.cid = c.cid
    WHERE l.query_id <> c.vec_id
    GROUP BY l.query_id, c.vec_id
),
shortlist AS (
    SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY pq_score DESC, neighbor_id) AS rn
        FROM adc
    ) WHERE rn <= {_ANN_PQ_REFINE * _ANN_PQ_K}
),
rer AS (
    SELECT s.query_id, s.neighbor_id,
           CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * b.qe[i])) AS DOUBLE)
           / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * a.qe[i])) AS DOUBLE))
              * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> b.qe[i] * b.qe[i])) AS DOUBLE)))
               AS cosine
    FROM shortlist s
    JOIN q a ON a.vec_id = s.query_id
    JOIN q b ON b.vec_id = s.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rank
    FROM rer
) WHERE rank <= {_ANN_PQ_K}
"""


# Content-defined (Rabin-rule) chunk dedup (operators/dedup.py
# content_chunk_dedup — registered r14 from the oracle pinned
# bit-exact by tests/test_content_chunk_oracle_rehearsal.py).
# Boundaries follow the token hashes (cut after tokens whose h60 %
# divisor == rem) instead of fixed positions, so shared boilerplate
# still collides on identical chunks when an edit SHIFTS it — the case
# fixed-stride chunk_dedup provably misses (pytest-pinned contrast in
# test_content_chunks.py). The cut-position list is ascending, so the
# doc end dedups with a tail check instead of list_distinct (whose
# ordering DuckDB does not guarantee; Spark's array_distinct is
# order-preserving). Everything is md5 + integer arithmetic.
_CC_DIVISOR, _CC_REM = 16, 3

_CONTENT_CHUNK_ORACLE = f"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                       t -> t <> '') AS t
    FROM documents
),
e AS (
    SELECT doc_id, t,
           CASE WHEN coalesce(cuts[-1], CAST(-1 AS BIGINT)) = len(t)
                THEN cuts ELSE list_append(cuts, CAST(len(t) AS BIGINT)) END
               AS ends
    FROM (
        SELECT doc_id, t,
               list_filter(range(1, len(t) + 1),
                   p -> CAST(('0x' || substring(md5(t[p]), 1, 15)) AS BIGINT)
                        % {_CC_DIVISOR} = {_CC_REM}) AS cuts
        FROM toks WHERE len(t) >= 1
    )
),
chunks AS (
    SELECT doc_id, CAST(k - 1 AS INT) AS chunk_idx,
           CAST(len(ck) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(ck, ' ')) AS chunk_hash
    FROM (
        SELECT doc_id, k,
               list_slice(t,
                   CASE WHEN k = 1 THEN 1 ELSE ends[CAST(k - 1 AS INT)] + 1 END,
                   ends[CAST(k AS INT)]) AS ck
        FROM e, unnest(range(1, len(ends) + 1)) AS u(k)
    )
),
kp AS (
    SELECT chunk_hash, doc_id AS keep_doc_id, chunk_idx AS keep_chunk_idx
    FROM (SELECT chunk_hash, doc_id, chunk_idx,
                 row_number() OVER (PARTITION BY chunk_hash
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM chunks) WHERE rn = 1
)
SELECT c.doc_id, c.chunk_idx, c.chunk_tokens, c.chunk_hash,
       kp.keep_doc_id, kp.keep_chunk_idx,
       NOT (c.doc_id = kp.keep_doc_id AND c.chunk_idx = kp.keep_chunk_idx)
           AS is_dup
FROM chunks c JOIN kp USING (chunk_hash)
"""

__all__ += [
    '_ANN_PQ_K', '_ANN_PQ_REFINE', '_ANN_PQ_M', '_ANN_PQ_DIM',
    '_ANN_PQ_ORACLE', '_CC_DIVISOR', '_CC_REM', '_CONTENT_CHUNK_ORACLE',
]


# Corpus-drift monitor (operators/importance.py distribution_drift —
# registered r15 from the oracle pinned bit-exact by
# tests/test_drift_oracle_rehearsal.py). Half-split arrival
# convention (reference corpus = doc_id <= max/2, new snapshot = the
# rest — the incremental_dedup convention), hashed-unigram buckets
# (the DSIR convention, 512 buckets), DENSE per-bucket drift table
# where drift_num = |new_count * R - ref_count * N| — the
# cross-multiplied numerator of |new_share - ref_share|, so ranking
# by it IS ranking by share drift with zero divisions. Products ride
# DECIMAL(38,0) in the operator (HUGEINT here); the final cast to
# BIGINT is bounded at driver SFs (counts x totals << 2^63). Exact
# integers end to end.
_DRIFT_B = 512

_CORPUS_DRIFT_ORACLE = f"""
WITH cutoff AS (
    SELECT CAST(MAX(doc_id) AS BIGINT) // 2 AS cut FROM documents
),
tok AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(u.tok), 1, 15)) AS BIGINT)
               % {_DRIFT_B} AS bucket
    FROM (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), unnest(t) AS u(tok)
),
ref AS (
    SELECT bucket, count(*) AS ref_count FROM tok, cutoff
    WHERE doc_id <= cut GROUP BY bucket
),
nw AS (
    SELECT bucket, count(*) AS new_count FROM tok, cutoff
    WHERE doc_id > cut GROUP BY bucket
),
dense AS (
    SELECT r.range AS bucket,
           COALESCE(ref.ref_count, 0) AS ref_count,
           COALESCE(nw.new_count, 0) AS new_count
    FROM range({_DRIFT_B}) r
    LEFT JOIN ref ON ref.bucket = r.range
    LEFT JOIN nw ON nw.bucket = r.range
),
tot AS (
    SELECT CAST(SUM(ref_count) AS HUGEINT) AS R,
           CAST(SUM(new_count) AS HUGEINT) AS N
    FROM dense
)
SELECT bucket, CAST(ref_count AS BIGINT) AS ref_count,
       CAST(new_count AS BIGINT) AS new_count,
       CAST(ABS(CAST(new_count AS HUGEINT) * tot.R
                - CAST(ref_count AS HUGEINT) * tot.N) AS BIGINT) AS drift_num
FROM dense, tot
"""


# Composed IVF pruning x PQ/ADC scoring (operators/similarity.py
# ivf_pq_topk — registered r15 from the oracle pinned bit-exact by
# tests/test_ivf_pq_oracle_rehearsal.py). The FAISS ``IVFx,PQy``
# production shape: the inverted file cuts candidates to the nprobe=2
# probed lists (exact quantized-cosine assignment, id tie-breaks),
# then the survivors are scored from m=16 integer PQ codes (ADC) —
# the corpus-wide scan never touches a full vector. Integer sums and
# id tie-breaks end to end — bit-exact replay.
_IVFPQ_K, _IVFPQ_NPROBE, _IVFPQ_M, _IVFPQ_DIM = 5, 2, 16, 64
_IVFPQ_D = _IVFPQ_DIM // _IVFPQ_M  # 4-dim subvectors
_IVFPQ_CMOD, _IVFPQ_CREM = 37, 3

_IVFPQ_COS = (
    "CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * c.ce[i])) AS DOUBLE)"
    " / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qe[i] * a.qe[i])) AS DOUBLE))"
    " * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> c.ce[i] * c.ce[i])) AS DOUBLE)))"
)

_ANN_IVF_PQ_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
    FROM embeddings
),
cent AS (SELECT vec_id AS cid, qe AS ce FROM q
         WHERE vec_id % {_IVFPQ_CMOD} = {_IVFPQ_CREM}),
assign AS (
    SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_IVFPQ_COS} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c
    ) WHERE rn = 1
),
probe AS (
    SELECT vec_id, cid FROM (
        SELECT a.vec_id, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_IVFPQ_COS} DESC, c.cid
               ) AS rn
        FROM q a CROSS JOIN cent c WHERE a.vec_id % 50 = 0
    ) WHERE rn <= {_IVFPQ_NPROBE}
),
params AS (
    SELECT GREATEST(2, COUNT(*) // 256) AS cb_mod FROM embeddings
),
cb AS (
    SELECT j.j AS j, q.vec_id AS ccid,
           list_transform(range(1, {_IVFPQ_D + 1}),
                          i -> q.qe[j.j * {_IVFPQ_D} + i]) AS csub
    FROM q, params, range(0, {_IVFPQ_M}) AS j(j)
    WHERE q.vec_id % params.cb_mod = 1
),
subs AS (
    SELECT q.vec_id, j.j AS j,
           list_transform(range(1, {_IVFPQ_D + 1}),
                          i -> q.qe[j.j * {_IVFPQ_D} + i]) AS xsub
    FROM q, range(0, {_IVFPQ_M}) AS j(j)
),
codes AS (
    SELECT vec_id, j, ccid FROM (
        SELECT s.vec_id, s.j, cb.ccid,
               ROW_NUMBER() OVER (
                   PARTITION BY s.vec_id, s.j
                   ORDER BY CAST(list_sum(list_transform(range(1, {_IVFPQ_D + 1}),
                           i -> (s.xsub[i] - cb.csub[i])
                                * (s.xsub[i] - cb.csub[i]))) AS BIGINT),
                        cb.ccid) AS rn
        FROM subs s JOIN cb ON cb.j = s.j
    ) WHERE rn = 1
),
lut AS (
    SELECT a.vec_id AS query_id, cb.j, cb.ccid,
           CAST(list_sum(list_transform(range(1, {_IVFPQ_D + 1}),
                   i -> a.qe[cb.j * {_IVFPQ_D} + i] * cb.csub[i])) AS BIGINT)
               AS pdot
    FROM q a, cb
    WHERE a.vec_id % 50 = 0
),
adc AS (
    SELECT p.vec_id AS query_id, n.vec_id AS neighbor_id,
           CAST(SUM(l.pdot) AS BIGINT) AS pq_score
    FROM probe p
    JOIN assign n ON p.cid = n.cid
    JOIN codes c ON c.vec_id = n.vec_id
    JOIN lut l ON l.j = c.j AND l.ccid = c.ccid AND l.query_id = p.vec_id
    WHERE p.vec_id <> n.vec_id
    GROUP BY p.vec_id, n.vec_id
)
SELECT query_id, neighbor_id, pq_score, CAST(rank AS INTEGER) AS rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY pq_score DESC, neighbor_id) AS rank
    FROM adc
) WHERE rank <= {_IVFPQ_K}
"""

__all__ += [
    '_DRIFT_B', '_CORPUS_DRIFT_ORACLE',
    '_IVFPQ_K', '_IVFPQ_NPROBE', '_IVFPQ_M', '_IVFPQ_DIM',
    '_IVFPQ_CMOD', '_IVFPQ_CREM', '_ANN_IVF_PQ_ORACLE',
]
