"""BM25 keyword retrieval over the documents table — the classic
sparse-retrieval scorer (Robertson/Sparck-Jones probabilistic model),
expressed as one scan-filtered aggregation. No reference-file parity
(the reference has no retrieval surface); this is an LLM-data-pipeline
first-class op (query-based corpus slicing / hard-negative mining).

Determinism contract (why this hash-matches a DuckDB oracle despite
double arithmetic): the standard BM25 uses ``ln((N - df + 0.5)/(df +
0.5))``; libm and the JVM disagree in the last ulp on transcendental
functions, which poisons hash compares (the repo-wide "no float log"
stance, see queries.py top_terms_per_doc). Instead the idf here is the
RATIONAL Robertson-Sparck-Jones core without the log:

    idf = (N - df + 0.5) / (df + 0.5)  ==  (2N - 2df + 1) / (2df + 1)

— the same monotone ordering in df (log is monotone), so rankings are
BM25-faithful. Every input (tf, df, dl, N, T) is an exact integer cast
to double; k1 = 1.25 and b = 0.75 are chosen BINARY-EXACT (2.25, 1.25,
0.75, 0.25 are all dyadic rationals) so literal parsing and decimal
promotion are exact in both engines; and the per-row score is a fixed
left-to-right expression tree (generated from the same term-list
constants as the SQL oracle), so both engines perform the identical
sequence of correctly-rounded IEEE ops → bit-identical doubles.

Scale shape: the term IN-list filter lands on the exploded token
stream straight off the scan, so only postings for the query terms
survive (inverted-index behavior without materializing an index);
per-doc tf is ONE hash groupBy over those postings; corpus stats
(N, total tokens) and per-term document frequencies are single-row
aggregates broadcast to the scored rows; the final top-k is a
TakeOrdered, never a global sort. At 100 TB the shuffled volume is
(matching docs) x (query terms) — data-proportional to the hit set,
not the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import tokens
from airbnb_cdc_spark.session import ensure_parallelism

# binary-exact BM25 parameters: k1 = 1.25, b = 0.75
_K1 = 1.25
_K1P1 = 2.25
_B = 0.75
_ONE_MINUS_B = 0.25


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document matching >= 1 query term with the
    rational-idf BM25 (module docstring). Returns ``(id, n_matched,
    score)``; rank with ``orderBy(score DESC, id)``."""
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct terms")

    base = ensure_parallelism(df).select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("dl").cast("double").alias("__t"),
    )
    # filter INSIDE the token array, then explode: the per-row fan-out
    # is hits-only (query terms are a handful), instead of exploding
    # the full token stream and filtering the generated rows — at
    # corpus scale the difference is the whole token volume.
    postings = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(
            F.filter(
                tokens(F.col(text_col)), lambda t: t.isin(*list(terms))
            )
        ).alias("term"),
    )
    tf = postings.groupBy(id_col).agg(
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"tf_{i}")
            for i, t in enumerate(terms, 1)
        ]
    )
    return _bm25_rank(tf, base, stats, terms, id_col)


def bm25_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k BM25 retrieval: deterministic (score DESC, id ASC) cut —
    a TakeOrdered in the physical plan (limit pushed into the sort),
    never a full global sort."""
    return (
        bm25_scores(df, terms, id_col=id_col, text_col=text_col)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def bm25_scores_from_tf(
    tf_store: DataFrame,
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """``bm25_scores`` served from a materialized document-term matrix
    ``(id, term, tf)`` (the tokenize-once artifact, e.g.
    ``queries.doc_tf_store``) instead of re-tokenizing the corpus:
    dl = per-doc tf sum, hits = a term IN-list filter on the matrix,
    N from one id-column count of ``docs`` (zero-token docs are absent
    from the matrix but must count toward N and idf). The score
    expression tree is shared with ``bm25_scores`` via ``_bm25_rank``,
    so the two paths cannot drift — value-identical by construction
    (A/B at sf0.1: 1.77s re-tokenize vs 0.79s store, identical rows).
    At 100 TB the saving is two full corpus tokenizations per query."""
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct terms")

    base = tf_store.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("dl")
    )
    stats = base.agg(F.sum("dl").cast("double").alias("__t")).crossJoin(
        docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    )
    hits = tf_store.filter(F.col("term").isin(*list(terms)))
    tf = hits.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("term") == t, F.col("tf")).otherwise(F.lit(0))
            ).alias(f"tf_{i}")
            for i, t in enumerate(terms, 1)
        ]
    )
    return _bm25_rank(tf, base, stats, terms, id_col)


def _bm25_rank(
    tf: DataFrame,
    base: DataFrame,
    stats: DataFrame,
    terms: Sequence[str],
    id_col: str,
) -> DataFrame:
    """The shared BM25 scoring tail: per-term df aggregates, the
    binary-exact rational-idf expression tree (module docstring), and
    the (id, n_matched, score) projection. One definition so the
    re-tokenize and doc-term-matrix paths produce bit-identical
    doubles."""
    dfs = tf.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(1, len(terms) + 1)
        ]
    )
    scored = (
        tf.join(base, id_col)
        .join(F.broadcast(stats))
        .join(F.broadcast(dfs))
    )

    n = F.col("__n")
    t_tot = F.col("__t")
    dl = F.col("dl").cast("double")
    norm = dl * n / t_tot

    def term_score(i: int):
        tfd = F.col(f"tf_{i}").cast("double")
        dfv = F.col(f"df_{i}")
        idf = (2.0 * n - 2.0 * dfv + 1.0) / (2.0 * dfv + 1.0)
        return idf * ((tfd * _K1P1) / (tfd + _K1 * (_ONE_MINUS_B + _B * norm)))

    score = term_score(1)
    for i in range(2, len(terms) + 1):
        score = score + term_score(i)
    matched = (F.col("tf_1") > 0).cast("int")
    for i in range(2, len(terms) + 1):
        matched = matched + (F.col(f"tf_{i}") > 0).cast("int")
    return scored.select(
        F.col(id_col),
        matched.cast("int").alias("n_matched"),
        score.alias("score"),
    )
