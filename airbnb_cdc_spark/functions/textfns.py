"""Text expression helpers — all Catalyst higher-order functions.

Whole-stage-codegen friendly: tokenization, shingling, hashing and the
quality ratios are built-in expressions (split/filter/transform/md5),
so they run JVM-side at full scan speed — the right shape for a 100 TB
text pipeline (no Python in the hot path, SURVEY.md §2.9 stance).

Determinism: ratios are derived from exact integer counts, and hashes
are md5 hex strings, so results are bitwise reproducible across engines
(the DuckDB oracles compute the same formulas).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Distinctive stopwords per language for the n-gram/stopword language-ID
# heuristic. Small on purpose: the heuristic is argmax of exact counts.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans"),
    "es": ("el", "los", "las", "una", "es", "para", "como"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "zh": ("de5", "shi4", "zai4", "he2", "le5", "you3", "wo3"),
}

LANG_PRIORITY: tuple[str, ...] = ("en", "fr", "es", "de", "zh")


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped. NULL text reads
    as the EMPTY document (coalesce) — without it every downstream
    ``size()`` returns -1 (Spark's sizeOfNull) and language-ID's argmax
    misfires; the whole text family shares this one normalization."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def h60(col: Column) -> Column:
    """60-bit integer hash: first 15 hex digits of md5 — THE shared
    engine-exactness-critical string hash (dedup sets, sketch cells,
    decontamination). DuckDB mirror:
    ``CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)``. Lives here,
    not in an operator module, because three operator families depend
    on the exact convention."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(toks: str | Column, lang: str) -> Column:
    """Occurrences (not distinct) of the language's stopwords.
    Accepts a column name OR a Column so inline consumers
    (quality_predicate) share this one lexicon-count definition."""
    col = F.col(toks) if isinstance(toks, str) else toks
    return F.size(
        F.filter(col, lambda t: t.isin(*LANG_STOPWORDS[lang]))
    ).cast("long")


# Small polarity lexicon for lexicon-based sentiment scoring (SURVEY §7
# M7). Deliberately tiny and generic — the operator is the point
# (broadcast-free IN-list membership in codegen); swap in AFINN/VADER
# word lists for production use.
SENTIMENT_LEXICON: dict[str, tuple[str, ...]] = {
    "pos": (
        "good", "great", "excellent", "love", "best", "happy",
        "wonderful", "amazing", "nice", "perfect",
    ),
    "neg": (
        "bad", "terrible", "awful", "hate", "worst", "sad",
        "horrible", "poor", "wrong", "broken",
    ),
}


def sentiment_hits(toks: str | Column, polarity: str) -> Column:
    """Occurrences (not distinct) of the polarity lexicon's words."""
    col = F.col(toks) if isinstance(toks, str) else toks
    return F.size(
        F.filter(col, lambda t: t.isin(*SENTIMENT_LEXICON[polarity]))
    ).cast("long")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); empty if fewer than n tokens."""
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )


def xxh_shingles_from_token_hashes(th: Column, n: int = 3) -> Column:
    """Shingle identity hashes WITHOUT building shingle strings: given
    ``th`` = per-token xxhash64 array (hash each token ONCE), a
    shingle's identity is xxhash64 over its n token hashes — 8n bytes
    re-hashed per shingle instead of re-concatenating and re-hashing
    ~n× the document's characters (each token appears in n shingle
    strings). Injective-in-practice exactly like hashing the shingle
    string (tokens contain no whitespace, so (h(t_i),…,h(t_{i+n-1})) ↔
    shingle up to 64-bit collisions — the same trade the string hash
    already made), and the Jaccard family is hash-agnostic: its oracles
    compute on the shingle strings, so any injective identity gives
    identical results.

    ``th`` MUST be a materialized column reference (not an inline
    expression): ``element_at`` reads it n times per shingle, and an
    inline ``transform`` would re-run per access. Callers project the
    token-hash array in a separate select (CollapseProject keeps
    non-cheap expressions single-evaluated)."""
    return F.when(F.size(th) < n, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(th) - (n - 1)),
            lambda i: F.xxhash64(*[F.element_at(th, i + j) for j in range(n)]),
        )
    )


def normalized_fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (the rolling-hash fingerprint's exact-match core). NULL text
    fingerprints as the empty document — deliberate (the ``tokens``
    normalization) and engine-consistent: DuckDB's concat_ws also skips
    NULLs, so both sides agree that a NULL doc ≡ '' for dedup."""
    return F.md5(F.concat_ws(" ", tokens(text)))
