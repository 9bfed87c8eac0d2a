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
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def _in_list(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def stopword_hits(toks_col_name: str, lang: str) -> Column:
    """Occurrences (not distinct) of the language's stopwords."""
    lst = _in_list(LANG_STOPWORDS[lang])
    return F.expr(
        f"size(filter({toks_col_name}, t -> t IN ({lst})))"
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


def sentiment_hits(toks_col_name: str, polarity: str) -> Column:
    """Occurrences (not distinct) of the polarity lexicon's words."""
    lst = _in_list(SENTIMENT_LEXICON[polarity])
    return F.expr(
        f"size(filter({toks_col_name}, t -> t IN ({lst})))"
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
    text (the rolling-hash fingerprint's exact-match core)."""
    return F.md5(F.concat_ws(" ", tokens(text)))
