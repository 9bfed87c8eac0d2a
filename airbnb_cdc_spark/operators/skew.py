"""Skew mitigation utilities: key salting for joins and aggregations.

AQE's skew-join splitting handles sort-merge join skew automatically
(enabled in session.py); salting is the explicit fallback for the cases
AQE can't rebalance — hot-key aggregations and broadcast-ineligible
joins where one key holds a disproportionate share of rows (a handful
of "viral" users/documents at 100 TB).

- ``salted_agg``: two-phase aggregation — phase 1 aggregates on
  (key, salt) spreading a hot key over N reducers, phase 2 combines the
  N partials. Works for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: explode the small side N ways (one copy per salt),
  salt the big side randomly — every big-side row of a hot key lands on
  one of N reducers instead of one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt in [0, n_salts) — deterministic per row via
    hash of all columns would also work; random is fine because the salt
    never affects results, only placement."""
    if SALT_COL in df.columns:
        raise ValueError(
            f"input already carries a {SALT_COL!r} column — salting "
            "would overwrite it and the join would silently drop it"
        )
    return df.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 runs fn over (keys + salt); phase 2
    re-combines partials with the matching combiner (count -> sum).
    """
    combiner = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(
            *[
                getattr(F, fn)(F.col(src)).alias(out)
                for out, (src, fn) in aggs.items()
            ]
        )
    )
    return phase1.groupBy(*keys).agg(
        *[
            getattr(F, combiner[fn])(F.col(out)).alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts, join on keys + salt.

    ``how`` is restricted to inner/left (big side preserved): a right or
    full outer join would emit every unmatched SMALL-side row once per
    salt copy — n_salts duplicates. Outer-preserve-small under salting
    needs a post-join dedup this operator deliberately doesn't hide."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(an outer join would duplicate unmatched small-side rows "
            "once per salt)"
        )
    salted_big = with_salt(big, n_salts)
    replicated = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated, on=[*keys, SALT_COL], how=how)
    return out.drop(SALT_COL)
