"""Data-quality expectations: declarative constraints evaluated into a
violation report — the admission gate in front of a warehouse load
(Delta constraints / Great Expectations / dbt tests are the commercial
shapes; the reference pipeline trusts its feed blindly).

Each expectation compiles to a tiny aggregate over the frame:

- ``not_null(col)``            → rows with NULL col
- ``in_range(col, lo, hi)``    → non-NULL rows outside [lo, hi]
- ``unique(cols…)``            → rows beyond the first per duplicate key
- ``foreign_key(cols…, dim)``  → rows whose key misses ``dim``
  (broadcast anti-join — dims are broadcast-sized; NULL keys never
  match and therefore count as violations, the strict-FK stance)

The report is one row per expectation: (constraint, n_violations,
n_checked). Row-level scans (not_null / in_range / unique) share ONE
aggregation pass over the frame — adding expectations does not add
scans; each foreign key adds its one anti-join. All counts are exact
integers, so the report is deterministic and oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    col: str

    @property
    def name(self) -> str:
        return f"not_null({self.col})"


@dataclass(frozen=True)
class InRange:
    col: str
    lo: float
    hi: float

    @property
    def name(self) -> str:
        return f"in_range({self.col}, {self.lo}, {self.hi})"


@dataclass(frozen=True)
class Unique:
    cols: tuple[str, ...]

    @property
    def name(self) -> str:
        return f"unique({', '.join(self.cols)})"


@dataclass(frozen=True)
class ForeignKey:
    cols: tuple[str, ...]
    dim: DataFrame = field(compare=False)
    dim_cols: tuple[str, ...] = ()

    @property
    def name(self) -> str:
        return f"foreign_key({', '.join(self.cols)})"


def validate_expectations(
    df: DataFrame, expectations: Sequence[object]
) -> DataFrame:
    """Evaluate ``expectations`` over ``df`` → one report row per
    constraint: (constraint, n_violations, n_checked)."""
    row_aggs: list = [F.count(F.lit(1)).alias("__n")]
    row_names: list[str] = []
    uniques: list[Unique] = []
    fks: list[ForeignKey] = []
    for e in expectations:
        if isinstance(e, NotNull):
            row_aggs.append(
                F.count(F.when(F.col(e.col).isNull(), 1)).alias(
                    f"__v{len(row_names)}"
                )
            )
            row_names.append(e.name)
        elif isinstance(e, InRange):
            bad = F.col(e.col).isNotNull() & (
                (F.col(e.col) < e.lo) | (F.col(e.col) > e.hi)
            )
            row_aggs.append(F.count(F.when(bad, 1)).alias(f"__v{len(row_names)}"))
            row_names.append(e.name)
        elif isinstance(e, Unique):
            uniques.append(e)
        elif isinstance(e, ForeignKey):
            fks.append(e)
        else:
            raise TypeError(f"unknown expectation {e!r}")

    # one shared pass for every row-level expectation
    base = df.agg(*row_aggs)
    reports = [
        base.select(
            F.lit(nm).alias("constraint"),
            F.col(f"__v{i}").alias("n_violations"),
            F.col("__n").alias("n_checked"),
        )
        for i, nm in enumerate(row_names)
    ]
    if not reports:
        reports = [
            base.select(
                F.lit(None).cast("string").alias("constraint"),
                F.lit(0).cast("long").alias("n_violations"),
                F.col("__n").alias("n_checked"),
            ).limit(0)
        ]

    for u in uniques:
        dup = (
            df.groupBy(*u.cols)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c") - 1)), F.lit(0)
                ).alias("n_violations"),
                F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
            )
            .select(
                F.lit(u.name).alias("constraint"), "n_violations", "n_checked"
            )
        )
        reports.append(dup)

    for fk in fks:
        dim_cols = fk.dim_cols or fk.cols
        dim_keys = fk.dim.select(
            *[F.col(d).alias(c) for c, d in zip(fk.cols, dim_cols)]
        ).dropDuplicates(list(fk.cols))
        miss = (
            df.join(F.broadcast(dim_keys), list(fk.cols), "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            # n_checked rides the shared row-level aggregate — FKs add
            # only their anti-join, never another full count scan
            .join(F.broadcast(base.select(F.col("__n").alias("n_checked"))))
            .select(
                F.lit(fk.name).alias("constraint"), "n_violations", "n_checked"
            )
        )
        reports.append(miss)

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
