"""Conditional split (O1) — disjoint row routing.

Reference: the ``DataQualityCheck`` split in
``dataflow/New_BookingTransformation.json:106-107`` routes
``checkout_date < checkin_date`` rows to ``BadRecords`` and everything
else to ``AcceptedRecords`` (``disjoint: true`` = each row to exactly one
branch).

Null semantics matter: in the ADF 2-way disjoint split a row whose
condition evaluates to NULL falls through to the *last* (else) branch.
A naive ``filter(~cond)`` would drop NULL rows from both branches, so the
else-branch uses a null-safe complement.

Scale: both branches are plain filters over the same scan — Catalyst
pushes each predicate into the parquet reader, and with the typical
"consume both branches in one job" pattern the scan is shared. No shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_split(df: DataFrame, condition: Column) -> tuple[DataFrame, DataFrame]:
    """Return ``(matched, rest)`` — disjoint; NULL-condition rows go to
    rest. The condition must be DETERMINISTIC: the two branches evaluate
    it in independent filters, so a non-deterministic expression (rand,
    a stateful UDF) could route a row into both branches or neither —
    rejected up front rather than silently violating `disjoint: true`."""
    try:
        # analysis-only probe (no job): Spark 4's Column wraps a
        # ColumnNode, so the expression is inspected via an analyzed
        # single-column plan
        probe = df.select(condition.alias("__c"))
        deterministic = (
            probe._jdf.queryExecution().analyzed().expressions().head().deterministic()
        )
    except Exception:
        deterministic = True  # can't introspect (e.g. Connect) — trust caller
    if not deterministic:
        raise ValueError(
            "conditional_split requires a deterministic condition; "
            "materialize the non-deterministic value into a column first"
        )
    matched = df.filter(condition)
    rest = df.filter(~F.coalesce(condition, F.lit(False)))
    return matched, rest


def quality_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The reference's DataQualityCheck: bad = checkout < checkin."""
    bad, accepted = conditional_split(df, F.col("checkout_date") < F.col("checkin_date"))
    return bad, accepted
