"""Alter Row (O7) — per-row DML intent markers.

Reference: ``GenerateInsertUpdateFlags``
(``dataflow/New_BookingTransformation.json:113-114``):
``insertIf(isNull(target.booking_id))``,
``updateIf(not(isNull(target.booking_id)))``. The flags drive the sink's
WHEN MATCHED / WHEN NOT MATCHED merge branches (S5).

In Spark this is a marker column consumed by the MERGE executor
(operators/merge.py). Pure Catalyst expression — no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION_COL = "_action"
INSERT = "insert"
UPDATE = "update"


def with_action_flags(df: DataFrame, target_probe_col: str) -> DataFrame:
    """insert when the lookup found no target row (probe col NULL), else
    update — the reference's exact predicate pair."""
    return df.withColumn(
        ACTION_COL,
        F.when(F.col(target_probe_col).isNull(), F.lit(INSERT)).otherwise(F.lit(UPDATE)),
    )


def action_is(action: str) -> Column:
    return F.col(ACTION_COL) == F.lit(action)
