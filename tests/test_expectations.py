"""validate_expectations: each constraint counts exactly its violations."""

from __future__ import annotations

from airbnb_cdc_spark.operators.expectations import (
    ForeignKey,
    InRange,
    NotNull,
    Unique,
    validate_expectations,
)


def test_expectations_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10, 5.0),
            (2, None, -1.0),   # null FK col + below range
            (2, 10, 2000.0),   # duplicate id + above range
            (3, 99, None),     # dangling FK; NULL value not a range violation
            (2, 10, 7.0),      # third copy of id 2
        ],
        "id long, cust long, amount double",
    )
    dim = spark.createDataFrame([(10,), (11,)], "cust long")
    report = {
        r.constraint: (r.n_violations, r.n_checked)
        for r in validate_expectations(
            df,
            [
                NotNull("cust"),
                InRange("amount", 0.0, 1000.0),
                Unique(("id",)),
                ForeignKey(("cust",), dim),
            ],
        ).collect()
    }
    assert report["not_null(cust)"] == (1, 5)
    assert report["in_range(amount, 0.0, 1000.0)"] == (2, 5)
    # 3 rows share id=2 → 2 beyond the first
    assert report["unique(id)"] == (2, 5)
    # cust=99 (1 row) + cust NULL (1 row, strict-FK stance) miss the dim
    assert report["foreign_key(cust)"] == (2, 5)


def test_expectations_clean_frame(spark):
    df = spark.createDataFrame([(1, 10)], "id long, cust long")
    dim = spark.createDataFrame([(10,)], "cust long")
    report = validate_expectations(
        df, [NotNull("cust"), Unique(("id",)), ForeignKey(("cust",), dim)]
    ).collect()
    assert all(r.n_violations == 0 for r in report)
    assert {r.n_checked for r in report} == {1}
