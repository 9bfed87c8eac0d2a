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

WORDS = ["agg", "row", "scan", "the", "a", "of", "and", "is", "to", "in", "zz"]


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
