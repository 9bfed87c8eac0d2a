"""Oracle REHEARSAL for a future `corpus_drift` registry query (r15+
stock, same pattern as the PQ/content-chunk rehearsals): the exact
DuckDB SQL runs against the sf0.001 parquet and is compared to the
planned Spark query shape value for value.

Planned shape: half-split arrival convention (reference corpus =
doc_id <= max/2, new snapshot = the rest — the incremental_dedup
convention), hashed-unigram buckets (the DSIR convention, 512
buckets), and the DENSE per-bucket drift table (bucket, ref_count,
new_count, drift_num) where drift_num = |new*R - ref*N| — exact
integers end to end; drift_num rides DECIMAL(38,0) in the operator
and is cast to BIGINT here (bounded at driver SFs: counts x totals
<< 2^63)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.importance import (
    distribution_drift,
    token_buckets,
)

SF_DIR = "/root/testdata/sf0.001"
B = 512

REHEARSAL_SQL = f"""
WITH cutoff AS (
    SELECT CAST(MAX(doc_id) AS BIGINT) // 2 AS cut FROM documents
),
tok AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(u.tok), 1, 15)) AS BIGINT)
               % {B} AS bucket
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
    FROM range({B}) r
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


def test_corpus_drift_matches_duckdb_rehearsal(spark):
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    cut = docs.agg((F.max("doc_id").cast("long") / 2).cast("long").alias("cut"))
    with_cut = docs.join(F.broadcast(cut))
    ref = with_cut.filter(F.col("doc_id") <= F.col("cut")).select("doc_id", "text")
    new = with_cut.filter(F.col("doc_id") > F.col("cut")).select("doc_id", "text")
    per = distribution_drift(
        token_buckets(ref, "text", B), token_buckets(new, "text", B), B
    ).select(
        "bucket",
        F.col("ref_count").cast("long").alias("ref_count"),
        F.col("new_count").cast("long").alias("new_count"),
        F.col("drift_num").cast("long").alias("drift_num"),
    )
    got = {
        r.bucket: (r.ref_count, r.new_count, r.drift_num) for r in per.collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.execute(REHEARSAL_SQL).fetchall()
    }
    assert got == want  # bit-exact integers
    assert len(got) == B
    # non-degenerate at this SF: the halves are near-identical by
    # construction (31 buckets move at sf0.001), but the hash target
    # is the full 512-row table, so any bucket-level change flips it
    assert sum(1 for v in got.values() if v[2] > 0) >= 10
