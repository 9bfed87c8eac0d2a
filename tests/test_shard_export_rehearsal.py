"""Oracle REHEARSAL for a future `shard_pack_export` registry query
(r16+ stock, the PQ/content-chunk/drift/ivf-pq registration pattern):
the complete training-export tail — deterministic shuffle-shard
(`shard_assign`, seeded 60-bit md5 hash, shard = h % n, within-shard
order (h, key)) composed with offset-based greedy packing
(`pack_sequences`, budget 512) — compared value for value against the
exact DuckDB SQL at sf0.001.

This is the step a pretraining pipeline runs LAST: after filtering /
dedup / mixture, the corpus is pseudo-randomly sharded (no rand(), no
global sort — one hash shuffle + per-shard windows) and packed into
fixed-token-budget sequences per shard. Everything is integer
arithmetic over md5 prefixes, so the replay is bit-exact."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.sampling import pack_sequences, shard_assign

SF_DIR = "/root/testdata/sf0.001"
N_SHARDS = 8
SEED = "r16"
BUDGET = 512

REHEARSAL_SQL = f"""
WITH t AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(concat_ws(':', '{SEED}',
                    CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h,
           CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                    tk -> tk <> '')) AS BIGINT) AS n_tokens
    FROM documents
    WHERE doc_id IS NOT NULL
),
s AS (
    SELECT doc_id, n_tokens,
           CAST(h % {N_SHARDS} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS}
                                   ORDER BY h, doc_id) AS BIGINT) AS shard_pos
    FROM t
)
SELECT doc_id, shard, shard_pos, n_tokens,
       CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS token_offset,
       CAST((SUM(n_tokens) OVER w - n_tokens) // {BUDGET} AS BIGINT) AS seq_id
FROM s
WINDOW w AS (PARTITION BY shard ORDER BY shard_pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def test_shard_pack_export_matches_duckdb_rehearsal(spark):
    from airbnb_cdc_spark.functions.textfns import token_count
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sharded = shard_assign(
        docs.select("doc_id", "text"), "doc_id", N_SHARDS, seed=SEED
    )
    packed = pack_sequences(
        sharded, "shard", "shard_pos", token_count(F.col("text")), BUDGET
    )
    # pack_sequences keeps (id, shard, n_tokens, token_offset, seq_id);
    # join shard_pos back from the sharded frame for the full contract
    out = packed.join(
        sharded.select("doc_id", "shard_pos"), "doc_id"
    ).select(
        "doc_id", "shard", "shard_pos", "n_tokens", "token_offset", "seq_id"
    )
    got = {
        r.doc_id: (r.shard, r.shard_pos, r.n_tokens, r.token_offset, r.seq_id)
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        row[0]: tuple(row[1:])
        for row in con.execute(REHEARSAL_SQL).fetchall()
    }
    assert got == want  # bit-exact integers end to end
    assert len(got) > 0
    # the shuffle actually spreads: every shard is populated and no
    # shard holds more than half the corpus at this SF
    from collections import Counter

    per_shard = Counter(v[0] for v in got.values())
    assert len(per_shard) == N_SHARDS
    assert max(per_shard.values()) <= len(got) / 2
    # a different seed yields a different permutation (same corpus)
    resharded = shard_assign(
        docs.select("doc_id", "text"), "doc_id", N_SHARDS, seed="other"
    )
    got2 = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in resharded.select("doc_id", "shard", "shard_pos").collect()
    }
    assert got2 != {k: v[:2] for k, v in got.items()}
