"""Property tests: the shuffle-shard export tail agrees with a pure
Python reference on random inputs — keys of any magnitude, any shard
count, any token-count distribution (including zero-token docs, which
must not advance the packing offset)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.sampling import pack_sequences, shard_assign


def _h(seed: str, key: int) -> int:
    return int(
        hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15], 16
    )


def _ref_shards(rows, n_shards: int, seed: str):
    """(key -> (shard, shard_pos)) reference: shard = h % n, position
    by (h, key) within the shard."""
    out = {}
    per: dict[int, list[tuple[int, int]]] = {}
    for key, _ in rows:
        h = _h(seed, key)
        per.setdefault(h % n_shards, []).append((h, key))
    for shard, members in per.items():
        for pos, (_, key) in enumerate(sorted(members), start=1):
            out[key] = (shard, pos)
    return out


@st.composite
def _export_case(draw):
    keys = draw(
        st.lists(
            st.integers(min_value=0, max_value=2**40),
            min_size=1,
            max_size=25,
            unique=True,
        )
    )
    rows = [
        (k, draw(st.integers(min_value=0, max_value=40))) for k in keys
    ]
    n_shards = draw(st.integers(min_value=1, max_value=5))
    budget = draw(st.integers(min_value=1, max_value=30))
    return rows, n_shards, budget


@settings(max_examples=10, deadline=None)
@given(_export_case())
def test_shard_pack_matches_python_reference(spark, case):
    rows, n_shards, budget = case
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    sharded = shard_assign(df, "doc_id", n_shards, seed="prop")
    got_shards = {
        r.doc_id: (r.shard, r.shard_pos) for r in sharded.collect()
    }
    want_shards = _ref_shards(rows, n_shards, "prop")
    assert got_shards == want_shards

    packed = {
        r.doc_id: (r.token_offset, r.seq_id)
        for r in pack_sequences(
            sharded, "shard", "shard_pos", F.col("n_tokens"), budget
        ).collect()
    }
    # reference packing: running offset within each shard in shard_pos
    # order; a zero-token doc shares its offset with the next doc
    tok = dict(rows)
    by_shard: dict[int, list[int]] = {}
    for key, (shard, pos) in sorted(
        want_shards.items(), key=lambda kv: (kv[1][0], kv[1][1])
    ):
        by_shard.setdefault(shard, []).append(key)
    want_packed = {}
    for members in by_shard.values():
        off = 0
        for key in members:
            want_packed[key] = (off, off // budget)
            off += tok[key]
    assert packed == want_packed


def test_shard_assign_duplicate_keys_fail_loud(spark):
    """Duplicate keys tie exactly on (h, key), so their within-shard
    positions would be engine-dependent — the determinism claim's one
    hole (r15 ADVICE). The guard must fail the action LOUDLY instead
    of silently emitting a nondeterministic permutation, and it must
    not cost a second exchange (it rides the existing window sort)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d")], ["doc_id", "text"]
    )
    out = shard_assign(df, "doc_id", 4, seed="s")
    with pytest.raises(Exception, match="duplicate key"):
        out.collect()
    # the guard adds no exchange: still exactly ONE hashpartitioning
    # (AQE prints the plan twice — Current + Initial — so count within
    # the first section only) and ONE window over one sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    head = plan.split("== Initial Plan ==")[0]
    assert head.count("Exchange hashpartitioning") == 1, plan
    assert head.count("+- Window ") == 1, plan
    assert "rangepartitioning" not in plan
    # unique keys pass untouched
    ok = shard_assign(
        spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"]),
        "doc_id",
        2,
        seed="s",
    )
    assert ok.count() == 2
