"""Bloom-bitset semi-join pruning: a hand-rolled RUNTIME FILTER for
the join regime Spark's planner handles worst at 100 TB — a fact table
joined to a dimension that is too large to broadcast as a hash
relation but whose KEY SET compresses into a few-MB bit array.

The reference's lookup/join surface (dataflow joins over warehouse
tables) always shuffles the fact when the dim outgrows the broadcast
threshold. This operator keeps the fact scan shuffle-free: the dim's
keys are hashed into a fixed-size Bloom bitset (built distributed —
explode positions, one word-level ``bit_or`` aggregate, never a
driver-side set), the one-row bitset is broadcast onto the fact as a
pure Catalyst filter (``element_at`` + bitwise AND in whole-stage
codegen), and only the surviving sliver — true matches plus the
tunable false-positive residue — reaches the exact ``left_semi``
verify.
That verify makes the END RESULT exactly the semi-join regardless of
false positives, so correctness never depends on the filter; the
filter only moves work off the 100 TB side. This is the same shape as
Spark's own AQE runtime bloom (InjectRuntimeFilter), exposed as an
operator so pipelines can apply it across stage boundaries the
optimizer can't see through (checkpointed frames, foreachBatch sinks,
pre-bucketed stores).

Determinism: positions are md5-h60 of ``"<i>:<key>"`` mod
``num_bits`` — exact integers, reproducible in DuckDB with the shared
``('0x' || substring(md5(..), 1, 15))`` convention, so even the
pre-verify survivor set (false positives included) is oracle-checkable
cross-engine.

Sizing: with ``n`` dim keys, ``m = num_bits``, ``k = num_hashes``,
false-positive rate ≈ ``(1 - e^(-kn/m))^k`` — 1 byte per key
(m = 8n, k = 3) gives ~3%. The bitset frame is ``m/64`` longs ≤ a few
MB for billions of keys at the coarse end; words with no set bits are
simply absent from the map (sparse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import h60


def bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The ``num_hashes`` bit positions for one key: md5-h60 of the
    salted string ``"<i>:<key>"`` mod ``num_bits``. h60 is a positive
    60-bit integer, so ``%`` and ``pmod`` agree (and agree with
    DuckDB's ``%``)."""
    return [
        F.pmod(
            h60(F.concat(F.lit(f"{i}:"), key.cast("string"))), F.lit(num_bits)
        )
        for i in range(num_hashes)
    ]


def _mask(pos: Column) -> Column:
    """``1 << (pos & 63)`` as a long. The PySpark ``shiftleft`` wrapper
    only takes literal shift amounts; ``call_function`` reaches the SQL
    form, which accepts a column (``pow`` would round above 2^53)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )


def bloom_bitset(
    keys_df: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """ONE-ROW frame ``(bloom: map<long, long>)`` — the dim key set as
    a sparse word-indexed bitset (word = position >> 6, mask = OR of
    ``1 << (position & 63)``). Built with one explode + one word-level
    aggregate: the dim is scanned once, shuffles only exploded
    ``(word, mask)`` ints, and the result is metadata-sized — never a
    driver-side collect. Map lookup is key-addressed, so the
    collect_list order feeding ``map_from_entries`` is irrelevant."""
    pos = (
        keys_df.select(
            F.explode(
                F.array(*bloom_positions(F.col(key_col), num_bits, num_hashes))
            ).alias("pos")
        )
        .distinct()
        .select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            _mask(F.col("pos")).alias("m"),
        )
    )
    words = pos.groupBy("w").agg(F.bit_or("m").alias("m"))
    return words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("bloom")
    )


def bloom_mark(
    fact: DataFrame,
    keys_df: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """``fact`` + boolean ``out_col``: does the row's key PASS the
    dim's Bloom bitset (true matches plus false positives)? The fact
    side stays a narrow scan+project: the bitset row is broadcast via
    a 1-row join and every probe is ``element_at`` + bitwise AND in
    whole-stage codegen."""
    dim_key = dim_key or fact_key
    bits = bloom_bitset(keys_df, dim_key, num_bits, num_hashes)
    cond = None
    for p in bloom_positions(F.col(fact_key), num_bits, num_hashes):
        hit = (
            F.coalesce(
                F.element_at(F.col("bloom"), F.shiftright(p, 6)), F.lit(0)
            ).bitwiseAND(_mask(p))
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    return fact.join(F.broadcast(bits)).withColumn(out_col, cond).drop("bloom")


def bloom_prune(
    fact: DataFrame,
    keys_df: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
) -> DataFrame:
    """``fact`` filtered to its Bloom survivors — NO exact verify (use
    ``bloom_semi_join`` for the exact result)."""
    marked = bloom_mark(
        fact, keys_df, fact_key, dim_key, num_bits, num_hashes, "__bh"
    )
    return marked.filter(F.col("__bh")).drop("__bh")


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 3,
) -> DataFrame:
    """Exact ``left_semi`` of ``fact`` against ``dim``'s keys, with the
    Bloom bitset pruning the fact BEFORE the shuffle join: only bloom
    survivors (matches + the small false-positive sliver) are hashed
    across the cluster, so the shuffle volume follows the MATCH size,
    not the fact size. The verify join guarantees the result equals
    the plain semi-join for any bitset sizing."""
    dim_key = dim_key or fact_key
    pruned = bloom_prune(fact, dim, fact_key, dim_key, num_bits, num_hashes)
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.join(keys, on=fact_key, how="left_semi")
