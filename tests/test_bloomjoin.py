"""Bloom-bitset runtime filter: the contract is (a) ZERO false
negatives — every true match passes the bitset — for any sizing, and
(b) the verified semi-join equals the plain semi-join exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.bloomjoin import (
    bloom_mark,
    bloom_prune,
    bloom_semi_join,
)


def _frames(spark, fact_keys, dim_keys):
    fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
    dim = spark.createDataFrame([(k,) for k in dim_keys], "dk long")
    return fact, dim


def test_bloom_never_misses_a_match(spark):
    # tiny bitset (64 bits, 2 words) for 40 keys: heavily loaded, so
    # false positives are near-certain — misses must still be zero.
    fact, dim = _frames(spark, range(200), range(0, 200, 5))
    marked = bloom_mark(fact, dim, "k", "dk", num_bits=64, num_hashes=3)
    misses = marked.filter((F.col("k") % 5 == 0) & ~F.col("bloom_hit")).count()
    assert misses == 0


def test_bloom_semi_join_exact_for_any_sizing(spark):
    fact, dim = _frames(spark, range(500), [3, 77, 411, 499, 998])
    expected = {3, 77, 411, 499}
    for bits in (64, 4096):
        got = {
            r.k
            for r in bloom_semi_join(
                fact, dim, "k", "dk", num_bits=bits, num_hashes=3
            ).collect()
        }
        assert got == expected, f"num_bits={bits}"


def test_bloom_empty_dim_prunes_everything(spark):
    fact, dim = _frames(spark, range(50), [])
    assert bloom_prune(fact, dim, "k", "dk", num_bits=256, num_hashes=2).count() == 0
    assert bloom_semi_join(fact, dim, "k", "dk", num_bits=256, num_hashes=2).count() == 0


def test_bloom_prune_subsets_fact_and_supersets_matches(spark):
    fact, dim = _frames(spark, range(300), range(0, 300, 7))
    pruned = {r.k for r in bloom_prune(fact, dim, "k", "dk", num_bits=512, num_hashes=3).collect()}
    matches = set(range(0, 300, 7))
    assert matches <= pruned <= set(range(300))
