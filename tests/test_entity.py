

def test_fuzzy_key_pairs_matches_brute_force(spark):
    """Delete-1 blocking must be COMPLETE for distance <= 1: the pair
    set equals the brute-force cross join's, on keys exercising
    substitution, insertion, deletion, equality, and non-matches."""
    from airbnb_cdc_spark.operators.entity import fuzzy_key_pairs

    left_keys = ["kitten", "abc", "abcd", "zzz", "q", ""]
    right_keys = ["kittens", "mitten", "abd", "abc", "bcd", "qq", "xyz", ""]
    left = spark.createDataFrame([(k,) for k in left_keys], "lk string")
    right = spark.createDataFrame([(k,) for k in right_keys], "rk string")
    got = {
        (r.lk, r.rk, r.dist)
        for r in fuzzy_key_pairs(left, right, "lk", "rk").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b, lev(a, b))
        for a in left_keys
        for b in right_keys
        if lev(a, b) <= 1
    }
    assert got == want


def test_fuzzy_key_pairs_rejects_wider_radius(spark):
    import pytest as _pytest

    from airbnb_cdc_spark.operators.entity import fuzzy_key_pairs

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError):
        fuzzy_key_pairs(df, df, "k", "k", max_dist=2)
