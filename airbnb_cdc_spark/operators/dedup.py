"""Deduplication family: exact, n-gram Jaccard, MinHash+LSH, SimHash.

These are the training-data-pipeline operators layered on top of the
reference's surface (BASELINE.json north star). Design notes per 100 TB:

- **Exact**: hash-groupBy on a normalized fingerprint — one shuffle on
  the hash, minimal row (id, fingerprint) shuffled, winner = min id.
- **N-gram Jaccard**: intersection via an *inverted index* self-join
  (explode distinct shingles → join on shingle → count per pair), NOT an
  all-pairs cross join — pair candidates are generated only where they
  share a shingle. ``max_doc_freq`` drops stop-shingles (a shingle in
  half the corpus creates O(n²) candidate pairs — frequency-capping is
  what keeps the join linear-ish at scale).
- **MinHash+LSH**: k md5-min signatures per doc (one explode +
  groupBy), banded into b buckets; only docs sharing a band bucket are
  paired, then verified with exact Jaccard. This is the classic
  shingle→minhash→band→bucket-join pipeline; cost scales with bucket
  collision counts, not n².
- **SimHash**: 16-bit signed bit-vote fingerprint over distinct tokens;
  pure projection (no shuffle), near-dup candidates = equal simhash.

md5 (hex string) is the hash everywhere — deterministic and available
in every engine, so DuckDB oracles reproduce results bit-for-bit.
min() over md5 strings is a valid permutation surrogate for MinHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbnb_cdc_spark.functions.textfns import normalized_fingerprint, shingles, tokens
from airbnb_cdc_spark.session import ensure_parallelism, persist_tracked


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per normalized-text fingerprint."""
    fp = df.select(
        F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fingerprint")
    )
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "fingerprint")
    )


AUTO = "auto"


def _doc_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_doc_freq: int | str | None,
) -> DataFrame:
    """(id, shingle) inverted index over distinct shingles per doc.

    ``max_doc_freq`` drops stop-shingles: a shingle present in a large
    fraction of the corpus generates O(n²) candidate pairs in any
    shingle-join, so frequency-capping is what keeps the self-join
    linear-ish at 100 TB. ``AUTO`` derives the cap from the corpus size
    as ``max(2, n_docs // 100)`` — computed lazily via a broadcast
    one-row count join, so no driver-side action is triggered."""
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), n))).alias("sh"),
    )
    if max_doc_freq is None:
        return sh
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("__df"))
    if max_doc_freq == AUTO:
        total = df.select(F.count(F.lit(1)).alias("__n"))
        freq = freq.join(F.broadcast(total)).filter(
            F.col("__df")
            <= F.greatest(F.lit(2), F.floor(F.col("__n") / 100).cast("long"))
        )
    else:
        freq = freq.filter(F.col("__df") <= max_doc_freq)
    return sh.join(freq.select("sh"), on="sh", how="inner").select("id", "sh")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | str | None = AUTO,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with n-gram Jaccard >= threshold
    over the frequency-capped shingle sets (stop-shingles excluded — the
    default AUTO cap is what bounds candidate generation at scale)."""
    # The inverted index feeds both self-join sides AND the size lookup —
    # persist it so tokenize/shingle/explode runs once, not 4x (at scale:
    # MEMORY_AND_DISK, the index is ~distinct-shingles-per-doc rows).
    # Join on the 64-bit hash of the shingle, not the string: same
    # intersection counts (collisions are ~n²/2⁶⁴), a fraction of the
    # shuffle bytes — the join key is what gets shuffled twice.
    sh = persist_tracked(
        _doc_shingles(df, id_col, text_col, n, max_doc_freq)
        .select("id", F.xxhash64("sh").alias("shk"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col("id").alias("id_a"), "shk")
    b = sh.select(F.col("id").alias("id_b"), "shk")
    inter = (
        a.join(b, on="shk")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    max_doc_freq: int | str | None = AUTO,
) -> DataFrame:
    """k MinHash values per doc: min over shingles of md5(j ':' shingle).
    One explode + one groupBy; signature row stays tiny (k hex strings)."""
    sh = _doc_shingles(df, id_col, text_col, n, max_doc_freq)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return sh.groupBy(F.col("id").alias(id_col)).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | str | None = AUTO,
) -> DataFrame:
    """Candidate pairs from banded MinHash buckets, verified with exact
    Jaccard: shingle → minhash → band → bucket-join → verify. The
    frequency cap applies to the shared index, so both the signatures
    and the verify stage see the capped shingle sets."""
    # One shared inverted index for signature build, candidate verify,
    # and size lookup (see ngram_jaccard_pairs on why persist).
    sh_all = persist_tracked(_doc_shingles(df, id_col, text_col, n, max_doc_freq))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"mh{j}")
        for j in range(k)
    ]
    sig = sh_all.groupBy(F.col("id").alias(id_col)).agg(*aggs)
    n_bands = k // band_size
    bands = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[F.col(f"mh{b * band_size + r}") for r in range(band_size)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on="bucket")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # Verify candidates with exact Jaccard (join back to the inverted index).
    sh = sh_all
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def streaming_exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup for a document *stream*: keep the first arrival per
    normalized-text fingerprint, dropping re-arrivals whose event time is
    within ``watermark`` of the first (``dropDuplicatesWithinWatermark``
    — state for a fingerprint is evicted once the watermark passes it, so
    state size is bounded by the dedup horizon, not the corpus). Note the
    guarantee is one-sided: dups within the horizon are always dropped;
    dups *beyond* it are dropped too while the state happens to live
    (eviction runs as the watermark advances between micro-batches) and
    re-admitted after.

    Batch input degrades to the plain fingerprint dedup (first row per
    fingerprint in storage order) so one call site serves both modes.

    Scale: one shuffle on the fingerprint; state store per fingerprint
    key within the horizon. At 100 TB/day the horizon (not the corpus)
    bounds memory — widen it only as far as re-delivery actually spans.
    """
    fp = df.select(
        F.col(id_col),
        F.col(ts_col),
        normalized_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    if df.isStreaming:
        return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["fingerprint"]
        )
    return fp.dropDuplicates(["fingerprint"])


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16
) -> DataFrame:
    """Signed bit-vote SimHash over distinct tokens. Bit i's vote for a
    token is the parity of hex digit i of md5(token) (>= '8' → +1).
    Pure projection — fingerprints then group/join however the caller
    wants (equal simhash = near-dup candidate).

    Each token is md5'd exactly ONCE: the hex array lives in its own
    projection (CollapseProject keeps a non-cheap alias referenced by
    many expressions materialized, and codegen CSE doesn't reach inside
    lambda bodies), and the ``bits`` bit-votes are derived from the
    cached hex strings with cheap substring compares."""
    toks = F.array_distinct(tokens(F.col(text_col)))
    base = ensure_parallelism(df).select(F.col(id_col), toks.alias("__toks"))
    hexed = base.select(
        F.col(id_col),
        F.transform(F.col("__toks"), lambda t: F.md5(t)).alias("__hex"),
    )

    def vote_adder(i: int):
        # factory: the closure must bind i per bit (a loop-shared lambda
        # would capture the final i).
        def fn(acc, h):
            return acc + F.when(
                F.substring(h, i + 1, 1).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                F.lit(1),
            ).otherwise(F.lit(-1))

        return fn

    bit_votes = []
    for i in range(bits):
        # vote_i = sum over tokens of +-1; bit set iff vote > 0
        vote = F.aggregate(F.col("__hex"), F.lit(0), vote_adder(i))
        bit_votes.append(F.when(vote > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    total = bit_votes[0]
    for b in bit_votes[1:]:
        total = total + b
    return hexed.select(id_col, total.cast("long").alias("simhash"))
