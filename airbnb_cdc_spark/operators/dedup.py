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
    # Single-pass cap: count-over-window on the shingle partition — ONE
    # shuffle of the index and no recompute of the (expensive) tokenize/
    # shingle/explode, vs. the groupBy+self-join formulation which scans
    # the raw index twice and shuffles it twice.
    w = Window.partitionBy("sh")
    counted = sh.withColumn("__df", F.count(F.lit(1)).over(w))
    if max_doc_freq == AUTO:
        total = df.select(F.count(F.lit(1)).alias("__n"))
        counted = counted.join(F.broadcast(total)).filter(
            F.col("__df")
            <= F.greatest(F.lit(2), F.floor(F.col("__n") / 100).cast("long"))
        )
    else:
        counted = counted.filter(F.col("__df") <= max_doc_freq)
    return counted.select("id", "sh")


def _shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_doc_freq: int | str | None,
    threshold: float,
) -> DataFrame:
    """Per-doc sorted array of 64-bit shingle hashes, with its size and
    prefix length for threshold ``threshold`` (see ngram_jaccard_pairs)."""
    sh = _doc_shingles(df, id_col, text_col, n, max_doc_freq).select(
        "id", F.xxhash64("sh").alias("h")
    )
    sz = F.size("hs")
    return (
        sh.groupBy("id")
        .agg(F.sort_array(F.collect_set("h")).alias("hs"))
        .select(
            "id",
            "hs",
            sz.alias("sz"),
            (sz - F.ceil(F.lit(threshold) * sz) + 1).cast("int").alias("plen"),
        )
    )


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
    default AUTO cap is what bounds candidate generation at scale).

    Candidate generation uses *prefix filtering* (the SSJoin/PPJoin
    family): with every doc's shingle-hash set sorted by one global
    order, a pair with J >= t must share an element inside BOTH docs'
    first ``sz - ceil(t*sz) + 1`` elements (the smallest common hash is
    that early in each). Only prefixes are exploded into the inverted
    self-join — at t=0.5 that halves the index and roughly quarters the
    candidate pairs — and verification is an exact, vectorized
    ``array_intersect`` of the two full hash sets (no third shuffle on
    the shingle). Hash collisions perturb counts with probability
    ~n²/2⁶⁴ — the same trade the round-1 hashed join made."""
    sets = persist_tracked(
        _shingle_sets(df, id_col, text_col, n, max_doc_freq, threshold)
    )
    pref = sets.select(
        "id", F.explode(F.slice("hs", F.lit(1), F.col("plen"))).alias("h")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(b, F.col("a.h") == F.col("b.h"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_pairs_by_sets(cand, sets, threshold)


def _verify_pairs_by_sets(
    cand: DataFrame, sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for candidate (id_a, id_b) pairs via array_intersect
    of the per-doc hash sets (one tiny join per side, no shingle shuffle)."""
    joined = cand.join(
        sets.select(
            F.col("id").alias("id_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")
        ),
        "id_a",
    ).join(
        sets.select(
            F.col("id").alias("id_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")
        ),
        "id_b",
    )
    return (
        joined.withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


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
    # ONE aggregation pass over the inverted index computes both the k
    # MinHash signatures (md5 over the shingle string) and the per-doc
    # hash set used for exact verification — one shuffle on the doc id,
    # persisted once, feeding the band join AND the verify stage.
    sh_all = _doc_shingles(df, id_col, text_col, n, max_doc_freq).withColumn(
        "shk", F.xxhash64("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("sh")))).alias(f"mh{j}")
        for j in range(k)
    ]
    combined = persist_tracked(
        sh_all.groupBy("id")
        .agg(*aggs, F.sort_array(F.collect_set("shk")).alias("hs"))
        .withColumn("sz", F.size("hs"))
    )
    n_bands = k // band_size
    bands = combined.select(
        "id",
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
    return _verify_pairs_by_sets(cand, combined.select("id", "hs", "sz"), threshold)


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
