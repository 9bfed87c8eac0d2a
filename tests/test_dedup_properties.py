"""Property tests: the dedup family agrees with brute-force Python
references on random small corpora (tiny vocabulary → dense shingle
overlap, the adversarial case for candidate generation)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from airbnb_cdc_spark.operators.dedup import (
    AUTO,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_cluster,
)

VOCAB = ["red", "blue", "green", "ox", "owl", "fig", "yam"]


@st.composite
def _corpus(draw):
    docs = draw(
        st.lists(
            st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
            min_size=2,
            max_size=10,
        )
    )
    return [(i, " ".join(words)) for i, words in enumerate(docs)]


def _shingle_set(text: str, n: int = 3) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _true_pairs(rows, threshold=0.5, cap=None):
    """Brute-force capped Jaccard pairs, mirroring the AUTO cap rule."""
    sets = {i: _shingle_set(t) for i, t in rows}
    if cap is not None:
        from collections import Counter

        df = Counter(s for ss in sets.values() for s in ss)
        hot = {s for s, c in df.items() if c > cap}
        sets = {i: ss - hot for i, ss in sets.items()}
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= threshold:
                out[(a, b)] = inter / union
    return out


@settings(max_examples=10, deadline=None)
@given(_corpus())
def test_ngram_jaccard_matches_bruteforce(spark, rows):
    cap = max(2, len(rows) // 100)  # the AUTO rule
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expected = _true_pairs(rows, cap=cap)
    # both candidate-generation strategies must agree with brute force
    for strategy in ("count", "prefix"):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                df, max_doc_freq=AUTO, strategy=strategy
            ).collect()
        }
        assert set(got) == set(expected), strategy
        for pair, j in got.items():
            assert abs(j - expected[pair]) < 1e-12, strategy


@settings(max_examples=8, deadline=None)
@given(_corpus())
def test_minhash_pairs_are_true_pairs(spark, rows):
    """LSH banding may MISS pairs (that's its recall trade) but every
    returned pair must be a genuine capped-Jaccard >= t pair with the
    exact score."""
    cap = max(2, len(rows) // 100)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, max_doc_freq=AUTO).collect()
    }
    expected = _true_pairs(rows, cap=cap)
    assert set(got) <= set(expected)
    for pair, j in got.items():
        assert abs(j - expected[pair]) < 1e-12
    # identical docs always band-collide: any pair with Jaccard == 1.0
    # must be found
    must = {p for p, j in expected.items() if j == 1.0}
    assert must <= set(got)


@settings(max_examples=8, deadline=None)
@given(_corpus())
def test_simhash_cluster_invariants(spark, rows):
    """Every doc gets a representative; the representative is a doc id
    <= its own; identical texts share a representative."""
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cluster_rep for r in simhash_cluster(df).collect()}
    assert set(got) == {i for i, _ in rows}
    for doc, rep in got.items():
        assert rep <= doc
        assert rep in got
    by_text = {}
    for i, t in rows:
        norm = " ".join(t.lower().split())
        by_text.setdefault(norm, []).append(i)
    for ids in by_text.values():
        reps = {got[i] for i in ids}
        assert len(reps) == 1


def _true_containment(rows, threshold=0.8, cap=None):
    sets = {i: _shingle_set(t) for i, t in rows}
    if cap is not None:
        from collections import Counter

        df = Counter(s for ss in sets.values() for s in ss)
        hot = {s for s, c in df.items() if c > cap}
        sets = {i: ss - hot for i, ss in sets.items()}
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            m = min(len(sets[a]), len(sets[b]))
            if m:
                c = len(sets[a] & sets[b]) / m
                if c >= threshold:
                    out[(a, b)] = c
    return out


@settings(max_examples=10, deadline=None)
@given(_corpus())
def test_containment_matches_bruteforce(spark, rows):
    from airbnb_cdc_spark.operators.dedup import containment_pairs

    cap = max(2, len(rows) // 100)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, max_doc_freq=AUTO).collect()
    }
    expected = _true_containment(rows, cap=cap)
    assert set(got) == set(expected)
    for pair, c in got.items():
        assert abs(c - expected[pair]) < 1e-12


@st.composite
def _token_docs(draw):
    docs = draw(
        st.lists(
            st.lists(st.sampled_from(VOCAB), min_size=0, max_size=15),
            min_size=1,
            max_size=8,
        )
    )
    return [(i, " ".join(words)) for i, words in enumerate(docs)]


@settings(max_examples=15, deadline=None)
@given(_token_docs())
def test_repetition_stats_property(spark, rows):
    """repetition_stats agrees with a brute-force trigram count on
    random tiny-vocab corpora (dense repetition — the adversarial case)."""
    from airbnb_cdc_spark.operators.text import repetition_stats

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for doc_id, text in rows:
        toks = [t for t in text.lower().split() if t]
        g = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        assert got[doc_id].n_ngrams == len(g)
        assert got[doc_id].n_distinct_ngrams == len(set(g))
        expect = 0.0 if not g else 1.0 - len(set(g)) / len(g)
        assert abs(got[doc_id].repetition_ratio - expect) < 1e-12


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=30),
)
def test_pack_sequences_property(spark, token_counts, budget):
    """pack_sequences reproduces the brute-force running-offset chunking
    for arbitrary token counts and budgets."""
    from pyspark.sql import functions as F

    from airbnb_cdc_spark.operators.sampling import pack_sequences

    rows = [(i, "s", n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    got = {
        r.doc_id: r
        for r in pack_sequences(df, "shard", "doc_id", F.col("n"), budget).collect()
    }
    offset = 0
    for i, n in enumerate(token_counts):
        assert got[i].token_offset == offset
        assert got[i].seq_id == offset // budget
        offset += n


def test_winnowing_guarantee_randomized(spark):
    """Property (Schleimer et al., Thm 1): if two documents share a
    contiguous run of >= w + k - 1 tokens, winnowing MUST select at
    least one common fingerprint from it, at any offsets and with any
    surrounding noise — randomized over run lengths, offsets, and
    distinct padding vocabularies."""
    import random

    from airbnb_cdc_spark.operators.dedup import winnow_pairs

    rng = random.Random(77)
    K, W = 3, 4
    guarantee = W + K - 1  # 6 tokens
    rows = []
    expected_pairs = set()
    next_id = 0
    for case in range(8):
        run_len = rng.randint(guarantee, guarantee + 10)
        shared = [f"s{case}_{j}" for j in range(run_len)]
        pad_a = [f"a{case}_{j}" for j in range(rng.randint(0, 12))]
        pad_b = [f"b{case}_{j}" for j in range(rng.randint(0, 12))]
        cut_a = rng.randint(0, len(pad_a))
        cut_b = rng.randint(0, len(pad_b))
        doc_a = pad_a[:cut_a] + shared + pad_a[cut_a:]
        doc_b = pad_b[:cut_b] + shared + pad_b[cut_b:]
        rows.append((next_id, " ".join(doc_a)))
        rows.append((next_id + 1, " ".join(doc_b)))
        expected_pairs.add((next_id, next_id + 1))
        next_id += 2
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in winnow_pairs(df, k=K, w=W, min_shared=1).collect()
    }
    # every planted pair detected; per-case vocabularies are disjoint,
    # so NO cross-case pair can appear
    assert expected_pairs <= got
    assert all((a // 2) == (b // 2) for a, b in got)
