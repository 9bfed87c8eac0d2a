"""Persisted (node, component) store: write_components →
read_components must round-trip the closure exactly, and every apply
policy driven from the store must equal the recompute path — the
derive-once/apply-many contract the 100 TB shape depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.graph import (
    connected_components,
    keep_canonical,
    keep_canonical_from_components,
    read_components,
    write_components,
)


def _pairs(spark):
    # two clusters {1,2,3} (chained, not cliqued) and {7,9}; 5 isolated
    return spark.createDataFrame(
        [(1, 2), (2, 3), (9, 7)], "id_a long, id_b long"
    )


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 2}") for i in (1, 2, 3, 5, 7, 9)],
        "doc_id long, source string",
    )


def test_store_roundtrip_exact(spark, tmp_path):
    comp, converged = connected_components(_pairs(spark))
    assert converged
    path = str(tmp_path / "components")
    write_components(comp, path)
    back = read_components(spark, path)
    assert set(back.columns) == {"node", "component"}
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, comp.collect())
    )
    # transitive closure: chained 1-2-3 all label to min id 1
    got = {r.node: r.component for r in back.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_store_backed_apply_equals_recompute(spark, tmp_path):
    docs, pairs = _docs(spark), _pairs(spark)
    direct = keep_canonical(docs, pairs)
    comp, _ = connected_components(pairs)
    path = str(tmp_path / "components")
    write_components(comp, path)
    from_store = keep_canonical_from_components(
        docs, read_components(spark, path)
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, from_store.collect())
    )
    # survivors: cluster reps 1 and 7 (flagged), singletons 5 unflagged
    got = {r.doc_id: r.in_cluster for r in from_store.collect()}
    assert got == {1: 1, 5: 0, 7: 1}


def test_shared_components_helper_memoizes(spark, tmp_path, monkeypatch):
    """queries.neardup_components derives+writes once per sf_dir, then
    serves reads from the stored path."""
    import airbnb_cdc_spark.queries as q

    calls = {"n": 0}
    real = q._dedup._index_pair_counts

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(q._dedup, "_index_pair_counts", counting)
    monkeypatch.setattr(q, "_COMPONENTS_PATHS", {})
    # neardup_components derives its pairs THROUGH jaccard_pairs_store,
    # which filters the raw pair-counts store; reset both memos too, or
    # an earlier test/bench in this process may have already populated
    # them for this sf_dir and the counting shim never fires
    # (order-dependent flakiness).
    monkeypatch.setattr(q, "_JACCARD_PAIRS_PATHS", {})
    monkeypatch.setattr(q, "_PAIR_COUNTS_PATHS", {})
    sf_dir = "/root/testdata/sf0.001"
    first = q.neardup_components(spark, sf_dir).collect()
    second = q.neardup_components(spark, sf_dir).collect()
    assert calls["n"] == 1  # second call read the store, no re-derive
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_shared_simhash_cluster_store_memoizes(spark, monkeypatch):
    """queries.simhash_cluster_store derives+writes once per sf_dir;
    the diversity sampler then reads the store instead of re-running
    the clustering inside its own plan."""
    import airbnb_cdc_spark.queries as q

    calls = {"n": 0}
    real = q._dedup.simhash_cluster

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(q._dedup, "simhash_cluster", counting)
    monkeypatch.setattr(q, "_SIMHASH_CLUSTER_PATHS", {})
    sf_dir = "/root/testdata/sf0.001"
    first = q.simhash_cluster_store(spark, sf_dir).collect()
    sampled = q.QUERIES["diversity_sample_by_cluster"](spark, sf_dir)
    assert sampled.count() > 0
    assert calls["n"] == 1  # the sampler read the store, no re-derive
    second = q.simhash_cluster_store(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_pair_counts_store_serves_both_measures(spark, monkeypatch):
    """One inverted-index pass per corpus snapshot: jaccard and
    containment both filter the shared raw pair-counts store, and the
    filtered results equal the operators-level standalone derivations
    exactly."""
    import airbnb_cdc_spark.queries as q
    from airbnb_cdc_spark.session import load_table

    calls = {"n": 0}
    real = q._dedup._index_pair_counts

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(q._dedup, "_index_pair_counts", counting)
    monkeypatch.setattr(q, "_PAIR_COUNTS_PATHS", {})
    monkeypatch.setattr(q, "_JACCARD_PAIRS_PATHS", {})
    sf_dir = "/root/testdata/sf0.001"
    jac = q.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    cont = q.QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert calls["n"] == 1  # both measures filtered ONE core pass
    docs = load_table(spark, sf_dir, "documents")
    jac_direct = q._dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    cont_direct = q._dedup.containment_pairs(docs, threshold=0.8).collect()
    assert sorted(map(tuple, jac)) == sorted(map(tuple, jac_direct))
    assert sorted(map(tuple, cont)) == sorted(map(tuple, cont_direct))


def test_token_counts_store_serves_both_bigram_queries(spark, monkeypatch):
    """One tokenization pass per corpus snapshot: bigram_vocab and
    bigram_pmi both read the persisted unigram/bigram count tables,
    and the store-backed results equal the operators-level standalone
    derivations exactly."""
    import airbnb_cdc_spark.queries as q
    from airbnb_cdc_spark.session import load_table

    calls = {"n": 0}
    real = q._text.corpus_token_counts

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(q._text, "corpus_token_counts", counting)
    monkeypatch.setattr(q, "_TOKEN_COUNTS_PATHS", {})
    sf_dir = "/root/testdata/sf0.001"
    vocab = q.QUERIES["bigram_vocab"](spark, sf_dir).collect()
    pmi = q.QUERIES["bigram_pmi"](spark, sf_dir).collect()
    assert calls["n"] == 1  # both queries read ONE tokenization pass
    docs = load_table(spark, sf_dir, "documents")
    vocab_direct = q._text.bigram_counts(docs, top_k=50).collect()
    pmi_direct = q._text.bigram_pmi(docs).collect()
    assert sorted(map(tuple, vocab)) == sorted(map(tuple, vocab_direct))
    assert sorted(map(tuple, pmi)) == sorted(map(tuple, pmi_direct))
