"""Content-defined chunking (text.content_chunk_documents,
dedup.content_chunk_dedup): boundary semantics, the shift-robustness
contrast with fixed-stride chunking, and keeper inheritance."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_cdc_spark.operators.dedup import chunk_dedup, content_chunk_dedup
from airbnb_cdc_spark.operators.text import content_chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_partition_the_token_stream(spark):
    """Chunks tile each document exactly: contiguous 0-based indices,
    token counts summing to the document's token count, no empties."""
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    ch = content_chunk_documents(docs)
    per_doc = ch.groupBy("doc_id").agg(
        F.sum("chunk_tokens").alias("total"),
        F.count(F.lit(1)).alias("k"),
        F.min("chunk_idx").alias("lo"),
        F.max("chunk_idx").alias("hi"),
    )
    n_tok = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.coalesce("text", F.lit(""))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).cast("long").alias("n"),
    ).filter(F.col("n") >= 1)
    joined = per_doc.join(n_tok, "doc_id")
    assert joined.filter(F.col("total") != F.col("n")).count() == 0
    assert joined.filter((F.col("lo") != 0) | (F.col("hi") != F.col("k") - 1)).count() == 0
    assert ch.filter(F.col("chunk_tokens") <= 0).count() == 0
    # docs with >= 1 token all chunked; empty docs produce nothing
    assert per_doc.count() == n_tok.count()


def test_expected_chunk_length_tracks_divisor(spark):
    """The Rabin rule's expected chunk length is ~divisor tokens; pin
    a loose band so a boundary-rule regression can't hide."""
    from airbnb_cdc_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    avg = (
        content_chunk_documents(docs, divisor=16)
        .agg(F.avg("chunk_tokens"))
        .first()[0]
    )
    assert 8 <= avg <= 32, avg


def test_shifted_boilerplate_found_only_by_content_chunks(spark):
    """THE reason this operator exists: an insertion shifts shared
    boilerplate within the document — every fixed-stride window after
    the edit changes (0 cross-doc dups), while content-defined
    boundaries travel with the tokens and the interior chunks still
    collide."""
    run = " ".join(f"b{i}" for i in range(40))
    rows = [
        (1, "intro words here " + run + " tail one"),
        (
            2,
            "a completely different and much longer preamble inserted up front "
            + run
            + " other ending",
        ),
    ]
    cross = F.col("is_dup") & (F.col("doc_id") != F.col("keep_doc_id"))
    content = content_chunk_dedup(_docs(spark, rows)).filter(cross).count()
    fixed = (
        chunk_dedup(_docs(spark, rows), window=16, stride=16)
        .filter(cross)
        .count()
    )
    assert content >= 1
    assert fixed == 0


def test_keeper_is_first_occurrence(spark):
    """Identical docs: every chunk of the higher doc_id is marked dup
    against the lower one, chunk_idx aligned (the chunk_dedup
    contract, inherited through _mark_chunk_keepers)."""
    text = " ".join(f"w{i}" for i in range(50))
    out = content_chunk_dedup(_docs(spark, [(7, text), (9, text)])).collect()
    for r in out:
        assert r.keep_doc_id == 7
        assert r.keep_chunk_idx == r.chunk_idx
        assert r.is_dup == (r.doc_id == 9)


def test_single_and_empty_docs(spark):
    out = content_chunk_documents(
        _docs(spark, [(1, "solo"), (2, ""), (3, None)])
    ).collect()
    assert len(out) == 1
    assert (out[0].doc_id, out[0].chunk_idx, out[0].chunk_tokens) == (1, 0, 1)

def test_incremental_content_chunk_dedup_against_store(spark):
    """The content-defined chunker rides the SAME incremental store
    machinery as fixed-stride chunks (the `chunker` hook): boilerplate
    ingested earlier suppresses a later batch's SHIFTED copy — the
    arrival-path form of the shift-robustness contrast."""
    from airbnb_cdc_spark.operators.dedup import incremental_chunk_dedup
    from airbnb_cdc_spark.operators.text import content_chunk_documents

    run = " ".join(f"boil{i}" for i in range(64))  # cuts at 27/39/60
    seen = _docs(spark, [(1, "original header " + run + " original tail")])
    batch = _docs(
        spark,
        [
            (50, "a very different inserted preamble shifts everything " + run),
            (51, " ".join(f"fresh{i}" for i in range(30))),
        ],
    )

    def chunker(d):
        return content_chunk_documents(d)

    out = incremental_chunk_dedup(batch, seen, chunker=chunker).collect()
    dup_by_doc = {}
    for r in out:
        dup_by_doc.setdefault(r.doc_id, []).append(r.is_dup)
    # doc 50's interior boilerplate chunks are suppressed by the store
    assert sum(dup_by_doc[50]) >= 2
    # the fresh doc survives untouched
    assert not any(dup_by_doc[51])

    # fixed-stride control: the same arrival marks NOTHING (the shift
    # moved every window)
    ctrl = incremental_chunk_dedup(batch, seen, window=16, stride=16).collect()
    assert not any(r.is_dup for r in ctrl if r.doc_id == 50)
