

def test_pack_concat_split_boundaries(spark):
    """Docs tile the concatenated stream exactly: slices within a doc
    are contiguous, per-sequence token counts fill seq_len except the
    final partial window, and a doc straddling a boundary is split at
    exactly the right offset."""
    from airbnb_cdc_spark.operators.sampling import pack_concat_split

    rows = [
        (1, " ".join(f"w{i}" for i in range(6))),   # toks 0..5
        (2, " ".join(f"x{i}" for i in range(10))),  # toks 6..15 — splits at 8
        (3, ""),                                     # dropped
        (4, " ".join(f"y{i}" for i in range(3))),   # toks 16..18
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.seq_id, r.doc_id, r.tok_start, r.tok_end)
        for r in pack_concat_split(df, seq_len=8).collect()
    )
    assert got == [
        (0, 1, 0, 6),
        (0, 2, 0, 2),   # doc 2 tokens 0..1 finish sequence 0
        (1, 2, 2, 10),  # tokens 2..9 fill sequence 1
        (2, 4, 0, 3),   # final partial window
    ]
    # total tokens per sequence: 8, 8, 3 (final partial)
    from collections import defaultdict

    per_seq = defaultdict(int)
    for s, _, a, b in got:
        per_seq[s] += b - a
    assert per_seq == {0: 8, 1: 8, 2: 3}

    import pytest

    with pytest.raises(ValueError):
        pack_concat_split(df, seq_len=0)
