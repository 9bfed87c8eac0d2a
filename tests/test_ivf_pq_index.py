"""Composed IVF-PQ disk index: store queries must equal the
in-session ivf_pq_topk, the lists scan must prune to the probed
partitions (inputFiles), appends must use the FROZEN centroids and
codebook with replay-zero — the full FAISS IVFx,PQy on-disk
contract."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_cdc_spark.operators.similarity import (
    append_ivf_pq_index,
    build_ivf_pq_index,
    ivf_pq_topk,
    query_ivf_pq_index,
)


def _vecs(spark, ids):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [
        (
            i,
            [((((i * 31 + d * 7) % 257) - 128) / 128.0) for d in range(64)],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, schema)


def test_store_query_equals_in_session_and_prunes(spark, tmp_path):
    corpus = _vecs(spark, range(120))
    queries = _vecs(spark, range(0, 120, 60))  # 2 queries, ~11 centroids
    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        corpus, path, centroid_mod=11, centroid_rem=3, cb_mod=7, cb_rem=1
    )
    out = query_ivf_pq_index(spark, path, queries, k=3, nprobe=2)
    stored = sorted(map(tuple, out.collect()))
    insess = sorted(
        map(
            tuple,
            ivf_pq_topk(
                corpus,
                queries,
                k=3,
                centroid_mod=11,
                centroid_rem=3,
                nprobe=2,
                m=16,
                cb_mod=7,
                cb_rem=1,
            ).collect(),
        )
    )
    assert stored == insess
    assert len(stored) > 0

    # partition pruning: the lists relation is BUILT from only the
    # probed cid= directories (_read_lists: 2 queries x nprobe 2 = at
    # most 4 of the ~11 list partitions), so inputFiles() itself now
    # proves both the pruned data read AND the pruned LISTING.
    import os
    import re

    n_parts = len(
        [d for d in os.listdir(path + "/lists") if d.startswith("cid=")]
    )
    lists_files = [f for f in out.inputFiles() if "/lists/" in f]
    assert lists_files, "lists scan reads no list directory"
    probed = {re.search(r"cid=(\d+)", f).group(1) for f in lists_files}
    assert len(probed) <= 4 < n_parts, (sorted(probed), n_parts)


def test_append_frozen_geometry_and_replay_zero(spark, tmp_path):
    old = _vecs(spark, range(80))
    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        old, path, centroid_mod=37, centroid_rem=3, cb_mod=7, cb_rem=1
    )
    n_cents = spark.read.parquet(path + "/centroids").count()
    n_cb = spark.read.parquet(path + "/codebook").count()
    batch = _vecs(spark, range(200, 220))
    assert append_ivf_pq_index(spark, path, batch) == 20
    assert append_ivf_pq_index(spark, path, batch) == 0  # replay
    # frozen geometry: neither table grew
    assert spark.read.parquet(path + "/centroids").count() == n_cents
    assert spark.read.parquet(path + "/codebook").count() == n_cb
    # the store now answers over old + new under the same geometry
    qs = _vecs(spark, [0])
    got = {
        r.neighbor_id
        for r in query_ivf_pq_index(spark, path, qs, k=200, nprobe=99).collect()
    }
    assert got == (set(range(1, 80)) | set(range(200, 220)))


def test_compaction_defragments_and_preserves_answers(spark, tmp_path):
    """After several appends a hot list holds one file per batch;
    compaction must rewrite only the fragmented lists to one file each
    and leave every query answer bit-identical."""
    import os

    from airbnb_cdc_spark.operators.similarity import compact_ivf_pq_lists

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    for lo in range(100, 160, 10):  # 6 append batches
        assert append_ivf_pq_index(
            spark, path, _vecs(spark, range(lo, lo + 10))
        ) == 10

    lists_dir = os.path.join(path, "lists")

    def files_per_list():
        return {
            d: sum(1 for f in os.listdir(os.path.join(lists_dir, d))
                   if f.endswith(".parquet"))
            for d in os.listdir(lists_dir) if d.startswith("cid=")
        }

    before = files_per_list()
    assert max(before.values()) > 4  # appends fragmented the hot lists
    qs = _vecs(spark, [0, 105])
    want = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                nprobe=3).collect()))

    n_compacted = compact_ivf_pq_lists(spark, path, max_files=4)
    assert n_compacted == sum(1 for v in before.values() if v > 4)
    after = files_per_list()
    assert max(after.values()) <= 4
    assert set(after) == set(before)  # no list lost
    for d, n in after.items():
        if before[d] > 4:
            assert n == 1  # compacted lists are single-file
        else:
            assert n == before[d]  # untouched lists untouched

    got = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                               nprobe=3).collect()))
    assert got == want  # answers bit-identical across compaction
    # idempotent: nothing left over threshold
    assert compact_ivf_pq_lists(spark, path, max_files=4) == 0


def test_compaction_recovers_a_parked_list(spark, tmp_path):
    """Crash simulation: a list parked at cid=N.old with its live dir
    missing (the one vulnerable swap window) must be restored by the
    recovery preamble before anything else happens."""
    import os
    import shutil

    from airbnb_cdc_spark.operators.similarity import compact_ivf_pq_lists

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    lists_dir = os.path.join(path, "lists")
    victim = next(d for d in sorted(os.listdir(lists_dir))
                  if d.startswith("cid="))
    live = os.path.join(lists_dir, victim)
    total_before = spark.read.parquet(lists_dir).count()
    os.rename(live, live + ".old")  # crash between the two renames

    assert compact_ivf_pq_lists(spark, path, max_files=4) == 0
    assert os.path.exists(live) and not os.path.exists(live + ".old")
    assert spark.read.parquet(lists_dir).count() == total_before


def test_reader_survives_parked_old_dir_and_append_probe(spark, tmp_path):
    """Compaction/reader race, window S2 (live dir swapped in, parked
    ``cid=N.old`` not yet deleted — also the crashed-before-cleanup
    state): a concurrent ``query_ivf_pq_index`` must return the
    bit-identical answer and a replayed append's existence probe must
    still see the list. Before the probed-paths read (_read_lists),
    full-directory partition discovery saw the ``.old`` dir, inferred
    ``cid`` as STRING, and the reader died with CAST_INVALID_INPUT."""
    import os
    import shutil

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    assert append_ivf_pq_index(spark, path, _vecs(spark, range(100, 110))) == 10
    qs = _vecs(spark, [0, 105])
    want = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                nprobe=3).collect()))
    lists_dir = os.path.join(path, "lists")
    victim = sorted(d for d in os.listdir(lists_dir) if d.startswith("cid="))[0]
    live = os.path.join(lists_dir, victim)
    shutil.copytree(live, live + ".old")  # S2: live + parked both present

    got = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                               nprobe=3).collect()))
    assert got == want  # reader sees the live list, ignores the parked copy
    # append replay's existence probe also ignores the parked copy
    assert append_ivf_pq_index(spark, path, _vecs(spark, range(100, 110))) == 0
    # the compactor's recovery preamble then clears the stale .old
    from airbnb_cdc_spark.operators.similarity import compact_ivf_pq_lists

    compact_ivf_pq_lists(spark, path, max_files=64)
    assert not os.path.exists(live + ".old")
    assert sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                nprobe=3).collect())) == want


def test_reader_mid_swap_sees_whole_lists_only(spark, tmp_path):
    """Compaction/reader race, window S1 (victim list renamed to
    ``.old``, replacement not yet in place): a concurrent query must
    never see a PARTIAL list — it returns either the full answer (the
    victim wasn't probed) or exactly the answer of a store without
    that whole list. Afterwards the recovery preamble restores the
    parked list and the original answer comes back bit-identical."""
    import os
    import shutil

    from airbnb_cdc_spark.operators.similarity import compact_ivf_pq_lists

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    qs = _vecs(spark, [0, 33])
    want = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                nprobe=3).collect()))
    lists_dir = os.path.join(path, "lists")
    # pick a victim the query actually probes: take the cid of a
    # returned neighbor's list by probing each dir until answers move
    dirs = sorted(d for d in os.listdir(lists_dir) if d.startswith("cid="))
    # reference: a sibling store with the victim's WHOLE list removed
    for victim in dirs:
        ref = str(tmp_path / f"ref_{victim.replace('=', '_')}")
        shutil.copytree(path, ref)
        shutil.rmtree(os.path.join(ref, "lists", victim))
        want_without = sorted(
            map(tuple, query_ivf_pq_index(spark, ref, qs, k=5,
                                          nprobe=3).collect())
        )
        live = os.path.join(lists_dir, victim)
        os.rename(live, live + ".old")  # S1: live missing, parked .old
        got = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                   nprobe=3).collect()))
        # whole-list-or-nothing: identical answer, or exactly the
        # no-victim-list answer — never a partial list
        assert got in (want, want_without)
        # recovery preamble restores the parked list
        assert compact_ivf_pq_lists(spark, path, max_files=64) == 0
        assert os.path.exists(live) and not os.path.exists(live + ".old")
    assert sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                                nprobe=3).collect())) == want


def test_mixed_width_append_batch_fails_loud(spark, tmp_path):
    """Same as the PQ store: the F.slice encode silently truncates
    wider rows, so the IVF-PQ append guard full-scans the incoming
    batch (r14 ADVICE) — a mixed batch whose first row matches the
    stored dim is refused whole, no list touched."""
    import pytest
    from pyspark.sql import types as T

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    n_before = spark.read.parquet(path + "/lists").count()
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    mixed = spark.createDataFrame(
        [(100, [0.5] * 64), (101, [0.5] * 128)], schema
    ).coalesce(1)
    import pytest

    with pytest.raises(ValueError, match="components"):
        append_ivf_pq_index(spark, path, mixed)
    assert spark.read.parquet(path + "/lists").count() == n_before


def test_append_mid_compaction_crash_s1_no_loss_no_dup(spark, tmp_path):
    """Append landing after a compaction CRASHED at window S1 (victim
    list parked at ``cid=N.old``, live dir missing — r15 VERDICT #5):
    without the append-side recovery preamble the existence probe
    cannot see the parked rows, so a replayed id is re-inserted
    (double-write) and the NEXT compaction's preamble — finding a live
    dir recreated by that very append — deletes the parked original
    (row loss). The preamble in append_ivf_pq_index must restore the
    parked list FIRST, making the append replay-zero for existing ids
    and the store bit-identical to the never-crashed path."""
    import os

    from airbnb_cdc_spark.operators.similarity import compact_ivf_pq_lists

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    lists_dir = os.path.join(path, "lists")
    # victim = the most populated list; its ids are the replayed half
    # of the append batch
    by_cid = (
        spark.read.parquet(lists_dir)
        .groupBy("cid")
        .agg(F.collect_list("vec_id").alias("ids"))
        .collect()
    )
    victim = max(by_cid, key=lambda r: len(r.ids))
    replayed = sorted(victim.ids)[:3]
    assert replayed, "victim list unexpectedly empty"
    live = os.path.join(lists_dir, f"cid={victim.cid}")
    os.rename(live, live + ".old")  # S1 crash: parked, live missing

    batch = _vecs(spark, replayed + [500, 501])
    # only the two genuinely-new ids append: the preamble restored the
    # parked list before the existence probe ran
    assert append_ivf_pq_index(spark, path, batch) == 2
    assert os.path.exists(live) and not os.path.exists(live + ".old")

    # no double-write anywhere in the store...
    ids = [r.vec_id for r in spark.read.parquet(lists_dir).collect()]
    assert len(ids) == len(set(ids))
    # ...and no row loss: every built id + both new ids, nothing else
    assert set(ids) == set(range(60)) | {500, 501}
    # a later compaction run stays a no-op recovery-wise and answers
    # replay bit-identically vs a never-crashed sibling store
    compact_ivf_pq_lists(spark, path, max_files=64)
    ref = str(tmp_path / "ref")
    build_ivf_pq_index(
        _vecs(spark, range(60)), ref, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    assert append_ivf_pq_index(spark, ref, batch) == 2
    qs = _vecs(spark, [0, 33, 500])
    got = sorted(map(tuple, query_ivf_pq_index(spark, path, qs, k=5,
                                               nprobe=3).collect()))
    want = sorted(map(tuple, query_ivf_pq_index(spark, ref, qs, k=5,
                                                nprobe=3).collect()))
    assert got == want and len(got) > 0


def test_append_mid_compaction_crash_s2_no_loss_no_dup(spark, tmp_path):
    """Append landing after a compaction CRASHED at window S2 (live
    dir swapped in, stale ``cid=N.old`` not yet deleted): the append's
    preamble drops the stale copy, the existence probe sees the live
    list, and the append is replay-zero for existing ids — no row from
    the live list is lost, nothing double-writes."""
    import os
    import shutil

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    lists_dir = os.path.join(path, "lists")
    by_cid = (
        spark.read.parquet(lists_dir)
        .groupBy("cid")
        .agg(F.collect_list("vec_id").alias("ids"))
        .collect()
    )
    victim = max(by_cid, key=lambda r: len(r.ids))
    replayed = sorted(victim.ids)[:3]
    live = os.path.join(lists_dir, f"cid={victim.cid}")
    n_before = spark.read.parquet(lists_dir).count()
    shutil.copytree(live, live + ".old")  # S2 crash: both present

    assert append_ivf_pq_index(
        spark, path, _vecs(spark, replayed + [600, 601])
    ) == 2
    assert os.path.exists(live) and not os.path.exists(live + ".old")
    ids = [r.vec_id for r in spark.read.parquet(lists_dir).collect()]
    assert len(ids) == len(set(ids))
    assert len(ids) == n_before + 2


def test_read_lists_retries_check_then_read_race(spark, tmp_path, monkeypatch):
    """Check-then-read race (r15 ADVICE): a list directory that passes
    the existence probe but is renamed away before the parquet read
    resolves must NOT kill the query with PATH_NOT_FOUND — _read_lists
    re-filters existence and retries once, returning the surviving
    lists (the documented missing-list skip)."""
    import os

    from airbnb_cdc_spark.operators import merge as merge_mod
    from airbnb_cdc_spark.operators import similarity as sim

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        _vecs(spark, range(60)), path, centroid_mod=11, centroid_rem=3,
        cb_mod=7, cb_rem=1,
    )
    lists_dir = os.path.join(path, "lists")
    real = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(lists_dir)
        if d.startswith("cid=")
    )
    phantom = 99999  # never built; the fake fs claims it exists ONCE
    real_fs = merge_mod._fs

    class _LyingFS:
        def __init__(self, fs):
            self._fs = fs
            self.lied = False

        def exists(self, p):
            if str(p).endswith(f"cid={phantom}") and not self.lied:
                self.lied = True  # stale positive, exactly once
                return True
            return self._fs.exists(p)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    lying = {}

    def _fake_fs(spark_, p):
        fs, hp = real_fs(spark_, p)
        w = lying.setdefault(p, _LyingFS(fs))
        return w, hp

    monkeypatch.setattr(merge_mod, "_fs", _fake_fs)
    out = sim._read_lists(spark, lists_dir, [real[0], phantom])
    assert lying[lists_dir].lied  # the race actually happened
    got = sorted(r.vec_id for r in out.collect())
    want = sorted(
        r.vec_id
        for r in spark.read.option("basePath", lists_dir)
        .parquet(os.path.join(lists_dir, f"cid={real[0]}"))
        .collect()
    )
    assert got == want and got


def test_read_lists_deterministic_failure_not_retried(
    spark, tmp_path, monkeypatch
):
    """The retry is scoped to the missing-path race ONLY (r16 ADVICE):
    a deterministic analysis failure — here a list directory that
    EXISTS but holds no parquet to infer a schema from
    (UNABLE_TO_INFER_SCHEMA) — must surface with its original context
    on the FIRST attempt, not after a pointless re-listing that would
    bury it."""
    import os

    import pytest
    from pyspark.errors import AnalysisException

    from airbnb_cdc_spark.operators import merge as merge_mod
    from airbnb_cdc_spark.operators import similarity as sim

    lists_dir = str(tmp_path / "lists")
    os.makedirs(os.path.join(lists_dir, "cid=7"))  # exists, zero files

    real_fs = merge_mod._fs
    exists_calls = []

    def _counting_fs(spark_, p):
        fs, hp = real_fs(spark_, p)

        class _W:
            def exists(self, q):
                exists_calls.append(str(q))
                return fs.exists(q)

            def __getattr__(self, name):
                return getattr(fs, name)

        return _W(), hp

    monkeypatch.setattr(merge_mod, "_fs", _counting_fs)
    with pytest.raises(AnalysisException) as exc:
        sim._read_lists(spark, lists_dir, [7])
    assert exc.value.getCondition() != "PATH_NOT_FOUND"
    # one existence probe per requested cid, no second listing pass
    assert len(exists_calls) == 1, exists_calls
