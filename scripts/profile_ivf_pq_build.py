"""Where does the IVF-PQ disk-index build spend its time?

The r13 scale smoke measured the one-time ``build_ivf_pq_index`` at
~173s for 100k vectors; this profiler breaks that constant into its
stages so the 1e9-vector extrapolation is grounded (the r13 verdict's
item #7). Stages are timed by forcing each intermediate with a
count()/write over the SAME synthetic corpus as the smoke test, each
on a fresh cached base so stage times don't bleed into each other:

  quantize   — _with_quant pass over the corpus (cache materialize)
  codebook   — deterministic-sample codebook build (n/256 entries x m)
  assign     — nearest-centroid argmax (n x n_centroids cosine volume)
  encode     — per-subspace argmin codes + rollup to array form
               (n x m x ~256 subspace L2 volume — the dominant math)
  write      — codes join assignment + partitionBy(cid) parquet write

Run:  python scripts/profile_ivf_pq_build.py [n_vecs] [centroid_mod]
Emits one JSON line; paste the breakdown into SCALE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from airbnb_cdc_spark.operators.similarity import (  # noqa: E402
    _nearest_centroid,
    _pq_code_arrays,
    _with_quant,
    pq_codebook,
)
from airbnb_cdc_spark.session import get_spark, release_cached  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    centroid_mod = int(sys.argv[2]) if len(sys.argv) > 2 else 499
    m, dim = 16, 64

    spark = get_spark("profile-ivf-pq")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (((F.col("id") * 31 + j * 17) % 97) - 48).cast("float"),
    )
    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    work = Path(tempfile.mkdtemp(prefix="profile_ivfpq_"))
    stages: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        base = _with_quant(corpus, "vec_id", "embedding").persist()
        base.count()
        stages["quantize"] = time.perf_counter() - t0

        cents = base.filter((F.col("vec_id") % centroid_mod) == 3).select(
            F.col("vec_id").alias("cid"),
            F.col("__q").alias("__qc"),
            F.col("__norm").alias("__nc"),
        )
        n_centroids = cents.count()

        t0 = time.perf_counter()
        cb = pq_codebook(corpus, "vec_id", "embedding", m, dim).persist()
        n_cb = cb.count()
        stages["codebook"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        assigned = _nearest_centroid(base, F.broadcast(cents), "vec_id").select(
            F.col("vec_id"), "cid"
        ).persist()
        assigned.count()
        stages["assign"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        codes = _pq_code_arrays(
            corpus, F.broadcast(cb), "vec_id", "embedding", m, dim
        ).persist()
        codes.count()
        stages["encode"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            codes.join(assigned, "vec_id")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(str(work / "lists"))
        )
        stages["write"] = time.perf_counter() - t0

        total = sum(stages.values())
        print(
            json.dumps(
                {
                    "metric": "ivf_pq_build_breakdown",
                    "n_vecs": n,
                    "n_centroids": n_centroids,
                    "codebook_rows": n_cb,
                    "m": m,
                    "dim": dim,
                    "stages_sec": {k: round(v, 1) for k, v in stages.items()},
                    "stage_share": {
                        k: round(v / total, 3) for k, v in stages.items()
                    },
                    "total_sec": round(total, 1),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        release_cached()


if __name__ == "__main__":
    main()
