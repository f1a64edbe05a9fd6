"""Scale probes for the round-12 arc: trained product quantization
(fit / encode / query) and corpus-scale exact substring dedup.

Reuses scale_probe.build() to replicate the sf0.1 tables ×N.  The
claims under test:

- `build_ivf_pq_state` is two fits + one encode pass: wall grows
  near-linearly in vectors (the per-subspace Lloyd's loop is ONE
  DataFrame job per iteration regardless of m), and the persisted
  payload lands near the m-bytes-per-vector floor — 4× below the
  int8 state, 16× below float32 — at every multiplier;
- `ivf_pq_state_query` retrieval follows the query batch and the
  probed candidate slice (ADC is one codegen fold over m-byte codes),
  not corpus size alone;
- `substring_dedup`'s cost is the shingle-digest groupBy — linear in
  corpus TOKENS.  The ×N corpora are a worst case on purpose: every
  replicated document shares all its interior windows with its
  copies, so nearly every shingle is duplicated and the rebuild
  touches nearly every doc — the probe shows the combinable agg
  shoulders that without a hot-key collapse.

Usage: python tools/scale_probe_r12.py [multipliers...] (default: 1 4 16)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from scale_probe import build  # noqa: E402


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.pq import (
        build_ivf_pq_state,
        ivf_pq_state_query,
    )
    from minerva_etl_spark.operators.substring import substring_dedup

    emb = spark.read.parquet(f"{data_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    results: dict[str, dict] = {}

    def timed(fn) -> dict:
        t0 = time.time()
        n = fn()
        return {"spark": round(time.time() - t0, 2), "rows": n}

    work = tempfile.mkdtemp(prefix=f"probe_r12_x{mult}_")

    def du(p):
        t = 0
        for dp, _d, fs in os.walk(p):
            t += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
        return t

    # --- trained PQ: fit + encode (coarse k ~ sqrt(N) discipline) ----
    n_vec = emb.count()
    coarse_k = max(4, int(math.sqrt(n_vec) / 4))
    tpq_path = f"{work}/tpq"
    results["tpq_build"] = timed(
        lambda: build_ivf_pq_state(
            spark, emb, tpq_path, coarse_k=coarse_k, coarse_iters=2,
            m=16, pq_k=16, pq_iters=2, dim=64,
        ).count()
    )
    results["tpq_state_bytes_per_vec"] = {
        "spark": round(du(f"{tpq_path}/assigned_pq") / n_vec, 1),
        "rows": n_vec,
    }

    # --- trained PQ: retrieval, fixed-rate query batch ---------------
    queries = emb.filter("vec_id % 50 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    results["tpq_query"] = timed(
        lambda: ivf_pq_state_query(
            spark, queries, tpq_path, source=emb, k=5, n_probe=2,
            overfetch=10,
        ).count()
    )

    # --- substring dedup: the worst-case replicated corpus -----------
    results["substring_dedup"] = timed(
        lambda: substring_dedup(docs, w=8)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_removed").alias("removed"),
        )
        .collect()[0].docs
    )

    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r12", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
