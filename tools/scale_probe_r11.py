"""Scale probes for the round-11 arc: the int8-quantized ANN state
(build / query), ratio-margin bitext mining (full-product vs
ANN-candidate paths), and WebDataset shard export/import.

Reuses scale_probe.build() to replicate the sf0.1 tables ×N.  The
claims under test:

- `build_ivf_state_q` is one fit + one assign + one quantize
  projection: wall grows near-linearly in vectors, and the persisted
  state stays ~4× smaller than the float state at every multiplier;
- `ivf_state_query_q`'s retrieval is probe-pruned: query wall follows
  the QUERY batch and its candidate slice, not corpus size alone;
- `mine_bitext` over the full bipartite product is quadratic BY
  DESIGN (the bounded-side path) — the probe shows exactly where
  that stops scaling and the ANN-candidate injection path takes
  over with near-linear wall;
- `wds_export`/`wds_import` are one-task-per-shard: wall grows with
  bytes, shard count amortizes.

Usage: python tools/scale_probe_r11.py [multipliers...] (default: 1 4 16)
"""

from __future__ import annotations

import json
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

    from minerva_etl_spark.operators.bitext import (
        bitext_candidates,
        mine_bitext,
    )
    from minerva_etl_spark.operators.quantize import (
        build_ivf_state_q,
        ivf_state_query_q,
    )
    from minerva_etl_spark.operators.similarity import ivf_join
    from minerva_etl_spark.operators.wds import wds_export, wds_import

    emb = spark.read.parquet(f"{data_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    results: dict[str, dict] = {}

    def timed(fn) -> dict:
        t0 = time.time()
        n = fn()
        return {"spark": round(time.time() - t0, 2), "rows": n}

    work = tempfile.mkdtemp(prefix=f"probe_r11_x{mult}_")

    # --- quantized state: build (fit k ~ sqrt(N) discipline) --------
    import math

    n_vec = emb.count()
    k = max(4, int(math.sqrt(n_vec) / 4))
    qpath = f"{work}/qstate"
    results["pq_build"] = timed(
        lambda: build_ivf_state_q(spark, emb, qpath, k=k, iters=2).count()
    )

    def du(p):
        t = 0
        for dp, _d, fs in os.walk(p):
            t += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
        return t

    results["pq_state_bytes_per_vec"] = {
        "spark": round(du(f"{qpath}/assigned_q") / n_vec, 1),
        "rows": n_vec,
    }

    # --- quantized retrieval: fixed-size query batch ----------------
    queries = emb.filter("vec_id % 50 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    results["pq_query"] = timed(
        lambda: ivf_state_query_q(
            spark, queries, qpath, source=emb, k=5, n_probe=2,
            overfetch=4,
        ).count()
    )

    # --- bitext: full product (bounded-side path) — quadratic, so
    # only probed while the pair count stays sane ---------------------
    src = emb.filter("vec_id % 2 = 0").select(
        F.col("vec_id").alias("src_id"), "embedding"
    )
    tgt = emb.filter("vec_id % 2 = 1").select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    if mult <= 4:
        results["bitext_full_product"] = timed(
            lambda: mine_bitext(
                bitext_candidates(src, tgt), k=4, threshold=1.05
            ).count()
        )

    # --- bitext: ANN-candidate injection (corpus x corpus path) -----
    cent = spark.read.parquet(f"{qpath}/centroids")
    assigned_full = emb.join(
        spark.read.parquet(f"{qpath}/assigned_q").select(
            "vec_id", "centroid_id"
        ),
        "vec_id",
    ).filter("vec_id % 2 = 1")
    cand = ivf_join(
        src.select(
            F.col("src_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        assigned_full,
        cent,
        k=8,
        n_probe=2,
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("vec_id").alias("tgt_id"),
        "cosine",
    )
    results["bitext_ann_candidates"] = timed(
        lambda: mine_bitext(cand, k=4, threshold=1.05).count()
    )

    # --- WebDataset export / import ----------------------------------
    staged = docs.select(
        "doc_id",
        F.col("text"),
        F.concat(F.lit("source="), F.col("source")).alias("meta"),
    )
    shards = f"{work}/shards"
    n_shards = max(8, mult * 8)
    results["wds_export"] = timed(
        lambda: wds_export(
            staged, shards, {"text": "txt", "meta": "met"},
            key_col="doc_id", n_shards=n_shards,
        ).count()
    )
    results["wds_import"] = timed(
        lambda: wds_import(spark, shards).count()
    )
    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r11", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
