"""Scale probes for the late round-12 arc: exact-integer PageRank and
the corpus sketches.

Reuses scale_probe.build() to replicate the sf0.1 tables ×N.  The
claims under test:

- `pagerank` wall grows with edges × iterations (each round is one
  equi-join + one combinable groupBy), never with any quadratic term;
- the sketches are ONE pass + kilobyte outputs: KMV's TakeOrdered and
  HLL's register groupBy stay near-flat as the corpus multiplies
  (the scan dominates, the sketch state never grows).

Usage: python tools/scale_probe_r12b.py [multipliers...] (default: 1 4 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from scale_probe import build  # noqa: E402


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.pagerank import pagerank
    from minerva_etl_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
        kmv_sketch,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    results: dict[str, dict] = {}

    def timed(fn) -> dict:
        t0 = time.time()
        n = fn()
        return {"spark": round(time.time() - t0, 2), "rows": n}

    n_docs = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.sequence(F.lit(1), F.lit(1) + F.col("doc_id") % 3)
        ).alias("k"),
    ).select(
        "src", ((F.col("src") * 7 + F.col("k")) % n_docs).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    results["pagerank_3_rounds"] = timed(
        lambda: pagerank(edges, iters=3).count()
    )

    shingles = docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(split(text, ' '))"
                " - 3, 0)), i -> concat_ws(' ', "
                "slice(split(text, ' '), i + 1, 3)))"
            )
        ).alias("item")
    ).filter(F.col("item") != "")
    results["sketch_kmv"] = timed(
        lambda: kmv_sketch(shingles, "item", k=64).count()
    )
    results["sketch_hll"] = timed(
        lambda: hll_estimate(
            hll_registers(shingles, "item", b=8), b=8
        ).count()
    )
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r12b", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
