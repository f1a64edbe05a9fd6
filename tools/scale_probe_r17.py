"""Core-count scaling probe (the r16 verdict's ask 4): make the
scaling story a READING the driver can reproduce via env vars alone,
not an inference from plan shape.

The sf0.1 bench cannot demonstrate parallelism (8 cores beats 32 —
the suite is AQE/stage-job fixed-overhead-bound at that scale), so
this probe times CPU-bound kernels over a corpus big enough to
saturate both core counts, at whatever core count the environment
sets:

- **decrypt/codec row class**: `office_decrypt_extract` over an
  agile-encrypted ×MULT corpus materialized as N_FILES parquet files
  (N_FILES input splits; zero shuffles — the r16 fan-out corpus);
- **substring row class**: the `dedup_substring` digest-stats build
  (shingle explode → sorted-digest aggregation, the family's
  expensive shuffle) over the ×MULT documents corpus, shuffle
  partitions left at the session default (= core count, the engine's
  scale-adaptive setting).

Usage (the driver-reproducible contract — ONLY env vars vary):

    SPARK_GRAFT_CPUS=32 python tools/scale_probe_r17.py
    SPARK_GRAFT_CPUS=8  python tools/scale_probe_r17.py

Optional args: [multiplier] [n_files] [legs] (default 16 64
agile,substring — legs is a comma list so a slow leg can rerun at a
different multiplier, e.g. ``64 64 substring``).  The corpus is
derived from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
Prints one JSON line per leg and a final summary line; wall ratios
between two invocations ≈ the core ratio is the claim under test
(compute-bound legs; a shuffle-bound leg is bounded by the ONE
machine's shared memory/disk bandwidth in local mode — guide §2.2:
shuffle bandwidth scales with node count, not local core count).
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


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    legs = (sys.argv[3] if len(sys.argv) > 3 else "agile,substring").split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    # no master, no shuffle_partitions override: both come from
    # SPARK_GRAFT_CPUS exactly as the bench's session does
    spark = get_spark(app_name="scale_probe_r17")
    cpus = spark.sparkContext.defaultParallelism
    out: dict[str, dict] = {"env": {
        "cpus": cpus, "mult": mult, "n_files": n_files, "sf_dir": sf_dir,
    }}
    print(json.dumps({"env": out["env"]}), flush=True)

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # ---- leg 1: agile decrypt over n_files input splits -------------
    def agile_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.docx import synthesize_docx
        from minerva_etl_spark.operators.offcrypto import (
            encrypt_ooxml_agile,
        )

        blob = encrypt_ooxml_agile(
            synthesize_docx(["agile probe doc"]),
            seed=b"probe-r15-agile",
        )
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": [int(d) for d in pdf["doc_id"]],
                 "payload": [blob] * len(pdf)}
            )

    from minerva_etl_spark.operators.office import office_decrypt_extract

    ids = docs.select("doc_id")
    if "agile" not in legs:
        ids = None
    fanned = None if ids is None else ids.withColumn(
        "__m", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    ).select((F.col("doc_id") * mult + F.col("__m")).alias("doc_id"))
    work = tempfile.mkdtemp(prefix="probe_r17_cores_")
    try:
        if ids is None:
            raise StopIteration  # leg skipped
        enc = fanned.mapInPandas(
            agile_synth, "doc_id bigint, payload binary"
        )
        path = f"{work}/agile_{n_files}"
        enc.repartition(n_files).write.mode("overwrite").parquet(path)
        src = spark.read.parquet(path)
        dec = office_decrypt_extract(src)
        t0 = time.time()
        n = dec.count()
        out["agile_decrypt"] = {
            "spark": round(time.time() - t0, 2), "rows": n,
            "input_partitions": src.rdd.getNumPartitions(),
            "shuffles": _shuffles(dec), "cpus": cpus,
        }
        print(json.dumps({"agile_decrypt": out["agile_decrypt"]}),
              flush=True)
    except StopIteration:
        pass
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # ---- leg 2: substring digest-stats build over ×mult corpus ------
    if "substring" in legs:
        _substring_leg(spark, docs, mult, n_files, cpus, out)
    # ---- leg 3: connected-components storage hygiene re-probe --------
    # (the r16 verdict's ask 6: iteration is the algorithm, but the
    # r16 checkpoint additions must keep retained checkpoint RDDs O(1)
    # in round count — the pagerank r15 standard)
    if "components" in legs:
        from minerva_etl_spark.operators.dedup import (
            connected_components,
        )

        n_rdds0 = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        # long-chain edges force max rounds for label propagation
        n_edges = 2000 * mult
        chain = spark.range(n_edges).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        stats: dict = {}
        comp = connected_components(
            chain, max_iter=12, stats=stats
        )
        n = comp.count()
        out["components_chain"] = {
            "rows": n, "cpus": cpus,
            "rounds": stats.get("rounds"),
            "retained_rdd_delta": (
                spark.sparkContext._jsc.sc().getPersistentRDDs().size()
                - n_rdds0
            ),
        }
        print(json.dumps({"components_chain": out["components_chain"]}),
              flush=True)

    print(json.dumps(out, indent=1))


def _substring_leg(spark, docs, mult, n_files, cpus, out) -> None:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.substring import (
        build_substring_state,
    )

    big = docs.select("doc_id", "text").withColumn(
        "__m", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    ).select(
        (F.col("doc_id") * mult + F.col("__m")).alias("doc_id"),
        # perturb the text per copy so digests don't collapse to one
        # hot key per shingle (the honest skew profile)
        F.concat(F.col("text"), F.lit(" copy "),
                 F.col("__m").cast("string")).alias("text"),
    )
    state_dir = tempfile.mkdtemp(prefix="probe_r17_substr_")
    try:
        # materialize the corpus as n_files input splits first — the
        # sf fixture is ONE parquet file, so building straight off it
        # runs the whole shingle explode + md5 map stage in ONE task
        # at any core count (the r15 single-split artifact; measured
        # 22 s at 8 AND 32 cores before this staging)
        corpus_path = state_dir + "/corpus"
        big.repartition(n_files).write.mode("overwrite").parquet(
            corpus_path
        )
        staged = spark.read.parquet(corpus_path)
        t0 = time.time()
        out_df = build_substring_state(
            spark, staged, state_dir + "/state"
        )
        n = out_df.count()  # force the returned rebuild too
        wall = round(time.time() - t0, 2)
        out["substring_digest_build"] = {
            "spark": wall, "out_rows": n, "cpus": cpus,
            "input_partitions": staged.rdd.getNumPartitions(),
            "shuffle_partitions": int(
                spark.conf.get("spark.sql.shuffle.partitions")
            ),
        }
        print(json.dumps(
            {"substring_digest_build": out["substring_digest_build"]}),
            flush=True)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
