"""Scale probes for the round-13 arc: the office-codec extensions
(XLSX / PPTX / legacy .doc over CFB) and the BUCKETED substring-dedup
state.

Reuses scale_probe.build() to replicate the sf0.1 tables ×N.  The
claims under test:

- the three new codecs are shuffle-free Arrow scans: wall grows
  ~linearly in payload bytes at every multiplier (synthesis is
  included in the probe and is itself linear — the gate/bench paths
  stage fixtures outside the clock, this probe deliberately measures
  the whole mapInPandas pass);
- `substring_increment_bucketed` per-delivery cost follows the DELTA,
  not the history: against a history ×N the bucketed state's digest
  join reads the big side exchange-free, so a fixed-size delivery's
  wall should grow sub-linearly in N (the plain-parquet variant
  re-shuffles history every delivery).

Usage: python tools/scale_probe_r13.py [multipliers...] (default: 1 4 16)
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

    from minerva_etl_spark.operators.msdoc import doc_extract
    from minerva_etl_spark.operators.pptx import pptx_extract
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        build_substring_state_bucketed,
        substring_increment,
        substring_increment_bucketed,
    )
    from minerva_etl_spark.operators.xlsx import xlsx_extract

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    results: dict[str, dict] = {}

    def timed(fn) -> dict:
        t0 = time.time()
        n = fn()
        return {"spark": round(time.time() - t0, 2), "rows": n}

    work = tempfile.mkdtemp(prefix=f"probe_r13_x{mult}_")

    # --- office codecs: synth + extract in one lineage ---------------
    def synth_and_extract(kind: str) -> int:
        def gen(batches):
            import pandas as pd

            from minerva_etl_spark.operators.msdoc import synthesize_doc
            from minerva_etl_spark.operators.pptx import synthesize_pptx
            from minerva_etl_spark.operators.xlsx import synthesize_xlsx

            for pdf in batches:
                rows = []
                for d, t in zip(pdf["doc_id"], pdf["text"]):
                    d, t = int(d), str(t)[:2000]
                    if kind == "xlsx":
                        p = synthesize_xlsx(
                            [("Data", [[f"Doc {d}"], [t]])],
                            title=f"Doc {d}",
                        )
                    elif kind == "pptx":
                        p = synthesize_pptx(
                            [[f"Doc {d}", t]], title=f"Doc {d}"
                        )
                    else:
                        p = synthesize_doc(
                            [f"Doc {d}", t], title=f"Doc {d}"
                        )
                    rows.append((d, p))
                yield pd.DataFrame(rows, columns=["doc_id", "payload"])

        payloads = docs.mapInPandas(
            gen, "doc_id bigint, payload binary"
        )
        op = {"xlsx": xlsx_extract, "pptx": pptx_extract,
              "doc": doc_extract}[kind]
        return op(payloads).count()

    for kind in ("xlsx", "pptx", "doc"):
        results[f"{kind}_extract"] = timed(
            lambda k=kind: synth_and_extract(k)
        )

    # --- bucketed vs plain substring state: fixed delta, ×N history --
    hist = docs.filter("doc_id % 17 != 0")
    delta = (
        docs.filter("doc_id % 17 = 0")
        .select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        .localCheckpoint(eager=True)
    )
    plain_path = f"{work}/substr_plain"
    results["substr_build_plain"] = timed(
        lambda: build_substring_state(
            spark, hist, plain_path, w=8
        ).count()
    )
    results["substr_inc_plain"] = timed(
        lambda: substring_increment(
            spark, delta, plain_path, w=8
        ).count()
    )
    tbl = f"probe_substr_bkt_x{mult}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    results["substr_build_bucketed"] = timed(
        lambda: build_substring_state_bucketed(
            spark, hist, tbl, w=8, n_buckets=32,
            path=f"{work}/substr_bkt",
        ).count()
    )
    results["substr_inc_bucketed"] = timed(
        lambda: substring_increment_bucketed(
            spark, delta, tbl, w=8, n_buckets=32,
            path=f"{work}/substr_bkt",
        ).count()
    )
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r13", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
