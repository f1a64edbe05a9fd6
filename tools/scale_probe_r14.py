"""Scale probes for the round-13/14 crawl-index arc: WET / WAT
write+read and the CDXJ index round trip + recrawl window — the only
r13 surfaces that shipped without probe readings (the r13 verdict's
ask 8).

Reuses scale_probe.build() to replicate the sf0.1 tables ×N.  Claims
under test:

- `write_wet_files` / `write_wat_files` / `write_cdxj` are owning-task
  file writers: the only wide op is the groupBy(file) that routes rows
  to their shard writer — ONE exchange regardless of N, wall linear in
  bytes;
- `read_wet` / `read_wat` are shuffle-ZERO scans (filter + projection
  over the WARC member reader; the WAT JSON path is codegen
  `get_json_object`);
- `recrawl_candidates` is ONE window shuffle on urlkey however many
  captures pile up per key — no global sort.

Shuffle counts are read from the executed plan (count of Exchange
operators, ReusedExchange excluded).

Usage: python tools/scale_probe_r14.py [multipliers...] (default: 1 4 16)
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


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.sources.cdx import (
        read_cdxj,
        recrawl_candidates,
        surt_key_expr,
        write_cdxj,
    )
    from minerva_etl_spark.sources.wet import (
        read_wat,
        read_wet,
        write_wat_files,
        write_wet_files,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_shards = 8 * mult  # shard count follows corpus size
    results: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix=f"probe_r14_x{mult}_")

    def timed(key: str, fn, shuffle_df=None) -> None:
        t0 = time.time()
        n = fn()
        results[key] = {"spark": round(time.time() - t0, 2), "rows": n}
        if shuffle_df is not None:
            results[key]["shuffles"] = _shuffles(shuffle_df)

    # --- WET: write shards, read them back ---------------------------
    wet_rows = docs.select(
        F.concat(F.lit("part-"), (F.col("doc_id") % n_shards),
                 F.lit(".warc.wet.gz")).alias("warc_file"),
        F.concat(F.lit("rec-"), F.col("doc_id")).alias("record_id"),
        F.concat(F.lit("https://probe.test/d/"), F.col("doc_id"))
        .alias("target_uri"),
        F.lit("2026-02-03T04:05:06Z").alias("warc_date"),
        "text",
    )
    wet_dir = f"{work}/wet"
    timed("wet_write",
          lambda: write_wet_files(wet_rows, wet_dir).count(),
          shuffle_df=write_wet_files(wet_rows, wet_dir + "_plan"))
    wet = read_wet(spark, wet_dir)
    timed("wet_read", wet.count, shuffle_df=wet)

    # --- WAT: metadata envelopes --------------------------------------
    wat_rows = docs.select(
        F.concat(F.lit("part-"), (F.col("doc_id") % n_shards),
                 F.lit(".warc.wat.gz")).alias("warc_file"),
        F.concat(F.lit("rec-"), F.col("doc_id")).alias("record_id"),
        F.concat(F.lit("https://probe.test/d/"), F.col("doc_id"))
        .alias("target_uri"),
        F.lit("2026-02-03T04:05:06Z").alias("warc_date"),
        F.concat(
            F.lit('{"Envelope":{"Payload-Metadata":'
                  '{"HTTP-Response-Metadata":{"HTML-Metadata":'
                  '{"Head":{"Title":"Doc '),
            F.col("doc_id"),
            F.lit('"}}}}}}'),
        ).alias("meta_json"),
    )
    wat_dir = f"{work}/wat"
    timed("wat_write",
          lambda: write_wat_files(wat_rows, wat_dir).count(),
          shuffle_df=write_wat_files(wat_rows, wat_dir + "_plan"))
    wat = read_wat(spark, wat_dir)
    timed("wat_read", wat.count, shuffle_df=wat)

    # --- CDXJ: two captures per URL, round trip + recrawl window -----
    caps = docs.select(
        F.concat(F.lit("cdx-"), (F.col("doc_id") % n_shards),
                 F.lit(".cdxj")).alias("cdx_file"),
        F.expr(surt_key_expr(
            "concat('https://probe.test/d/', doc_id)"
        )).alias("urlkey"),
        F.explode(
            F.array(
                F.lit("2026-02-01 00:00:00"),
                F.lit("2026-02-02 00:00:00"),
            )
        ).alias("__ts_str"),
        F.concat(F.lit("https://probe.test/d/"), F.col("doc_id"))
        .alias("url"),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.concat(F.lit("sha1:"), F.md5(F.col("text"))).alias("digest"),
        F.lit("crawl-00001.warc.gz").alias("warc_file"),
        (F.col("doc_id") * 1000).alias("warc_offset"),
        F.lit(512).alias("warc_length"),
    ).withColumn(
        "ts", F.col("__ts_str").cast("timestamp_ntz")
    ).drop("__ts_str")
    cdx_dir = f"{work}/cdx"
    timed("cdx_write",
          lambda: write_cdxj(caps, cdx_dir).count(),
          shuffle_df=write_cdxj(caps, cdx_dir + "_plan"))
    idx = read_cdxj(spark, cdx_dir)
    timed("cdx_read", idx.count, shuffle_df=idx)
    rc = recrawl_candidates(idx)
    timed("cdx_recrawl", rc.count, shuffle_df=rc)

    # --- r14 codecs: synth + decode in one lineage (zero-shuffle,
    # linear-in-bytes claim — the office-codec probe shape) ----------
    def codec(kind: str):
        def gen(batches):
            import pandas as pd

            from minerva_etl_spark.operators.adpcm import (
                synthesize_wav_ima,
            )
            from minerva_etl_spark.operators.bmp import synthesize_bmp
            from minerva_etl_spark.operators.tiff import (
                synthesize_tiff,
            )

            for pdf in batches:
                rows = []
                for d in pdf["doc_id"]:
                    d = int(d)
                    w, h = 16 + d % 9, 12 + d % 7
                    if kind == "tiff":
                        px = bytes(
                            (d + y * 31 + x * 13 + c * 101) % 256
                            for y in range(h)
                            for x in range(w)
                            for c in range(3)
                        )
                        p = synthesize_tiff(
                            [(px, w, h, 3)],
                            compression={0: 32773, 1: 5, 2: 1}[d % 3],
                            rows_per_strip=4,
                        )
                    elif kind == "bmp":
                        px = bytes(
                            (d + y * 31 + x * 13 + c * 101) % 256
                            for y in range(h)
                            for x in range(w)
                            for c in range(3)
                        )
                        p = synthesize_bmp(px, w, h, bits=24)
                    else:  # adpcm
                        nibs = [
                            (d * 7 + k * 3) % 16
                            for k in range(2 * (100 + d % 50))
                        ]
                        p = synthesize_wav_ima(
                            nibs, ((d * 131) % 4096) - 2048, d % 89
                        )
                    rows.append((d, p))
                yield pd.DataFrame(
                    rows, columns=["media_id", "payload"]
                )

        staged = docs.selectExpr("doc_id").mapInPandas(
            gen, "media_id bigint, payload binary"
        )
        if kind == "tiff":
            from minerva_etl_spark.operators.tiff import tiff_features

            return tiff_features(staged)
        if kind == "bmp":
            from minerva_etl_spark.operators.bmp import bmp_decode  # noqa

            from minerva_etl_spark.operators.multimodal import (
                image_features,
            )

            return image_features(staged)
        from minerva_etl_spark.operators.multimodal import wav_features

        return wav_features(staged)

    for kind in ("tiff", "bmp", "adpcm"):
        out_df = codec(kind)
        timed(f"{kind}_decode", out_df.count, shuffle_df=out_df)

    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r14", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
