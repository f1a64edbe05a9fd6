"""Scale probes for the round-9 operators: WARC harvest, HTML
extraction, GIF decode, spectral audio.

Reuses scale_probe.build() to replicate the sf0.1 documents ×N, then
times each operator.  The claims under test:

- `read_warc` parallelism is the FILE count (one task per file), so
  wall time should track data volume while files ≥ cores;
- `html_extract` / `gif_features` / `wav_spectral` are shuffle-free
  mapInPandas scans — wall should grow sublinearly in data on a warm
  local[32] (task scheduling amortizes).

Usage: python tools/scale_probe_r9.py [multipliers...]  (default: 1 4 16)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from scale_probe import WORK, build  # noqa: E402


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.gif import gif_features
    from minerva_etl_spark.operators.html import html_extract
    from minerva_etl_spark.operators.multimodal import wav_spectral
    from minerva_etl_spark.sources.warc import read_warc, write_warc_files

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    results: dict[str, dict] = {}

    def timed(fn):
        t0 = time.time()
        out = fn()
        if hasattr(out, "write"):
            out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # WARC: stage -> write real .warc.gz files (64*mult of them, so
    # file-count parallelism grows with data) -> read back + project
    warc_dir = f"{WORK}/warc_x{mult}"
    shutil.rmtree(warc_dir, ignore_errors=True)
    staged = docs.select(
        F.concat(F.lit("part-"), (F.col("doc_id") % (64 * mult)).cast("string"),
                 F.lit(".warc.gz")).alias("warc_file"),
        F.format_string("doc-%012d", "doc_id").alias("record_id"),
        F.concat(F.lit("https://t/"), F.col("doc_id").cast("string"))
        .alias("target_uri"),
        F.lit("2026-01-01T00:00:00Z").alias("warc_date"),
        F.encode("text", "UTF-8").alias("body"),
    )
    t0 = time.time()
    write_warc_files(staged, warc_dir).count()
    w_write = round(time.time() - t0, 2)
    results["warc_write"] = {"spark": w_write, "files": 64 * mult}
    results["warc_read"] = {
        "spark": timed(lambda: read_warc(spark, warc_dir))
    }

    # HTML extraction over a synthesized page per doc
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>d</title></head><body><nav>m</nav><p>"),
            F.col("text"), F.lit('</p><a href="/x">n</a></body></html>'),
        ).alias("html"),
    )
    results["html_extract"] = {
        "spark": timed(lambda: html_extract(pages))
    }

    # GIF + spectral over per-doc synthesized media (synthesis inside
    # the same task as decode, like the gate fixtures)
    def synth_gif(batches):
        import pandas as pd

        from minerva_etl_spark.operators.gif import synthesize_gif

        palette = [((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
                   for i in range(8)]
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                w, h = 12 + d % 5, 10 + d % 3
                idx = [(d * 7 + y * 31 + x * 13) % 8
                       for y in range(h) for x in range(w)]
                payloads.append(synthesize_gif([idx], palette, w, h))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    gifs = docs.select("doc_id").mapInPandas(
        synth_gif, "media_id bigint, payload binary"
    )
    results["gif_features"] = {
        "spark": timed(lambda: gif_features(gifs))
    }

    def synth_wav(batches):
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_wav

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                d = int(did)
                n = 256 + (d % 3) * 64
                k = 3 + d % 11
                payloads.append(synthesize_wav(
                    [math.floor(9000 * math.sin(2 * math.pi * k * i / n)
                                + 0.5) for i in range(n)], 8000))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads}
            )

    wavs = docs.select("doc_id").mapInPandas(
        synth_wav, "media_id bigint, payload binary"
    )
    results["wav_spectral"] = {
        "spark": timed(lambda: wav_spectral(wavs))
    }
    return results


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r9")
    os.makedirs(WORK, exist_ok=True)
    all_results = {}
    for m in mults:
        d = build(spark, m)
        all_results[m] = probe(spark, d, m)
        print(f"x{m}: {json.dumps(all_results[m])}", flush=True)
    print(json.dumps(all_results))


if __name__ == "__main__":
    main()
