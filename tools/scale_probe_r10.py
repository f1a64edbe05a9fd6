"""Scale probes for the round-10 operators: archive ingest (tar/zip),
PDF text extraction, feed parsing, and the persisted-IVF query path.

Reuses scale_probe.build() to replicate the sf0.1 documents ×N, then
times each operator.  The claims under test:

- `write_archives`/`read_archives` parallelism is the ARCHIVE count
  (one group/task per archive), so wall tracks data volume while
  archives ≥ cores — the WARC posture;
- `pdf_extract` / `feed_entries` are shuffle-free mapInPandas scans:
  wall grows near-linearly in payload bytes once tasks amortize, and
  throughput multiplies with executor count on a real cluster;
- synthesis runs inside the same task as decode (gate-fixture shape),
  so the numbers include both directions of each codec.

Usage: python tools/scale_probe_r10.py [multipliers...]  (default: 1 4 16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)  # sibling scale_probe

from scale_probe import WORK, build  # noqa: E402


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.feeds import feed_entries
    from minerva_etl_spark.operators.pdf import pdf_extract
    from minerva_etl_spark.sources.archive import (
        read_archives,
        write_archives,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    results: dict[str, dict] = {}

    def timed(fn):
        t0 = time.time()
        out = fn()
        if hasattr(out, "write"):
            out.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # archives: stage members -> write real tar.gz/zip shards
    # (64*mult of them, so archive-count parallelism grows with
    # data) -> read back
    arc_dir = f"{WORK}/arcs_x{mult}"
    shutil.rmtree(arc_dir, ignore_errors=True)
    n_arcs = 64 * mult
    staged = docs.select(
        F.concat(
            F.lit("shard-"),
            (F.col("doc_id") % n_arcs).cast("string"),
            F.when((F.col("doc_id") % 2) == 0, ".zip")
            .otherwise(".tar.gz"),
        ).alias("archive"),
        F.format_string("doc_%012d.txt", "doc_id").alias("member"),
        F.encode("text", "UTF-8").alias("content"),
    )
    t0 = time.time()
    write_archives(staged, arc_dir).count()
    results["archive_write"] = {
        "spark": round(time.time() - t0, 2), "files": n_arcs,
    }
    results["archive_read"] = {
        "spark": timed(lambda: read_archives(spark, arc_dir))
    }

    # PDF: synthesize a two-page PDF per doc inside the task, then
    # decode it back (both directions, gate-fixture shape)
    def synth_pdf(batches):
        import pandas as pd

        from minerva_etl_spark.operators.pdf import synthesize_pdf

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                rows.append(
                    (d, synthesize_pdf(
                        [f"Doc {d}", str(t)[:4000]],
                        title=f"Doc {d}",
                        compress=(d % 2 == 0),
                    ))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    pdfs = docs.select("doc_id", "text").mapInPandas(
        synth_pdf, "doc_id bigint, payload binary"
    )
    results["pdf_extract"] = {
        "spark": timed(lambda: pdf_extract(pdfs))
    }

    # feeds: one RSS (even) / Atom (odd) feed per doc, 3 entries each
    def synth_feed(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                items = []
                for i in range(3):
                    if d % 2 == 0:
                        items.append(
                            f"<item><title>t{i}</title>"
                            f"<link>https://t/{d}/{i}</link></item>"
                        )
                    else:
                        items.append(
                            f"<entry><title>t{i}</title>"
                            f'<link href="https://t/{d}/{i}"/>'
                            f"<id>u:{d}:{i}</id></entry>"
                        )
                if d % 2 == 0:
                    xml = ("<rss><channel><title>F</title>"
                           + "".join(items) + "</channel></rss>")
                else:
                    xml = ('<feed xmlns="http://www.w3.org/2005/Atom">'
                           "<title>F</title>" + "".join(items) + "</feed>")
                rows.append((d, xml))
            yield pd.DataFrame(rows, columns=["feed_id", "xml"])

    feeds = docs.select("doc_id").mapInPandas(
        synth_feed, "feed_id bigint, xml string"
    )
    results["feed_entries"] = {
        "spark": timed(lambda: feed_entries(feeds))
    }
    return results


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r10")
    os.makedirs(WORK, exist_ok=True)
    all_results = {}
    for m in mults:
        d = build(spark, m)
        all_results[m] = probe(spark, d, m)
        print(f"x{m}: {json.dumps(all_results[m])}", flush=True)
    print(json.dumps(all_results))


if __name__ == "__main__":
    main()
