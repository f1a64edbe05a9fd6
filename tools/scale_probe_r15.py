"""Scale probes for the r14/r15 surfaces that shipped without probe
readings (the r14 verdict's ask 5): the web-graph arc
(`wat_links` → host-graph aggregate → exact-integer PageRank
iterations) and the mail-attachment arc (MIME explode → office
codecs), plus the r15-born default-password decryption pass.

Claims under test:

- `wat_links` is a shuffle-ZERO scan (from_json + posexplode + regex
  resolution, all codegen) and the host-graph groupBy adds exactly
  ONE exchange;
- each PageRank iteration is the textbook TWO-exchange shape (the
  edges⋈ranks join side + the groupBy(dst) partial-agg side; the
  node-sized rank table broadcasts when small, and lineage is cut per
  round so plan depth and — since r15 — retained checkpoint storage
  stay O(1) at any iteration count);
- `eml_attachments` → `office_extract` is a zero-shuffle mapInPandas
  chain: the attachment explode happens inside the Arrow task, so
  corpus growth adds tasks, never exchanges;
- `office_decrypt_extract` is the same zero-shuffle scan with the
  AES/RC4 work per payload (the 50k-round key spin amortized by the
  per-worker (password, salt) cache).

Shuffle counts are read from the executed plan (count of Exchange
operators, ReusedExchange excluded).

Usage: python tools/scale_probe_r15.py [multipliers...] (default: 1 4 16)
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

    from minerva_etl_spark.sources.wet import wat_links, write_wat_files

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id"
    )
    n_shards = 8 * mult
    results: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix=f"probe_r15_x{mult}_")

    def timed(key: str, fn, shuffle_df=None) -> None:
        t0 = time.time()
        n = fn()
        results[key] = {"spark": round(time.time() - t0, 2), "rows": n}
        if shuffle_df is not None:
            results[key]["shuffles"] = _shuffles(shuffle_df)

    # --- web graph: WAT shards with real Links arrays ----------------
    def wat_synth(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                links = [
                    {
                        "url": (
                            f"https://h{(d + j) % 97}.ext.test/p/{j}"
                            if j % 2 == 0
                            else f"/l/{d}/{j}"
                        )
                    }
                    for j in range(d % 7)
                ]
                env = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI":
                                f"https://s{d % 53}.corpus.test/d/{d}"
                        },
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": {
                                "HTML-Metadata": {"Links": links}
                            }
                        },
                    }
                }
                rows.append(
                    (
                        f"part-{d % n_shards}.warc.wat.gz",
                        f"rec-{d:09d}",
                        f"https://s{d % 53}.corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        _json.dumps(env, sort_keys=True),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "target_uri",
                         "warc_date", "meta_json"],
            )

    staged = docs.mapInPandas(
        wat_synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    wat_dir = f"{work}/wat"
    write_wat_files(staged, wat_dir).count()

    links = wat_links(spark, wat_dir)
    timed("wat_links", links.count, shuffle_df=links)
    graph = links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    timed("host_graph", graph.count, shuffle_df=graph)

    # --- PageRank: per-iteration shuffle shape + long-run storage ----
    from minerva_etl_spark.operators.pagerank import pagerank

    edges = (
        graph.filter(F.col("src_host") != F.col("dst_host"))
        .select(F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"))
        .localCheckpoint(eager=True)
    )
    # one UNcheckpointed iteration, to read its exchange count
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct().localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    ranks0 = nodes.withColumn(
        "rank_grid", F.lit(10**12).cast("bigint")
    ).localCheckpoint(eager=True)
    one_iter = (
        edges.join(ranks0.withColumnRenamed("node", "src"), "src")
        .join(outdeg.withColumnRenamed("node", "src"), "src")
        .select(F.col("dst").alias("node"),
                F.expr("rank_grid div outdeg").alias("c"))
        .groupBy("node").agg(F.sum("c").alias("cin"))
        .join(nodes, "node", "right")
    )
    timed("pagerank_one_iter", one_iter.count, shuffle_df=one_iter)
    n_rdds0 = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    timed("pagerank_10_iters",
          lambda: pagerank(edges, iters=10).count())
    results["pagerank_10_iters"]["retained_rdd_delta"] = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        - n_rdds0
    )

    # --- mail attachments: MIME explode -> office codecs -------------
    def mail_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.docx import synthesize_docx
        from minerva_etl_spark.operators.email_ingest import (
            synthesize_eml,
        )
        from minerva_etl_spark.operators.pdf import synthesize_pdf

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                eml = synthesize_eml(
                    subject=f"msg {d}",
                    sender="a@probe.test",
                    text_body=f"body {d}",
                    attachments=[
                        (f"r{d}.docx",
                         "application/vnd.openxmlformats-officedocument"
                         ".wordprocessingml.document",
                         synthesize_docx([f"att doc {d}"])),
                        (f"r{d}.pdf", "application/pdf",
                         synthesize_pdf([f"att pdf {d}"])),
                    ],
                )
                rows.append((d, eml))
            yield pd.DataFrame(rows, columns=["msg_id", "payload"])

    from minerva_etl_spark.operators.email_ingest import eml_attachments
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
        office_extract,
    )

    mails = docs.mapInPandas(
        mail_synth, "msg_id bigint, payload binary"
    )
    atts = eml_attachments(mails, id_col="msg_id")
    extracted = office_extract(
        atts.select(
            F.concat_ws("/", F.col("msg_id"), F.col("filename"))
            .alias("doc_id"),
            "payload",
        ),
        id_col="doc_id",
    )
    timed("mail_attachments", extracted.count, shuffle_df=extracted)

    # --- r15 decryption pass ------------------------------------------
    def enc_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.docx import synthesize_docx
        from minerva_etl_spark.operators.offcrypto import (
            encrypt_ooxml,
            encrypt_xls_rc4,
        )
        from minerva_etl_spark.operators.xls import synthesize_xls

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    p = encrypt_ooxml(
                        synthesize_docx([f"enc doc {d}"]),
                        seed=b"probe-r15",
                    )
                else:
                    p = encrypt_xls_rc4(
                        synthesize_xls([("S", [[f"enc xls {d}"]])]),
                        seed=b"probe-r15",
                    )
                rows.append((d, p))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    encs = docs.mapInPandas(enc_synth, "doc_id bigint, payload binary")
    dec = office_decrypt_extract(encs)
    timed("office_decrypt", dec.count, shuffle_df=dec)

    # --- r15 second wave: agile decrypt + the ODF / XLSB codecs ------
    def agile_synth(batches):
        # the probe measures the DECRYPT side; chained CBC *encrypt*
        # is the deliberately slow fixture-writer path, so one
        # payload is encrypted once and fanned out
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

    agile = office_decrypt_extract(
        docs.mapInPandas(agile_synth, "doc_id bigint, payload binary")
    )
    timed("office_decrypt_agile", agile.count, shuffle_df=agile)

    def odfxlsb_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.odf import (
            synthesize_odp,
            synthesize_ods,
            synthesize_odt,
        )
        from minerva_etl_spark.operators.xlsb import synthesize_xlsb

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 4 == 0:
                    p = synthesize_odt([f"p{i} doc {d}"
                                        for i in range(6)])
                elif d % 4 == 1:
                    p = synthesize_ods(
                        [("S", [[f"r{i}", str(d * i + 1)]
                                for i in range(6)])]
                    )
                elif d % 4 == 2:
                    p = synthesize_odp([[f"s{i} doc {d}"]
                                        for i in range(3)])
                else:
                    p = synthesize_xlsb(
                        [("S", [[f"r{i}", str(d * i + 1)]
                                for i in range(6)])]
                    )
                rows.append((d, p))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    from minerva_etl_spark.operators.office import office_extract as _oe

    mixed = _oe(
        docs.mapInPandas(
            odfxlsb_synth, "doc_id bigint, payload binary"
        )
    )
    timed("odf_xlsb_extract", mixed.count, shuffle_df=mixed)

    shutil.rmtree(work, ignore_errors=True)
    return results


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r15", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
