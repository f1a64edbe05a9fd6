"""Scale probes for the r16 decrypt surfaces + the split-fan-out
reading the r15 verdict asked for (ask 4).

Claims under test:

- **fan-out**: the decrypt scan's wall tracks the INPUT SPLITS, not
  the corpus — r15's agile ×16 reading (287 s) was a
  single-input-split artifact.  Here the SAME ×16 encrypted corpus
  is materialized to parquet as 1 vs 16 files and the identical
  zero-shuffle plan is timed over both (partition counts recorded —
  a single ~0.5 GB file still row-group-splits a little, which the
  reading shows honestly);
- **cryptoapi_xor_decrypt**: the r16 CryptoAPI (SHA-1 block keys,
  1024/512-byte rekeying) and XOR Method 1 paths are zero-shuffle
  Arrow scans with linear byte slopes, same as the Office-97 legs;
- **odf_decrypt**: PBKDF2 + vectorized Blowfish-CFB8 / AES-CBC ODF
  decryption is the same zero-shuffle scan (the per-(password,salt)
  PBKDF2 and the Blowfish key schedule memoize per worker).

Shuffle counts are read from the executed plan (count of Exchange
operators, ReusedExchange excluded).

Usage: python tools/scale_probe_r16.py [multipliers...] (default: 1 4 16)
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
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id"
    )
    results: dict[str, dict] = {}

    def timed(key: str, fn, shuffle_df=None, extra=None) -> None:
        t0 = time.time()
        n = fn()
        results[key] = {"spark": round(time.time() - t0, 2), "rows": n}
        if shuffle_df is not None:
            results[key]["shuffles"] = _shuffles(shuffle_df)
        if extra:
            results[key].update(extra)

    # --- r16 CryptoAPI + XOR decrypt (in-task synth, like r15) ------
    def ca_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.msdoc import synthesize_doc
        from minerva_etl_spark.operators.offcrypto import (
            encrypt_doc_rc4_cryptoapi,
            encrypt_xls_rc4_cryptoapi,
            encrypt_xls_xor,
        )
        from minerva_etl_spark.operators.xls import synthesize_xls

        # per-scheme payloads encrypted ONCE (the probe measures the
        # decrypt side) and fanned out
        xls = synthesize_xls(
            [("S", [[f"r{i}", str(3 * i + 1)] for i in range(8)])]
        )
        doc = synthesize_doc([f"cryptoapi probe p{i}" for i in range(8)])
        blobs = [
            encrypt_xls_rc4_cryptoapi(xls, seed=b"probe-r16-ca"),
            encrypt_doc_rc4_cryptoapi(doc, seed=b"probe-r16-dca"),
            encrypt_xls_rc4_cryptoapi(
                xls, seed=b"probe-r16-40", key_bits=40
            ),
            encrypt_xls_xor(xls),
        ]
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": [int(d) for d in pdf["doc_id"]],
                 "payload": [blobs[int(d) % 4] for d in pdf["doc_id"]]}
            )

    ca = office_decrypt_extract(
        docs.mapInPandas(ca_synth, "doc_id bigint, payload binary")
    )
    timed("cryptoapi_xor_decrypt", ca.count, shuffle_df=ca)

    # --- r16 ODF decrypt (Blowfish-CFB8 + AES-256-CBC) --------------
    def odf_synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.odf import (
            encrypt_odf,
            synthesize_ods,
            synthesize_odt,
        )

        blobs = [
            encrypt_odf(
                synthesize_odt([f"odf probe p{i}" for i in range(8)]),
                "probe", seed=b"probe-r16-bf",
            ),
            encrypt_odf(
                synthesize_ods(
                    [("S", [[f"r{i}", str(i)] for i in range(8)])]
                ),
                "probe", cipher="aes256", seed=b"probe-r16-aes",
            ),
        ]
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": [int(d) for d in pdf["doc_id"]],
                 "payload": [blobs[int(d) % 2] for d in pdf["doc_id"]]}
            )

    odf = office_decrypt_extract(
        docs.mapInPandas(odf_synth, "doc_id bigint, payload binary"),
        password="probe",
    )
    timed("odf_decrypt", odf.count, shuffle_df=odf)
    return results


def fanout_probe(spark, data_dir: str) -> dict:
    """The ask-4 reading: the SAME agile-encrypted corpus (the r15
    287-second ×16 leg) materialized as 1 vs 16 parquet files, the
    identical plan timed over both."""
    from pyspark.sql import functions as F  # noqa: F401

    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet").select(
        "doc_id"
    )

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

    enc = docs.mapInPandas(
        agile_synth, "doc_id bigint, payload binary"
    )
    work = tempfile.mkdtemp(prefix="probe_r16_fanout_")
    out: dict[str, dict] = {}
    try:
        for n_files in (1, 16):
            path = f"{work}/agile_{n_files}"
            (enc.repartition(n_files) if n_files > 1
             else enc.coalesce(1)).write.mode("overwrite").parquet(path)
            src = spark.read.parquet(path)
            dec = office_decrypt_extract(src)
            t0 = time.time()
            n = dec.count()
            out[f"files_{n_files}"] = {
                "spark": round(time.time() - t0, 2),
                "rows": n,
                "input_partitions": src.rdd.getNumPartitions(),
                "shuffles": _shuffles(dec),
            }
            print(json.dumps({f"fanout_files_{n_files}":
                              out[f"files_{n_files}"]}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "4", "16"])]
    from minerva_etl_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(app_name="scale_probe_r16", shuffle_partitions=32)
    out = {}
    for m in mults:
        data_dir = build(spark, m)
        out[f"x{m}"] = probe(spark, data_dir, m)
        print(json.dumps({f"x{m}": out[f"x{m}"]}), flush=True)
    if 16 in mults:
        out["fanout_x16"] = fanout_probe(spark, build(spark, 16))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
