"""Scale probes for the late round-10 arc: the perceptual dedup
triple (image dHash / audio fingerprint / video frame hashes + the
shared pigeonhole pair join) and the one-scan code operators
(profile, normalized dedup, FIM, secrets).

Reuses scale_probe.build() to replicate the sf0.1 documents ×N.  The
claims under test:

- the media hashes are Arrow mapInPandas scans (synthesis + REAL
  codec decode inside the task, gate-fixture shape): wall grows
  near-linearly in payload count, and the pair join's cost follows
  the HASH row count (tiny), not payload bytes;
- the code operators are single whole-stage-codegen scans (0-1
  exchanges), so their wall is one read of the corpus.

Usage: python tools/scale_probe_r10b.py [multipliers...] (default: 1 4 16)
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
    from minerva_etl_spark.operators.audiohash import audio_fingerprint
    from minerva_etl_spark.operators.code import (
        dedup_code_groups,
        fim_transform,
        redact_secrets,
        with_code_profile,
        with_secret_scan,
    )
    from minerva_etl_spark.operators.imagehash import (
        dhash_pairs,
        image_dhash,
        video_dedup_pairs,
        video_frame_hashes,
    )

    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    ids = docs.select("doc_id")
    results: dict[str, dict] = {}

    def timed(df) -> dict:
        t0 = time.time()
        n = df.count()
        return {"spark": round(time.time() - t0, 2), "rows": n}

    # --- media: FULL-ENTROPY payloads (seeded RandomState per doc) so
    # only the planted 1-in-4 twins pair — the gate fixtures'
    # mod-class formulas have genuinely quadratic near-dup density at
    # large n (first probe run: 7M pairs at x16), which measures the
    # corpus, not the operator.  Here pair output stays O(n) and the
    # timings isolate hash + join scaling.
    def synth_images(batches):
        import numpy as np
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_png

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                base = np.random.RandomState(d).randint(
                    0, 250, size=9 * 8 * 3
                ).astype(np.uint8)
                rows.append((d, synthesize_png(base.tobytes(), 9, 8, 3)))
                if d % 4 == 0:
                    rows.append((d + 10**9,
                                 synthesize_png(
                                     (base + 3).tobytes(), 9, 8, 3)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    def synth_wavs(batches):
        import numpy as np
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_wav

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                s = np.random.RandomState(d).randint(
                    -500, 500, size=65 * 64
                )
                rows.append((d, synthesize_wav(s.tolist(), 8000)))
                if d % 4 == 0:
                    rows.append(
                        (d + 10**9, synthesize_wav((s + 2).tolist(), 8000))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    def synth_avis(batches):
        import numpy as np
        import pandas as pd

        from minerva_etl_spark.operators.multimodal import synthesize_avi

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                rng = np.random.RandomState(d)
                frames = [
                    rng.randint(0, 250, size=9 * 8 * 3).astype(np.uint8)
                    for _ in range(3)
                ]

                def clip(pert):
                    return synthesize_avi(
                        [(f + pert).tobytes() for f in frames], 9, 8
                    )

                rows.append((d, clip(0)))
                if d % 4 == 0:
                    rows.append((d + 10**9, clip(3)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    schema = "media_id bigint, payload binary"
    imgs = ids.mapInPandas(synth_images, schema=schema)
    results["image_dedup"] = timed(dhash_pairs(image_dhash(imgs), 3))
    wavs = ids.mapInPandas(synth_wavs, schema=schema)
    results["audio_dedup"] = timed(
        dhash_pairs(
            audio_fingerprint(wavs).select(
                "media_id", "d0", "d1", "d2", "d3"
            ),
            3,
        )
    )
    avis = ids.mapInPandas(synth_avis, schema=schema)
    results["video_dedup"] = timed(
        video_dedup_pairs(video_frame_hashes(avis), 3)
    )

    # --- code: one synthesized file per doc, then each one-scan op
    code = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 2 = 0 THEN 'm_' || doc_id || '.py' "
        "ELSE 'a_' || doc_id || '.js' END AS path",
        "CASE WHEN doc_id % 2 = 0 THEN '# doc ' || doc_id || chr(10) "
        "  || 'def f():' || chr(10) || '    return \"' || text || '\"' "
        "ELSE '// doc ' || doc_id || chr(10) "
        "  || 'const x = \"' || text || '\";' END AS content",
    )
    results["code_profile"] = timed(
        with_code_profile(code, "content", "path")
    )
    results["code_dedup"] = timed(
        dedup_code_groups(code, "doc_id", "content")
    )
    results["code_fim"] = timed(
        fim_transform(code, "content", "doc_id", rate=0.5)
    )
    results["code_secrets"] = timed(
        redact_secrets(with_secret_scan(code, "content"), "content")
    )
    results["_mult"] = mult
    return results


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    from minerva_etl_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    all_results = []
    for mult in mults:
        data_dir = build(spark, mult)
        all_results.append(probe(spark, data_dir, mult))
        print(json.dumps(all_results[-1]))
    print(json.dumps({"probe": "r10b", "results": all_results}))


if __name__ == "__main__":
    main()
