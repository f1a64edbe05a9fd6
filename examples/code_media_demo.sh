#!/usr/bin/env bash
# The round-10 code/media curation arc from the CLI: profile a code
# corpus, collapse reformatted near-dups, render fill-in-the-middle
# training strings, select a token-budgeted mixture, and run the
# perceptual dedup triple (image / audio / video) over real decoded
# payloads.
#
# Input: any parquet of documents (doc_id, text, source, ...).
set -euo pipefail

DOCS=${1:-/root/testdata/sf0.001/documents.parquet}
OUT=${2:-/tmp/code_media_demo}

if ! command -v minerva-spark >/dev/null; then
  minerva-spark() { python -m minerva_etl_spark.cli "$@"; }
fi
mkdir -p "$OUT"

# 0. Shape the documents into a code-file corpus and synthesize small
#    media payloads with the engine's own codecs (PNG / WAV / AVI) —
#    in production these columns come from your crawl or delivery.
python - "$DOCS" "$OUT" <<'EOF'
import sys
from minerva_etl_spark.session import get_spark
from minerva_etl_spark.operators.multimodal import (
    synthesize_avi, synthesize_png, synthesize_wav,
)

docs_path, out = sys.argv[1], sys.argv[2]
spark = get_spark(shuffle_partitions=8)
docs = spark.read.parquet(docs_path).limit(40)

code = docs.selectExpr(
    "doc_id AS file_id",
    "CASE WHEN doc_id % 2 = 0 THEN 'src/m_' || doc_id || '.py' "
    "     ELSE 'web/a_' || doc_id || '.js' END AS path",
    "CASE WHEN doc_id % 2 = 0 "
    "  THEN '# doc ' || doc_id || chr(10) || 'def f():' || chr(10) "
    "       || '    return ' || length(text) "
    "  ELSE '// doc ' || doc_id || chr(10) "
    "       || 'const n = ' || length(text) || ';' END AS content",
    "source",
    "CAST(length(text) / 5 AS BIGINT) AS n_tokens",
)
code.write.mode("overwrite").parquet(out + "/code")


def media_rows(df, maker):
    # every 4th payload gets a lightly perturbed twin (id + 1000) so
    # the dedup verbs below have real near-dups to find
    rows = []
    for r in df.collect():
        d = int(r.doc_id)
        rows.append((d, maker(d)))
        if d % 4 == 0:
            rows.append((d + 1000, maker(d, pert=True)))
    return rows


def png(d, pert=False):
    dc = 3 if pert else 0
    px = bytes(min((d * 7 + 31 * (i // 27) + 13 * ((i % 27) // 3)
                    + (i % 3) * 101
                    + ((i % 27) // 3) ** 2 * (3 + d % 23))
                   % 256 + dc, 255) for i in range(9 * 8 * 3))
    return synthesize_png(px, 9, 8, 3)


def wav(d, pert=False):
    dc = 2 if pert else 0
    return synthesize_wav(
        [(((d * 13 + i * 7) % 97) - 48)
         * (1 + (d + 1) * (i // 64 + 1) * 7919 % 9973 % 13) + dc
         for i in range(65 * 64)], 8000)


def avi(d, pert=False):
    dc = 3 if pert else 0
    frames = [bytes(min((d * 7 + f * 53 + 31 * (i // 27)
                         + ((i % 27) // 3) ** 2
                         * (3 + (d * 31 + f * 17) % 211)
                         + (i % 3) * 101) % 256 + dc, 255)
                    for i in range(9 * 8 * 3)) for f in range(3)]
    return synthesize_avi(frames, 9, 8)


for name, maker in (("images", png), ("clips_wav", wav),
                    ("clips_avi", avi)):
    spark.createDataFrame(
        media_rows(docs, maker), "media_id bigint, payload binary"
    ).write.mode("overwrite").parquet(f"{out}/{name}")
print("synthesized:", out)
EOF

# 1. Code corpus: profile -> near-dedup -> FIM render.
minerva-spark corpus code-profile --input "$OUT/code" \
  --output "$OUT/code_profile"
minerva-spark corpus code-dedup --input "$OUT/code" \
  --output "$OUT/code_groups"
minerva-spark corpus fim --input "$OUT/code" --output "$OUT/code_fim" \
  --rate 0.5 --seed 7 --id-col file_id

# 2. Token-budgeted mixture over the profiled corpus.
minerva-spark corpus budget-select --input "$OUT/code" \
  --output "$OUT/mixture" --budget 2000 --id-col file_id

# 3. Perceptual dedup triple over real decoded payloads.
minerva-spark media image-dedup --input "$OUT/images" \
  --output "$OUT/image_pairs" --radius 3
minerva-spark media audio-dedup --input "$OUT/clips_wav" \
  --output "$OUT/audio_pairs" --radius 3
minerva-spark media video-dedup --input "$OUT/clips_avi" \
  --output "$OUT/video_pairs" --radius 3

echo "demo outputs under $OUT"
