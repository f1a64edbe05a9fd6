#!/usr/bin/env bash
# End-to-end corpus curation from the CLI — the LLM-data side of the
# engine, operable exactly like the trend-store verbs.
#
# Input: any parquet of documents (doc_id, text, lang, source, ...)
# plus optionally a held-out benchmark parquet for decontamination.
set -euo pipefail

DOCS=${1:-/root/testdata/sf0.001/documents.parquet}
OUT=${2:-/tmp/curation_demo}

# installed entry point, or module form from a source checkout
if ! command -v minerva-spark >/dev/null; then
  minerva-spark() { python -m minerva_etl_spark.cli "$@"; }
fi

# 1. The one-call pipeline: quality filter -> boilerplate strip ->
#    near-dup canonical dedup -> decontamination -> 50-docs-per-lang
#    quality cap -> temperature mix -> seeded shuffle -> token shards.
minerva-spark curate \
  --documents "$DOCS" \
  --output "$OUT/shards" \
  --source-col lang \
  --shard-tokens 5000 \
  --seed 42 \
  --boilerplate-max-docs 4 \
  --cap-per-source 50

# 2. Standalone operators over the same corpus:
minerva-spark corpus split --input "$DOCS" --output "$OUT/split" \
  --fractions train=0.9,val=0.05,test=0.05 --seed 42
minerva-spark corpus cap --input "$DOCS" --output "$OUT/cap" \
  --keys lang,source --order-col n_chars --n 5
minerva-spark corpus tfidf --input "$DOCS" --output "$OUT/tfidf" --n 3
minerva-spark corpus bpe --input "$DOCS" --output "$OUT/bpe_merges" --n 16

# 3. Embedding-side: distributed Lloyd's k-means (writes assignments
#    and the fitted centroid table next to it).
minerva-spark corpus kmeans \
  --input "${DOCS%documents.parquet}embeddings.parquet" \
  --output "$OUT/clusters" --n 8 --iters 2

# 4. The tokenizer arc end-to-end: train BPE merges on the corpus,
#    encode token ids, pack fixed-length sequences, and export the
#    loader-ready binary shards (.bin/.idx + sha256 manifest).
minerva-spark corpus pack-ids --input "$DOCS" --output "$OUT/token_bin" \
  --n 64 --seq-len 512 --seed 42 --binary

# 5. Incremental ops across deliveries: dedup a second "delivery"
#    against the persisted signature state of the first — text
#    (digest + MinHash signatures) and embeddings (LSH bucket +
#    vector state) flavors.
minerva-spark corpus increment --input "$DOCS" \
  --output "$OUT/inc1" --state "$OUT/sig_state"
minerva-spark corpus increment-emb \
  --input "${DOCS%documents.parquet}embeddings.parquet" \
  --output "$OUT/inc_emb" --state "$OUT/emb_state"

# 6. Standalone decontamination: drop docs sharing 4-gram shingles
#    with a held-out benchmark (here: the corpus itself as a smoke
#    stand-in — everything collides, output is empty).
minerva-spark corpus decontaminate --input "$DOCS" \
  --output "$OUT/clean" --benchmark "$DOCS"

# 7. Multimodal: synthesize a tiny MIXED-format media parquet (real
#    PNG and JPEG bytes in one column, plus a mu-law WAV table), then
#    decode / normalize through the media verbs.
python - "$OUT" <<'PY'
import sys
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
from minerva_etl_spark.operators.jpeg import synthesize_jpeg
from minerva_etl_spark.operators.multimodal import (
    synthesize_png,
    synthesize_wav_mulaw,
)
spark = SparkSession.builder.master("local[4]").getOrCreate()
rows = []
for i in range(16):
    px = bytes((i * 7 + j) % 256 for j in range(8 * 6 * 3))
    if i % 2 == 0:
        payload = synthesize_png(px, 8, 6, 3, [i % 5])
    else:
        payload = synthesize_jpeg(px, 8, 6, quality=85)
    rows.append((i, payload))
spark.createDataFrame(rows, "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(sys.argv[1] + "/media")
audio = [
    (i, synthesize_wav_mulaw(bytes((i * 13 + j * 7) % 256
                                   for j in range(64)), 8000))
    for i in range(8)
]
spark.createDataFrame(audio, "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(sys.argv[1] + "/audio")
spark.stop()
PY
# per-payload magic-byte dispatch: PNG and JPEG in ONE column
minerva-spark media image-features --input "$OUT/media" \
  --output "$OUT/media_features"
# canonicalize: everything to 4x3 lossless PNG, whatever came in
minerva-spark media image-resize --input "$OUT/media" \
  --output "$OUT/media_small" --width 4 --height 3
# telephony audio (G.711 mu-law, format code 7)
minerva-spark media wav-features --input "$OUT/audio" \
  --output "$OUT/audio_features"

# 8. Incremental IVF retrieval: build the persisted centroid index on
#    the corpus embeddings, deliver an increment, query the state.
EMB="${DOCS%documents.parquet}embeddings.parquet"
minerva-spark corpus ivf-build --input "$EMB" \
  --output "$OUT/ivf_assigned" --state "$OUT/ivf_state" --n 4
minerva-spark corpus ivf-query --input "$EMB" \
  --output "$OUT/ivf_hits" --state "$OUT/ivf_state" --n 5

echo "curation demo outputs under $OUT"
