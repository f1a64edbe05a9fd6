#!/usr/bin/env bash
# The round-12 document-ingest arc from the CLI: synthesize a mixed
# PDF / DOCX / EPUB / RTF corpus plus an mbox mailbox with the
# engine's own writers, then extract everything back — per-format
# verbs, the magic-byte office dispatcher, and the mail path — and
# finish with C4 cleaning, corpus-scale substring dedup, and a
# unigram-LM tokenizer trained on the extracted text.
#
# Input: any parquet of documents (doc_id, text, ...).
set -euo pipefail

DOCS=${1:-/root/testdata/sf0.001/documents.parquet}
OUT=${2:-/tmp/office_demo}

if ! command -v minerva-spark >/dev/null; then
  minerva-spark() { python -m minerva_etl_spark.cli "$@"; }
fi
mkdir -p "$OUT"

# 0. Synthesize the mixed binary corpus — in production these columns
#    come from your crawl or delivery.
python - "$DOCS" "$OUT" <<'EOF'
import sys
from minerva_etl_spark.session import get_spark
from minerva_etl_spark.operators.docx import synthesize_docx
from minerva_etl_spark.operators.email_ingest import (
    synthesize_eml, synthesize_mbox,
)
from minerva_etl_spark.operators.epub import synthesize_epub
from minerva_etl_spark.operators.pdf import synthesize_pdf
from minerva_etl_spark.operators.rtf import synthesize_rtf

docs_path, out = sys.argv[1], sys.argv[2]
spark = get_spark(shuffle_partitions=8)
rows = spark.read.parquet(docs_path).limit(40).collect()


def payload(d, t):
    title = f"Doc {d}"
    if d % 4 == 0:
        return synthesize_pdf([title, t], title=title)
    if d % 4 == 1:
        return synthesize_docx([title, t], title=title)
    if d % 4 == 2:
        return synthesize_epub([f"<p>{title}</p>", f"<p>{t}</p>"],
                               title=title)
    return synthesize_rtf([title, t], title=title)


mixed = [(r.doc_id, payload(r.doc_id, r.text)) for r in rows]
spark.createDataFrame(mixed, "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(out + "/mixed")

msgs = [synthesize_eml(f"Doc {r.doc_id} mail", "corpus@example.test",
                       text_body=r.text) for r in rows[:10]]
spark.createDataFrame([(0, synthesize_mbox(msgs))],
                      "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(out + "/mailbox")
EOF

# 1. One verb for the whole mixed column: magic-byte dispatch
minerva-spark media office-text \
  --input "$OUT/mixed" --output "$OUT/extracted"

# 2. The mail path: split the mailbox, then parse each message
minerva-spark media mbox-split \
  --input "$OUT/mailbox" --output "$OUT/messages"
python - "$OUT" <<'EOF'
import sys
from minerva_etl_spark.session import get_spark
out = sys.argv[1]
spark = get_spark(shuffle_partitions=8)
spark.read.parquet(out + "/messages") \
    .selectExpr("media_id * 100 + msg_index AS media_id", "payload") \
    .write.mode("overwrite").parquet(out + "/messages_keyed")
EOF
minerva-spark media eml-text \
  --input "$OUT/messages_keyed" --output "$OUT/mail_text"

# 3. Curate the extracted text: a C4 cleaning REPORT (this corpus
#    has no terminal punctuation, so C4 would drop everything — the
#    per-rule attrition columns show exactly that), the Lee-et-al
#    substring dedup, and a unigram tokenizer on the deduped text
python - "$OUT" <<'EOF'
import sys
from minerva_etl_spark.session import get_spark
out = sys.argv[1]
spark = get_spark(shuffle_partitions=8)
spark.read.parquet(out + "/extracted") \
    .selectExpr("media_id AS doc_id", "text") \
    .write.mode("overwrite").parquet(out + "/texts")
EOF
minerva-spark corpus c4-rules \
  --input "$OUT/texts" --output "$OUT/c4_report" --text-col text
minerva-spark corpus substring-dedup \
  --input "$OUT/texts" --output "$OUT/deduped" \
  --window 8 --text-col text
minerva-spark corpus unigram \
  --input "$OUT/deduped" --output "$OUT/tokenized" \
  --n 256 --window 5 --iters 2 --text-col kept_text

echo "office demo complete:"
echo "  extracted  -> $OUT/extracted (format,title,text per payload)"
echo "  mail       -> $OUT/mail_text"
echo "  c4 report  -> $OUT/c4_report (per-rule attrition)"
echo "  deduped    -> $OUT/deduped"
echo "  tokenized  -> $OUT/tokenized (+ _vocab sidecar)"
