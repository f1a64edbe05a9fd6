#!/usr/bin/env bash
# The rounds-12/15 document-ingest arc from the CLI: synthesize a
# mixed PDF / DOCX / EPUB / RTF / XLSX / XLSB / PPTX / ODT / ODS /
# ODP / legacy-.doc/.xls/.ppt corpus — including DEFAULT-PASSWORD
# ENCRYPTED members (ECMA-376 Standard + Agile, Office-97 RC4) —
# plus an mbox mailbox AND Outlook .msg exports with the engine's
# own writers, then extract everything back: a sniff-only format
# census, the decryption-aware office dispatcher (locked files
# become census rows, never errors), per-format verbs, and both
# mail paths — and finish with C4 cleaning, corpus-scale substring
# dedup, and a unigram-LM tokenizer (byte-fallback stream) trained
# on the extracted text.
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
from minerva_etl_spark.operators.msdoc import synthesize_doc
from minerva_etl_spark.operators.msg import synthesize_msg
from minerva_etl_spark.operators.odf import (
    synthesize_odp, synthesize_ods, synthesize_odt,
)
from minerva_etl_spark.operators.offcrypto import (
    encrypt_ooxml, encrypt_ooxml_agile, encrypt_xls_rc4,
)
from minerva_etl_spark.operators.xlsb import synthesize_xlsb
from minerva_etl_spark.operators.pdf import synthesize_pdf
from minerva_etl_spark.operators.ppt import synthesize_ppt
from minerva_etl_spark.operators.pptx import synthesize_pptx
from minerva_etl_spark.operators.rtf import synthesize_rtf
from minerva_etl_spark.operators.xls import synthesize_xls
from minerva_etl_spark.operators.xlsx import synthesize_xlsx

docs_path, out = sys.argv[1], sys.argv[2]
spark = get_spark(shuffle_partitions=8)
rows = spark.read.parquet(docs_path).limit(40).collect()


def payload(d, t):
    title = f"Doc {d}"
    return [
        lambda: synthesize_pdf([title, t], title=title),
        lambda: synthesize_docx([title, t], title=title),
        lambda: synthesize_epub([f"<p>{title}</p>", f"<p>{t}</p>"],
                                title=title),
        lambda: synthesize_rtf([title, t], title=title),
        lambda: synthesize_xlsx([("Data", [[title], [t]])],
                                title=title),
        lambda: synthesize_pptx([[title, t]], title=title),
        lambda: synthesize_doc([title, t], title=title),
        lambda: synthesize_xls([("Data", [[title], [t]])],
                               title=title),
        lambda: synthesize_ppt([[title, t]], title=title),
        lambda: synthesize_odt([title, t], title=title),
        lambda: synthesize_ods([("Data", [[title], [t]])],
                               title=title),
        lambda: synthesize_odp([[title, t]], title=title),
        lambda: synthesize_xlsb([("Data", [[title], [t]])],
                                title=title),
        # default-password encrypted members (decryptable with zero
        # secrets — the VelvetSweatshop convention)
        lambda: encrypt_ooxml(
            synthesize_docx([title, t], title=title)),
        lambda: encrypt_ooxml_agile(
            synthesize_docx([title, t], title=title)),
        lambda: encrypt_xls_rc4(
            synthesize_xls([("Data", [[title], [t]])], title=title)),
        # a REALLY locked file: stays a census row with NULL text
        lambda: encrypt_ooxml(
            synthesize_docx([title, t]), password="actual-secret"),
    ][d % 17]()


mixed = [(r.doc_id, payload(r.doc_id, r.text)) for r in rows]
spark.createDataFrame(mixed, "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(out + "/mixed")

msgs = [synthesize_eml(f"Doc {r.doc_id} mail", "corpus@example.test",
                       text_body=r.text) for r in rows[:10]]
spark.createDataFrame([(0, synthesize_mbox(msgs))],
                      "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(out + "/mailbox")

# desktop exports: wire-format eml MIXED with Outlook .msg
mail = [
    (r.doc_id,
     synthesize_msg(f"Doc {r.doc_id} mail", r.text,
                    sender="corpus@example.test")
     if r.doc_id % 2
     else synthesize_eml(f"Doc {r.doc_id} mail", "corpus@example.test",
                         text_body=r.text))
    for r in rows[10:20]
]
spark.createDataFrame(mail, "media_id bigint, payload binary") \
    .write.mode("overwrite").parquet(out + "/mail_mixed")
EOF

# 1. Budget first (sniff-only census), then ONE decryption-aware
#    verb for the whole mixed column: magic-byte dispatch across
#    THIRTEEN formats + the encryption census (none / standard /
#    agile / xls_rc4 / locked)
minerva-spark media office-decrypt \
  --input "$OUT/mixed" --output "$OUT/extracted" --on-error skip

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

# 2b. The mixed desktop-mail path: one verb for eml + .msg together
minerva-spark media mail-text \
  --input "$OUT/mail_mixed" --output "$OUT/mail_mixed_text"

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
    .filter("text IS NOT NULL") \
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
  --vocab-size 256 --max-piece-len 5 --iters 2 \
  --byte-fallback --text-col kept_text

echo "office demo complete:"
echo "  mail mixed -> $OUT/mail_mixed_text (eml + .msg, one verb)"
echo "  extracted  -> $OUT/extracted (format,title,text per payload)"
echo "  mail       -> $OUT/mail_text"
echo "  c4 report  -> $OUT/c4_report (per-rule attrition)"
echo "  deduped    -> $OUT/deduped"
echo "  tokenized  -> $OUT/tokenized (+ _vocab sidecar)"
