"""Gate rows: office/document/mail extraction arc.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table

from minerva_etl_spark.gate_common import (
    _ascii_sanitize,
    _ascii_sanitize_sql,
    _media_fixture_staged,
    _prep,
)



def q_rtf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RTF text extraction (`operators/rtf.py::rtf_extract` —
    the legacy rich-text edge, r12): each doc becomes a conformant
    RTF — font/color tables, an ``\\info`` title group and a ``{\\*``
    generator destination that must NOT leak into text, the header +
    sanitized-text paragraphs joined by ``\\par`` — with every 3rd doc
    writing EVERY space as the cp1252 hex escape ``\\'20`` (the
    control-symbol path on every word boundary).  The oracle rebuilds
    paragraph count, text and char count closed-form; a group-stack,
    control-word, hex-decode, or destination-skip bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.rtf import (
        rtf_extract,
        synthesize_rtf,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                rows.append(
                    (
                        d,
                        synthesize_rtf(
                            [f"Doc {d} report", t],
                            title=f"Doc {d}",
                            hex_escape_spaces=(d % 3 == 0),
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "rtf",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return rtf_extract(payloads)


_ORACLE_RTF_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
),
built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || CASE WHEN length(text) > 0
                THEN chr(10) || text ELSE '' END AS text,
         CASE WHEN length(text) > 0 THEN 2 ELSE 1 END AS n_paragraphs
  FROM san
)
SELECT doc_id, CAST(n_paragraphs AS INT) AS n_paragraphs, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_eml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL email extraction (`operators/email_ingest.py::
    eml_extract` — the mail-corpus ingest edge, r12): each doc becomes
    an RFC 5322 message cycling the four real-world MIME shapes by
    doc_id % 4 — single-part plain (7bit), multipart/alternative
    plain+html-decoy (quoted-printable; plain must win), HTML-only
    (base64; the engine's HTML extractor must recover the text), and
    multipart/mixed plain+attachment (the attachment counts a part,
    contributes no text) — with every 5th subject RFC 2047 Q-encoded.
    The oracle rebuilds subject/sender/part-count/text closed-form; a
    MIME-walk, transfer-decoding, alternative-preference, or
    encoded-word bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.email_ingest import (
        eml_extract,
        synthesize_eml,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                kw = dict(
                    subject=f"Doc {d} mail",
                    sender=f"user{d}@corpus.test",
                    q_encode_subject=(d % 5 == 0),
                )
                if d % 4 == 0:
                    payload = synthesize_eml(text_body=t, **kw)
                elif d % 4 == 1:
                    payload = synthesize_eml(
                        text_body=t,
                        html_body="<p>html decoy</p>",
                        cte="quoted-printable",
                        **kw,
                    )
                elif d % 4 == 2:
                    payload = synthesize_eml(
                        html_body=f"<p>{t}</p>", cte="base64", **kw
                    )
                else:
                    payload = synthesize_eml(
                        text_body=t, attachment=b"\x00\x01bin", **kw
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "eml",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return eml_extract(payloads)


_ORACLE_EML_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' mail' AS subject,
       'user' || CAST(doc_id AS VARCHAR) || '@corpus.test' AS sender,
       CAST(CASE WHEN doc_id % 4 IN (1, 3) THEN 2 ELSE 1 END AS INT)
         AS n_parts,
       text,
       CAST(length(text) AS INT) AS n_chars
FROM san
"""


def q_mbox_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MBOX mailbox split + extraction (`operators/email_ingest.py::
    mbox_split` → `eml_extract`): each doc becomes an mbox holding
    ``1 + doc_id % 3`` messages (message k's subject indexes it; the
    body is the doc text, so a ``From``-separator or ``>From``
    unescape bug corrupts text), split into per-message rows inside
    one Arrow task, then parsed.  The oracle regenerates every
    exploded message row closed-form with generate_series."""
    _prep(spark)
    from minerva_etl_spark.operators.email_ingest import (
        eml_extract,
        mbox_split,
        synthesize_eml,
        synthesize_mbox,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                msgs = [
                    synthesize_eml(
                        subject=f"Doc {d} msg {k}",
                        sender=f"user{d}@corpus.test",
                        text_body=t,
                    )
                    for k in range(1 + d % 3)
                ]
                rows.append((d, synthesize_mbox(msgs)))
            yield pd.DataFrame(rows, columns=["mbox_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "mbox",
        lambda: docs.mapInPandas(synth, "mbox_id bigint, payload binary"),
    )
    messages = mbox_split(payloads)
    # composite message key (msg_index < 3 < 10) so the extractor's
    # single-id contract carries both identifiers through the parse
    keyed = messages.select(
        (F.col("mbox_id") * 10 + F.col("msg_index")).alias("mkey"),
        "payload",
    )
    return eml_extract(keyed, id_col="mkey").select(
        F.expr("mkey div 10").alias("mbox_id"),
        F.expr("CAST(mkey % 10 AS INT)").alias("msg_index"),
        "subject",
        "sender",
        "text",
        "n_chars",
    )


_ORACLE_MBOX_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id AS mbox_id, CAST(gs.k AS INT) AS msg_index,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' msg '
         || CAST(gs.k AS VARCHAR) AS subject,
       'user' || CAST(doc_id AS VARCHAR) || '@corpus.test' AS sender,
       text,
       CAST(length(text) AS INT) AS n_chars
FROM san
CROSS JOIN UNNEST(generate_series(0, doc_id % 3)) AS gs(k)
"""


def q_pipeline_office(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused MIXED-FORMAT office-delivery pipeline — the
    `pipeline_document` shape with the r12 dispatch edge in the
    middle: documents become real PDFs / DOCX / EPUBs (doc_id % 3),
    packed as members of real zip / tar.gz archives written by owning
    tasks, harvested back (`read_archives`), routed per payload by
    MAGIC BYTES (`office_extract` — file extensions are deliberately
    decorative), token-counted, and filtered to ≥ 30 tokens — five
    operators in one lineage with zero driver round-trips between
    stages.  The oracle replays the survivors closed-form per format;
    any stage breaking — archive member bytes, format sniffing, any of
    the three codecs, tokenizing, filtering — shifts the hash."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.epub import synthesize_epub
    from minerva_etl_spark.operators.office import office_extract
    from minerva_etl_spark.operators.pdf import synthesize_pdf
    from minerva_etl_spark.operators.text import with_token_count
    from minerva_etl_spark.sources.archive import (
        read_archives,
        write_archives,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                if d % 3 == 0:
                    payload = synthesize_pdf(
                        [f"Doc {d} report", t], title=f"Doc {d}"
                    )
                    ext = "pdf"
                elif d % 3 == 1:
                    payload = synthesize_docx(
                        [f"Doc {d} report", t], title=f"Doc {d}"
                    )
                    ext = "docx"
                else:
                    payload = synthesize_epub(
                        [f"<p>Doc {d} report</p>", f"<p>{t}</p>"],
                        title=f"Doc {d}",
                    )
                    ext = "epub"
                shard = d % 6
                arc = "zip" if shard % 2 == 0 else "tar.gz"
                rows.append(
                    (f"shard-{shard}.{arc}", f"doc_{d:06d}.{ext}", payload)
                )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "content"]
            )

    staged = docs.mapInPandas(
        synth, "archive string, member string, content binary"
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_officepipe_")
    write_archives(staged, root).collect()
    members = read_archives(spark, root).select(
        F.regexp_extract("member", r"doc_(\d+)\.", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    out = (
        with_token_count(office_extract(members))
        .where(F.col("n_tokens") >= 30)
        .select("doc_id", "format", "title", "text", "n_tokens")
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_pipeline_office() -> str:
    from minerva_etl_spark.operators.text import tokens_duck_sql

    toks = tokens_duck_sql("text")
    return f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS s FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
              ELSE 'epub' END AS format,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || CASE WHEN doc_id % 3 = 0 THEN chr(10) || chr(10)
                   ELSE chr(10) END
           || s AS text
  FROM san
), counted AS (
  SELECT doc_id, format, text,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM built
)
SELECT doc_id, format,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       text, n_tokens
FROM counted WHERE n_tokens >= 30
"""


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PDF text extraction (`operators/pdf.py::pdf_extract`):
    each doc becomes a real two-page PDF synthesized in-task — page 1
    a fixed header line, page 2 the sanitized doc text, /Title in the
    Info dict — with the CONTAINER cycling doc_id % 3 over the three
    real-world layouts: 0 → PDF 1.5 ObjStm + cross-reference stream
    (the post-2005 majority shape, r11), 1 → PDF 1.4 plain streams,
    2 → PDF 1.4 FlateDecode streams — and every fifth non-ObjStm doc
    additionally ENCRYPTED under the standard security handler with
    an empty user password, cycling ALL FOUR supported revisions
    (RC4-40 / RC4-128 / AESV2 / AES-256-R6 — the "owner-restricted"
    crawl class, r11), and every seventh doc written in the
    CID/Type0 COMPOSITE-FONT layout (Identity-H, 2-byte code show
    strings, a real /ToUnicode CMap with bfchar + bfrange entries —
    the CJK/modern-generator shape, r12) — then parsed back through
    the full chain: binary-safe object scan, key derivation (md5
    ladder or the 2.B SHA-2 KDF) + password verify + per-object
    RC4/AES-CBC, /ObjStm expansion, page-tree walk, zlib inflate,
    font resolution + CMap decode, Tj tokenizing with literal-string
    unescaping.
    The oracle rebuilds title, page join, and char count closed-form
    and is container- and encryption-blind by design; a bug in ANY
    stage (xref/object boundaries, ObjStm offset table, key
    derivation, Flate dispatch, string escapes, page order)
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.pdf import (
        pdf_extract,
        synthesize_pdf,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                rows.append(
                    (
                        d,
                        synthesize_pdf(
                            [f"Doc {d} report", t],
                            title=f"Doc {d}",
                            compress=(d % 3 == 2),
                            objstm=(d % 3 == 0),
                            encrypt=(d % 3 != 0 and d % 5 == 0),
                            encrypt_r=(2, 3, 4, 6)[(d // 5) % 4],
                            # every 7th doc uses the CID/Type0
                            # composite-font layout (r12) — across
                            # ObjStm, plain, Flate, and encrypted
                            # containers; same text, so the oracle
                            # stays container- and font-blind
                            type0=(d % 7 == 0),
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "pdf",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )  # staged like the media fixtures: the row times EXTRACTION
    return pdf_extract(payloads)


def q_docx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DOCX text extraction (`operators/docx.py::docx_extract` —
    the office-corpus ingest edge, r12): each doc becomes a conformant
    OOXML package synthesized in-task — paragraph 1 a fixed header,
    paragraph 2 the sanitized doc text split across ``1 + d % 4`` runs
    (extraction must be run-split-invariant), every 5th doc a third
    paragraph carrying a structural ``w:tab``, every 3rd doc a 2×2
    ``w:tbl`` (cells TAB-joined, rows NEWLINE-joined), ``dc:title`` in
    core.xml, zip entries stored (even ids) or deflated (odd) — then
    parsed back through the stdlib zip + WordprocessingML walk.  The
    oracle rebuilds title, block joins and char count closed-form; a
    bug in the run/tab/br walk, table traversal, body ordering, or
    core-properties read hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.docx import (
        docx_extract,
        synthesize_docx,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                paras = [f"Doc {d} report", t]
                if d % 5 == 0:
                    paras.append(f"tab{d}\tcol")
                rows.append(
                    (
                        d,
                        synthesize_docx(
                            paras,
                            title=f"Doc {d}",
                            table=(
                                [
                                    [f"T{d} r0c0", f"T{d} r0c1"],
                                    [f"T{d} r1c0", f"T{d} r1c1"],
                                ]
                                if d % 3 == 0 else None
                            ),
                            runs_per_para=1 + d % 4,
                            compress=(d % 2 == 1),
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "docx",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return docx_extract(payloads)


_ORACLE_DOCX_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
),
built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(10) || text
           || CASE WHEN doc_id % 5 = 0
                THEN chr(10) || 'tab' || CAST(doc_id AS VARCHAR)
                     || chr(9) || 'col'
                ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                THEN chr(10)
                     || 'T' || CAST(doc_id AS VARCHAR) || ' r0c0'
                     || chr(9)
                     || 'T' || CAST(doc_id AS VARCHAR) || ' r0c1'
                     || chr(10)
                     || 'T' || CAST(doc_id AS VARCHAR) || ' r1c0'
                     || chr(9)
                     || 'T' || CAST(doc_id AS VARCHAR) || ' r1c1'
                ELSE '' END AS text
  FROM san
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(2 + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT)
         AS n_paragraphs,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT)
         AS n_tables,
       text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL EPUB text extraction (`operators/epub.py::epub_extract` —
    the e-book corpus ingest edge, r12): each doc becomes a conformant
    EPUB synthesized in-task — OCF stored-mimetype-first zip,
    container.xml → OPF, a header chapter + the sanitized doc text
    chapter (+ a trailer chapter on even ids), ``dc:title`` and the
    doc's OWN ``lang`` column as ``dc:language``, the MANIFEST written
    in reverse chapter order so only a correct SPINE walk extracts in
    reading order, entries stored (ids ≡ 0 mod 3) or deflated — then
    parsed back through the stdlib container→OPF→spine→XHTML chain
    with chapter bodies through the engine's one HTML extractor.  The
    oracle rebuilds title, language, chapter joins and char count
    closed-form; a spine-order, manifest-resolution, metadata, or
    HTML-walk bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.epub import (
        epub_extract,
        synthesize_epub,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                chapters = [
                    f"<p>Doc {d} report</p>",
                    f"<p>{t}</p>",
                ]
                if d % 2 == 0:
                    chapters.append(f"<p>end {d}</p>")
                rows.append(
                    (
                        d,
                        synthesize_epub(
                            chapters,
                            title=f"Doc {d}",
                            language=str(lang),
                            compress=(d % 3 != 0),
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "epub",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return epub_extract(payloads)


_ORACLE_EPUB_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, lang, {_ascii_sanitize_sql('text')} AS text
  FROM documents
),
built AS (
  SELECT doc_id, lang,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(10) || text
           || CASE WHEN doc_id % 2 = 0
                THEN chr(10) || 'end ' || CAST(doc_id AS VARCHAR)
                ELSE '' END AS text
  FROM san
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       lang AS language,
       CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT)
         AS n_chapters,
       text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_office_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED-FORMAT document extraction (`operators/office.py::
    office_extract` — the dispatch edge over the document codecs;
    r13 extends the cycle per the r12 verdict's ask 2): one binary
    column cycles doc_id % 6 over a real PDF (plain 1.4), a real DOCX
    (deflated OOXML), a real EPUB (spine-walked OCF), a real XLSX
    (shared + inline strings), a real PPTX (DrawingML runs), and a
    real legacy .doc (CFB container, two-piece cp1252/UTF-16 piece
    table) carrying the same header + sanitized-text content;
    magic-byte sniffing routes each payload in-task and the unified
    ``(format, title, text, n_chars)`` schema comes back.  The oracle
    rebuilds all six formats' text closed-form (they differ only in
    the codec-specific page/paragraph/sheet/slide join), so a
    sniffing, routing, or any-codec regression hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.epub import synthesize_epub
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.office import office_extract
    from minerva_etl_spark.operators.pdf import synthesize_pdf
    from minerva_etl_spark.operators.pptx import synthesize_pptx
    from minerva_etl_spark.operators.xlsx import synthesize_xlsx

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                head = f"Doc {d} report"
                if d % 6 == 0:
                    payload = synthesize_pdf(
                        [head, t], title=f"Doc {d}"
                    )
                elif d % 6 == 1:
                    payload = synthesize_docx(
                        [head, t], title=f"Doc {d}"
                    )
                elif d % 6 == 2:
                    payload = synthesize_epub(
                        [f"<p>{head}</p>", f"<p>{t}</p>"],
                        title=f"Doc {d}",
                    )
                elif d % 6 == 3:
                    payload = synthesize_xlsx(
                        [("Data", [[head], [t]])], title=f"Doc {d}"
                    )
                elif d % 6 == 4:
                    payload = synthesize_pptx(
                        [[head, t]], title=f"Doc {d}"
                    )
                else:
                    payload = synthesize_doc([head, t])
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "office",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_extract(payloads)


_ORACLE_OFFICE_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 6 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
              WHEN 2 THEN 'epub' WHEN 3 THEN 'xlsx'
              WHEN 4 THEN 'pptx' ELSE 'doc' END AS format,
         CASE WHEN doc_id % 6 = 5 THEN NULL
              ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
         -- pdf: pages join with a blank line; xlsx prefixes the
         -- sheet name row; all others join head/body with one LF
         CASE WHEN doc_id % 6 = 3 THEN 'Data' || chr(10) ELSE '' END
           || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || CASE WHEN doc_id % 6 = 0 THEN chr(10) || chr(10)
                   ELSE chr(10) END
           || text AS text
  FROM san
)
SELECT doc_id, format, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_office_decrypt_default(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEFAULT-PASSWORD office decryption (`operators/offcrypto.py` +
    `office.py::office_decrypt_extract`, r15 — the r14 verdict's ask
    3): one binary column cycles doc_id % 7 over a plain DOCX, an
    ECMA-376-STANDARD-encrypted DOCX and XLSX under Excel's implicit
    ``VelvetSweatshop`` password (MS-OFFCRYPTO §2.3.4 — 50 000-round
    SHA-1 spin, AES-128-ECB package), an AGILE-encrypted DOCX (§
    2.3.4.10 — the 4.4 XML descriptor, SHA-512 spin + purpose block
    keys, AES-256-CBC segments: what Office 2010+ writes for the
    same default), a BIFF8 .xls under Office-97 RC4 (§2.3.6 — MD5
    key base, per-1024-block rekeying, record-aware byte map), a
    Word-97 .doc under the same RC4 scheme (fEncrypted + table-
    stream EncryptionHeader, 512-byte rekey blocks), and one OOXML
    encrypted with a REAL password.  The operator verifies, decrypts
    and extracts the first six in-task and census-tags the seventh
    ``locked`` with NULL text — the oracle rebuilds every leg's
    format/encryption/text closed-form, so a key-derivation, AES,
    RC4, verifier, or census bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_doc_rc4,
        encrypt_ooxml,
        encrypt_ooxml_agile,
        encrypt_xls_rc4,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls
    from minerva_etl_spark.operators.xlsx import synthesize_xlsx

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                head = f"Doc {d} report"
                # fixed seeds keep the fixture deterministic AND let
                # the per-worker (password, salt) key cache absorb
                # the 50k/100k-round spins (one per leg, not per doc)
                if d % 7 == 0:
                    payload = synthesize_docx(
                        [head, t], title=f"Doc {d}"
                    )
                elif d % 7 == 1:
                    payload = encrypt_ooxml(
                        synthesize_docx([head, t], title=f"Doc {d}"),
                        seed=b"gate-r15-docx",
                    )
                elif d % 7 == 2:
                    payload = encrypt_ooxml(
                        synthesize_xlsx(
                            [("Data", [[head], [t]])],
                            title=f"Doc {d}",
                        ),
                        seed=b"gate-r15-xlsx",
                    )
                elif d % 7 == 3:
                    payload = encrypt_ooxml_agile(
                        synthesize_docx([head, t], title=f"Doc {d}"),
                        seed=b"gate-r15-agile",
                    )
                elif d % 7 == 4:
                    payload = encrypt_xls_rc4(
                        synthesize_xls(
                            [("Data", [[head], [t]])],
                            title=f"Doc {d}",
                        ),
                        seed=b"gate-r15-xls",
                    )
                elif d % 7 == 5:
                    payload = encrypt_doc_rc4(
                        synthesize_doc([head, t], title=f"Doc {d}"),
                        seed=b"gate-r15-doc",
                    )
                else:
                    # fixed non-default password: the verifier-reject
                    # path is per-payload either way, and a fixed key
                    # keeps the fixture's spin cost cache-bounded
                    payload = encrypt_ooxml(
                        synthesize_docx([head, t]),
                        password="real-secret",
                        seed=b"gate-r15-locked",
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "offdec7",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_decrypt_extract(payloads)


_ORACLE_OFFICE_DECRYPT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 7 WHEN 2 THEN 'xlsx' WHEN 4 THEN 'xls'
              WHEN 5 THEN 'doc'
              WHEN 6 THEN 'ooxml_encrypted' ELSE 'docx' END AS format,
         CASE doc_id % 7 WHEN 0 THEN 'none'
              WHEN 3 THEN 'ecma376_agile'
              WHEN 4 THEN 'xls_rc4'
              WHEN 5 THEN 'doc_rc4'
              WHEN 6 THEN 'locked'
              ELSE 'ecma376_standard' END AS encryption,
         CASE WHEN doc_id % 7 = 6 THEN NULL
              ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
         CASE WHEN doc_id % 7 = 6 THEN NULL
              ELSE
                CASE WHEN doc_id % 7 IN (2, 4)
                     THEN 'Data' || chr(10) ELSE '' END
                || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
                || chr(10) || text
         END AS text
  FROM san
)
SELECT doc_id, format, encryption, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_xls_decrypt_velvet(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BIFF8 RC4 decryption across BLOCK boundaries
    (`offcrypto.decrypt_xls_rc4`, r15): every doc becomes a .xls
    whose Workbook stream spans SEVERAL 1024-byte RC4 blocks (24
    two-cell rows per sheet, two sheets, every string unique) before
    ``VelvetSweatshop`` encryption — so the per-block MD5 rekeying,
    the keystream positions of records STRADDLING a block edge, the
    plaintext ``BoundSheet8.lbPlyPos`` fix-ups, and the OLEPS title
    pass-through (metadata is never encrypted in this scheme) are all
    hash-load-bearing.  The oracle rebuilds the full sheet rendering
    closed-form."""
    _prep(spark)
    from minerva_etl_spark.operators.offcrypto import encrypt_xls_rc4
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                sheets = [
                    (
                        name,
                        [
                            [f"{name} r{i} doc {d}", str(d * i + k)]
                            for i in range(24)
                        ],
                    )
                    for k, name in ((1, "Data"), (2, "Notes"))
                ]
                payload = encrypt_xls_rc4(
                    synthesize_xls(sheets, title=f"Velvet {d}"),
                    seed=b"gate-r15-velvet",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "velvet",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_decrypt_extract(payloads)


_ORACLE_XLS_VELVET = """
WITH r AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS i
  FROM documents, UNNEST(generate_series(0, 23)) AS t(i)
), sheet AS (
  SELECT doc_id, s.name, s.k,
         string_agg(
           s.name || ' r' || CAST(i AS VARCHAR) || ' doc '
             || CAST(doc_id AS VARCHAR) || chr(9)
             || CAST(doc_id * i + s.k AS VARCHAR),
           chr(10) ORDER BY i) AS body
  FROM r, (VALUES ('Data', 1), ('Notes', 2)) AS s(name, k)
  GROUP BY doc_id, s.name, s.k
), built AS (
  SELECT doc_id,
         string_agg(name || chr(10) || body, chr(10) ORDER BY k)
           AS text
  FROM sheet GROUP BY doc_id
)
SELECT doc_id, 'xls' AS format, 'xls_rc4' AS encryption,
       'Velvet ' || CAST(doc_id AS VARCHAR) AS title,
       text, CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_office_decrypt_cryptoapi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r16 decrypt matrix — the schemes the r15 verdict named as
    the last mainstream locked slices (`operators/offcrypto.py`):
    one binary column cycles doc_id % 7 over a BIFF8 .xls under RC4
    CryptoAPI (MS-OFFCRYPTO §2.3.5 — SHA-1 block keys, FilePass
    version 2.2, 128-bit), a Word-97 .doc under the same CryptoAPI
    scheme (table-stream header, 512-byte blocks), a 40-bit
    export-grade CryptoAPI .xls (the zero-pad-to-16 key rule), an
    XOR-obfuscated .xls (§2.3.7 Method 1 — the published
    InitialCode/XorMatrix tables), an AGILE docx with the OFFICE
    2010 parameter set (SHA-1 spin + AES-128-CBC, the r15 advice's
    medium finding), a PowerPoint deck under MS-PPT's
    persist-object RC4 CryptoAPI (Current User token, persist
    directory, block = persist id), and a CryptoAPI .xls under a
    REAL password that must stay a ``locked`` census row.  All under
    ``VelvetSweatshop`` except the locked leg; the oracle rebuilds
    every leg's format/encryption/text closed-form, so a SHA-1
    derivation, 40-bit pad, XOR table, rotate direction, agile
    parameter, persist-map, or census bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_doc_rc4_cryptoapi,
        encrypt_ooxml_agile,
        encrypt_ppt_rc4,
        encrypt_xls_rc4_cryptoapi,
        encrypt_xls_xor,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.ppt import synthesize_ppt
    from minerva_etl_spark.operators.xls import synthesize_xls

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                head = f"Doc {d} report"
                xls = lambda: synthesize_xls(  # noqa: E731
                    [("Data", [[head], [t]])], title=f"Doc {d}"
                )
                # fixed seeds: the per-worker (password, salt) caches
                # absorb the key spins (one per leg, not per doc)
                if d % 7 == 0:
                    payload = encrypt_xls_rc4_cryptoapi(
                        xls(), seed=b"gate-r16-xlsca"
                    )
                elif d % 7 == 1:
                    payload = encrypt_doc_rc4_cryptoapi(
                        synthesize_doc([head, t], title=f"Doc {d}"),
                        seed=b"gate-r16-docca",
                    )
                elif d % 7 == 2:
                    payload = encrypt_xls_rc4_cryptoapi(
                        xls(), seed=b"gate-r16-xls40", key_bits=40
                    )
                elif d % 7 == 3:
                    payload = encrypt_xls_xor(xls())
                elif d % 7 == 4:
                    payload = encrypt_ooxml_agile(
                        synthesize_docx([head, t], title=f"Doc {d}"),
                        seed=b"gate-r16-agile2010",
                        hash_alg="SHA1", key_bits=128, spin=5_000,
                    )
                elif d % 7 == 5:
                    payload = encrypt_ppt_rc4(
                        synthesize_ppt([[head, t]], title=f"Doc {d}"),
                        seed=b"gate-r16-pptca",
                    )
                else:
                    payload = encrypt_xls_rc4_cryptoapi(
                        xls(), seed=b"gate-r16-locked",
                        password="real-secret",
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "offdec16b",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_decrypt_extract(payloads)


_ORACLE_OFFICE_DECRYPT_CA = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 7 WHEN 1 THEN 'doc' WHEN 4 THEN 'docx'
              WHEN 5 THEN 'ppt' ELSE 'xls' END AS format,
         CASE doc_id % 7 WHEN 0 THEN 'xls_rc4_cryptoapi'
              WHEN 1 THEN 'doc_rc4_cryptoapi'
              WHEN 2 THEN 'xls_rc4_cryptoapi'
              WHEN 3 THEN 'xls_xor'
              WHEN 4 THEN 'ecma376_agile'
              WHEN 5 THEN 'ppt_rc4_cryptoapi'
              ELSE 'locked' END AS encryption,
         CASE WHEN doc_id % 7 = 6 THEN NULL
              ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
         CASE WHEN doc_id % 7 = 6 THEN NULL
              ELSE
                CASE WHEN doc_id % 7 IN (1, 4, 5) THEN ''
                     ELSE 'Data' || chr(10) END
                || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
                || chr(10) || text
         END AS text
  FROM san
)
SELECT doc_id, format, encryption, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_odf_decrypt_password(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUPPLIED-password OpenDocument decryption (`operators/odf.py`
    ::decrypt_odf + `operators/blowfish.py`, r16 — the r15 verdict's
    ask 5): one binary column cycles doc_id % 4 over a
    Blowfish-CFB-encrypted .odt (the legacy OOo profile: PBKDF2 over
    a SHA-1 start key, 8-bit-feedback Blowfish, SHA1/1K checksum),
    an AES-256-CBC .ods (the ODF 1.2 profile: SHA-256 start key,
    xmlenc padding, sha256-1k checksum), a Blowfish .odp, and an
    .odt under a DIFFERENT password that must stay a ``locked``
    census row — all through `office_decrypt_extract` with the
    password supplied (ODF has no default-password convention).  The
    oracle rebuilds every leg closed-form, so a PBKDF2, Blowfish
    table, CFB feedback, padding, checksum, or census bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.odf import (
        encrypt_odf,
        synthesize_odp,
        synthesize_ods,
        synthesize_odt,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                # truncated body: the CFB-8 fixture ENCRYPT side is
                # per-byte Python (decrypt is vectorized), so the
                # one-time staging cost stays bounded
                t = _ascii_sanitize(str(t))[:120]
                head = f"Doc {d} report"
                if d % 4 == 0:
                    payload = encrypt_odf(
                        synthesize_odt([head, t], title=f"Doc {d}"),
                        "corp-r16", seed=b"gate-r16-odt",
                    )
                elif d % 4 == 1:
                    payload = encrypt_odf(
                        synthesize_ods(
                            [("Data", [[head], [t]])],
                            title=f"Doc {d}",
                        ),
                        "corp-r16", cipher="aes256",
                        seed=b"gate-r16-ods",
                    )
                elif d % 4 == 2:
                    payload = encrypt_odf(
                        synthesize_odp([[head, t]], title=f"Doc {d}"),
                        "corp-r16", seed=b"gate-r16-odp",
                    )
                else:
                    payload = encrypt_odf(
                        synthesize_odt([head, t]),
                        "other-pass", seed=b"gate-r16-lockedodf",
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "odfdec",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_decrypt_extract(payloads, password="corp-r16")


_ORACLE_ODF_DECRYPT = f"""
WITH san AS (
  SELECT doc_id,
         substr({_ascii_sanitize_sql('text')}, 1, 120) AS text
  FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 1 THEN 'ods' WHEN 2 THEN 'odp'
              ELSE 'odt' END AS format,
         CASE doc_id % 4 WHEN 1 THEN 'odf_aes'
              WHEN 3 THEN 'locked'
              ELSE 'odf_blowfish' END AS encryption,
         CASE WHEN doc_id % 4 = 3 THEN NULL
              ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
         CASE WHEN doc_id % 4 = 3 THEN NULL
              ELSE
                CASE WHEN doc_id % 4 = 1
                     THEN 'Data' || chr(10) ELSE '' END
                || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
                || chr(10) || text
         END AS text
  FROM san
)
SELECT doc_id, format, encryption, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_xlsb_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel BINARY workbook extraction (`operators/xlsb.py`, r15 —
    the big-workbook format the matrix lacked): every doc becomes a
    real two-sheet .xlsb whose BIFF12 record streams exercise shared
    (BrtCellIsst) AND inline (BrtCellSt) strings, RK and Real
    numeric cells, BrtCellBool — with the workbook bundle wired in
    REVERSE rId order so extraction order provably follows the
    BrtBundleSh list, and a docProps/core.xml title.  The oracle
    rebuilds the sheet/TAB/LF rendering closed-form (the `xls.py`
    contract: one SQL covers both Excel generations)."""
    _prep(spark)
    from minerva_etl_spark.operators.xlsb import (
        synthesize_xlsb,
        xlsb_extract,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_xlsb(
                    [
                        ("Data", [[f"Doc {d} report", str(d * 7),
                                   "TRUE"],
                                  [t, str(-(d % 13))]]),
                        ("Notes", [[f"note block {d % 5}"]]),
                    ],
                    title=f"Doc {d}",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "xlsb",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return xlsb_extract(payloads)


#: identical rendering contract to BIFF8 — the same closed form
#: covers both Excel generations (a shared bug would have to corrupt
#: two unrelated record framings identically to stay green)
_ORACLE_XLSB_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'Data' || chr(10)
           || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(9) || CAST(doc_id * 7 AS VARCHAR)
           || chr(9) || 'TRUE' || chr(10)
           || text || chr(9) || CAST(-(doc_id % 13) AS VARCHAR)
           || chr(10)
           || 'Notes' || chr(10) || 'note block '
           || CAST(doc_id % 5 AS VARCHAR) AS text
  FROM san
)
SELECT doc_id, title, CAST(2 AS INT) AS n_sheets,
       CAST(3 AS INT) AS n_rows, CAST(6 AS INT) AS n_cells,
       text, CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_odf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenDocument extraction (`operators/odf.py`, r15 — the
    LibreOffice/OpenOffice slice the office matrix lacked): one
    binary column cycles doc_id % 3 over a real .odt (text:p
    paragraphs), a real .ods (table walk, float cells via lexical
    office:value), and a real .odp (draw:page frames) — each a
    conformant OCF zip with the STORED-first mimetype member and a
    meta.xml title — routed through the mixed-format dispatcher.
    The oracle rebuilds all three renderings closed-form, so a
    sniff, namespace-walk, cell-type, or page-order bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.odf import (
        synthesize_odp,
        synthesize_ods,
        synthesize_odt,
    )
    from minerva_etl_spark.operators.office import office_extract

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                head = f"Doc {d} report"
                if d % 3 == 0:
                    payload = synthesize_odt(
                        [head, t], title=f"Doc {d}"
                    )
                elif d % 3 == 1:
                    payload = synthesize_ods(
                        [("Data", [[head], [t]])], title=f"Doc {d}"
                    )
                else:
                    payload = synthesize_odp(
                        [[head, t]], title=f"Doc {d}"
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "odf",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return office_extract(payloads)


_ORACLE_ODF_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'odt' WHEN 1 THEN 'ods'
              ELSE 'odp' END AS format,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         CASE WHEN doc_id % 3 = 1 THEN 'Data' || chr(10) ELSE '' END
           || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(10) || text AS text
  FROM san
)
SELECT doc_id, format, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_xlsx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpreadsheetML extraction (`operators/xlsx.py::xlsx_extract`,
    r13 — the r12 verdict's ask 2): every doc becomes a real two-sheet
    XLSX whose workbook wires relationship ids in REVERSE (extraction
    order must come from the workbook sheet list, not rIds or zip
    order), with a numeric cell (raw lexical form), shared-string
    cells (the second as TWO rich-text runs) and an inline-string
    cell — both string mechanisms on every row.  The oracle rebuilds
    the sheet-name/TAB/NEWLINE rendering closed-form; a sheet-order,
    cell-type, shared-index or rich-run bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.xlsx import (
        synthesize_xlsx,
        xlsx_extract,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_xlsx(
                    [
                        ("Data", [[f"Doc {d} report", str(d * 7)], [t]]),
                        ("Notes", [[f"note block {d % 5}"]]),
                    ],
                    title=f"Doc {d}",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "xlsx",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return xlsx_extract(payloads)


_ORACLE_XLSX_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'Data' || chr(10)
           || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(9) || CAST(doc_id * 7 AS VARCHAR) || chr(10)
           || text || chr(10)
           || 'Notes' || chr(10) || 'note block '
           || CAST(doc_id % 5 AS VARCHAR) AS text
  FROM san
)
SELECT doc_id, title, CAST(2 AS INT) AS n_sheets,
       CAST(3 AS INT) AS n_rows, CAST(4 AS INT) AS n_cells,
       text, CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_pptx_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PresentationML extraction (`operators/pptx.py::pptx_extract`,
    r13): every doc becomes a real two-slide deck — slide 1 carries a
    header paragraph plus the sanitized body split across DrawingML
    runs, slide 2 a closing line — and decks with doc_id % 4 == 0 get
    TEN filler slides appended so slide10+ proves numeric (not
    lexicographic) slide ordering on every fourth row.  The oracle
    rebuilds the paragraph/slide NEWLINE rendering closed-form."""
    _prep(spark)
    from minerva_etl_spark.operators.pptx import (
        pptx_extract,
        synthesize_pptx,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                slides = [[f"Doc {d} deck", t], [f"closing {d % 7}"]]
                if d % 4 == 0:
                    slides += [
                        [f"filler {d} {i}"] for i in range(3, 13)
                    ]
                rows.append((d, synthesize_pptx(slides,
                                                title=f"Doc {d}")))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "pptx",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return pptx_extract(payloads)


_ORACLE_PPTX_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), filler AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN
           (SELECT string_agg(chr(10) || 'filler '
                    || CAST(doc_id AS VARCHAR) || ' '
                    || CAST(gs.i AS VARCHAR), '' ORDER BY gs.i)
            FROM UNNEST(generate_series(3, 12)) AS gs(i))
         ELSE '' END AS tail,
         CASE WHEN doc_id % 4 = 0 THEN 12 ELSE 2 END AS n_slides,
         CASE WHEN doc_id % 4 = 0 THEN 13 ELSE 3 END AS n_paragraphs
  FROM san
), built AS (
  SELECT s.doc_id,
         'Doc ' || CAST(s.doc_id AS VARCHAR) AS title,
         f.n_slides, f.n_paragraphs,
         'Doc ' || CAST(s.doc_id AS VARCHAR) || ' deck' || chr(10)
           || s.text || chr(10)
           || 'closing ' || CAST(s.doc_id % 7 AS VARCHAR)
           || f.tail AS text
  FROM san s JOIN filler f ON s.doc_id = f.doc_id
)
SELECT doc_id, title, CAST(n_slides AS INT) AS n_slides,
       CAST(n_paragraphs AS INT) AS n_paragraphs, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_doc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy Word-97 .doc extraction (`operators/msdoc.py::
    doc_extract`, r13 — the r12 verdict's ask 6): every doc becomes a
    REAL CFB compound file (header, FAT, directory, padded streams)
    whose WordDocument stream carries a spec-shaped FIB and whose
    0Table stream carries a two-piece CLX piece table — piece 1
    cp1252 ("compressed" fc), piece 2 UTF-16LE — so BOTH decode
    paths run on every row; paragraphs are \\r-joined Word text and
    the title rides a real \\x05SummaryInformation property set.
    The oracle rebuilds the paragraph rendering closed-form; a FAT
    walk, directory, FIB offset, piece-table or encoding bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.msdoc import (
        doc_extract,
        synthesize_doc,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_doc(
                    [f"Doc {d} report", t, f"tail {d % 9}"],
                    title=f"Doc {d}",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "msdoc",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return doc_extract(payloads)


_ORACLE_DOC_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report' || chr(10)
           || text || chr(10)
           || 'tail ' || CAST(doc_id % 9 AS VARCHAR) AS text
  FROM san
)
SELECT doc_id, 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       CAST(2 AS INT) AS n_pieces, CAST(3 AS INT) AS n_paragraphs,
       text, CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_xls_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy Excel BIFF8 extraction (`operators/xls.py::xls_extract`,
    r13 — the legacy-office triple's spreadsheet leg): every doc
    becomes a real two-sheet .xls inside a real CFB container — the
    SST mixes compressed and forced-UTF-16 strings, integer cells
    alternate RK and Number records, a TRUE BoolErr rides every row —
    with an OLEPS title.  The oracle rebuilds the sheet/TAB/NEWLINE
    rendering closed-form; a record-walk, SST, RK-decode or
    BoundSheet-order bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.xls import (
        synthesize_xls,
        xls_extract,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_xls(
                    [
                        ("Data", [[f"Doc {d} report", str(d * 7),
                                   "TRUE"],
                                  [t, str(-(d % 13))]]),
                        ("Notes", [[f"note block {d % 5}"]]),
                    ],
                    title=f"Doc {d}",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "xls",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return xls_extract(payloads)


_ORACLE_XLS_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'Data' || chr(10)
           || 'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(9) || CAST(doc_id * 7 AS VARCHAR)
           || chr(9) || 'TRUE' || chr(10)
           || text || chr(9) || CAST(-(doc_id % 13) AS VARCHAR)
           || chr(10)
           || 'Notes' || chr(10) || 'note block '
           || CAST(doc_id % 5 AS VARCHAR) AS text
  FROM san
)
SELECT doc_id, title, CAST(2 AS INT) AS n_sheets,
       CAST(3 AS INT) AS n_rows, CAST(6 AS INT) AS n_cells,
       text, CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_ppt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy PowerPoint extraction (`operators/ppt.py::ppt_extract`,
    r13): every doc becomes a real binary .ppt record tree — two text
    blocks per deck, the writer alternating TextBytesAtom (cp1252)
    and TextCharsAtom (UTF-16) so both decode paths run on every row
    — inside a real CFB with an OLEPS title.  The oracle rebuilds the
    paragraph rendering closed-form."""
    _prep(spark)
    from minerva_etl_spark.operators.ppt import (
        ppt_extract,
        synthesize_ppt,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_ppt(
                    [[f"Doc {d} deck", t], [f"closing {d % 7}"]],
                    title=f"Doc {d}",
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "ppt",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return ppt_extract(payloads)


_ORACLE_PPT_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) AS title,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' deck' || chr(10)
           || text || chr(10)
           || 'closing ' || CAST(doc_id % 7 AS VARCHAR) AS text
  FROM san
)
SELECT doc_id, title, CAST(2 AS INT) AS n_texts,
       CAST(3 AS INT) AS n_paragraphs, text,
       CAST(length(text) AS INT) AS n_chars
FROM built
"""


def q_msg_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlook .msg extraction (`operators/msg.py::msg_extract`,
    r13 — the binary leg of the mail arc next to in-window
    eml/mbox): every doc becomes a real CFB .msg whose TOP-LEVEL
    property streams carry subject/body/sender/to — even docs UTF-16
    (001F), odd docs cp1252 (001E), so both decodes run — plus one
    NESTED recipient storage carrying a DECOY subject stream the
    directory-tree walk must not surface.  The oracle rebuilds all
    fields closed-form; a tree-walk, property-tag or decode bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.msg import (
        msg_extract,
        synthesize_msg,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                payload = synthesize_msg(
                    subject=f"Subject {d}",
                    body=t,
                    sender=f"sender{d % 20}@corpus.test",
                    to=f"rcpt{d % 7}@corpus.test",
                    wide=(d % 2 == 0),
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "msg",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return msg_extract(payloads)


_ORACLE_MSG_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'Subject ' || CAST(doc_id AS VARCHAR) AS subject,
       'sender' || CAST(doc_id % 20 AS VARCHAR)
         || '@corpus.test' AS sender,
       'rcpt' || CAST(doc_id % 7 AS VARCHAR)
         || '@corpus.test' AS "to",
       text AS body,
       CAST(1 AS INT) AS n_recipients,
       CAST(length(text) AS INT) AS n_chars
FROM san
"""


def q_format_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sniff-only format census (`operators/office.py::
    format_census`, r13; r14 adds the encrypted leg): the budgeting
    pass a 100 TB bucket runs before paying for codecs — one Arrow
    sniff scan + one combinable groupBy, NO parse.  The fixture
    cycles doc_id % 7 over the six extractable formats PLUS a
    password-protected OOXML wrapper (CFB with EncryptionInfo/
    EncryptedPackage, MS-OFFCRYPTO) that must be tagged
    ``ooxml_encrypted`` — the census is how the decryption backlog
    gets counted.  The gate projects (format, n_docs); the oracle
    counts the cycle closed-form (total_bytes stays operator-only:
    synthesized payload sizes are compression-dependent, not
    closed-form)."""
    _prep(spark)
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.epub import synthesize_epub
    from minerva_etl_spark.operators.msdoc import (
        _build_cfb,
        synthesize_doc,
    )
    from minerva_etl_spark.operators.office import format_census
    from minerva_etl_spark.operators.pdf import synthesize_pdf
    from minerva_etl_spark.operators.pptx import synthesize_pptx
    from minerva_etl_spark.operators.xlsx import synthesize_xlsx

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                head = f"Doc {d} report"
                if d % 7 == 0:
                    payload = synthesize_pdf([head, t], title=f"Doc {d}")
                elif d % 7 == 1:
                    payload = synthesize_docx([head, t], title=f"Doc {d}")
                elif d % 7 == 2:
                    payload = synthesize_epub(
                        [f"<p>{head}</p>", f"<p>{t}</p>"],
                        title=f"Doc {d}",
                    )
                elif d % 7 == 3:
                    payload = synthesize_xlsx(
                        [("Data", [[head], [t]])], title=f"Doc {d}"
                    )
                elif d % 7 == 4:
                    payload = synthesize_pptx([[head, t]], title=f"Doc {d}")
                elif d % 7 == 5:
                    payload = synthesize_doc([head, t])
                else:
                    payload = _build_cfb(
                        [
                            (
                                "EncryptionInfo",
                                b"\x04\x00\x04\x00" + b"\x00" * 60,
                            ),
                            (
                                "EncryptedPackage",
                                t.encode()[:64].ljust(64, b"\x00"),
                            ),
                        ]
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "census",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return format_census(payloads).select("format", "n_docs")


_ORACLE_FORMAT_CENSUS = """
SELECT CASE doc_id % 7 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
            WHEN 2 THEN 'epub' WHEN 3 THEN 'xlsx'
            WHEN 4 THEN 'pptx' WHEN 5 THEN 'doc'
            ELSE 'ooxml_encrypted' END AS format,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY 1
"""


def q_mail_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-format MAIL dispatch (`operators/email_ingest.py::
    mail_extract`, r13 — the office_extract pattern on the mail arc):
    one binary column mixes wire-format RFC 5322 messages (even docs,
    quoted-printable bodies) with desktop Outlook .msg exports (odd
    docs, alternating 001F/001E property widths) carrying the same
    subject/sender/body content; magic routing per payload, unified
    ``(kind, subject, sender, text, n_chars)``.  The oracle rebuilds
    both kinds closed-form — a routing or either-codec regression
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.email_ingest import (
        mail_extract,
        synthesize_eml,
    )
    from minerva_etl_spark.operators.msg import synthesize_msg

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                if d % 2 == 0:
                    payload = synthesize_eml(
                        subject=f"Doc {d} mail",
                        sender=f"user{d % 20}@corpus.test",
                        text_body=t,
                        cte="quoted-printable",
                    )
                else:
                    payload = synthesize_msg(
                        subject=f"Doc {d} mail",
                        body=t,
                        sender=f"user{d % 20}@corpus.test",
                        to="corpus@example.test",
                        wide=(d % 4 == 1),
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "mail",
        lambda: docs.mapInPandas(synth, "doc_id bigint, payload binary"),
    )
    return mail_extract(payloads)


_ORACLE_MAIL_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'eml' ELSE 'msg' END AS kind,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' mail' AS subject,
       'user' || CAST(doc_id % 20 AS VARCHAR) || '@corpus.test'
         AS sender,
       text,
       CAST(length(text) AS INT) AS n_chars
FROM san
"""


def q_pipeline_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused DOCUMENT-delivery pipeline — the archive/PDF twin of
    `pipeline_crawl`'s harvest edge: documents become real two-page
    PDFs (even ids Flate-compressed), packed as members of real
    archives (even shards zip, odd tar.gz), written by owning tasks,
    then harvested back: `read_archives` → member-name doc_id →
    `pdf_extract` → `with_token_count` → keep docs with ≥ 30 tokens.
    Three r10 operators composed in one lineage with zero driver
    round-trips between stages; the oracle replays the survivors
    closed-form (title, exact text, token count), so ANY stage
    breaking — archive member bytes, PDF object boundaries, Flate
    dispatch, text-op tokenizing, filtering — shifts the hash."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.pdf import (
        pdf_extract,
        synthesize_pdf,
    )
    from minerva_etl_spark.operators.text import with_token_count
    from minerva_etl_spark.sources.archive import (
        read_archives,
        write_archives,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                shard = d % 6
                ext = "zip" if shard % 2 == 0 else "tar.gz"
                payload = synthesize_pdf(
                    [f"Doc {d} report", _ascii_sanitize(str(t))],
                    title=f"Doc {d}",
                    compress=(d % 2 == 0),
                    # r11: a third of the corpus ships as PDF 1.5
                    # ObjStm (container-blind oracle, same text)
                    objstm=(d % 3 == 0),
                )
                rows.append(
                    (f"shard-{shard}.{ext}", f"doc_{d:06d}.pdf", payload)
                )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "content"]
            )

    staged = docs.mapInPandas(
        synth, "archive string, member string, content binary"
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_docpipe_")
    write_archives(staged, root).collect()
    members = read_archives(spark, root).select(
        F.regexp_extract("member", r"doc_(\d+)\.pdf", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    out = (
        with_token_count(pdf_extract(members))
        .where(F.col("n_tokens") >= 30)
        .select("doc_id", "n_pages", "title", "text", "n_tokens")
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_pipeline_document() -> str:
    from minerva_etl_spark.operators.text import tokens_duck_sql

    toks = tokens_duck_sql("text")
    return f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS s FROM documents
), built AS (
  SELECT doc_id,
         'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
             || chr(10) || chr(10) || s AS text
  FROM san
), counted AS (
  SELECT doc_id, text, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM built
)
SELECT doc_id,
       CAST(2 AS INT) AS n_pages,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       text,
       n_tokens
FROM counted WHERE n_tokens >= 30
"""


_ORACLE_FEED_ENTRIES = """
WITH e AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i
  FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS t(i)
)
SELECT doc_id AS feed_id,
       CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS format,
       'Feed ' || CAST(doc_id AS VARCHAR) AS feed_title,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' item '
           || CAST(i AS VARCHAR) AS title,
       'https://corpus.test/d/' || CAST(doc_id AS VARCHAR) || '/'
           || CAST(i AS VARCHAR) AS link,
       '2026-02-03T04:05:0' || CAST(i AS VARCHAR) || 'Z' AS published,
       CASE WHEN i % 2 = 0
            THEN 'guid:' || CAST(doc_id AS VARCHAR) || ':'
                 || CAST(i AS VARCHAR)
            ELSE 'https://corpus.test/d/' || CAST(doc_id AS VARCHAR)
                 || '/' || CAST(i AS VARCHAR) END AS guid
FROM e
"""


def q_office_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-PROVENANCE census (`operators/office.py::
    office_metadata`, r14): one binary column cycling the three real
    metadata CONTAINERS — the PDF trailer /Info dict (d%3=0), OOXML
    ``docProps/core.xml`` (docx leg, d%3=1; xlsx/pptx share the same
    part), and the MS-OLEPS ``\\x05SummaryInformation`` stream (.doc
    leg, d%3=2; xls/ppt/msg share it) — each with planted title,
    author, and creation timestamps on doc_id formulas.  NO content
    extraction runs (the PDF page walk is skipped — provenance
    filtering at 100 TB must not pay for text).  The oracle replays
    every field closed-form incl. the PDF-date and W3CDTF/FILETIME
    round trips; a container-parse, codepage, or date-conversion bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.office import office_metadata

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.docx import synthesize_docx
        from minerva_etl_spark.operators.epub import synthesize_epub
        from minerva_etl_spark.operators.msdoc import synthesize_doc
        from minerva_etl_spark.operators.msg import synthesize_msg
        from minerva_etl_spark.operators.pdf import synthesize_pdf
        from minerva_etl_spark.operators.pptx import synthesize_pptx
        from minerva_etl_spark.operators.rtf import synthesize_rtf
        from minerva_etl_spark.operators.xlsx import synthesize_xlsx

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                title = f"Doc {d}"
                author = f"Author {d % 20}"
                created = (
                    f"2026-02-{1 + d % 28:02d} "
                    f"{d % 24:02d}:{d % 60:02d}:{(d * 7) % 60:02d}"
                )
                kw = dict(title=title, author=author, created=created)
                if d % 8 == 0:
                    payload = synthesize_pdf(["body"], **kw)
                elif d % 8 == 1:
                    payload = synthesize_docx(["body"], **kw)
                elif d % 8 == 2:
                    payload = synthesize_doc(["body"], **kw)
                elif d % 8 == 3:
                    payload = synthesize_xlsx(
                        [("Data", [["body"]])], **kw
                    )
                elif d % 8 == 4:
                    payload = synthesize_pptx([["body"]], **kw)
                elif d % 8 == 5:
                    payload = synthesize_epub(["<p>body</p>"], **kw)
                elif d % 8 == 6:
                    payload = synthesize_rtf(["body"], **kw)
                else:
                    payload = synthesize_msg(
                        title, "body", sender=author
                    )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    payloads = _media_fixture_staged(
        spark, sf_dir, "officemeta",
        lambda: docs.mapInPandas(
            synth, "doc_id bigint, payload binary"
        ),
    )
    return office_metadata(payloads)


_ORACLE_OFFICE_METADATA = """
SELECT doc_id,
       CASE doc_id % 8 WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
            WHEN 2 THEN 'doc' WHEN 3 THEN 'xlsx'
            WHEN 4 THEN 'pptx' WHEN 5 THEN 'epub'
            WHEN 6 THEN 'rtf' ELSE 'msg' END AS format,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'Author ' || CAST(doc_id % 20 AS VARCHAR) AS author,
       CASE WHEN doc_id % 8 = 7 THEN NULL ELSE
         '2026-02-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
         || ' ' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
         || ':' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
         || ':' || lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')
       END AS created
FROM documents
"""


def q_mail_attachment_extract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The enterprise mail-corpus composition (r14): every message
    carries TWO real document attachments — a DOCX and a PDF, base64
    transfer encoding — exploded by `email_ingest.eml_attachments`
    (MIME leaf walk, disposition/filename rules, transfer decode) and
    routed straight into `office_extract` under a composite
    (message, part) id.  The oracle replays both attachments' titles
    and text closed-form: a MIME-walk, base64, dispatch, or codec bug
    hash-mismatches.  This is where the documents of a real
    enterprise corpus actually live — inside the mail."""
    _prep(spark)
    from minerva_etl_spark.operators.email_ingest import (
        eml_attachments,
    )
    from minerva_etl_spark.operators.office import office_extract

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        from minerva_etl_spark.operators.docx import synthesize_docx
        from minerva_etl_spark.operators.email_ingest import (
            synthesize_eml,
        )
        from minerva_etl_spark.operators.pdf import synthesize_pdf

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                d = int(did)
                atts = [
                    (
                        f"report-{d}.docx",
                        "application/vnd.openxmlformats-"
                        "officedocument.wordprocessingml.document",
                        synthesize_docx(
                            [f"att body {d}"], title=f"Att {d}"
                        ),
                    ),
                    (
                        f"scan-{d}.pdf",
                        "application/pdf",
                        synthesize_pdf(
                            [f"att page {d}"], title=f"P {d}"
                        ),
                    ),
                ]
                rows.append(
                    (
                        d,
                        synthesize_eml(
                            f"Msg {d}", f"user{d % 20}@corpus.test",
                            text_body=f"mail body {d}",
                            attachments=atts,
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    mail = _media_fixture_staged(
        spark, sf_dir, "mailatt",
        lambda: docs.mapInPandas(
            synth, "doc_id bigint, payload binary"
        ),
    )
    atts = eml_attachments(mail).select(
        (F.col("doc_id") * 10 + F.col("part_index")).alias("att_id"),
        "payload",
    )
    return office_extract(atts, id_col="att_id")


_ORACLE_MAIL_ATTACHMENTS = """
WITH a AS (
  SELECT doc_id * 10 AS att_id, 'docx' AS format,
         'Att ' || CAST(doc_id AS VARCHAR) AS title,
         'att body ' || CAST(doc_id AS VARCHAR) AS text
  FROM documents
  UNION ALL
  SELECT doc_id * 10 + 1, 'pdf',
         'P ' || CAST(doc_id AS VARCHAR),
         'att page ' || CAST(doc_id AS VARCHAR)
  FROM documents
)
SELECT att_id, format, title, text,
       CAST(length(text) AS INT) AS n_chars
FROM a
"""
