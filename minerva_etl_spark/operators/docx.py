"""DOCX (OOXML WordprocessingML) text extraction — the office-corpus
ingest edge (round 12).

A real document crawl is a mix of HTML, PDF and Office files; after
`operators/pdf.py` (PDF 1.4/1.5, four encryption revisions, Type0
fonts) the next-largest binary-document class is DOCX — ECMA-376
WordprocessingML: a ZIP container holding ``word/document.xml`` (the
body), ``docProps/core.xml`` (Dublin-Core metadata) and a relationship
graph.  Everything here is pure stdlib (``zipfile`` + ``xml.etree``),
decoded inside Arrow ``mapInPandas`` tasks — the engine's media-codec
shape: no shuffle, no Python-per-row UDF, linear in payload bytes.

Extraction rules (deterministic, oracle-matchable):

* The body is walked in document order; each top-level ``w:p``
  paragraph contributes the concatenation of its ``w:t`` runs with
  ``w:tab`` → TAB and ``w:br``/``w:cr`` → NEWLINE (run splitting is
  invisible, as in every conformant reader).
* A top-level ``w:tbl`` table contributes one block: cells joined by
  TAB, rows by NEWLINE; paragraphs inside a cell join with NEWLINE.
  Table-internal paragraphs do NOT count toward ``n_paragraphs``
  (they are cell content); the table counts toward ``n_tables``.
* Blocks join with a single NEWLINE into ``text``.
* ``title`` comes from ``docProps/core.xml``'s ``dc:title`` (NULL when
  the part or element is absent) — never from body heuristics.

Rejects are honest: non-ZIP bytes and ZIPs without
``word/document.xml`` raise ``ValueError`` (``on_error='skip'`` drops
them in dirty-corpus mode).  Password-protected (ECMA-376 agile
encryption) files are OLE containers, not ZIPs, and land in the same
``ValueError`` class with a named message.

The writer (:func:`synthesize_docx`) emits a minimal conformant
package — content types, relationships, core properties, the body with
multi-run paragraphs / tabs / breaks / tables, stored or deflated
entries — used by the `docx_extract` gate fixture and tests, mirroring
`pdf.synthesize_pdf`.

Reference parity note: the reference harvests structured text files
(CSV plugins, `src/harvest/`); binary office documents are part of
this repo's document-ingest extension arc alongside `pdf.py` and
`markup.py`.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_docx",
    "docx_extract_text",
    "docx_extract",
    "DOCX_EXTRACT_SCHEMA",
]

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_CP = (
    "http://schemas.openxmlformats.org/package/2006/metadata/"
    "core-properties"
)
_DC = "http://purl.org/dc/elements/1.1/"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# --------------------------------------------------------------- writer


def _run_xml(text: str) -> str:
    """One ``w:r`` run; TAB and NEWLINE inside the text become the
    structural ``w:tab`` / ``w:br`` elements a real producer emits."""
    parts: list[str] = []
    buf = ""
    for ch in text:
        if ch == "\t":
            if buf:
                parts.append(
                    f'<w:t xml:space="preserve">{_xml_escape(buf)}</w:t>'
                )
                buf = ""
            parts.append("<w:tab/>")
        elif ch == "\n":
            if buf:
                parts.append(
                    f'<w:t xml:space="preserve">{_xml_escape(buf)}</w:t>'
                )
                buf = ""
            parts.append("<w:br/>")
        else:
            buf += ch
    if buf:
        parts.append(f'<w:t xml:space="preserve">{_xml_escape(buf)}</w:t>')
    return "<w:r>" + "".join(parts) + "</w:r>"


def _para_xml(text: str, runs: int = 1) -> str:
    """A ``w:p`` whose text is split across ``runs`` runs at word
    boundaries — extraction must be run-split-invariant."""
    if runs <= 1 or " " not in text:
        return "<w:p>" + _run_xml(text) + "</w:p>"
    words = text.split(" ")
    step = max(1, len(words) // runs)
    chunks: list[str] = []
    for i in range(0, len(words), step):
        chunk = " ".join(words[i : i + step])
        if i > 0:
            chunk = " " + chunk
        chunks.append(chunk)
    return "<w:p>" + "".join(_run_xml(c) for c in chunks) + "</w:p>"


def synthesize_docx(
    paragraphs: list[str],
    title: str | None = None,
    table: list[list[str]] | None = None,
    runs_per_para: int = 3,
    compress: bool = True,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal conformant DOCX: ``paragraphs`` as multi-run
    ``w:p`` blocks (embedded TAB/NEWLINE become ``w:tab``/``w:br``),
    an optional ``table`` (rows of cell strings) appended after them,
    ``dc:title`` in the core-properties part.  Fixed zip timestamps →
    byte-deterministic output."""
    body = [_para_xml(p, runs=runs_per_para) for p in paragraphs]
    if table is not None:
        rows = []
        for row in table:
            cells = "".join(
                "<w:tc><w:p>" + _run_xml(c) + "</w:p></w:tc>" for c in row
            )
            rows.append(f"<w:tr>{cells}</w:tr>")
        body.append("<w:tbl>" + "".join(rows) + "</w:tbl>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(body)
        + "<w:sectPr/></w:body></w:document>"
    )
    created_el = ""
    if created is not None:
        # W3CDTF, the dcterms:created form real producers emit
        created_el = (
            '<dcterms:created xsi:type="dcterms:W3CDTF">'
            + created.replace(" ", "T") + "Z</dcterms:created>"
        )
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<cp:coreProperties xmlns:cp="{_CP}" xmlns:dc="{_DC}" '
        'xmlns:dcterms="http://purl.org/dc/terms/" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        + (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
        + (f"<dc:creator>{_xml_escape(author)}</dc:creator>"
           if author else "")
        + created_el
        + "</cp:coreProperties>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType='
        '"application/vnd.openxmlformats-package.core-properties+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.'
        'org/package/2006/relationships/metadata/core-properties" '
        'Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("word/document.xml", document),
            ("docProps/core.xml", core),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


# --------------------------------------------------------------- reader


def _tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[-1] if "}" in t else t


def _para_text(p) -> str:
    """Concatenate one paragraph's runs in document order: ``w:t``
    text, ``w:tab`` → TAB, ``w:br``/``w:cr`` → NEWLINE."""
    out: list[str] = []
    for node in p.iter():
        t = _tag(node)
        if t == "t":
            out.append(node.text or "")
        elif t == "tab":
            out.append("\t")
        elif t in ("br", "cr"):
            out.append("\n")
    return "".join(out)


def _table_text(tbl) -> str:
    rows: list[str] = []
    for tr in tbl:
        if _tag(tr) != "tr":
            continue
        cells: list[str] = []
        for tc in tr:
            if _tag(tc) != "tc":
                continue
            cells.append(
                "\n".join(
                    _para_text(p) for p in tc if _tag(p) == "p"
                )
            )
        rows.append("\t".join(cells))
    return "\n".join(rows)


def docx_extract_text(payload: bytes) -> dict:
    """Parse one DOCX payload → ``{title, n_paragraphs, n_tables,
    text, n_chars}``.  Raises ``ValueError`` for non-DOCX bytes (see
    module doc)."""
    import xml.etree.ElementTree as ET

    if payload[:4] == b"\xd0\xcf\x11\xe0":
        raise ValueError(
            "OLE compound file (legacy .doc or password-protected "
            "OOXML) — not a ZIP-based DOCX"
        )
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a DOCX payload (not a ZIP): {exc}") from exc
    names = set(zf.namelist())
    if "word/document.xml" not in names:
        raise ValueError("ZIP without word/document.xml — not a DOCX")
    root = ET.fromstring(zf.read("word/document.xml"))
    body = None
    for child in root:
        if _tag(child) == "body":
            body = child
            break
    if body is None:
        raise ValueError("document.xml without w:body")
    blocks: list[str] = []
    n_paragraphs = 0
    n_tables = 0
    for child in body:
        t = _tag(child)
        if t == "p":
            n_paragraphs += 1
            blocks.append(_para_text(child))
        elif t == "tbl":
            n_tables += 1
            blocks.append(_table_text(child))
    text = "\n".join(blocks)
    title = None
    if "docProps/core.xml" in names:
        core = ET.fromstring(zf.read("docProps/core.xml"))
        el = core.find(f"{{{_DC}}}title")
        if el is not None and el.text is not None:
            title = el.text
    return {
        "title": title,
        "n_paragraphs": n_paragraphs,
        "n_tables": n_tables,
        "text": text,
        "n_chars": len(text),
    }


DOCX_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_paragraphs int, n_tables int, "
    "text string, n_chars int"
)


def docx_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """DOCX → text over a binary column: shuffle-free Arrow
    ``mapInPandas``, one in-task parse per payload — the
    `pdf_extract` contract (id column keeps its input name/type;
    ``on_error='skip'`` drops undecodable payloads)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = DOCX_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = docx_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_paragraphs"],
                        rec["n_tables"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "title",
                    "n_paragraphs",
                    "n_tables",
                    "text",
                    "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
