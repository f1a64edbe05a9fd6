"""PPTX (OOXML PresentationML) text extraction — the slide-deck leg
of the office-corpus ingest arc (round 13; the r12 verdict's ask 2
named it the cheap sibling of XLSX).

ECMA-376 PresentationML: a ZIP container with ``ppt/presentation.xml``
and per-slide ``ppt/slides/slideN.xml`` parts; visible text lives in
DrawingML ``a:t`` runs inside ``a:p`` paragraphs inside shape
``p:txBody`` elements.  Pure stdlib (``zipfile`` + ``xml.etree``)
inside Arrow ``mapInPandas`` tasks — the engine's media-codec shape.

Extraction rules (deterministic, oracle-matchable):

* Slides are walked in SLIDE-NUMBER order (``slideN`` numeric sort —
  presentation.xml's sldIdLst references match this for every real
  producer, and decks without a readable rels part still extract).
* Within a slide, shapes in document order; each ``a:p`` paragraph
  contributes its ``a:t`` runs concatenated (run splits invisible)
  with ``a:br`` → NEWLINE; paragraphs join with NEWLINE; slides join
  with NEWLINE into ``text``.
* ``title`` comes from ``docProps/core.xml``'s ``dc:title``.

Rejects are honest: non-ZIP bytes and ZIPs without
``ppt/presentation.xml`` raise ``ValueError``.

The writer (:func:`synthesize_pptx`) emits a minimal conformant deck
(content types, rels, presentation, slides with multi-run paragraphs
and ``a:br`` breaks), fixed zip timestamps, deterministic bytes.

Reference parity note: document-ingest extension arc (`pdf.py`,
`docx.py`, `epub.py`, `rtf.py`, `xlsx.py`).
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_pptx",
    "pptx_extract_text",
    "pptx_extract",
    "PPTX_EXTRACT_SCHEMA",
]

_P = "http://schemas.openxmlformats.org/presentationml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_CP = (
    "http://schemas.openxmlformats.org/package/2006/metadata/"
    "core-properties"
)
_DC = "http://purl.org/dc/elements/1.1/"

_SLIDE_RE = re.compile(r"ppt/slides/slide(\d+)\.xml$")


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# --------------------------------------------------------------- writer


def _para_xml(text: str, runs: int = 2) -> str:
    """One ``a:p``: NEWLINE inside the text becomes ``a:br``; the
    remaining text splits across ``runs`` runs at word boundaries
    (extraction must be run-invariant)."""
    parts: list[str] = []
    for seg_i, seg in enumerate(text.split("\n")):
        if seg_i > 0:
            parts.append("<a:br/>")
        words = seg.split(" ")
        if runs <= 1 or len(words) < 2:
            chunks = [seg]
        else:
            step = max(1, len(words) // runs)
            chunks = []
            for i in range(0, len(words), step):
                chunk = " ".join(words[i : i + step])
                if i > 0:
                    chunk = " " + chunk
                chunks.append(chunk)
        for c in chunks:
            parts.append(f"<a:r><a:t>{_xml_escape(c)}</a:t></a:r>")
    return "<a:p>" + "".join(parts) + "</a:p>"


def synthesize_pptx(
    slides: list[list[str]],
    title: str | None = None,
    compress: bool = True,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal conformant PPTX: one shape per slide carrying
    the slide's paragraphs (embedded NEWLINE → ``a:br``, text split
    across runs), ``dc:title`` in core properties.  Fixed zip
    timestamps → byte-deterministic output."""
    slide_xmls = []
    for paras in slides:
        body = "".join(_para_xml(p) for p in paras)
        slide_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody><a:bodyPr/>{body}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>"
        )
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
        for i in range(len(slides))
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{_P}" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>"
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'slide" Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        + "</Relationships>"
    )
    created_el = ""
    if created is not None:
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
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'presentationml.presentation.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType='
        '"application/vnd.openxmlformats-package.core-properties+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.'
        'org/package/2006/relationships/metadata/core-properties" '
        'Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    entries = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", root_rels),
        ("ppt/presentation.xml", presentation),
        ("ppt/_rels/presentation.xml.rels", pres_rels),
        ("docProps/core.xml", core),
    ]
    for i, sx in enumerate(slide_xmls):
        entries.append((f"ppt/slides/slide{i + 1}.xml", sx))
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


# --------------------------------------------------------------- reader


def _tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[-1] if "}" in t else t


def _slide_paras(root) -> list[str]:
    paras: list[str] = []
    for p in root.iter(f"{{{_A}}}p"):
        out: list[str] = []
        for node in p.iter():
            t = _tag(node)
            if t == "t":
                out.append(node.text or "")
            elif t == "br":
                out.append("\n")
        paras.append("".join(out))
    return paras


def pptx_extract_text(payload: bytes) -> dict:
    """Parse one PPTX payload → ``{title, n_slides, n_paragraphs,
    text, n_chars}``.  Raises ``ValueError`` for non-PPTX bytes."""
    import xml.etree.ElementTree as ET

    if payload[:4] == b"\xd0\xcf\x11\xe0":
        raise ValueError(
            "OLE compound file (legacy .ppt or password-protected "
            "OOXML) — not a ZIP-based PPTX"
        )
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a PPTX payload (not a ZIP): {exc}") from exc
    names = set(zf.namelist())
    if "ppt/presentation.xml" not in names:
        raise ValueError("ZIP without ppt/presentation.xml — not a PPTX")
    slide_names = sorted(
        (n for n in names if _SLIDE_RE.match(n)),
        key=lambda n: int(_SLIDE_RE.match(n).group(1)),
    )
    blocks: list[str] = []
    n_paragraphs = 0
    for sn in slide_names:
        paras = _slide_paras(ET.fromstring(zf.read(sn)))
        n_paragraphs += len(paras)
        blocks.append("\n".join(paras))
    text = "\n".join(blocks)
    title = None
    if "docProps/core.xml" in names:
        core = ET.fromstring(zf.read("docProps/core.xml"))
        el = core.find(f"{{{_DC}}}title")
        if el is not None and el.text is not None:
            title = el.text
    return {
        "title": title,
        "n_slides": len(slide_names),
        "n_paragraphs": n_paragraphs,
        "text": text,
        "n_chars": len(text),
    }


PPTX_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_slides int, n_paragraphs int, "
    "text string, n_chars int"
)


def pptx_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """PPTX → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = PPTX_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = pptx_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_slides"],
                        rec["n_paragraphs"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "title", "n_slides", "n_paragraphs",
                    "text", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
