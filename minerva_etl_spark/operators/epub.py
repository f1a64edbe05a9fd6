"""EPUB text extraction — the e-book corpus ingest edge (round 12).

EPUB (IDPF/W3C, public spec) is the third big binary-document class in
a real crawl after PDF (`operators/pdf.py`) and DOCX
(`operators/docx.py`): a ZIP whose ``META-INF/container.xml`` points
at an OPF package document, whose ``<spine>`` gives the READING ORDER
of XHTML chapter files named in the ``<manifest>``.  Book corpora
(Project Gutenberg et al.) are a staple pre-training source, and the
spine walk is the part naive "unzip and grep XHTML" pipelines get
wrong — manifest order and zip entry order are both decoys.

Everything is stdlib (``zipfile`` + ``xml.etree``) and the chapter
bodies reuse `operators/html.py::extract_html` — one HTML extraction
stack engine-wide.  Decoding runs inside Arrow ``mapInPandas`` tasks:
no shuffle, linear in payload bytes, the engine's media-codec shape.

Extraction rules (deterministic, oracle-matchable):

* ``container.xml`` → first ``<rootfile full-path>`` → the OPF.
* ``dc:title`` / ``dc:language`` come from OPF metadata (NULL when
  absent).
* Chapters = spine ``<itemref idref>`` entries resolved through the
  manifest, in SPINE order, hrefs resolved relative to the OPF
  directory; non-XHTML manifest items (css, images) are ignored.
* Each chapter contributes ``extract_html(...)``'s text; chapters
  join with a single NEWLINE into ``text``.

Rejects are honest ``ValueError``s: non-ZIP bytes, a ZIP without
``META-INF/container.xml``, a dangling rootfile/manifest href.  The
writer (:func:`synthesize_epub`) emits a conformant package — stored
``mimetype`` first per OCF, manifest deliberately written in REVERSE
chapter order so only a correct spine walk extracts in order — for
the gate fixture and tests.

Reference parity note: the reference harvests structured text; e-book
containers belong to this repo's document-ingest extension arc
(`pdf.py`, `docx.py`, `markup.py`).
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from minerva_etl_spark.operators.html import extract_html

__all__ = [
    "synthesize_epub",
    "epub_extract_text",
    "epub_extract",
    "EPUB_EXTRACT_SCHEMA",
]

_CNT = "urn:oasis:names:tc:opendocument:xmlns:container"
_OPF = "http://www.idpf.org/2007/opf"
_DC = "http://purl.org/dc/elements/1.1/"


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# --------------------------------------------------------------- writer


def synthesize_epub(
    chapters: list[str],
    title: str | None = None,
    language: str | None = None,
    compress: bool = True,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a conformant EPUB: each ``chapters[i]`` becomes the BODY
    markup of ``OEBPS/ch{i}.xhtml`` (caller supplies block elements,
    e.g. ``<p>...</p>``); ``dc:title`` / ``dc:language`` in the OPF
    metadata.  The manifest lists chapters in REVERSE order while the
    spine lists them forward — extraction order must come from the
    spine.  Stored ``mimetype`` first per OCF; fixed timestamps →
    byte-deterministic output."""
    n = len(chapters)
    manifest_items = "".join(
        f'<item id="c{i}" href="ch{i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in reversed(range(n))
    ) + '<item id="css" href="style.css" media-type="text/css"/>'
    spine_items = "".join(
        f'<itemref idref="c{i}"/>' for i in range(n)
    )
    meta = ""
    if title is not None:
        meta += f"<dc:title>{_xml_escape(title)}</dc:title>"
    if language is not None:
        meta += f"<dc:language>{_xml_escape(language)}</dc:language>"
    if author:
        meta += f"<dc:creator>{_xml_escape(author)}</dc:creator>"
    if created:
        meta += ("<dc:date>" + created.replace(" ", "T")
                 + "Z</dc:date>")
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<package xmlns="{_OPF}" xmlns:dc="{_DC}" version="3.0" '
        'unique-identifier="uid">'
        f"<metadata>{meta}</metadata>"
        f"<manifest>{manifest_items}</manifest>"
        f"<spine>{spine_items}</spine></package>"
    )
    container = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<container xmlns="{_CNT}" version="1.0"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        # OCF: mimetype first, STORED, no extra field
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED
        zf.writestr(zi, b"application/epub+zip")
        entries = [
            ("META-INF/container.xml", container),
            ("OEBPS/content.opf", opf),
            ("OEBPS/style.css", "body { margin: 0 }"),
        ]
        for i, body in enumerate(chapters):
            entries.append(
                (
                    f"OEBPS/ch{i}.xhtml",
                    '<?xml version="1.0" encoding="UTF-8"?>'
                    '<html xmlns="http://www.w3.org/1999/xhtml">'
                    f"<head><title>ch{i}</title></head>"
                    f"<body>{body}</body></html>",
                )
            )
        for name, data in entries:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


# --------------------------------------------------------------- reader


def epub_extract_text(payload: bytes) -> dict:
    """Parse one EPUB payload → ``{title, language, n_chapters, text,
    n_chars}`` (see module doc for the spine-walk rules).  Raises
    ``ValueError`` for non-EPUB bytes."""
    import xml.etree.ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not an EPUB payload (not a ZIP): {exc}") from exc
    names = set(zf.namelist())
    if "META-INF/container.xml" not in names:
        raise ValueError("ZIP without META-INF/container.xml — not an EPUB")
    container = ET.fromstring(zf.read("META-INF/container.xml"))
    rootfile = container.find(f".//{{{_CNT}}}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("container.xml without a rootfile entry")
    opf_path = rootfile.get("full-path")
    if opf_path not in names:
        raise ValueError(f"dangling rootfile path {opf_path!r}")
    opf_dir = posixpath.dirname(opf_path)
    opf = ET.fromstring(zf.read(opf_path))

    title = language = None
    md = opf.find(f"{{{_OPF}}}metadata")
    if md is not None:
        el = md.find(f"{{{_DC}}}title")
        if el is not None and el.text is not None:
            title = el.text
        el = md.find(f"{{{_DC}}}language")
        if el is not None and el.text is not None:
            language = el.text

    manifest: dict[str, tuple[str, str]] = {}
    mf = opf.find(f"{{{_OPF}}}manifest")
    if mf is not None:
        for item in mf.findall(f"{{{_OPF}}}item"):
            manifest[item.get("id", "")] = (
                item.get("href", ""),
                item.get("media-type", ""),
            )
    spine = opf.find(f"{{{_OPF}}}spine")
    chapters: list[str] = []
    if spine is not None:
        for ref in spine.findall(f"{{{_OPF}}}itemref"):
            idref = ref.get("idref", "")
            if idref not in manifest:
                raise ValueError(f"spine idref {idref!r} not in manifest")
            href, mtype = manifest[idref]
            if "xhtml" not in mtype and "html" not in mtype:
                continue
            path = posixpath.normpath(
                posixpath.join(opf_dir, href) if opf_dir else href
            )
            if path not in names:
                raise ValueError(f"dangling manifest href {href!r}")
            chapters.append(
                extract_html(zf.read(path).decode("utf-8", "replace"))[
                    "text"
                ]
            )
    text = "\n".join(chapters)
    return {
        "title": title,
        "language": language,
        "n_chapters": len(chapters),
        "text": text,
        "n_chars": len(text),
    }


EPUB_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, language string, n_chapters int, "
    "text string, n_chars int"
)


def epub_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """EPUB → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract`/`docx_extract` contract —
    id column keeps its name/type, ``on_error='skip'`` drops
    undecodable payloads)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = EPUB_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = epub_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["language"],
                        rec["n_chapters"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "title",
                    "language",
                    "n_chapters",
                    "text",
                    "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
