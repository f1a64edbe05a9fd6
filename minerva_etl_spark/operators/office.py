"""Mixed-format document extraction — magic-byte routing over a
binary column (round 12).

A real crawl's "documents" bucket is never pre-sorted by format: one
binary column holds PDFs next to DOCX next to EPUB.  This module is
the dispatch edge over the three codecs (`operators/pdf.py`,
`operators/docx.py`, `operators/epub.py`) — the same pattern
`multimodal.image_features` uses for mixed PNG/JPEG columns: sniff
each payload's magic bytes IN-TASK and route it to the right parser,
emitting one unified schema ``(id, format, title, text, n_chars)``.

Sniffing rules (cheap, prefix-only — no speculative full parses):

* ``%PDF-`` prefix → ``pdf``; ``{\rtf`` prefix → ``rtf``.
* ZIP (``PK\\x03\\x04``) → peek the entry list once:
  ``word/document.xml`` → ``docx``; ``META-INF/container.xml`` or a
  first-entry ``mimetype`` of ``application/epub+zip`` → ``epub``.
* anything else → ``unknown`` (ValueError under ``on_error='fail'``,
  dropped under ``'skip'`` — the codec contract).

One Arrow ``mapInPandas`` pass, no shuffle; per-payload cost is the
underlying codec's.  At 100 TB this is the shape you want: the format
mix is decided per row inside the scan, so a 90%-PDF corpus never
pays a DOCX parse attempt, and adding a codec is one sniff branch.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["sniff_document_format", "office_extract", "OFFICE_SCHEMA"]


def sniff_document_format(payload: bytes) -> str:
    """``'pdf' | 'docx' | 'epub' | 'unknown'`` from magic bytes (see
    module doc)."""
    if payload[:5] == b"%PDF-":
        return "pdf"
    if payload[:5] == b"{\\rtf":
        return "rtf"
    if payload[:4] == b"PK\x03\x04":
        try:
            zf = zipfile.ZipFile(io.BytesIO(payload))
        except zipfile.BadZipFile:
            return "unknown"
        names = set(zf.namelist())
        if "word/document.xml" in names:
            return "docx"
        if "META-INF/container.xml" in names:
            return "epub"
        try:
            if zf.read("mimetype") == b"application/epub+zip":
                return "epub"
        except KeyError:
            pass
        return "unknown"
    return "unknown"


OFFICE_SCHEMA = (
    "doc_id bigint, format string, title string, text string, "
    "n_chars int"
)


def office_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Mixed PDF/DOCX/EPUB/RTF column → unified
    ``(id, format, title, text, n_chars)``.  Magic-byte routing per
    payload inside Arrow tasks; ``on_error='skip'`` drops unknown and
    undecodable payloads (dirty-corpus mode)."""
    from minerva_etl_spark.operators.docx import docx_extract_text
    from minerva_etl_spark.operators.epub import epub_extract_text
    from minerva_etl_spark.operators.pdf import pdf_extract_text
    from minerva_etl_spark.operators.rtf import rtf_extract_text

    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = OFFICE_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )
    parsers = {
        "pdf": pdf_extract_text,
        "docx": docx_extract_text,
        "epub": epub_extract_text,
        # RTF carries no title metadata -> title is NULL in the
        # unified schema
        "rtf": lambda b: {"title": None, **rtf_extract_text(b)},
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = sniff_document_format(payload)
                try:
                    if fmt == "unknown":
                        raise ValueError(
                            "unrecognized document payload (not "
                            "PDF/DOCX/EPUB)"
                        )
                    rec = parsers[fmt](payload)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, fmt, rec["title"], rec["text"], rec["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "title", "text", "n_chars"],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
