"""Charset detection + decoding for crawl payloads.

A real crawl's HTTP bodies are a charset mess: the HTTP header says
one thing, the ``<meta>`` tag another, and a fifth of pages say
nothing at all.  This module implements the WHATWG-ish resolution
order browsers use, pure stdlib, and runs it Arrow-batched so a
100-TB decode is a shuffle-free in-task scan (the same posture as the
media codecs):

1. BOM sniff (UTF-8 / UTF-16 LE/BE) — highest priority;
2. ``charset=`` in the HTTP ``Content-Type`` header value;
3. ``<meta charset=...>`` or ``<meta http-equiv="Content-Type"
   content="...charset=...">`` in the first 1024 bytes (ASCII-compat
   scan, exactly how browsers pre-scan);
4. default ``utf-8``, with ``errors='replace'`` so a mislabeled page
   yields U+FFFD instead of killing a million-task job.

``windows-1252``/``latin-1`` aliasing follows the WHATWG rule
(``iso-8859-1`` is decoded as ``windows-1252`` — the bytes sites
actually send).
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?([A-Za-z0-9_.:-]+))""",
    re.IGNORECASE,
)
_CT_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.IGNORECASE)

#: WHATWG-style label fixups: the bytes the web actually sends
_ALIASES = {
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
}


def _normalize_label(label: str) -> str | None:
    label = label.strip().strip(";\"'").lower()
    label = _ALIASES.get(label, label)
    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label


def detect_charset(
    body: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """Return ``(charset, source)`` where source is one of ``bom``,
    ``header``, ``meta``, ``default``."""
    body = bytes(body or b"")
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if body[:2] == b"\xff\xfe":
        return "utf-16-le", "bom"
    if body[:2] == b"\xfe\xff":
        return "utf-16-be", "bom"
    if content_type:
        m = _CT_RE.search(content_type)
        if m:
            label = _normalize_label(m.group(1))
            if label:
                return label, "header"
    m = _META_RE.search(body[:1024])
    if m:
        label = _normalize_label(m.group(1).decode("ascii", "replace"))
        if label:
            return label, "meta"
    return "utf-8", "default"


def decode_body(
    body: bytes, content_type: str | None = None
) -> tuple[str, str, str]:
    """Decode a payload to text: ``(text, charset, source)``.
    ``errors='replace'`` — one mislabeled page must not kill the job;
    count U+FFFD downstream to find them."""
    charset, source = detect_charset(body, content_type)
    text = bytes(body or b"").decode(charset, "replace")
    # browsers strip the BOM from the decoded stream; utf-8-sig does
    # it in the codec, the utf-16 variants leave U+FEFF behind
    if source == "bom" and text[:1] == "﻿":
        text = text[1:]
    return text, charset, source


def decode_text(
    df: DataFrame,
    body_col: str = "body",
    content_type_col: str | None = "content_type",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, body binary[, content_type]) → (id, text, charset,
    charset_source), Arrow-batched, shuffle-free.  The step between
    `read_warc`'s response bodies and `html_extract`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cts = (
                pdf[content_type_col]
                if content_type_col and content_type_col in pdf.columns
                else [None] * len(pdf)
            )
            texts, charsets, sources = [], [], []
            for body, ct in zip(pdf[body_col], cts):
                text, cs, src = decode_body(
                    body, None if ct is None else str(ct)
                )
                texts.append(text)
                charsets.append(cs)
                sources.append(src)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "text": texts,
                    "charset": charsets,
                    "charset_source": sources,
                }
            )

    cols = [id_col, body_col] + (
        [content_type_col] if content_type_col else []
    )
    return df.select(*cols).mapInPandas(
        run,
        f"{id_col} bigint, text string, charset string, "
        "charset_source string",
    )
