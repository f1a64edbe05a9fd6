"""Legacy .ppt (PowerPoint 97–2003) text extraction over OLE2/CFB
(round 13 — the third leg of the legacy-office triple, after
`msdoc.py` and `xls.py`).

Implemented from the published MS-PPT specification: the
``PowerPoint Document`` stream is a tree of records with 8-byte
headers ``(recVerAndInstance uint16, recType uint16, recLen
uint32)``; a record whose ``recVer`` nibble is ``0xF`` is a
CONTAINER whose payload is more records.  Visible text lives in two
atom types — ``TextCharsAtom`` (0x0FA0, UTF-16LE) and
``TextBytesAtom`` (0x0FA8, one-byte cp1252) — plus ``CStringAtom``
(0x0FBA, UTF-16LE) for titles/notes metadata strings.  The reader
walks the container tree depth-first in byte order (document order —
the order the SlideListWithText container stores slide text) and
collects text atoms; PowerPoint's ``\\r`` paragraph separators
normalize to NEWLINE.  Titles come from the shared
``\\x05SummaryInformation`` property-set reader.

Rejects are honest ValueErrors: non-CFB bytes and compound files
without a ``PowerPoint Document`` stream (an .xls/.doc lands in its
own codec via the office dispatcher).

The writer (:func:`synthesize_ppt`) emits a real minimal record tree
— a Document container holding a SlideListWithText with one
TextHeaderAtom + text atom per paragraph block, alternating
TextBytesAtom / TextCharsAtom so both decode paths run on every
fixture — inside a real CFB with an OLEPS title.

Reference parity note: document-ingest extension arc.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from minerva_etl_spark.operators.msdoc import (
    _build_cfb,
    _Cfb,
    _MINI_CUTOFF,
    _summary_info_stream,
    _SUMMARY_STREAM,
    _summary_title,
)

__all__ = [
    "synthesize_ppt",
    "ppt_extract_text",
    "ppt_extract",
    "PPT_EXTRACT_SCHEMA",
]

_PPT_STREAM = "PowerPoint Document"
_RT_DOCUMENT = 0x03E8
_RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
_RT_TEXT_HEADER_ATOM = 0x0F9F
_RT_TEXT_CHARS_ATOM = 0x0FA0
_RT_TEXT_BYTES_ATOM = 0x0FA8
_RT_CSTRING_ATOM = 0x0FBA


# --------------------------------------------------------------- writer


def _atom(rec_type: int, payload: bytes, instance: int = 0) -> bytes:
    return (
        struct.pack("<HHI", (instance << 4), rec_type, len(payload))
        + payload
    )


def _container(rec_type: int, payload: bytes) -> bytes:
    return (
        struct.pack("<HHI", 0x000F, rec_type, len(payload)) + payload
    )


def synthesize_ppt(
    slides: list[list[str]],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal binary .ppt: one TextHeaderAtom + text atom
    per paragraph, paragraphs within a slide joined by ``\\r`` inside
    the atom; even atom indexes use TextBytesAtom (cp1252), odd ones
    TextCharsAtom (UTF-16) — non-latin text upgrades to chars
    automatically.  Deterministic bytes."""
    body = []
    k = 0
    for paras in slides:
        text = "\r".join(paras)
        body.append(_atom(_RT_TEXT_HEADER_ATOM, struct.pack("<I", 0)))
        wide = k % 2 == 1 or any(ord(c) > 0xFF for c in text)
        if wide:
            body.append(
                _atom(_RT_TEXT_CHARS_ATOM, text.encode("utf-16-le"))
            )
        else:
            body.append(
                _atom(
                    _RT_TEXT_BYTES_ATOM,
                    text.encode("cp1252", "replace"),
                )
            )
        k += 1
    doc = _container(
        _RT_DOCUMENT,
        _container(_RT_SLIDE_LIST_WITH_TEXT, b"".join(body)),
    )
    streams = [(_PPT_STREAM, doc.ljust(_MINI_CUTOFF, b"\x00"))]
    if any(v is not None for v in (title, author, created)):
        streams.append(
            (
                _SUMMARY_STREAM,
                _summary_info_stream(
                    title, author=author, created=created
                ).ljust(
                    _MINI_CUTOFF, b"\x00"
                ),
            )
        )
    return _build_cfb(streams)


# --------------------------------------------------------------- reader


def _walk_text(blob: bytes, start: int, end: int,
               out: list[str]) -> None:
    # EXPLICIT stack, not recursion: a hostile file can nest
    # containers ~1 level per 8 bytes, which would blow Python's
    # recursion limit (an escape from the codec's ValueError
    # contract) long before it costs any real memory here.
    stack = [(start, end)]
    while stack:
        pos, seg_end = stack.pop()
        while pos + 8 <= seg_end:
            ver_inst, rtype, rlen = struct.unpack_from(
                "<HHI", blob, pos
            )
            if rtype == 0 and rlen == 0 and ver_inst == 0:
                break  # zero padding tail
            payload_start = pos + 8
            payload_end = min(payload_start + rlen, seg_end)
            if (ver_inst & 0x000F) == 0x000F:
                # resume the remainder of THIS level after the
                # container's subtree (document order preserved:
                # LIFO pops the subtree first)
                stack.append((payload_end, seg_end))
                stack.append((payload_start, payload_end))
                pos = seg_end  # terminate current scan; resumed above
                break
            if rtype == _RT_TEXT_CHARS_ATOM:
                out.append(
                    blob[payload_start:payload_end].decode(
                        "utf-16-le", "replace"
                    )
                )
            elif rtype == _RT_TEXT_BYTES_ATOM:
                out.append(
                    blob[payload_start:payload_end].decode(
                        "cp1252", "replace"
                    )
                )
            pos = payload_end


def ppt_extract_text(payload: bytes) -> dict:
    """Parse one legacy .ppt payload → ``{title, n_texts,
    n_paragraphs, text, n_chars}``.  Raises ``ValueError`` for
    non-CFB bytes and non-PowerPoint compound files."""
    cfb = _Cfb(payload)
    try:
        blob = cfb.read(_PPT_STREAM)
    except KeyError:
        raise ValueError(
            "OLE2 container without a PowerPoint Document stream "
            "(not a .ppt)"
        ) from None
    try:
        cu = cfb.read("Current User")
        # the CurrentUserAtom's encrypted-document token (r16): a
        # named reject instead of walking ciphertext records
        if (
            len(cu) >= 16
            and struct.unpack_from("<I", cu, 12)[0] == 0xF3D1C4DF
        ):
            raise ValueError(
                "encrypted PowerPoint document (RC4 CryptoAPI "
                "header token) — decrypt with "
                "offcrypto.decrypt_ppt_rc4 first"
            )
    except KeyError:
        pass
    atoms: list[str] = []
    _walk_text(blob, 0, len(blob), atoms)
    norm = [
        a.replace("\r", "\n").rstrip("\x00") for a in atoms
    ]
    text = "\n".join(n for n in norm if n != "")
    paragraphs = [p for p in text.split("\n")] if text else []
    title = None
    try:
        title = _summary_title(cfb.read(_SUMMARY_STREAM))
    except KeyError:
        pass
    return {
        "title": title,
        "n_texts": len(atoms),
        "n_paragraphs": len(paragraphs),
        "text": text,
        "n_chars": len(text),
    }


PPT_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_texts int, n_paragraphs int, "
    "text string, n_chars int"
)


def ppt_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Legacy .ppt → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = PPT_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = ppt_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_texts"],
                        rec["n_paragraphs"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "title", "n_texts", "n_paragraphs",
                    "text", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
