"""Outlook .msg extraction (MS-OXMSG over OLE2/CFB) — the binary leg
of the mail-corpus arc next to `email_ingest.py`'s EML/MBOX (round
13).

An Outlook message is a CFB compound file whose TOP-LEVEL streams
carry the message's MAPI properties as ``__substg1.0_PPPPTTTT``
streams — ``PPPP`` the property id, ``TTTT`` the type: ``001F``
UTF-16LE string, ``001E`` 8-bit string.  Recipients and attachments
live in NESTED ``__recip_version1.0_#N`` / ``__attach_version1.0_#N``
storages whose own property streams reuse the same names — so the
reader walks the directory's red-black sibling tree from the root's
child and reads ONLY top-level streams (`msdoc._Cfb.top_level`),
never an attachment's subject.

Extracted properties (the corpus-relevant core):

* ``0x0037`` subject, ``0x1000`` body, ``0x0C1A`` sender name,
  ``0x0E04`` display-to — each accepted as 001F or 001E.
* ``n_recipients`` counts the nested ``__recip_version1.0_#N``
  storages (the tree walk's other product).

Rejects are honest ValueErrors: non-CFB bytes and compound files
without any ``__substg1.0_`` stream (a .doc/.xls routes to its own
codec via the office dispatcher; `sniff_document_format` tags this
family ``msg``).

The writer (:func:`synthesize_msg`) emits a real minimal .msg —
top-level property streams (alternating 001F/001E per property so
both decodes run), a ``__properties_version1.0`` stub, and one
nested recipient storage carrying a DECOY subject stream that the
tree walk must not surface.

Reference parity note: document-ingest extension arc
(`email_ingest.py` parses the WIRE formats; this is the desktop
archive format those mails get exported to).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from minerva_etl_spark.operators.msdoc import (
    _Cfb,
    _CFB_MAGIC,
    _dir_entry,
    _ENDOFCHAIN,
    _FREESECT,
    _MINI_CUTOFF,
    _SECT,
)

__all__ = [
    "synthesize_msg",
    "msg_extract_text",
    "msg_extract",
    "MSG_EXTRACT_SCHEMA",
]

_P_SUBJECT = 0x0037
_P_BODY = 0x1000
_P_SENDER = 0x0C1A
_P_TO = 0x0E04


def _stg_name(prop: int, wide: bool) -> str:
    return f"__substg1.0_{prop:04X}{'001F' if wide else '001E'}"


# --------------------------------------------------------------- writer


def synthesize_msg(
    subject: str,
    body: str,
    sender: str = "",
    to: str = "",
    wide: bool = True,
    nested_decoy: str | None = None,
) -> bytes:
    """Build a minimal .msg: the four core property streams
    (``wide`` selects 001F UTF-16 vs 001E cp1252 for ALL of them —
    non-latin text requires ``wide``), a ``__properties_version1.0``
    stub, and ONE nested recipient storage whose decoy subject
    stream must never leak into extraction.  Deterministic bytes.
    ``nested_decoy`` adds one extra stream of that name INSIDE the
    nested storage (e.g. ``"WordDocument"`` — an OLE-embedded Word
    attachment's tell-tale) to pin that format sniffing only looks
    at top-level entries."""

    def enc(s: str) -> bytes:
        raw = (
            s.encode("utf-16-le") if wide
            else s.encode("cp1252", "replace")
        )
        return raw

    pad = _MINI_CUTOFF
    top_streams = [
        (_stg_name(_P_SUBJECT, wide), enc(subject)),
        (_stg_name(_P_BODY, wide), enc(body)),
        (_stg_name(_P_SENDER, wide), enc(sender)),
        (_stg_name(_P_TO, wide), enc(to)),
        ("__properties_version1.0", b"\x00" * 32),
    ]
    recip_streams = [
        (_stg_name(0x3001, True), "Decoy Recipient".encode("utf-16-le")),
        (_stg_name(_P_SUBJECT, True), "DECOY".encode("utf-16-le")),
    ]
    if nested_decoy is not None:
        recip_streams.append(
            (nested_decoy, b"\x00" * 16)
        )
    # hand-rolled CFB with one nested storage (msdoc._build_cfb is
    # flat-only): sector plan [FAT][DIR...][stream sectors]
    # pad stream CONTENT to the mini-cutoff (this writer emits no
    # mini stream) and record the padded size; the zero tail is
    # stripped on decode (UTF-16/cp1252 NULs → rstrip('\\x00'))
    all_streams = [
        (name, data.ljust(pad, b"\x00"))
        for name, data in top_streams + recip_streams
    ]
    padded = [
        (name, data, len(data)) for name, data in all_streams
    ]
    n_entries = 2 + len(padded)  # root + recip storage + streams
    n_dir_sect = (n_entries * 128 + _SECT - 1) // _SECT
    stream_sects = [(a + _SECT - 1) // _SECT for _, _, a in padded]
    total_payload = n_dir_sect + sum(stream_sects)
    nfat = 1
    while (nfat + total_payload) > nfat * (_SECT // 4):
        nfat += 1
    fat = [_FREESECT] * (nfat * (_SECT // 4))
    for i in range(nfat):
        fat[i] = 0xFFFFFFFD
    dir_start = nfat
    for i in range(n_dir_sect):
        fat[dir_start + i] = (
            _ENDOFCHAIN if i == n_dir_sect - 1 else dir_start + i + 1
        )
    starts = []
    cur = dir_start + n_dir_sect
    for ns in stream_sects:
        starts.append(cur)
        for i in range(ns):
            fat[cur + i] = _ENDOFCHAIN if i == ns - 1 else cur + i + 1
        cur += ns
    # directory ids: 0 root, 1..5 top streams, 6 recip storage,
    # 7..8 recip streams.  Top-level sibling chain: 1→2→3→4→5→6.
    n_top = len(top_streams)
    entries = [_dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)]
    for i, (name, data, _a) in enumerate(padded[:n_top]):
        entries.append(
            _dir_entry(
                name, 2, starts[i], len(data),
                right=(i + 2 if i + 1 < n_top else n_top + 1),
            )
        )
    entries.append(
        _dir_entry(
            "__recip_version1.0_#00000000", 1, 0, 0,
            child=n_top + 2,
        )
    )
    for j, (name, data, _a) in enumerate(padded[n_top:]):
        gi = n_top + j
        entries.append(
            _dir_entry(
                name, 2, starts[gi], len(data),
                right=(n_top + 3 + j if j + 1 < len(recip_streams)
                       else _FREESECT),
            )
        )
    dir_blob = b"".join(entries).ljust(n_dir_sect * _SECT, b"\x00")
    header = (
        _CFB_MAGIC
        + b"\x00" * 16
        + struct.pack("<HH", 0x003E, 0x0003)
        + struct.pack("<H", 0xFFFE)
        + struct.pack("<HH", 9, 6)
        + b"\x00" * 6
        + struct.pack("<I", 0)
        + struct.pack("<I", nfat)
        + struct.pack("<I", dir_start)
        + struct.pack("<I", 0)
        + struct.pack("<I", _MINI_CUTOFF)
        + struct.pack("<I", _ENDOFCHAIN)
        + struct.pack("<I", 0)
        + struct.pack("<I", _ENDOFCHAIN)
        + struct.pack("<I", 0)
        + struct.pack(
            "<109I",
            *[(i if i < nfat else _FREESECT) for i in range(109)],
        )
    )
    out = [header]
    for i in range(nfat):
        out.append(
            struct.pack(
                f"<{_SECT // 4}I",
                *fat[i * (_SECT // 4) : (i + 1) * (_SECT // 4)],
            )
        )
    out.append(dir_blob)
    for (name, data, _a), ns in zip(padded, stream_sects):
        out.append(data.ljust(ns * _SECT, b"\x00"))
    return b"".join(out)


# --------------------------------------------------------------- reader


def msg_extract_text(payload: bytes) -> dict:
    """Parse one .msg payload → ``{subject, sender, to, body,
    n_recipients, n_chars}``.  Raises ``ValueError`` for non-CFB
    bytes and compound files without message property streams."""
    cfb = _Cfb(payload)
    top = cfb.top_level()
    props: dict[int, str] = {}
    n_recip = 0
    saw_substg = False
    for ent in top:
        name = ent["name"]
        if ent["type"] == 1 and name.startswith("__recip_version1.0"):
            n_recip += 1
            continue
        if ent["type"] != 2 or not name.startswith("__substg1.0_"):
            continue
        saw_substg = True
        tag = name[len("__substg1.0_"):]
        if len(tag) != 8:
            continue
        try:
            prop = int(tag[:4], 16)
            ptype = int(tag[4:], 16)
        except ValueError:
            continue
        if ptype not in (0x001F, 0x001E):
            continue
        raw = cfb.read_entry(ent)
        props[prop] = (
            raw.decode("utf-16-le", "replace")
            if ptype == 0x001F
            else raw.decode("cp1252", "replace")
        ).rstrip("\x00")
    if not saw_substg:
        raise ValueError(
            "OLE2 container without __substg1.0_ property streams "
            "(not a .msg)"
        )
    body = props.get(_P_BODY, "")
    return {
        "subject": props.get(_P_SUBJECT),
        "sender": props.get(_P_SENDER),
        "to": props.get(_P_TO),
        "body": body,
        "n_recipients": n_recip,
        "n_chars": len(body),
    }


MSG_EXTRACT_SCHEMA = (
    "doc_id bigint, subject string, sender string, to string, "
    "body string, n_recipients int, n_chars int"
)


def msg_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Outlook .msg → message fields over a binary column:
    shuffle-free Arrow ``mapInPandas`` (the `pdf_extract`
    contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = MSG_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = msg_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["subject"],
                        rec["sender"],
                        rec["to"],
                        rec["body"],
                        rec["n_recipients"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "subject", "sender", "to", "body",
                    "n_recipients", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
