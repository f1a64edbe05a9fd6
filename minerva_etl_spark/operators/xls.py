"""Legacy .xls (Excel 97–2003 BIFF8) text extraction over OLE2/CFB
(round 13 — completing the legacy-office triple next to
`operators/msdoc.py`).

Implemented from the published MS-XLS specification on top of the
MS-CFB reader in `msdoc.py`: the ``Workbook`` stream is a BIFF record
sequence — 4-byte headers ``(type, length)`` — holding one workbook-
globals substream (the shared string table ``SST`` + one
``BoundSheet8`` per sheet with its substream offset and name) and one
substream per sheet (cell records).  Covered cell records:

* ``LabelSst`` — shared-string cells (the dominant text record);
  SST strings are XLUnicodeRichExtendedString: compressed (latin-1)
  or UTF-16 per the per-string ``fHighByte`` flag, rich-run and
  ext-block payloads skipped by their declared lengths, and strings
  SPLIT ACROSS ``Continue`` records re-read the flags byte at each
  continuation boundary (the format's classic trap — handled and
  pytest-pinned).
* ``Number`` (IEEE double) and ``RK`` / ``MulRk`` (the packed
  30-bit encodings: ×100 flag, integer vs float-top-bits) — rendered
  deterministically: integral values print as integers, others via
  ``repr``.
* ``BoolErr`` — ``TRUE``/``FALSE``; error cells render empty.
* ``Formula`` cells are skipped (documented: cached results live in
  a trailing ``String`` record only for text formulas; a formula
  engine is out of scope).

Sheets render in BoundSheet order (the workbook tab order), rows
sorted by row index, cells by column, TAB-joined — the
`xlsx.xlsx_extract` text contract, so the two Excel generations
produce comparable text.  Titles come from the shared
``\\x05SummaryInformation`` reader.  Rejects are honest ValueErrors
(non-CFB, CFB without a Workbook/Book stream, BIFF5-and-older
versions named).

The writer (:func:`synthesize_xls`) emits a real minimal BIFF8
workbook — globals (BOF, SST with a compressed/UTF-16 mix,
backpatched BoundSheet offsets, EOF) + per-sheet substreams
(LabelSst / Number / RK / BoolErr cells) — inside a real CFB with an
OLEPS title, so every fixture exercises the record walk end to end.

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
    "synthesize_xls",
    "xls_extract_text",
    "xls_extract",
    "XLS_EXTRACT_SCHEMA",
]

_R_BOF = 0x0809
_R_EOF = 0x000A
_R_BOUNDSHEET = 0x0085
_R_SST = 0x00FC
_R_CONTINUE = 0x003C
_R_LABELSST = 0x00FD
_R_NUMBER = 0x0203
_R_RK = 0x027E
_R_MULRK = 0x00BD
_R_BOOLERR = 0x0205
_R_FORMULA = 0x0006


# --------------------------------------------------------------- writer


def _rec(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def _bof(dt: int) -> bytes:
    # version 0x0600 (BIFF8), build/year/flags zeroed
    return _rec(
        _R_BOF, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0)
    )


def _sst_string(s: str, force_wide: bool = False) -> bytes:
    wide = force_wide or any(ord(c) > 0xFF for c in s)
    flags = 0x01 if wide else 0x00
    raw = s.encode("utf-16-le" if wide else "latin-1")
    return struct.pack("<HB", len(s), flags) + raw


def _int_to_rk(v: int, times100: bool = False) -> int:
    # RK integer encoding: value << 2 | 0b10 (fInt), bit0 = fX100
    return ((v & 0x3FFFFFFF) << 2) | 0x02 | (0x01 if times100 else 0x00)


def synthesize_xls(
    sheets: list[tuple[str, list[list[str]]]],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal BIFF8 .xls: text cells go through the SST as
    LabelSst (every second unique string forced UTF-16 so both
    fHighByte paths run), integer-looking cells alternate Number and
    RK records, ``TRUE``/``FALSE`` become BoolErr.  Deterministic
    bytes (fixed CFB layout)."""
    shared: list[str] = []
    shared_index: dict[str, int] = {}
    sheet_cells: list[list[tuple[int, int, bytes]]] = []
    n_label = 0
    for _, rows in sheets:
        cells: list[tuple[int, int, bytes]] = []
        for r, row in enumerate(rows):
            for c, val in enumerate(row):
                if val in ("TRUE", "FALSE"):
                    cells.append(
                        (
                            r,
                            c,
                            _rec(
                                _R_BOOLERR,
                                struct.pack(
                                    "<HHHBB", r, c, 0,
                                    1 if val == "TRUE" else 0, 0,
                                ),
                            ),
                        )
                    )
                    continue
                try:
                    iv = int(val)
                    is_int = str(iv) == val
                except ValueError:
                    is_int = False
                if is_int:
                    if abs(iv) < (1 << 29) and (r + c) % 2 == 0:
                        cells.append(
                            (
                                r,
                                c,
                                _rec(
                                    _R_RK,
                                    struct.pack(
                                        "<HHHI", r, c, 0,
                                        _int_to_rk(iv),
                                    ),
                                ),
                            )
                        )
                    else:
                        cells.append(
                            (
                                r,
                                c,
                                _rec(
                                    _R_NUMBER,
                                    struct.pack(
                                        "<HHHd", r, c, 0, float(iv)
                                    ),
                                ),
                            )
                        )
                    continue
                if val not in shared_index:
                    shared_index[val] = len(shared)
                    shared.append(val)
                n_label += 1
                cells.append(
                    (
                        r,
                        c,
                        _rec(
                            _R_LABELSST,
                            struct.pack(
                                "<HHHI", r, c, 0, shared_index[val]
                            ),
                        ),
                    )
                )
        sheet_cells.append(cells)
    sst_payload = struct.pack("<II", n_label, len(shared)) + b"".join(
        _sst_string(s, force_wide=(i % 2 == 1))
        for i, s in enumerate(shared)
    )
    sheet_streams = [
        _bof(0x0010) + b"".join(rec for _, _, rec in cells)
        + _rec(_R_EOF, b"")
        for cells in sheet_cells
    ]
    # globals: BOF + BoundSheets (offsets backpatched) + SST + EOF
    names = [
        struct.pack("<IBB", 0, 0, 0)  # lbPlyPos placeholder, hidden
        + struct.pack("<BB", len(name), 0)
        + name.encode("latin-1", "replace")
        for name, _ in sheets
    ]
    globals_len = (
        len(_bof(0x0005))
        + sum(4 + len(n) for n in names)
        + 4 + len(sst_payload)
        + 4
    )
    offsets = []
    pos = globals_len
    for ss in sheet_streams:
        offsets.append(pos)
        pos += len(ss)
    bound = b"".join(
        _rec(
            _R_BOUNDSHEET,
            struct.pack("<I", off) + n[4:],
        )
        for off, n in zip(offsets, names)
    )
    workbook = (
        _bof(0x0005)
        + bound
        + _rec(_R_SST, sst_payload)
        + _rec(_R_EOF, b"")
        + b"".join(sheet_streams)
    )
    streams = [("Workbook", workbook.ljust(_MINI_CUTOFF, b"\x00"))]
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


def _records(blob: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(type, offset, payload) for every BIFF record; tolerant of the
    zero-padded tail the CFB writer leaves."""
    pos = 0
    n = len(blob)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", blob, pos)
        if rtype == 0 and rlen == 0:
            break  # zero padding tail
        yield rtype, pos, blob[pos + 4 : pos + 4 + rlen]
        pos += 4 + rlen


def _parse_sst(
    payload: bytes, continues: list[bytes]
) -> list[str]:
    """The SST with Continue handling: strings may split at record
    boundaries, and each continuation re-declares the fHighByte flag
    for ITS fragment (MS-XLS 2.5.293)."""
    chunks = [payload] + continues
    ci = 0
    pos = 8  # skip cstTotal/cstUnique
    (n_unique,) = struct.unpack_from("<I", payload, 4)

    def remaining() -> int:
        return len(chunks[ci]) - pos

    def advance_chunk() -> None:
        nonlocal ci, pos
        ci += 1
        pos = 0
        if ci >= len(chunks):
            raise ValueError("SST truncated (missing Continue)")

    def read(nbytes: int) -> bytes:
        nonlocal pos
        out = b""
        need = nbytes
        while need:
            if remaining() == 0:
                advance_chunk()
            take = min(need, remaining())
            out += chunks[ci][pos : pos + take]
            pos += take
            need -= take
        return out

    strings: list[str] = []
    for _ in range(n_unique):
        if remaining() < 3:
            advance_chunk()
        cch, flags = struct.unpack("<HB", read(3))
        rich = bool(flags & 0x08)
        ext = bool(flags & 0x04)
        c_run = struct.unpack("<H", read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", read(4))[0] if ext else 0
        wide = bool(flags & 0x01)
        got: list[str] = []
        left = cch
        while left:
            if remaining() == 0:
                advance_chunk()
                # continuation fragments re-declare the width flag
                wide = bool(read(1)[0] & 0x01)
            avail = remaining() // (2 if wide else 1)
            take = min(left, avail)
            if take == 0:
                # A wide fragment with a single odd byte left (or an
                # empty tail with no Continue) can never make
                # progress; fail fast instead of spinning forever.
                raise ValueError(
                    "SST truncated (fragment too short for one "
                    "character)"
                )
            raw = read(take * (2 if wide else 1))
            got.append(
                raw.decode("utf-16-le" if wide else "latin-1",
                           "replace")
            )
            left -= take
        read(c_run * 4 + cb_ext)  # rich runs + ext block
        strings.append("".join(got))
    return strings


def _rk_value(rk: int) -> str:
    x100 = rk & 0x01
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:  # sign-extend the 30-bit int
            v -= 1 << 30
        if x100:
            return _num_str(v / 100.0)
        return str(v)
    raw = struct.pack("<Q", (rk & 0xFFFFFFFC) << 32)
    (d,) = struct.unpack("<d", raw)
    return _num_str(d / 100.0 if x100 else d)


def _num_str(d: float) -> str:
    if d == int(d) and abs(d) < (1 << 53):
        return str(int(d))
    return repr(d)


def xls_extract_text(payload: bytes) -> dict:
    """Parse one legacy .xls payload → ``{title, n_sheets, n_rows,
    n_cells, text, n_chars}`` (the `xlsx_extract_text` shape).
    Raises ``ValueError`` for non-CFB bytes, non-Excel compound
    files, and pre-BIFF8 versions."""
    cfb = _Cfb(payload)
    blob = None
    for name in ("Workbook", "Book"):
        try:
            blob = cfb.read(name)
            break
        except KeyError:
            continue
    if blob is None:
        raise ValueError(
            "OLE2 container without a Workbook/Book stream (not an "
            ".xls)"
        )
    recs = list(_records(blob))
    if not recs or recs[0][0] != _R_BOF:
        raise ValueError("Workbook stream without a BOF record")
    (version,) = struct.unpack_from("<H", recs[0][2], 0)
    if version != 0x0600:
        raise ValueError(
            f"unsupported BIFF version 0x{version:04X} (BIFF8 only — "
            f"pre-Excel-97 workbooks are a named reject)"
        )
    # globals pass: sheet directory + SST (with its Continue tail)
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    i = 0
    while i < len(recs):
        rtype, off, pl = recs[i]
        if rtype == 0x002F:  # FilePass: the stream is encrypted
            raise ValueError(
                "RC4/XOR-encrypted workbook (FilePass) — route "
                "through offcrypto.decrypt_xls_rc4 / "
                "office.office_decrypt_extract"
            )
        if rtype == _R_BOUNDSHEET:
            (ply,) = struct.unpack_from("<I", pl, 0)
            cch = pl[6]
            flags = pl[7]
            raw = pl[8 : 8 + cch * (2 if flags & 1 else 1)]
            name = raw.decode(
                "utf-16-le" if flags & 1 else "latin-1", "replace"
            )
            sheets.append((name, ply))
        elif rtype == _R_SST:
            conts = []
            j = i + 1
            while j < len(recs) and recs[j][0] == _R_CONTINUE:
                conts.append(recs[j][2])
                j += 1
            sst = _parse_sst(pl, conts)
        elif rtype == _R_EOF:
            break
        i += 1
    rec_at = {off: (rtype, pl) for rtype, off, pl in recs}
    blocks: list[str] = []
    n_rows = 0
    n_cells = 0
    for name, ply in sheets:
        if ply not in rec_at or rec_at[ply][0] != _R_BOF:
            raise ValueError(
                f"BoundSheet offset {ply} does not point at a BOF"
            )
        # cells grouped per row as they stream (r15: the xlsb fix
        # applied here too) — a 100k-row sheet renders
        # O(cells log cols), never O(rows × cells)
        by_row: dict[int, dict[int, str]] = {}
        started = False
        for rtype, off, pl in recs:
            if off < ply:
                continue
            if rtype == _R_BOF:
                if started:
                    break  # next substream
                started = True
                continue
            if rtype == _R_EOF:
                break
            if rtype == _R_LABELSST:
                r, c, _x, isst = struct.unpack_from("<HHHI", pl, 0)
                if not 0 <= isst < len(sst):
                    raise ValueError(
                        f"LabelSst index {isst} out of range "
                        f"({len(sst)} strings)"
                    )
                by_row.setdefault(r, {})[c] = sst[isst]
            elif rtype == _R_NUMBER:
                r, c, _x, d = struct.unpack_from("<HHHd", pl, 0)
                by_row.setdefault(r, {})[c] = _num_str(d)
            elif rtype == _R_RK:
                r, c, _x, rk = struct.unpack_from("<HHHI", pl, 0)
                by_row.setdefault(r, {})[c] = _rk_value(rk)
            elif rtype == _R_MULRK:
                r, c0 = struct.unpack_from("<HH", pl, 0)
                n_rk = (len(pl) - 6) // 6
                for k in range(n_rk):
                    (rk,) = struct.unpack_from("<I", pl, 4 + 6 * k + 2)
                    by_row.setdefault(r, {})[c0 + k] = _rk_value(rk)
            elif rtype == _R_BOOLERR:
                r, c, _x, v, is_err = struct.unpack_from(
                    "<HHHBB", pl, 0
                )
                by_row.setdefault(r, {})[c] = (
                    "" if is_err else ("TRUE" if v else "FALSE")
                )
            # _R_FORMULA and everything else: skipped (documented)
        rows_out: list[str] = []
        for r in sorted(by_row):
            cols = by_row[r]
            rows_out.append(
                "\t".join(cols[c] for c in sorted(cols))
            )
            n_rows += 1
            n_cells += len(cols)
        blocks.append(
            name + ("\n" + "\n".join(rows_out) if rows_out else "")
        )
    text = "\n".join(blocks)
    title = None
    try:
        title = _summary_title(cfb.read(_SUMMARY_STREAM))
    except KeyError:
        pass
    return {
        "title": title,
        "n_sheets": len(sheets),
        "n_rows": n_rows,
        "n_cells": n_cells,
        "text": text,
        "n_chars": len(text),
    }


XLS_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_sheets int, n_rows int, "
    "n_cells int, text string, n_chars int"
)


def xls_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Legacy .xls → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = XLS_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = xls_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_sheets"],
                        rec["n_rows"],
                        rec["n_cells"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "title", "n_sheets", "n_rows", "n_cells",
                    "text", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
