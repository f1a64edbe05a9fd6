"""Legacy .doc (Word 97–2003 binary) text extraction over OLE2/CFB
containers (round 13; the r12 verdict's ask 6).

Two public formats compose here, both implemented from the published
Microsoft specifications (MS-CFB and MS-DOC; the same layering public
extractors like antiword/catdoc use):

* **OLE2 / CFB (MS-CFB)** — the compound-file container: 512-byte
  header (magic ``D0 CF 11 E0 A1 B1 1A E1``), a FAT of uint32 sector
  chains located via the header DIFAT (+ DIFAT chain for huge files),
  a directory stream of 128-byte entries (UTF-16 names, stream start
  sector + size), and a mini-FAT over 64-byte mini-sectors inside the
  root entry's stream for streams under the 4096-byte cutoff.  The
  reader here implements all of that (FAT, DIFAT chain, directory
  tree, mini stream); chain walks are cycle-guarded so a corrupt file
  raises instead of spinning.
* **MS-DOC** — the Word layer inside the ``WordDocument`` stream: the
  FIB (``wIdent = 0xA5EC``), the ``fWhichTblStm`` bit selecting the
  ``0Table``/``1Table`` stream, and the CLX → PlcPcd **piece table**
  mapping character positions to file ranges, each piece either
  cp1252 ("compressed", fc bit 30 set, byte offset = fc/2) or
  UTF-16LE.  Word's control characters normalize deterministically:
  ``\\r`` (paragraph mark) → NEWLINE, ``\\x0b`` (line break) →
  NEWLINE, ``\\x07`` (cell/row mark) → TAB, ``\\x0c`` (page/section
  break) → NEWLINE; field characters (``\\x13/\\x14/\\x15``) and
  remaining C0 controls are dropped.  Pre-97 files (no CLX) fall back
  to the fcMin..fcMac cp1252 run, per the spec's legacy path.

Like every codec in this arc the Spark surface is a shuffle-free
Arrow ``mapInPandas`` (`pdf_extract` contract), and rejects are
honest ``ValueError``\\ s: non-CFB bytes, CFB without a
``WordDocument`` stream (an .xls/.ppt/.msi lands here, tagged by the
dispatcher as ``ole2``), and a WordDocument without the 0xA5EC FIB.

The writer (:func:`synthesize_doc`) emits a real minimal CFB
(header + FAT + directory + padded streams, no mini stream) whose
WordDocument carries a spec-shaped FIB and whose 0Table carries a
two-piece CLX — piece 1 cp1252, piece 2 UTF-16LE — so the reader's
both decode paths are exercised by every fixture document.  Fixed
layout → byte-deterministic output.

Reference parity note: document-ingest extension arc (`pdf.py`,
`docx.py`, `epub.py`, `rtf.py`, `xlsx.py`, `pptx.py`).
"""

from __future__ import annotations

import io
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_doc",
    "cfb_list_streams",
    "cfb_read_stream",
    "doc_extract_text",
    "doc_extract",
    "DOC_EXTRACT_SCHEMA",
]

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_MINI_CUTOFF = 4096
_SECT = 512
_MINISECT = 64


# --------------------------------------------------------------- writer


def _dir_entry(
    name: str,
    obj_type: int,
    start: int,
    size: int,
    left: int = _FREESECT,
    right: int = _FREESECT,
    child: int = _FREESECT,
) -> bytes:
    raw = name.encode("utf-16-le")
    ent = raw.ljust(64, b"\x00")
    return (
        ent
        + struct.pack("<H", len(raw) + 2)
        + struct.pack("<BB", obj_type, 1)  # type, black
        + struct.pack("<III", left, right, child)
        + b"\x00" * 16  # clsid
        + b"\x00" * 4  # state bits
        + b"\x00" * 16  # create/modify times
        + struct.pack("<I", start)
        + struct.pack("<Q", size)
    )


def _build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal CFB with the given streams, each padded to the 4096
    mini-cutoff so no mini stream is needed (the READER still
    supports mini streams for real files)."""
    padded = [
        (name, data, max(len(data), _MINI_CUTOFF))
        for name, data in streams
    ]
    n_dir_sect = (1 + len(padded) + 3) * 128 // _SECT + 1
    # sector plan: [FAT x nfat][DIR x ndir][stream sectors...]
    stream_sects = [
        (alloc + _SECT - 1) // _SECT for _, _, alloc in padded
    ]
    total_payload = n_dir_sect + sum(stream_sects)
    nfat = 1
    while (nfat + total_payload) > nfat * (_SECT // 4):
        nfat += 1
    if nfat > 109:
        raise ValueError("synthesize_doc: payload too large for the "
                         "single-DIFAT writer (~7 MB)")
    total_sects = nfat + total_payload
    fat = [_FREESECT] * (nfat * (_SECT // 4))
    for i in range(nfat):
        fat[i] = _FATSECT
    dir_start = nfat
    for i in range(n_dir_sect):
        fat[dir_start + i] = (
            _ENDOFCHAIN if i == n_dir_sect - 1 else dir_start + i + 1
        )
    starts = []
    cur = dir_start + n_dir_sect
    for nsect in stream_sects:
        starts.append(cur)
        for i in range(nsect):
            fat[cur + i] = _ENDOFCHAIN if i == nsect - 1 else cur + i + 1
        cur += nsect
    # directory: root (child -> entry 1), then a left-spine tree
    entries = [
        _dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1),
    ]
    for i, (name, data, _) in enumerate(padded):
        right = i + 2 if i + 1 < len(padded) else _FREESECT
        entries.append(
            _dir_entry(name, 2, starts[i], len(data), right=right)
        )
    dir_blob = b"".join(entries)
    dir_blob = dir_blob.ljust(n_dir_sect * _SECT, b"\x00")
    header = (
        _CFB_MAGIC
        + b"\x00" * 16  # clsid
        + struct.pack("<HH", 0x003E, 0x0003)  # minor, major
        + struct.pack("<H", 0xFFFE)  # little-endian marker
        + struct.pack("<HH", 9, 6)  # sector shift, mini shift
        + b"\x00" * 6
        + struct.pack("<I", 0)  # num dir sectors (v3: 0)
        + struct.pack("<I", nfat)
        + struct.pack("<I", dir_start)
        + struct.pack("<I", 0)  # transaction
        + struct.pack("<I", _MINI_CUTOFF)
        + struct.pack("<I", _ENDOFCHAIN)  # first minifat
        + struct.pack("<I", 0)  # num minifat
        + struct.pack("<I", _ENDOFCHAIN)  # first difat
        + struct.pack("<I", 0)  # num difat
    )
    difat = [(i if i < nfat else _FREESECT) for i in range(109)]
    header += struct.pack("<109I", *difat)
    assert len(header) == _SECT
    out = io.BytesIO()
    out.write(header)
    for i in range(nfat):
        out.write(
            struct.pack(
                f"<{_SECT // 4}I",
                *fat[i * (_SECT // 4) : (i + 1) * (_SECT // 4)],
            )
        )
    out.write(dir_blob)
    for (name, data, alloc), nsect in zip(padded, stream_sects):
        out.write(data.ljust(nsect * _SECT, b"\x00"))
    blob = out.getvalue()
    assert len(blob) == (1 + total_sects) * _SECT
    return blob


#: SummaryInformation FMTID F29F85E0-4FF9-1068-AB91-08002B27B3D9
#: in its on-disk little-endian layout (MS-OLEPS)
_SUMMARY_FMTID = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
_SUMMARY_STREAM = "\x05SummaryInformation"
_VT_I2 = 2
_VT_LPSTR = 30
_VT_LPWSTR = 31
_VT_FILETIME = 64
_PID_CODEPAGE = 1
_PID_TITLE = 2
_PID_AUTHOR = 4
_PID_CREATE_DTM = 12
_PID_LASTSAVE_DTM = 13

#: FILETIME epoch (1601-01-01) to Unix epoch, in seconds
_FILETIME_EPOCH_S = 11644473600


def _iso_to_filetime(iso: str) -> int:
    """``YYYY-MM-DD HH:MM:SS`` (UTC) → FILETIME 100-ns ticks."""
    import calendar
    import datetime as _dt

    dt = _dt.datetime.strptime(iso, "%Y-%m-%d %H:%M:%S")
    unix = calendar.timegm(dt.timetuple())
    return (unix + _FILETIME_EPOCH_S) * 10_000_000


def _filetime_to_iso(ticks: int) -> str | None:
    import datetime as _dt

    unix = ticks // 10_000_000 - _FILETIME_EPOCH_S
    try:
        return _dt.datetime.utcfromtimestamp(unix).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
    except (OverflowError, OSError, ValueError):
        return None


def _summary_info_stream(
    title: str | None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """A minimal MS-OLEPS property set carrying the codepage (PID 1,
    VT_I2 = 1252) and whichever of the title (PID 2, VT_LPSTR),
    author (PID 4, VT_LPSTR) and creation time (PID 12, VT_FILETIME,
    ``created`` as ``YYYY-MM-DD HH:MM:SS`` UTC) are set — the stream
    real Word writes document metadata to.  ``title`` may be None
    (author/created without a title is a legal property set)."""

    def lpstr(s: str) -> bytes:
        raw = s.encode("cp1252", "replace") + b"\x00"
        pad = (4 - len(raw) % 4) % 4
        return struct.pack("<II", _VT_LPSTR, len(raw)) + raw \
            + b"\x00" * pad

    props: list[tuple[int, bytes]] = [
        (_PID_CODEPAGE, struct.pack("<IhH", _VT_I2, 1252, 0)),
    ]
    if title is not None:
        props.append((_PID_TITLE, lpstr(title)))
    if author is not None:
        props.append((_PID_AUTHOR, lpstr(author)))
    if created is not None:
        props.append(
            (
                _PID_CREATE_DTM,
                struct.pack(
                    "<IQ", _VT_FILETIME, _iso_to_filetime(created)
                ),
            )
        )
    # section: cb, cProps, then (pid, offset) pairs, then props
    hdr_len = 8 + len(props) * 8
    offs = []
    at = hdr_len
    for _pid, blob in props:
        offs.append(at)
        at += len(blob)
    section = struct.pack("<II", at, len(props))
    for (pid, _blob), off in zip(props, offs):
        section += struct.pack("<II", pid, off)
    for _pid, blob in props:
        section += blob
    head = (
        struct.pack("<HHI", 0xFFFE, 0, 0x00020A04)
        + b"\x00" * 16  # clsid
        + struct.pack("<I", 1)  # one section
        + _SUMMARY_FMTID
        + struct.pack("<I", 48)  # section offset (fixed header size)
    )
    assert len(head) == 48
    return head + section


def summary_properties(blob: bytes) -> dict:
    """The corpus-relevant properties of a SummaryInformation set —
    ``{title, author, created, modified}`` (strings / ISO strings,
    None when absent), honoring the PID 1 codepage.  Best-effort:
    malformed sets return the all-None dict, never raise (metadata
    must not fail ingestion)."""
    out: dict = {"title": None, "author": None, "created": None,
                 "modified": None}
    try:
        (order,) = struct.unpack_from("<H", blob, 0)
        if order != 0xFFFE:
            return out
        (n_sections,) = struct.unpack_from("<I", blob, 24)
        if n_sections < 1:
            return out
        (sec_off,) = struct.unpack_from("<I", blob, 28 + 16)
        (n_props,) = struct.unpack_from("<I", blob, sec_off + 4)
        codepage = "cp1252"
        wanted = {
            _PID_TITLE: "title",
            _PID_AUTHOR: "author",
            _PID_CREATE_DTM: "created",
            _PID_LASTSAVE_DTM: "modified",
        }
        prop_offs: dict[str, int] = {}
        for k in range(min(n_props, 4096)):
            pid, off = struct.unpack_from(
                "<II", blob, sec_off + 8 + 8 * k
            )
            if pid == _PID_CODEPAGE:
                (vt,) = struct.unpack_from("<I", blob, sec_off + off)
                if vt == _VT_I2:
                    (cp,) = struct.unpack_from(
                        "<h", blob, sec_off + off + 4
                    )
                    codepage = f"cp{cp}"
            elif pid in wanted:
                prop_offs[wanted[pid]] = sec_off + off
        for key, at in prop_offs.items():
            (vt,) = struct.unpack_from("<I", blob, at)
            if vt == _VT_LPSTR:
                (n,) = struct.unpack_from("<I", blob, at + 4)
                raw = blob[at + 8 : at + 8 + n]
                out[key] = (
                    raw.decode(codepage, "replace").rstrip("\x00")
                    or None
                )
            elif vt == _VT_LPWSTR:
                (n,) = struct.unpack_from("<I", blob, at + 4)
                raw = blob[at + 8 : at + 8 + 2 * n]
                out[key] = (
                    raw.decode("utf-16-le", "replace").rstrip("\x00")
                    or None
                )
            elif vt == _VT_FILETIME:
                (ticks,) = struct.unpack_from("<Q", blob, at + 4)
                out[key] = _filetime_to_iso(ticks)
        return out
    except (struct.error, LookupError):
        return out


def _summary_title(blob: bytes) -> str | None:
    """PID 2 (title) only — the original doc/xls/ppt title hook."""
    return summary_properties(blob)["title"]


def synthesize_doc(
    paragraphs: list[str],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal Word-97 .doc: paragraphs joined by ``\\r``
    paragraph marks, stored as TWO pieces — the first half cp1252
    ("compressed"), the second UTF-16LE — through a real CLX/PlcPcd
    in the 0Table stream.  ``title`` lands in a real
    ``\\x05SummaryInformation`` MS-OLEPS property set (PID 2), the
    stream Word itself writes metadata to."""
    text = "\r".join(paragraphs) + "\r"
    split = len(text) // 2
    # piece 1 is cp1252: back the split off until its text encodes
    # (all-unicode heads degrade to a zero-length first piece, which
    # the PlcPcd represents fine)
    while split > 0:
        try:
            text[:split].encode("cp1252")
            break
        except UnicodeEncodeError:
            split -= 1
    part1, part2 = text[:split], text[split:]
    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0x0000, 0xA5EC)  # wIdent
    struct.pack_into("<H", fib, 0x0002, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", fib, 0x000A, 0x0000)  # flags: 0Table
    struct.pack_into("<I", fib, 0x0018, 1024)  # fcMin
    struct.pack_into("<H", fib, 0x0020, 0x000E)  # csw
    struct.pack_into("<H", fib, 0x003E, 0x0016)  # cslw
    struct.pack_into("<I", fib, 0x004C, len(text))  # ccpText
    struct.pack_into("<H", fib, 0x0098, 0x005D)  # cenFibRgFcLcb
    raw1 = part1.encode("cp1252")
    raw2 = part2.encode("utf-16-le")
    fc1 = 0x40000000 | (1024 * 2)
    fc2 = 1024 + len(raw1)
    struct.pack_into("<I", fib, 0x001C, 1024 + len(raw1) + len(raw2))
    plc = (
        struct.pack("<III", 0, len(part1), len(text))
        + struct.pack("<HIH", 0, fc1, 0)
        + struct.pack("<HIH", 0, fc2, 0)
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", fib, 0x01A2, 0)  # fcClx
    struct.pack_into("<I", fib, 0x01A6, len(clx))  # lcbClx
    word_stream = bytes(fib) + raw1 + raw2
    # pad streams to the 4096 mini-cutoff: per MS-CFB a stream UNDER
    # the cutoff must live in the mini stream, which this minimal
    # writer does not emit; the zero tail is inert (every read is
    # offset+length-bounded by the FIB / lcbClx / OLEPS sizes)
    streams = [
        ("WordDocument", word_stream.ljust(_MINI_CUTOFF, b"\x00")),
        ("0Table", clx.ljust(_MINI_CUTOFF, b"\x00")),
    ]
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


class _Cfb:
    def __init__(self, payload: bytes):
        if payload[:8] != _CFB_MAGIC:
            raise ValueError("not an OLE2/CFB payload (bad magic)")
        if len(payload) < _SECT:
            raise ValueError("truncated CFB header")
        self.data = payload
        (self.sect_shift,) = struct.unpack_from("<H", payload, 30)
        (self.mini_shift,) = struct.unpack_from("<H", payload, 32)
        self.sect = 1 << self.sect_shift
        self.minisect = 1 << self.mini_shift
        (self.n_fat,) = struct.unpack_from("<I", payload, 44)
        (self.dir_start,) = struct.unpack_from("<I", payload, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (self.minifat_start,) = struct.unpack_from("<I", payload, 60)
        (self.n_minifat,) = struct.unpack_from("<I", payload, 64)
        (self.difat_start,) = struct.unpack_from("<I", payload, 68)
        (self.n_difat,) = struct.unpack_from("<I", payload, 72)
        per = self.sect // 4
        fat_sects = list(struct.unpack_from("<109I", payload, 76))
        nxt = self.difat_start
        guard = 0
        while nxt not in (_ENDOFCHAIN, _FREESECT):
            blob = self._sector(nxt)
            vals = struct.unpack(f"<{per}I", blob)
            fat_sects.extend(vals[:-1])
            nxt = vals[-1]
            guard += 1
            if guard > 10000:
                raise ValueError("CFB DIFAT chain cycle")
        self.fat: list[int] = []
        for s in fat_sects:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            self.fat.extend(
                struct.unpack(f"<{per}I", self._sector(s))
            )
        self.entries = self._read_dir()
        self._mini_data = None
        self._minifat = None

    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self.sect
        blob = self.data[off : off + self.sect]
        if len(blob) < self.sect:
            raise ValueError(f"CFB sector {n} out of range")
        return blob

    def _chain(self, start: int, size: int | None = None) -> bytes:
        out = []
        cur = start
        guard = 0
        while cur not in (_ENDOFCHAIN, _FREESECT):
            out.append(self._sector(cur))
            if cur >= len(self.fat):
                raise ValueError(f"CFB FAT index {cur} out of range")
            cur = self.fat[cur]
            guard += 1
            # A valid chain visits each FAT entry at most once, so
            # len(self.fat) steps is the true maximum — this detects
            # real cycles without capping legitimate stream sizes.
            if guard > len(self.fat):
                raise ValueError("CFB FAT chain cycle")
        blob = b"".join(out)
        return blob[:size] if size is not None else blob

    def _read_dir(self) -> list[dict]:
        blob = self._chain(self.dir_start)
        entries = []
        for off in range(0, len(blob), 128):
            ent = blob[off : off + 128]
            if len(ent) < 128:
                break
            (nlen,) = struct.unpack_from("<H", ent, 64)
            obj_type = ent[66]
            if obj_type == 0 or nlen < 2:
                entries.append(None)
                continue
            name = ent[: nlen - 2].decode("utf-16-le", "replace")
            left, right, child = struct.unpack_from("<III", ent, 68)
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            entries.append(
                {"name": name, "type": obj_type, "start": start,
                 "size": size, "left": left, "right": right,
                 "child": child}
            )
        return entries

    def top_level(self) -> list[dict]:
        """Entries directly under the root storage (the red-black
        sibling tree hanging off the root's child pointer) — a .msg
        reader must NOT confuse a nested attachment/recipient
        storage's streams with the message's own."""
        root = next(
            (e for e in self.entries if e and e["type"] == 5), None
        )
        if root is None:
            return []
        out: list[dict] = []
        stack = [root["child"]]
        seen: set[int] = set()
        while stack:
            idx = stack.pop()
            if (
                idx in seen
                or idx >= len(self.entries)
                or idx == _FREESECT
            ):
                continue
            seen.add(idx)
            ent = (
                self.entries[idx] if idx < len(self.entries) else None
            )
            if ent is None:
                continue
            out.append(ent)
            stack.extend([ent["left"], ent["right"]])
        return out

    def _mini(self) -> tuple[bytes, list[int]]:
        if self._mini_data is None:
            root = next(
                (e for e in self.entries if e and e["type"] == 5), None
            )
            if root is None:
                raise ValueError("CFB without a root entry")
            self._mini_data = self._chain(root["start"], root["size"])
            per = self.sect // 4
            mf: list[int] = []
            cur = self.minifat_start
            guard = 0
            while cur not in (_ENDOFCHAIN, _FREESECT):
                mf.extend(struct.unpack(f"<{per}I", self._sector(cur)))
                cur = self.fat[cur] if cur < len(self.fat) else _ENDOFCHAIN
                guard += 1
                if guard > len(self.fat):
                    raise ValueError("CFB miniFAT chain cycle")
            self._minifat = mf
        return self._mini_data, self._minifat

    def read(self, name: str) -> bytes:
        ent = next(
            (
                e
                for e in self.entries
                if e and e["type"] == 2 and e["name"] == name
            ),
            None,
        )
        if ent is None:
            raise KeyError(name)
        return self.read_entry(ent)

    def read_entry(self, ent: dict) -> bytes:
        if ent["size"] < self.mini_cutoff:
            mini, minifat = self._mini()
            out = []
            cur = ent["start"]
            guard = 0
            while cur not in (_ENDOFCHAIN, _FREESECT):
                off = cur * self.minisect
                out.append(mini[off : off + self.minisect])
                cur = (
                    minifat[cur] if cur < len(minifat) else _ENDOFCHAIN
                )
                guard += 1
                if guard > len(minifat):
                    raise ValueError("CFB mini chain cycle")
            return b"".join(out)[: ent["size"]]
        return self._chain(ent["start"], ent["size"])


def cfb_list_streams(payload: bytes) -> list[str]:
    """Stream names of an OLE2 container (dispatch helper)."""
    return [
        e["name"] for e in _Cfb(payload).entries if e and e["type"] == 2
    ]


def cfb_top_level_streams(payload: bytes) -> list[str]:
    """Stream names directly under the ROOT storage only.  Format
    sniffing must use this, not `cfb_list_streams`: a .msg whose
    OLE-embedded attachment contributes a nested WordDocument/
    Workbook stream must still sniff as ``msg``, and an
    EncryptionInfo check must not be fooled by nested storages."""
    return [
        e["name"]
        for e in _Cfb(payload).top_level()
        if e["type"] == 2
    ]


def cfb_read_stream(payload: bytes, name: str) -> bytes:
    return _Cfb(payload).read(name)


_CTRL_MAP = {
    "\r": "\n",  # paragraph mark
    "\x0b": "\n",  # line break (Shift+Enter)
    "\x0c": "\n",  # page / section break
    "\x07": "\t",  # table cell / row mark
}


def _normalize_word_text(s: str) -> str:
    out = []
    for ch in s:
        if ch in _CTRL_MAP:
            out.append(_CTRL_MAP[ch])
        elif ch in ("\t",) or ord(ch) >= 0x20:
            out.append(ch)
        # field chars \x13\x14\x15 and other C0 controls drop
    return "".join(out)


def doc_extract_text(payload: bytes) -> dict:
    """Parse one legacy .doc payload → ``{title, n_pieces,
    n_paragraphs, text, n_chars}``; ``title`` comes from the
    ``\\x05SummaryInformation`` property set (PID 2, codepage-aware),
    NULL when the stream or property is absent.  Raises
    ``ValueError`` for non-CFB bytes and CFB containers that are not
    Word documents."""
    cfb = _Cfb(payload)
    try:
        wd = cfb.read("WordDocument")
    except KeyError:
        raise ValueError(
            "OLE2 container without a WordDocument stream (not a "
            ".doc — e.g. .xls/.ppt/.msi)"
        ) from None
    if len(wd) < 0x01AA:
        raise ValueError("WordDocument stream too short for a FIB")
    (w_ident,) = struct.unpack_from("<H", wd, 0)
    if w_ident != 0xA5EC:
        raise ValueError(
            f"WordDocument without the Word97 FIB magic "
            f"(wIdent=0x{w_ident:04X})"
        )
    (flags,) = struct.unpack_from("<H", wd, 0x000A)
    if flags & 0x0100:  # fEncrypted: RC4 or XOR-obfuscated
        raise ValueError(
            "encrypted Word document (fEncrypted) — route through "
            "offcrypto.decrypt_doc_rc4 / office.office_decrypt_extract"
        )
    tbl_name = "1Table" if flags & 0x0200 else "0Table"
    (fc_min,) = struct.unpack_from("<I", wd, 0x0018)
    (fc_mac,) = struct.unpack_from("<I", wd, 0x001C)
    (fc_clx,) = struct.unpack_from("<I", wd, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", wd, 0x01A6)
    pieces: list[str] = []
    if lcb_clx > 0:
        try:
            tbl = cfb.read(tbl_name)
        except KeyError:
            raise ValueError(
                f"FIB references missing table stream {tbl_name}"
            ) from None
        clx = tbl[fc_clx : fc_clx + lcb_clx]
        pos = 0
        plc = None
        while pos < len(clx):
            kind = clx[pos]
            if kind == 1:  # Prc: grpprl property block — skip
                (cb,) = struct.unpack_from("<h", clx, pos + 1)
                pos += 3 + max(cb, 0)
            elif kind == 2:  # Pcdt: the piece table
                (lcb,) = struct.unpack_from("<I", clx, pos + 1)
                plc = clx[pos + 5 : pos + 5 + lcb]
                break
            else:
                raise ValueError(f"unknown CLX entry type {kind}")
        if plc is None or len(plc) < 4 + 8:
            raise ValueError("CLX without a piece table")
        n = (len(plc) - 4) // 12
        cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
        for i in range(n):
            (fc,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
            n_chars = cps[i + 1] - cps[i]
            if fc & 0x40000000:
                off = (fc & 0x3FFFFFFF) >> 1
                raw = wd[off : off + n_chars]
                pieces.append(raw.decode("cp1252", "replace"))
            else:
                raw = wd[fc : fc + 2 * n_chars]
                pieces.append(raw.decode("utf-16-le", "replace"))
    else:
        # pre-97 legacy path: one cp1252 run at fcMin..fcMac
        pieces.append(wd[fc_min:fc_mac].decode("cp1252", "replace"))
    text = _normalize_word_text("".join(pieces)).rstrip("\n")
    paragraphs = text.split("\n") if text else []
    title = None
    try:
        title = _summary_title(cfb.read(_SUMMARY_STREAM))
    except KeyError:
        pass  # no metadata stream — title stays NULL
    return {
        "title": title,
        "n_pieces": len(pieces),
        "n_paragraphs": len(paragraphs),
        "text": text,
        "n_chars": len(text),
    }


DOC_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_pieces int, n_paragraphs int, "
    "text string, n_chars int"
)


def doc_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Legacy .doc → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = DOC_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = doc_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_pieces"],
                        rec["n_paragraphs"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "title", "n_pieces", "n_paragraphs",
                    "text", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
