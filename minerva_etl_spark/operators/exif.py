"""EXIF metadata over JPEG columns — scan + privacy strip (round 13).

Before images enter a training set two metadata questions matter:
*what is this* (camera make/model, orientation — the resize/augment
pipeline needs orientation) and *what must NOT ship* (GPS position,
timestamps — PII that survives pixel-level dedup untouched).  EXIF is
the public TIFF-in-APP1 container (JPEG marker ``FF E1`` with an
``Exif\\0\\0`` prefix, then a TIFF header: ``II``/``MM`` byte order,
magic 42, IFD chain of 12-byte tagged entries).

* :func:`exif_scan` parses IFD0 of every payload IN-TASK — both byte
  orders, inline and offset values — and emits ``(make, model,
  orientation, datetime, has_gps, n_tags)``; non-JPEG and EXIF-less
  payloads yield NULL metadata rows (scan is a census, not a filter).
* :func:`strip_exif` re-emits every JPEG with ALL APP1 Exif segments
  removed — entropy-coded data untouched, so the image decodes
  identically (pytest-pinned via `jpeg_features` equality) while GPS
  and timestamps are gone.  The privacy pass a corpus runs before
  export.

Both are shuffle-free Arrow ``mapInPandas`` scans (the engine's
media-codec shape); the writer (:func:`synthesize_exif_app1` +
:func:`insert_app1`) emits spec-shaped segments so fixtures exercise
the parser end to end, byte-deterministically.

Reference parity note: media-curation extension arc (`jpeg.py`,
`imagehash.py`, `multimodal.py`).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_exif_app1",
    "insert_app1",
    "parse_exif",
    "strip_exif_bytes",
    "exif_scan",
    "strip_exif",
    "EXIF_SCAN_SCHEMA",
]

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825


# --------------------------------------------------------------- writer


def synthesize_exif_app1(
    make: str | None = None,
    model: str | None = None,
    orientation: int | None = None,
    datetime: str | None = None,
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """A spec-shaped APP1 Exif segment (marker + length + payload):
    IFD0 with the given tags, ASCII values in the post-IFD data area,
    an optional GPS sub-IFD pointer.  ``byte_order`` ``'II'``
    (little) or ``'MM'`` (big) — the parser must handle both."""
    le = byte_order == "II"
    e = "<" if le else ">"
    entries: list[tuple[int, int, int, bytes | int]] = []
    data_area = b""

    def ascii_entry(tag: int, s: str) -> None:
        nonlocal data_area
        raw = s.encode("ascii", "replace") + b"\x00"
        if len(raw) <= 4:
            entries.append((tag, 2, len(raw), raw.ljust(4, b"\x00")))
        else:
            entries.append((tag, 2, len(raw), -len(data_area)))
            data_area += raw

    if make is not None:
        ascii_entry(_TAG_MAKE, make)
    if model is not None:
        ascii_entry(_TAG_MODEL, model)
    if orientation is not None:
        entries.append(
            (
                _TAG_ORIENTATION,
                3,
                1,
                struct.pack(f"{e}H", orientation).ljust(4, b"\x00"),
            )
        )
    if datetime is not None:
        ascii_entry(_TAG_DATETIME, datetime)
    n_gps = 1 if gps is not None else 0
    n = len(entries) + n_gps
    ifd0_off = 8
    data_off = ifd0_off + 2 + 12 * n + 4
    gps_ifd_off = data_off + len(data_area)
    blob = struct.pack(f"{e}H", n)
    ents = list(entries)
    if gps is not None:
        ents.append((_TAG_GPS_IFD, 4, 1, gps_ifd_off))
    ents.sort(key=lambda t: t[0])  # spec: entries sorted by tag
    for tag, typ, cnt, val in ents:
        blob += struct.pack(f"{e}HHI", tag, typ, cnt)
        if isinstance(val, bytes):
            blob += val
        elif val <= 0:  # data-area offset placeholder
            blob += struct.pack(f"{e}I", data_off + (-val))
        else:
            blob += struct.pack(f"{e}I", val)
    blob += struct.pack(f"{e}I", 0)  # no next IFD
    blob += data_area
    if gps is not None:
        # minimal GPS IFD: two SHORT-coded placeholder entries is
        # enough for presence detection; real rationals omitted
        blob += struct.pack(f"{e}H", 1)
        blob += struct.pack(f"{e}HHI", 0x0000, 3, 1)  # GPSVersionID
        blob += struct.pack(f"{e}HH", 2, 0)  # inline SHORT value
        blob += struct.pack(f"{e}I", 0)
    tiff = (
        (b"II" if le else b"MM")
        + struct.pack(f"{e}H", 42)
        + struct.pack(f"{e}I", ifd0_off)
        + blob
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (where real cameras
    put it)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


# --------------------------------------------------------------- reader


def _iter_segments(jpeg: bytes):
    """(marker, payload_start, payload_len) for JPEG header segments,
    stopping at SOS (entropy-coded data follows)."""
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n:
        if jpeg[pos] != 0xFF:
            return
        marker = jpeg[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", jpeg, pos + 2)
        yield marker, pos, seg_len
        if marker == 0xDA:  # SOS
            return
        pos += 2 + seg_len


def parse_exif(payload: bytes) -> dict:
    """EXIF IFD0 fields from a JPEG payload → ``{make, model,
    orientation, datetime, has_gps, n_tags}`` — all None/0 when the
    payload is not a JPEG or carries no Exif APP1 (census
    semantics, never a reject)."""
    out = {
        "make": None, "model": None, "orientation": None,
        "datetime": None, "has_gps": False, "n_tags": 0,
    }
    if payload[:2] != b"\xff\xd8":
        return out
    tiff = None
    for marker, pos, seg_len in _iter_segments(payload):
        if marker == 0xE1 and payload[
            pos + 4 : pos + 10
        ] == b"Exif\x00\x00":
            tiff = payload[pos + 10 : pos + 2 + seg_len]
            break
    if tiff is None or len(tiff) < 8:
        return out
    order = tiff[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        return out
    (magic,) = struct.unpack_from(f"{e}H", tiff, 2)
    if magic != 42:
        return out
    (ifd_off,) = struct.unpack_from(f"{e}I", tiff, 4)
    if ifd_off + 2 > len(tiff):
        return out
    (n,) = struct.unpack_from(f"{e}H", tiff, ifd_off)
    out["n_tags"] = int(n)

    def ascii_at(cnt: int, val_bytes: bytes) -> str:
        if cnt <= 4:
            raw = val_bytes[:cnt]
        else:
            (off,) = struct.unpack(f"{e}I", val_bytes)
            raw = tiff[off : off + cnt]
        return raw.split(b"\x00", 1)[0].decode("ascii", "replace")

    for k in range(min(n, 512)):
        base = ifd_off + 2 + 12 * k
        if base + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack_from(f"{e}HHI", tiff, base)
        val = tiff[base + 8 : base + 12]
        if tag == _TAG_MAKE and typ == 2:
            out["make"] = ascii_at(cnt, val)
        elif tag == _TAG_MODEL and typ == 2:
            out["model"] = ascii_at(cnt, val)
        elif tag == _TAG_ORIENTATION and typ == 3:
            (out["orientation"],) = struct.unpack(f"{e}H", val[:2])
        elif tag == _TAG_DATETIME and typ == 2:
            out["datetime"] = ascii_at(cnt, val)
        elif tag == _TAG_GPS_IFD:
            out["has_gps"] = True
    return out


def strip_exif_bytes(payload: bytes) -> bytes:
    """The JPEG with every APP1 Exif segment removed — entropy-coded
    data untouched.  Non-JPEG payloads pass through unchanged (the
    privacy pass must be safe over mixed columns)."""
    if payload[:2] != b"\xff\xd8":
        return payload
    drops: list[tuple[int, int]] = []
    for marker, pos, seg_len in _iter_segments(payload):
        if marker == 0xE1 and payload[
            pos + 4 : pos + 10
        ] == b"Exif\x00\x00":
            drops.append((pos, pos + 2 + seg_len))
    if not drops:
        return payload
    out = bytearray()
    prev = 0
    for a, b in drops:
        out += payload[prev:a]
        prev = b
    out += payload[prev:]
    return bytes(out)


EXIF_SCAN_SCHEMA = (
    "media_id bigint, make string, model string, orientation int, "
    "exif_datetime string, has_gps boolean, n_tags int"
)


def exif_scan(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """EXIF census over a binary column: shuffle-free Arrow scan,
    NULL-metadata rows for EXIF-less payloads (never drops)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = EXIF_SCAN_SCHEMA.replace(
        "media_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                r = parse_exif(bytes(payload))
                rows.append(
                    (
                        did, r["make"], r["model"], r["orientation"],
                        r["datetime"], r["has_gps"], r["n_tags"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "make", "model", "orientation",
                    "exif_datetime", "has_gps", "n_tags",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


def strip_exif(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """The privacy pass: every payload re-emitted with APP1 Exif
    removed (``(id, payload)`` — same schema in, same out)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: [
                        strip_exif_bytes(bytes(p))
                        for p in pdf[payload_col]
                    ],
                }
            )

    return docs.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_type}, {payload_col} binary"
    )
