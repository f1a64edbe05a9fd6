"""Baseline TIFF codec — the scanned-document leg of the image arc
(round 14).

TIFF 6.0 (public Adobe spec): a header (``II*\\0`` little-endian or
``MM\\0*`` big-endian + first-IFD offset), then a chain of IFDs (page
directories) whose 12-byte entries describe strips of pixel data.
This module implements the baseline subset a document corpus actually
contains — 8-bit grayscale (PhotometricInterpretation 1) and RGB (2),
uncompressed (Compression 1) and PackBits (32773), multi-strip,
multi-page — in pure stdlib, decoded inside Arrow ``mapInPandas``
tasks like every codec here (`operators/multimodal.py` precedent): no
shuffle, linear in payload bytes.

The writer (:func:`synthesize_tiff`) emits real multi-page TIFFs in
either byte order with a real strip layout, so tests and the gate
fixture exercise the same walk real scanners produce.  Decoding is
LOSSLESS, so oracle fixtures replay the generating formula directly.

Rejects are honest ``ValueError``s (not-TIFF bytes, tiled images,
non-8-bit samples, unsupported compression/photometric), and the IFD
chain walk is cycle-guarded the same way the CFB reader is
(`operators/msdoc.py` r14 rule: bound by structure, not by size).

Reference parity note: the reference ingests structured text
(`src/harvest/`); binary image formats are this repo's
document-ingest extension arc (`jpeg.py`, `gif.py`, `multimodal.py`).
EXIF/TIFF tag semantics are shared with `operators/exif.py`, which
walks the same IFD layout for metadata.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_tiff",
    "tiff_decode",
    "tiff_features",
    "packbits_encode",
    "packbits_decode",
    "lzw_encode",
    "lzw_decode",
    "TIFF_FEATURE_SCHEMA",
]

_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PREDICTOR = 317
_T_TILE_WIDTH = 322

_COMP_NONE = 1
_COMP_LZW = 5
_COMP_JPEG = 7  # new-style: each strip a complete JPEG bitstream
_COMP_PACKBITS = 32773


# ------------------------------------------------------------ PackBits


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits (TIFF 6.0 §9): runs of >=2 equal bytes become
    ``(1 - n, byte)``; literals are chunked at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))  # 1-(j-i) as unsigned byte
            out.append(data[i])
            i = j
            continue
        # literal: until the next >=3 run (2-runs inside literals are
        # cheaper kept literal) or 128 bytes
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (
                i + 2 < n and data[i] == data[i + 1] == data[i + 2]
            )
        ):
            i += 1
        out.append(i - lit - 1)
        out.extend(data[lit:i])
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Inverse of :func:`packbits_encode`; raises on truncation or
    output overrun (dirty-corpus contract)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b == 128:  # noop
            continue
        if b < 128:
            if i + b + 1 > n:
                raise ValueError("PackBits literal overruns input")
            out.extend(data[i : i + b + 1])
            i += b + 1
        else:
            if i >= n:
                raise ValueError("PackBits run missing its byte")
            out.extend(bytes([data[i]]) * (257 - b))
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits produced {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


# ----------------------------------------------------------- TIFF LZW
# TIFF 6.0 §13: the GIF algorithm with three format twists — codes
# pack MSB-first, ClearCode=256/EOI=257 with the table starting at
# 258, and the "early change": the code width bumps one code EARLIER
# than the table-size power of two (the libtiff-compatible behavior).

_LZW_CLEAR = 256
_LZW_EOI = 257


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for byte in data:
        k = w + bytes([byte])
        if k in table:
            w = k
            continue
        emit(table[w], width)
        table[k] = next_code
        next_code += 1
        # early change: widen when the NEXT code would not fit
        if next_code == (1 << width) - 1:
            if width == 12:
                emit(_LZW_CLEAR, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                width += 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("LZW stream truncated (no EOI)")
        v = 0
        for _ in range(width):
            v = (v << 1) | (
                (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
            )
            bitpos += 1
        return v

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        code = read(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise ValueError(f"LZW first code {code} not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table")
        out += entry
        prev = entry
        # early change mirrors the encoder — with the decode-side
        # off-by-one: the decoder's table lags the encoder's by one
        # entry (its insert for code k happens while processing code
        # k+1), so the width bumps at 2^w - 2 here vs 2^w - 1 there
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expected:
        raise ValueError(
            f"LZW produced {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _undiff_rows(rows: bytes, w: int, ch: int, h: int) -> bytes:
    """Invert the horizontal-differencing predictor (tag 317 = 2):
    within each row, each sample adds the previous sample of the
    same channel."""
    out = bytearray(rows)
    stride = w * ch
    for y in range(h):
        base = y * stride
        for i in range(ch, stride):
            out[base + i] = (out[base + i] + out[base + i - ch]) & 0xFF
    return bytes(out)


def _diff_rows(rows: bytes, w: int, ch: int, h: int) -> bytes:
    out = bytearray(rows)
    stride = w * ch
    for y in range(h):
        base = y * stride
        for i in range(stride - 1, ch - 1, -1):
            out[base + i] = (out[base + i] - out[base + i - ch]) & 0xFF
    return bytes(out)


# -------------------------------------------------------------- writer


def synthesize_tiff(
    pages: list[tuple[bytes, int, int, int]],
    byte_order: str = "II",
    compression: int = _COMP_NONE,
    rows_per_strip: int = 4,
    predictor: int = 1,
) -> bytes:
    """A real (possibly multi-page) TIFF from row-major 8-bit pixel
    buffers.  ``pages`` is ``[(pixels, width, height, channels)]``
    with channels 1 (gray) or 3 (RGB); strips are ``rows_per_strip``
    rows each so multi-strip assembly is exercised.  ``compression``
    1 (none) / 5 (LZW, TIFF variant) / 32773 (PackBits);
    ``predictor=2`` applies horizontal differencing (the common LZW
    pairing).  Deterministic bytes."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    e = "<" if byte_order == "II" else ">"
    out = bytearray()
    out += byte_order.encode()
    out += struct.pack(f"{e}H", 42)
    out += struct.pack(f"{e}I", 0)  # first-IFD offset patched below

    ifd_patch_at = 4  # where the previous next-IFD pointer lives
    for pixels, w, h, ch in pages:
        if ch not in (1, 3):
            raise ValueError(f"channels must be 1 or 3, got {ch}")
        if len(pixels) != w * h * ch:
            raise ValueError(
                f"page is {len(pixels)} bytes, expected {w * h * ch}"
            )
        strips = []
        for y0 in range(0, h, rows_per_strip):
            n_rows = min(y0 + rows_per_strip, h) - y0
            rows = pixels[y0 * w * ch : (y0 + n_rows) * w * ch]
            if predictor == 2:
                if compression == _COMP_JPEG:
                    raise ValueError(
                        "predictor does not apply to JPEG-in-TIFF"
                    )
                rows = _diff_rows(rows, w, ch, n_rows)
            if compression == _COMP_PACKBITS:
                strips.append(packbits_encode(rows))
            elif compression == _COMP_LZW:
                strips.append(lzw_encode(rows))
            elif compression == _COMP_JPEG:
                if ch != 3:
                    raise ValueError(
                        "JPEG-in-TIFF strips require RGB pages"
                    )
                from minerva_etl_spark.operators.jpeg import (
                    synthesize_jpeg,
                )

                strips.append(
                    synthesize_jpeg(bytes(rows), w, n_rows, quality=75)
                )
            else:
                strips.append(bytes(rows))
        # strip data first, then the IFD (offsets known up front)
        strip_offsets = []
        for s in strips:
            strip_offsets.append(len(out))
            out += s
        if len(out) % 2:
            out += b"\x00"  # IFDs are word-aligned

        entries = []  # (tag, type, count, value_or_offset, extra)

        def short(tag, v):
            entries.append(
                struct.pack(f"{e}HHI", tag, 3, 1)
                + struct.pack(f"{e}H", v) + b"\x00\x00"
            )

        def long_(tag, v):
            entries.append(struct.pack(f"{e}HHII", tag, 4, 1, v))

        extra = bytearray()
        # fixed tag set (BITS is one entry either way) + predictor
        n_entries = 9 + (1 if predictor == 2 else 0)
        ifd_at = len(out)
        # layout: count + entries + next ptr, then overflow arrays
        overflow_at = ifd_at + 2 + n_entries * 12 + 4

        short(_T_WIDTH, w)
        short(_T_HEIGHT, h)
        if ch == 1:
            short(_T_BITS, 8)
        else:
            entries.append(
                struct.pack(
                    f"{e}HHII", _T_BITS, 3, 3, overflow_at + len(extra)
                )
            )
            extra += struct.pack(f"{e}3H", 8, 8, 8)
        short(_T_COMPRESSION, compression)
        short(_T_PHOTOMETRIC, 1 if ch == 1 else 2)
        if len(strips) == 1:
            long_(_T_STRIP_OFFSETS, strip_offsets[0])
        else:
            entries.append(
                struct.pack(
                    f"{e}HHII", _T_STRIP_OFFSETS, 4, len(strips),
                    overflow_at + len(extra),
                )
            )
            extra += struct.pack(
                f"{e}{len(strips)}I", *strip_offsets
            )
        short(_T_SAMPLES, ch)
        short(_T_ROWS_PER_STRIP, rows_per_strip)
        if predictor == 2:
            short(_T_PREDICTOR, 2)
        if len(strips) == 1:
            long_(_T_STRIP_COUNTS, len(strips[0]))
        else:
            entries.append(
                struct.pack(
                    f"{e}HHII", _T_STRIP_COUNTS, 4, len(strips),
                    overflow_at + len(extra),
                )
            )
            extra += struct.pack(
                f"{e}{len(strips)}I", *(len(s) for s in strips)
            )
        assert len(entries) == n_entries

        # patch the previous next-IFD pointer to here
        struct.pack_into(f"{e}I", out, ifd_patch_at, ifd_at)
        out += struct.pack(f"{e}H", n_entries)
        # entries must be sorted by tag (spec)
        for ent in sorted(entries, key=lambda b: struct.unpack(
                f"{e}H", b[:2])[0]):
            out += ent
        ifd_patch_at = len(out)
        out += struct.pack(f"{e}I", 0)  # next IFD (patched by next page)
        out += extra
    return bytes(out)


# -------------------------------------------------------------- reader


def tiff_decode(payload: bytes) -> dict:
    """Decode a baseline TIFF: first page to row-major 8-bit pixels
    (gray or RGB), all pages counted.  Returns the shared codec dict
    ``{width, height, channels, pixels}`` plus ``n_pages`` and
    ``byte_order``.  Honest ``ValueError`` rejects for non-TIFF
    bytes, tiled layouts, non-8-bit samples, and unsupported
    compression/photometric codes."""
    payload = bytes(payload)
    if payload[:4] == b"II*\x00":
        e = "<"
        bo = "II"
    elif payload[:4] == b"MM\x00*":
        e = ">"
        bo = "MM"
    else:
        raise ValueError("not a TIFF payload")

    def u16(off):
        return struct.unpack_from(f"{e}H", payload, off)[0]

    def u32(off):
        return struct.unpack_from(f"{e}I", payload, off)[0]

    (first_ifd,) = struct.unpack_from(f"{e}I", payload, 4)
    n_pages = 0
    first: dict | None = None
    ifd = first_ifd
    seen: set[int] = set()
    while ifd:
        if ifd in seen:
            raise ValueError("TIFF IFD chain cycle")
        seen.add(ifd)
        if ifd + 2 > len(payload):
            raise ValueError("TIFF IFD offset out of range")
        n = u16(ifd)
        if ifd + 2 + n * 12 + 4 > len(payload):
            raise ValueError("TIFF IFD overruns payload")
        n_pages += 1
        if first is None:
            tags: dict[int, tuple[int, int, int]] = {}
            for i in range(n):
                off = ifd + 2 + i * 12
                tag, typ, cnt = struct.unpack_from(f"{e}HHI", payload,
                                                   off)
                tags[tag] = (typ, cnt, off + 8)
            first = _decode_page(payload, e, tags, u16, u32)
        ifd = u32(ifd + 2 + n * 12)
    if first is None:
        raise ValueError("TIFF without any IFD")
    first["n_pages"] = n_pages
    first["byte_order"] = bo
    return first


def _tag_values(payload, e, typ, cnt, val_at, u16, u32) -> list[int]:
    size = {3: 2, 4: 4}.get(typ)
    if size is None:
        raise ValueError(f"unsupported TIFF tag type {typ}")
    total = size * cnt
    at = val_at if total <= 4 else u32(val_at)
    if at + total > len(payload):
        raise ValueError("TIFF tag values out of range")
    fmt = "H" if typ == 3 else "I"
    return list(struct.unpack_from(f"{e}{cnt}{fmt}", payload, at))


def _decode_page(payload, e, tags, u16, u32) -> dict:
    def one(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        typ, cnt, val_at = tags[tag]
        return _tag_values(payload, e, typ, cnt, val_at, u16, u32)[0]

    def many(tag):
        typ, cnt, val_at = tags[tag]
        return _tag_values(payload, e, typ, cnt, val_at, u16, u32)

    if _T_TILE_WIDTH in tags:
        raise ValueError("tiled TIFF not supported (strip layout only)")
    w = one(_T_WIDTH)
    h = one(_T_HEIGHT)
    ch = one(_T_SAMPLES, 1)
    if ch not in (1, 3):
        raise ValueError(f"unsupported SamplesPerPixel {ch}")
    if _T_BITS in tags:
        bits = set(many(_T_BITS))
        if bits != {8}:
            raise ValueError(f"only 8-bit samples supported, got {bits}")
    comp = one(_T_COMPRESSION, _COMP_NONE)
    if comp not in (_COMP_NONE, _COMP_LZW, _COMP_JPEG,
                    _COMP_PACKBITS):
        raise ValueError(
            f"unsupported TIFF compression {comp} "
            "(none/LZW/JPEG/PackBits; old-style JPEG (6) and "
            "CCITT fax payloads are counted by format census, not "
            "decoded)"
        )
    predictor = one(_T_PREDICTOR, 1)
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    photo = one(_T_PHOTOMETRIC)
    # 6 (YCbCr) is the usual JPEG-in-TIFF marking: the embedded JPEG
    # handles the colour transform, output is RGB either way
    allowed = (1, 2, 6) if comp == _COMP_JPEG else (1, 2)
    if photo not in allowed:
        raise ValueError(
            f"unsupported PhotometricInterpretation {photo}"
        )
    if comp == _COMP_JPEG:
        if ch != 3:
            raise ValueError("JPEG-in-TIFF requires 3 samples")
    elif (photo == 2) != (ch == 3):
        raise ValueError("photometric/samples mismatch")
    rps = one(_T_ROWS_PER_STRIP, h)
    offsets = many(_T_STRIP_OFFSETS)
    counts = many(_T_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    out = bytearray()
    remaining_rows = h
    for k, (off, cnt_b) in enumerate(zip(offsets, counts)):
        if off + cnt_b > len(payload):
            raise ValueError(f"strip {k} out of range")
        rows = min(rps, remaining_rows)
        expected = rows * w * ch
        raw = payload[off : off + cnt_b]
        if comp == _COMP_PACKBITS:
            strip = packbits_decode(raw, expected)
        elif comp == _COMP_LZW:
            strip = lzw_decode(raw, expected)
        elif comp == _COMP_JPEG:
            from minerva_etl_spark.operators.jpeg import jpeg_decode

            d = jpeg_decode(raw)
            if (d["width"], d["height"]) != (w, rows):
                raise ValueError(
                    f"JPEG strip {k} is {d['width']}x{d['height']}, "
                    f"expected {w}x{rows}"
                )
            strip = bytes(d["pixels"])
        else:
            if len(raw) != expected:
                raise ValueError(
                    f"strip {k} is {len(raw)} bytes, expected "
                    f"{expected}"
                )
            strip = raw
        if predictor == 2:
            strip = _undiff_rows(strip, w, ch, rows)
        out += strip
        remaining_rows -= rows
    if remaining_rows != 0:
        raise ValueError("strips do not cover the image height")
    return {
        "width": w,
        "height": h,
        "channels": ch,
        "pixels": bytes(out),
    }


TIFF_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, n_channels int, "
    "n_pages int, byte_order string, channel_means array<double>"
)


def tiff_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "fail",
) -> DataFrame:
    """Per-row REAL TIFF decode via mapInPandas: IFD walk + strip
    assembly (+ PackBits) inside each task; first-page per-channel
    means on the same half-up 6-dp grid as the other image codecs.
    ``on_error='skip'`` drops undecodable payloads."""
    from minerva_etl_spark.operators.multimodal import (
        _decode_or_policy,
        _png_channel_means,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                d = _decode_or_policy(tiff_decode, mid, p, on_error)
                if d is None:
                    continue
                rows.append(
                    (mid, d["width"], d["height"], d["channels"],
                     d["n_pages"], d["byte_order"],
                     _png_channel_means(d))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_channels",
                         "n_pages", "byte_order", "channel_means"],
            )

    return media.mapInPandas(run, schema=TIFF_FEATURE_SCHEMA)
