"""BMP (Windows DIB) codec — the last stdlib-feasible leg of the
image arc (round 14).

BMP (public Microsoft spec): ``BM`` file header + BITMAPINFOHEADER
(40 bytes), then an optional palette and bottom-up (or top-down via
negative height) pixel rows padded to 4 bytes.  This module covers
what document/crawl corpora actually contain:

* 24-bit BI_RGB (uncompressed BGR),
* 8-bit palettized BI_RGB,
* 8-bit BI_RLE8 (the run-length encoding scanned faxes ship) —
  end-of-line / end-of-bitmap / delta escapes included,
* both row orders (biHeight sign).

Pure stdlib, decoded inside Arrow ``mapInPandas`` tasks via the
mixed-image dispatcher (`multimodal.image_decode`).  Decoding is
LOSSLESS, so oracle fixtures replay the generating formula directly.
Rejects are honest ``ValueError``s (16/32-bit, BI_BITFIELDS, RLE
overruns).
"""

from __future__ import annotations

import struct

__all__ = [
    "synthesize_bmp",
    "bmp_decode",
    "rle8_encode",
    "rle8_decode",
]


def rle8_encode(rows: list[bytes]) -> bytes:
    """BI_RLE8: per row, (count, value) runs + 0,0 end-of-line; the
    stream ends with 0,1 end-of-bitmap."""
    out = bytearray()
    for row in rows:
        i = 0
        while i < len(row):
            j = i + 1
            while j < len(row) and j - i < 255 and row[j] == row[i]:
                j += 1
            out += bytes((j - i, row[i]))
            i = j
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def rle8_decode(data: bytes, w: int, h: int) -> list[bytearray]:
    """Decode BI_RLE8 into ``h`` rows of ``w`` palette indices
    (top-down list; caller flips for bottom-up storage).  Supports
    encoded runs, absolute mode, EOL/EOB, and the 0,2 delta escape."""
    rows = [bytearray(w) for _ in range(h)]
    x = y = 0
    i = 0
    n = len(data)
    while i + 1 < n:
        c, v = data[i], data[i + 1]
        i += 2
        if c > 0:  # encoded run
            if y >= h or x + c > w:
                raise ValueError("RLE8 run overruns the bitmap")
            rows[y][x : x + c] = bytes([v]) * c
            x += c
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            continue
        if v == 1:  # end of bitmap
            return rows
        if v == 2:  # delta
            if i + 1 >= n:
                raise ValueError("RLE8 truncated delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("RLE8 delta overruns the bitmap")
            continue
        # absolute mode: v literal bytes, word-aligned
        if y >= h or x + v > w or i + v > n:
            raise ValueError("RLE8 absolute run overruns")
        rows[y][x : x + v] = data[i : i + v]
        x += v
        i += v + (v % 2)
    raise ValueError("RLE8 stream missing end-of-bitmap")


def synthesize_bmp(
    pixels: bytes,
    width: int,
    height: int,
    bits: int = 24,
    palette: list[tuple[int, int, int]] | None = None,
    rle: bool = False,
    topdown: bool = False,
) -> bytes:
    """A real BMP from row-major pixels: ``bits=24`` takes RGB bytes;
    ``bits=8`` takes palette indices + a palette (RLE optional).
    Deterministic bytes."""
    if bits == 24:
        if palette is not None or rle:
            raise ValueError("palette/RLE are 8-bit features")
        if len(pixels) != width * height * 3:
            raise ValueError("pixel buffer size mismatch")
        stride = width * 3
        pad = (-stride) % 4
        rows = []
        for y in range(height):
            row = bytearray(pixels[y * stride : (y + 1) * stride])
            row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB->BGR
            rows.append(bytes(row) + b"\x00" * pad)
        if not topdown:
            rows.reverse()
        data = b"".join(rows)
        pal = b""
        n_pal = 0
        compression = 0
    elif bits == 8:
        if palette is None or not 1 <= len(palette) <= 256:
            raise ValueError("8-bit BMP needs a 1..256-entry palette")
        if len(pixels) != width * height:
            raise ValueError("index buffer size mismatch")
        rows_px = [
            bytes(pixels[y * width : (y + 1) * width])
            for y in range(height)
        ]
        if not topdown:
            rows_px.reverse()
        if rle:
            data = rle8_encode(rows_px)
            compression = 1  # BI_RLE8
        else:
            pad = (-width) % 4
            data = b"".join(r + b"\x00" * pad for r in rows_px)
            compression = 0
        pal = b"".join(
            bytes((b_, g, r, 0)) for r, g, b_ in palette
        )
        n_pal = len(palette)
    else:
        raise ValueError("bits must be 8 or 24")
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if topdown else height, 1, bits,
        compression, len(data), 2835, 2835, n_pal, 0,
    )
    off = 14 + 40 + len(pal)
    header = struct.pack(
        "<2sIHHI", b"BM", off + len(data), 0, 0, off
    )
    return header + info + pal + data


def bmp_decode(payload: bytes) -> dict:
    """Decode a BMP to the shared codec dict ``{width, height,
    channels, pixels}`` (+ ``bits``): 24-bit → RGB, 8-bit palettized
    (plain or RLE8) → RGB through the palette.  Top-down and
    bottom-up both supported."""
    payload = bytes(payload)
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bits, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    n_pal, = struct.unpack_from("<I", payload, 46)
    topdown = h_raw < 0
    h = -h_raw if topdown else h_raw
    if w <= 0 or h <= 0:
        raise ValueError("degenerate BMP dimensions")
    if bits == 24:
        if compression != 0:
            raise ValueError(
                f"24-bit BMP with compression {compression} "
                "unsupported (BI_RGB only)"
            )
        stride = w * 3
        pad = (-stride) % 4
        need = (stride + pad) * h
        raw = payload[off : off + need]
        if len(raw) < need:
            raise ValueError("BMP pixel data truncated")
        out = bytearray(stride * h)
        for y in range(h):
            src_y = y if topdown else h - 1 - y
            row = bytearray(
                raw[src_y * (stride + pad) : src_y * (stride + pad)
                    + stride]
            )
            row[0::3], row[2::3] = row[2::3], row[0::3]  # BGR->RGB
            out[y * stride : (y + 1) * stride] = row
        return {"width": w, "height": h, "channels": 3,
                "pixels": bytes(out), "bits": 24}
    if bits != 8:
        raise ValueError(
            f"unsupported BMP bit depth {bits} (8/24 only)"
        )
    n_pal = n_pal or 256
    pal_at = 14 + hdr_size
    pal = []
    for i in range(n_pal):
        b_, g, r, _x = payload[pal_at + 4 * i : pal_at + 4 * i + 4]
        pal.append((r, g, b_))
    if compression == 1:  # BI_RLE8
        rows_stored = rle8_decode(payload[off:], w, h)
    elif compression == 0:
        pad = (-w) % 4
        rows_stored = []
        for y in range(h):
            at = off + y * (w + pad)
            row = payload[at : at + w]
            if len(row) < w:
                raise ValueError("BMP pixel data truncated")
            rows_stored.append(bytearray(row))
    else:
        raise ValueError(
            f"unsupported 8-bit BMP compression {compression}"
        )
    rows = rows_stored if topdown else rows_stored[::-1]
    out = bytearray()
    for row in rows:
        for idx in row:
            if idx >= len(pal):
                raise ValueError(
                    f"palette index {idx} out of range ({len(pal)})"
                )
            out.extend(pal[idx])
    return {"width": w, "height": h, "channels": 3,
            "pixels": bytes(out), "bits": 8}
