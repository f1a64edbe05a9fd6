"""Pure-Python(+numpy) baseline JPEG codec — encoder and decoder.

8-bit baseline sequential JPEG (SOF0, Huffman-coded): forward/inverse
DCT as float64 matrix products, the public JPEG spec's Annex K
quantisation and Huffman tables, quality scaling via the classic
libjpeg formula, and optional 4:2:2 / 4:2:0 chroma subsampling
(half-up box average down, box replication up).  Progressive (SOF2),
arithmetic-coded, 12-bit, and restart-marker (DRI) streams raise
``NotImplementedError`` — honest unsupported-format errors, the same
policy as the WAV/PNG/AVI codecs in ``multimodal.py``.

Rounding pins (cross-engine, mirrored by the DuckDB oracle for the
``jpeg_features`` gate row): every float→int step is half-up
(``floor(x + 0.5)``).  The post-IDCT rounding adds a ``+1e-7`` nudge:
a DC-only block reconstructs ``dequant/8`` times ``(1 - O(1e-16))``
through the float64 basis products, so an exact ``.5`` tie would
otherwise floor the wrong way vs the oracle's exact rational
arithmetic.  The nudge is orders of magnitude above the float noise
(~1e-13) and below any non-tie gap, so it is value-neutral everywhere
else.

Reference parity: minerva-etl has no media codecs; this extends the
harvest-plugin surface (SURVEY.md §2 X-rows) the way a real
multimodal corpus requires — JPEG stills are the most common
real-corpus image format, and the same routine decodes MJPG AVI
frames (see ``multimodal.avi_decode``).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------- DCT

_A = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / math.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _cu * math.cos((2 * _x + 1) * _u * math.pi / 16)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


# ------------------------------------------------- Annex K constants

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

BASE_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

BASE_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_SAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def scaled_quant_table(base: list[int], quality: int) -> list[int]:
    """The classic libjpeg quality scaling: quality<50 → 5000/q, else
    200-2q; each entry floor((b*scale+50)/100) clamped to [1, 255].
    Public formula (jcparam.c in every libjpeg since 1991)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [
        max(1, min(255, (b * scale + 50) // 100)) for b in base
    ]


def _half_up(x: float) -> int:
    return math.floor(x + 0.5)


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    """JFIF forward colour transform, half-up rounded and clamped —
    the exact expressions the oracle replays."""
    y = _half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _half_up(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = _half_up(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    clamp = lambda v: 0 if v < 0 else 255 if v > 255 else v  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


# ----------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per the spec


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical Huffman assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _subsample(plane: np.ndarray, hs: int, vs: int) -> np.ndarray:
    """Half-up box average over hs×vs cells (edge-replicated to even
    multiples first)."""
    if hs == 1 and vs == 1:
        return plane
    h, w = plane.shape
    ph, pw = (-h) % vs, (-w) % hs
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h, w = plane.shape
    s = plane.reshape(h // vs, vs, w // hs, hs).sum(axis=(1, 3))
    return np.floor(s / (hs * vs) + 0.5).astype(np.int64)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % bh, (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def synthesize_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    quality: int = 75,
    subsampling: str = "4:4:4",
) -> bytes:
    """A real baseline JFIF/JPEG file from row-major 8-bit RGB bytes.
    Interleaved single scan, 3 components, Annex K Huffman tables,
    quality-scaled Annex K quant tables."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * 3}"
        )
    hs, vs = _SAMPLING[subsampling]
    rgb = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, 3
    ).astype(np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    clamp = lambda a: np.clip(a, 0, 255)  # noqa: E731
    yp = clamp(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5))
    cbp = clamp(
        np.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    )
    crp = clamp(
        np.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    )
    cbp = _subsample(cbp.astype(np.int64), hs, vs)
    crp = _subsample(crp.astype(np.int64), hs, vs)

    qluma = scaled_quant_table(BASE_QUANT_LUMA, quality)
    qchroma = scaled_quant_table(BASE_QUANT_CHROMA, quality)
    ql = np.array(qluma, dtype=np.float64).reshape(8, 8)
    qc = np.array(qchroma, dtype=np.float64).reshape(8, 8)

    # pad luma to the MCU grid, chroma to the 8-block grid
    yp = _pad_to_blocks(yp.astype(np.int64), 8 * vs, 8 * hs)
    cbp = _pad_to_blocks(cbp, 8, 8)
    crp = _pad_to_blocks(crp, 8, 8)

    dc_l = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]

    def encode_block(
        plane: np.ndarray, by: int, bx: int, q: np.ndarray,
        comp: int, dct_tab: dict, act_tab: dict,
    ) -> None:
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128
        coef = _dct2(block.astype(np.float64))
        # half-up + 1e-7 nudge: the float DCT of an integer block sits
        # O(1e-16) off the exact rational, so an exact .5 quantisation
        # tie (e.g. dc=8, q=16) would floor the wrong way vs the
        # oracle's exact arithmetic; quant steps are multiples of
        # 1/255 >> 1e-7, so the nudge is value-neutral off ties
        quant = np.floor(coef / q + 0.5 + 1e-7).astype(np.int64)
        zz = [int(quant.flat[i]) for i in ZIGZAG]
        diff = zz[0] - prev_dc[comp]
        prev_dc[comp] = zz[0]
        size, bits = _magnitude(diff)
        code, length = dct_tab[size]
        bw_.write(code, length)
        if size:
            bw_.write(bits, size)
        run = 0
        last_nz = 0
        for i in range(63, 0, -1):
            if zz[i]:
                last_nz = i
                break
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                code, length = act_tab[0xF0]  # ZRL
                bw_.write(code, length)
                run -= 16
            size, bits = _magnitude(zz[i])
            code, length = act_tab[(run << 4) | size]
            bw_.write(code, length)
            bw_.write(bits, size)
            run = 0
        if last_nz < 63:
            code, length = act_tab[0x00]  # EOB
            bw_.write(code, length)

    mcus_x = yp.shape[1] // (8 * hs)
    mcus_y = yp.shape[0] // (8 * vs)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for dy in range(vs):
                for dx in range(hs):
                    encode_block(
                        yp, my * vs + dy, mx * hs + dx, ql, 0, dc_l, ac_l
                    )
            encode_block(cbp, my, mx, qc, 1, dc_c, ac_c)
            encode_block(crp, my, mx, qc, 2, dc_c, ac_c)
    bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(
        0xFFDB,
        b"\x00" + bytes(qluma[i] for i in ZIGZAG)
        + b"\x01" + bytes(qchroma[i] for i in ZIGZAG),
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (hs << 4) | vs, 0])  # Y
        + bytes([2, 0x11, 1])            # Cb
        + bytes([3, 0x11, 1]),           # Cr
    )

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    dht_seg = seg(
        0xFFC4,
        dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    )
    sos = seg(
        0xFFDA,
        b"\x03"
        + bytes([1, 0x00, 2, 0x11, 3, 0x11])
        + bytes([0, 63, 0]),
    )
    return (
        b"\xff\xd8" + dqt + sof + dht_seg + sos
        + bytes(bw_.out) + b"\xff\xd9"
    )


# ----------------------------------------------------------- decoder


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; any other 0xFFxx marker ends the stream."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.buf[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.buf[self.pos] if self.pos < len(self.buf) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("hit marker inside entropy stream")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def jpeg_decode(payload: bytes) -> dict:
    """REAL baseline JPEG decode: marker walk, DQT/DHT/SOF0/SOS parse,
    Huffman entropy decode, dequant, float64 IDCT, chroma box
    upsampling, YCbCr→RGB.  Returns ``{width, height, channels,
    pixels}`` (row-major RGB bytes) — the same dict shape as
    ``png_decode`` so the feature extractors compose."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    scan = None
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = struct.unpack(">H", payload[pos : pos + 2])[0]
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = body[i + 1 : i + 65]
                tab = np.zeros(64)
                for j, idx in enumerate(ZIGZAG):
                    tab[idx] = zz[j]
                quant[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                tab = _build_decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tab
                i += 17 + n
        elif marker == 0xFFC0 or marker == 0xFFC1:  # baseline SOF
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE,
                        0xFFCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker {marker:#x}: "
                "progressive/arithmetic/lossless)"
            )
        elif marker == 0xFFDD:  # DRI
            (interval,) = struct.unpack(">H", body[:2])
            if interval:
                raise NotImplementedError("restart markers (DRI)")
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            data_start = pos + 2 + length
            break
        pos += 2 + length
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    br = _BitReader(payload, data_start)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
    pred = {cid: 0 for cid, *_ in comps}
    comp_by_id = {c[0]: c for c in comps}

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, dc_id, ac_id in scan:
                _, ch, cv, tq = comp_by_id[cid]
                q = quant[tq]
                for dy in range(cv):
                    for dx in range(ch):
                        size = _decode_symbol(br, huff_dc[dc_id])
                        diff = _extend(br.read_bits(size), size)
                        pred[cid] += diff
                        zz = [0] * 64
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = _decode_symbol(br, huff_ac[ac_id])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64)
                        for j, idx in enumerate(ZIGZAG):
                            coef[idx] = zz[j]
                        block = _idct2(coef.reshape(8, 8) * q)
                        # half-up + 1e-7 nudge (see module docstring)
                        px = np.clip(
                            np.floor(block + 128 + 0.5 + 1e-7), 0, 255
                        )
                        by = (my * cv + dy) * 8
                        bx = (mx * ch + dx) * 8
                        planes[cid][by : by + 8, bx : bx + 8] = px

    out_planes = []
    for cid, ch, cv, _tq in comps:
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        p = planes[cid][:chh, :cw]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0),
                          hmax // ch, axis=1)[:h, :w]
        out_planes.append(p[:h, :w])

    if len(out_planes) == 1:
        y = out_planes[0]
        pix = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = out_planes
        r = np.floor(y + 1.402 * (cr - 128) + 0.5)
        g = np.floor(
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
        )
        b = np.floor(y + 1.772 * (cb - 128) + 0.5)
        pix = np.stack([r, g, b], axis=-1)
    pix = np.clip(pix, 0, 255).astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "pixels": bytes(pix.tobytes()),
    }
