"""BMP/DIB codec (`operators/bmp.py`): 24-bit both row orders, 8-bit
palette plain + RLE8 (escapes included), honest rejects, mixed-image
dispatch."""

import pytest

from minerva_etl_spark.operators.bmp import (
    bmp_decode,
    rle8_decode,
    rle8_encode,
    synthesize_bmp,
)


def _px24(w, h, seed=0):
    return bytes(
        (seed + y * 31 + x * 13 + c * 101) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


@pytest.mark.parametrize("topdown", [False, True])
def test_roundtrip_24bit(topdown):
    px = _px24(7, 5, seed=9)
    b = synthesize_bmp(px, 7, 5, bits=24, topdown=topdown)
    d = bmp_decode(b)
    assert (d["width"], d["height"], d["channels"]) == (7, 5, 3)
    assert d["pixels"] == px and d["bits"] == 24
    assert b == synthesize_bmp(px, 7, 5, bits=24, topdown=topdown)


@pytest.mark.parametrize("rle", [False, True])
def test_roundtrip_8bit_palette(rle):
    pal = [((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
           for i in range(8)]
    idx = bytes((y * 31 + x * 13) % 8 for y in range(6) for x in range(5))
    b = synthesize_bmp(idx, 5, 6, bits=8, palette=pal, rle=rle)
    d = bmp_decode(b)
    assert d["channels"] == 3 and d["bits"] == 8
    exp = b"".join(bytes(pal[i]) for i in idx)
    assert d["pixels"] == exp


def test_rle8_escapes():
    # absolute mode + delta escape, hand-built stream
    # row0: run 3x'A', abs [1,2,3] (odd count -> pad byte), EOL
    stream = (
        b"\x03\x41"          # run
        + b"\x00\x03\x01\x02\x03\x00"  # absolute 3 bytes + pad
        + b"\x00\x00"        # EOL
        + b"\x00\x02\x02\x00"  # delta x+=2 on row1
        + b"\x02\x07"        # run 2x7
        + b"\x00\x01"        # EOB
    )
    rows = rle8_decode(stream, 6, 2)
    assert bytes(rows[0]) == b"AAA\x01\x02\x03"
    assert bytes(rows[1]) == b"\x00\x00\x07\x07\x00\x00"
    assert rle8_decode(rle8_encode([b"ab" * 3, b"\x05" * 6]), 6, 2) == [
        bytearray(b"ab" * 3), bytearray(b"\x05" * 6)
    ]
    with pytest.raises(ValueError, match="overruns"):
        rle8_decode(b"\x09\x01\x00\x01", 4, 1)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        rle8_decode(b"\x01\x01", 4, 1)


def test_honest_rejects():
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"PK\x03\x04 nope")
    px = _px24(4, 4)
    good = bytearray(synthesize_bmp(px, 4, 4))
    import struct

    struct.pack_into("<H", good, 28, 16)  # 16-bit depth
    with pytest.raises(ValueError, match="bit depth 16"):
        bmp_decode(bytes(good))


def test_mixed_dispatch_and_features(spark):
    from minerva_etl_spark.operators.multimodal import (
        image_features,
        sniff_image_format,
    )

    px = _px24(6, 4, seed=3)
    b = synthesize_bmp(px, 6, 4)
    assert sniff_image_format(b) == "bmp"
    df = spark.createDataFrame(
        [(1, b)], "media_id bigint, payload binary"
    )
    row = image_features(df).collect()[0]
    assert row.format == "bmp" and row.width == 6
    import math

    n = 6 * 4
    exp = [
        math.floor(sum(px[c::3]) / n * 1e6 + 0.5) / 1e6
        for c in range(3)
    ]
    assert list(row.channel_means) == exp
