"""GIF codec tests: LZW round-trip (incl. width growth and the 12-bit
cap), a hand-decoded byte anchor, interlace, animation frame walks,
and the Spark feature extractor."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minerva_etl_spark.operators.gif import (
    gif_decode,
    gif_features,
    lzw_compress,
    lzw_decompress,
    synthesize_gif,
)


def test_lzw_anchor_minimal_gif_stream():
    """Hand-built anchor: the classic 43-byte 1x1 white GIF's image
    stream is `0x44 0x01` at min code size 2 — clear(4), index 0,
    EOI(5), LSB-first.  A self-consistent-but-nonstandard LZW pair
    would round-trip fine yet fail this absolute byte pin."""
    assert lzw_decompress(bytes([0x44, 0x01]), 2) == [0]
    assert lzw_compress([0], 2) == bytes([0x44, 0x01])


def test_decode_canonical_1x1_white_gif():
    """The widely-published minimal 1x1 white GIF decodes: proves the
    full container walk against externally-produced bytes."""
    payload = bytes(
        [0x47, 0x49, 0x46, 0x38, 0x39, 0x61,  # GIF89a
         0x01, 0x00, 0x01, 0x00,              # 1x1
         0x80, 0x00, 0x00,                    # GCT, 2 entries
         0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00,  # white, black
         0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00,  # GCE
         0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
         0x02, 0x02, 0x44, 0x01, 0x00,        # mcs=2, data 44 01
         0x3B]
    )
    d = gif_decode(payload)
    assert (d["width"], d["height"], d["n_frames"]) == (1, 1, 1)
    assert d["pixels"] == b"\xff\xff\xff"
    assert d["version"] == "89a"


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=2, max_value=8).flatmap(
        lambda bits: st.tuples(
            st.just(bits),
            st.lists(
                st.integers(min_value=0, max_value=(1 << bits) - 1),
                min_size=1,
                max_size=400,
            ),
        )
    )
)
def test_lzw_roundtrip_property(bits_and_data):
    bits, data = bits_and_data
    mcs = max(2, bits)
    assert lzw_decompress(lzw_compress(data, mcs), mcs) == data


def test_lzw_roundtrip_past_table_reset():
    """A long low-entropy-then-random stream pushes the dictionary
    past 4096 entries, forcing the mid-stream clear/reset path."""
    data = [(i * 7 + (i * i) % 13) % 4 for i in range(60000)]
    assert lzw_decompress(lzw_compress(data, 2), 2) == data


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_pixels(interlace):
    w, h = 11, 9  # odd sizes exercise every interlace pass remainder
    palette = [((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
               for i in range(8)]
    idx = [(3 * y + 5 * x) % 8 for y in range(h) for x in range(w)]
    payload = synthesize_gif([idx], palette, w, h, interlace=interlace)
    d = gif_decode(payload)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    want = b"".join(bytes(palette[v]) for v in idx)
    assert d["pixels"] == want


def test_gif_animation_frames_and_local_table():
    """Multi-frame GIF: frame count walked; first frame decoded."""
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frames = [[(f + x) % 4 for x in range(6 * 4)] for f in range(3)]
    payload = synthesize_gif(frames, palette, 6, 4)
    d = gif_decode(payload)
    assert d["n_frames"] == 3
    assert d["pixels"][:6] == bytes(palette[0]) + bytes(palette[1])
    # NETSCAPE loop extension present for animations
    assert b"NETSCAPE2.0" in payload


def test_gif_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_gif_features_spark(spark):
    palette = [((i * 41) % 256, (i * 59) % 256, (i * 83) % 256)
               for i in range(8)]
    rows = []
    for m in range(6):
        w, h = 5 + m % 3, 4 + m % 2
        idx = [(m * 7 + y * 31 + x * 13) % 8
               for y in range(h) for x in range(w)]
        rows.append(
            (m, synthesize_gif([idx] * (1 + m % 2), palette, w, h,
                               interlace=(m % 2 == 1)))
        )
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r.media_id: r for r in gif_features(df).collect()}
    assert len(got) == 6
    import math

    m = 4
    w, h = 5 + m % 3, 4 + m % 2
    idx = [(m * 7 + y * 31 + x * 13) % 8
           for y in range(h) for x in range(w)]
    mean_r = math.floor(
        sum((v * 41) % 256 for v in idx) / len(idx) * 1e6 + 0.5
    ) / 1e6
    assert got[m].width == w and got[m].n_frames == 1 + m % 2
    assert got[m].channel_means[0] == mean_r


def test_gif_in_mixed_image_column(spark):
    """sniff_image_format routes GIF payloads in a mixed column."""
    from minerva_etl_spark.operators.multimodal import (
        image_features,
        sniff_image_format,
        synthesize_png,
    )

    palette = [(9, 7, 5), (200, 100, 50)]
    gif = synthesize_gif([[0, 1, 1, 0]], palette, 2, 2)
    assert sniff_image_format(gif) == "gif"
    png = synthesize_png(bytes(range(2 * 2 * 3)), 2, 2, 3, [0])
    df = spark.createDataFrame(
        [(1, gif), (2, png)], "media_id bigint, payload binary"
    )
    got = {r.media_id: r for r in image_features(df).collect()}
    assert got[1].format == "gif" and got[2].format == "png"
    assert got[1].width == 2 and got[1].n_channels == 3


def test_gif_normalized_by_image_resize(spark):
    """image_resize canonicalizes a GIF payload to a PNG of the target
    size (first frame)."""
    from minerva_etl_spark.operators.multimodal import (
        image_resize,
        png_decode,
    )

    palette = [(10, 20, 30), (40, 50, 60)]
    gif = synthesize_gif([[0, 1, 1, 0]], palette, 2, 2)
    df = spark.createDataFrame([(1, gif)], "media_id bigint, payload binary")
    out = image_resize(df, 4, 4).collect()
    d = png_decode(bytes(out[0].payload))
    assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)
    assert d["pixels"][:3] == bytes((10, 20, 30))
