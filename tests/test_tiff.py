"""Baseline TIFF codec (`operators/tiff.py`): writer/reader round
trips in both byte orders, PackBits, multi-strip/multi-page, honest
rejects, Spark features + mixed-image dispatch."""

import struct

import pytest

from minerva_etl_spark.operators.tiff import (
    packbits_decode,
    packbits_encode,
    synthesize_tiff,
    tiff_decode,
    tiff_features,
)


def _px(w, h, ch, seed=0):
    return bytes(
        (seed + y * 31 + x * 13 + c * 101) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_packbits_vectors_and_roundtrip():
    # the spec's classic example
    data = bytes.fromhex("aaaaaa80002aaaaaaaaaaaaa80002a22aaaaaaaaaaaaaaaaaaaa24aaaa")
    enc = packbits_encode(data)
    assert packbits_decode(enc, len(data)) == data
    # runs, literals, singletons
    for raw in (b"", b"a", b"ab", b"aaa", b"aaab" * 50,
                bytes(range(256)), b"\x00" * 300):
        assert packbits_decode(packbits_encode(raw), len(raw)) == raw
    with pytest.raises(ValueError, match="PackBits"):
        packbits_decode(b"\x05ab", 6)  # truncated literal


@pytest.mark.parametrize("bo", ["II", "MM"])
@pytest.mark.parametrize("comp", [1, 32773])
def test_roundtrip_gray_and_rgb(bo, comp):
    for ch in (1, 3):
        px = _px(7, 6, ch, seed=5)
        b = synthesize_tiff([(px, 7, 6, ch)], byte_order=bo,
                            compression=comp, rows_per_strip=4)
        d = tiff_decode(b)
        assert (d["width"], d["height"], d["channels"]) == (7, 6, ch)
        assert d["pixels"] == px
        assert d["n_pages"] == 1 and d["byte_order"] == bo
        assert b == synthesize_tiff([(px, 7, 6, ch)], byte_order=bo,
                                    compression=comp, rows_per_strip=4)


def test_multipage_counts_pages_first_decoded():
    p1, p2, p3 = _px(5, 4, 3, 1), _px(6, 3, 3, 2), _px(4, 4, 1, 3)
    b = synthesize_tiff(
        [(p1, 5, 4, 3), (p2, 6, 3, 3), (p3, 4, 4, 1)],
        byte_order="MM", compression=32773,
    )
    d = tiff_decode(b)
    assert d["n_pages"] == 3
    assert d["pixels"] == p1 and d["width"] == 5


def test_honest_rejects():
    with pytest.raises(ValueError, match="not a TIFF"):
        tiff_decode(b"PNG whatever")
    good = bytearray(synthesize_tiff([(_px(4, 4, 1), 4, 4, 1)]))
    # unsupported compression: patch the Compression entry value to
    # old-style JPEG (6 — LZW=5 became a real decode path in r14)
    i = good.index(struct.pack("<HH", 259, 3))
    bad = bytes(good[: i + 8]) + struct.pack("<H", 6) + bytes(
        good[i + 10 :]
    )
    with pytest.raises(ValueError, match="compression 6"):
        tiff_decode(bad)
    # IFD chain cycle: point the next-IFD pointer back at itself
    d = synthesize_tiff([(_px(4, 4, 1), 4, 4, 1)])
    (first_ifd,) = struct.unpack_from("<I", d, 4)
    n = struct.unpack_from("<H", d, first_ifd)[0]
    nxt_at = first_ifd + 2 + n * 12
    cyc = bytearray(d)
    struct.pack_into("<I", cyc, nxt_at, first_ifd)
    with pytest.raises(ValueError, match="cycle"):
        tiff_decode(bytes(cyc))


def test_spark_features_and_mixed_dispatch(spark):
    from minerva_etl_spark.operators.multimodal import (
        image_features,
        sniff_image_format,
    )

    rows = []
    for mid in range(1, 7):
        ch = 1 if mid % 2 else 3
        px = _px(5 + mid % 3, 4, ch, seed=mid)
        rows.append(
            (mid,
             synthesize_tiff(
                 [(px, 5 + mid % 3, 4, ch)],
                 byte_order="II" if mid % 2 else "MM",
                 compression=32773 if mid % 3 == 0 else 1,
             ))
        )
    assert sniff_image_format(rows[0][1]) == "tiff"
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r.media_id: r for r in tiff_features(df).collect()}
    assert len(got) == 6
    for mid, r in got.items():
        ch = 1 if mid % 2 else 3
        px = _px(5 + mid % 3, 4, ch, seed=mid)
        import math

        n = len(px) // ch
        exp = [
            math.floor(sum(px[c::ch]) / n * 1e6 + 0.5) / 1e6
            for c in range(ch)
        ]
        assert list(r.channel_means) == exp
        assert r.n_channels == ch
    # the mixed-image dispatcher routes tiff too
    out = image_features(df).collect()
    assert {r.format for r in out} == {"tiff"}
    # skip-mode drops a corrupt payload
    df2 = spark.createDataFrame(
        rows[:2] + [(99, b"II*\x00garbage")],
        "media_id bigint, payload binary",
    )
    kept = tiff_features(df2, on_error="skip").collect()
    assert sorted(r.media_id for r in kept) == [1, 2]


def test_cli_tiff_features(spark, tmp_path):
    from minerva_etl_spark.cli import main

    rows = [(1, synthesize_tiff([(_px(5, 4, 3, 1), 5, 4, 3)]))]
    src = str(tmp_path / "media")
    spark.createDataFrame(
        rows, "media_id bigint, payload binary"
    ).write.parquet(src)
    out = str(tmp_path / "feat")
    main(["media", "tiff-features", "--input", src, "--output", out])
    got = spark.read.parquet(out).collect()[0]
    assert got.width == 5 and got.n_pages == 1


def test_lzw_roundtrip_and_tiff_lzw_predictor():
    """TIFF-variant LZW (MSB-first, early change) round-trips runs,
    noise (12-bit wrap + Clear), and empty input; the horizontal-
    differencing predictor composes with it inside full files."""
    import os
    import random

    from minerva_etl_spark.operators.tiff import (
        lzw_decode,
        lzw_encode,
    )

    rng = random.Random(3)
    for _ in range(10):
        n = rng.randrange(0, 2000)
        data = bytes(rng.randrange(256) for _ in range(n))
        assert lzw_decode(lzw_encode(data), n) == data
    noise = os.urandom(60_000)  # forces the 12-bit wrap + re-Clear
    assert lzw_decode(lzw_encode(noise), len(noise)) == noise
    with pytest.raises(ValueError, match="truncated"):
        lzw_decode(lzw_encode(b"abcabc")[:2], 6)
    for pred in (1, 2):
        px = _px(7, 9, 3, seed=4)
        t = synthesize_tiff([(px, 7, 9, 3)], byte_order="MM",
                            compression=5, rows_per_strip=4,
                            predictor=pred)
        assert tiff_decode(t)["pixels"] == px


def test_jpeg_in_tiff_roundtrip_and_rejects():
    """Compression 7: every strip a complete baseline JPEG; solid
    bands decode to the jpeg closed form; geometry cross-checks and
    the predictor prohibition are honest rejects."""
    w, h, rps = 7, 8, 4
    px = bytearray()
    for y in range(h):
        k = y // rps
        px += bytes(((10 + 60 * k) % 256, 90, (200 + k) % 256)) * w
    t = synthesize_tiff([(bytes(px), w, h, 3)], compression=7,
                        rows_per_strip=rps)
    d = tiff_decode(t)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    # bands are solid after decode (DC-only blocks)
    for y in range(h):
        row = d["pixels"][y * w * 3 : (y + 1) * w * 3]
        assert row == row[:3] * w
    with pytest.raises(ValueError, match="predictor does not apply"):
        synthesize_tiff([(bytes(px), w, h, 3)], compression=7,
                        predictor=2)
    gray = bytes(w * h)
    with pytest.raises(ValueError, match="RGB"):
        synthesize_tiff([(gray, w, h, 1)], compression=7)
