"""EXIF scan + privacy strip (`operators/exif.py`): both TIFF byte
orders, inline vs offset values, GPS presence, census semantics,
byte-identical strip, Spark + CLI paths."""

import pytest

from minerva_etl_spark.operators.exif import (
    insert_app1,
    parse_exif,
    strip_exif_bytes,
    synthesize_exif_app1,
)
from minerva_etl_spark.operators.jpeg import synthesize_jpeg


def _jpeg():
    return synthesize_jpeg(
        bytes([10, 20, 30] * 48), 8, 6, quality=75, subsampling="4:2:0"
    )


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_parse_both_byte_orders(bo):
    tagged = insert_app1(
        _jpeg(),
        synthesize_exif_app1(
            make="TestCam",
            model="Model X 2000",
            orientation=6,
            datetime="2026:02:03 04:05:06",
            gps=(1.0, 2.0),
            byte_order=bo,
        ),
    )
    r = parse_exif(tagged)
    assert r["make"] == "TestCam"
    assert r["model"] == "Model X 2000"  # offset-stored ASCII
    assert r["orientation"] == 6
    assert r["datetime"] == "2026:02:03 04:05:06"
    assert r["has_gps"] is True
    assert r["n_tags"] == 5


def test_inline_short_ascii_value():
    """ASCII values ≤ 4 bytes store INLINE in the IFD entry."""
    r = parse_exif(
        insert_app1(_jpeg(), synthesize_exif_app1(make="abc"))
    )
    assert r["make"] == "abc" and r["has_gps"] is False


def test_census_semantics_never_reject():
    assert parse_exif(_jpeg())["n_tags"] == 0
    assert parse_exif(b"not a jpeg")["make"] is None


def test_strip_is_byte_identical_and_safe():
    base = _jpeg()
    tagged = insert_app1(
        base, synthesize_exif_app1(make="X", gps=(1.0, 2.0))
    )
    assert strip_exif_bytes(tagged) == base
    assert parse_exif(strip_exif_bytes(tagged))["n_tags"] == 0
    # pass-through for non-JPEG and already-clean payloads
    assert strip_exif_bytes(base) == base
    assert strip_exif_bytes(b"junk") == b"junk"


def test_strip_preserves_decode(spark):
    """The privacy pass must not perturb pixels: jpeg_features over
    stripped payloads equals features over the originals."""
    from minerva_etl_spark.operators.exif import strip_exif
    from minerva_etl_spark.operators.multimodal import image_features

    base = _jpeg()
    tagged = insert_app1(
        base, synthesize_exif_app1(make="Cam", gps=(1.0, 2.0))
    )
    df = spark.createDataFrame(
        [(1, tagged)], "media_id bigint, payload binary"
    )
    stripped = strip_exif(df)
    f_clean = image_features(stripped).collect()[0]
    f_base = image_features(
        spark.createDataFrame(
            [(1, base)], "media_id bigint, payload binary"
        )
    ).collect()[0]
    assert f_clean == f_base


def test_spark_scan_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media
    from minerva_etl_spark.operators.exif import exif_scan

    rows = [
        (1, insert_app1(_jpeg(), synthesize_exif_app1(
            make="CamA", gps=(1.0, 2.0)))),
        (2, _jpeg()),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r.media_id: r for r in exif_scan(df).collect()}
    assert out[1].make == "CamA" and out[1].has_gps is True
    assert out[2].make is None and out[2].has_gps is False

    inp = str(tmp_path / "in")
    df.write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "exif-strip"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    back = spark.read.parquet(str(tmp_path / "out"))
    scanned = exif_scan(back).collect()
    assert all(r.n_tags == 0 for r in scanned)
