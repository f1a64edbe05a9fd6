"""EPUB codec (`operators/epub.py`): spine-order extraction against
the reverse-manifest decoy, metadata, multi-paragraph chapters, honest
rejects, and the Spark/CLI paths."""

import io
import zipfile

import pytest

from minerva_etl_spark.operators.epub import (
    epub_extract,
    epub_extract_text,
    synthesize_epub,
)


def test_roundtrip_and_metadata():
    rec = epub_extract_text(
        synthesize_epub(
            ["<p>Doc 3 report</p>", "<p>body text</p>", "<p>end 3</p>"],
            title="Doc 3",
            language="en",
        )
    )
    assert rec["title"] == "Doc 3"
    assert rec["language"] == "en"
    assert rec["n_chapters"] == 3
    assert rec["text"] == "Doc 3 report\nbody text\nend 3"
    assert rec["n_chars"] == len(rec["text"])


def test_spine_order_beats_manifest_and_zip_order():
    """The writer lists manifest items in REVERSE and zip entries in
    forward order; only the spine walk yields reading order."""
    rec = epub_extract_text(
        synthesize_epub(["<p>first</p>", "<p>second</p>", "<p>third</p>"])
    )
    assert rec["text"] == "first\nsecond\nthird"


def test_multi_paragraph_chapter_and_missing_metadata():
    rec = epub_extract_text(synthesize_epub(["<p>a</p><p>b</p>"]))
    assert rec["text"] == "a\nb"
    assert rec["title"] is None and rec["language"] is None


def test_non_xhtml_manifest_items_ignored():
    # the css item is in every synthesized manifest; n_chapters counts
    # only spine XHTML
    rec = epub_extract_text(synthesize_epub(["<p>x</p>"]))
    assert rec["n_chapters"] == 1


def test_stored_and_deflated_agree():
    a = epub_extract_text(synthesize_epub(["<p>p q</p>"], compress=False))
    b = epub_extract_text(synthesize_epub(["<p>p q</p>"], compress=True))
    assert a == b


def test_writer_is_deterministic_and_ocf_shaped():
    b1 = synthesize_epub(["<p>p</p>"], title="t")
    assert b1 == synthesize_epub(["<p>p</p>"], title="t")
    zf = zipfile.ZipFile(io.BytesIO(b1))
    infos = zf.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert zf.read("mimetype") == b"application/epub+zip"


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="not a ZIP"):
        epub_extract_text(b"junk")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("x.txt", "hi")
    with pytest.raises(ValueError, match="container.xml"):
        epub_extract_text(buf.getvalue())


def test_dangling_spine_idref_raises():
    b = bytearray(synthesize_epub(["<p>x</p>"]))
    # corrupt by rebuilding with a spine pointing at a missing id
    buf = io.BytesIO()
    src = zipfile.ZipFile(io.BytesIO(bytes(b)))
    with zipfile.ZipFile(buf, "w") as zf:
        for info in src.infolist():
            data = src.read(info.filename)
            if info.filename == "OEBPS/content.opf":
                data = data.replace(b'idref="c0"', b'idref="nope"')
            zf.writestr(info, data)
    with pytest.raises(ValueError, match="not in manifest"):
        epub_extract_text(buf.getvalue())


def test_spark_extract_and_skip_mode(spark):
    rows = [
        (1, synthesize_epub(["<p>one</p>"], title="T1", language="de")),
        (2, b"not an epub"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = epub_extract(df, on_error="skip").collect()
    assert len(out) == 1
    assert out[0].title == "T1" and out[0].language == "de"
    with pytest.raises(Exception):
        epub_extract(df, on_error="fail").collect()


def test_cli_epub_text(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(10, synthesize_epub(["<p>hello epub</p>"], title="T"))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "epub-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "hello epub" and got.title == "T"
