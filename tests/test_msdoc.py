"""Legacy .doc / OLE2 (`operators/msdoc.py`): CFB container reader
(FAT, directory, mini stream), the Word piece table over both
encodings, control-character normalization, honest rejects,
dispatch + CLI."""

import struct

import pytest

from minerva_etl_spark.operators.msdoc import (
    _build_cfb,
    cfb_list_streams,
    cfb_read_stream,
    doc_extract,
    doc_extract_text,
    synthesize_doc,
)


def test_roundtrip_two_pieces():
    b = synthesize_doc(["Doc 5 report", "plain body text with words"])
    rec = doc_extract_text(b)
    assert rec["title"] is None
    assert rec["n_pieces"] == 2
    assert rec["n_paragraphs"] == 2
    assert rec["text"] == "Doc 5 report\nplain body text with words"
    assert rec["n_chars"] == len(rec["text"])
    assert b == synthesize_doc(
        ["Doc 5 report", "plain body text with words"]
    )


def test_unicode_lands_in_utf16_piece():
    rec = doc_extract_text(
        synthesize_doc(["ascii head", "tail with Δελτα unicode"])
    )
    assert rec["text"] == "ascii head\ntail with Δελτα unicode"
    assert rec["n_pieces"] == 2


def test_all_unicode_degrades_to_single_utf16_piece():
    rec = doc_extract_text(synthesize_doc(["Ωλψμπ", "Δελτα"]))
    assert rec["text"] == "Ωλψμπ\nΔελτα"


def test_word_control_chars_normalize():
    """\\x0b line break → NEWLINE, \\x07 cell mark → TAB, \\x0c page
    break → NEWLINE, field chars \\x13\\x14\\x15 drop."""
    rec = doc_extract_text(
        synthesize_doc(["a\x0bb", "c\x07d", "e\x0cf", "g\x13h\x14i\x15j"])
    )
    assert rec["text"] == "a\nb\nc\td\ne\nf\nghij"


def test_cfb_streams_listed_and_read():
    blob = _build_cfb(
        [
            ("WordDocument", b"W" * 4096),
            ("0Table", b"T" * 4200),
        ]
    )
    assert cfb_list_streams(blob) == ["WordDocument", "0Table"]
    assert cfb_read_stream(blob, "0Table") == b"T" * 4200


def test_cfb_mini_stream_read_path():
    """Hand-built CFB whose stream sits UNDER the 4096 cutoff, so it
    lives in the mini stream: root stream holds the mini sectors, the
    miniFAT chains them — the reader path real small streams (a real
    .doc's 0Table is often < 4096) go through."""
    from minerva_etl_spark.operators.msdoc import _dir_entry

    FREE, END, FATS = 0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD
    content = bytes(range(64)) * 2 + b"tail!"  # 133 bytes, 3 mini sectors
    # sectors: 0 FAT, 1 dir, 2 miniFAT, 3 root mini-stream data
    fat = [FATS, END, END, END] + [FREE] * 124
    root_data = content.ljust(512, b"\x00")
    minifat = [1, 2, END] + [FREE] * 125
    entries = (
        _dir_entry("Root Entry", 5, 3, 512, child=1)
        + _dir_entry("Small", 2, 0, len(content))
    ).ljust(512, b"\x00")
    header = (
        b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
        + b"\x00" * 16
        + struct.pack("<HH", 0x003E, 0x0003)
        + struct.pack("<H", 0xFFFE)
        + struct.pack("<HH", 9, 6)
        + b"\x00" * 6
        + struct.pack("<I", 0)
        + struct.pack("<I", 1)  # 1 FAT sector
        + struct.pack("<I", 1)  # dir start
        + struct.pack("<I", 0)
        + struct.pack("<I", 4096)
        + struct.pack("<I", 2)  # first miniFAT sector
        + struct.pack("<I", 1)
        + struct.pack("<I", END)
        + struct.pack("<I", 0)
        + struct.pack("<109I", *([0] + [FREE] * 108))
    )
    blob = (
        header
        + struct.pack("<128I", *fat)
        + entries
        + struct.pack("<128I", *minifat)
        + root_data
    )
    assert cfb_read_stream(blob, "Small") == content


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="bad magic"):
        doc_extract_text(b"not ole2 at all")
    with pytest.raises(ValueError, match="WordDocument"):
        doc_extract_text(
            _build_cfb([("Workbook", b"\x09\x08".ljust(4096, b"\x00"))])
        )
    with pytest.raises(ValueError, match="wIdent"):
        doc_extract_text(
            _build_cfb(
                [("WordDocument", b"\x00\x00".ljust(4096, b"\x00"))]
            )
        )


def test_office_dispatch_routes_doc_and_tags_ole2(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    d = synthesize_doc(["routed body"])
    assert sniff_document_format(d) == "doc"
    # a compound file that is none of doc/xls/ppt (e.g. an MSI)
    other = _build_cfb([("Contents", b"\x09\x08".ljust(4096, b"\x00"))])
    assert sniff_document_format(other) == "ole2"
    df = spark.createDataFrame(
        [(1, d), (2, other)], "doc_id bigint, payload binary"
    )
    out = office_extract(df, on_error="skip").collect()
    assert len(out) == 1
    assert out[0].format == "doc"
    assert out[0].title is None
    assert out[0].text == "routed body"
    with pytest.raises(Exception, match="tagged, not extracted"):
        office_extract(df, on_error="fail").collect()


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_doc(["cli text"])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = doc_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "cli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_doc(["via cli"]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "doc-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "via cli"


def test_summary_information_title():
    """r13: titles ride a real \\x05SummaryInformation MS-OLEPS
    property set (PID 2, codepage via PID 1); absent stream → NULL."""
    rec = doc_extract_text(
        synthesize_doc(["body text here"], title="Doc 42")
    )
    assert rec["title"] == "Doc 42"
    assert rec["text"] == "body text here"
    assert doc_extract_text(synthesize_doc(["x"]))["title"] is None


def test_summary_title_lpwstr_variant():
    """Real producers also write VT_LPWSTR titles — hand-patch the
    property type to the UTF-16 variant and re-read."""
    import struct as _s

    from minerva_etl_spark.operators.msdoc import (
        _SUMMARY_FMTID,
        _SUMMARY_STREAM,
        _summary_title,
    )

    t = "wide title"
    raw = t.encode("utf-16-le") + b"\x00\x00"
    prop = _s.pack("<II", 31, len(t) + 1) + raw
    section = (
        _s.pack("<II", 8 + 8 + len(prop), 1)
        + _s.pack("<II", 2, 16)
        + prop
    )
    blob = (
        _s.pack("<HHI", 0xFFFE, 0, 0)
        + b"\x00" * 16
        + _s.pack("<I", 1)
        + _SUMMARY_FMTID
        + _s.pack("<I", 48)
        + section
    )
    assert _SUMMARY_STREAM == "\x05SummaryInformation"
    assert _summary_title(blob) == t


def test_fat_chain_cycle_detected_without_size_cap():
    """r14 ADVICE (medium): the old guard capped chains at ~37 MB and
    mis-reported big legitimate streams as cycles.  The bound is now
    len(fat) — the true maximum — so a real cycle still raises while
    a chain exactly as long as the FAT walks fine."""
    from minerva_etl_spark.operators.msdoc import _Cfb, _ENDOFCHAIN

    cfb = _Cfb(synthesize_doc(["cycle guard fixture"]))
    sect = cfb.sect
    # a legitimate chain covering EVERY fat entry once (longer than
    # any proportional cap could reasonably allow relative to fat
    # size) must not be flagged
    n = 100_000
    cfb.fat = list(range(1, n)) + [_ENDOFCHAIN]
    cfb._sector = lambda i: b"\x00" * sect
    assert len(cfb._chain(0)) == n * sect
    # a genuine 2-cycle raises
    cfb.fat = [1, 0]
    with pytest.raises(ValueError, match="FAT chain cycle"):
        cfb._chain(0)
