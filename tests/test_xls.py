"""Legacy .xls BIFF8 (`operators/xls.py`): round trip, SST string
width mix, RK/Number/BoolErr decoding, SST Continue splits, honest
rejects, dispatch + CLI."""

import struct

import pytest

from minerva_etl_spark.operators.xls import (
    _parse_sst,
    _rk_value,
    _int_to_rk,
    synthesize_xls,
    xls_extract,
    xls_extract_text,
)


def test_roundtrip_sheets_title_and_types():
    b = synthesize_xls(
        [
            ("Data", [["alpha beta", "42", "TRUE"],
                      ["wide Δ text", "-7"]]),
            ("Notes", [["note one", "9007199254740"]]),
        ],
        title="Book 9",
    )
    rec = xls_extract_text(b)
    assert rec["title"] == "Book 9"
    assert rec["n_sheets"] == 2
    assert rec["n_rows"] == 3
    assert rec["n_cells"] == 7
    assert rec["text"] == (
        "Data\nalpha beta\t42\tTRUE\nwide Δ text\t-7\n"
        "Notes\nnote one\t9007199254740"
    )
    assert b == synthesize_xls(
        [
            ("Data", [["alpha beta", "42", "TRUE"],
                      ["wide Δ text", "-7"]]),
            ("Notes", [["note one", "9007199254740"]]),
        ],
        title="Book 9",
    )


def test_rk_encodings():
    """All four RK shapes: int, int×100, float-bits, float-bits×100."""
    assert _rk_value(_int_to_rk(42)) == "42"
    assert _rk_value(_int_to_rk(-7)) == "-7"
    assert _rk_value(_int_to_rk(725, times100=True)) == "7.25"
    # float-encoded RK: top 30 bits of an IEEE double
    (bits,) = struct.unpack("<Q", struct.pack("<d", 2.5))
    rk = (bits >> 32) & 0xFFFFFFFC
    assert _rk_value(rk) == "2.5"
    assert _rk_value(rk | 0x01) == "0.025"


def test_sst_continue_split_rereads_width_flag():
    """The format's classic trap: a string split across a Continue
    record re-declares fHighByte for ITS fragment — a compressed
    head may continue as UTF-16 and vice versa."""
    # string 1: 'abcdef' split after 'abc', continuation WIDE
    head = (
        struct.pack("<II", 2, 2)
        + struct.pack("<HB", 6, 0x00)
        + b"abc"
    )
    cont1 = (
        b"\x01"  # continuation flags: wide
        + "def".encode("utf-16-le")
        # string 2 whole in the continuation, compressed
        + struct.pack("<HB", 2, 0x00)
        + b"hi"
    )
    assert _parse_sst(head, [cont1]) == ["abcdef", "hi"]


def test_mulrk_cells():
    """MulRk packs a run of RK cells in one record — hand-built
    workbook, since the writer emits single-cell RKs."""
    from minerva_etl_spark.operators.msdoc import _build_cfb
    from minerva_etl_spark.operators.xls import _bof, _rec

    sst = struct.pack("<II", 1, 1) + struct.pack("<HB", 4, 0) + b"head"
    mulrk = (
        struct.pack("<HH", 1, 0)
        + struct.pack("<HI", 0, _int_to_rk(5))
        + struct.pack("<HI", 0, _int_to_rk(600, times100=True))
        + struct.pack("<H", 1)
    )
    sheet = (
        _bof(0x0010)
        + _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))  # LabelSst
        + _rec(0x00BD, mulrk)
        + _rec(0x000A, b"")
    )
    name = b"S"
    g = (
        _bof(0x0005)
        + _rec(
            0x0085,
            struct.pack("<IBB", 0, 0, 0)
            + struct.pack("<BB", len(name), 0)
            + name,
        )
        + _rec(0x00FC, sst)
        + _rec(0x000A, b"")
    )
    # backpatch the BoundSheet offset to the sheet BOF
    g = bytearray(g)
    struct.pack_into("<I", g, len(_bof(0x0005)) + 4, len(g))
    wb = bytes(g) + sheet
    rec = xls_extract_text(
        _build_cfb([("Workbook", wb.ljust(4096, b"\x00"))])
    )
    assert rec["text"] == "S\nhead\n5\t6"
    assert rec["n_cells"] == 3


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="bad magic"):
        xls_extract_text(b"not ole2")
    from minerva_etl_spark.operators.msdoc import _build_cfb

    with pytest.raises(ValueError, match="Workbook/Book"):
        xls_extract_text(
            _build_cfb(
                [("WordDocument", b"\x00".ljust(4096, b"\x00"))]
            )
        )
    # BIFF5 version word -> named reject
    biff5 = struct.pack("<HHHH", 0x0809, 4, 0x0500, 0x0005)
    with pytest.raises(ValueError, match="BIFF8 only"):
        xls_extract_text(
            _build_cfb([("Workbook", biff5.ljust(4096, b"\x00"))])
        )


def test_office_dispatch_routes_xls(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    b = synthesize_xls([("S", [["routed body"]])], title="T")
    assert sniff_document_format(b) == "xls"
    df = spark.createDataFrame([(1, b)], "doc_id bigint, payload binary")
    out = office_extract(df).collect()[0]
    assert out.format == "xls"
    assert out.title == "T"
    assert out.text == "S\nrouted body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_xls([("S", [["cli text"]])])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = xls_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "S\ncli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_xls([("V", [["via cli"]])]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "xls-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "V\nvia cli"


def test_truncated_sst_raises_instead_of_hanging():
    """r14 ADVICE (high): a wide string with a single odd byte left
    in the final fragment made avail=0/take=0 and spun forever;
    it must fail fast like every other reject path."""
    payload = (
        struct.pack("<II", 1, 1)  # cstTotal=1, cstUnique=1
        + struct.pack("<HB", 2, 1)  # cch=2, fHighByte (wide)
        + b"A"  # one odd byte: not enough for one UTF-16 unit
    )
    with pytest.raises(ValueError, match="SST truncated"):
        _parse_sst(payload, [])
