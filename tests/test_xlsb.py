"""Excel Binary Workbook codec (`operators/xlsb.py`): BIFF12 record
framing, both string mechanisms, numeric cells, bundle order,
dispatch, and honest rejects."""

import io
import zipfile

import pytest

from minerva_etl_spark.operators.office import sniff_document_format
from minerva_etl_spark.operators.xlsb import (
    synthesize_xlsb,
    xlsb_extract,
    xlsb_extract_text,
)


def test_roundtrip_sheets_strings_numbers():
    b = synthesize_xlsb(
        [("Data", [["alpha", "42", "TRUE"], ["beta", "-7"]]),
         ("Notes", [["n1"], ["n2", "1000000000000"]])],
        title="XB",
    )
    r = xlsb_extract_text(b)
    assert r["text"] == (
        "Data\nalpha\t42\tTRUE\nbeta\t-7\nNotes\nn1\nn2\t1000000000000"
    )
    assert (r["title"], r["n_sheets"], r["n_rows"], r["n_cells"]) == (
        "XB", 2, 4, 8)


def test_inline_vs_shared_strings_both_read():
    """Every 3rd unique string writes as an inline BrtCellSt; the
    rest go through the shared-string table."""
    b = synthesize_xlsb([("S", [["u0", "u1", "u2", "u3", "u2"]])])
    assert xlsb_extract_text(b)["text"] == "S\nu0\tu1\tu2\tu3\tu2"


def test_sheet_order_follows_bundle_not_rids():
    """The writer wires rIds in REVERSE — extraction order must come
    from the BrtBundleSh list."""
    b = synthesize_xlsb(
        [("First", [["a"]]), ("Second", [["b"]]), ("Third", [["c"]])]
    )
    assert xlsb_extract_text(b)["text"] == (
        "First\na\nSecond\nb\nThird\nc"
    )


def test_varint_framing_two_byte_types():
    """Record ids ≥ 0x80 (BrtBundleSh, BrtBeginSst...) use the
    2-byte type form — a framing bug breaks the whole walk."""
    b = synthesize_xlsb([("S" * 40, [["x" * 200]])])  # long strings
    r = xlsb_extract_text(b)
    assert r["text"].startswith("S" * 40 + "\n")
    assert r["n_cells"] == 1


def test_office_dispatch_and_metadata(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        office_metadata,
    )

    b = synthesize_xlsb(
        [("Data", [["v", "9"]])], title="T", author="A",
        created="2026-02-03 04:05:06",
    )
    assert sniff_document_format(b) == "xlsb"
    df = spark.createDataFrame(
        [(1, b)], "doc_id bigint, payload binary"
    )
    got = office_extract(df).collect()[0]
    assert (got.format, got.title, got.text) == ("xlsb", "T", "Data\nv\t9")
    meta = office_metadata(df).collect()[0]
    assert (meta.format, meta.author, meta.created) == (
        "xlsb", "A", "2026-02-03 04:05:06")


def test_spark_operator(spark):
    rows = [(i, synthesize_xlsb([("S", [[f"r{i}", str(i)]])]))
            for i in range(4)]
    got = {
        r.doc_id: r
        for r in xlsb_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert got[2].text == "S\nr2\t2" and got[2].n_cells == 2


def test_malformed_structures_are_valueerrors(spark):
    """r15 review: short cell payloads, garbage rels XML, and
    non-finite Real cells surface as ValueError / render safely —
    never a raw struct/IndexError/ParseError/OverflowError that
    kills an on_error='skip' scan."""
    import struct

    from minerva_etl_spark.operators.xlsb import (
        _BRT_CELL_BOOL,
        _BRT_CELL_REAL,
        _num_str,
        _rec,
    )

    assert _num_str(float("inf")) == "inf"
    assert _num_str(float("nan")) == "nan"

    def rebuild(part_patch=None, rels_patch=None):
        good = synthesize_xlsb([("S", [["x"]])])
        zf = zipfile.ZipFile(io.BytesIO(good))
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as out:
            for n in zf.namelist():
                data = zf.read(n)
                if part_patch and n == "xl/worksheets/sheet1.bin":
                    data = part_patch(data)
                if rels_patch and n == "xl/_rels/workbook.bin.rels":
                    data = rels_patch(data)
                out.writestr(n, data)
        return buf.getvalue()

    # a well-framed BrtCellBool with a SHORT payload (8 bytes, no
    # bool byte) and a BrtCellReal with only 4 value bytes
    short_bool = rebuild(
        part_patch=lambda d: d
        + _rec(_BRT_CELL_BOOL, struct.pack("<II", 0, 0))
    )
    with pytest.raises(ValueError):
        xlsb_extract_text(short_bool)
    short_real = rebuild(
        part_patch=lambda d: d
        + _rec(_BRT_CELL_REAL, struct.pack("<II", 0, 0) + b"\x00" * 4)
    )
    with pytest.raises(ValueError):
        xlsb_extract_text(short_real)
    # garbage rels XML
    bad_rels = rebuild(rels_patch=lambda d: b"<not-xml")
    with pytest.raises(ValueError):
        xlsb_extract_text(bad_rels)
    # and the operator skips all of them under the policy
    rows = [(1, short_bool), (2, bad_rels),
            (3, synthesize_xlsb([("S", [["ok"]])]))]
    out = xlsb_extract(
        spark.createDataFrame(rows, "doc_id bigint, payload binary"),
        on_error="skip",
    ).collect()
    assert [(r.doc_id, r.text) for r in out] == [(3, "S\nok")]


def test_metadata_xml_escaping():
    """r15 review: titles with XML metacharacters must round-trip —
    the writer escapes core.xml (reusing the xlsx escape)."""
    b = synthesize_xlsb(
        [("S", [["x"]])], title="P&L <2026>", author='Q"A',
    )
    assert xlsb_extract_text(b)["title"] == "P&L <2026>"


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="zip"):
        xlsb_extract_text(b"junk")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", "<x/>")
    with pytest.raises(ValueError, match="workbook.bin"):
        xlsb_extract_text(buf.getvalue())
    # torn record stream must raise, not spin or mis-frame
    good = synthesize_xlsb([("S", [["x"]])])
    zf = zipfile.ZipFile(io.BytesIO(good))
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as out:
        for n in zf.namelist():
            data = zf.read(n)
            if n == "xl/workbook.bin":
                # tear INSIDE the tail record's framing (removing a
                # whole record would still be a valid stream)
                data = data[:-1]
            out.writestr(n, data)
    with pytest.raises(ValueError, match="truncated"):
        xlsb_extract_text(buf2.getvalue())
    # shared-string index out of range
    b3 = synthesize_xlsb([("S", [["only"]])])
    zf3 = zipfile.ZipFile(io.BytesIO(b3))
    buf3 = io.BytesIO()
    with zipfile.ZipFile(buf3, "w") as out:
        for n in zf3.namelist():
            data = zf3.read(n)
            if n == "xl/sharedStrings.bin":
                data = data[:5]  # keep only BrtBeginSst
            out.writestr(n, data)
    with pytest.raises(ValueError):
        xlsb_extract_text(buf3.getvalue())