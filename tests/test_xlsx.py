"""XLSX codec (`operators/xlsx.py`): writer/reader round trip,
shared vs inline strings, numeric raw form, workbook sheet order,
rich-text run invariance, honest rejects, dispatch + CLI."""

import pytest

from minerva_etl_spark.operators.xlsx import (
    synthesize_xlsx,
    xlsx_extract,
    xlsx_extract_text,
)


def test_roundtrip_sheets_and_title():
    b = synthesize_xlsx(
        [
            ("Data", [["alpha beta", "42", "gamma d"],
                      ["x", "hello world"]]),
            ("Notes", [["note one"]]),
        ],
        title="Book 7",
    )
    rec = xlsx_extract_text(b)
    assert rec["title"] == "Book 7"
    assert rec["n_sheets"] == 2
    assert rec["n_rows"] == 3
    assert rec["n_cells"] == 6
    assert rec["text"] == (
        "Data\nalpha beta\t42\tgamma d\nx\thello world\nNotes\nnote one"
    )
    assert rec["n_chars"] == len(rec["text"])


def test_shared_vs_inline_strings_both_read():
    """The r12 verdict's ask 2 names this pair explicitly: the writer
    alternates shared-table and inline strings by (row+col) parity,
    so one fixture exercises BOTH read paths; a rich-text shared item
    (index > 0, split at the first space) must read run-invariant."""
    import io
    import zipfile

    b = synthesize_xlsx(
        [("S", [["shared one", "inline two"],
                ["inline three", "shared four"]])]
    )
    zf = zipfile.ZipFile(io.BytesIO(b))
    sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    sst = zf.read("xl/sharedStrings.xml").decode()
    assert 't="s"' in sheet and 't="inlineStr"' in sheet
    assert "<r>" in sst  # rich-text runs present in the table
    rec = xlsx_extract_text(b)
    assert rec["text"] == "S\nshared one\tinline two\ninline three\tshared four"


def test_numeric_cells_keep_raw_lexical_form():
    b = synthesize_xlsx([("N", [["7", "-12", "0"]])])
    rec = xlsx_extract_text(b)
    assert rec["text"] == "N\n7\t-12\t0"


def test_bool_and_formula_string_cells():
    """Hand-built sheet XML for the t=\"b\" and t=\"str\" paths the
    writer doesn't emit."""
    import io
    import zipfile

    base = synthesize_xlsx([("S", [["x"]])])
    zf = zipfile.ZipFile(io.BytesIO(base))
    entries = {n: zf.read(n) for n in zf.namelist()}
    entries["xl/worksheets/sheet1.xml"] = (
        b'<?xml version="1.0"?>'
        b'<worksheet xmlns="http://schemas.openxmlformats.org/'
        b'spreadsheetml/2006/main"><sheetData><row r="1">'
        b'<c r="A1" t="b"><v>1</v></c>'
        b'<c r="B1" t="b"><v>0</v></c>'
        b'<c r="C1" t="str"><v>SUM says hi</v></c>'
        b'<c r="D1"/>'
        b"</row></sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, d in entries.items():
            out.writestr(n, d)
    rec = xlsx_extract_text(buf.getvalue())
    assert rec["text"] == "S\nTRUE\tFALSE\tSUM says hi\t"


def test_sheet_order_follows_workbook_not_rid():
    """synthesize_xlsx wires rIds in REVERSE so extraction order is
    proven to come from the workbook's sheet list + rels resolution,
    not rId numbering or zip entry order."""
    b = synthesize_xlsx(
        [("First", [["a"]]), ("Second", [["b"]]), ("Third", [["c"]])]
    )
    rec = xlsx_extract_text(b)
    assert rec["text"] == "First\na\nSecond\nb\nThird\nc"


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="not a ZIP"):
        xlsx_extract_text(b"plainly not a zip")
    with pytest.raises(ValueError, match="OLE compound"):
        xlsx_extract_text(b"\xd0\xcf\x11\xe0rest")
    from minerva_etl_spark.operators.docx import synthesize_docx

    with pytest.raises(ValueError, match="xl/workbook.xml"):
        xlsx_extract_text(synthesize_docx(["not a sheet"]))


def test_shared_index_out_of_range_raises():
    import io
    import zipfile

    base = synthesize_xlsx([("S", [["x"]])])
    zf = zipfile.ZipFile(io.BytesIO(base))
    entries = {n: zf.read(n) for n in zf.namelist()}
    entries["xl/worksheets/sheet1.xml"] = (
        b'<?xml version="1.0"?>'
        b'<worksheet xmlns="http://schemas.openxmlformats.org/'
        b'spreadsheetml/2006/main"><sheetData><row r="1">'
        b'<c r="A1" t="s"><v>99</v></c>'
        b"</row></sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, d in entries.items():
            out.writestr(n, d)
    with pytest.raises(ValueError, match="out of range"):
        xlsx_extract_text(buf.getvalue())


def test_office_dispatch_routes_xlsx(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    b = synthesize_xlsx([("S", [["routed body"]])], title="T")
    assert sniff_document_format(b) == "xlsx"
    df = spark.createDataFrame([(1, b)], "doc_id bigint, payload binary")
    out = office_extract(df).collect()[0]
    assert out.format == "xlsx"
    assert out.title == "T"
    assert out.text == "S\nrouted body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_xlsx([("S", [["cli text"]])])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = xlsx_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "S\ncli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_xlsx([("V", [["via cli"]])]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "xlsx-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "V\nvia cli"


def test_strict_ooxml_namespace_rid_resolves():
    """ECMA-376 STRICT workbooks put r:id under a different namespace
    (purl.oclc.org) — sheet resolution must accept any *}id."""
    import io
    import zipfile

    base = synthesize_xlsx([("S", [["strict body"]])])
    zf = zipfile.ZipFile(io.BytesIO(base))
    entries = {n: zf.read(n) for n in zf.namelist()}
    wb = entries["xl/workbook.xml"].decode()
    wb = wb.replace(
        "http://schemas.openxmlformats.org/officeDocument/2006/"
        "relationships",
        "http://purl.oclc.org/ooxml/officeDocument/relationships",
    )
    entries["xl/workbook.xml"] = wb.encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, d in entries.items():
            out.writestr(n, d)
    rec = xlsx_extract_text(buf.getvalue())
    assert rec["text"] == "S\nstrict body"
    assert rec["n_sheets"] == 1


def test_date_serials_render_iso_1900_system():
    """Date-formatted serials (builtin numFmt 14/22 via styles.xml)
    render as ISO text; the writer/reader pair round-trips ISO
    strings through real serials (r13 verdict ask 5)."""
    rows = [
        ["2026-03-04", "label"],
        ["2026-03-04 05:06:07", "42"],
        ["1900-02-28", "1900-03-01"],
    ]
    b = synthesize_xlsx([("D", rows)])
    rec = xlsx_extract_text(b)
    assert rec["text"] == (
        "D\n2026-03-04\tlabel\n2026-03-04 05:06:07\t42\n"
        "1900-02-28\t1900-03-01"
    )
    assert b == synthesize_xlsx([("D", rows)])


def test_date_serials_1904_system():
    """workbookPr date1904='1' shifts the epoch: the same ISO text
    round-trips through 1904-system serials."""
    b = synthesize_xlsx(
        [("D", [["1904-01-02", "2026-03-04 05:06:07"]])],
        date1904=True,
    )
    rec = xlsx_extract_text(b)
    assert rec["text"] == "D\n1904-01-02\t2026-03-04 05:06:07"


def test_leap_year_bug_serials_59_60_61():
    """The Lotus leap-year bug, straight from hand-built sheet XML:
    serial 59 = 1900-02-28, serial 60 = the phantom 1900-02-29
    (rendered literally), serial 61 = 1900-03-01."""
    import io
    import zipfile

    b = synthesize_xlsx([("D", [["x"]])])
    zf = zipfile.ZipFile(io.BytesIO(b))
    entries = {n: zf.read(n) for n in zf.namelist()}
    entries["xl/worksheets/sheet1.xml"] = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData><row r="1">'
        '<c r="A1" s="1"><v>59</v></c>'
        '<c r="B1" s="1"><v>60</v></c>'
        '<c r="C1" s="1"><v>61</v></c>'
        '<c r="D1"><v>61</v></c>'
        "</row></sheetData></worksheet>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, data in entries.items():
            out.writestr(n, data)
    rec = xlsx_extract_text(buf.getvalue())
    # unstyled D1 keeps the raw lexical form
    assert rec["text"] == "D\n1900-02-28\t1900-02-29\t1900-03-01\t61"


def test_custom_numfmt_dates_and_non_dates():
    """Custom numFmts: date tokens outside quoted/bracketed sections
    drive the render; a plain '0.00' custom format must NOT convert,
    and quoted literals containing y/m/d must not false-positive."""
    import io
    import zipfile

    b = synthesize_xlsx([("D", [["x"]])])
    zf = zipfile.ZipFile(io.BytesIO(b))
    entries = {n: zf.read(n) for n in zf.namelist()}
    entries["xl/styles.xml"] = (
        '<?xml version="1.0"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        '<numFmts count="3">'
        '<numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/>'
        '<numFmt numFmtId="165" formatCode="0.00"/>'
        '<numFmt numFmtId="166" formatCode="&quot;day&quot; 0.0"/>'
        "</numFmts>"
        '<cellXfs count="4"><xf numFmtId="0"/>'
        '<xf numFmtId="164"/><xf numFmtId="165"/>'
        '<xf numFmtId="166"/></cellXfs></styleSheet>'
    ).encode()
    entries["xl/worksheets/sheet1.xml"] = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData><row r="1">'
        '<c r="A1" s="1"><v>46085</v></c>'
        '<c r="B1" s="2"><v>46085</v></c>'
        '<c r="C1" s="3"><v>46085</v></c>'
        "</row></sheetData></worksheet>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, data in entries.items():
            out.writestr(n, data)
    rec = xlsx_extract_text(buf.getvalue())
    assert rec["text"] == "D\n2026-03-04\t46085\t46085"


def test_elapsed_time_formats_keep_raw_serial():
    """r15 (ADVICE): elapsed-time bracket tokens ([h]/[mm]/[ss])
    mark a DURATION format — '[h]:mm:ss' must not classify as a
    date via the leftover 'mm' after the bracket strip; the cell
    keeps its raw serial.  AM/PM-style brackets like [$-409] still
    classify by their remaining tokens."""
    from minerva_etl_spark.operators.xlsx import _custom_fmt_kind

    assert _custom_fmt_kind("[h]:mm:ss") is None
    assert _custom_fmt_kind("[hh]:mm") is None
    assert _custom_fmt_kind("[mm]:ss") is None
    assert _custom_fmt_kind("[ss].00") is None
    # locale prefix is NOT an elapsed token — still a datetime
    assert _custom_fmt_kind("[$-409]h:mm AM/PM") == "datetime"
    assert _custom_fmt_kind("yyyy-mm-dd") == "date"
