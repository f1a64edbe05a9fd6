"""DOCX codec (`operators/docx.py`): writer/reader round trip,
run-split invariance, tab/br/table semantics, metadata, honest
rejects, and the Spark/CLI paths."""

import pytest

from minerva_etl_spark.operators.docx import (
    docx_extract,
    docx_extract_text,
    synthesize_docx,
)


def test_roundtrip_paragraphs_and_title():
    b = synthesize_docx(
        ["Doc 5 report", "hello world this is a longer paragraph"],
        title="Doc 5",
    )
    rec = docx_extract_text(b)
    assert rec["title"] == "Doc 5"
    assert rec["n_paragraphs"] == 2
    assert rec["n_tables"] == 0
    assert rec["text"] == (
        "Doc 5 report\nhello world this is a longer paragraph"
    )
    assert rec["n_chars"] == len(rec["text"])


@pytest.mark.parametrize("runs", [1, 2, 3, 7])
def test_run_split_is_invisible(runs):
    text = "one two three four five six seven eight nine ten"
    rec = docx_extract_text(
        synthesize_docx([text], runs_per_para=runs)
    )
    assert rec["text"] == text


def test_tab_and_break_elements():
    rec = docx_extract_text(synthesize_docx(["a\tb", "x\ny"]))
    assert rec["text"] == "a\tb\nx\ny"
    assert rec["n_paragraphs"] == 2


def test_table_block():
    rec = docx_extract_text(
        synthesize_docx(
            ["before"], table=[["a1", "b1"], ["a2", "b2"]]
        )
    )
    assert rec["n_tables"] == 1
    assert rec["n_paragraphs"] == 1  # cell paragraphs don't count
    assert rec["text"] == "before\na1\tb1\na2\tb2"


def test_xml_escapes_roundtrip():
    rec = docx_extract_text(synthesize_docx(["a & b < c > d"]))
    assert rec["text"] == "a & b < c > d"


def test_missing_title_is_null():
    assert docx_extract_text(synthesize_docx(["p"]))["title"] is None


def test_stored_and_deflated_agree():
    a = docx_extract_text(synthesize_docx(["p one two"], compress=False))
    b = docx_extract_text(synthesize_docx(["p one two"], compress=True))
    assert a == b


def test_writer_is_deterministic():
    assert synthesize_docx(["p"], title="t") == synthesize_docx(
        ["p"], title="t"
    )


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="not a ZIP"):
        docx_extract_text(b"junk bytes")
    with pytest.raises(ValueError, match="OLE compound"):
        docx_extract_text(b"\xd0\xcf\x11\xe0rest of an ole file")
    # a ZIP that isn't a DOCX
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "hi")
    with pytest.raises(ValueError, match="word/document.xml"):
        docx_extract_text(buf.getvalue())


def test_spark_extract_and_skip_mode(spark):
    rows = [
        (1, synthesize_docx(["Doc 1 report", "body text"], title="D1")),
        (2, b"not a docx"),
        (3, synthesize_docx(["only para"])),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {
        r.doc_id: r
        for r in docx_extract(df, on_error="skip").collect()
    }
    assert set(out) == {1, 3}
    assert out[1].title == "D1"
    assert out[1].text == "Doc 1 report\nbody text"
    assert out[3].title is None
    with pytest.raises(Exception):
        docx_extract(df, on_error="fail").collect()


def test_cli_docx_text(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(10, synthesize_docx(["hello docx"], title="T"))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "docx-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "hello docx" and got.title == "T"
