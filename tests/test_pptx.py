"""PPTX codec (`operators/pptx.py`): round trip, numeric slide
order, run invariance, breaks, honest rejects, dispatch + CLI."""

import pytest

from minerva_etl_spark.operators.pptx import (
    pptx_extract,
    pptx_extract_text,
    synthesize_pptx,
)


def test_roundtrip_slides_and_title():
    b = synthesize_pptx(
        [["Doc 9 deck", "alpha beta gamma delta"], ["closing slide"]],
        title="Deck 9",
    )
    rec = pptx_extract_text(b)
    assert rec["title"] == "Deck 9"
    assert rec["n_slides"] == 2
    assert rec["n_paragraphs"] == 3
    assert rec["text"] == (
        "Doc 9 deck\nalpha beta gamma delta\nclosing slide"
    )
    assert rec["n_chars"] == len(rec["text"])


def test_break_element_and_run_split():
    rec = pptx_extract_text(
        synthesize_pptx([["line one\nline two three four"]])
    )
    assert rec["text"] == "line one\nline two three four"
    assert rec["n_paragraphs"] == 1


def test_slide_order_is_numeric_not_lexicographic():
    """slide10.xml must come after slide9.xml — a lexicographic sort
    puts it after slide1 and scrambles the deck."""
    slides = [[f"slide {i} body"] for i in range(1, 12)]
    rec = pptx_extract_text(synthesize_pptx(slides))
    assert rec["n_slides"] == 11
    assert rec["text"] == "\n".join(f"slide {i} body"
                                    for i in range(1, 12))


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="not a ZIP"):
        pptx_extract_text(b"nope")
    with pytest.raises(ValueError, match="OLE compound"):
        pptx_extract_text(b"\xd0\xcf\x11\xe0rest")
    from minerva_etl_spark.operators.xlsx import synthesize_xlsx

    with pytest.raises(ValueError, match="ppt/presentation.xml"):
        pptx_extract_text(synthesize_xlsx([("S", [["x"]])]))


def test_office_dispatch_routes_pptx(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    b = synthesize_pptx([["routed body"]], title="T")
    assert sniff_document_format(b) == "pptx"
    df = spark.createDataFrame([(1, b)], "doc_id bigint, payload binary")
    out = office_extract(df).collect()[0]
    assert out.format == "pptx"
    assert out.title == "T"
    assert out.text == "routed body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_pptx([["cli text"]])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = pptx_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "cli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_pptx([["via cli"]]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "pptx-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "via cli"
