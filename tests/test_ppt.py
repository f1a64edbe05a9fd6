"""Legacy .ppt (`operators/ppt.py`): record-tree walk, both text
atom encodings, paragraph marks, honest rejects, dispatch + CLI."""

import pytest

from minerva_etl_spark.operators.ppt import (
    ppt_extract,
    ppt_extract_text,
    synthesize_ppt,
)


def test_roundtrip_decks_and_title():
    b = synthesize_ppt(
        [["Doc 3 deck", "alpha beta"], ["closing line"]],
        title="Deck 3",
    )
    rec = ppt_extract_text(b)
    assert rec["title"] == "Deck 3"
    assert rec["n_texts"] == 2
    assert rec["n_paragraphs"] == 3
    assert rec["text"] == "Doc 3 deck\nalpha beta\nclosing line"
    assert b == synthesize_ppt(
        [["Doc 3 deck", "alpha beta"], ["closing line"]],
        title="Deck 3",
    )


def test_both_atom_encodings_in_one_deck():
    """Writer alternates TextBytesAtom / TextCharsAtom; non-latin
    text upgrades to the chars atom regardless of parity."""
    import struct

    from minerva_etl_spark.operators.msdoc import cfb_read_stream

    b = synthesize_ppt([["bytes block"], ["Δ chars block"]])
    blob = cfb_read_stream(b, "PowerPoint Document")
    types = []
    pos = 0
    while pos + 8 <= len(blob):
        vi, rt, rl = struct.unpack_from("<HHI", blob, pos)
        if rt == 0 and rl == 0:
            break
        types.append(rt)
        pos += 8 if (vi & 0xF) == 0xF else 8 + rl
    assert 0x0FA8 in types and 0x0FA0 in types
    assert ppt_extract_text(b)["text"] == "bytes block\nΔ chars block"


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="bad magic"):
        ppt_extract_text(b"junk")
    from minerva_etl_spark.operators.msdoc import _build_cfb

    with pytest.raises(ValueError, match="PowerPoint Document"):
        ppt_extract_text(
            _build_cfb([("Workbook", b"\x00".ljust(4096, b"\x00"))])
        )


def test_office_dispatch_routes_ppt(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    b = synthesize_ppt([["routed body"]], title="T")
    assert sniff_document_format(b) == "ppt"
    df = spark.createDataFrame([(1, b)], "doc_id bigint, payload binary")
    out = office_extract(df).collect()[0]
    assert out.format == "ppt"
    assert out.title == "T"
    assert out.text == "routed body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_ppt([["cli text"]])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = ppt_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "cli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_ppt([["via cli"]]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "ppt-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "via cli"


def test_hostile_deep_nesting_does_not_recurse():
    """A pathological file nesting thousands of containers must not
    blow Python's recursion limit (the walk is an explicit stack)."""
    import struct

    from minerva_etl_spark.operators.msdoc import _build_cfb
    from minerva_etl_spark.operators.ppt import _atom

    inner = _atom(0x0FA8, b"deep text")
    for _ in range(5000):
        inner = struct.pack("<HHI", 0x000F, 0x03E8, len(inner)) + inner
    blob = _build_cfb(
        [("PowerPoint Document", inner.ljust(4 * 4096, b"\x00"))]
    )
    rec = ppt_extract_text(blob)
    assert rec["text"] == "deep text"
