"""RTF codec (`operators/rtf.py`): control-word semantics,
destination skips, hex/unicode escapes, specials, the office-dispatch
route, and the CLI verb."""

import pytest

from minerva_etl_spark.operators.rtf import (
    rtf_extract,
    rtf_extract_text,
    synthesize_rtf,
)


def test_roundtrip_paragraphs():
    rec = rtf_extract_text(
        synthesize_rtf(["Doc 7 report", "plain body text"], title="D7")
    )
    assert rec["text"] == "Doc 7 report\nplain body text"
    assert rec["n_paragraphs"] == 2
    assert rec["n_chars"] == len(rec["text"])


def test_info_and_optional_destinations_do_not_leak():
    """The \\info title group and the {\\* generator destination are
    metadata, never body text."""
    rec = rtf_extract_text(
        synthesize_rtf(["only this"], title="SECRET TITLE")
    )
    assert "SECRET" not in rec["text"]
    assert "minerva-etl-spark" not in rec["text"]
    assert rec["text"] == "only this"


def test_hex_escaped_spaces_decode():
    rec = rtf_extract_text(
        synthesize_rtf(["alpha beta gamma"], hex_escape_spaces=True)
    )
    assert rec["text"] == "alpha beta gamma"


def test_specials_unicode_tab_and_line():
    rec = rtf_extract_text(
        synthesize_rtf(
            ["braces {x} and \\ back", "tab\there", "uniéchar"]
        )
    )
    assert rec["text"] == (
        "braces {x} and \\ back\ntab\there\nuniéchar"
    )


def test_uc_skip_width_honored():
    # \uc2 demands TWO fallback chars skipped after \uN
    raw = b"{\\rtf1\\ansi \\uc2\\u233ab after}"
    rec = rtf_extract_text(raw)
    assert rec["text"] == "é after"


def test_reject_is_honest():
    with pytest.raises(ValueError, match="not an RTF"):
        rtf_extract_text(b"plain prose")


def test_office_dispatch_routes_rtf(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    payload = synthesize_rtf(["routed body"])
    assert sniff_document_format(payload) == "rtf"
    df = spark.createDataFrame(
        [(1, payload)], "doc_id bigint, payload binary"
    )
    out = office_extract(df).collect()[0]
    assert out.format == "rtf"
    assert out.title is None
    assert out.text == "routed body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_rtf(["cli text"])), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = rtf_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].text == "cli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_rtf(["via cli"]))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "rtf-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.text == "via cli"


def test_control_symbols_and_bin_payload():
    """r12 ADVICE: \\~ is a non-breaking space (not a literal '~'),
    \\- an optional hyphen (zero-width), \\_ a non-breaking hyphen,
    and \\binN raw bytes must be consumed — even when they contain
    braces that would otherwise corrupt the group-depth scan."""
    doc = (
        b"{\\rtf1\\ansi\\ansicpg1252 "
        b"a\\~b\\-c\\_d"
        b"{\\*\\objdata \\bin5 \x01{}\x02\x03junk-after-bin}"
        b" tail\\par}"
    )
    rec = rtf_extract_text(doc)
    assert rec["text"] == "a b" + "c-d" + " tail"
    # \bin inside a skipped destination: payload braces must not
    # close the group early (the 'junk-after-bin' stays skipped)
    assert "junk" not in rec["text"] and "\x01" not in rec["text"]


def test_bin_payload_in_body_is_dropped_not_leaked():
    doc = b"{\\rtf1\\ansi before \\bin4 \xde\xad\xbe\xefafter\\par}"
    rec = rtf_extract_text(doc)
    assert rec["text"] == "before after"


def test_rtf_info_metadata():
    """r14: the {\\info} group — title/author text, \\creatim
    datetime — parses without the full text scan, and planting it
    never leaks into extraction."""
    from minerva_etl_spark.operators.rtf import (
        rtf_extract_text,
        rtf_info,
        synthesize_rtf,
    )

    b = synthesize_rtf(
        ["body text here"], title="R Title", author="R Author",
        created="2026-02-03 04:05:06",
    )
    assert rtf_info(b) == {
        "title": "R Title", "author": "R Author",
        "created": "2026-02-03 04:05:06",
    }
    assert rtf_extract_text(b)["text"] == "body text here"
    assert rtf_info(synthesize_rtf(["x"])) == {
        "title": None, "author": None, "created": None,
    }
    import pytest as _p

    with _p.raises(ValueError, match="not an RTF"):
        rtf_info(b"plain bytes")
