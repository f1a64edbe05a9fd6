"""Outlook .msg (`operators/msg.py`): property-stream decode both
widths, directory-tree top-level isolation (nested decoys must not
leak), honest rejects, dispatch + CLI."""

import pytest

from minerva_etl_spark.operators.msg import (
    msg_extract,
    msg_extract_text,
    synthesize_msg,
)


def test_roundtrip_wide_and_narrow():
    for wide in (True, False):
        rec = msg_extract_text(
            synthesize_msg(
                "Subject 7", "body text here",
                sender="Alice A", to="Bob B; Carol C", wide=wide,
            )
        )
        assert rec["subject"] == "Subject 7"
        assert rec["sender"] == "Alice A"
        assert rec["to"] == "Bob B; Carol C"
        assert rec["body"] == "body text here"
        assert rec["n_recipients"] == 1
        assert rec["n_chars"] == 14


def test_nested_recipient_decoy_does_not_leak():
    """The recipient storage carries its own __substg1.0_0037 subject
    stream — the top-level tree walk must never surface it."""
    rec = msg_extract_text(synthesize_msg("Real Subject", "b"))
    assert rec["subject"] == "Real Subject"
    assert "DECOY" not in (rec["subject"] or "")


def test_unicode_needs_wide():
    rec = msg_extract_text(
        synthesize_msg("Σ subject", "Δ body", wide=True)
    )
    assert rec["subject"] == "Σ subject"
    assert rec["body"] == "Δ body"


def test_determinism():
    a = synthesize_msg("S", "b", sender="x", to="y")
    b = synthesize_msg("S", "b", sender="x", to="y")
    assert a == b


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="bad magic"):
        msg_extract_text(b"not a message")
    from minerva_etl_spark.operators.msdoc import _build_cfb

    with pytest.raises(ValueError, match="__substg1.0_"):
        msg_extract_text(
            _build_cfb([("Contents", b"x".ljust(4096, b"\x00"))])
        )


def test_office_dispatch_routes_msg(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    b = synthesize_msg("Routed Subject", "routed body")
    assert sniff_document_format(b) == "msg"
    df = spark.createDataFrame([(1, b)], "doc_id bigint, payload binary")
    out = office_extract(df).collect()[0]
    assert out.format == "msg"
    assert out.title == "Routed Subject"
    assert out.text == "routed body"


def test_spark_extract_and_cli(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    rows = [(1, synthesize_msg("S", "cli text")), (2, b"junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = msg_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].body == "cli text"

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [(9, synthesize_msg("V", "via cli"))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "msg-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out")).collect()[0]
    assert got.body == "via cli"


def test_mail_extract_mixed_dispatch(spark):
    """r13: the mixed eml/.msg mail dispatcher routes by magic and
    unifies the schema; junk drops under skip."""
    from minerva_etl_spark.operators.email_ingest import (
        mail_extract,
        synthesize_eml,
    )

    rows = [
        (1, synthesize_eml(subject="S1", sender="a@x.test",
                           text_body="wire body")),
        (2, synthesize_msg("S2", "desktop body", sender="b@x.test")),
        (3, b"neither format"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in mail_extract(df, on_error="skip").collect()}
    assert set(out) == {1, 2}
    assert out[1].kind == "eml" and out[1].text == "wire body"
    assert out[1].subject == "S1" and out[1].sender == "a@x.test"
    assert out[2].kind == "msg" and out[2].text == "desktop body"
    assert out[2].sender == "b@x.test"
