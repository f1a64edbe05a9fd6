"""EML/MBOX ingest (`operators/email_ingest.py`): MIME shapes,
transfer decodings, alternative preference, RFC 2047 subjects, mbox
splitting with From-escaping, and the Spark/CLI paths."""

import pytest

from minerva_etl_spark.operators.email_ingest import (
    eml_extract,
    eml_extract_text,
    mbox_split,
    synthesize_eml,
    synthesize_mbox,
)


def test_single_part_plain():
    rec = eml_extract_text(
        synthesize_eml("Subj", "a@b.test", text_body="hello body")
    )
    assert rec == {
        "subject": "Subj",
        "sender": "a@b.test",
        "n_parts": 1,
        "text": "hello body",
        "n_chars": 10,
    }


@pytest.mark.parametrize("cte", ["7bit", "quoted-printable", "base64"])
def test_transfer_encodings_roundtrip(cte):
    body = "text with = signs, spaces and a trailing word"
    rec = eml_extract_text(
        synthesize_eml("S", "a@b.test", text_body=body, cte=cte)
    )
    assert rec["text"] == body


def test_alternative_prefers_plain():
    rec = eml_extract_text(
        synthesize_eml(
            "S", "a@b.test",
            text_body="plain wins",
            html_body="<p>html loses</p>",
            cte="quoted-printable",
        )
    )
    assert rec["text"] == "plain wins"
    assert rec["n_parts"] == 2


def test_html_only_goes_through_html_extractor():
    rec = eml_extract_text(
        synthesize_eml(
            "S", "a@b.test",
            html_body="<p>first</p><p>second</p>", cte="base64",
        )
    )
    assert rec["text"] == "first\nsecond"


def test_attachment_counts_part_contributes_no_text():
    rec = eml_extract_text(
        synthesize_eml(
            "S", "a@b.test", text_body="with blob",
            attachment=b"\x00\x01bin",
        )
    )
    assert rec["text"] == "with blob"
    assert rec["n_parts"] == 2


def test_rfc2047_subject_decodes():
    rec = eml_extract_text(
        synthesize_eml(
            "Doc 5 mail", "a@b.test", text_body="x",
            q_encode_subject=True,
        )
    )
    assert rec["subject"] == "Doc 5 mail"


def test_reject_is_honest():
    with pytest.raises(ValueError, match="not an email"):
        eml_extract_text(b"\x00\x01\x02 not mail at all")


def test_mbox_split_and_from_escape(spark):
    m1 = synthesize_eml("A", "a@b.test", text_body="first message")
    # a body line starting with 'From ' must survive the escape cycle
    m2 = synthesize_eml(
        "B", "a@b.test",
        text_body="line one\nFrom the body, not a separator",
    )
    box = synthesize_mbox([m1, m2])
    df = spark.createDataFrame(
        [(7, box)], "mbox_id bigint, payload binary"
    )
    msgs = {
        r.msg_index: bytes(r.payload)
        for r in mbox_split(df).collect()
    }
    assert set(msgs) == {0, 1}
    r2 = eml_extract_text(msgs[1])
    assert "From the body, not a separator" in r2["text"]
    assert r2["subject"] == "B"


def test_spark_extract_and_skip(spark):
    rows = [
        (1, synthesize_eml("S1", "a@b.test", text_body="one")),
        (2, b"\x00garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = eml_extract(df, on_error="skip").collect()
    assert len(out) == 1 and out[0].subject == "S1"


def test_cli_eml_and_mbox(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    class A:
        pass

    inp = str(tmp_path / "eml")
    spark.createDataFrame(
        [(1, synthesize_eml("S", "a@b.test", text_body="cli body"))],
        "media_id bigint, payload binary",
    ).write.parquet(inp)
    a = A()
    a.action = "eml-text"
    a.input = inp
    a.output = str(tmp_path / "out1")
    a.on_error = "fail"
    cmd_media(a)
    got = spark.read.parquet(str(tmp_path / "out1")).collect()[0]
    assert got.text == "cli body"

    box = synthesize_mbox(
        [synthesize_eml("M", "a@b.test", text_body="boxed")]
    )
    inp2 = str(tmp_path / "mbox")
    spark.createDataFrame(
        [(1, box)], "media_id bigint, payload binary"
    ).write.parquet(inp2)
    b = A()
    b.action = "mbox-split"
    b.input = inp2
    b.output = str(tmp_path / "out2")
    b.on_error = "fail"
    cmd_media(b)
    out2 = spark.read.parquet(str(tmp_path / "out2")).collect()
    assert len(out2) == 1 and out2[0].msg_index == 0


def test_eml_attachments_explode_and_decode(spark):
    """r14: attachments explode one row per MIME leaf with a
    disposition/filename, transfer encoding decoded; bodies never
    leak in."""
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.email_ingest import (
        eml_attachments,
        synthesize_eml,
    )

    dx = synthesize_docx(["att body"], title="A")
    e = synthesize_eml(
        "S", "a@b.test", text_body="hello body",
        html_body="<p>html</p>",
        attachments=[
            ("a.docx", "application/msword+x", dx),
            ("b.bin", "application/octet-stream", b"\x00\x01\x02"),
        ],
    )
    df = spark.createDataFrame(
        [(1, e)], "doc_id bigint, payload binary"
    )
    rows = sorted(
        eml_attachments(df).collect(), key=lambda r: r.part_index
    )
    assert [(r.part_index, r.filename, r.n_bytes) for r in rows] == [
        (0, "a.docx", len(dx)), (1, "b.bin", 3)
    ]
    assert bytes(rows[0].payload) == dx
    # a message without attachments contributes zero rows
    plain = synthesize_eml("S", "a@b.test", text_body="x")
    df2 = spark.createDataFrame(
        [(2, plain)], "doc_id bigint, payload binary"
    )
    assert eml_attachments(df2).count() == 0


def test_cli_eml_attachments(spark, tmp_path):
    from minerva_etl_spark.cli import main
    from minerva_etl_spark.operators.email_ingest import synthesize_eml

    src = str(tmp_path / "m")
    spark.createDataFrame(
        [(1, synthesize_eml("S", "a@b.test", text_body="x",
                            attachments=[("f.bin",
                                          "application/octet-stream",
                                          b"abc")]))],
        "media_id bigint, payload binary",
    ).write.parquet(src)
    out = str(tmp_path / "atts")
    main(["media", "eml-attachments", "--input", src, "--output", out])
    row = spark.read.parquet(out).collect()[0]
    assert row.filename == "f.bin" and row.n_bytes == 3
