"""Mixed-format dispatch (`operators/office.py`): magic-byte sniff
accuracy, unified extraction across all three codecs, skip mode, and
the CLI verb."""

import pytest

from minerva_etl_spark.operators.docx import synthesize_docx
from minerva_etl_spark.operators.epub import synthesize_epub
from minerva_etl_spark.operators.office import (
    office_extract,
    sniff_document_format,
)
from minerva_etl_spark.operators.pdf import synthesize_pdf


def test_sniff_routes_correctly():
    assert sniff_document_format(synthesize_pdf(["p"])) == "pdf"
    assert sniff_document_format(synthesize_docx(["p"])) == "docx"
    assert sniff_document_format(synthesize_epub(["<p>p</p>"])) == "epub"
    assert sniff_document_format(b"random bytes") == "unknown"
    # a ZIP that's neither DOCX nor EPUB
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.txt", "hi")
    assert sniff_document_format(buf.getvalue()) == "unknown"


def test_epub_sniff_via_mimetype_without_container():
    """An EPUB-ish zip whose container.xml is missing but whose OCF
    mimetype entry is present still sniffs as epub (and then fails
    extraction honestly)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("x.xhtml", "<p>x</p>")
    assert sniff_document_format(buf.getvalue()) == "epub"


def test_mixed_column_unified_output(spark):
    rows = [
        (0, synthesize_pdf(["Doc 0 report", "pdf body"], title="Doc 0")),
        (1, synthesize_docx(["Doc 1 report", "docx body"], title="Doc 1")),
        (
            2,
            synthesize_epub(
                ["<p>Doc 2 report</p>", "<p>epub body</p>"], title="Doc 2"
            ),
        ),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r.doc_id: r for r in office_extract(df).collect()}
    assert out[0].format == "pdf"
    assert out[0].text == "Doc 0 report\n\npdf body"
    assert out[1].format == "docx"
    assert out[1].text == "Doc 1 report\ndocx body"
    assert out[2].format == "epub"
    assert out[2].text == "Doc 2 report\nepub body"
    assert all(out[i].title == f"Doc {i}" for i in range(3))
    assert all(out[i].n_chars == len(out[i].text) for i in range(3))


def test_skip_mode_drops_unknown(spark):
    rows = [
        (1, synthesize_docx(["keep me"])),
        (2, b"garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = office_extract(df, on_error="skip").collect()
    assert [r.doc_id for r in out] == [1]
    with pytest.raises(Exception):
        office_extract(df, on_error="fail").collect()


def test_cli_office_text(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_media

    inp = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (1, synthesize_pdf(["pdf here"])),
            (2, synthesize_epub(["<p>epub here</p>"])),
        ],
        "media_id bigint, payload binary",
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "office-text"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.on_error = "fail"
    cmd_media(a)
    out = {
        r.media_id: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out[1].format == "pdf" and out[1].text == "pdf here"
    assert out[2].format == "epub" and out[2].text == "epub here"


def test_format_census_counts_without_parsing(spark):
    """r13: the sniff-only census counts formats + bytes in one scan;
    unknown and ole2 payloads are counted, never parse-failed."""
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.msdoc import _build_cfb
    from minerva_etl_spark.operators.office import format_census

    rows = [
        (1, synthesize_docx(["a"])),
        (2, synthesize_docx(["b"])),
        (3, b"%PDF-1.4 minimal-but-sniffable"),
        (4, b"garbage bytes"),
        (5, _build_cfb([("Contents", b"x".ljust(4096, b"\x00"))])),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.format: (r.n_docs, r.total_bytes)
           for r in format_census(df).collect()}
    assert got["docx"][0] == 2
    assert got["pdf"][0] == 1
    assert got["unknown"] == (1, 13)
    assert got["ole2"][0] == 1
    assert got["docx"][1] == sum(len(p) for _, p in rows[:2])


def test_msg_with_embedded_word_attachment_sniffs_as_msg():
    """r14 ADVICE (low): sniffing walks TOP-LEVEL directory entries
    only — a nested attachment storage contributing a WordDocument
    stream must not reroute the container to the doc codec."""
    from minerva_etl_spark.operators.msg import (
        msg_extract_text,
        synthesize_msg,
    )
    from minerva_etl_spark.operators.office import (
        sniff_document_format,
    )

    b = synthesize_msg(
        "Real subject", "real body", nested_decoy="WordDocument"
    )
    assert sniff_document_format(b) == "msg"
    assert msg_extract_text(b)["subject"] == "Real subject"


def test_encrypted_ooxml_tagged_distinctly(spark):
    """A password-protected OOXML file is a CFB wrapper holding
    EncryptionInfo + EncryptedPackage (MS-OFFCRYPTO): tagged
    'ooxml_encrypted' (distinct from generic ole2), skipped under
    on_error='skip', counted by format_census."""
    from minerva_etl_spark.operators.msdoc import _build_cfb
    from minerva_etl_spark.operators.office import (
        format_census,
        office_extract,
        sniff_document_format,
    )

    enc = _build_cfb(
        [
            ("EncryptionInfo", b"\x04\x00\x04\x00" + b"\x00" * 60),
            ("EncryptedPackage", b"\x10" * 256),
        ]
    )
    assert sniff_document_format(enc) == "ooxml_encrypted"
    from minerva_etl_spark.operators.docx import synthesize_docx

    df = spark.createDataFrame(
        [(1, synthesize_docx(["kept"])), (2, enc)],
        "doc_id bigint, payload binary",
    )
    out = office_extract(df, on_error="skip").collect()
    assert [r.doc_id for r in out] == [1]
    with pytest.raises(Exception, match="password-protected"):
        office_extract(df, on_error="fail").collect()
    census = {
        r.format: r.n_docs for r in format_census(df).collect()
    }
    assert census.get("ooxml_encrypted") == 1


def test_office_metadata_three_containers(spark):
    """r14: the provenance census reads all three metadata
    containers — PDF /Info, OOXML core.xml, MS-OLEPS — and reports
    NULLs (never errors) for payloads without metadata."""
    from minerva_etl_spark.operators.msdoc import (
        _build_cfb,
        synthesize_doc,
    )
    from minerva_etl_spark.operators.office import office_metadata
    from minerva_etl_spark.operators.pdf import synthesize_pdf

    rows = [
        (1, synthesize_pdf(["x"], title="P", author="PA",
                           created="2026-02-03 04:05:06")),
        (2, synthesize_docx(["x"], title="D", author="DA",
                            created="2026-02-03 04:05:07")),
        (3, synthesize_doc(["x"], title="W", author="WA",
                           created="2026-02-03 04:05:08")),
        (4, synthesize_docx(["x"])),  # OOXML without metadata
        (5, _build_cfb([("Contents", b"x".ljust(4096, b"\x00"))])),
    ]
    got = {
        r.doc_id: r
        for r in office_metadata(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].title, got[1].author, got[1].created) == (
        "P", "PA", "2026-02-03 04:05:06")
    assert (got[2].author, got[2].created) == (
        "DA", "2026-02-03 04:05:07")
    assert (got[3].author, got[3].created) == (
        "WA", "2026-02-03 04:05:08")
    assert got[4].title is None and got[4].created is None
    # a generic compound file census-tags with NULL metadata
    assert got[5].format == "ole2" and got[5].title is None


def test_cli_office_meta(spark, tmp_path):
    from minerva_etl_spark.cli import main

    src = str(tmp_path / "m")
    spark.createDataFrame(
        [(1, synthesize_docx(["x"], title="T", author="A",
                             created="2026-02-03 04:05:06"))],
        "media_id bigint, payload binary",
    ).write.parquet(src)
    out = str(tmp_path / "meta")
    main(["media", "office-meta", "--input", src, "--output", out])
    row = spark.read.parquet(out).collect()[0]
    assert row.author == "A" and row.created == "2026-02-03 04:05:06"


def test_office_metadata_decrypts_default_password(spark):
    """r15: the provenance census reads core.xml THROUGH
    default-password encryption; RC4 .xls provenance needs no
    decryption (OLEPS is never encrypted in the Office-97 scheme);
    genuinely locked files keep the tag with NULL metadata."""
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_ooxml,
        encrypt_xls_rc4,
    )
    from minerva_etl_spark.operators.office import office_metadata
    from minerva_etl_spark.operators.xls import synthesize_xls

    rows = [
        (1, encrypt_ooxml(
            synthesize_docx(["x"], title="ET", author="EA",
                            created="2026-02-03 04:05:06"))),
        (2, encrypt_xls_rc4(
            synthesize_xls([("S", [["x"]])], title="XT", author="XA",
                           created="2026-02-03 04:05:07"))),
        (3, encrypt_ooxml(synthesize_docx(["x"], title="NO"),
                          password="real-pw")),
    ]
    got = {
        r.doc_id: r
        for r in office_metadata(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].title, got[1].author) == (
        "docx", "ET", "EA")
    assert (got[2].format, got[2].title, got[2].created) == (
        "xls", "XT", "2026-02-03 04:05:07")
    assert (got[3].format, got[3].title) == ("ooxml_encrypted", None)


def test_oleps_author_without_title(spark):
    """r15 (ADVICE): every CFB writer emits the SummaryInformation
    stream when ANY of title/author/created is set — author/created
    without a title must not be silently dropped (title may be
    omitted from a legal MS-OLEPS property list)."""
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.office import office_metadata
    from minerva_etl_spark.operators.ppt import synthesize_ppt
    from minerva_etl_spark.operators.xls import synthesize_xls

    rows = [
        (1, synthesize_doc(["x"], author="DA",
                           created="2026-02-03 04:05:06")),
        (2, synthesize_xls([("S", [["x"]])], author="XA",
                           created="2026-02-03 04:05:07")),
        (3, synthesize_ppt([["x"]], author="PA",
                           created="2026-02-03 04:05:08")),
    ]
    got = {
        r.doc_id: r
        for r in office_metadata(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].title, got[1].author, got[1].created) == (
        None, "DA", "2026-02-03 04:05:06")
    assert (got[2].title, got[2].author, got[2].created) == (
        None, "XA", "2026-02-03 04:05:07")
    assert (got[3].title, got[3].author, got[3].created) == (
        None, "PA", "2026-02-03 04:05:08")


def test_office_metadata_rtf_and_msg(spark):
    """r14: the provenance census covers RTF (\\info group) and .msg
    (subject/sender) too."""
    from minerva_etl_spark.operators.msg import synthesize_msg
    from minerva_etl_spark.operators.office import office_metadata
    from minerva_etl_spark.operators.rtf import synthesize_rtf

    rows = [
        (1, synthesize_rtf(["x"], title="RT", author="RA",
                           created="2026-02-03 04:05:06")),
        (2, synthesize_msg("Subj", "body", sender="s@x.test")),
    ]
    got = {
        r.doc_id: r
        for r in office_metadata(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].title, got[1].author, got[1].created) == (
        "RT", "RA", "2026-02-03 04:05:06")
    assert (got[2].format, got[2].title, got[2].author) == (
        "msg", "Subj", "s@x.test")
