"""OpenDocument codec (`operators/odf.py`): odt/ods/odp renderings,
whitespace elements, float cells, repeated columns, sniffing through
the office dispatcher, metadata, and honest rejects."""

import io
import zipfile

import pytest

from minerva_etl_spark.operators.odf import (
    odf_extract_text,
    odf_metadata,
    synthesize_odp,
    synthesize_ods,
    synthesize_odt,
)
from minerva_etl_spark.operators.office import sniff_document_format


def test_odt_paragraphs_and_whitespace_elements():
    t = synthesize_odt(
        ["alpha", "beta", "gamma"], title="T", author="A",
        created="2026-02-03 04:05:06",
    )
    r = odf_extract_text(t)
    # paragraph 3 routes a text:tab + a text:s c="2" run
    assert r["text"] == "alpha\nbeta\ngamma\ttail  end"
    assert r["title"] == "T"
    assert odf_metadata(t) == {
        "title": "T", "author": "A",
        "created": "2026-02-03 04:05:06",
    }


def test_ods_cells_and_float_values():
    s = synthesize_ods(
        [("Data", [["alpha", "42"], ["beta"]]), ("Notes", [["x"]])],
    )
    r = odf_extract_text(s)
    assert r["text"] == "Data\nalpha\t42\nbeta\nNotes\nx"
    assert r["title"] is None  # no meta.xml title


def test_ods_repeated_columns_bounded():
    """table:number-columns-repeated expands (bounded) and trailing
    padded empties trim — the render a 2^14-column padded sheet
    needs."""
    raw = synthesize_ods([("S", [["a"]])])
    zf = zipfile.ZipFile(io.BytesIO(raw))
    content = zf.read("content.xml").decode()
    content = content.replace(
        "</table:table-row>",
        '<table:table-cell table:number-columns-repeated="3" '
        'office:value-type="string"><text:p>r</text:p>'
        "</table:table-cell>"
        '<table:table-cell table:number-columns-repeated="16384"/>'
        "</table:table-row>",
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in zf.namelist():
            out.writestr(
                n, content.encode() if n == "content.xml"
                else zf.read(n)
            )
    r = odf_extract_text(buf.getvalue())
    assert r["text"] == "S\na\tr\tr\tr"


def test_odp_pages():
    p = synthesize_odp([["head", "body"], ["closing"]], title="P")
    r = odf_extract_text(p)
    assert r["text"] == "head\nbody\nclosing"
    assert r["title"] == "P"


def test_sniff_and_dispatch(spark):
    from minerva_etl_spark.operators.office import (
        office_extract,
        office_metadata,
    )

    rows = [
        (1, synthesize_odt(["doc text"], title="OT", author="OA")),
        (2, synthesize_ods([("S", [["v", "7"]])], title="OS")),
        (3, synthesize_odp([["slide"]], title="OP")),
    ]
    for _, payload in rows:
        pass
    assert sniff_document_format(rows[0][1]) == "odt"
    assert sniff_document_format(rows[1][1]) == "ods"
    assert sniff_document_format(rows[2][1]) == "odp"
    got = {
        r.doc_id: r
        for r in office_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].title, got[1].text) == (
        "odt", "OT", "doc text")
    assert (got[2].format, got[2].text) == ("ods", "S\nv\t7")
    assert (got[3].format, got[3].text) == ("odp", "slide")
    meta = {
        r.doc_id: r
        for r in office_metadata(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (meta[1].format, meta[1].title, meta[1].author) == (
        "odt", "OT", "OA")


def test_sniff_without_mimetype_member_falls_back_to_body():
    raw = synthesize_odt(["x"])
    zf = zipfile.ZipFile(io.BytesIO(raw))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in zf.namelist():
            if n != "mimetype":
                out.writestr(n, zf.read(n))
    assert sniff_document_format(buf.getvalue()) == "odt"
    assert odf_extract_text(buf.getvalue())["text"] == "x"


def test_libreoffice_encryption_is_a_locked_tag(spark):
    """A manifest declaring encryption-data (LibreOffice password
    protection — a REAL password, no default convention) must be a
    named reject / locked census row, never a garbage inflate."""
    from minerva_etl_spark.operators.odf import odf_is_encrypted
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    raw = synthesize_odt(["x"], title="T")
    zf = zipfile.ZipFile(io.BytesIO(raw))
    manifest = zf.read("META-INF/manifest.xml").decode()
    manifest = manifest.replace(
        'manifest:media-type="text/xml"/>',
        'manifest:media-type="text/xml">'
        '<manifest:encryption-data><manifest:algorithm/>'
        "</manifest:encryption-data></manifest:file-entry>",
        1,
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n in zf.namelist():
            out.writestr(
                n,
                manifest.encode() if n == "META-INF/manifest.xml"
                else zf.read(n),
            )
    enc = buf.getvalue()
    assert odf_is_encrypted(enc) and not odf_is_encrypted(raw)
    with pytest.raises(ValueError, match="password-protected"):
        odf_extract_text(enc)
    got = office_decrypt_extract(
        spark.createDataFrame(
            [(1, enc)], "doc_id bigint, payload binary"
        )
    ).collect()[0]
    assert (got.format, got.encryption, got.text) == (
        "odt", "locked", None)


def test_torn_zip_members_follow_error_policy(spark):
    """r15 review: a zip whose content.xml member bytes are torn
    (CRC/deflate corruption — routine in a dirty corpus) must sniff
    as non-ODF and skip under on_error='skip', never kill the task
    with a raw BadZipFile/zlib.error; a mimetype-only ODF zip (no
    content.xml) raises ValueError."""
    from minerva_etl_spark.operators.office import (
        office_extract,
        sniff_document_format,
    )

    raw = synthesize_odt(["x" * 200])
    # flip bytes inside the stored payload region to corrupt the
    # deflate stream of content.xml without touching the directory
    torn = bytearray(raw)
    marker = torn.find(b"content.xml")  # first local header
    for i in range(marker + 20, marker + 60):
        torn[i] ^= 0xFF
    torn = bytes(torn)
    assert sniff_document_format(torn) in ("unknown", "odt")
    with pytest.raises(ValueError):
        odf_extract_text(torn)
    out = office_extract(
        spark.createDataFrame(
            [(1, torn), (2, synthesize_odt(["ok"]))],
            "doc_id bigint, payload binary",
        ),
        on_error="skip",
    ).collect()
    assert [(r.doc_id, r.text) for r in out] == [(2, "ok")]
    # mimetype declares ODF but no content.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.text",
            compress_type=zipfile.ZIP_STORED,
        )
    with pytest.raises(ValueError, match="content.xml"):
        odf_extract_text(buf.getvalue())


def test_rejects_are_honest():
    with pytest.raises(ValueError, match="zip"):
        odf_extract_text(b"not a zip at all")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        out.writestr("random.txt", "hi")
    with pytest.raises(ValueError, match="OpenDocument"):
        odf_extract_text(buf.getvalue())
    # malformed content.xml
    raw = synthesize_odt(["x"])
    zf = zipfile.ZipFile(io.BytesIO(raw))
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as out:
        for n in zf.namelist():
            out.writestr(
                n, b"<broken" if n == "content.xml" else zf.read(n)
            )
    with pytest.raises(ValueError):
        odf_extract_text(buf2.getvalue())
