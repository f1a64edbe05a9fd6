"""Charset detection/decoding: resolution order, aliasing, BOM
stripping, replace policy, and the Spark operator."""

from minerva_etl_spark.operators.charset import (
    decode_body,
    decode_text,
    detect_charset,
)


def test_resolution_priority_bom_header_meta_default():
    meta = b'<meta charset="koi8-r">body'
    # BOM beats everything
    assert detect_charset(b"\xef\xbb\xbf" + meta,
                          "text/html; charset=utf-16")[1] == "bom"
    # header beats meta
    assert detect_charset(meta, "text/html; charset=Shift_JIS") == (
        "shift_jis", "header")
    # meta when no header charset
    assert detect_charset(meta, "text/html") == ("koi8-r", "meta")
    assert detect_charset(meta, None) == ("koi8-r", "meta")
    # nothing -> utf-8
    assert detect_charset(b"plain", "text/html") == ("utf-8", "default")


def test_whatwg_aliasing_and_bad_labels():
    # the web's latin-1 is windows-1252
    assert detect_charset(b"x", "a; charset=ISO-8859-1")[0] == "windows-1252"
    assert detect_charset(b'<meta charset="latin1">')[0] == "windows-1252"
    # an unknown header label falls through to the meta scan
    assert detect_charset(b'<meta charset="utf-8">x',
                          "a; charset=bogus-enc") == ("utf-8", "meta")


def test_meta_http_equiv_form():
    body = (b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=windows-1251">')
    assert detect_charset(body) == ("windows-1251", "meta")


def test_meta_scan_limited_to_first_1024_bytes():
    body = b"x" * 1024 + b'<meta charset="koi8-r">'
    assert detect_charset(body) == ("utf-8", "default")


def test_decode_strips_boms_and_replaces():
    text, cs, src = decode_body(b"\xff\xfe" + "hé".encode("utf-16-le"))
    assert (text, cs, src) == ("hé", "utf-16-le", "bom")
    text, cs, src = decode_body(b"\xfe\xff" + "hi".encode("utf-16-be"))
    assert (text, cs, src) == ("hi", "utf-16-be", "bom")
    text, cs, src = decode_body(b"\xef\xbb\xbfok")
    assert (text, cs, src) == ("ok", "utf-8-sig", "bom")
    # mislabeled bytes survive as U+FFFD, never an exception
    text, _, _ = decode_body(b"\xff\xfe\xff ok")  # truncated utf-16
    assert "�" in text or text  # no raise is the contract
    text, _, _ = decode_body(b"caf\xe9", "a; charset=utf-8")
    assert text == "caf�"


def test_decode_text_spark(spark):
    df = spark.createDataFrame(
        [
            (1, b"\xef\xbb\xbfalpha", "text/html"),
            (2, b"caf\xe9", "text/html; charset=iso-8859-1"),
            (3, b'<meta charset="utf-8">beta', None),
        ],
        "doc_id bigint, body binary, content_type string",
    )
    rows = {r.doc_id: r for r in decode_text(df).collect()}
    assert rows[1].text == "alpha" and rows[1].charset_source == "bom"
    assert rows[2].text == "café"
    assert rows[2].charset == "windows-1252"
    assert rows[3].charset_source == "meta"
