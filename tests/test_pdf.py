"""PDF text extraction: synthesize/extract round trip, content-stream
operator semantics, binary-safety of the object scan, honest-reject
boundaries, the Spark operator, and the CLI verb."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from minerva_etl_spark.operators.pdf import (
    _content_text,
    pdf_extract,
    pdf_extract_text,
    synthesize_pdf,
)


def test_round_trip_compressed_multipage():
    p = synthesize_pdf(
        ["Hello (world) \\ test\nline two", "page 2 text"],
        title="My Doc (v1)",
    )
    assert p.startswith(b"%PDF-1.4")
    d = pdf_extract_text(p)
    assert d["n_pages"] == 2
    assert d["title"] == "My Doc (v1)"
    assert d["text"] == "Hello (world) \\ test\nline two\n\npage 2 text"
    assert d["n_chars"] == len(d["text"])


def test_round_trip_uncompressed_and_no_title():
    d = pdf_extract_text(synthesize_pdf(["plain"], compress=False))
    assert (d["text"], d["n_pages"], d["title"]) == ("plain", 1, None)


def test_xref_offsets_are_byte_accurate():
    """The synthesizer writes a REAL xref table: every offset points
    at its object header and startxref points at 'xref'."""
    p = synthesize_pdf(["x", "y"], title="t")
    xref_at = int(re.search(rb"startxref\n(\d+)", p).group(1))
    assert p[xref_at : xref_at + 4] == b"xref"
    for i, off in enumerate(re.findall(rb"(\d{10}) 00000 n", p), start=1):
        head = f"{i} 0 obj".encode()
        assert p[int(off) : int(off) + len(head)] == head


def test_content_stream_operators():
    """TJ arrays drop kerning numbers; ' moves to the next line before
    showing; hex strings decode; Td/T* between showings emit
    newlines."""
    s = b"BT /F1 11 Tf 72 720 Td [(ab) -120 (cd)] TJ 0 -14 Td (ee) Tj (next)' ET"
    assert _content_text(s) == "abcd\nee\nnext"
    assert _content_text(b"BT <48656C6C6F> Tj ET") == "Hello"
    assert _content_text(b"BT (a) Tj T* (b) Tj ET") == "a\nb"


def test_literal_string_escapes():
    s = rb"BT (oct \101\102 nl \n paren \( back \\ cont\
inued) Tj ET"
    assert _content_text(s) == "oct AB nl \n paren ( back \\ continued"


def test_object_scan_is_binary_safe():
    """Stream bytes spelling 'N 0 obj' / 'endobj' must neither
    register phantom objects nor truncate parsing — the scanner skips
    stream bodies via /Length."""
    text = "before 99 0 obj endobj endstream after"
    d = pdf_extract_text(synthesize_pdf([text], compress=False))
    assert d["text"] == text
    # and with compression, arbitrary zlib bytes round-trip too
    import random

    rng = random.Random(7)
    for _ in range(50):
        t = "".join(
            rng.choice(" abcdefgh(\\)ijklmnop") for _ in range(800)
        )
        assert pdf_extract_text(synthesize_pdf([t]))["text"] == t


def test_page_tree_order_not_object_order():
    """/Kids order wins: build a PDF, then swap the Kids array so page
    2 comes first — extraction must follow the tree."""
    p = synthesize_pdf(["first", "second"])
    swapped = p.replace(b"/Kids [5 0 R 7 0 R]", b"/Kids [7 0 R 5 0 R]")
    assert swapped != p
    assert pdf_extract_text(swapped)["text"] == "second\n\nfirst"


def test_honest_rejects():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_extract_text(b"GIF89a not a pdf")
    # an /Encrypt ref whose dict is unresolvable / not /Standard
    enc = synthesize_pdf(["x"]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(NotImplementedError, match="security handler"):
        pdf_extract_text(enc)
    dct = synthesize_pdf(["x"], compress=False).replace(
        b"<< /Length", b"<< /Filter /DCTDecode /Length"
    )
    with pytest.raises(NotImplementedError, match="FlateDecode"):
        pdf_extract_text(dct)


def _predictor_encode(data: bytes, columns: int, ft: int = 2) -> bytes:
    """PNG-predictor-12-style row encoding (filter byte + filtered
    row), the test-side twin of `_png_unpredict`."""
    out = bytearray()
    prev = bytes(columns)
    rows = [data[i : i + columns] for i in range(0, len(data), columns)]
    for row in rows:
        out.append(ft)
        for x, v in enumerate(row):
            left = row[x - 1] if x >= 1 else 0
            up = prev[x] if x < len(prev) else 0
            if ft == 1:
                out.append((v - left) & 0xFF)
            elif ft == 2:
                out.append((v - up) & 0xFF)
            else:
                raise ValueError(ft)
        prev = row
    return bytes(out)


def test_png_predictor_streams_decode():
    """A Flate + /DecodeParms /Predictor 12 content stream (the
    layout real producers apply to ObjStm/XRef streams) must inflate
    AND un-predict to the same text as the plain file."""
    import re as _re
    import zlib as _zlib

    plain = synthesize_pdf(["predicted text", "page (two)"],
                           compress=False)
    want = pdf_extract_text(plain)
    # re-encode every content stream with predictor-12 rows
    out = plain
    for m in list(_re.finditer(
        rb"<< /Length (\d+) >>\nstream\n", out
    ))[::-1]:
        ln = int(m.group(1))
        start = m.end()
        raw = out[start : start + ln]
        cols = 7
        enc = _zlib.compress(_predictor_encode(raw, cols), 9)
        head = (
            b"<< /Length %d /Filter /FlateDecode /DecodeParms "
            b"<< /Predictor 12 /Columns %d >> >>\nstream\n"
            % (len(enc), cols)
        )
        out = out[: m.start()] + head + enc + out[start + ln :]
    got = pdf_extract_text(out)
    assert got["text"] == want["text"]
    assert got["n_pages"] == want["n_pages"]


def test_tiff_predictor_is_honest_reject():
    plain = synthesize_pdf(["x"], compress=True)
    bad = plain.replace(
        b"/Filter /FlateDecode >>",
        b"/Filter /FlateDecode /DecodeParms << /Predictor 2 >> >>",
    )
    with pytest.raises(NotImplementedError, match="TIFF predictor"):
        pdf_extract_text(bad)


def test_tj_kerning_gaps_become_spaces():
    """Kerning-packed TJ arrays (words separated only by negative
    adjustments — a very common producer layout) must extract with
    word boundaries; small kerning must NOT split."""
    from minerva_etl_spark.operators.pdf import _content_text

    packed = (
        b"BT /F1 11 Tf 72 720 Td "
        b"[(Hel)5(lo)-250(kerned)-300(world)] TJ ET"
    )
    assert _content_text(packed) == "Hello kerned world"
    assert _content_text(b"BT [(inte)-50(rnal)] TJ ET") == "internal"
    # numbers OUTSIDE arrays (Td coords, font sizes) never inject
    assert (
        _content_text(b"BT /F1 11 Tf 72 -720 Td (plain) Tj ET")
        == "plain"
    )


def test_generation_numbers_feed_the_object_keys():
    """A revised object appended with gen 1 (incremental update) is
    encrypted under the gen-1 per-object key — the scan tracks gens
    so it decrypts; assuming gen 0 would yield RC4 garbage."""
    import re as _re

    from minerva_etl_spark.operators.pdf import (
        _dict_of,
        _obj_key,
        _rc4,
        _scan,
        _std_file_key,
        _string_value,
    )

    base = synthesize_pdf(["old text"], encrypt=True, encrypt_r=3)
    objs, masked, _g = _scan(base)
    enc_num = int(_re.search(rb"/Encrypt (\d+)", base).group(1))
    d = _dict_of(objs[enc_num])
    o = _string_value(d, b"/O")
    p = int(_re.search(rb"/P (-?\d+)", d).group(1))
    id0 = bytes.fromhex(
        _re.search(rb"/ID \[<([0-9a-f]+)>", base).group(1).decode()
    )
    key = _std_file_key(o, p, id0, 3, 16)
    new_stream = b"BT /F1 11 Tf 72 720 Td (revised text) Tj ET"
    enc = _rc4(_obj_key(key, 6, 1), new_stream)
    upd = base + (
        b"6 1 obj\n<< /Length %d >>\nstream\n" % len(enc)
    ) + enc + b"\nendstream\nendobj\n"
    assert pdf_extract_text(upd)["text"] == "revised text"


# ------------------------------------------------- RC4 encryption


def test_rc4_round_trip_both_revisions():
    """R2 (40-bit) and R3 (128-bit) standard-security files with an
    empty user password extract identically to the plain file, and
    neither body text nor title appears in the encrypted bytes."""
    pages = ["alpha page", "beta (two) \\ three"]
    plain = pdf_extract_text(synthesize_pdf(pages, title="Secret T"))
    for r in (2, 3):
        p = synthesize_pdf(
            pages, title="Secret T", encrypt=True, encrypt_r=r
        )
        assert b"alpha page" not in p and b"Secret T" not in p
        assert pdf_extract_text(p) == plain


def test_rc4_rejects_aes_and_real_passwords():
    import re as _re

    from minerva_etl_spark.operators.pdf import (
        _std_file_key,
        _std_o_entry,
        _std_u_entry,
    )

    base = synthesize_pdf(["x"], encrypt=True, encrypt_r=3)
    aes = base.replace(b"/V 2 /R 3", b"/V 4 /R 4")
    with pytest.raises(NotImplementedError, match="AES"):
        pdf_extract_text(aes)
    # swap in a /U derived from a REAL user password: the empty-
    # password check must fail closed
    o = _std_o_entry(b"owner", b"realpw", 3, 16)
    im = _re.search(rb"/ID \[<([0-9a-f]+)>", base)
    id0 = bytes.fromhex(im.group(1).decode())
    key = _std_file_key(o, -4, id0, 3, 16, user_pw=b"realpw")
    u = _std_u_entry(key, id0, 3)
    locked = _re.sub(
        rb"/U <[0-9a-f]+>", b"/U <" + u.hex().encode() + b">", base
    )
    with pytest.raises(NotImplementedError, match="user password"):
        pdf_extract_text(locked)


def test_aes_round_trip_v4_and_v5():
    """AESV2 (/V 4 /R 4, AES-128-CBC + sAlT object keys) and AESV3
    (/V 5 /R 6, AES-256 under the 2.B KDF) both extract identically
    to the plain file with the empty user password."""
    pages = ["AES alpha", "beta (two) \\ three\nfour"]
    plain = pdf_extract_text(synthesize_pdf(pages, title="TA"))
    for r in (4, 6):
        for comp in (True, False):
            p = synthesize_pdf(
                pages, title="TA", compress=comp,
                encrypt=True, encrypt_r=r,
            )
            assert b"AES alpha" not in p
            assert pdf_extract_text(p) == plain


def test_aes_fips_known_answers():
    """The AES core matches FIPS-197 Appendix C for 128/192/256-bit
    keys, and CBC round-trips with PKCS#7."""
    from minerva_etl_spark.operators.aes import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
        aes_ecb_encrypt_block,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vectors = {
        "000102030405060708090a0b0c0d0e0f":
            "69c4e0d86a7b0430d8cdb78070b4c55a",
        "000102030405060708090a0b0c0d0e0f1011121314151617":
            "dda97ca4864cdfe06eaf70a0ec0d7191",
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f":
            "8ea2b7ca516745bfeafc49904b496089",
    }
    for k_hex, ct_hex in vectors.items():
        assert (
            aes_ecb_encrypt_block(bytes.fromhex(k_hex), pt).hex()
            == ct_hex
        )
    key, iv = bytes(32), bytes(range(16))
    msg = b"odd-length message exercising PKCS#7!"
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, msg)) == msg


def test_aes_openssl_and_pure_python_agree():
    """When the OpenSSL fast path is present, it must produce the
    SAME bytes as the pure-Python fallback on every key size — a
    swap can never change output."""
    import hashlib

    import minerva_etl_spark.operators.aes as A

    if not A._HAVE_OPENSSL:
        pytest.skip("cryptography not installed — fallback only")
    for klen in (16, 24, 32):
        for seed in range(8):
            k = hashlib.sha256(b"k%d" % seed).digest()[:klen]
            b = hashlib.sha256(b"b%d" % seed).digest()[:16]
            assert A.aes_ecb_encrypt_block(k, b) == A._py_encrypt_block(k, b)
            assert A.aes_ecb_decrypt_block(k, b) == A._py_decrypt_block(k, b)


def test_v4_rc4_crypt_filter_spelling():
    """/V 4 with /CFM /V2 is RC4 in a V4 wrapper (a layout Acrobat 6
    emits); the R4 key ladder matches R3's, so rewrapping an R3 file
    must still decrypt."""
    pages = ["wrapped rc4"]
    p3 = synthesize_pdf(pages, encrypt=True, encrypt_r=3)
    p4 = p3.replace(
        b"/V 2 /R 3 /Length 128",
        b"/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /V2 "
        b"/Length 16 >> >> /StmF /StdCF /StrF /StdCF",
    )
    assert pdf_extract_text(p4)["text"] == "wrapped rc4"


def test_aes256_real_password_rejects():
    import re as _re

    base = synthesize_pdf(["x"], encrypt=True, encrypt_r=6)
    # corrupt the /U validation hash -> empty-password check fails
    um = _re.search(rb"/U <([0-9a-f]{96})>", base)
    bad_u = b"ff" * 32 + um.group(1)[64:]  # clobber the 32-byte hash
    locked = base.replace(um.group(1), bad_u)
    with pytest.raises(NotImplementedError, match="user password"):
        pdf_extract_text(locked)


def test_rc4_spark_mixed_with_plain(spark):
    rows = [
        (1, synthesize_pdf(["one"], title="A")),
        (2, synthesize_pdf(["two"], encrypt=True, encrypt_r=2)),
        (3, synthesize_pdf(["three"], encrypt=True, encrypt_r=3)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r.text for r in pdf_extract(df).collect()}
    assert got == {1: "one", 2: "two", 3: "three"}


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_hypothesis_round_trip(pages):
    d = pdf_extract_text(synthesize_pdf(pages, title="T"))
    assert d["text"] == "\n\n".join(pages)
    assert d["n_pages"] == len(pages)


def test_spark_pdf_extract_and_skip_policy(spark):
    rows = [
        (1, synthesize_pdf(["alpha one", "alpha two"], title="A")),
        (2, b"not a pdf at all"),
        (3, synthesize_pdf(["gamma"], compress=False)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r.doc_id: r
        for r in pdf_extract(df, on_error="skip").collect()
    }
    assert set(got) == {1, 3}
    assert got[1].text == "alpha one\n\nalpha two"
    assert got[1].n_pages == 2 and got[1].title == "A"
    assert got[3].text == "gamma" and got[3].title is None
    with pytest.raises(Exception, match="not a PDF"):
        pdf_extract(df, on_error="fail").collect()


def test_cli_media_pdf_text(tmp_path, spark):
    from minerva_etl_spark.cli import main

    media = spark.createDataFrame(
        [
            (1, synthesize_pdf(["cli page"], title="C")),
            (2, b"junk"),
        ],
        "media_id bigint, payload binary",
    )
    src = str(tmp_path / "media")
    media.write.parquet(src)
    out = str(tmp_path / "txt")
    main(["media", "pdf-text", "--input", src, "--output", out,
          "--on-error", "skip"])
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].text == "cli page"


def test_id_column_keeps_its_name(spark):
    df = spark.createDataFrame(
        [(7, synthesize_pdf(["x"]))], "media_id bigint, payload binary"
    )
    out = pdf_extract(df, id_col="media_id")
    assert out.columns[0] == "media_id"
    assert out.collect()[0].media_id == 7


def test_multilevel_page_tree_is_depth_first():
    """Root /Kids [A, p3] with A = /Pages [p1, p2] must extract
    p1 p2 p3 (DFS), not p3 p1 p2 (BFS)."""
    p = synthesize_pdf(["one", "two", "three"], compress=False)
    # pages are objects 5, 7, 9; rewire: new Pages node A reuses the
    # font object slot convention — append A as object 10 and point
    # the root tree at [A, 9] with A = [5, 7]
    a = b"12 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [5 0 R 7 0 R] /Count 2 >>\nendobj\n"
    rewired = p.replace(
        b"/Kids [5 0 R 7 0 R 9 0 R]", b"/Kids [12 0 R 9 0 R]"
    )
    assert rewired != p
    # append the new object before the xref (object scan tolerates it)
    at = rewired.find(b"xref")
    rewired = rewired[:at] + a + rewired[at:]
    assert pdf_extract_text(rewired)["text"] == "one\n\ntwo\n\nthree"


def test_corrupt_flate_is_skippable_valueerror(spark):
    p = bytearray(synthesize_pdf(["will corrupt"]))
    at = p.find(b"stream\n") + 10
    p[at] ^= 0xFF  # flip a byte inside the deflate data
    with pytest.raises(ValueError, match="corrupt FlateDecode"):
        pdf_extract_text(bytes(p))
    df = spark.createDataFrame(
        [(1, bytes(p)), (2, synthesize_pdf(["fine"]))],
        "doc_id bigint, payload binary",
    )
    rows = pdf_extract(df, on_error="skip").collect()
    assert [r.doc_id for r in rows] == [2]


def test_title_comes_from_info_not_first_title_object():
    """An outline-ish object carrying /Title earlier in the file must
    not beat the trailer-resolved /Info dict."""
    p = synthesize_pdf(["body"], title="Real Title", compress=False)
    outline = b"10 0 obj\n<< /Title (Chapter 1) /Type /Outlines >>\nendobj\n"
    at = p.find(b"1 0 obj")
    spoofed = p[:at] + outline + p[at:]
    assert pdf_extract_text(spoofed)["title"] == "Real Title"


def test_pageless_and_malformed_objstm_are_honest_rejects():
    p = synthesize_pdf(["x"], compress=False)
    no_pages = p.replace(b"/Type /Page ", b"/Type /Other ")
    with pytest.raises(ValueError, match="no page objects"):
        pdf_extract_text(no_pages)
    # an ObjStm without direct /N and /First violates spec 7.5.7 —
    # honest ValueError, never a silent skip
    bad = no_pages.replace(b"%PDF-1.4", b"%PDF-1.5") + (
        b"\n11 0 obj\n<< /Type /ObjStm /Length 2 >>\nstream\nxx\n"
        b"endstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="/N or /First"):
        pdf_extract_text(bad)


# ------------------------------------------------- PDF 1.5 / ObjStm


def test_objstm_round_trip_multipage():
    """PDF 1.5 (ObjStm + XRef stream) extracts identically to the
    same document in PDF 1.4 — container packaging must be invisible
    to every output column."""
    pages = [f"page {i} line one\nline (two) of {i}" for i in range(5)]
    a = pdf_extract_text(synthesize_pdf(pages, title="T"))
    b = pdf_extract_text(synthesize_pdf(pages, title="T", objstm=True))
    assert a == b
    assert b["n_pages"] == 5 and b["title"] == "T"


def test_objstm_file_structure_is_real_pdf15():
    """The synthesized 1.5 file has the real structure: ObjStm packs
    the non-stream objects, a cross-reference STREAM (not a plain
    xref table) indexes the file, and its type-1/type-2 entries
    resolve byte-accurately — the viewer-grade check."""
    import re as _re
    import zlib as _zlib

    p = synthesize_pdf(["alpha", "beta"], title="T", objstm=True)
    assert p.startswith(b"%PDF-1.5")
    assert b"\ntrailer\n" not in p and b"\nxref\n" not in p
    # startxref points at the XRef stream object
    sx = int(_re.search(rb"startxref\n(\d+)\n%%EOF", p).group(1))
    m = _re.match(rb"(\d+) 0 obj\n", p[sx:])
    assert m, "startxref must land on the XRef stream object"
    head_at = sx + m.end()
    head = p[head_at : p.index(b"stream", head_at)]
    assert b"/Type /XRef" in head and b"/W [1 4 2]" in head
    data_at = p.index(b"stream\n", head_at) + len(b"stream\n")
    n = int(_re.search(rb"/Length (\d+)", head).group(1))
    rows = _zlib.decompress(p[data_at : data_at + n])
    assert len(rows) % 7 == 0
    entries = [
        (rows[i], int.from_bytes(rows[i + 1 : i + 5], "big"),
         int.from_bytes(rows[i + 5 : i + 7], "big"))
        for i in range(0, len(rows), 7)
    ]
    assert entries[0][0] == 0  # free-list head
    stm_entries = [e for e in entries if e[0] == 2]
    assert stm_entries, "compressed objects must exist"
    for t, off, _ in entries[1:]:
        if t == 1:  # top-level: offset lands exactly on 'N 0 obj'
            assert _re.match(rb"\d+ 0 obj", p[off:])
    # every type-2 entry names the same (single) ObjStm, and the
    # entries are object-number-indexed (/Index [0 Size])
    stm_num = {e[1] for e in stm_entries}
    assert len(stm_num) == 1
    sn = next(iter(stm_num))
    t, stm_off, _ = entries[sn]
    assert t == 1 and p[stm_off:].startswith(b"%d 0 obj" % sn)
    assert b"/Type /ObjStm" in p[stm_off : stm_off + 200]


def test_objstm_top_level_definition_supersedes_embedded():
    """Incremental-update semantics: a top-level object appended
    after the ObjStm wins over the embedded definition of the same
    number (the reader's documented precedence)."""
    base = synthesize_pdf(["old text"], objstm=True)
    # object 5 is the (embedded) page dict; append a replacement that
    # points at content stream 6 — same layout, new top-level copy
    upd = base + (
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
        b"<< /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] "
        b"/Contents 6 0 R >>\nendobj\n"
    )
    assert pdf_extract_text(upd)["text"] == "old text"


def test_objstm_spark_mixed_container_column(spark):
    """One binary column mixing 1.4-plain / 1.4-Flate / 1.5-ObjStm —
    the real shape of a crawled PDF corpus."""
    rows = [
        (1, synthesize_pdf(["alpha one"], title="A")),
        (2, synthesize_pdf(["beta two"], compress=False)),
        (3, synthesize_pdf(["gamma three"], title="C", objstm=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in pdf_extract(df).collect()}
    assert got[1].text == "alpha one" and got[1].title == "A"
    assert got[2].text == "beta two"
    assert got[3].text == "gamma three" and got[3].title == "C"


def test_string_id_column_type_preserved(spark):
    df = spark.createDataFrame(
        [("doc_a.pdf", synthesize_pdf(["x"]))],
        "member string, payload binary",
    )
    out = pdf_extract(df, id_col="member")
    assert dict(out.dtypes)["member"] == "string"
    assert out.collect()[0].member == "doc_a.pdf"


def test_info_and_encrypt_greps_are_stream_masked():
    """Compressed bytes spelling '/Encrypt' or '/Info N 0 R' must
    not reject a valid PDF or redirect its title lookup."""
    # craft text whose DEFLATE output is irrelevant — instead plant
    # the markers in an UNCOMPRESSED stream body, the same masked
    # region class
    p = synthesize_pdf(["/Encrypt 9 0 R and /Info 4 0 R planted"],
                       title="Real", compress=False)
    d = pdf_extract_text(p)
    assert d["title"] == "Real"
    assert "/Encrypt" in d["text"]  # parsed as content, not directive


# ------------------------------------------------ Type0 / ToUnicode


def test_type0_round_trip_all_containers():
    """CID/Type0 composite fonts (Identity-H + ToUnicode CMap) must
    extract across every container: plain 1.4, uncompressed, ObjStm
    1.5, and all four encryption revisions."""
    pages = [
        "Hello CID world\nabcdef ghij",
        "Второй лист 中文测试\nmixed ASCII + кирилица",
    ]
    want = "\n\n".join(pages)
    for kw in (
        {},
        {"compress": False},
        {"objstm": True},
        {"encrypt": True, "encrypt_r": 2},
        {"encrypt": True, "encrypt_r": 3},
        {"encrypt": True, "encrypt_r": 4},
        {"encrypt": True, "encrypt_r": 6},
    ):
        out = pdf_extract_text(
            synthesize_pdf(pages, title="T0", type0=True, **kw)
        )
        assert out["text"] == want, kw
        assert out["title"] == "T0"


def test_type0_codes_are_not_unicode_ordinals():
    """The synthesized code assignment is an index permutation, so a
    reader that skips the CMap and treats codes as chars CANNOT pass
    — prove it by checking the raw content bytes differ from any
    UTF-16 spelling of the text."""
    pdf = synthesize_pdf(["zyx"], type0=True, compress=False)
    # codes for sorted chars x,y,z = 1,2,3 → "zyx" shows <000300020001>
    assert b"<000300020001> Tj" in pdf
    assert pdf_extract_text(pdf)["text"] == "zyx"


def test_tounicode_bfrange_array_form_and_width():
    """The <lo> <hi> [<d1> <d2> ...] destination form and a 1-byte
    codespace must both parse."""
    from minerva_etl_spark.operators.pdf import _parse_tounicode

    cm = (
        b"/CIDInit /ProcSet findresource begin begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfrange\n<41> <43> [<0058> <0059005A> <005A>]\n"
        b"endbfrange\nendcmap"
    )
    spec = _parse_tounicode(cm)
    assert spec["width"] == 1
    assert spec["map"] == {0x41: "X", 0x42: "YZ", 0x43: "Z"}


def test_type0_two_byte_tj_array_with_kerning():
    """2-byte hex code strings inside a TJ array, word gaps from
    kerning adjustments — the composite-font analog of the
    kerning-packed layout."""
    fonts = {
        "F7": {
            "width": 2,
            "map": {1: "H", 2: "i", 3: "y", 4: "o", 5: "u"},
        }
    }
    data = (
        b"BT /F7 12 Tf 72 720 Td "
        b"[<00010002> -300 <000300040005>] TJ ET"
    )
    assert _content_text(data, fonts) == "Hi you"
    # the same bytes WITHOUT the font mapping read as latin-1 gibberish
    assert _content_text(data) != "Hi you"


def test_type0_without_tounicode_reads_replacement_chars():
    """Identity-H with no ToUnicode: codes are font-internal glyph
    ids — the honest read is U+FFFD, never silently wrong text."""
    pdf = synthesize_pdf(["ab"], type0=True, compress=False)
    # drop the /ToUnicode reference from the font dictionary
    broken = pdf.replace(b"/ToUnicode 6 0 R ", b"")
    out = pdf_extract_text(broken)
    assert out["text"] == "��"


def test_font_switch_mid_stream():
    """Tf switches between a composite and a simple font inside one
    content stream; each show string decodes under the font active
    at its position."""
    fonts = {"F1": None, "F2": {"width": 2, "map": {7: "Q"}}}
    data = (
        b"BT /F2 10 Tf <0007> Tj /F1 10 Tf (plain) Tj ET"
    )
    assert _content_text(data, fonts) == "Qplain"


def test_non_tj_array_numbers_never_inject_spaces():
    """A negative number inside a NON-TJ array (dash pattern, Decode
    array) between shows must not become a phantom space."""
    data = (
        b"BT /F1 11 Tf 72 720 Td (before) Tj "
        b"[-400 3] 0 d (after) Tj ET"
    )
    assert _content_text(data) == "beforeafter"
    # while a genuine TJ gap in the SAME stream still lands
    data2 = (
        b"BT (x) Tj [-400 3] 0 d [(a)-400(b)] TJ ET"
    )
    assert _content_text(data2) == "xa b"


def test_r4_encrypt_metadata_false_round_trips():
    """R4 files with /EncryptMetadata false derive the file key with
    the 0xFFFFFFFF suffix (Algorithm 2) — without it the /U check
    fails and a decryptable file is misreported as real-password."""
    pdf = synthesize_pdf(
        ["metadata stays plain"], title="EM",
        encrypt=True, encrypt_r=4, encrypt_metadata=False,
    )
    assert b"/EncryptMetadata false" in pdf
    out = pdf_extract_text(pdf)
    assert out["text"] == "metadata stays plain"
    assert out["title"] == "EM"
