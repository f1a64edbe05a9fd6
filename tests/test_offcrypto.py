"""Default-password office decryption (`operators/offcrypto.py`):
FIPS-197/RC4 primitive vectors, ECMA-376 + BIFF8-RC4 round trips,
wrong-password rejection, and the decryption-aware dispatcher."""

import pytest

from minerva_etl_spark.operators.offcrypto import (
    DEFAULT_PASSWORD,
    WrongPasswordError,
    aes_ecb_decrypt,
    aes_ecb_encrypt,
    decrypt_ooxml,
    decrypt_xls_rc4,
    encrypt_ooxml,
    encrypt_xls_rc4,
    rc4_crypt,
    xls_encryption_type,
)


def test_aes_fips197_appendix_c_vectors():
    """The generated-table AES must reproduce the published FIPS-197
    example vectors for all three key sizes, both directions."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, ct_hex in cases:
        ct = aes_ecb_encrypt(key, pt)
        assert ct.hex() == ct_hex
        assert aes_ecb_decrypt(key, ct) == pt
    # multi-block ECB: block independence
    two = aes_ecb_encrypt(bytes(range(16)), pt + pt)
    assert two[:16] == two[16:] == bytes.fromhex(cases[0][1])
    with pytest.raises(ValueError, match="block-aligned"):
        aes_ecb_encrypt(bytes(range(16)), b"short")
    with pytest.raises(ValueError, match="key"):
        aes_ecb_encrypt(b"badlen", pt)


def test_rc4_published_vector():
    assert (
        rc4_crypt(b"Key", b"Plaintext").hex().upper()
        == "BBF316E8D940AF0AD3"
    )
    # involution
    assert rc4_crypt(b"Key", rc4_crypt(b"Key", b"data")) == b"data"


def test_ooxml_roundtrip_and_wrong_password():
    from minerva_etl_spark.operators.docx import (
        docx_extract_text,
        synthesize_docx,
    )
    from minerva_etl_spark.operators.office import (
        sniff_document_format,
    )

    doc = synthesize_docx(["alpha beta", "gamma"], title="T")
    enc = encrypt_ooxml(doc)
    assert sniff_document_format(enc) == "ooxml_encrypted"
    assert decrypt_ooxml(enc) == doc  # byte-exact zip back
    assert docx_extract_text(decrypt_ooxml(enc))["text"] == (
        "alpha beta\ngamma"
    )
    # deterministic fixtures: same plaintext -> same ciphertext
    assert encrypt_ooxml(doc) == enc
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(enc, "not-the-password")
    real = encrypt_ooxml(doc, password="actual-secret")
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(real)  # default password must NOT open it
    assert decrypt_ooxml(real, "actual-secret") == doc
    # 256-bit leg
    enc256 = encrypt_ooxml(doc, key_bits=256)
    assert decrypt_ooxml(enc256) == doc


def test_aes_cbc_nist_vector():
    """NIST SP 800-38A F.2.1 (AES-128-CBC) pins the CBC wiring, and
    the vectorized decrypt inverts the chained encrypt."""
    from minerva_etl_spark.operators.offcrypto import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
    )

    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51"
    )
    ct = aes_cbc_encrypt(key, iv, pt)
    assert ct.hex() == (
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2"
    )
    assert aes_cbc_decrypt(key, iv, ct) == pt


def test_agile_roundtrip_multisegment():
    """Agile (4.4) — what Office 2010+ writes for default-encrypted
    files: multi-segment AES-256-CBC package, per-segment IVs,
    purpose block keys, wrong-password rejection."""
    import random

    from minerva_etl_spark.operators.docx import (
        docx_extract_text,
        synthesize_docx,
    )
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_ooxml_agile,
        ooxml_encryption_scheme,
    )

    rng = random.Random(7)
    paras = [
        "".join(rng.choice("abcdefghij ") for _ in range(400))
        for _ in range(60)
    ]  # incompressible -> the zip spans several 4096-byte segments
    doc = synthesize_docx(paras, title="Big")
    assert len(doc) > 2 * 4096
    enc = encrypt_ooxml_agile(doc)
    assert ooxml_encryption_scheme(enc) == "agile"
    assert decrypt_ooxml(enc) == doc
    assert docx_extract_text(decrypt_ooxml(enc))["text"] == (
        "\n".join(paras)
    )
    assert encrypt_ooxml_agile(doc) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(enc, "nope")
    real = encrypt_ooxml_agile(doc, password="hidden")
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(real)
    assert decrypt_ooxml(real, "hidden") == doc
    # standard vs agile census split
    from minerva_etl_spark.operators.offcrypto import encrypt_ooxml

    assert ooxml_encryption_scheme(encrypt_ooxml(doc)) == "standard"


def test_agile_declared_parameter_sets():
    """Office 2010 writes agile with SHA-1/AES-128 (2013+ moved to
    SHA-512/AES-256): the decryptor must follow the hashAlgorithm /
    keyBits the XML declares instead of hard-rejecting (r15 advice,
    medium)."""
    from minerva_etl_spark.operators.docx import (
        docx_extract_text,
        synthesize_docx,
    )
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_ooxml_agile,
        ooxml_encryption_scheme,
    )

    doc = synthesize_docx(["twenty ten body"], title="O14")
    # the Office-2010 parameter set (spin stays 100k in real files;
    # smaller here to keep the suite fast — spin is declared too)
    o2010 = encrypt_ooxml_agile(
        doc, hash_alg="SHA1", key_bits=128, spin=5_000
    )
    assert ooxml_encryption_scheme(o2010) == "agile"
    assert decrypt_ooxml(o2010) == doc
    assert docx_extract_text(decrypt_ooxml(o2010))["text"] == (
        "twenty ten body"
    )
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(o2010, "nope")
    real = encrypt_ooxml_agile(
        doc, hash_alg="SHA1", key_bits=128, spin=5_000,
        password="hidden",
    )
    with pytest.raises(WrongPasswordError):
        decrypt_ooxml(real)
    # the other accepted hash/key combinations round-trip too
    for alg, bits in (("SHA256", 192), ("SHA384", 256)):
        enc = encrypt_ooxml_agile(
            doc, hash_alg=alg, key_bits=bits, spin=1_000
        )
        assert decrypt_ooxml(enc) == doc
    # unknown algorithms stay named rejects on BOTH sides
    with pytest.raises(ValueError, match="hashAlgorithm"):
        encrypt_ooxml_agile(doc, hash_alg="MD5")
    with pytest.raises(ValueError, match="keyBits"):
        encrypt_ooxml_agile(doc, key_bits=512)


def test_doc_rc4_data_stream_encrypted_too():
    """MS-DOC §2.2.6.2: the Data stream (embedded objects / field
    data) is encrypted IN ITS ENTIRETY — a decrypted .doc must not
    leave it as ciphertext (r15 advice)."""
    from minerva_etl_spark.operators.msdoc import (
        _MINI_CUTOFF,
        _build_cfb,
        _Cfb,
        doc_extract_text,
        synthesize_doc,
    )
    from minerva_etl_spark.operators.offcrypto import (
        decrypt_doc_rc4,
        encrypt_doc_rc4,
    )

    base = synthesize_doc(["memo body with data"], title="D")
    cfb = _Cfb(base)
    streams = [
        (e["name"], cfb.read_entry(e))
        for e in cfb.top_level()
        if e["type"] == 2
    ]
    blob = b"EMBEDDED-OBJECT-BYTES-" * 40
    streams.append(("Data", blob.ljust(_MINI_CUTOFF, b"\x00")))
    plain = _build_cfb(streams)
    enc = encrypt_doc_rc4(plain)
    # ciphertext: the Data stream must NOT ride through readable
    assert _Cfb(enc).read("Data")[: len(blob)] != blob
    dec = decrypt_doc_rc4(enc)
    assert _Cfb(dec).read("Data")[: len(blob)] == blob
    assert doc_extract_text(dec) == doc_extract_text(plain)


def test_xls_rc4_roundtrip_multiblock():
    """Workbooks spanning several 1024-byte RC4 blocks: block-edge
    rekeying, lbPlyPos fix-ups and OLEPS pass-through all load-bear."""
    from minerva_etl_spark.operators.xls import (
        synthesize_xls,
        xls_extract_text,
    )

    sheets = [
        ("Data", [[f"row {i} cell", str(7 * i + 1)] for i in range(30)]),
        ("Notes", [[f"note {i}"] for i in range(10)]),
    ]
    plain = synthesize_xls(sheets, title="VT", author="VA")
    enc = encrypt_xls_rc4(plain)
    assert xls_encryption_type(enc) == "rc4"
    assert xls_encryption_type(plain) is None
    dec = decrypt_xls_rc4(enc)
    assert xls_extract_text(dec) == xls_extract_text(plain)
    assert xls_extract_text(dec)["title"] == "VT"
    assert encrypt_xls_rc4(plain) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_xls_rc4(enc, "wrong")
    with pytest.raises(ValueError, match="not encrypted"):
        decrypt_xls_rc4(plain)
    with pytest.raises(ValueError, match="already encrypted"):
        encrypt_xls_rc4(enc)


def test_doc_rc4_roundtrip():
    """Word-97 RC4 (fEncrypted + table-stream EncryptionHeader,
    512-byte rekey blocks): round trip, wrong password, the plain
    reader's named reject, and OLEPS pass-through."""
    from minerva_etl_spark.operators.msdoc import (
        doc_extract_text,
        synthesize_doc,
    )
    from minerva_etl_spark.operators.offcrypto import (
        decrypt_doc_rc4,
        doc_encryption_type,
        encrypt_doc_rc4,
    )

    paras = [f"paragraph {i} of the secret memo" for i in range(30)]
    plain = synthesize_doc(paras, title="DT", author="DA")
    enc = encrypt_doc_rc4(plain)
    assert doc_encryption_type(enc) == "rc4"
    assert doc_encryption_type(plain) is None
    with pytest.raises(ValueError, match="fEncrypted"):
        doc_extract_text(enc)
    dec = decrypt_doc_rc4(enc)
    assert doc_extract_text(dec) == doc_extract_text(plain)
    assert doc_extract_text(dec)["title"] == "DT"
    assert encrypt_doc_rc4(plain) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_doc_rc4(enc, "wrong")
    with pytest.raises(ValueError, match="already encrypted"):
        encrypt_doc_rc4(enc)
    with pytest.raises(ValueError, match="not encrypted"):
        decrypt_doc_rc4(plain)


def test_xls_rc4_cryptoapi_roundtrip():
    """RC4 CryptoAPI (MS-OFFCRYPTO §2.3.5 — Excel XP/2003): SHA-1
    block-key derivation, FilePass version 2.2, the same §2.2.10
    byte map; multi-block workbooks plus the 40-bit export-grade
    zero-pad rule."""
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_xls_rc4_cryptoapi,
    )
    from minerva_etl_spark.operators.xls import (
        synthesize_xls,
        xls_extract_text,
    )

    sheets = [
        ("Data", [[f"row {i} cell", str(7 * i + 1)] for i in range(30)]),
        ("Notes", [[f"note {i}"] for i in range(10)]),
    ]
    plain = synthesize_xls(sheets, title="CT", author="CA")
    enc = encrypt_xls_rc4_cryptoapi(plain)
    assert xls_encryption_type(enc) == "rc4_cryptoapi"
    dec = decrypt_xls_rc4(enc)
    assert xls_extract_text(dec) == xls_extract_text(plain)
    assert xls_extract_text(dec)["title"] == "CT"
    assert encrypt_xls_rc4_cryptoapi(plain) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_xls_rc4(enc, "wrong")
    # the ciphertexts of the two RC4 generations must differ (the
    # derivations are unrelated) yet both decrypt
    assert enc != encrypt_xls_rc4(plain)
    # 40-bit export grade: Hb[:5] zero-padded to a 16-byte RC4 key
    enc40 = encrypt_xls_rc4_cryptoapi(plain, key_bits=40)
    assert xls_encryption_type(enc40) == "rc4_cryptoapi"
    assert xls_extract_text(decrypt_xls_rc4(enc40)) == (
        xls_extract_text(plain)
    )
    with pytest.raises(WrongPasswordError):
        decrypt_xls_rc4(enc40, "wrong")
    with pytest.raises(ValueError, match="key size"):
        encrypt_xls_rc4_cryptoapi(plain, key_bits=256)


def test_doc_rc4_cryptoapi_roundtrip():
    """Word XP/2003 RC4 CryptoAPI: the header at table-stream offset
    0 (version 2.2), 512-byte rekey blocks, FibBase plaintext, and
    the Data stream encrypted in its entirety."""
    from minerva_etl_spark.operators.msdoc import (
        _MINI_CUTOFF,
        _build_cfb,
        _Cfb,
        doc_extract_text,
        synthesize_doc,
    )
    from minerva_etl_spark.operators.offcrypto import (
        decrypt_doc_rc4,
        doc_encryption_type,
        encrypt_doc_rc4_cryptoapi,
    )

    paras = [f"cryptoapi paragraph {i}" for i in range(30)]
    base = synthesize_doc(paras, title="XT", author="XA")
    cfb = _Cfb(base)
    streams = [
        (e["name"], cfb.read_entry(e))
        for e in cfb.top_level()
        if e["type"] == 2
    ]
    blob = b"FIELD-DATA-" * 64
    streams.append(("Data", blob.ljust(_MINI_CUTOFF, b"\x00")))
    plain = _build_cfb(streams)
    enc = encrypt_doc_rc4_cryptoapi(plain)
    assert doc_encryption_type(enc) == "rc4_cryptoapi"
    assert _Cfb(enc).read("Data")[: len(blob)] != blob
    dec = decrypt_doc_rc4(enc)
    assert doc_extract_text(dec) == doc_extract_text(plain)
    assert doc_extract_text(dec)["title"] == "XT"
    assert _Cfb(dec).read("Data")[: len(blob)] == blob
    assert encrypt_doc_rc4_cryptoapi(plain) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_doc_rc4(enc, "wrong")
    # the Office-97 census tag is unchanged by the new scheme
    from minerva_etl_spark.operators.offcrypto import encrypt_doc_rc4

    assert doc_encryption_type(encrypt_doc_rc4(plain)) == "rc4"


def test_office_decrypt_cryptoapi_dispatch(spark):
    """The dispatcher decrypts BOTH RC4 generations in-task with
    distinct census tags, and a real-password CryptoAPI file stays a
    locked row."""
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.offcrypto import (
        encrypt_doc_rc4_cryptoapi,
        encrypt_xls_rc4_cryptoapi,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls

    rows = [
        (1, encrypt_xls_rc4_cryptoapi(
            synthesize_xls([("S", [["modern", "9"]])], title="M"))),
        (2, encrypt_doc_rc4_cryptoapi(
            synthesize_doc(["xp era body"], title="X"))),
        (3, encrypt_xls_rc4(
            synthesize_xls([("S", [["legacy", "5"]])], title="L"))),
        (4, encrypt_xls_rc4_cryptoapi(
            synthesize_xls([("S", [["sealed"]])]),
            password="real-secret")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].encryption, got[1].text) == (
        "xls", "xls_rc4_cryptoapi", "S\nmodern\t9")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "doc", "doc_rc4_cryptoapi", "xp era body")
    assert (got[3].format, got[3].encryption) == ("xls", "xls_rc4")
    assert (got[4].format, got[4].encryption, got[4].text) == (
        "xls", "locked", None)


def test_ppt_rc4_cryptoapi_roundtrip():
    """PowerPoint XP/2003 RC4 CryptoAPI (MS-PPT persist-object
    encryption): the Current User token, the UserEditAtom →
    PersistDirectoryAtom map, per-persist RC4 with block = persist
    id, and the neutralized CryptSession10Container."""
    from minerva_etl_spark.operators.offcrypto import (
        decrypt_ppt_rc4,
        encrypt_ppt_rc4,
        ppt_encryption_type,
    )
    from minerva_etl_spark.operators.ppt import (
        ppt_extract_text,
        synthesize_ppt,
    )

    slides = [
        [f"slide {i} heading", f"slide {i} body line"]
        for i in range(6)
    ]
    plain = synthesize_ppt(slides, title="PC", author="PA")
    enc = encrypt_ppt_rc4(plain)
    assert ppt_encryption_type(enc) == "rc4_cryptoapi"
    assert ppt_encryption_type(plain) is None
    # the plain reader names the encryption instead of walking
    # ciphertext records
    with pytest.raises(ValueError, match="encrypted PowerPoint"):
        ppt_extract_text(enc)
    dec = decrypt_ppt_rc4(enc)
    assert ppt_extract_text(dec) == ppt_extract_text(plain)
    assert ppt_extract_text(dec)["title"] == "PC"
    assert encrypt_ppt_rc4(plain) == enc  # deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_ppt_rc4(enc, "wrong")
    with pytest.raises(ValueError, match="already encrypted"):
        encrypt_ppt_rc4(enc)
    with pytest.raises(ValueError, match="not encrypted"):
        decrypt_ppt_rc4(plain)
    # 40-bit export grade
    enc40 = encrypt_ppt_rc4(plain, key_bits=40)
    assert ppt_extract_text(decrypt_ppt_rc4(enc40)) == (
        ppt_extract_text(plain)
    )


def test_office_decrypt_ppt_leg(spark):
    from minerva_etl_spark.operators.offcrypto import encrypt_ppt_rc4
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.ppt import synthesize_ppt

    rows = [
        (1, encrypt_ppt_rc4(
            synthesize_ppt([["deck body"]], title="D"))),
        (2, encrypt_ppt_rc4(
            synthesize_ppt([["sealed"]]), password="real-secret")),
        (3, synthesize_ppt([["open deck"]], title="O")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].encryption, got[1].title,
            got[1].text) == ("ppt", "ppt_rc4_cryptoapi", "D",
                             "deck body")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "ppt", "locked", None)
    assert (got[3].format, got[3].encryption, got[3].text) == (
        "ppt", "none", "open deck")


def test_office_decrypt_wordlist(spark):
    """Wordlist mode (r16): a list of candidate passwords tries in
    order per payload — the corpus-recovery shape.  Each scheme's
    verifier gates the attempts; exhausting the list yields the
    locked census row, and scheme-level rejects never burn through
    the list."""
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.odf import (
        encrypt_odf,
        synthesize_odt,
    )
    from minerva_etl_spark.operators.offcrypto import encrypt_xls_xor
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls

    rows = [
        # opens with the 2nd candidate (Standard AES)
        (1, encrypt_ooxml(synthesize_docx(["alpha body"]),
                          password="site-pw")),
        # opens with the default (1st candidate)
        (2, encrypt_xls_rc4(synthesize_xls([("S", [["beta"]])]))),
        # opens with the 3rd candidate (ODF Blowfish)
        (3, encrypt_odf(synthesize_odt(["gamma body"]), "odf-pw")),
        # XOR under a password NOT in the list -> locked
        (4, encrypt_xls_xor(synthesize_xls([("S", [["delta"]])]),
                            "absent")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary"),
            password=["VelvetSweatshop", "site-pw", "odf-pw"],
        ).collect()
    }
    assert (got[1].encryption, got[1].text) == (
        "ecma376_standard", "alpha body")
    assert (got[2].encryption, got[2].text) == ("xls_rc4", "S\nbeta")
    assert (got[3].encryption, got[3].text) == (
        "odf_blowfish", "gamma body")
    assert (got[4].encryption, got[4].text) == ("locked", None)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary"),
            password=[],
        )


def test_office_decrypt_doc_leg(spark):
    from minerva_etl_spark.operators.msdoc import synthesize_doc
    from minerva_etl_spark.operators.offcrypto import encrypt_doc_rc4
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    rows = [
        (1, encrypt_doc_rc4(synthesize_doc(["hidden doc"], title="H"))),
        (2, encrypt_doc_rc4(synthesize_doc(["really locked"]),
                            password="secret!")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].encryption, got[1].text) == (
        "doc", "doc_rc4", "hidden doc")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "doc", "locked", None)


def test_plain_xls_reader_rejects_filepass():
    """`xls_extract_text` must NAME the encryption instead of
    garbage-parsing encrypted records."""
    from minerva_etl_spark.operators.xls import (
        synthesize_xls,
        xls_extract_text,
    )

    enc = encrypt_xls_rc4(synthesize_xls([("S", [["x"]])]))
    with pytest.raises(ValueError, match="FilePass"):
        xls_extract_text(enc)


def test_office_decrypt_extract_mixed_matrix(spark):
    """The dispatcher decrypts default-password payloads in-task and
    census-tags genuinely locked ones as rows, never errors."""
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls
    from minerva_etl_spark.operators.xlsx import synthesize_xlsx

    rows = [
        (1, synthesize_docx(["plain"], title="P")),
        (2, encrypt_ooxml(synthesize_docx(["secret body"], title="S"))),
        (3, encrypt_ooxml(synthesize_xlsx([("Sh", [["v", "7"]])]))),
        (4, encrypt_xls_rc4(
            synthesize_xls([("L", [["legacy", "5"]])], title="LT"))),
        (5, encrypt_ooxml(synthesize_docx(["locked"]),
                          password="Tr3b0r!")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].encryption) == ("docx", "none")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "docx", "ecma376_standard", "secret body")
    assert (got[3].format, got[3].encryption) == (
        "xlsx", "ecma376_standard")
    assert (got[4].format, got[4].encryption, got[4].title) == (
        "xls", "xls_rc4", "LT")
    assert (got[5].format, got[5].encryption, got[5].text) == (
        "ooxml_encrypted", "locked", None)
    # the census split the ask wants: one groupBy over the output
    census = {
        (r.format, r.encryption): r.n
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).groupBy("format", "encryption").agg(
            __import__("pyspark.sql.functions", fromlist=["count"])
            .count("*").alias("n")
        ).collect()
    }
    assert census[("ooxml_encrypted", "locked")] == 1
    assert census[("docx", "ecma376_standard")] == 1


def test_encrypted_xlsb_decrypts_and_routes(spark):
    """Cross-feature: an ECMA-376-encrypted XLSB decrypts and routes
    into the r15 BIFF12 codec (the dispatcher re-sniffs the inner
    zip, whatever OOXML flavor it is)."""
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xlsb import synthesize_xlsb

    enc = encrypt_ooxml(
        synthesize_xlsb([("S", [["sealed", "5"]])], title="B")
    )
    got = office_decrypt_extract(
        spark.createDataFrame(
            [(1, enc)], "doc_id bigint, payload binary"
        )
    ).collect()[0]
    assert (got.format, got.encryption, got.title, got.text) == (
        "xlsb", "ecma376_standard", "B", "S\nsealed\t5")


def test_malformed_encryption_structures_are_policy_rows(spark):
    """Dirty-corpus rule: truncated/garbage EncryptionInfo must
    follow the codec error policy (locked row / skip), never crash
    the scan with a raw struct/XML error."""
    import struct

    from minerva_etl_spark.operators.msdoc import (
        _MINI_CUTOFF,
        _build_cfb,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    garbage_agile = _build_cfb([
        ("EncryptionInfo",
         (struct.pack("<HHI", 4, 4, 0x40) + b"<notxml").ljust(
             _MINI_CUTOFF, b"\x00")),
        ("EncryptedPackage", b"\x00" * _MINI_CUTOFF),
    ])
    short_info = _build_cfb([
        ("EncryptionInfo", b"xx".ljust(_MINI_CUTOFF, b"\x00")),
        ("EncryptedPackage", b"\x00" * _MINI_CUTOFF),
    ])
    with pytest.raises(ValueError):
        decrypt_ooxml(garbage_agile)
    rows = [(1, garbage_agile), (2, short_info)]
    got = office_decrypt_extract(
        spark.createDataFrame(rows, "doc_id bigint, payload binary")
    ).collect()
    # both become honest locked census rows, not errors
    assert {(r.doc_id, r.encryption) for r in got} == {
        (1, "locked"), (2, "locked")}


def test_encrypted_attachment_through_mail_arc(spark):
    """Realistic enterprise composition: an ENCRYPTED office
    attachment rides an e-mail — `eml_attachments` explodes it and
    `office_decrypt_extract` opens the default-password member while
    census-tagging a truly locked sibling."""
    from minerva_etl_spark.operators.docx import synthesize_docx
    from minerva_etl_spark.operators.email_ingest import (
        eml_attachments,
        synthesize_eml,
    )
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    eml = synthesize_eml(
        subject="q3 numbers",
        sender="cfo@corp.test",
        text_body="see attached",
        attachments=[
            ("open.docx",
             "application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document",
             encrypt_ooxml(synthesize_docx(["default-sealed body"]))),
            ("locked.docx",
             "application/vnd.openxmlformats-officedocument"
             ".wordprocessingml.document",
             encrypt_ooxml(synthesize_docx(["top secret"]),
                           password="Tr3b0r!")),
        ],
    )
    atts = eml_attachments(
        spark.createDataFrame(
            [(1, eml)], "doc_id bigint, payload binary"
        )
    )
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            atts.selectExpr("filename AS doc_id", "payload"),
            id_col="doc_id",
        ).collect()
    }
    assert (got["open.docx"].encryption, got["open.docx"].text) == (
        "ecma376_standard", "default-sealed body")
    assert (got["locked.docx"].encryption,
            got["locked.docx"].text) == ("locked", None)


def test_xor_published_verifier_and_key_anchors():
    """The §2.3.7.1 derivations against PUBLISHED example values:
    the verifier is the same 15-bit rotate-fold Excel documents for
    sheet protection, whose example hashes are public ('password' →
    0x83AF, 'test' → 0xCBEB, 'abcdefghij' → 0xFEF1 in the OOo Excel
    format documentation) — an external anchor a self-round-trip
    could never provide.  The 105-word XorMatrix additionally
    verifies against its own published structure: 15 seeds × 7
    successive doublings modulo the 0x1021 polynomial."""
    from minerva_etl_spark.operators.offcrypto import (
        _XOR_MATRIX,
        xls_xor_key,
        xls_xor_verifier,
    )

    assert xls_xor_verifier("password") == 0x83AF
    assert xls_xor_verifier("test") == 0xCBEB
    assert xls_xor_verifier("abcdefghij") == 0xFEF1
    # published literal spot-checks of the matrix (first + last group
    # + a middle seed) — the generator must reproduce the spec table
    assert _XOR_MATRIX[:7] == (
        0xAEFC, 0x4DD9, 0x9BB2, 0x2745, 0x4E8A, 0x9D14, 0x2A09)
    assert _XOR_MATRIX[-7:] == (
        0x1021, 0x2042, 0x4084, 0x8108, 0x1231, 0x2462, 0x48C4)
    assert _XOR_MATRIX[28:35] == (
        0xD849, 0xA0B3, 0x5147, 0xA28E, 0x553D, 0xAA7A, 0x44D5)
    assert len(_XOR_MATRIX) == 105
    # poly-doubling identity holds within every group
    for g in range(15):
        for i in range(6):
            x = _XOR_MATRIX[7 * g + i]
            nxt = ((x << 1) ^ (0x1021 if x & 0x8000 else 0)) & 0xFFFF
            assert _XOR_MATRIX[7 * g + i + 1] == nxt
    # keys are position-sensitive (the matrix group walk)
    assert xls_xor_key("ab") != xls_xor_key("ba")
    with pytest.raises(ValueError, match="1-15"):
        xls_xor_verifier("x" * 16)


def test_xls_xor_roundtrip():
    """XOR Method 1 end to end: multi-record workbooks round-trip,
    the key/verifier pair rejects wrong passwords, and the two RC4
    generations coexist with distinct census tags."""
    from minerva_etl_spark.operators.offcrypto import (
        decrypt_xls_xor,
        encrypt_xls_xor,
    )
    from minerva_etl_spark.operators.xls import (
        synthesize_xls,
        xls_extract_text,
    )

    sheets = [
        ("Data", [[f"cell {i} text", str(3 * i)] for i in range(20)]),
        ("Notes", [["memo"]]),
    ]
    plain = synthesize_xls(sheets, title="XO")
    enc = encrypt_xls_xor(plain)
    assert xls_encryption_type(enc) == "xor"
    dec = decrypt_xls_xor(enc)
    assert xls_extract_text(dec) == xls_extract_text(plain)
    assert xls_extract_text(dec)["title"] == "XO"
    assert encrypt_xls_xor(plain) == enc  # salt-free: deterministic
    with pytest.raises(WrongPasswordError):
        decrypt_xls_xor(enc, "wrong")
    # a supplied non-default ANSI password works end to end
    enc2 = encrypt_xls_xor(plain, "s3cret")
    assert xls_extract_text(decrypt_xls_xor(enc2, "s3cret")) == (
        xls_extract_text(plain)
    )
    with pytest.raises(WrongPasswordError):
        decrypt_xls_xor(enc2)  # the default must NOT open it
    # cross-scheme named rejects, both directions
    with pytest.raises(ValueError, match="use decrypt_xls_xor"):
        decrypt_xls_rc4(enc)
    with pytest.raises(ValueError, match="RC4"):
        decrypt_xls_xor(encrypt_xls_rc4(plain))


def test_office_decrypt_xor_leg(spark):
    """The dispatcher opens default-password XOR workbooks with the
    xls_xor census tag; real-password XOR stays a locked row."""
    from minerva_etl_spark.operators.offcrypto import encrypt_xls_xor
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )
    from minerva_etl_spark.operators.xls import synthesize_xls

    rows = [
        (1, encrypt_xls_xor(
            synthesize_xls([("S", [["oldest", "1"]])], title="O"))),
        (2, encrypt_xls_xor(
            synthesize_xls([("S", [["sealed"]])]), "s3cret")),
    ]
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            spark.createDataFrame(rows, "doc_id bigint, payload binary")
        ).collect()
    }
    assert (got[1].format, got[1].encryption, got[1].text) == (
        "xls", "xls_xor", "S\noldest\t1")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "xls", "locked", None)
