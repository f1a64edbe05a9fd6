"""ODF package encryption (OASIS ODF 1.2 §3.4 — `operators/odf.py`
+ `operators/blowfish.py`): published Blowfish vectors, both cipher
profiles round-tripping, wrong-password rejection, and the
supplied-password dispatcher path."""

import pytest

from minerva_etl_spark.operators.odf import (
    decrypt_odf,
    encrypt_odf,
    odf_encryption_type,
    odf_extract_text,
    odf_is_encrypted,
    synthesize_odp,
    synthesize_ods,
    synthesize_odt,
)
from minerva_etl_spark.operators.offcrypto import WrongPasswordError


def test_blowfish_published_vectors():
    """The π-generated tables must reproduce the canonical published
    test vectors (Schneier's vector file) — external anchors, not
    self-round-trips — and the first P-word is π's famous fractional
    hex prefix."""
    from minerva_etl_spark.operators.blowfish import (
        _initial_tables,
        blowfish_encrypt_block,
        blowfish_cfb8_decrypt,
        blowfish_cfb8_encrypt,
    )

    p, s = _initial_tables()[:2]
    assert p[0] == 0x243F6A88
    assert p[1] == 0x85A308D3
    assert s[0][0] == 0xD1310BA6
    cases = [
        ("0000000000000000", "0000000000000000", "4EF997456198DD78"),
        ("FFFFFFFFFFFFFFFF", "FFFFFFFFFFFFFFFF", "51866FD5B85ECB8A"),
        ("0123456789ABCDEF", "1111111111111111", "61F9C3802281B096"),
        ("1111111111111111", "0123456789ABCDEF", "7D0CC630AFDA1EC7"),
    ]
    for key, pt, ct in cases:
        assert (
            blowfish_encrypt_block(
                bytes.fromhex(key), bytes.fromhex(pt)
            ).hex().upper()
            == ct
        )
    # CFB-8: the sequential encryptor and the vectorized decryptor
    # are exact inverses at every length incl. block-unaligned
    key, iv = b"0123456789abcdef", b"ABCDEFGH"
    for n in (0, 1, 7, 8, 9, 1000):
        data = bytes(range(256)) * 4
        data = data[:n]
        assert blowfish_cfb8_decrypt(
            key, iv, blowfish_cfb8_encrypt(key, iv, data)
        ) == data
    with pytest.raises(ValueError, match="4-56"):
        blowfish_encrypt_block(b"xy", bytes(8))


def test_odf_both_cipher_profiles_roundtrip():
    docs = {
        "odt": synthesize_odt(
            ["alpha beta", "gamma delta"], title="Sealed T"
        ),
        "ods": synthesize_ods(
            [("Data", [["head", "7"], ["tail", "11"]])], title="S"
        ),
        "odp": synthesize_odp([["slide one", "line two"]], title="P"),
    }
    for kind, plain in docs.items():
        for cipher in ("blowfish", "aes256"):
            enc = encrypt_odf(plain, "hunter2", cipher=cipher)
            assert odf_is_encrypted(enc)
            assert odf_encryption_type(enc) == (
                "blowfish" if cipher == "blowfish" else "aes"
            )
            # deterministic fixtures
            assert encrypt_odf(plain, "hunter2", cipher=cipher) == enc
            # the encrypted package still SNIFFS as its kind (stored
            # mimetype) but refuses plain extraction by name
            with pytest.raises(ValueError, match="password-protected"):
                odf_extract_text(enc)
            dec = decrypt_odf(enc, "hunter2")
            assert odf_extract_text(dec) == odf_extract_text(plain)
            with pytest.raises(WrongPasswordError):
                decrypt_odf(enc, "not-it")
    with pytest.raises(ValueError, match="not encrypted"):
        decrypt_odf(docs["odt"], "hunter2")
    with pytest.raises(ValueError, match="already encrypted"):
        encrypt_odf(
            encrypt_odf(docs["odt"], "x"), "x"
        )


def test_odf_declared_iteration_count_followed():
    """The decryptor must follow the manifest's declared PBKDF2
    iteration count (newer LibreOffice writes 100000, legacy 1024)."""
    plain = synthesize_odt(["iterate me"], title="I")
    enc = encrypt_odf(plain, "pw", iterations=5000)
    assert odf_extract_text(decrypt_odf(enc, "pw"))["text"] == (
        "iterate me"
    )


def test_office_decrypt_supplied_password_opens_odf(spark):
    """End to end through the dispatcher: encrypted ODFs stay locked
    census rows under the default password, and open with distinct
    cipher census tags when the real password is supplied."""
    from minerva_etl_spark.operators.office import (
        office_decrypt_extract,
    )

    rows = [
        (1, encrypt_odf(
            synthesize_odt(["bf body"], title="B"), "corp-pass")),
        (2, encrypt_odf(
            synthesize_ods([("Data", [["cell", "3"]])], title="A"),
            "corp-pass", cipher="aes256")),
        (3, synthesize_odt(["plain body"], title="P")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    # no password supplied: both encrypted docs are locked rows
    locked = {
        r.doc_id: r.encryption
        for r in office_decrypt_extract(df).collect()
    }
    assert locked == {1: "locked", 2: "locked", 3: "none"}
    # the real password opens both, tagged per cipher
    got = {
        r.doc_id: r
        for r in office_decrypt_extract(
            df, password="corp-pass"
        ).collect()
    }
    assert (got[1].format, got[1].encryption, got[1].text) == (
        "odt", "odf_blowfish", "bf body")
    assert (got[2].format, got[2].encryption, got[2].text) == (
        "ods", "odf_aes", "Data\ncell\t3")
    assert got[2].title == "A"
    assert (got[3].encryption, got[3].text) == ("none", "plain body")
