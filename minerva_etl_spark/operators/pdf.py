"""REAL PDF text extraction — the document-corpus ingest edge.

PDFs are a first-order training-corpus source (papers, books, filings)
and the reference's harvest surface treats every delivery as opaque
files routed to a parser plugin (`src/minerva/harvest/plugins.py`
semantics); this module is that parser for PDF, built the same way as
the repo's other codecs (PNG/GIF/JPEG/WAV): a pure-stdlib format
implementation in BOTH directions so fixtures are real files and the
oracle can pin the whole chain closed-form.

What is REAL here:

- ``synthesize_pdf`` emits valid PDF 1.4: catalog / page tree / one
  content stream per page (``BT .. Tf Td Tj .. ET``), correct string
  escaping, optional ``FlateDecode`` (stdlib zlib) stream compression,
  an Info dict with ``/Title``, and a byte-accurate xref table —
  output opens in any PDF viewer.
- ``pdf_extract`` walks every ``N G obj .. endobj`` object (tolerant
  object scan tracking generation numbers — real-world extractors do
  this because real-world xref
  tables lie; ours are correct and the scan is verified against them
  in tests), resolves ``/Type /Page`` objects IN PAGE-TREE ORDER
  (``/Kids`` walk, falling back to object order when the tree is
  absent), follows direct and array ``/Contents`` references,
  inflates ``FlateDecode`` streams (PNG predictors 10-15 included),
  and tokenizes the content stream
  for the text-showing operators: ``Tj``, quote/double-quote
  (next-line show), and ``TJ`` arrays (kerning adjustments beyond
  the word-gap magnitude become spaces),
  decoding literal-string escapes (``\\( \\) \\\\ \\n \\t \\r`` and
  octal) and hex strings.  ``Td/TD/T*`` line moves between showings
  emit newlines; pages join with ``\\n\\n``.

PDF 1.5+ compressed object streams (``/ObjStm``) ARE supported in
both directions (round 11): ``synthesize_pdf(objstm=True)`` packs
non-stream objects into a Flate ObjStm indexed by a cross-reference
stream, and the reader unpacks every ObjStm the tolerant scan finds
(``_expand_objstms`` — xref-free, so ``/Extends`` chains and lying
xrefs cost nothing), with top-level definitions superseding embedded
ones (incremental-update semantics).

Standard-security ENCRYPTION is supported both ways across all four
deployed revisions (round 11): RC4-40 (R2), RC4-128 (R3), AES-128
AESV2 (/V 4 /R 4, incl. the /CFM /V2 RC4-in-V4 spelling), and
AES-256 AESV3 (/V 5 /R 6 under the Algorithm 2.B SHA-2 KDF) — all
with an EMPTY user password, the ubiquitous "owner-restricted" crawl
class (opens everywhere, copy/print bits only).
``synthesize_pdf(encrypt=True, encrypt_r=2|3|4|6)`` emits real
encrypted files; the reader derives/unwraps the file key, verifies
the password entries, and decrypts strings and streams before
filters.  AES runs on OpenSSL (`cryptography`) when present, else
the FIPS-verified pure-stdlib fallback (`operators/aes.py`).

CID/Type0 composite fonts extract (round 12): the page's
``/Resources /Font`` dictionary is resolved (inline or indirect),
``/Type0`` fonts get their ``/ToUnicode`` CMap parsed (``bfchar`` +
both ``bfrange`` destination forms, code width from
``begincodespacerange``), and the content-stream walker tracks the
active font through ``Tf`` so multi-byte show strings decode through
the CMap — the layout CJK documents and most modern generators
(Word, LaTeX with fontspec) emit.  ``synthesize_pdf(type0=True)``
writes the same layout with codes that are deliberately NOT Unicode
ordinals.  A Type0 font WITHOUT a usable ToUnicode decodes to
U+FFFD (its codes are font-internal glyph ids): explicit unknown,
never silently wrong text.

Honest boundaries (raise, never guess):
custom security handlers, REAL (non-empty) user passwords,
non-Flate stream filters on page content or object
streams (DCT/LZW/ASCII85),
corrupt Flate data (ValueError,
the skippable dirty-payload class).  Simple fonts keep the latin-1
byte==char mapping (standard-encoding western text); custom
simple-font /Differences encodings are approximated by that same
mapping.  Known softness: an object
whose ``/Length`` is an indirect reference falls back to an
``endstream`` keyword search, which a compressed stream could
theoretically spoof — the corruption then surfaces as the
ValueError above, never as silent wrong text.  Real-cluster escape
hatch: inject pdfminer/PyMuPDF through the same ``--decoder``-style
seam as the media codecs.

Scale shape: one shuffle-free Arrow ``mapInPandas`` scan, parsing
each payload inside its owning task — identical posture to
``html_extract``/``gif_features`` (SCALE.md "Crawl ingest edge").
"""

from __future__ import annotations

import hashlib
import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# ------------------------------------------------- standard security
# The PDF standard security handler (spec §7.6.3): RC4 file
# encryption keyed off the user password.  The overwhelmingly common
# crawl case is "owner-restricted" files — encrypted with an EMPTY
# user password so any reader can open them (print/copy restrictions
# only) — and those ARE decryptable by construction.  This implements
# revisions 2 (40-bit, PDF 1.1+) and 3 (128-bit, Acrobat 5+) in both
# directions; AES (/V 4+) and real user passwords stay honest
# NotImplementedErrors.

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (KSA + PRGA).  Payloads here are KB-scale page
    streams inside Arrow tasks, so the bytearray loop is fine; it is
    its own inverse, so one function serves both directions."""
    S = list(range(256))
    j = 0
    kl = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % kl]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    o_entry: bytes, p: int, id0: bytes, r: int, key_len: int,
    user_pw: bytes = b"",
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the (padded) user
    password, /O, /P (4-byte little-endian SIGNED), and /ID[0].
    When R >= 4 and the encryption dictionary carries
    ``/EncryptMetadata false``, the spec appends 0xFFFFFFFF to the
    hash input — real-world R4 files with unencrypted XMP metadata
    fail the /U check without this step."""
    padded = (user_pw + _PAD)[:32]
    h = hashlib.md5(
        padded + o_entry[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
        + (b"" if encrypt_metadata else b"\xff\xff\xff\xff")
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:key_len]).digest()
    return h[:key_len]


def _std_o_entry(
    owner_pw: bytes, user_pw: bytes, r: int, key_len: int
) -> bytes:
    """Algorithm 3: the /O entry (owner-password hash over the user
    password)."""
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:key_len]
    o = _rc4(key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in key), o)
    return o


def _std_u_entry(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (r2) / 5 (r3): the /U entry used to verify the
    user password."""
    if r == 2:
        return _rc4(file_key, _PAD)
    u = _rc4(file_key, hashlib.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16  # arbitrary 16-byte pad per spec


def _obj_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: the per-object RC4 key."""
    h = hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _obj_key_aesv2(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1, AESV2 flavor: the per-object key gains the
    ``sAlT`` suffix and is always 16 bytes."""
    return hashlib.md5(
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + b"sAlT"
    ).digest()[: min(len(file_key) + 5, 16)]


def _hash_2b(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B (PDF 2.0 / extension level 3): the hardened
    SHA-2 KDF behind AES-256 revision 6 password validation and key
    wrapping."""
    from minerva_etl_spark.operators.aes import aes_cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


# ---------------------------------------------------------------- write


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _tounicode_cmap(code2char: dict[int, str]) -> bytes:
    """A real /ToUnicode CMap stream body for a code→char assignment:
    maximal runs where code and Unicode ordinal advance together (BMP
    only, never crossing the high-byte boundary per spec §9.10.3)
    become ``bfrange`` entries; the rest become ``bfchar`` (dst =
    UTF-16BE hex, surrogate pairs for non-BMP) — so ordinary text
    exercises BOTH CMap entry forms.  Blocks chunk at the spec's 100
    entries."""
    items = sorted(code2char.items())
    runs: list[list[int]] = []  # [code_lo, code_hi, ord_lo]
    for code, ch in items:
        o = ord(ch)
        if (
            runs
            and o <= 0xFFFF
            and code == runs[-1][1] + 1
            and o == runs[-1][2] + (code - runs[-1][0])
            and (code >> 8) == (runs[-1][0] >> 8)
            and runs[-1][2] <= 0xFFFF
        ):
            runs[-1][1] = code
        else:
            runs.append([code, code, o])
    chars = [
        (lo, code2char[lo]) for lo, hi, _ in runs if lo == hi
    ]
    ranges = [(lo, hi, olo) for lo, hi, olo in runs if lo != hi]
    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for j in range(0, len(chars), 100):
        chunk = chars[j: j + 100]
        out.append(b"%d beginbfchar" % len(chunk))
        for code, ch in chunk:
            dst = ch.encode("utf-16-be").hex().encode()
            out.append(b"<%04x> <%s>" % (code, dst))
        out.append(b"endbfchar")
    for j in range(0, len(ranges), 100):
        chunk = ranges[j: j + 100]
        out.append(b"%d beginbfrange" % len(chunk))
        for lo, hi, olo in chunk:
            out.append(b"<%04x> <%04x> <%04x>" % (lo, hi, olo))
        out.append(b"endbfrange")
    out += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(out)


def synthesize_pdf(
    pages: list[str],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
    compress: bool = True,
    objstm: bool = False,
    encrypt: bool = False,
    encrypt_r: int = 3,
    encrypt_metadata: bool = True,
    type0: bool = False,
) -> bytes:
    """A real PDF file with one page per entry of ``pages``.

    Each page's text is laid out one line per ``\\n``-separated
    segment (``Td`` line moves), Helvetica 11.  ``compress`` wraps
    every content stream in ``FlateDecode``.  ``objstm=True`` emits
    PDF 1.5: every non-stream object (catalog, page tree, Info, font,
    page dicts) is packed into ONE FlateDecode ``/ObjStm`` object
    stream and the file is indexed by a cross-reference STREAM
    (``/Type /XRef``, ``/W [1 4 2]``) instead of a plain ``xref``
    table — the layout virtually all post-2005 PDF producers emit
    (streams themselves may not live inside an ObjStm per spec
    §7.5.7, so content streams stay top-level).  ``encrypt=True``
    emits an RC4-encrypted file under the standard security handler
    with an EMPTY user password (the ubiquitous "owner-restricted"
    crawl class — opens in any reader): revision ``encrypt_r`` (2 =
    40-bit, 3 = 128-bit), strings re-encoded as encrypted hex, every
    stream RC4'd with its per-object key, deterministic /ID.
    ``type0=True`` emits the composite-font layout CJK documents and
    most modern generators (Word, LaTeX with fontspec) produce: /F1
    becomes a ``/Type0`` font (``/Encoding /Identity-H``, a
    ``/CIDFontType2`` descendant) whose content streams show 2-byte
    hex code strings, mapped back to text by a real ``/ToUnicode``
    CMap (``bfchar`` + ``bfrange`` entries; codes are assignment
    indexes, deliberately NOT Unicode ordinals, so extraction must
    actually run the CMap).  Deterministic bytes for a given input
    (fixture requirement shared with
    ``synthesize_png``/``synthesize_warc``).
    """
    if encrypt and objstm:
        raise ValueError(
            "encrypt + objstm in one synthesized file is not "
            "supported (the reader handles both, independently)"
        )
    objs: list[bytes] = []  # 1-indexed body of object i+1

    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages-tree, 3 info, then the font
    # block (simple: 4 font | type0: 4 font, 5 descendant, 6
    # ToUnicode), then per page i: page dict + content stream
    base = 7 if type0 else 5
    kids = " ".join(f"{base + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    t = f"/Title ({_esc(title)}) " if title is not None else ""
    if author is not None:
        t += f"/Author ({_esc(author)}) "
    if created is not None:
        # 'YYYY-MM-DD HH:MM:SS' -> the PDF date form D:YYYYMMDDHHMMSSZ
        digits = "".join(c for c in created if c.isdigit())
        t += f"/CreationDate (D:{digits}Z) "
    objs.append(f"<< {t}/Producer (minerva-spark) >>".encode())
    char2code: dict[str, int] = {}
    if type0:
        # codes are 1-based assignment indexes over the sorted char
        # set — consecutive chars get consecutive codes, so ordinary
        # text produces real bfrange runs (plus bfchar singletons)
        for k, ch in enumerate(
            sorted(set("".join(pages).replace("\n", "")))
        ):
            char2code[ch] = k + 1
        objs.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /MinervaCID "
            b"/Encoding /Identity-H /DescendantFonts [5 0 R] "
            b"/ToUnicode 6 0 R >>"
        )
        objs.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
            b"/MinervaCID /CIDSystemInfo << /Registry (Adobe) "
            b"/Ordering (Identity) /Supplement 0 >> /DW 500 "
            b"/CIDToGIDMap /Identity >>"
        )
        cmap = _tounicode_cmap(
            {c: ch for ch, c in char2code.items()}
        )
        if compress:
            cmap = zlib.compress(cmap, 9)
            chead = (
                f"<< /Length {len(cmap)} /Filter /FlateDecode >>"
            ).encode()
        else:
            chead = f"<< /Length {len(cmap)} >>".encode()
        objs.append(chead + b"\nstream\n" + cmap + b"\nendstream")
    else:
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
    for i, text in enumerate(pages):
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /Resources "
                f"<< /Font << /F1 4 0 R >> >> "
                f"/MediaBox [0 0 612 792] /Contents "
                f"{base + 1 + 2 * i} 0 R >>"
            ).encode()
        )
        ops = ["BT", "/F1 11 Tf", "72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append("0 -14 Td")
            if type0:
                hexs = "".join(
                    f"{char2code[ch]:04x}" for ch in line
                )
                ops.append(f"<{hexs}> Tj")
            else:
                ops.append(f"({_esc(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", errors="replace")
        if compress:
            stream = zlib.compress(stream, 9)
            head = (
                f"<< /Length {len(stream)} /Filter /FlateDecode >>"
            ).encode()
        else:
            head = f"<< /Length {len(stream)} >>".encode()
        objs.append(head + b"\nstream\n" + stream + b"\nendstream")

    if objstm:
        return _assemble_objstm(objs)
    trailer_extra = b""
    if encrypt:
        objs, trailer_extra = _encrypt_objs(
            objs, encrypt_r, encrypt_metadata=encrypt_metadata
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Info 3 0 R "
        .encode() + trailer_extra + b">>\n"
        + f"startxref\n{xref_at}\n%%EOF\n".encode()
    )
    return bytes(out)


def _encrypt_strings(body: bytes, enc) -> bytes:
    """Re-encode every literal string of an object body as the HEX
    spelling of its ciphertext (hex is binary-safe; spec §7.6.2
    encrypts strings and streams alike).  ``enc`` is the per-object
    transform (RC4 or IV-prefixed AES-CBC)."""
    out = bytearray()
    i = 0
    while True:
        p = body.find(b"(", i)
        if p < 0:
            out += body[i:]
            return bytes(out)
        s, after = _read_literal(body, p + 1)
        out += body[i:p]
        out += b"<" + enc(s.encode("latin-1")).hex().encode() + b">"
        i = after


def _encrypt_objs(
    objs: list[bytes], r: int, encrypt_metadata: bool = True
) -> tuple[list[bytes], bytes]:
    """Standard-security-handler assembly step: encrypt every object's
    strings and stream data in place, append the (unencrypted)
    /Encrypt dictionary object, and return the trailer additions
    (/Encrypt ref + deterministic /ID).  ``r`` selects the handler
    revision: 2 = RC4-40, 3 = RC4-128, 4 = AESV2 (AES-128-CBC),
    6 = AESV3 (AES-256-CBC, the 2.B KDF)."""
    from minerva_etl_spark.operators.aes import (
        aes_cbc_encrypt,
        aes_ecb_encrypt_block,
    )

    p_flags = -4  # all content permissions, reserved bits per spec
    id0 = hashlib.md5(b"minerva-pdf-id:" + b"|".join(objs)).digest()
    p_le = (p_flags & 0xFFFFFFFF).to_bytes(4, "little")

    if r == 6:
        # AES-256: the file key is random in the wild; deterministic
        # here (fixture requirement), wrapped via Algorithm 8/9
        file_key = hashlib.sha256(b"minerva-aes256-key:" + id0).digest()
        vs = hashlib.md5(b"uv:" + id0).digest()[:8]
        ks = hashlib.md5(b"uk:" + id0).digest()[:8]
        u = _hash_2b(b"", vs) + vs + ks
        ue = aes_cbc_encrypt(
            _hash_2b(b"", ks), b"\x00" * 16, file_key, pad=False
        )
        ovs = hashlib.md5(b"ov:" + id0).digest()[:8]
        oks = hashlib.md5(b"ok:" + id0).digest()[:8]
        o = _hash_2b(b"owner", ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(
            _hash_2b(b"owner", oks, u), b"\x00" * 16, file_key,
            pad=False,
        )
        perms_blob = (
            p_le + b"\xff\xff\xff\xffTadb"
            + hashlib.md5(b"pr:" + id0).digest()[:4]
        )
        perms = aes_ecb_encrypt_block(file_key, perms_blob)

        def enc(num: int, data: bytes) -> bytes:
            iv = hashlib.md5(b"iv:%d:" % num + id0).digest()
            return iv + aes_cbc_encrypt(file_key, iv, data)

        enc_dict = (
            f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {p_flags} "
            "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            "/StmF /StdCF /StrF /StdCF ".encode()
            + b"/O <" + o.hex().encode() + b"> "
            + b"/U <" + u.hex().encode() + b"> "
            + b"/OE <" + oe.hex().encode() + b"> "
            + b"/UE <" + ue.hex().encode() + b"> "
            + b"/Perms <" + perms.hex().encode() + b"> >>"
        )
    else:
        key_len = 5 if r == 2 else 16
        o = _std_o_entry(b"owner", b"", min(r, 3), key_len)
        key = _std_file_key(
            o, p_flags, id0, min(r, 3), key_len,
            encrypt_metadata=encrypt_metadata or r < 4,
        )
        u = _std_u_entry(key, id0, min(r, 3))
        if r == 4:

            def enc(num: int, data: bytes) -> bytes:
                iv = hashlib.md5(b"iv:%d:" % num + id0).digest()
                return iv + aes_cbc_encrypt(
                    _obj_key_aesv2(key, num, 0), iv, data
                )

            em = (
                "" if encrypt_metadata else "/EncryptMetadata false "
            )
            enc_dict = (
                f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                f"/P {p_flags} {em}"
                "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                "/StmF /StdCF /StrF /StdCF ".encode()
                + b"/O <" + o.hex().encode() + b"> "
                + b"/U <" + u.hex().encode() + b"> >>"
            )
        else:

            def enc(num: int, data: bytes) -> bytes:
                return _rc4(_obj_key(key, num, 0), data)

            v = 1 if r == 2 else 2
            enc_dict = (
                f"<< /Filter /Standard /V {v} /R {r} "
                f"/Length {key_len * 8} /P {p_flags} "
            ).encode() + b"/O <" + o.hex().encode() + b"> " \
                + b"/U <" + u.hex().encode() + b"> >>"

    enc_objs = []
    for num, body in enumerate(objs, start=1):
        s = body.find(b"\nstream\n")
        if s >= 0:
            head, rest = body[:s], body[s + len(b"\nstream\n"):]
            data = enc(num, rest[: -len(b"\nendstream")])
            # AES grows the payload (IV + PKCS#7): rewrite /Length
            head = re.sub(
                rb"/Length \d+", b"/Length %d" % len(data), head, 1
            )
            enc_objs.append(head + b"\nstream\n" + data + b"\nendstream")
        else:
            enc_objs.append(_encrypt_strings(body, lambda d: enc(num, d)))
    enc_objs.append(enc_dict)
    trailer_extra = (
        f"/Encrypt {len(enc_objs)} 0 R ".encode()
        + b"/ID [<" + id0.hex().encode() + b"> <"
        + id0.hex().encode() + b">] "
    )
    return enc_objs, trailer_extra


def _assemble_objstm(objs: list[bytes]) -> bytes:
    """PDF 1.5 assembly: non-stream objects → one ``/ObjStm``; index →
    a cross-reference stream.  ``objs`` is the 1-indexed body list of
    :func:`synthesize_pdf` (object i+1 = objs[i]); stream objects are
    detected by their ``stream`` keyword and stay top-level."""
    n_total = len(objs)
    stm_num = n_total + 1  # the ObjStm object
    xref_num = n_total + 2  # the cross-reference stream object
    packed = [
        (i + 1, body) for i, body in enumerate(objs)
        if b"\nstream\n" not in body
    ]
    # ObjStm payload: header of "num offset" pairs, then the bodies
    # (offsets relative to /First, i.e. to the end of the header)
    bodies = bytearray()
    pairs = []
    inner_pos: dict[int, int] = {}  # obj num -> index within the ObjStm
    for idx, (num, body) in enumerate(packed):
        pairs.append(f"{num} {len(bodies)}")
        inner_pos[num] = idx
        bodies += body + b"\n"
    header = (" ".join(pairs) + "\n").encode()
    stm_data = zlib.compress(bytes(header + bodies), 9)
    stm_obj = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Length {len(stm_data)} /Filter /FlateDecode >>"
    ).encode() + b"\nstream\n" + stm_data + b"\nendstream"

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num, body in enumerate(objs, start=1):
        if num in inner_pos:
            continue  # lives inside the ObjStm
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    offsets[stm_num] = len(out)
    out += f"{stm_num} 0 obj\n".encode() + stm_obj + b"\nendobj\n"

    # cross-reference stream: /W [1 4 2] — (type, a, b) per object:
    # type 0 free, type 1 -> byte offset, type 2 -> (objstm, index).
    # 4-byte offsets so the index stays valid past 64 KiB payloads.
    xref_at = len(out)
    rows = bytearray()

    def xrow(t: int, a: int, b: int) -> None:
        rows.extend(
            bytes([t]) + a.to_bytes(4, "big") + b.to_bytes(2, "big")
        )

    xrow(0, 0, 0xFFFF)  # object 0: the free-list head
    for num in range(1, n_total + 1):
        if num in inner_pos:
            xrow(2, stm_num, inner_pos[num])
        else:
            xrow(1, offsets[num], 0)
    xrow(1, offsets[stm_num], 0)
    xrow(1, xref_at, 0)
    xref_data = zlib.compress(bytes(rows), 9)
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {xref_num + 1} "
        f"/W [1 4 2] /Index [0 {xref_num + 1}] /Root 1 0 R /Info 3 0 R "
        f"/Length {len(xref_data)} /Filter /FlateDecode >>"
    ).encode() + b"\nstream\n" + xref_data + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


# ----------------------------------------------------------------- read

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")


_STREAM_KW = re.compile(rb"\bstream\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)\b")


def _scan_objects(payload: bytes) -> dict[int, bytes]:
    """Tolerant SEQUENTIAL object scan: every ``N G obj .. endobj``
    body keyed by object number (later definitions win, matching
    incremental-update semantics where appended objects supersede).

    Stream bodies are skipped via their ``/Length`` so compressed
    bytes that happen to spell ``N 0 obj`` / ``endobj`` can neither
    register phantom objects nor truncate real ones (zlib output is
    arbitrary bytes — this WILL happen on a large corpus)."""
    objs, _, _ = _scan(payload)
    return objs


def _scan(
    payload: bytes,
) -> tuple[dict[int, bytes], bytes, dict[int, int]]:
    """The walk behind :func:`_scan_objects`, also returning a copy
    of the payload with every stream body zeroed — the safe haystack
    for whole-file greps like the trailer's ``/Info`` reference
    (grepping raw bytes would let compressed data spoof them) — and
    the GENERATION number of each surviving definition (encryption's
    per-object keys mix the gen in; revised real-world objects carry
    gen > 0)."""
    objs: dict[int, bytes] = {}
    gens: dict[int, int] = {}
    masked = bytearray(payload)
    pos = 0
    n = len(payload)
    while True:
        m = _OBJ_RE.search(payload, pos)
        if not m:
            break
        sm = _STREAM_KW.search(payload, m.end())
        em = payload.find(b"endobj", m.end())
        if sm is not None and (em < 0 or sm.start() < em):
            head = payload[m.end(): sm.start()]
            lm = _LENGTH_RE.search(head)
            data_start = sm.end()
            if payload[data_start: data_start + 2] == b"\r\n":
                data_start += 2
            elif payload[data_start: data_start + 1] in (b"\n", b"\r"):
                data_start += 1
            if lm:
                es = payload.find(
                    b"endstream", data_start + int(lm.group(1))
                )
            else:  # no direct /Length: fall back to the next keyword
                es = payload.find(b"endstream", data_start)
            em = payload.find(b"endobj", es if es >= 0 else data_start)
            stream_end = es if es >= 0 else (em if em >= 0 else n)
            masked[data_start:stream_end] = b"\x00" * (
                stream_end - data_start
            )
        body = payload[m.end(): em if em >= 0 else n]
        objs[int(m.group(1))] = body.strip()
        gens[int(m.group(1))] = int(m.group(2))
        pos = em + len(b"endobj") if em >= 0 else n
    return objs, bytes(masked), gens


def _string_value(d: bytes, key: bytes) -> bytes | None:
    """The raw BYTES of a name's string value — literal ``(..)`` with
    escapes decoded, or hex ``<..>`` — e.g. the /O and /U entries of
    an encryption dictionary."""
    m = re.search(re.escape(key) + rb"\s*(\(|<)", d)
    if not m:
        return None
    if m.group(1) == b"(":
        s, _ = _read_literal(d, m.end())
        return s.encode("latin-1")
    h = d[m.end(): d.find(b">", m.end())]
    h = re.sub(rb"\s", b"", h)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode())


def _resolve_crypt(
    objs: dict[int, bytes], masked: bytes, gens: dict[int, int]
):
    """Resolve the standard security handler from the trailer's
    /Encrypt reference: verify the EMPTY user password and return
    ``crypt(num, data)``.

    Supported: RC4 revisions 2/3 (/V 1-2), AESV2 (/V 4 /R 4,
    AES-128-CBC with the ``sAlT`` object keys), the /V 4 /CFM /V2
    RC4 spelling, and AESV3 (/V 5 /R 6, AES-256-CBC under the
    Algorithm 2.B KDF).  Honest boundaries: custom security
    handlers, crypt filters other than StdCF/Identity semantics, and
    files whose password check rejects the empty user password (a
    REAL password) raise NotImplementedError — inject a
    full-featured extractor for those.  Per-object keys mix in each
    object's GENERATION number from the scan (``gens``), so revised
    real-world objects (gen > 0, appended by incremental updates)
    decrypt correctly."""
    from minerva_etl_spark.operators.aes import aes_cbc_decrypt

    refs = re.findall(rb"/Encrypt\s+(\d+)\s+\d+\s+R", masked)
    if not refs:
        raise NotImplementedError(
            "encrypted PDF with unresolvable /Encrypt dictionary"
        )
    d = _dict_of(objs.get(int(refs[-1]), b""))
    if not re.search(rb"/Filter\s*/Standard\b", d):
        raise NotImplementedError(
            "non-standard PDF security handler — inject a "
            "full-featured extractor (pdfminer/PyMuPDF)"
        )
    vm = re.search(rb"/V\s+(\d+)", d)
    rm = re.search(rb"/R\s+(\d+)", d)
    v = int(vm.group(1)) if vm else 0
    r = int(rm.group(1)) if rm else 2
    o = _string_value(d, b"/O")
    u = _string_value(d, b"/U")
    pm = re.search(rb"/P\s+(-?\d+)", d)
    if o is None or u is None or pm is None:
        raise ValueError("malformed encryption dictionary")

    if v == 5 and r == 6:  # ---------------- AESV3 (AES-256)
        ue = _string_value(d, b"/UE")
        if ue is None or len(u) < 48:
            raise ValueError("malformed AESV3 encryption dictionary")
        vsalt, ksalt = u[32:40], u[40:48]
        if _hash_2b(b"", vsalt) != u[:32]:
            raise NotImplementedError(
                "PDF has a real (non-empty) user password — "
                "decryption without it is out of scope"
            )
        file_key = aes_cbc_decrypt(
            _hash_2b(b"", ksalt), b"\x00" * 16, ue[:32], unpad=False
        )

        def crypt(num: int, data: bytes) -> bytes:
            if len(data) < 16:
                raise ValueError("AES payload shorter than its IV")
            return aes_cbc_decrypt(file_key, data[:16], data[16:])

        return crypt

    if v in (1, 2, 4) and r in (2, 3, 4):  # ------ RC4 / AESV2
        aes_mode = False
        if v == 4:
            if re.search(rb"/AESV2\b", d):
                aes_mode = True
            elif not re.search(rb"/CFM\s*/V2\b", d):
                raise NotImplementedError(
                    "unsupported /V 4 crypt filter (not AESV2/V2)"
                )
        lm = re.search(rb"/Length\s+(\d+)", d)
        key_len = (int(lm.group(1)) // 8) if lm else 5
        if v == 4:
            key_len = 16
        im = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", masked)
        if im is None:
            raise ValueError("missing /ID for RC4/AESV2 decryption")
        id0 = bytes.fromhex(re.sub(rb"\s", b"", im.group(1)).decode())
        rr = min(r, 3)  # R4 derives keys exactly like R3 ...
        # ... except /EncryptMetadata false (R4 only) appends
        # 0xFFFFFFFF to the key hash; the flag only applies at R >= 4
        enc_meta = r < 4 or not re.search(
            rb"/EncryptMetadata\s+false\b", d
        )
        key = _std_file_key(
            o, int(pm.group(1)), id0, rr, key_len,
            encrypt_metadata=enc_meta,
        )
        expect = _std_u_entry(key, id0, rr)
        n_check = 16 if rr >= 3 else 32
        if u[:n_check] != expect[:n_check]:
            raise NotImplementedError(
                "PDF has a real (non-empty) user password — "
                "decryption without it is out of scope"
            )
        if aes_mode:

            def crypt(num: int, data: bytes) -> bytes:
                if len(data) < 16:
                    raise ValueError("AES payload shorter than its IV")
                return aes_cbc_decrypt(
                    _obj_key_aesv2(key, num, gens.get(num, 0)),
                    data[:16],
                    data[16:],
                )

        else:

            def crypt(num: int, data: bytes) -> bytes:
                return _rc4(
                    _obj_key(key, num, gens.get(num, 0)), data
                )

        return crypt

    raise NotImplementedError(
        f"PDF encryption V={v} R={r} — inject a full-featured "
        "extractor"
    )


def _expand_objstms(
    objs: dict[int, bytes], crypt=None
) -> tuple[dict[int, bytes], set[int]]:
    """Unpack every ``/Type /ObjStm`` object stream (PDF 1.5+) found
    by the tolerant scan into its embedded objects.  Also returns the
    set of object numbers that came FROM an ObjStm: their strings are
    covered by the stream's encryption and must not be decrypted
    again (spec §7.5.7).

    The xref stream is deliberately NOT consulted: the sequential scan
    already found every top-level object, and every ObjStm regardless
    of ``/Extends`` chains — unpacking them all is a superset of what
    any xref slice would select.  Precedence: a top-level definition
    of the same object number WINS over an ObjStm-embedded one
    (incremental updates append uncompressed objects to supersede
    compressed originals; the reverse — an appended ObjStm shadowing
    a top-level object — requires rewriting the whole file, at which
    point the old top-level object is gone anyway)."""
    out = dict(objs)
    expanded: set[int] = set()
    for num in sorted(objs):
        body = objs[num]
        d = _dict_of(body)
        if not re.search(rb"/Type\s*/ObjStm\b", d):
            continue
        nm = re.search(rb"/N\s+(\d+)\b", d)
        fm = re.search(rb"/First\s+(\d+)\b", d)
        if not (nm and fm):  # spec 7.5.7: /N and /First are direct
            raise ValueError(f"ObjStm {num} lacks direct /N or /First")
        data = _stream_data(body, num=num, crypt=crypt)
        first = int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * int(nm.group(1)):
            raise ValueError(f"ObjStm {num} header shorter than /N")
        nums = [int(x) for x in header[0 : 2 * int(nm.group(1)) : 2]]
        offs = [int(x) for x in header[1 : 2 * int(nm.group(1)) : 2]]
        bounds = offs[1:] + [len(data) - first]
        for onum, start, end in zip(nums, offs, bounds):
            if onum not in objs:  # top-level scan wins (see above)
                out[onum] = data[first + start : first + end].strip()
                expanded.add(onum)
    return out, expanded


def _dict_of(body: bytes) -> bytes:
    """The top-level ``<< .. >>`` dictionary of an object body."""
    start = body.find(b"<<")
    if start < 0:
        return b""
    depth = 0
    i = start
    while i < len(body) - 1:
        if body[i : i + 2] == b"<<":
            depth += 1
            i += 2
        elif body[i : i + 2] == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return body[start:i]
        else:
            i += 1
    return body[start:]


def _png_unpredict(
    data: bytes, columns: int, colors: int = 1, bpc: int = 8
) -> bytes:
    """Invert PNG predictors 10-15 over a decoded PDF stream (spec
    §7.4.4.4: one filter-type byte per row of ``columns`` samples) —
    the /DecodeParms layout real producers apply to ObjStm and XRef
    streams.  Shares the Paeth predictor with the real PNG codec."""
    from minerva_etl_spark.operators.multimodal import _paeth

    bpp = max(1, (colors * bpc) // 8)
    stride = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytes(stride)
    i = 0
    n = len(data)
    while i < n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + stride])
        i += 1 + stride
        for x in range(len(row)):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if ft == 0:
                continue_v = row[x]
            elif ft == 1:
                continue_v = row[x] + left
            elif ft == 2:
                continue_v = row[x] + up
            elif ft == 3:
                continue_v = row[x] + (left + up) // 2
            elif ft == 4:
                continue_v = row[x] + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG predictor filter {ft}")
            row[x] = continue_v & 0xFF
        out += row
        prev = bytes(row)
    return bytes(out)


_DECODEPARMS_RE = re.compile(
    rb"/(?:DecodeParms|DP)\s*<<(.*?)>>", re.S
)


def _apply_predictor(d: bytes, data: bytes) -> bytes:
    """Apply the /DecodeParms predictor of a stream dictionary to its
    POST-Flate bytes.  Predictor 1 / absent = identity; 2 (TIFF) is
    an honest reject; >= 10 = the PNG family above."""
    pm = _DECODEPARMS_RE.search(d)
    if not pm:
        return data
    parms = pm.group(1)
    pred = re.search(rb"/Predictor\s+(\d+)", parms)
    if not pred or int(pred.group(1)) <= 1:
        return data
    p = int(pred.group(1))
    if p < 10:
        raise NotImplementedError(
            f"TIFF predictor {p} — PNG predictors (10-15) and "
            "identity are supported"
        )
    cm = re.search(rb"/Columns\s+(\d+)", parms)
    km = re.search(rb"/Colors\s+(\d+)", parms)
    bm = re.search(rb"/BitsPerComponent\s+(\d+)", parms)
    return _png_unpredict(
        data,
        int(cm.group(1)) if cm else 1,
        int(km.group(1)) if km else 1,
        int(bm.group(1)) if bm else 8,
    )


def _stream_data(body: bytes, num: int = 0, crypt=None) -> bytes:
    d = _dict_of(body)
    s = body.find(b"stream")
    if s < 0:
        raise ValueError("content object has no stream")
    s += len(b"stream")
    if body[s : s + 2] == b"\r\n":
        s += 2
    elif body[s : s + 1] in (b"\n", b"\r"):
        s += 1
    lm = _LENGTH_RE.search(d)
    if lm:  # exact byte count — binary-safe even if the stream
        data = body[s: s + int(lm.group(1))]  # contains 'endstream'
    else:
        data = body[s: body.rfind(b"endstream")]
        if data.endswith(b"\n"):
            data = data[:-1]
    if crypt is not None:
        # decrypt BEFORE any filter (spec §7.6.2 order); a wrong key
        # surfaces as corrupt-Flate ValueError, never silent text
        data = crypt(num, data)
    if b"/Filter" in d:
        if b"/FlateDecode" not in d:
            raise NotImplementedError(
                "only FlateDecode content streams supported "
                "(inject a full-featured extractor for "
                "DCT/LZW/ASCII85 — see module docstring)"
            )
        try:
            data = zlib.decompress(data)
        except zlib.error as e:  # corrupt/truncated stream: surface
            raise ValueError(  # as the skippable dirty-payload class
                f"corrupt FlateDecode stream: {e}"
            ) from e
        data = _apply_predictor(d, data)
    return data


_STR_TOKEN = re.compile(rb"\(|<[0-9A-Fa-f\s]*>|\bTj\b|\bTJ\b|\bTd\b|"
                        rb"\bTD\b|\bT\*|'|\"|\bBT\b|\bET\b|\bTf\b|\[|\]|"
                        rb"/[^\s/<>\[\]()]+|-?\d+(?:\.\d+)?")

#: TJ adjustments are in thousandths of an em, NEGATIVE moving the
#: next glyph right-ward gap; beyond this magnitude real extractors
#: read a word break (pdfminer/pdftotext use the same order of
#: magnitude).  Numbers outside a TJ array (Td coords, font sizes)
#: are ignored by the in-array gate below.
_TJ_SPACE_GAP = -180.0

_OCTAL = re.compile(rb"^[0-7]{1,3}")


def _read_literal(data: bytes, i: int) -> tuple[str, int]:
    """Parse a literal string starting after ``(`` at ``i``; returns
    (decoded, index-after-closing-paren)."""
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            mapping = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                       b"b": b"\b", b"f": b"\f", b"(": b"(",
                       b")": b")", b"\\": b"\\"}
            if nxt in mapping:
                out += mapping[nxt]
                i += 2
                continue
            m = _OCTAL.match(data[i + 1 : i + 4])
            if m:
                out.append(int(m.group(0), 8) & 0xFF)
                i += 1 + len(m.group(0))
                continue
            if nxt in (b"\n", b"\r"):  # line continuation: both drop
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
                continue
            i += 1  # lone backslash before a non-escape char: drop
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
        out += c
        i += 1
    raise ValueError("unterminated PDF literal string")


_CMAP_HEX = re.compile(rb"<([0-9A-Fa-f]+)>")


def _utf16_hex(h: bytes) -> str:
    """A CMap destination hex token (UTF-16BE code units, surrogate
    pairs for non-BMP) to str."""
    if len(h) % 4:
        h = h.rjust((len(h) + 3) // 4 * 4, b"0")
    return bytes.fromhex(h.decode()).decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> dict:
    """Parse a /ToUnicode CMap stream (spec §9.10.3) into
    ``{"width": code-byte-width, "map": {code: str}}``.

    Covers ``bfchar`` entries, both ``bfrange`` destination forms
    (``<lo> <hi> <dstStart>`` increments the destination per spec;
    ``<lo> <hi> [<d1> <d2> ...]`` enumerates), and reads the code
    width off ``begincodespacerange`` (2 bytes for the ubiquitous
    Identity-H encoding)."""
    width = 2
    m = re.search(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    )
    if m:
        h = _CMAP_HEX.search(m.group(1))
        if h:
            width = max(1, (len(h.group(1)) + 1) // 2)
    cmap: dict[int, str] = {}
    for seg in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _CMAP_HEX.findall(seg.group(1))
        for j in range(0, len(toks) - 1, 2):
            cmap[int(toks[j], 16)] = _utf16_hex(toks[j + 1])
    ent = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
        rb"(<[0-9A-Fa-f]+>|\[[^\]]*\])"
    )
    for seg in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for e in ent.finditer(seg.group(1)):
            lo, hi = int(e.group(1), 16), int(e.group(2), 16)
            dst = e.group(3)
            if dst.startswith(b"["):
                for k, dh in enumerate(_CMAP_HEX.findall(dst)):
                    if lo + k > hi:
                        break
                    cmap[lo + k] = _utf16_hex(dh)
            else:
                dh = dst[1:-1]
                base = int(dh, 16)
                for k in range(hi - lo + 1):
                    cmap[lo + k] = _utf16_hex(
                        b"%0*x" % (len(dh), base + k)
                    )
    return {"width": width, "map": cmap}


def _decode_cid(raw: bytes, font: dict) -> str:
    """Decode a composite-font show string: fixed-width big-endian
    codes through the font's ToUnicode map.  Unmapped codes become
    U+FFFD — an EXPLICIT unknown, never silently wrong text."""
    w, m = font["width"], font["map"]
    return "".join(
        m.get(int.from_bytes(raw[i: i + w], "big"), "�")
        for i in range(0, len(raw) - w + 1, w)
    )


def _content_text(
    data: bytes, fonts: "dict[str, dict | None] | None" = None
) -> str:
    """Text-showing operators of one content stream, newline per line
    move.  Inside a ``TJ`` array, adjustment numbers beyond
    ``_TJ_SPACE_GAP`` emit a space — kerning-packed PDFs (a very
    common producer layout: one TJ per line, words separated only by
    negative adjustments) would otherwise extract with every word
    concatenated.  Gap positions are buffered and only become spaces
    when the array is actually terminated by a ``TJ`` operator — a
    negative number inside a non-TJ array (dash patterns, inline-image
    Decode arrays) must not inject phantom spaces.

    ``fonts`` maps resource font names (sans slash) to a CMap spec
    from :func:`_parse_tounicode` for /Type0 composite fonts, or
    ``None`` for simple fonts (latin-1 byte passthrough); the active
    font follows the ``Tf`` operator."""
    fonts = fonts or {}
    pending: list = []  # shown strings; None marks a TJ kerning gap
    line: list[str] = []
    lines: list[str] = []
    in_array = False
    cur: dict | None = None  # active composite-font CMap
    last_name: str | None = None
    i = 0
    n = len(data)

    def resolve(keep_gaps: bool) -> list[str]:
        out: list[str] = []
        for p in pending:
            if p is None:
                if keep_gaps and out and not out[-1].endswith(" "):
                    out.append(" ")
                continue
            out.append(p)
        return out

    def end_line():
        if line:
            lines.append("".join(line))
            line.clear()

    def push(raw: str):
        if cur is not None:
            pending.append(_decode_cid(raw.encode("latin-1"), cur))
        else:
            pending.append(raw)

    while i < n:
        m = _STR_TOKEN.search(data, i)
        if not m:
            break
        tok = m.group(0)
        if tok == b"(":
            s, i = _read_literal(data, m.end())
            push(s)
            continue
        i = m.end()
        if tok.startswith(b"<"):
            hexs = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            push(bytes.fromhex(hexs.decode()).decode("latin-1"))
        elif tok.startswith(b"/"):
            last_name = tok[1:].decode("latin-1")
        elif tok == b"Tf":
            cur = fonts.get(last_name)
        elif tok == b"[":
            in_array = True
        elif tok == b"]":
            in_array = False
        elif tok == b"Tj":
            line.extend(resolve(False))
            pending.clear()
        elif tok == b"TJ":
            line.extend(resolve(True))
            pending.clear()
        elif tok in (b"'", b'"'):
            end_line()
            line.extend(resolve(False))
            pending.clear()
        elif tok in (b"Td", b"TD", b"T*"):
            end_line()
            pending.clear()  # strings not yet shown don't render
        elif tok == b"ET":
            end_line()
            pending.clear()
        elif in_array:  # a candidate TJ adjustment number
            try:
                adj = float(tok)
            except ValueError:  # pragma: no cover - regex-guarded
                continue
            if adj <= _TJ_SPACE_GAP and pending and (
                pending[-1] is not None
            ):
                pending.append(None)
    end_line()
    return "\n".join(lines)


def _name_value(d: bytes, key: bytes) -> bytes | None:
    m = re.search(re.escape(key) + rb"\s*", d)
    if not m:
        return None
    return d[m.end():]


def _dict_value(
    objs: dict[int, bytes], container: bytes, key: bytes
) -> bytes | None:
    """The DICTIONARY value of ``key`` inside ``container`` — either
    inline ``<< ... >>`` (balanced extraction) or an indirect
    reference resolved through ``objs``."""
    rest = _name_value(container, key)
    if rest is None:
        return None
    if rest.startswith(b"<<"):
        return _dict_of(rest)
    r = _REF_RE.match(rest)
    if r and int(r.group(1)) in objs:
        return _dict_of(objs[int(r.group(1))])
    return None


_FONT_REF = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")


def _font_spec(objs: dict[int, bytes], num: int, crypt) -> dict | None:
    """``None`` for simple fonts (latin-1 byte passthrough); a CMap
    spec (:func:`_parse_tounicode`) for /Type0 composite fonts — the
    layout CJK documents and most modern generators (Word, LaTeX
    with fontspec) emit.  A Type0 font WITHOUT a usable /ToUnicode
    CMap decodes every code to U+FFFD: its codes are font-internal
    glyph ids, so replacement characters are the honest reading
    (explicit unknown, never silently wrong text)."""
    d = _dict_of(objs[num])
    if not re.search(rb"/Subtype\s*/Type0\b", d):
        return None
    tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", d)
    if tu is None or int(tu.group(1)) not in objs:
        return {"width": 2, "map": {}}
    tnum = int(tu.group(1))
    try:
        data = _stream_data(objs[tnum], num=tnum, crypt=crypt)
    except Exception:
        return {"width": 2, "map": {}}
    return _parse_tounicode(data)


def _page_fonts(
    objs: dict[int, bytes],
    page_dict: bytes,
    crypt,
    cache: dict[int, dict | None],
) -> dict[str, dict | None]:
    """Resolve a page's ``/Resources /Font`` dictionary (inline or
    indirect, either level) to ``{font_name: cmap_spec_or_None}`` for
    :func:`_content_text`.  Font entries must be indirect references
    (the universal producer layout); inline font dicts fall back to
    the simple-font path."""
    res = _dict_value(objs, page_dict, b"/Resources")
    if res is None:
        return {}
    fdict = _dict_value(objs, res, b"/Font")
    if fdict is None:
        return {}
    out: dict[str, dict | None] = {}
    for m in _FONT_REF.finditer(fdict):
        name, num = m.group(1).decode("latin-1"), int(m.group(2))
        if num not in objs:
            continue
        if num not in cache:
            cache[num] = _font_spec(objs, num, crypt)
        out[name] = cache[num]
    return out


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in page-tree order — the DEPTH-FIRST
    traversal of /Kids (the PDF spec's page order; a BFS would
    scramble multi-level trees, e.g. root [A, p3] with A = [p1, p2]
    must yield p1 p2 p3, not p3 p1 p2) — falling back to ascending
    object order when no tree resolves."""
    pages_in_tree: list[int] = []

    def is_type(body: bytes, t: bytes) -> bool:
        return re.search(rb"/Type\s*/" + t + rb"\b", _dict_of(body)) is not None

    roots = sorted(
        num for num, b in objs.items()
        if is_type(b, b"Pages") and b"/Parent" not in _dict_of(b)
    )
    stack = list(reversed(roots))
    seen = set()
    while stack:
        num = stack.pop()
        if num in seen or num not in objs:
            continue
        seen.add(num)
        d = _dict_of(objs[num])
        if is_type(objs[num], b"Page"):
            pages_in_tree.append(num)
            continue
        kids = _name_value(d, b"/Kids")
        if kids is not None:
            arr_end = kids.find(b"]")
            stack.extend(reversed(
                [int(g) for g in _REF_RE.findall(kids[: arr_end + 1])]
            ))
    if pages_in_tree:
        return pages_in_tree
    return sorted(n for n, b in objs.items() if is_type(b, b"Page"))


def pdf_info(payload: bytes) -> dict:
    """Document-metadata census over the trailer's /Info dictionary
    (r14): ``{title, author, created}`` with ``created`` parsed from
    the PDF date form (``D:YYYYMMDDHHMMSS...``) to ISO — the same
    Info-resolution rules as `pdf_extract_text` (LAST trailer wins,
    stream-masked greps, standard-security decryption), WITHOUT the
    page walk: a 100 TB provenance pass must not pay for content
    extraction."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    objs, masked, gens = _scan(payload)
    crypt = None
    if re.search(rb"/Encrypt\b", masked):
        crypt = _resolve_crypt(objs, masked, gens)
    objs, from_objstm = _expand_objstms(objs, crypt)
    out: dict = {"title": None, "author": None, "created": None}
    info_refs = re.findall(rb"/Info\s+(\d+)\s+\d+\s+R", masked)
    if not (info_refs and int(info_refs[-1]) in objs):
        return out
    inum = int(info_refs[-1])
    d = _dict_of(objs[inum])
    for key, name in (("title", b"/Title"), ("author", b"/Author"),
                      ("created", b"/CreationDate")):
        raw = _string_value(d, name)
        if raw is None:
            continue
        if crypt is not None and inum not in from_objstm:
            raw = crypt(inum, raw)
        out[key] = raw.decode("latin-1")
    if out["created"] is not None:
        m = re.match(r"^D:(\d{4})(\d{2})(\d{2})(\d{2})?(\d{2})?(\d{2})?",
                     out["created"])
        if m:
            y, mo, dd, hh, mi, ss = (
                g or "00" for g in m.groups()
            )
            out["created"] = f"{y}-{mo}-{dd} {hh}:{mi}:{ss}"
        else:
            out["created"] = None
    return out


def pdf_extract_text(payload: bytes) -> dict:
    """Parse one PDF payload → ``{n_pages, title, text, n_chars}``.

    Raises ``ValueError`` for non-PDF bytes and
    ``NotImplementedError`` for encrypted files or non-Flate content
    filters (see module docstring for the injection escape hatch).
    """
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    objs, masked, gens = _scan(payload)
    # ALL whole-file greps run over the stream-masked bytes —
    # compressed data spelling '/Encrypt' must not reject a valid PDF.
    # RC4 standard-security files with an EMPTY user password (the
    # "owner-restricted" crawl class) decrypt here; AES / real
    # passwords / custom handlers raise inside _resolve_crypt.
    crypt = None
    if re.search(rb"/Encrypt\b", masked):
        crypt = _resolve_crypt(objs, masked, gens)
    # PDF 1.5+: unpack /ObjStm object streams so compressed catalog/
    # page/Info objects are visible to the page-tree walk below (the
    # layout virtually all post-2005 producers emit); their strings
    # are covered by the stream decryption, never re-decrypted
    objs, from_objstm = _expand_objstms(objs, crypt)
    # title comes from the trailer's /Info dictionary (LAST trailer
    # wins — incremental updates append), never from the first object
    # that happens to carry a /Title: outline items and annotations
    # carry /Title too and routinely precede the Info dict.  The grep
    # runs over the STREAM-MASKED payload so compressed bytes cannot
    # spoof an /Info reference (the _scan_objects corruption class).
    title = None
    info_refs = re.findall(rb"/Info\s+(\d+)\s+\d+\s+R", masked)
    if info_refs and int(info_refs[-1]) in objs:
        inum = int(info_refs[-1])
        raw = _string_value(_dict_of(objs[inum]), b"/Title")
        if raw is not None:
            if crypt is not None and inum not in from_objstm:
                raw = crypt(inum, raw)  # strings encrypt like streams
            title = raw.decode("latin-1")
    order = _page_order(objs)
    if not order:
        # honest reject, not a silent empty document (ObjStm streams
        # are expanded above, so reaching here means the file really
        # carries no resolvable page objects)
        raise ValueError("PDF has no page objects")
    page_texts: list[str] = []
    font_cache: dict[int, dict | None] = {}
    for num in order:
        d = _dict_of(objs[num])
        cont = _name_value(d, b"/Contents")
        if cont is None:
            page_texts.append("")
            continue
        if cont.lstrip().startswith(b"["):
            arr_end = cont.find(b"]")
            refs = [int(g) for g in _REF_RE.findall(cont[: arr_end + 1])]
        else:
            m = _REF_RE.match(cont.lstrip())
            refs = [int(m.group(1))] if m else []
        data = b"\n".join(
            _stream_data(objs[r], num=r, crypt=crypt)
            for r in refs
            if r in objs
        )
        fonts = _page_fonts(objs, d, crypt, font_cache)
        page_texts.append(_content_text(data, fonts))
    text = "\n\n".join(page_texts)
    return {
        "n_pages": len(page_texts),
        "title": title,
        "text": text,
        "n_chars": len(text),
    }


PDF_EXTRACT_SCHEMA = (
    "doc_id bigint, n_pages int, title string, text string, n_chars int"
)


def pdf_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """PDF → text over a binary column: shuffle-free Arrow
    ``mapInPandas``, one in-task parse per payload.  The id column
    keeps its input NAME AND TYPE in the output (``member string``
    in → ``member string`` out — archive member names are natural
    string keys).  ``on_error='skip'`` drops undecodable payloads
    (dirty-corpus mode) instead of failing the job."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = PDF_EXTRACT_SCHEMA.replace("doc_id bigint", f"{id_col} {id_type}", 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    d = pdf_extract_text(bytes(p))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, d["n_pages"], d["title"], d["text"],
                     d["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_pages", "title", "text",
                         "n_chars"],
            )

    return docs.mapInPandas(run, schema=schema)
