"""OpenDocument text extraction — odt / ods / odp (round 15).

LibreOffice/OpenOffice corpora are real: public-sector crawls and
enterprise buckets carry OpenDocument next to OOXML, and an office
matrix without it silently drops that slice.  ODF (OASIS
OpenDocument v1.2, ISO/IEC 26300) is an OCF-style zip: a stored
``mimetype`` member first, ``content.xml`` with the body,
``meta.xml`` with provenance, ``META-INF/manifest.xml``.  One
namespace-aware ``content.xml`` walk covers all three document
classes:

* **odt** (``office:text``): ``text:p`` / ``text:h`` paragraphs in
  document order, joined by LF; ``text:tab``/``text:line-break``
  render as TAB/LF and ``text:s`` expands its ``text:c`` space run
  (the whitespace elements ODF uses instead of literal runs).
* **ods** (``office:spreadsheet``): per ``table:table`` the name on
  its own line, then rows with cells joined by TAB;
  ``office:value-type="float"`` cells render their lexical
  ``office:value`` (display text may be locale-formatted);
  ``table:number-columns-repeated`` expands (bounded), trailing empty
  cells trimmed — the `xlsx.py` rendering contract.
* **odp** (``office:presentation``): per ``draw:page`` every
  ``text:p`` inside its frames, pages separated like slides.

``title`` comes from ``meta.xml`` (``dc:title``); `odf_metadata`
additionally returns ``dc:creator`` and ``meta:creation-date`` for
the provenance census (`office.office_metadata`).

The writers synthesize conformant fixtures (mimetype STORED first,
per the OCF rule readers sniff by), so the gate oracle can rebuild
every rendering closed-form.

Scale shape: one Arrow ``mapInPandas`` scan via the office
dispatcher — per-payload zip inflate + one ElementTree walk, no
shuffle, no Python in any other path.

Reference parity: extension surface (the reference has no document
codecs); the format is the public OASIS spec.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

__all__ = [
    "synthesize_odt",
    "synthesize_ods",
    "synthesize_odp",
    "odf_extract_text",
    "odf_extract",
    "odf_metadata",
    "odf_is_encrypted",
    "odf_encryption_type",
    "encrypt_odf",
    "decrypt_odf",
    "sniff_odf",
    "ODF_EXTRACT_SCHEMA",
]

_NS_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
_NS_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_NS_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_NS_DRAW = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"
_NS_META = "urn:oasis:names:tc:opendocument:xmlns:meta:1.0"
_NS_DC = "http://purl.org/dc/elements/1.1/"
_NS_MANIFEST = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"

_MIME = {
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
}
_BODY_TAG = {
    "odt": f"{{{_NS_OFFICE}}}text",
    "ods": f"{{{_NS_OFFICE}}}spreadsheet",
    "odp": f"{{{_NS_OFFICE}}}presentation",
}
#: cap for table:number-columns-repeated expansion — ODF writers pad
#: sheets to 2^14/2^20 columns with one repeated empty cell; a text
#: render must not materialize that (bounded like every codec guard)
_MAX_REPEAT = 4096
_BODY_NAME = {"odt": "text", "ods": "spreadsheet",
              "odp": "presentation"}


def _meta_xml(
    title: str | None, author: str | None, created: str | None
) -> bytes:
    parts = []
    if title is not None:
        parts.append(f"<dc:title>{_esc(title)}</dc:title>")
    if author is not None:
        parts.append(f"<dc:creator>{_esc(author)}</dc:creator>")
    if created is not None:
        parts.append(
            "<meta:creation-date>"
            + created.replace(" ", "T")
            + "</meta:creation-date>"
        )
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-meta xmlns:office="{_NS_OFFICE}" '
        f'xmlns:meta="{_NS_META}" xmlns:dc="{_NS_DC}" '
        f'office:version="1.2"><office:meta>'
        + "".join(parts)
        + "</office:meta></office:document-meta>"
    ).encode()


def _esc(s: str) -> str:
    # also escapes '"': _esc is interpolated into ATTRIBUTE values
    # (table:name="..."), where a raw quote would truncate the attr
    return (
        s.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace('"', "&quot;")
    )



def _zwrite(
    zf: zipfile.ZipFile, name: str, data: bytes, stored: bool = False
) -> None:
    """Deterministic member write: a plain-string ``writestr`` stamps
    the CURRENT local time into the zip header (bytes then differ
    across a second boundary — a real flake the r16 determinism
    asserts caught), so every ODF writer goes through a fixed-epoch
    ``ZipInfo``."""
    zf.writestr(
        zipfile.ZipInfo(name), data,
        compress_type=(
            zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
        ),
    )


def _package(kind: str, content: bytes, meta: bytes) -> bytes:
    manifest = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<manifest:manifest xmlns:manifest="{_NS_MANIFEST}" '
        f'manifest:version="1.2">'
        f'<manifest:file-entry manifest:full-path="/" '
        f'manifest:media-type="{_MIME[kind]}"/>'
        f'<manifest:file-entry manifest:full-path="content.xml" '
        f'manifest:media-type="text/xml"/>'
        f'<manifest:file-entry manifest:full-path="meta.xml" '
        f'manifest:media-type="text/xml"/>'
        f"</manifest:manifest>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        # OCF rule: mimetype FIRST and STORED so byte-level sniffers
        # can read it without inflating
        _zwrite(zf, "mimetype", _MIME[kind].encode(), stored=True)
        _zwrite(zf, "content.xml", content)
        _zwrite(zf, "meta.xml", meta)
        _zwrite(zf, "META-INF/manifest.xml", manifest)
    return buf.getvalue()


def _content_head(kind: str) -> str:
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_NS_OFFICE}" '
        f'xmlns:text="{_NS_TEXT}" xmlns:table="{_NS_TABLE}" '
        f'xmlns:draw="{_NS_DRAW}" office:version="1.2">'
        f"<office:body><office:{_BODY_NAME[kind]}>"
    )


def synthesize_odt(
    paragraphs: list[str],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Minimal conformant .odt; every 3rd paragraph exercises the
    whitespace elements (tab + expanded space run)."""
    body = []
    for i, p in enumerate(paragraphs):
        if i % 3 == 2 and "\t" not in p:
            # route one TAB + a 2-space run through the markup forms
            body.append(
                "<text:p>" + _esc(p) + "<text:tab/>tail"
                '<text:s text:c="2"/>end</text:p>'
            )
        else:
            body.append("<text:p>" + _esc(p) + "</text:p>")
    content = (
        _content_head("odt") + "".join(body)
        + "</office:text></office:body></office:document-content>"
    ).encode()
    return _package(
        "odt", content, _meta_xml(title, author, created)
    )


def synthesize_ods(
    sheets: list[tuple[str, list[list[str]]]],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Minimal conformant .ods: integer-looking cells become real
    ``office:value-type="float"`` cells (lexical office:value),
    everything else string cells."""
    body = []
    for name, rows in sheets:
        body.append(f'<table:table table:name="{_esc(name)}">')
        for row in rows:
            body.append("<table:table-row>")
            for val in row:
                try:
                    iv = int(val)
                    is_int = str(iv) == val
                except ValueError:
                    is_int = False
                if is_int:
                    body.append(
                        f'<table:table-cell office:value-type="float"'
                        f' office:value="{iv}"><text:p>{iv}</text:p>'
                        f"</table:table-cell>"
                    )
                else:
                    body.append(
                        '<table:table-cell office:value-type='
                        '"string"><text:p>' + _esc(val)
                        + "</text:p></table:table-cell>"
                    )
            body.append("</table:table-row>")
        body.append("</table:table>")
    content = (
        _content_head("ods") + "".join(body)
        + "</office:spreadsheet></office:body>"
        "</office:document-content>"
    ).encode()
    return _package(
        "ods", content, _meta_xml(title, author, created)
    )


def synthesize_odp(
    slides: list[list[str]],
    title: str | None = None,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Minimal conformant .odp: one draw:page per slide, paragraphs
    inside a draw:frame/draw:text-box."""
    body = []
    for k, paras in enumerate(slides):
        body.append(f'<draw:page draw:name="page{k + 1}">')
        body.append("<draw:frame><draw:text-box>")
        for p in paras:
            body.append("<text:p>" + _esc(p) + "</text:p>")
        body.append("</draw:text-box></draw:frame></draw:page>")
    content = (
        _content_head("odp") + "".join(body)
        + "</office:presentation></office:body>"
        "</office:document-content>"
    ).encode()
    return _package(
        "odp", content, _meta_xml(title, author, created)
    )


def sniff_odf(names: set, zf: zipfile.ZipFile) -> str | None:
    """``'odt' | 'ods' | 'odp' | None`` for an already-opened zip:
    the stored ``mimetype`` member when present (the OCF rule), else
    the ``content.xml`` body element."""
    if "mimetype" in names:
        try:
            mt = zf.read("mimetype").decode("ascii", "replace").strip()
        except Exception:  # noqa: BLE001 — malformed member: fall through
            mt = ""
        for kind, mime in _MIME.items():
            if mt == mime:
                return kind
    if "content.xml" in names:
        try:
            root = ET.fromstring(zf.read("content.xml"))
        except Exception:  # noqa: BLE001 — torn member (BadZipFile/
            return None  # zlib.error/CRC) or non-XML: not sniffable
        body = root.find(f"{{{_NS_OFFICE}}}body")
        if body is not None:
            for kind, tag in _BODY_TAG.items():
                if body.find(tag) is not None:
                    return kind
    return None


def odf_is_encrypted(payload: bytes) -> bool:
    """True when the OCF manifest declares ``manifest:encryption-data``
    for any entry — LibreOffice password protection (PBKDF2 +
    Blowfish/AES per member).  Those files carry a REAL user password
    (no default-password convention exists for ODF), so the honest
    move is a ``locked`` census tag, never a garbage inflate."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        if "META-INF/manifest.xml" not in zf.namelist():
            return False
        root = ET.fromstring(zf.read("META-INF/manifest.xml"))
    except (zipfile.BadZipFile, ET.ParseError, KeyError):
        return False
    return any(
        el.tag == f"{{{_NS_MANIFEST}}}encryption-data"
        for el in root.iter()
    )


def _para_text(p) -> str:
    """One text:p / text:h rendered with the ODF whitespace
    elements."""
    out = []
    if p.text:
        out.append(p.text)
    for el in p:
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "tab":
            out.append("\t")
        elif tag == "line-break":
            out.append("\n")
        elif tag == "s":
            n = int(el.get(f"{{{_NS_TEXT}}}c", "1") or "1")
            out.append(" " * min(n, _MAX_REPEAT))
        else:  # spans etc: recurse
            out.append(_para_text(el))
        if el.tail:
            out.append(el.tail)
    return "".join(out)


def odf_extract_text(payload: bytes) -> dict:
    """One ODF payload → ``{format, title, text, n_chars}`` (the
    office dispatch contract plus the detected class — callers that
    already dispatched may ignore it).  Raises ``ValueError`` for
    non-ODF zips, encrypted manifests, and malformed XML."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not a zip payload: {e}") from e
    names = set(zf.namelist())
    kind = sniff_odf(names, zf)
    if kind is None:
        raise ValueError(
            "zip without an OpenDocument mimetype/content.xml"
        )
    if odf_is_encrypted(payload):
        raise ValueError(
            "password-protected OpenDocument (manifest "
            "encryption-data — real user password, tagged locked)"
        )
    try:
        root = ET.fromstring(zf.read("content.xml"))
    except KeyError as e:
        # mimetype declared ODF but the zip carries no content.xml
        raise ValueError("OpenDocument without content.xml") from e
    except Exception as e:  # torn member / CRC / non-XML
        raise ValueError(f"malformed content.xml: {e}") from e
    body = root.find(f"{{{_NS_OFFICE}}}body")
    host = body.find(_BODY_TAG[kind]) if body is not None else None
    if host is None:
        raise ValueError("content.xml without the expected body")
    blocks: list[str] = []
    if kind == "odt":
        for p in host.iter():
            if p.tag in (f"{{{_NS_TEXT}}}p", f"{{{_NS_TEXT}}}h"):
                blocks.append(_para_text(p))
    elif kind == "ods":
        for table in host.findall(f"{{{_NS_TABLE}}}table"):
            rows_out = []
            for row in table.findall(f"{{{_NS_TABLE}}}table-row"):
                cells = []
                for cell in row.findall(
                    f"{{{_NS_TABLE}}}table-cell"
                ):
                    rep = int(
                        cell.get(
                            f"{{{_NS_TABLE}}}number-columns-repeated",
                            "1",
                        )
                        or "1"
                    )
                    vtype = cell.get(f"{{{_NS_OFFICE}}}value-type")
                    if vtype in ("float", "currency", "percentage"):
                        v = cell.get(f"{{{_NS_OFFICE}}}value", "")
                    else:
                        v = "\n".join(
                            _para_text(p)
                            for p in cell.findall(
                                f"{{{_NS_TEXT}}}p"
                            )
                        )
                    cells.extend([v] * min(rep, _MAX_REPEAT))
                while cells and cells[-1] == "":
                    cells.pop()  # trailing padded columns
                rows_out.append("\t".join(cells))
            while rows_out and rows_out[-1] == "":
                rows_out.pop()
            name = table.get(f"{{{_NS_TABLE}}}name", "")
            blocks.append(
                name + ("\n" + "\n".join(rows_out) if rows_out else "")
            )
    else:  # odp
        for page in host.findall(f"{{{_NS_DRAW}}}page"):
            paras = [
                _para_text(p)
                for p in page.iter()
                if p.tag == f"{{{_NS_TEXT}}}p"
            ]
            blocks.append("\n".join(paras))
    text = "\n".join(blocks)
    title = odf_metadata(payload, zf=zf, names=names)["title"]
    return {"format": kind, "title": title, "text": text,
            "n_chars": len(text)}


ODF_EXTRACT_SCHEMA = (
    "doc_id bigint, format string, title string, text string, "
    "n_chars int"
)


def odf_extract(
    docs,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
):
    """OpenDocument binary column → ``(id, format, title, text,
    n_chars)`` — the per-codec DataFrame operator every document
    format here exposes (one Arrow scan; the mixed-format road is
    `office.office_extract`)."""
    from typing import Iterator

    import pandas as pd

    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = ODF_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: "Iterator[pd.DataFrame]"):
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = odf_extract_text(bytes(payload))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, rec["format"], rec["title"], rec["text"],
                     rec["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "title", "text",
                         "n_chars"],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


def odf_metadata(
    payload: bytes,
    zf: zipfile.ZipFile | None = None,
    names: set | None = None,
) -> dict:
    """``{title, author, created}`` from meta.xml (NULLs when the
    member or element is absent — the provenance-census contract)."""
    if zf is None:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        names = set(zf.namelist())
    out = {"title": None, "author": None, "created": None}
    if "meta.xml" not in names:
        return out
    try:
        root = ET.fromstring(zf.read("meta.xml"))
    except Exception:  # noqa: BLE001 — torn member or non-XML:
        return out  # provenance is NULL, never an error
    for el in root.iter():
        if el.tag == f"{{{_NS_DC}}}title":
            out["title"] = el.text
        elif el.tag == f"{{{_NS_DC}}}creator":
            out["author"] = el.text
        elif el.tag == f"{{{_NS_META}}}creation-date" and el.text:
            out["created"] = (
                el.text.replace("T", " ").rstrip("Z")[:19]
            )
    return out


# =====================================================================
# ODF package encryption (OASIS ODF 1.2 Part 3 §3.4) — round 16
# =====================================================================
# LibreOffice/OpenOffice password protection is PER-MEMBER: each
# protected zip member is raw-DEFLATEd, then encrypted, then STORED,
# and the manifest's <manifest:encryption-data> records everything a
# reader needs — checksum (over the first 1K of the still-compressed
# plaintext, the password check), algorithm + IV, PBKDF2 salt /
# iteration count / key size, and the start-key generation (the
# password is hashed once, SHA-1 or SHA-256, before PBKDF2).  Two
# published cipher profiles exist: legacy "Blowfish CFB" (8-bit
# feedback, `operators/blowfish.py`) and the ODF 1.2
# xmlenc#aes256-cbc profile (W3C padding) — both decrypt here.
# Unlike the Excel world there is NO default-password convention, so
# the decrypt dispatcher only opens these when the caller SUPPLIES a
# password; otherwise they stay honest `locked` census rows.

_XMLENC_AES = {
    "http://www.w3.org/2001/04/xmlenc#aes256-cbc": 32,
    "http://www.w3.org/2001/04/xmlenc#aes192-cbc": 24,
    "http://www.w3.org/2001/04/xmlenc#aes128-cbc": 16,
}
_M = f"{{{_NS_MANIFEST}}}"


class _Mf:
    """One manifest encryption-data record."""

    __slots__ = ("checksum_type", "checksum", "algo", "iv", "salt",
                 "iterations", "key_size", "start_key", "size")


def _manifest_encryption(root) -> dict:
    """full-path → :class:`_Mf` for every encrypted entry."""
    import base64

    out = {}
    for fe in root.iter(f"{_M}file-entry"):
        ed = fe.find(f"{_M}encryption-data")
        if ed is None:
            continue
        rec = _Mf()
        rec.size = fe.get(f"{_M}size")
        rec.size = int(rec.size) if rec.size is not None else None
        rec.checksum_type = ed.get(f"{_M}checksum-type", "")
        rec.checksum = base64.b64decode(ed.get(f"{_M}checksum", ""))
        alg = ed.find(f"{_M}algorithm")
        kd = ed.find(f"{_M}key-derivation")
        if alg is None or kd is None:
            raise ValueError(
                "encryption-data without algorithm/key-derivation"
            )
        rec.algo = alg.get(f"{_M}algorithm-name", "")
        rec.iv = base64.b64decode(
            alg.get(f"{_M}initialisation-vector", "")
        )
        kd_name = kd.get(f"{_M}key-derivation-name", "")
        if "PBKDF2" not in kd_name and "pbkdf2" not in kd_name:
            raise ValueError(
                f"unsupported key derivation {kd_name!r}"
            )
        rec.salt = base64.b64decode(kd.get(f"{_M}salt", ""))
        rec.iterations = int(kd.get(f"{_M}iteration-count", "1024"))
        rec.key_size = int(kd.get(f"{_M}key-size", "16"))
        skg = ed.find(f"{_M}start-key-generation")
        rec.start_key = (
            skg.get(f"{_M}start-key-generation-name", "SHA1")
            if skg is not None
            else "SHA1"
        )
        out[fe.get(f"{_M}full-path")] = rec
    return out


def odf_encryption_type(payload: bytes) -> str | None:
    """``'blowfish' | 'aes' | 'unknown' | None`` — the census tag
    helper (one manifest peek, no key work).  ``'unknown'`` means
    the manifest DECLARES encryption-data but the record is
    malformed or unrecognized: still an encrypted document (the
    dispatcher's decrypt attempt will name-reject it into a locked
    row), never silently "not encrypted"."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        root = ET.fromstring(zf.read("META-INF/manifest.xml"))
    except Exception:  # noqa: BLE001 — dirty zips: not encrypted ODF
        return None
    try:
        recs = _manifest_encryption(root)
    except ValueError:
        recs = None
    if recs:
        for rec in recs.values():
            return "blowfish" if "Blowfish" in rec.algo else "aes"
    if any(el.tag == f"{_M}encryption-data" for el in root.iter()):
        return "unknown"
    return None


def _start_key(password: str, gen_name: str) -> bytes:
    import hashlib

    if gen_name.endswith("sha256"):
        return hashlib.sha256(password.encode("utf-8")).digest()
    if gen_name == "SHA1" or gen_name.endswith("sha1"):
        return hashlib.sha1(password.encode("utf-8")).digest()
    raise ValueError(f"unsupported start-key generation {gen_name!r}")


def _member_checksum(kind: str, deflated: bytes) -> bytes:
    import hashlib

    algo = "sha256" if "sha256" in kind.lower() else "sha1"
    window = deflated[:1024] if "1k" in kind.lower() else deflated
    return hashlib.new(algo, window).digest()


def decrypt_odf(payload: bytes, password: str) -> bytes:
    """Password-protected ODF package → the plaintext package (all
    members decrypted + inflated, encryption-data stripped from the
    manifest) ready for :func:`odf_extract_text`.  The per-member
    checksum is the password check: a mismatch raises
    ``WrongPasswordError`` before any inflate touches wrong-key
    bytes.  Unsupported algorithms raise named ``ValueError``."""
    import hashlib
    import zlib

    from minerva_etl_spark.operators.blowfish import (
        blowfish_cfb8_decrypt,
    )
    from minerva_etl_spark.operators.offcrypto import (
        WrongPasswordError,
        aes_cbc_decrypt,
    )

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        man_root = ET.fromstring(zf.read("META-INF/manifest.xml"))
    except Exception as e:  # noqa: BLE001
        raise ValueError(f"not an ODF package: {e}") from e
    recs = _manifest_encryption(man_root)
    if not recs:
        raise ValueError("package is not encrypted (no "
                         "encryption-data in the manifest)")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
        for info in zf.infolist():
            name = info.filename
            data = zf.read(name)
            if name == "mimetype":
                _zwrite(out, "mimetype", data, stored=True)
                continue
            if name == "META-INF/manifest.xml":
                continue  # rewritten below, scrubbed
            rec = recs.get(name)
            if rec is None:
                _zwrite(out, name, data)
                continue
            key = hashlib.pbkdf2_hmac(
                "sha1",
                _start_key(password, rec.start_key),
                rec.salt, rec.iterations, rec.key_size,
            )
            if "Blowfish" in rec.algo or rec.algo.endswith(
                "#blowfish"
            ):
                deflated = blowfish_cfb8_decrypt(key, rec.iv, data)
            elif rec.algo in _XMLENC_AES:
                if len(key) != _XMLENC_AES[rec.algo]:
                    raise ValueError(
                        f"key size {len(key)} does not match "
                        f"{rec.algo}"
                    )
                plain = aes_cbc_decrypt(key, rec.iv, data)
                pad = plain[-1] if plain else 0
                if not 1 <= pad <= 16:
                    raise WrongPasswordError(
                        "invalid xmlenc padding — wrong password"
                    )
                deflated = plain[:-pad]
            else:
                raise ValueError(
                    f"unsupported ODF cipher {rec.algo!r}"
                )
            if _member_checksum(
                rec.checksum_type, deflated
            ) != rec.checksum:
                raise WrongPasswordError(
                    f"checksum mismatch on {name} — wrong password"
                )
            plaintext = zlib.decompress(deflated, -15)
            if rec.size is not None and len(plaintext) != rec.size:
                raise ValueError(
                    f"{name}: inflated {len(plaintext)} bytes, "
                    f"manifest declares {rec.size}"
                )
            _zwrite(out, name, plaintext)
        # scrub encryption-data from the manifest so downstream
        # readers see a plain package (manifest:size stays — it
        # records the plaintext size, which is still correct)
        for fe in man_root.iter(f"{_M}file-entry"):
            ed = fe.find(f"{_M}encryption-data")
            if ed is not None:
                fe.remove(ed)
        ET.register_namespace("manifest", _NS_MANIFEST)
        _zwrite(
            out,
            "META-INF/manifest.xml",
            ET.tostring(man_root, xml_declaration=True,
                        encoding="UTF-8"),
        )
    return buf.getvalue()


def encrypt_odf(
    payload: bytes,
    password: str,
    cipher: str = "blowfish",
    iterations: int = 1024,
    seed: bytes | None = None,
) -> bytes:
    """Password-protect a plaintext ODF package per ODF 1.2 §3.4 —
    the fixture-writer twin of :func:`decrypt_odf` (every member
    except ``mimetype`` and the manifest is deflated → encrypted →
    STORED; the manifest gains per-member encryption-data).
    ``cipher``: ``'blowfish'`` (legacy OOo, SHA-1 start key) or
    ``'aes256'`` (ODF 1.2, SHA-256 start key).  Deterministic via
    ``seed``."""
    import base64
    import hashlib
    import zlib

    from minerva_etl_spark.operators.blowfish import (
        blowfish_cfb8_encrypt,
    )
    from minerva_etl_spark.operators.offcrypto import aes_cbc_encrypt

    if cipher not in ("blowfish", "aes256"):
        raise ValueError(f"unsupported cipher {cipher!r}")
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = set(zf.namelist())
    if sniff_odf(names, zf) is None:
        raise ValueError("encrypt_odf expects an ODF package")
    if odf_is_encrypted(payload):
        raise ValueError("package is already encrypted")
    seed = seed or hashlib.sha1(b"odf-fixture" + payload).digest()
    b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
    entries = [
        f'<manifest:file-entry manifest:full-path="/" '
        f'manifest:media-type="'
        + zf.read("mimetype").decode("ascii")
        + '"/>'
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        _zwrite(out, "mimetype", zf.read("mimetype"), stored=True)
        for info in zf.infolist():
            name = info.filename
            if name in ("mimetype", "META-INF/manifest.xml"):
                continue
            data = zf.read(name)
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            deflated = comp.compress(data) + comp.flush()
            salt = hashlib.sha1(
                seed + name.encode() + b"salt"
            ).digest()[:16]
            if cipher == "blowfish":
                iv = hashlib.sha1(
                    seed + name.encode() + b"iv"
                ).digest()[:8]
                key = hashlib.pbkdf2_hmac(
                    "sha1",
                    hashlib.sha1(password.encode("utf-8")).digest(),
                    salt, iterations, 16,
                )
                ct = blowfish_cfb8_encrypt(key, iv, deflated)
                algo = (
                    f'manifest:algorithm-name="Blowfish CFB" '
                    f'manifest:initialisation-vector="{b64(iv)}"'
                )
                cksum_type = "SHA1/1K"
                cksum = hashlib.sha1(deflated[:1024]).digest()
                skg = "SHA1"
                key_size = 16
            else:
                iv = hashlib.sha1(
                    seed + name.encode() + b"iv16"
                ).digest()[:16]
                key = hashlib.pbkdf2_hmac(
                    "sha1",
                    hashlib.sha256(password.encode("utf-8")).digest(),
                    salt, iterations, 32,
                )
                pad = 16 - len(deflated) % 16
                padded = deflated + b"\x00" * (pad - 1) + bytes([pad])
                ct = aes_cbc_encrypt(key, iv, padded)
                algo = (
                    'manifest:algorithm-name='
                    '"http://www.w3.org/2001/04/xmlenc#aes256-cbc" '
                    f'manifest:initialisation-vector="{b64(iv)}"'
                )
                cksum_type = (
                    "urn:oasis:names:tc:opendocument:xmlns:"
                    "manifest:1.0#sha256-1k"
                )
                cksum = hashlib.sha256(deflated[:1024]).digest()
                skg = "http://www.w3.org/2000/09/xmldsig#sha256"
                key_size = 32
            _zwrite(out, name, ct, stored=True)
            media = "text/xml" if name.endswith(".xml") else ""
            entries.append(
                f'<manifest:file-entry manifest:full-path='
                f'"{_esc(name)}" manifest:media-type="{media}" '
                f'manifest:size="{len(data)}">'
                f'<manifest:encryption-data '
                f'manifest:checksum-type="{cksum_type}" '
                f'manifest:checksum="{b64(cksum)}">'
                f"<manifest:algorithm {algo}/>"
                f'<manifest:key-derivation '
                f'manifest:key-derivation-name="PBKDF2" '
                f'manifest:key-size="{key_size}" '
                f'manifest:iteration-count="{iterations}" '
                f'manifest:salt="{b64(salt)}"/>'
                f'<manifest:start-key-generation '
                f'manifest:start-key-generation-name="{skg}" '
                f'manifest:key-size='
                f'"{32 if cipher == "aes256" else 20}"/>'
                f"</manifest:encryption-data></manifest:file-entry>"
            )
        manifest = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<manifest:manifest xmlns:manifest="{_NS_MANIFEST}" '
            f'manifest:version="1.2">' + "".join(entries)
            + "</manifest:manifest>"
        ).encode()
        _zwrite(out, "META-INF/manifest.xml", manifest)
    return buf.getvalue()
