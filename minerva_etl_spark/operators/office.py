"""Mixed-format document extraction — magic-byte routing over a
binary column (round 12).

A real crawl's "documents" bucket is never pre-sorted by format: one
binary column holds PDFs next to DOCX next to EPUB next to legacy
.doc.  This module is the dispatch edge over the document codecs
(`operators/pdf.py`, `docx.py`, `epub.py`, `rtf.py`, `xlsx.py`,
`pptx.py`, `msdoc.py`) — the same pattern
`multimodal.image_features` uses for mixed PNG/JPEG columns: sniff
each payload's magic bytes IN-TASK and route it to the right parser,
emitting one unified schema ``(id, format, title, text, n_chars)``.

Sniffing rules (cheap, prefix-only — no speculative full parses):

* ``%PDF-`` prefix → ``pdf``; ``{\rtf`` prefix → ``rtf``.
* ZIP (``PK\\x03\\x04``) → peek the entry list once:
  ``word/document.xml`` → ``docx``; ``xl/workbook.xml`` → ``xlsx``;
  ``ppt/presentation.xml`` → ``pptx``; ``META-INF/container.xml`` or
  a first-entry ``mimetype`` of ``application/epub+zip`` → ``epub``.
* OLE2/CFB (``D0 CF 11 E0``) → peek the directory once (r13, the r12
  verdict's ask 6): a ``WordDocument`` stream → ``doc`` (the MS-DOC
  piece table, `operators/msdoc.py`), ``Workbook``/``Book`` →
  ``xls`` (BIFF8 records, `operators/xls.py`),
  ``PowerPoint Document`` → ``ppt`` (record-tree text atoms,
  `operators/ppt.py`); any other compound file (msi, password-
  protected OOXML) → ``ole2`` — TAGGED distinct from ``unknown`` so
  a corpus report can count the backlog, but not extracted (honest
  ValueError).
* anything else → ``unknown`` (ValueError under ``on_error='fail'``,
  dropped under ``'skip'`` — the codec contract).

One Arrow ``mapInPandas`` pass, no shuffle; per-payload cost is the
underlying codec's.  At 100 TB this is the shape you want: the format
mix is decided per row inside the scan, so a 90%-PDF corpus never
pays a DOCX parse attempt, and adding a codec is one sniff branch.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from minerva_etl_spark.errors import (
    malformed_payload_guard as _guarded,
)

__all__ = [
    "sniff_document_format",
    "office_extract",
    "office_decrypt_extract",
    "office_metadata",
    "format_census",
    "OFFICE_SCHEMA",
    "OFFICE_DECRYPT_SCHEMA",
    "OFFICE_METADATA_SCHEMA",
]


def sniff_document_format(payload: bytes) -> str:
    """``'pdf' | 'docx' | 'xlsx' | 'xlsb' | 'pptx' | 'epub' | 'odt' |
    'ods' | 'odp' | 'rtf' | 'doc' | 'xls' | 'ppt' | 'msg' |
    'ooxml_encrypted' | 'ole2' | 'unknown'`` from magic bytes (see
    module doc).  CFB sniffing looks at TOP-LEVEL directory entries
    only, so nested attachment storages never masquerade as the
    container's own format; OpenDocument sniffs by the stored
    ``mimetype`` member (the OCF rule) with a content.xml body-element
    fallback."""
    if payload[:5] == b"%PDF-":
        return "pdf"
    if payload[:5] == b"{\\rtf":
        return "rtf"
    if payload[:4] == b"\xd0\xcf\x11\xe0":
        from minerva_etl_spark.operators.msdoc import (
            cfb_top_level_streams,
        )

        try:
            # TOP-LEVEL streams only (r14): a .msg whose OLE-embedded
            # attachment carries a nested WordDocument/Workbook must
            # still sniff as 'msg', not as the attachment's format.
            streams = set(cfb_top_level_streams(payload))
        except ValueError:
            return "unknown"
        if any(s.startswith("__substg1.0_") for s in streams):
            return "msg"
        if "EncryptionInfo" in streams and "EncryptedPackage" in streams:
            # password-protected OOXML (MS-OFFCRYPTO): a CFB wrapper
            # around the encrypted zip — distinct from generic ole2
            # so format_census can count the decryption backlog.
            return "ooxml_encrypted"
        if "WordDocument" in streams:
            return "doc"
        if "Workbook" in streams or "Book" in streams:
            return "xls"
        if "PowerPoint Document" in streams:
            return "ppt"
        return "ole2"
    if payload[:4] == b"PK\x03\x04":
        try:
            zf = zipfile.ZipFile(io.BytesIO(payload))
        except zipfile.BadZipFile:
            return "unknown"
        names = set(zf.namelist())
        if "word/document.xml" in names:
            return "docx"
        if "xl/workbook.xml" in names:
            return "xlsx"
        if "xl/workbook.bin" in names:
            return "xlsb"
        if "ppt/presentation.xml" in names:
            return "pptx"
        if "META-INF/container.xml" in names:
            return "epub"
        from minerva_etl_spark.operators.odf import sniff_odf

        odf_kind = sniff_odf(names, zf)
        if odf_kind is not None:
            return odf_kind
        try:
            if zf.read("mimetype") == b"application/epub+zip":
                return "epub"
        except Exception:  # noqa: BLE001 — absent OR torn member:
            pass  # sniffing never raises on dirty zips
        return "unknown"
    return "unknown"


OFFICE_SCHEMA = (
    "doc_id bigint, format string, title string, text string, "
    "n_chars int"
)


def _text_parsers() -> dict:
    """format → ``payload -> {title, text, n_chars}`` parser map (the
    codec matrix both extraction operators dispatch over)."""
    from minerva_etl_spark.operators.docx import docx_extract_text
    from minerva_etl_spark.operators.epub import epub_extract_text
    from minerva_etl_spark.operators.msdoc import doc_extract_text
    from minerva_etl_spark.operators.msg import msg_extract_text
    from minerva_etl_spark.operators.odf import odf_extract_text
    from minerva_etl_spark.operators.pdf import pdf_extract_text
    from minerva_etl_spark.operators.ppt import ppt_extract_text
    from minerva_etl_spark.operators.pptx import pptx_extract_text
    from minerva_etl_spark.operators.rtf import rtf_extract_text
    from minerva_etl_spark.operators.xls import xls_extract_text
    from minerva_etl_spark.operators.xlsb import xlsb_extract_text
    from minerva_etl_spark.operators.xlsx import xlsx_extract_text

    return {
        "pdf": pdf_extract_text,
        "docx": docx_extract_text,
        "epub": epub_extract_text,
        "xlsx": xlsx_extract_text,
        "xlsb": xlsb_extract_text,
        "pptx": pptx_extract_text,
        # RTF carries no title metadata -> NULL in the unified
        # schema; .doc titles come from the SummaryInformation
        # property set when present
        "rtf": lambda b: {"title": None, **rtf_extract_text(b)},
        "doc": doc_extract_text,
        "xls": xls_extract_text,
        "ppt": ppt_extract_text,
        # one namespace walk covers all three OpenDocument classes
        "odt": odf_extract_text,
        "ods": odf_extract_text,
        "odp": odf_extract_text,
        # .msg maps onto the unified document schema as
        # title=subject, text=body
        "msg": lambda b: (
            lambda r: {
                "title": r["subject"],
                "text": r["body"],
                "n_chars": r["n_chars"],
            }
        )(msg_extract_text(b)),
    }


def office_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Mixed PDF/DOCX/XLSX/PPTX/EPUB/RTF/DOC column → unified
    ``(id, format, title, text, n_chars)``.  Magic-byte routing per
    payload inside Arrow tasks; ``on_error='skip'`` drops unknown,
    ``ole2``-tagged and undecodable payloads (dirty-corpus mode)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = OFFICE_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )
    parsers = _text_parsers()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = sniff_document_format(payload)
                try:
                    if fmt == "unknown":
                        raise ValueError(
                            "unrecognized document payload (not "
                            "PDF/DOCX/XLSX/PPTX/EPUB/RTF/DOC)"
                        )
                    if fmt == "ole2":
                        raise ValueError(
                            "OLE2 compound file without a "
                            "WordDocument stream (legacy "
                            "xls/ppt/msi — tagged, not extracted)"
                        )
                    if fmt == "ooxml_encrypted":
                        raise ValueError(
                            "password-protected OOXML document "
                            "(EncryptionInfo/EncryptedPackage — "
                            "tagged, not extracted)"
                        )
                    rec = parsers[fmt](payload)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, fmt, rec["title"], rec["text"], rec["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "title", "text", "n_chars"],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


OFFICE_DECRYPT_SCHEMA = (
    "doc_id bigint, format string, encryption string, title string, "
    "text string, n_chars int"
)


def office_decrypt_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    password: "str | list[str] | None" = None,
    on_error: str = "fail",
) -> DataFrame:
    """Decryption-aware mixed-document extraction (r15): like
    :func:`office_extract`, but payloads protected by a DEFAULT-
    password scheme (`operators/offcrypto.py` — Excel's well-known
    ``VelvetSweatshop`` convention) are decrypted in-task and routed
    into their normal codec, with an ``encryption`` census column:

    * ``none`` — plaintext payload, extracted normally;
    * ``ecma376_standard`` / ``ecma376_agile`` —
      ``EncryptionInfo``/``EncryptedPackage`` CFB whose verifier
      accepts the password (Standard = AES-ECB package, what Office
      2007 writes; Agile = 4.4 AES-CBC segments, what Office 2010+
      writes); the inner zip is re-sniffed and extracted (``format``
      reports the INNER format);
    * ``xls_rc4`` / ``doc_rc4`` — BIFF8 ``FilePass`` / Word-97
      ``fEncrypted`` Office-97 RC4 accepted; the payload decrypts
      and extracts as a plain .xls/.doc;
    * ``xls_rc4_cryptoapi`` / ``doc_rc4_cryptoapi`` /
      ``ppt_rc4_cryptoapi`` — the second-generation RC4 scheme
      (MS-OFFCRYPTO §2.3.5, SHA-1 derivation — Office XP/2003)
      accepted the same way; PowerPoint's variant decrypts per
      PERSIST OBJECT with block = persist id (r16);
    * ``xls_xor`` — XOR obfuscation Method 1 (§2.3.7, the oldest
      Excel protection) whose key+verifier match the password (r16);
    * ``odf_blowfish`` / ``odf_aes`` — LibreOffice/OpenOffice
      password protection (OASIS ODF 1.2 §3.4: PBKDF2 +
      Blowfish-CFB or AES-CBC per member) opened with a SUPPLIED
      password (r16 — ODF has no default-password convention, so
      these only decrypt when the caller passes the real one);
    * ``locked`` — the payload is genuinely password-protected (the
      verifier rejected the password) or uses an unsupported scheme
      (XOR obfuscation, non-AES agile parameter sets): format keeps
      the encrypted tag, title/text stay NULL — the honest backlog
      row (NOT an error: a census must count these,
      `format_census`-style).

    ``password`` accepts a single candidate or a WORDLIST
    (``list[str]`` — r16): each scheme tries the candidates in order
    and the first verifier-accept wins, the standard corpus-recovery
    mode (per wrong candidate only the verifier check runs, and the
    key spins memoize per (password, salt) across the worker).
    ``None`` means the ``VelvetSweatshop`` default alone.

    A downstream census is one groupBy:
    ``office_decrypt_extract(df).groupBy("format", "encryption")``.
    Scale shape: identical to `office_extract` — one Arrow scan, no
    shuffle; the 50 000-round key spin costs ~50 ms once per
    encrypted payload, amortized inside the task."""
    from minerva_etl_spark.operators.offcrypto import (
        DEFAULT_PASSWORD,
        WrongPasswordError,
        decrypt_doc_rc4,
        decrypt_ooxml,
        decrypt_ppt_rc4,
        decrypt_xls_rc4,
        decrypt_xls_xor,
        doc_encryption_type,
        ooxml_encryption_scheme,
        ppt_encryption_type,
        xls_encryption_type,
    )

    if password is None:
        candidates = [DEFAULT_PASSWORD]
    elif isinstance(password, str):
        candidates = [password]
    else:
        candidates = list(password)
        if not candidates:
            raise ValueError("password wordlist must not be empty")

    def try_candidates(fn, payload):
        # WrongPasswordError -> next candidate; scheme-level
        # ValueErrors (unsupported/malformed) are final immediately
        for i, pw in enumerate(candidates):
            try:
                return fn(payload, pw)
            except WrongPasswordError:
                if i == len(candidates) - 1:
                    raise
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = OFFICE_DECRYPT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )
    parsers = _text_parsers()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = sniff_document_format(payload)
                enc = "none"
                try:
                    if fmt == "ooxml_encrypted":
                        try:
                            scheme = ooxml_encryption_scheme(payload)
                            payload = try_candidates(decrypt_ooxml, payload)
                            fmt = sniff_document_format(payload)
                            enc = f"ecma376_{scheme}"
                        except (WrongPasswordError, ValueError):
                            rows.append(
                                (did, "ooxml_encrypted", "locked",
                                 None, None, None)
                            )
                            continue
                    elif (
                        fmt == "xls"
                        and (
                            scheme := xls_encryption_type(payload)
                        ) is not None
                    ):
                        try:
                            payload = try_candidates(
                                decrypt_xls_xor
                                if scheme == "xor"
                                else decrypt_xls_rc4,
                                payload,
                            )
                            enc = f"xls_{scheme}"
                        except (WrongPasswordError, ValueError):
                            rows.append(
                                (did, "xls", "locked", None, None,
                                 None)
                            )
                            continue
                    elif fmt in ("odt", "ods", "odp"):
                        from minerva_etl_spark.operators.odf import (
                            decrypt_odf,
                            odf_encryption_type,
                        )

                        cipher = odf_encryption_type(payload)
                        if cipher is not None:
                            # no default-password convention exists
                            # for ODF, so this only opens when the
                            # caller SUPPLIED the document's real
                            # password (r16); otherwise the honest
                            # locked census row stands
                            try:
                                payload = try_candidates(
                                    decrypt_odf, payload
                                )
                                enc = f"odf_{cipher}"
                            except (WrongPasswordError, ValueError):
                                rows.append(
                                    (did, fmt, "locked", None, None,
                                     None)
                                )
                                continue
                    elif (
                        fmt == "ppt"
                        and ppt_encryption_type(payload) is not None
                    ):
                        try:
                            payload = try_candidates(
                                decrypt_ppt_rc4, payload
                            )
                            enc = "ppt_rc4_cryptoapi"
                        except (WrongPasswordError, ValueError):
                            rows.append(
                                (did, "ppt", "locked", None, None,
                                 None)
                            )
                            continue
                    elif (
                        fmt == "doc"
                        and (
                            scheme := doc_encryption_type(payload)
                        ) is not None
                    ):
                        try:
                            payload = try_candidates(decrypt_doc_rc4, payload)
                            enc = f"doc_{scheme}"
                        except (WrongPasswordError, ValueError):
                            rows.append(
                                (did, "doc", "locked", None, None,
                                 None)
                            )
                            continue
                    if fmt == "unknown":
                        raise ValueError(
                            "unrecognized document payload"
                        )
                    if fmt == "ole2":
                        raise ValueError(
                            "OLE2 compound file without a known "
                            "document stream"
                        )
                    rec = parsers[fmt](payload)
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, fmt, enc, rec["title"], rec["text"],
                     rec["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "encryption", "title",
                         "text", "n_chars"],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


OFFICE_METADATA_SCHEMA = (
    "doc_id bigint, format string, title string, author string, "
    "created string"
)


@_guarded
def _zip_core_metadata(payload: bytes) -> dict:
    """docProps/core.xml of any OOXML package (docx/xlsx/pptx share
    it) — title/creator/created; EPUB falls back to the OPF dc:
    elements.  Torn members / garbage XML surface as ValueError (the
    shared codec guard) so the provenance scan's error policy owns
    them."""
    import xml.etree.ElementTree as ET

    out = {"title": None, "author": None, "created": None}
    zf = zipfile.ZipFile(io.BytesIO(payload))
    names = set(zf.namelist())
    dc = "{http://purl.org/dc/elements/1.1/}"
    if "docProps/core.xml" in names:
        root = ET.fromstring(zf.read("docProps/core.xml"))
        for el in root:
            tag = el.tag.rsplit("}", 1)[-1]
            if tag == "title":
                out["title"] = el.text
            elif tag == "creator":
                out["author"] = el.text
            elif tag == "created" and el.text:
                out["created"] = (
                    el.text.replace("T", " ").rstrip("Z")[:19]
                )
        return out
    if "META-INF/container.xml" in names:
        # EPUB: resolve the OPF, read its dc: metadata
        cont = ET.fromstring(zf.read("META-INF/container.xml"))
        opf_path = None
        for el in cont.iter():
            if el.tag.rsplit("}", 1)[-1] == "rootfile":
                opf_path = el.get("full-path")
                break
        if opf_path and opf_path in names:
            opf = ET.fromstring(zf.read(opf_path))
            for el in opf.iter():
                if el.tag == f"{dc}title":
                    out["title"] = el.text
                elif el.tag == f"{dc}creator":
                    out["author"] = el.text
                elif el.tag == f"{dc}date" and el.text:
                    out["created"] = (
                        el.text.replace("T", " ").rstrip("Z")[:19]
                    )
    return out


def office_metadata(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Document-PROVENANCE census over a mixed binary column (r14):
    per payload ``(format, title, author, created)`` from whichever
    metadata CONTAINER the format uses — the trailer /Info dict for
    PDF, ``docProps/core.xml`` for every OOXML package (docx/xlsx/
    pptx share it; EPUB's OPF is the zip fallback), the MS-OLEPS
    ``\\x05SummaryInformation`` stream for CFB formats (doc/xls/ppt),
    the RTF ``{\\info}`` group, and .msg subject/sender property
    streams.  Container-level dispatch means five parsers cover
    eleven formats, and NO content extraction runs — the pass a
    100 TB bucket uses for attribution/dedup-by-provenance
    filtering.  Missing metadata is NULL, never an error; unknown
    payloads follow the codec error policy.

    Encrypted payloads (r15): OOXML under a DEFAULT-password scheme
    decrypts in-task so core.xml provenance is read (format reports
    the inner format); genuinely locked files keep the
    ``ooxml_encrypted`` tag with NULL metadata.  RC4-encrypted
    .doc/.xls need no handling here — the Office-97 scheme never
    encrypts the OLEPS SummaryInformation stream, so their
    provenance reads directly."""
    from minerva_etl_spark.operators.msdoc import (
        _SUMMARY_STREAM,
        cfb_read_stream,
        summary_properties,
    )
    from minerva_etl_spark.operators.offcrypto import decrypt_ooxml
    from minerva_etl_spark.operators.pdf import pdf_info

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                fmt = sniff_document_format(payload)
                if fmt == "ooxml_encrypted":
                    try:
                        payload = decrypt_ooxml(payload)
                        fmt = sniff_document_format(payload)
                    except ValueError:
                        pass  # locked: tag stays, metadata NULL
                try:
                    if fmt == "unknown":
                        raise ValueError(
                            "unrecognized document payload"
                        )
                    if fmt == "pdf":
                        meta = pdf_info(payload)
                    elif fmt == "rtf":
                        from minerva_etl_spark.operators.rtf import (
                            rtf_info,
                        )

                        meta = rtf_info(payload)
                    elif fmt == "msg":
                        # Outlook mail: subject/sender are the
                        # document-provenance analogue
                        from minerva_etl_spark.operators.msg import (
                            msg_extract_text,
                        )

                        r = msg_extract_text(payload)
                        meta = {"title": r["subject"] or None,
                                "author": r["sender"] or None,
                                "created": None}
                    elif fmt in ("odt", "ods", "odp"):
                        from minerva_etl_spark.operators.odf import (
                            odf_metadata,
                        )

                        meta = odf_metadata(payload)
                    elif payload[:4] == b"PK\x03\x04":
                        meta = _zip_core_metadata(payload)
                    else:  # any CFB format: OLEPS when present
                        try:
                            blob = cfb_read_stream(
                                payload, _SUMMARY_STREAM
                            )
                            props = summary_properties(blob)
                        except KeyError:
                            props = {}
                        meta = {
                            "title": props.get("title"),
                            "author": props.get("author"),
                            "created": props.get("created"),
                        }
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, fmt, meta["title"], meta["author"],
                     meta["created"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "format", "title", "author",
                         "created"],
            )

    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = OFFICE_METADATA_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )
    return docs.select(id_col, payload_col).mapInPandas(run, schema)


def format_census(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sniff-ONLY format census over a mixed binary column: per
    format, row count and total payload bytes — the budgeting pass a
    100 TB document bucket runs BEFORE deciding which codecs to pay
    for (sniffing reads magic bytes + one zip entry list / CFB
    directory peek, never a full parse).  One Arrow scan + one
    map-side-combinable groupBy."""
    import pyspark.sql.functions as F

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts = []
            sizes = []
            for payload in pdf[payload_col]:
                b = bytes(payload)
                fmts.append(sniff_document_format(b))
                sizes.append(len(b))
            yield pd.DataFrame({"format": fmts, "n_bytes": sizes})

    per_row = docs.select(payload_col).mapInPandas(
        run, "format string, n_bytes bigint"
    )
    return per_row.groupBy("format").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )
