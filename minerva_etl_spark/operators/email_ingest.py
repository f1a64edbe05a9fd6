"""EML / MBOX email ingest — the mail-corpus edge (round 12).

Email archives (Enron, public mailing lists, support corpora) are a
classic pre-training and SFT source, and their container formats are
standardized and stdlib-parsable: RFC 5322 headers + MIME multipart
(``email`` module) for single ``.eml`` messages, and the mbox
``From `` separator convention for mailbox files.  Parsing runs
inside Arrow ``mapInPandas`` tasks — the engine's codec shape: no
shuffle (mbox splitting emits multiple rows per file inside the same
task), linear in payload bytes.

Extraction rules (deterministic, oracle-matchable):

* ``subject`` / ``sender`` come from the headers with RFC 2047
  encoded-words decoded (``=?utf-8?q?...?=`` — the stdlib
  ``decode_header`` walk, parts joined).
* MIME leaves are walked in document order.  All ``text/plain``
  leaves decode (base64 / quoted-printable / 7bit per their
  ``Content-Transfer-Encoding``) and join with NEWLINE; when a
  message has NO plain leaf, ``text/html`` leaves run through the
  engine's one HTML extractor (`operators/html.py`) instead — the
  alternative-part preference every mail client applies.  Other
  content types (attachments) contribute to ``n_parts`` only.
* ``n_parts`` counts MIME leaves (a single-part message counts 1).

The writer (:func:`synthesize_eml`) builds messages as raw bytes
(fixed boundary, fixed header order — byte-deterministic; the stdlib
generator is deliberately NOT used because its reflow decisions are
version-dependent), covering single-part, multipart/alternative,
html-only and attachment-bearing shapes with all three transfer
encodings.  :func:`synthesize_mbox` concatenates messages under
``From `` separator lines with ``>From `` body escaping;
:func:`mbox_split` reverses it.

Reference parity note: the reference harvests structured text; mail
containers belong to this repo's document-ingest extension arc
(`pdf.py`, `docx.py`, `epub.py`, `office.py`).
"""

from __future__ import annotations

import base64
import quopri
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from minerva_etl_spark.operators.html import extract_html

__all__ = [
    "synthesize_eml",
    "synthesize_mbox",
    "eml_extract_text",
    "eml_extract",
    "mbox_split",
    "mail_extract",
    "EML_EXTRACT_SCHEMA",
    "EML_ATTACHMENT_SCHEMA",
    "eml_attachments",
    "MAIL_EXTRACT_SCHEMA",
]

_BOUNDARY = "=-minerva-boundary-0001"


def _encode_body(text: str, cte: str) -> bytes:
    raw = text.encode("utf-8")
    if cte == "base64":
        b = base64.b64encode(raw)
        return b"\r\n".join(
            b[i : i + 72] for i in range(0, len(b), 72)
        ) + b"\r\n"
    if cte == "quoted-printable":
        return quopri.encodestring(raw) + b"\r\n"
    return raw + b"\r\n"


def _q_encode_subject(subject: str) -> str:
    # RFC 2047 Q-encoding (ASCII payload): space -> _, '='/'?'/'_'
    # escape as =XX
    out = []
    for ch in subject:
        if ch == " ":
            out.append("_")
        elif ch in "=?_" or not (32 < ord(ch) < 127):
            out.append(f"={ord(ch):02X}")
        else:
            out.append(ch)
    return "=?utf-8?q?" + "".join(out) + "?="


def synthesize_eml(
    subject: str,
    sender: str,
    text_body: str | None = None,
    html_body: str | None = None,
    attachment: bytes | None = None,
    cte: str = "7bit",
    q_encode_subject: bool = False,
    attachments: "list[tuple[str, str, bytes]] | None" = None,
) -> bytes:
    """Build one RFC 5322 message as deterministic raw bytes:
    single-part when only one body is given, ``multipart/alternative``
    for plain+html, ``multipart/mixed`` when an attachment rides
    along.  ``cte`` applies to the text bodies."""
    subj = _q_encode_subject(subject) if q_encode_subject else subject
    headers = [
        f"From: {sender}",
        "To: corpus@example.test",
        f"Subject: {subj}",
        "Date: Mon, 02 Feb 2026 03:04:05 +0000",
        "MIME-Version: 1.0",
    ]
    parts: list[bytes] = []
    if text_body is not None:
        parts.append(
            (
                "Content-Type: text/plain; charset=utf-8\r\n"
                f"Content-Transfer-Encoding: {cte}\r\n\r\n"
            ).encode()
            + _encode_body(text_body, cte)
        )
    if html_body is not None:
        parts.append(
            (
                "Content-Type: text/html; charset=utf-8\r\n"
                f"Content-Transfer-Encoding: {cte}\r\n\r\n"
            ).encode()
            + _encode_body(html_body, cte)
        )
    att_list = list(attachments or [])
    if attachment is not None:
        att_list.insert(
            0, ("blob.bin", "application/octet-stream", attachment)
        )
    for fname, ctype, blob in att_list:
        b = base64.b64encode(blob)
        parts.append(
            (
                f"Content-Type: {ctype}\r\n"
                "Content-Transfer-Encoding: base64\r\n"
                f'Content-Disposition: attachment; filename="{fname}"'
                "\r\n\r\n"
            ).encode()
            + b"\r\n".join(b[i : i + 72] for i in range(0, len(b), 72))
            + b"\r\n"
        )
    if not parts:
        raise ValueError("a message needs at least one body part")
    if len(parts) == 1:
        # hoist the single part's headers to the top level
        head, _, body = parts[0].partition(b"\r\n\r\n")
        raw = (
            "\r\n".join(headers).encode()
            + b"\r\n"
            + head
            + b"\r\n\r\n"
            + body
        )
        return raw
    subtype = "mixed" if att_list else "alternative"
    lines = (
        "\r\n".join(headers).encode()
        + (
            f"\r\nContent-Type: multipart/{subtype}; "
            f'boundary="{_BOUNDARY}"\r\n\r\n'
        ).encode()
    )
    for p in parts:
        lines += f"--{_BOUNDARY}\r\n".encode() + p
    lines += f"--{_BOUNDARY}--\r\n".encode()
    return lines


def synthesize_mbox(messages: list[bytes]) -> bytes:
    """Concatenate messages under mbox ``From `` separators with the
    classic ``>From `` body escape."""
    out = b""
    for m in messages:
        body = m.replace(b"\nFrom ", b"\n>From ")
        out += b"From corpus@example.test Mon Feb  2 03:04:05 2026\n"
        out += body
        if not body.endswith(b"\n"):
            out += b"\n"
        out += b"\n"
    return out


def _decode_header_str(value: str) -> str:
    from email.header import decode_header

    parts = []
    for chunk, enc in decode_header(value):
        if isinstance(chunk, bytes):
            parts.append(chunk.decode(enc or "ascii", "replace"))
        else:
            parts.append(chunk)
    return "".join(parts)


def eml_extract_text(payload: bytes) -> dict:
    """Parse one RFC 5322 message → ``{subject, sender, n_parts,
    text, n_chars}`` (see module doc).  Raises ``ValueError`` for
    byte streams without a parseable header block."""
    import email

    msg = email.message_from_bytes(payload)
    if not msg.keys():
        raise ValueError("no RFC 5322 header block — not an email")
    leaves = [p for p in msg.walk() if not p.is_multipart()]
    plain: list[str] = []
    html: list[str] = []
    for p in leaves:
        ctype = p.get_content_type()
        if ctype not in ("text/plain", "text/html"):
            continue
        raw = p.get_payload(decode=True)
        if raw is None:
            continue
        body = raw.decode(
            p.get_content_charset() or "utf-8", "replace"
        )
        if ctype == "text/plain":
            plain.append(body.strip())
        else:
            html.append(extract_html(body)["text"])
    text = "\n".join(plain if plain else html)
    return {
        "subject": _decode_header_str(msg.get("Subject", "")),
        "sender": _decode_header_str(msg.get("From", "")),
        "n_parts": len(leaves),
        "text": text,
        "n_chars": len(text),
    }


EML_EXTRACT_SCHEMA = (
    "doc_id bigint, subject string, sender string, n_parts int, "
    "text string, n_chars int"
)


def eml_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """EML → text over a binary column (the `pdf_extract` contract:
    Arrow ``mapInPandas``, id column keeps its name/type,
    ``on_error='skip'`` drops unparseable payloads)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = EML_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = eml_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["subject"],
                        rec["sender"],
                        rec["n_parts"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "subject", "sender", "n_parts", "text",
                    "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


def mbox_split(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "mbox_id",
) -> DataFrame:
    """Split mbox payloads into per-message rows ``(id, msg_index,
    payload)`` — ``From `` separator lines at line starts delimit
    messages, ``>From `` unescapes.  Emits multiple rows per input
    row inside the same Arrow task (no shuffle)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                chunks: list[bytes] = []
                cur: list[bytes] = []
                for line in data.split(b"\n"):
                    if line.startswith(b"From "):
                        if cur:
                            chunks.append(b"\n".join(cur))
                        cur = []
                    else:
                        cur.append(
                            line[1:]
                            if line.startswith(b">From ")
                            else line
                        )
                if cur:
                    chunks.append(b"\n".join(cur))
                for idx, chunk in enumerate(chunks):
                    msg = chunk.strip(b"\n")
                    if msg:
                        rows.append((mid, idx, msg))
            yield pd.DataFrame(
                rows, columns=[id_col, "msg_index", "payload"]
            )

    return docs.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} {id_type}, msg_index int, payload binary"
    )


MAIL_EXTRACT_SCHEMA = (
    "doc_id bigint, kind string, subject string, sender string, "
    "text string, n_chars int"
)


def mail_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """Mixed mail column → unified ``(id, kind, subject, sender,
    text, n_chars)`` (r13): a real mail corpus is wire-format RFC
    5322 (.eml, incl. mbox-split members) MIXED with desktop-exported
    Outlook .msg (CFB) — per-payload magic routing in-task, the
    `office_extract` pattern applied to the mail arc.  CFB magic →
    `operators/msg.py` (subject/body from top-level property
    streams); anything else must carry an RFC 5322 header block →
    the MIME walk.  ``on_error='skip'`` drops undecodable payloads."""
    from minerva_etl_spark.operators.msg import msg_extract_text

    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = MAIL_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                try:
                    if payload[:4] == b"\xd0\xcf\x11\xe0":
                        rec = msg_extract_text(payload)
                        rows.append(
                            (
                                did,
                                "msg",
                                rec["subject"],
                                rec["sender"],
                                rec["body"],
                                rec["n_chars"],
                            )
                        )
                    else:
                        rec = eml_extract_text(payload)
                        rows.append(
                            (
                                did,
                                "eml",
                                rec["subject"],
                                rec["sender"],
                                rec["text"],
                                rec["n_chars"],
                            )
                        )
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "kind", "subject", "sender", "text",
                    "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


EML_ATTACHMENT_SCHEMA = (
    "doc_id bigint, part_index int, filename string, "
    "content_type string, n_bytes int, payload binary"
)


def eml_attachments(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode the ATTACHMENTS of RFC 5322 messages (r14 — the
    enterprise-corpus edge: the documents worth extracting usually
    ride inside the mail, not the body): one row per MIME leaf whose
    Content-Disposition is ``attachment`` (or that carries a
    filename), with the transfer encoding decoded back to raw bytes —
    ready to route into `office_extract`/`office_metadata`.
    ``part_index`` numbers attachments per message in document
    order."""
    import email

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                msg = email.message_from_bytes(bytes(payload))
                k = 0
                for p in msg.walk():
                    if p.is_multipart():
                        continue
                    fname = p.get_filename()
                    if (
                        p.get_content_disposition() != "attachment"
                        and fname is None
                    ):
                        continue
                    raw = p.get_payload(decode=True) or b""
                    rows.append(
                        (did, k, fname, p.get_content_type(),
                         len(raw), raw)
                    )
                    k += 1
            yield pd.DataFrame(
                rows,
                columns=[id_col, "part_index", "filename",
                         "content_type", "n_bytes", "payload"],
            )

    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = EML_ATTACHMENT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )
    return docs.select(id_col, payload_col).mapInPandas(run, schema)
