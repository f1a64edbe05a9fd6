"""RTF text extraction — the legacy rich-text edge (round 12).

RTF is the fourth binary-document class a mail/office crawl surfaces
(Outlook rich mail, legacy Word exports).  The format is a public
Microsoft specification: a brace-grouped token stream of control
words (``\\par``), control symbols (``\\'xx`` hex escapes) and plain
text.  The extractor is a single-pass tokenizer with a group stack —
pure stdlib, Arrow ``mapInPandas``, the engine's codec shape.

Extraction rules (deterministic, oracle-matchable):

* ``\\par`` / ``\\line`` emit NEWLINE, ``\\tab`` emits TAB; other
  control words are formatting and drop (their optional numeric
  parameter and the single following space are consumed per spec).
* ``\\'xx`` hex escapes decode through the current code page
  (cp1252 default, ``\\ansicpg`` switches); ``\\uN`` Unicode escapes
  emit the code point and skip the following fallback character
  (``\\ucN`` sets the skip width).
* Destination groups that carry non-content data — ``\\fonttbl``,
  ``\\colortbl``, ``\\stylesheet``, ``\\info``, ``\\pict``, and every
  ``{\\*`` optional destination — are skipped whole (group stack).
* ``\\{`` ``\\}`` ``\\\\`` escape the literal characters.

Rejects are honest: payloads not starting with ``{\\rtf`` raise
``ValueError``.  The writer (:func:`synthesize_rtf`) emits a
conformant document — font/color tables, an info group (which must
NOT leak into text), escaped specials, hex and unicode escapes —
for the gate fixture and tests.

Reference parity note: part of the document-ingest extension arc
(`pdf.py`, `docx.py`, `epub.py`, `email_ingest.py`).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_rtf",
    "rtf_extract_text",
    "rtf_extract",
    "RTF_EXTRACT_SCHEMA",
]

#: destination control words whose whole group is non-content
_SKIP_DESTS = {
    "fonttbl",
    "colortbl",
    "stylesheet",
    "info",
    "pict",
    "header",
    "footer",
    "footnote",
}


def _rtf_escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\par ")
        elif ch == "\t":
            out.append("\\tab ")
        elif ord(ch) < 128:
            out.append(ch)
        else:
            out.append(f"\\u{ord(ch)}?")
    return "".join(out)


def synthesize_rtf(
    paragraphs: list[str],
    title: str | None = None,
    hex_escape_spaces: bool = False,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a conformant RTF document: font/color tables and an
    ``\\info`` title group (all of which must NOT extract), the
    paragraphs joined by ``\\par``, specials escaped.  With
    ``hex_escape_spaces`` every space is written as the cp1252 hex
    escape ``\\'20`` — exercising the hex path on every word
    boundary."""
    body = "\\par ".join(_rtf_escape(p) for p in paragraphs)
    if hex_escape_spaces:
        body = body.replace(" ", "\\'20")
    info_parts = ""
    if title:
        info_parts += "{\\title " + _rtf_escape(title) + "}"
    if author:
        info_parts += "{\\author " + _rtf_escape(author) + "}"
    if created:
        # 'YYYY-MM-DD HH:MM:SS' -> \creatim\yrN\moN\dyN\hrN\minN\secN
        y, mo, rest = created[:4], created[5:7], created[8:]
        dy, hh, mi, ss = rest[:2], rest[3:5], rest[6:8], rest[9:11]
        info_parts += (
            "{\\creatim"
            f"\\yr{int(y)}\\mo{int(mo)}\\dy{int(dy)}"
            f"\\hr{int(hh)}\\min{int(mi)}\\sec{int(ss)}}}"
        )
    info = "{\\info" + info_parts + "}" if info_parts else ""
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        + info
        + "{\\*\\generator minerva-etl-spark;}"
        + "\\f0\\fs20 "
        + body
        + "}"
    )
    return doc.encode("cp1252", "replace")


def rtf_extract_text(payload: bytes) -> dict:
    """Parse one RTF payload → ``{n_paragraphs, text, n_chars}``.
    Raises ``ValueError`` for non-RTF bytes."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload (missing {\\rtf header)")
    data = payload
    out: list[str] = []
    codepage = "cp1252"
    i = 0
    n = len(data)
    depth = 0
    skip_until_depth: int | None = None
    uc_skip = 1
    pending_skip = 0
    while i < n:
        c = data[i : i + 1]
        if c == b"{":
            depth += 1
            i += 1
            continue
        if c == b"}":
            depth -= 1
            if (
                skip_until_depth is not None
                and depth < skip_until_depth
            ):
                skip_until_depth = None
            i += 1
            continue
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in (b"\\", b"{", b"}"):
                if skip_until_depth is None:
                    out.append(nxt.decode("ascii"))
                i += 2
                continue
            if nxt == b"*":
                # optional destination {\* ...}: skip the whole group
                skip_until_depth = depth
                i += 2
                continue
            if nxt in (b"~", b"-", b"_"):
                # control SYMBOLS (no parameter, no delimiter):
                # \~ non-breaking space, \- optional hyphen (zero
                # width unless the line breaks — drop), \_ non-
                # breaking hyphen.  Without this they parsed as an
                # empty control word and the symbol leaked literally
                # (r12 ADVICE).
                if skip_until_depth is None and pending_skip == 0:
                    if nxt == b"~":
                        out.append(" ")
                    elif nxt == b"_":
                        out.append("-")
                i += 2
                continue
            if nxt == b"'":
                code = data[i + 2 : i + 4]
                i += 4
                if skip_until_depth is None:
                    if pending_skip > 0:
                        pending_skip -= 1
                    else:
                        try:
                            out.append(
                                bytes.fromhex(code.decode("ascii"))
                                .decode(codepage, "replace")
                            )
                        except ValueError:
                            pass
                continue
            # control word: letters + optional signed digits + one
            # optional trailing space
            j = i + 1
            while j < n and chr(data[j]).isalpha():
                j += 1
            word = data[i + 1 : j].decode("ascii")
            k = j
            if k < n and data[k : k + 1] == b"-":
                k += 1
            while k < n and chr(data[k]).isdigit():
                k += 1
            param = data[j:k].decode("ascii") if k > j else ""
            if k < n and data[k : k + 1] == b" ":
                k += 1
            i = k
            if word == "bin":
                # \binN: the next N bytes are raw binary — consume
                # them UNCONDITIONALLY (even inside skipped groups:
                # payload bytes can contain { } \ and would corrupt
                # the group-depth scan; r12 ADVICE).
                try:
                    i += max(0, int(param or "0"))
                except ValueError:
                    pass
                continue
            if skip_until_depth is not None:
                continue
            if word == "" and param == "":
                continue
            if word in _SKIP_DESTS:
                skip_until_depth = depth
            elif word in ("par", "line"):
                out.append("\n")
            elif word == "tab":
                out.append("\t")
            elif word == "ansicpg" and param:
                codepage = f"cp{param}"
            elif word == "uc" and param:
                uc_skip = int(param)
            elif word == "u" and param:
                cp = int(param)
                out.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip = uc_skip
            continue
        ch = c.decode(codepage, "replace")
        i += 1
        if skip_until_depth is not None:
            continue
        if ch in ("\r", "\n"):
            continue  # raw newlines are layout, \par is content
        if pending_skip > 0:
            pending_skip -= 1
            continue
        out.append(ch)
    text = "".join(out)
    text = "\n".join(seg.strip() for seg in text.split("\n")).strip()
    paragraphs = [p for p in text.split("\n") if p != ""]
    return {
        "n_paragraphs": len(paragraphs),
        "text": text,
        "n_chars": len(text),
    }


RTF_EXTRACT_SCHEMA = (
    "doc_id bigint, n_paragraphs int, text string, n_chars int"
)


def rtf_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """RTF → text over a binary column (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = RTF_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = rtf_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (did, rec["n_paragraphs"], rec["text"], rec["n_chars"])
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_paragraphs", "text", "n_chars"],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)


def rtf_info(payload: bytes) -> dict:
    """The ``{\\info ...}`` document-metadata group (r14):
    ``{title, author, created}`` — title/author as group text,
    ``created`` from ``\\creatim``'s ``\\yr..\\sec`` parameters,
    rendered ISO.  A dedicated lightweight walk (group stack with
    first-control-word destination naming, hex escapes, ``\\binN``
    consumption) — metadata extraction must not pay for the full
    text scan.  Missing fields are None; non-RTF bytes raise."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload (missing {\\rtf header)")
    data = payload
    i, n = 0, len(data)
    stack: list[str | None] = []
    bufs: dict[str, list[str]] = {"title": [], "author": []}
    dtm: dict[str, int] = {}

    def chain() -> list[str]:
        return [d for d in stack if d]

    def append_char(ch: str) -> None:
        c = chain()
        if "info" in c and c:
            if c[-1] in bufs:
                bufs[c[-1]].append(ch)

    while i < n:
        c = data[i : i + 1]
        if c == b"{":
            stack.append(None)
            i += 1
            continue
        if c == b"}":
            if stack:
                stack.pop()
            i += 1
            continue
        if c != b"\\":
            append_char(data[i : i + 1].decode("latin-1"))
            i += 1
            continue
        nxt = data[i + 1 : i + 2]
        if nxt in (b"\\", b"{", b"}"):
            append_char(nxt.decode("ascii"))
            i += 2
            continue
        if nxt == b"'":
            code = data[i + 2 : i + 4]
            i += 4
            try:
                append_char(
                    bytes.fromhex(code.decode("ascii")).decode(
                        "cp1252", "replace"
                    )
                )
            except ValueError:
                pass
            continue
        if nxt in (b"*", b"~", b"-", b"_"):
            i += 2
            continue
        j = i + 1
        while j < n and chr(data[j]).isalpha():
            j += 1
        word = data[i + 1 : j].decode("ascii")
        k = j
        if k < n and data[k : k + 1] == b"-":
            k += 1
        while k < n and chr(data[k]).isdigit():
            k += 1
        param = data[j:k].decode("ascii") if k > j else ""
        if k < n and data[k : k + 1] == b" ":
            k += 1
        i = k
        if word == "bin":
            try:
                i += max(0, int(param or "0"))
            except ValueError:
                pass
            continue
        if stack and stack[-1] is None:
            stack[-1] = word  # first control word names the group
        if (
            word in ("yr", "mo", "dy", "hr", "min", "sec")
            and "creatim" in chain()
            and "info" in chain()
        ):
            try:
                dtm[word] = int(param or "0")
            except ValueError:
                pass
    out = {
        "title": "".join(bufs["title"]).strip() or None,
        "author": "".join(bufs["author"]).strip() or None,
        "created": None,
    }
    if "yr" in dtm:
        out["created"] = (
            f"{dtm.get('yr', 0):04d}-{dtm.get('mo', 1):02d}-"
            f"{dtm.get('dy', 1):02d} {dtm.get('hr', 0):02d}:"
            f"{dtm.get('min', 0):02d}:{dtm.get('sec', 0):02d}"
        )
    return out
