"""XLSX (OOXML SpreadsheetML) text extraction — the spreadsheet leg
of the office-corpus ingest arc (round 13; the r12 verdict's ask 2).

ECMA-376 SpreadsheetML: a ZIP container holding ``xl/workbook.xml``
(sheet names + relationship ids), ``xl/_rels/workbook.xml.rels``
(relationship id → worksheet part), per-sheet
``xl/worksheets/sheetN.xml`` grids, and the ``xl/sharedStrings.xml``
string table most real producers emit.  Everything here is pure
stdlib (``zipfile`` + ``xml.etree``) decoded inside Arrow
``mapInPandas`` tasks — the engine's media-codec shape
(`operators/docx.py` precedent): no shuffle, linear in payload bytes.

Extraction rules (deterministic, oracle-matchable):

* Sheets are walked in WORKBOOK order (the ``sheet`` elements of
  ``xl/workbook.xml``, resolved through the relationship part) — not
  zip-entry order, which real producers scramble.
* Each sheet contributes one block: the sheet NAME, then its rows;
  cells join with TAB, rows with NEWLINE.  Cells render by their
  ``t`` type: ``s`` → sharedStrings item (ALL ``t`` runs of the
  ``si`` concatenated — rich-text runs are invisible, like DOCX run
  splits), ``inlineStr`` → the inline ``is``/``t`` runs, ``str`` →
  the cached formula string in ``v``, ``b`` → ``TRUE``/``FALSE``,
  numeric (no ``t``) → the RAW ``v`` lexical form (never through a
  float round-trip — ``0.1`` stays ``0.1``).
* Cells appear in document order; absent cells of a sparse row are
  simply absent (text extraction, not grid reconstruction — the rule
  is documented and mirrored by the oracle).
* Blocks join with a single NEWLINE into ``text``; ``title`` comes
  from ``docProps/core.xml``'s ``dc:title`` (NULL when absent).

Rejects are honest: non-ZIP bytes and ZIPs without
``xl/workbook.xml`` raise ``ValueError`` (``on_error='skip'`` drops
them in dirty-corpus mode).

The writer (:func:`synthesize_xlsx`) emits a minimal conformant
package with BOTH string mechanisms — cells alternate shared-string
and inline-string by (row+col) parity, integer-looking cells are
written as true numeric cells — fixed zip timestamps, deterministic
bytes (the `docx.synthesize_docx` contract).

Reference parity note: the reference harvests structured text files
(CSV plugins, `src/harvest/`); binary office documents are this
repo's document-ingest extension arc (`pdf.py`, `docx.py`,
`epub.py`, `rtf.py`).
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synthesize_xlsx",
    "xlsx_extract_text",
    "xlsx_extract",
    "XLSX_EXTRACT_SCHEMA",
]

_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_R_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships}id"
)
_CP = (
    "http://schemas.openxmlformats.org/package/2006/metadata/"
    "core-properties"
)
_DC = "http://purl.org/dc/elements/1.1/"

_INT_RE = re.compile(r"^-?\d+$")
_DATE_RE = re.compile(r"^(\d{4})-(\d{2})-(\d{2})$")
_DATETIME_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2}) (\d{2}):(\d{2}):(\d{2})$"
)

# Built-in number-format ids (ECMA-376 §18.8.30).  14-17/27-36/50-58
# are date renders, 18-21/45-47 time renders, 22 the combined
# m/d/yy h:mm.  Anything carrying a time component renders as a full
# datetime (deterministic, locale-free).
_BUILTIN_DATE_FMT = (
    set(range(14, 18)) | set(range(27, 37)) | set(range(50, 59))
)
_BUILTIN_DATETIME_FMT = {22} | set(range(18, 22)) | set(range(45, 48))


def _custom_fmt_kind(code: str) -> str | None:
    """``'date' | 'datetime' | None`` for a custom numFmt code:
    strip quoted literals, ``[...]`` sections and ``\\x`` escapes,
    then look for date (y/d/m) and time (h/s) tokens.

    Elapsed-time bracket tokens (``[h]`` / ``[mm]`` / ``[ss]``,
    ECMA-376 §18.8.31) mark a DURATION format, not a calendar
    render — ``[h]:mm:ss`` must keep the raw serial (34:30:00 is not
    a date), so they classify as None BEFORE the bracket strip
    (which would otherwise leave ``:mm:ss`` and misread 'm' as a
    date token)."""
    if re.search(r"\[\s*(h+|m+|s+)\s*\]", code, re.I):
        return None
    bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code).lower()
    has_time = "h" in bare or "s" in bare
    has_date = (
        "y" in bare or "d" in bare or ("m" in bare and not has_time)
    )
    if has_date and has_time:
        return "datetime"
    if has_date:
        return "date"
    if has_time:
        return "datetime"
    return None


def _serial_to_iso(v: str, kind: str, date1904: bool) -> str:
    """Render an Excel date serial as ISO text.  1900 system: serial
    1 = 1900-01-01, serial 60 = the phantom 1900-02-29 (the Lotus
    leap-year bug — rendered literally), 61+ offset by the bug.
    1904 system: serial 0 = 1904-01-01.  Unrepresentable serials
    (0/negative in the 1900 system) fall back to the raw lexical
    form."""
    import datetime as _dt

    try:
        serial = float(v)
    except ValueError:
        return v
    days = int(serial)
    secs = round((serial - days) * 86400)
    if secs >= 86400:
        days += 1
        secs = 0
    if date1904:
        if days < 0:
            return v
        base = _dt.date(1904, 1, 1) + _dt.timedelta(days=days)
        date_part = base.isoformat()
    elif days == 60:
        date_part = "1900-02-29"  # Excel's phantom day
    elif 1 <= days < 60:
        date_part = (
            _dt.date(1899, 12, 31) + _dt.timedelta(days=days)
        ).isoformat()
    elif days > 60:
        date_part = (
            _dt.date(1899, 12, 30) + _dt.timedelta(days=days)
        ).isoformat()
    else:
        return v
    if kind == "date" and secs == 0:
        return date_part
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    return f"{date_part} {h:02d}:{m:02d}:{s:02d}"


def _date_to_serial(
    y: int, mo: int, d: int, secs: int, date1904: bool
) -> str | None:
    """Writer-side inverse of :func:`_serial_to_iso` (None = not
    representable as a serial; the caller keeps the text form)."""
    import datetime as _dt

    try:
        day = _dt.date(y, mo, d)
    except ValueError:
        return None
    if date1904:
        days = (day - _dt.date(1904, 1, 1)).days
        if days < 0:
            return None
    elif day >= _dt.date(1900, 3, 1):
        days = (day - _dt.date(1899, 12, 30)).days
    elif day >= _dt.date(1900, 1, 1):
        days = (day - _dt.date(1899, 12, 31)).days
    else:
        return None
    if secs == 0:
        return str(days)
    return repr(days + secs / 86400.0)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


# --------------------------------------------------------------- writer


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def synthesize_xlsx(
    sheets: list[tuple[str, list[list[str]]]],
    title: str | None = None,
    compress: bool = True,
    date1904: bool = False,
    author: str | None = None,
    created: str | None = None,
) -> bytes:
    """Build a minimal conformant XLSX: ``sheets`` is a list of
    ``(name, rows)`` where rows are lists of cell strings.  Integer-
    looking cells become numeric cells; ISO-date-looking cells
    (``YYYY-MM-DD`` / ``YYYY-MM-DD HH:MM:SS``) become date SERIALS
    styled with builtin numFmt 14/22 through ``xl/styles.xml`` (the
    1900 system with its leap-year bug, or 1904 when ``date1904``);
    text cells ALTERNATE between the shared-string table and inline
    strings by (row+col) parity so both read paths are exercised on
    every sheet.  Shared strings at index > 0 are emitted as two
    rich-text runs (split at the first space) — extraction must be
    run-invariant.  Fixed zip timestamps → byte-deterministic
    output."""
    shared: list[str] = []
    shared_index: dict[str, int] = {}
    sheet_xmls: list[str] = []
    for _, rows in sheets:
        body = []
        for r, row in enumerate(rows):
            cells = []
            for c, val in enumerate(row):
                ref = f"{_col_letter(c)}{r + 1}"
                md = _DATE_RE.match(val)
                mdt = _DATETIME_RE.match(val)
                serial = None
                if md or mdt:
                    g = [int(x) for x in (mdt or md).groups()]
                    secs = (
                        g[3] * 3600 + g[4] * 60 + g[5] if mdt else 0
                    )
                    serial = _date_to_serial(
                        g[0], g[1], g[2], secs, date1904
                    )
                if serial is not None:
                    style = 2 if mdt else 1
                    cells.append(
                        f'<c r="{ref}" s="{style}">'
                        f"<v>{serial}</v></c>"
                    )
                elif _INT_RE.match(val):
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
                elif (r + c) % 2 == 0:
                    if val not in shared_index:
                        shared_index[val] = len(shared)
                        shared.append(val)
                    cells.append(
                        f'<c r="{ref}" t="s">'
                        f"<v>{shared_index[val]}</v></c>"
                    )
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is>'
                        f'<t xml:space="preserve">{_xml_escape(val)}'
                        f"</t></is></c>"
                    )
            body.append(f'<row r="{r + 1}">' + "".join(cells) + "</row>")
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_MAIN}"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )
    si_items = []
    for i, s in enumerate(shared):
        if i > 0 and " " in s:
            head, tail = s.split(" ", 1)
            si_items.append(
                "<si><r><t xml:space=\"preserve\">"
                + _xml_escape(head + " ")
                + "</t></r><r><t xml:space=\"preserve\">"
                + _xml_escape(tail)
                + "</t></r></si>"
            )
        else:
            si_items.append(
                f'<si><t xml:space="preserve">{_xml_escape(s)}</t></si>'
            )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{_MAIN}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">' + "".join(si_items) + "</sst>"
    )
    # workbook sheet order deliberately references rIds in REVERSE
    # numeric order for multi-sheet books so extraction order is
    # proven to follow the workbook, not the rId or zip order
    wb_sheets = []
    rels = []
    for i, (name, _) in enumerate(sheets):
        rid = f"rId{len(sheets) - i}"
        wb_sheets.append(
            f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" '
            f'r:id="{rid}"/>'
        )
        rels.append(
            f'<Relationship Id="{rid}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
        )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN}" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships">'
        + ('<workbookPr date1904="1"/>' if date1904 else "")
        + "<sheets>" + "".join(wb_sheets) + "</sheets></workbook>"
    )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{_MAIN}"><cellXfs count="3">'
        '<xf numFmtId="0"/>'
        '<xf numFmtId="14" applyNumberFormat="1"/>'
        '<xf numFmtId="22" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        + "".join(rels)
        + '<Relationship Id="rIdS" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/>'
        '<Relationship Id="rIdY" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/></Relationships>'
    )
    created_el = ""
    if created is not None:
        created_el = (
            '<dcterms:created xsi:type="dcterms:W3CDTF">'
            + created.replace(" ", "T") + "Z</dcterms:created>"
        )
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<cp:coreProperties xmlns:cp="{_CP}" xmlns:dc="{_DC}" '
        'xmlns:dcterms="http://purl.org/dc/terms/" '
        'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
        + (f"<dc:title>{_xml_escape(title)}</dc:title>" if title else "")
        + (f"<dc:creator>{_xml_escape(author)}</dc:creator>"
           if author else "")
        + created_el
        + "</cp:coreProperties>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/docProps/core.xml" ContentType='
        '"application/vnd.openxmlformats-package.core-properties+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_REL_NS}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.'
        'org/package/2006/relationships/metadata/core-properties" '
        'Target="docProps/core.xml"/>'
        "</Relationships>"
    )
    entries = [
        ("[Content_Types].xml", content_types),
        ("_rels/.rels", root_rels),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
        ("xl/sharedStrings.xml", sst),
        ("xl/styles.xml", styles),
        ("docProps/core.xml", core),
    ]
    for i, sx in enumerate(sheet_xmls):
        entries.append((f"xl/worksheets/sheet{i + 1}.xml", sx))
    buf = io.BytesIO()
    comp = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = comp
            zf.writestr(zi, data.encode("utf-8"))
    return buf.getvalue()


# --------------------------------------------------------------- reader


def _tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[-1] if "}" in t else t


def _si_text(si) -> str:
    """All ``t`` runs of a shared-string item (plain or rich-text),
    skipping the phonetic ``rPh`` guide subtrees real producers
    embed.  Explicit stack (hostile XML depth must not blow the
    recursion limit); document order preserved."""
    if _tag(si) == "t":
        return si.text or ""
    out: list[str] = []
    stack = [list(si)]
    while stack:
        level = stack[-1]
        if not level:
            stack.pop()
            continue
        ch = level.pop(0)
        tt = _tag(ch)
        if tt == "rPh":
            continue
        if tt == "t":
            out.append(ch.text or "")
        else:
            stack.append(list(ch))
    return "".join(out)


def _cell_text(
    c,
    shared: list[str],
    xf_kinds: list[str | None] = (),
    date1904: bool = False,
) -> str:
    t = c.get("t", "")
    if t == "inlineStr":
        for node in c:
            if _tag(node) == "is":
                return _si_text(node)
        return ""
    v = None
    for node in c:
        if _tag(node) == "v":
            v = node.text or ""
            break
    if v is None:
        return ""
    if t == "s":
        idx = int(v)
        if not 0 <= idx < len(shared):
            raise ValueError(
                f"shared-string index {idx} out of range "
                f"({len(shared)} items)"
            )
        return shared[idx]
    if t == "b":
        return "TRUE" if v.strip() == "1" else "FALSE"
    if t in ("", "n"):
        # a numeric cell whose style resolves to a date/time number
        # format renders as ISO text (1900 system incl. the phantom
        # Feb 29, or 1904 per workbookPr)
        s = c.get("s")
        if s is not None:
            try:
                kind = xf_kinds[int(s)]
            except (ValueError, IndexError):
                kind = None
            if kind is not None:
                return _serial_to_iso(v, kind, date1904)
    # t == "str" (cached formula string) and numeric cells: the raw
    # lexical form, never a float round-trip
    return v


def _parse_styles(blob: bytes) -> list[str | None]:
    """``xl/styles.xml`` → per-cellXf date kind (``'date'`` /
    ``'datetime'`` / None), resolving custom ``numFmts`` codes."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(blob)
    custom: dict[int, str] = {}
    kinds: list[str | None] = []
    for child in root:
        if _tag(child) == "numFmts":
            for nf in child:
                if _tag(nf) != "numFmt":
                    continue
                try:
                    custom[int(nf.get("numFmtId", ""))] = nf.get(
                        "formatCode", ""
                    )
                except ValueError:
                    continue
    for child in root:
        if _tag(child) != "cellXfs":
            continue
        for xf in child:
            if _tag(xf) != "xf":
                continue
            try:
                fmt_id = int(xf.get("numFmtId", "0"))
            except ValueError:
                fmt_id = 0
            if fmt_id in custom:
                kinds.append(_custom_fmt_kind(custom[fmt_id]))
            elif fmt_id in _BUILTIN_DATE_FMT:
                kinds.append("date")
            elif fmt_id in _BUILTIN_DATETIME_FMT:
                kinds.append("datetime")
            else:
                kinds.append(None)
    return kinds


def xlsx_extract_text(payload: bytes) -> dict:
    """Parse one XLSX payload → ``{title, n_sheets, n_rows, n_cells,
    text, n_chars}``.  Raises ``ValueError`` for non-XLSX bytes (see
    module doc)."""
    import xml.etree.ElementTree as ET

    if payload[:4] == b"\xd0\xcf\x11\xe0":
        raise ValueError(
            "OLE compound file (legacy .xls or password-protected "
            "OOXML) — not a ZIP-based XLSX"
        )
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not an XLSX payload (not a ZIP): {exc}") from exc
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("ZIP without xl/workbook.xml — not an XLSX")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_si_text(si) for si in sst if _tag(si) == "si"]
    xf_kinds: list[str | None] = []
    if "xl/styles.xml" in names:
        xf_kinds = _parse_styles(zf.read("xl/styles.xml"))
    rel_target: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels:
            rid = rel.get("Id")
            tgt = rel.get("Target", "")
            if rid:
                rel_target[rid] = (
                    tgt.lstrip("/") if tgt.startswith("/") else "xl/" + tgt
                )
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    date1904 = False
    for child in wb:
        if _tag(child) == "workbookPr":
            date1904 = child.get("date1904", "") in ("1", "true")
    sheet_parts: list[tuple[str, str]] = []  # (name, part) in wb order
    for sheets_el in wb:
        if _tag(sheets_el) != "sheets":
            continue
        for sh in sheets_el:
            if _tag(sh) != "sheet":
                continue
            name = sh.get("name", "")
            # transitional OR strict OOXML: the r:id attribute lives
            # under different namespaces — accept any *}id
            rid = sh.get(_R_ATTR) or sh.get("id")
            if rid is None:
                for k, v in sh.attrib.items():
                    if k.endswith("}id"):
                        rid = v
                        break
            part = rel_target.get(rid or "", "")
            if part:
                sheet_parts.append((name, part))
    if not sheet_parts:
        # workbooks without usable rels: fall back to sheetN order
        sheet_parts = [
            (f"sheet{i}", n)
            for i, n in enumerate(
                sorted(
                    n for n in names
                    if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
                ),
                start=1,
            )
        ]
    blocks: list[str] = []
    n_rows = 0
    n_cells = 0
    for name, part in sheet_parts:
        if part not in names:
            raise ValueError(f"workbook references missing part {part}")
        ws = ET.fromstring(zf.read(part))
        rows_out: list[str] = []
        for sheet_data in ws:
            if _tag(sheet_data) != "sheetData":
                continue
            for row in sheet_data:
                if _tag(row) != "row":
                    continue
                n_rows += 1
                cells = [
                    _cell_text(c, shared, xf_kinds, date1904)
                    for c in row
                    if _tag(c) == "c"
                ]
                n_cells += len(cells)
                rows_out.append("\t".join(cells))
        blocks.append(name + ("\n" + "\n".join(rows_out) if rows_out
                              else ""))
    text = "\n".join(blocks)
    title = None
    if "docProps/core.xml" in names:
        core = ET.fromstring(zf.read("docProps/core.xml"))
        el = core.find(f"{{{_DC}}}title")
        if el is not None and el.text is not None:
            title = el.text
    return {
        "title": title,
        "n_sheets": len(sheet_parts),
        "n_rows": n_rows,
        "n_cells": n_cells,
        "text": text,
        "n_chars": len(text),
    }


XLSX_EXTRACT_SCHEMA = (
    "doc_id bigint, title string, n_sheets int, n_rows int, "
    "n_cells int, text string, n_chars int"
)


def xlsx_extract(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    on_error: str = "fail",
) -> DataFrame:
    """XLSX → text over a binary column: shuffle-free Arrow
    ``mapInPandas`` (the `pdf_extract` contract)."""
    id_type = dict(docs.dtypes).get(id_col, "bigint")
    schema = XLSX_EXTRACT_SCHEMA.replace(
        "doc_id bigint", f"{id_col} {id_type}", 1
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rec = xlsx_extract_text(bytes(payload))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":
                        continue
                    raise
                rows.append(
                    (
                        did,
                        rec["title"],
                        rec["n_sheets"],
                        rec["n_rows"],
                        rec["n_cells"],
                        rec["text"],
                        rec["n_chars"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "title", "n_sheets", "n_rows", "n_cells",
                    "text", "n_chars",
                ],
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
