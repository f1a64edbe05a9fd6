"""WARC (Web ARChive, ISO 28500) harvest source.

The reference's harvest layer turns operator files into packages via
format plugins (`/root/reference/src/minerva/harvest/plugins.py`,
`plugin_api_trend.py`); the crawl-scale equivalent raw input for an
LLM-data pipeline is the WARC format used by Common Crawl.  This module
reads WARC files — plain or with one gzip member per record (the
Common Crawl layout) — into a DataFrame, and registers a ``warc``
harvest plugin alongside csv/parquet/jsonl.

Scale posture: ``spark.read.format("binaryFile")`` yields one row per
file, so parsing gets one task per WARC file.  That is the RIGHT unit:
record-gzipped WARCs cannot be split without an external index (each
record is its own deflate stream, but member boundaries are unknown
until scanned), and Common Crawl ships ~1 GB segments precisely so the
file is the parallelism unit — 100 TB is ~100k segments, i.e. 100k
independent tasks for a 1000-executor cluster with zero shuffle.
Records are parsed streaming inside the task; payload bytes never
visit the driver.  The parse is Arrow-batched ``mapInPandas`` (binary
in, rows out) — per-record Python cost, but the work is byte slicing
the JVM cannot express, and it stays fully distributed.

Writer (`write_warc_files`) is the mirror image: one file per
partition group, written by the task that owns the group
(``applyInPandas`` → local/DFS write), so export of a curated corpus
back to WARC is also shuffle-free beyond the one grouping exchange.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema of :func:`read_warc` / :func:`parse_warc_blob`
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, http_status int, "
    "http_content_type string, body binary"
)

_CRLF = b"\r\n"


def synthesize_warc_record(
    warc_type: str,
    body: bytes,
    record_id: str,
    target_uri: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    content_type: str = "application/octet-stream",
) -> bytes:
    """One WARC/1.0 record: header block, blank line, body, two CRLFs."""
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:uuid:" + record_id.encode() + b">",
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    lines += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return _CRLF.join(lines) + _CRLF * 2 + body + _CRLF * 2


def synthesize_http_response(
    html: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """An HTTP/1.1 response message (the body of a WARC ``response``
    record with ``Content-Type: application/http; msgtype=response``)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Status"
    )
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html


def synthesize_warc(
    records: Iterable[bytes], gzip_members: bool = True
) -> bytes:
    """Concatenate records into one WARC file.  With ``gzip_members``
    each record becomes its own gzip member (the Common Crawl layout —
    seekable given an index, streamable without one)."""
    if not gzip_members:
        return b"".join(records)
    out = io.BytesIO()
    for rec in records:
        # mtime=0: byte-deterministic output for fixture replay
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(rec)
    return out.getvalue()


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (zlib handles only
    one member per stream, so loop with decompressobj)."""
    import zlib

    out = []
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(blob[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(blob) - len(tail)
    return b"".join(out)


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Parse a WARC blob (plain or gzip-membered) into record dicts
    with keys matching :data:`WARC_SCHEMA` (minus ``warc_file``).

    HTTP ``response`` records are unwrapped: ``http_status`` is taken
    from the status line and ``body`` is the HTTP message body; other
    record types carry the raw record body and a null status.
    ``content_length`` is always the WARC-level Content-Length (the
    HTTP message size for responses) — what a crawl-size report needs.
    """
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and blob[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = blob.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("truncated WARC record header")
        header = blob[pos:head_end].decode("utf-8", "replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            rid = fields.get("warc-record-id", "<unknown>")
            raise ValueError(
                f"WARC record {rid} at offset {pos} is missing its "
                "mandatory Content-Length header"
            )
        clen = int(fields["content-length"])
        body = blob[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        rec = {
            "record_id": fields.get("warc-record-id", "").strip("<>"),
            "warc_type": fields.get("warc-type", ""),
            "target_uri": fields.get("warc-target-uri"),
            "warc_date": fields.get("warc-date"),
            "content_type": fields.get("content-type"),
            "content_length": clen,
            "http_status": None,
            "http_content_type": None,
            "body": body,
        }
        if rec["warc_type"] == "response" and body[:5] == b"HTTP/":
            http_end = body.find(_CRLF * 2)
            if http_end >= 0:
                head = body[:http_end].decode("ascii", "replace")
                http_lines = head.split("\r\n")
                parts = http_lines[0].split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for ln in http_lines[1:]:
                    k, _, v = ln.partition(":")
                    if k.strip().lower() == "content-type":
                        rec["http_content_type"] = v.strip()
                        break
                rec["body"] = body[http_end + 4 :]
        yield rec


def parse_warc_blob(path: str, blob: bytes) -> list[dict]:
    recs = []
    for rec in iter_warc_records(blob):
        rec["warc_file"] = path
        recs.append(rec)
    return recs


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC file(s) into the :data:`WARC_SCHEMA` frame.

    One task per file (see module docstring for why that is the right
    scale unit); the glob accepts a directory or a pattern.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_blob(p, bytes(blob)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "content_length",
                    "http_status", "http_content_type", "body",
                ],
            )

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def write_warc_files(
    df: DataFrame,
    out_dir: str,
    file_col: str = "warc_file",
    gzip_members: bool = True,
) -> DataFrame:
    """Export (``file_col``, ``target_uri``, ``warc_date``,
    ``record_id``, ``body``[, ``http_status``, ``http_content_type``])
    rows as one WARC file per distinct ``file_col`` value, each record
    an HTTP response.  The task owning a group writes its file — no
    driver round-trip; returns (warc_file, n_records, n_bytes) per
    file written.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf):
        import os as _os

        import pandas as pd

        pdf = pdf.sort_values("record_id", kind="mergesort")
        recs = []
        for r in pdf.itertuples():
            # warc-read output carries null http_status /
            # http_content_type for non-response records (warcinfo,
            # request); pandas surfaces those as NaN, so int()/`or`
            # alone would crash / emit a literal "nan" header.
            status = getattr(r, "http_status", None)
            status = 200 if status is None or pd.isna(status) else int(status)
            ct = getattr(r, "http_content_type", None)
            ct = "text/html" if ct is None or pd.isna(ct) else str(ct)
            http = synthesize_http_response(
                bytes(r.body), status=status, content_type=str(ct)
            )
            recs.append(
                synthesize_warc_record(
                    "response",
                    http,
                    record_id=str(r.record_id),
                    target_uri=str(r.target_uri),
                    warc_date=str(r.warc_date),
                    content_type="application/http; msgtype=response",
                )
            )
        blob = synthesize_warc(recs, gzip_members=gzip_members)
        name = str(pdf[file_col].iloc[0])
        dest = _os.path.join(out_dir, name)
        with open(dest, "wb") as fh:
            fh.write(blob)
        return pd.DataFrame(
            {
                "warc_file": [name],
                "n_records": [len(recs)],
                "n_bytes": [len(blob)],
            }
        )

    return df.groupBy(file_col).applyInPandas(
        write_group, "warc_file string, n_records bigint, n_bytes bigint"
    )


def _warc_reader(spark: SparkSession, path: str, config) -> DataFrame:
    return read_warc(spark, path)


def register() -> None:
    from minerva_etl_spark.sources.plugins import register_plugin

    register_plugin("warc", _warc_reader)


register()
