"""Common Crawl WET / WAT derivative formats (round 13).

Most LLM text pipelines never touch raw WARC: they consume the crawl's
two derivative products — **WET** (extracted plain text: WARC
``conversion`` records, ``Content-Type: text/plain``, UTF-8 body) and
**WAT** (per-page metadata: WARC ``metadata`` records whose JSON
envelope carries the response headers, HTML title and outgoing
links).  Both are ordinary WARC containers, so the readers here are
thin typed layers over `sources/warc.py::read_warc` — same
one-task-per-file scale unit, same gzip-member streaming — followed
by pure-Catalyst projections (UTF-8 decode for WET;
``get_json_object`` envelope extraction for WAT — no Python in the
JSON path).

Writers mirror the readers for fixture/export parity
(`write_warc_files` precedent: the task owning a file group writes
it, no driver round-trip), emitting byte-deterministic gzip members.

Reference parity: the reference's harvest plugins parse structured
text deliveries (`src/harvest/`); WET/WAT are this repo's crawl-arc
equivalents, registered as ``wet`` / ``wat`` harvest plugins beside
csv/parquet/jsonl/warc/tar/zip/orc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.sources.warc import (
    read_warc,
    synthesize_warc,
    synthesize_warc_record,
)

__all__ = [
    "read_wet",
    "read_wat",
    "write_wet_files",
    "write_wat_files",
]

#: output schema of :func:`read_wet`
WET_SCHEMA = (
    "warc_file string, record_id string, target_uri string, "
    "warc_date string, text string, n_chars int"
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET file(s) → one row per ``conversion`` record with the
    extracted text decoded as UTF-8 (the format's contract)."""
    recs = read_warc(spark, path)
    return (
        recs.filter(F.col("warc_type") == "conversion")
        .filter(F.col("content_type").startswith("text/plain"))
        .select(
            "warc_file",
            "record_id",
            "target_uri",
            "warc_date",
            F.decode(F.col("body"), "UTF-8").alias("text"),
        )
        .withColumn("n_chars", F.length("text").cast("int"))
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT file(s) → one row per ``metadata`` record with the
    envelope's corpus-relevant fields extracted via
    ``get_json_object`` (whole-stage codegen, no Python):
    ``target_uri`` (the envelope's WARC header copy beats the record
    header when present), HTML ``title``, ``n_links`` (outgoing link
    count) and the HTTP ``content_type``."""
    recs = read_warc(spark, path)
    env = "$['Envelope']"
    hdr = f"{env}['WARC-Header-Metadata']"
    http = (
        f"{env}['Payload-Metadata']['HTTP-Response-Metadata']"
    )
    html = f"{http}['HTML-Metadata']"
    j = F.decode(F.col("body"), "UTF-8")
    return (
        recs.filter(F.col("warc_type") == "metadata")
        .filter(F.col("content_type").startswith("application/json"))
        .select(
            "warc_file",
            "record_id",
            F.coalesce(
                F.get_json_object(j, f"{hdr}['WARC-Target-URI']"),
                F.col("target_uri"),
            ).alias("target_uri"),
            "warc_date",
            F.get_json_object(
                j, f"{html}['Head']['Title']"
            ).alias("title"),
            F.coalesce(
                F.json_array_length(
                    F.get_json_object(j, f"{html}['Links']")
                ),
                F.lit(0),
            ).cast("int").alias("n_links"),
            F.get_json_object(
                j, f"{http}['Headers']['Content-Type']"
            ).alias("http_content_type"),
        )
    )


def wat_links(spark: SparkSession, path: str) -> DataFrame:
    """The OUTLINK EDGES of WAT metadata (r14) — what `read_wat`'s
    ``n_links`` counts, exploded and resolved: one row per link with
    the destination URL resolved against the source page (absolute,
    protocol-relative ``//host/..``, root-relative ``/path``, and
    directory-relative forms) and the src/dst HOSTS extracted — the
    rows a web-graph build (host-level PageRank, link-spam scoring,
    crawl frontier expansion) consumes.  Entirely codegen:
    ``from_json`` over the envelope's Links array + ``posexplode`` +
    regexp host math; no Python in the path.

    Returns ``(src_uri, src_host, link_pos, url, dst_host,
    external)``."""
    recs = read_warc(spark, path)
    env = "$['Envelope']"
    hdr = f"{env}['WARC-Header-Metadata']"
    http = f"{env}['Payload-Metadata']['HTTP-Response-Metadata']"
    html = f"{http}['HTML-Metadata']"
    j = F.decode(F.col("body"), "UTF-8")
    base = (
        recs.filter(F.col("warc_type") == "metadata")
        .filter(F.col("content_type").startswith("application/json"))
        .select(
            F.coalesce(
                F.get_json_object(j, f"{hdr}['WARC-Target-URI']"),
                F.col("target_uri"),
            ).alias("src_uri"),
            F.from_json(
                F.get_json_object(j, f"{html}['Links']"),
                "array<struct<url:string>>",
            ).alias("__links"),
        )
        .filter(F.col("__links").isNotNull())
        .select(
            "src_uri",
            F.posexplode("__links").alias("link_pos", "__l"),
        )
        .select("src_uri", "link_pos", F.col("__l.url").alias("__raw"))
        .filter(F.col("__raw").isNotNull())
    )
    # query/fragment stripped FIRST (RFC 3986 §5.3 merge works on
    # the path): a page like http://h/p?x=/y must resolve 'a.html'
    # from the path directory http://h/, not from inside the query
    # string — and a query-before-any-slash URL must not leak '?…'
    # into the extracted host
    stripped = "regexp_extract(src_uri, '^([^?#]*)', 1)"
    scheme = f"regexp_extract({stripped}, '^([a-z][a-z0-9+.-]*):', 1)"
    host = (
        f"regexp_extract({stripped}, "
        "'^[a-z][a-z0-9+.-]*://([^/]+)', 1)"
    )
    # src directory for relative resolution: everything through the
    # last '/' of the path (scheme://host/ when the path is bare)
    src_dir = (
        f"CASE WHEN {stripped} RLIKE "
        "'^[a-z][a-z0-9+.-]*://[^/]+/.*/' "
        f"THEN regexp_extract({stripped}, '^(.*/)', 1) "
        f"ELSE concat({scheme}, '://', {host}, '/') END"
    )
    resolved = f"""
CASE
  WHEN __raw RLIKE '^[a-z][a-z0-9+.-]*://' THEN __raw
  WHEN __raw LIKE '//%' THEN concat({scheme}, ':', __raw)
  WHEN __raw LIKE '/%' THEN concat({scheme}, '://', {host}, __raw)
  ELSE concat({src_dir}, __raw)
END
"""
    return base.select(
        "src_uri",
        F.expr(host).alias("src_host"),
        "link_pos",
        F.expr(resolved).alias("url"),
    ).select(
        "src_uri",
        "src_host",
        "link_pos",
        "url",
        F.expr(
            "regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]+)', 1)"
        ).alias("dst_host"),
    ).withColumn(
        "external", F.col("dst_host") != F.col("src_host")
    )


def _write_records(
    df: DataFrame,
    out_dir: str,
    warc_type: str,
    content_type: str,
    body_builder,
    file_col: str = "warc_file",
    gzip_members: bool = True,
) -> DataFrame:
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf):
        import os as _os

        import pandas as pd

        pdf = pdf.sort_values("record_id", kind="mergesort")
        recs = [
            synthesize_warc_record(
                warc_type,
                body_builder(r),
                record_id=str(r.record_id),
                target_uri=str(r.target_uri),
                warc_date=str(r.warc_date),
                content_type=content_type,
            )
            for r in pdf.itertuples()
        ]
        blob = synthesize_warc(recs, gzip_members=gzip_members)
        name = str(pdf[file_col].iloc[0])
        with open(_os.path.join(out_dir, name), "wb") as fh:
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


def write_wet_files(
    df: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """Export (``warc_file``, ``record_id``, ``target_uri``,
    ``warc_date``, ``text``) rows as WET files — one ``conversion``
    record per row, UTF-8 body."""
    return _write_records(
        df.select(
            "warc_file", "record_id", "target_uri", "warc_date", "text"
        ),
        out_dir,
        "conversion",
        "text/plain",
        lambda r: str(r.text).encode("utf-8"),
        gzip_members=gzip_members,
    )


def write_wat_files(
    df: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """Export (``warc_file``, ``record_id``, ``target_uri``,
    ``warc_date``, ``meta_json``) rows as WAT files — one
    ``metadata`` record per row, JSON envelope body."""
    return _write_records(
        df.select(
            "warc_file", "record_id", "target_uri", "warc_date",
            "meta_json",
        ),
        out_dir,
        "metadata",
        "application/json",
        lambda r: str(r.meta_json).encode("utf-8"),
        gzip_members=gzip_members,
    )


def _wet_reader(spark: SparkSession, path: str, config) -> DataFrame:
    return read_wet(spark, path)


def _wat_reader(spark: SparkSession, path: str, config) -> DataFrame:
    return read_wat(spark, path)


def register() -> None:
    from minerva_etl_spark.sources.plugins import register_plugin

    register_plugin("wet", _wet_reader)
    register_plugin("wat", _wat_reader)


register()
