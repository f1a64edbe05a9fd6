"""CDXJ crawl-index ingest (round 13) — the URL-index sibling of the
WET/WAT derivatives in `sources/wet.py`.

Common Crawl (and every pywb-style archive) publishes a per-crawl
URL index in CDXJ: one line per capture —

    ``<SURT urlkey> <timestamp> <JSON block>``

where the SURT key is the canonicalized reversed-host form
(``com,example)/path``), the timestamp is 14-digit
``yyyyMMddHHmmss``, and the JSON block carries url / mime / status /
digest / length / offset / filename (the WARC member coordinates a
fetcher needs for range requests).  Crawl-scale dedup, recrawl
scheduling and partition pruning all start from this index, not from
the WARC payloads.

The reader is Spark-native: ``spark.read.text`` (parallel line
splits, predicate pushdown on nothing to block), ONE codegen
projection splitting the two space-delimited head fields and
extracting the JSON fields with ``get_json_object`` — no Python.
SURT keys parse back into ``host`` (labels un-reversed) and ``path``
with Catalyst expressions; the timestamp becomes a real
``timestamp_ntz``.

The writer mirrors for fixture/export parity (sorted lines — CDX
files are sorted by urlkey so mergesort-joins over shards work).

Reference parity: harvest-plugin family (`sources/plugins.py`),
registered as ``cdxj``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["read_cdxj", "write_cdxj", "surt_key_expr",
           "recrawl_candidates"]


def surt_key_expr(url_col: str) -> str:
    """SURT urlkey from a URL column, pure Catalyst: host labels
    reversed and comma-joined, lowercased, default ports dropped,
    ``)`` before the path, query kept (the pywb convention this
    module writes and reads)."""
    host = f"lower(parse_url({url_col}, 'HOST'))"
    path = f"coalesce(parse_url({url_col}, 'PATH'), '/')"
    query = f"parse_url({url_col}, 'QUERY')"
    rev = (
        f"array_join(reverse(split({host}, '\\\\.')), ',')"
    )
    return (
        f"concat({rev}, ')', CASE WHEN {path} = '' THEN '/' "
        f"ELSE {path} END, "
        f"CASE WHEN {query} IS NULL THEN '' "
        f"ELSE concat('?', {query}) END)"
    )


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ file(s) → typed capture rows: ``(urlkey, ts, host, url,
    mime, status, digest, warc_file, warc_offset, warc_length)``.
    One codegen projection over ``spark.read.text`` — malformed
    lines (no JSON block) drop, the dirty-delivery convention."""
    lines = spark.read.text(path).select(
        F.col("value").alias("line")
    )
    j = F.expr("substring(line, instr(line, '{'))")
    head = F.expr("substring(line, 1, instr(line, '{') - 1)")
    parts = F.split(F.trim(head), " ")
    return (
        lines.filter(F.expr("instr(line, '{') > 1"))
        .select(
            parts.getItem(0).alias("urlkey"),
            F.to_timestamp(
                parts.getItem(1), "yyyyMMddHHmmss"
            ).cast("timestamp_ntz").alias("ts"),
            j.alias("__j"),
        )
        .select(
            "urlkey",
            "ts",
            F.expr(
                "array_join(reverse(split("
                "substring_index(urlkey, ')', 1), ',')), '.')"
            ).alias("host"),
            F.get_json_object("__j", "$.url").alias("url"),
            F.get_json_object("__j", "$.mime").alias("mime"),
            F.get_json_object("__j", "$.status").cast("int")
            .alias("status"),
            F.get_json_object("__j", "$.digest").alias("digest"),
            F.get_json_object("__j", "$.filename").alias("warc_file"),
            F.get_json_object("__j", "$.offset").cast("bigint")
            .alias("warc_offset"),
            F.get_json_object("__j", "$.length").cast("bigint")
            .alias("warc_length"),
        )
    )


def write_cdxj(
    df: DataFrame,
    out_dir: str,
    file_col: str = "cdx_file",
) -> DataFrame:
    """Export capture rows (``cdx_file``, ``urlkey``, ``ts``
    timestamp, ``url``, ``mime``, ``status``, ``digest``,
    ``warc_file``, ``warc_offset``, ``warc_length``) as CDXJ shards —
    one file per ``file_col`` group, lines SORTED by (urlkey, ts)
    per the format's merge contract; the owning task writes its
    file."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_group(pdf):
        import json as _json
        import os as _os

        import pandas as pd

        pdf = pdf.sort_values(
            ["urlkey", "ts"], kind="mergesort"
        )
        name = str(pdf[file_col].iloc[0])
        with open(_os.path.join(out_dir, name), "w") as fh:
            for r in pdf.itertuples():
                blob = _json.dumps(
                    {
                        "url": r.url,
                        "mime": r.mime,
                        "status": str(int(r.status)),
                        "digest": r.digest,
                        "length": str(int(r.warc_length)),
                        "offset": str(int(r.warc_offset)),
                        "filename": r.warc_file,
                    },
                    sort_keys=True,
                )
                ts14 = pd.Timestamp(r.ts).strftime("%Y%m%d%H%M%S")
                fh.write(f"{r.urlkey} {ts14} {blob}\n")
        return pd.DataFrame(
            {"cdx_file": [name], "n_lines": [len(pdf)]}
        )

    return df.groupBy(file_col).applyInPandas(
        write_group, "cdx_file string, n_lines bigint"
    )


def _cdxj_reader(spark: SparkSession, path: str, config) -> DataFrame:
    return read_cdxj(spark, path)


def register() -> None:
    from minerva_etl_spark.sources.plugins import register_plugin

    register_plugin("cdxj", _cdxj_reader)


register()


#: the capture-state schema the incremental index persists — exactly
#: the columns `recrawl_candidates` consumes.  The persisted table
#: additionally carries an ``epoch bigint`` bookkeeping column (-1
#: for batch deliveries): the streaming wrapper stamps each
#: delivery's foreachBatch epoch so a retry can detect that an
#: append ALREADY landed (the exactly-once mechanism in
#: `streaming/cdx.py`) — readers always project ``_STATE_COLS``, so
#: the column never leaks into recrawl output.
_STATE_COLS = ["urlkey", "url", "ts", "status", "digest"]
_EPOCH_COL = "epoch"


def _stamp_epoch(df: DataFrame, epoch: int | None) -> DataFrame:
    return df.select(*_STATE_COLS).withColumn(
        _EPOCH_COL,
        F.lit(int(-1 if epoch is None else epoch)).cast("bigint"),
    )


def build_capture_state(
    spark: SparkSession,
    captures: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    path: str | None = None,
) -> int:
    """Persist CDX capture rows as a catalog-backed state table
    ``bucketBy(n_buckets, urlkey)`` sorted by (urlkey, ts) — the
    crawl-scale index layout: every later delivery's history read and
    the recrawl window's ``partitionBy(urlkey)`` consume the state
    WITHOUT an exchange (the `build_substring_state_bucketed`
    strategy applied to the URL index).  Returns the row count."""
    from minerva_etl_spark.fsutil import StoreLease

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    root = path or f"{warehouse}/{table_name}"
    with StoreLease(spark, root + ".__lease"):
        writer = (
            _stamp_epoch(captures, None)
            .write.mode("overwrite")
            .bucketBy(n_buckets, "urlkey")
            .sortBy("urlkey", "ts")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
        return spark.table(table_name).count()


def epoch_in_state(
    spark: SparkSession, table_name: str, epoch: int
) -> bool:
    """Whether any capture stamped with ``epoch`` is already
    persisted — the streaming retry's landed-append probe.  Cheap:
    parquet min/max stats prune the scan to at most the files the
    epoch wrote."""
    spark.sql(f"REFRESH TABLE {table_name}")
    return bool(
        spark.table(table_name)
        .filter(F.col(_EPOCH_COL) == int(epoch))
        .take(1)
    )


def ingest_captures_increment(
    spark: SparkSession,
    delta: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    path: str | None = None,
    epoch: int | None = None,
) -> DataFrame:
    """One crawl delivery against the bucketed capture state: append
    the delta's captures (stamped with ``epoch`` when the streaming
    wrapper supplies one) and return :func:`recrawl_candidates` for
    exactly the urlkeys the delta TOUCHED — equal to the full-index
    recompute restricted to those keys (the incremental-state
    contract every dedup family here follows).

    Scale shape: per-delivery cost follows the DELTA's key set — the
    delta's distinct urlkeys broadcast into a semi-join against the
    bucketed state scan (no exchange on the history side), and the
    recrawl window's hash-partitioning matches the bucket layout.
    The output is pinned (localCheckpoint) BEFORE the state mutates,
    so a failed append never yields decisions from half-written
    state."""
    from minerva_etl_spark.fsutil import StoreLease

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    root = path or f"{warehouse}/{table_name}"
    with StoreLease(spark, root + ".__lease"):
        if not spark.catalog.tableExists(table_name):
            raise ValueError(
                f"ingest_captures_increment: state table "
                f"{table_name} does not exist — build it with "
                f"build_capture_state first"
            )
        hist = spark.table(table_name)
        keys = delta.select("urlkey").distinct()
        touched = hist.join(F.broadcast(keys), "urlkey")
        all_caps = touched.select(*_STATE_COLS).unionByName(
            delta.select(*_STATE_COLS)
        )
        out = recrawl_candidates(all_caps).localCheckpoint(eager=True)
        writer = (
            _stamp_epoch(delta, epoch)
            .write.mode("append")
            .bucketBy(n_buckets, "urlkey")
            .sortBy("urlkey", "ts")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
    return out


def recrawl_candidates(captures: DataFrame) -> DataFrame:
    """The index workflow a recrawl scheduler runs over CDX captures
    (r13): per ``urlkey``, order captures by ``ts`` and keep the
    LATEST, carrying ``n_captures``, whether the latest payload
    digest CHANGED vs the previous capture (content churn — the
    recrawl-priority signal), and the seconds since the previous
    capture.  One window over (urlkey, ts) — Spark sorts within the
    urlkey partition, no global sort; single-capture URLs report
    ``changed = NULL`` (no baseline), the honest tri-state.

    Returns ``(urlkey, url, ts, status, digest, n_captures, changed,
    secs_since_prev)``.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("urlkey").orderBy(F.col("ts").asc())
    enriched = captures.select(
        "urlkey", "url", "ts", "status", "digest",
        F.lag("digest").over(w).alias("__prev_digest"),
        F.lag("ts").over(w).alias("__prev_ts"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("urlkey")
        ).alias("n_captures"),
    )
    return (
        enriched.filter(F.col("__rn") == F.col("n_captures"))
        .select(
            "urlkey",
            "url",
            "ts",
            "status",
            "digest",
            F.col("n_captures").cast("int").alias("n_captures"),
            F.when(
                F.col("__prev_digest").isNotNull(),
                F.col("digest") != F.col("__prev_digest"),
            ).alias("changed"),
            # timestampdiff, not unix_timestamp: ntz values must
            # subtract tz-independently under ANY session timezone
            F.when(
                F.col("__prev_ts").isNotNull(),
                F.expr("timestampdiff(SECOND, __prev_ts, ts)"),
            ).cast("bigint").alias("secs_since_prev"),
        )
    )
