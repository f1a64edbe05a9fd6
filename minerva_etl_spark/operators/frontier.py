"""Incremental crawl-frontier state: a persisted seen-URL set.

The crawl arc's stateful tail: sitemaps (`operators/sitemap.py`) and
feeds (`operators/feeds.py`) produce candidate URLs every poll;
`frontier_build` filters and caps them; this module answers the
remaining question — *which of these have we already fetched?* —
without rescanning history, exactly like the incremental dedup /
embedding states (`operators/incremental.py`): the state is a
parquet of (url_key, url) rows, a delivery anti-joins its normalized
keys against it, and only NEW keys are appended, all under the store
lease so concurrent deliveries serialize (reference analog: the
single-writer modified-log discipline of
`src/minerva/storage/trend/trendstorepart.py`).

URL normalization (the dedup key) is pure Catalyst — no UDF:
scheme and host lowercased, default ports stripped (``:80`` for
http, ``:443`` for https; other ports kept), empty path becomes
``/``, query kept verbatim, fragment dropped.  A real frontier wants
exactly this key: ``HTTPS://Ex.TEST/p#sec`` and
``https://ex.test/p`` are one fetch.  (Userinfo URLs —
``user@host`` — are out of scope, as in `operators/urlops.py`.)

Scale shape: the decision is one broadcast-or-shuffle anti-join of
the delivery (small) against the state keyed by ``url_key`` (md5 —
uniformly distributed, no hot keys by construction); the append
writes only the new keys.  History URLs are never re-normalized —
the state stores the key.  At 100 TB-of-history scale the state
should be bucketed by ``url_key`` so the join co-locates without a
shuffle of the history side; the parquet layout here is the local
twin of that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from minerva_etl_spark.fsutil import StoreLease, parquet_exists

FRONTIER_DECISION_SCHEMA = "url string, url_key string, is_new boolean"


def normalize_url_expr(url_col: str) -> Column:
    """The canonical fetch-identity of a URL, as a Catalyst
    expression (whole-stage codegen, no Python)."""
    proto = F.lower(F.expr(f"parse_url({url_col}, 'PROTOCOL')"))
    host = F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    # anchored to THIS url's authority (scheme at string start, port
    # as the authority's last colon-digits before path/query/end) — an
    # unanchored '://.*:(\d+)' would steal a port from a URL embedded
    # in the query string
    port = F.regexp_extract(
        F.col(url_col),
        r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*:(\d+)(?=[/?#]|$)",
        1,
    )
    path = F.expr(f"parse_url({url_col}, 'PATH')")
    query = F.expr(f"parse_url({url_col}, 'QUERY')")
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        F.when(path == "", "/").otherwise(path),
        F.when(
            query.isNotNull() & (query != ""),
            F.concat(F.lit("?"), query),
        ).otherwise(""),
    )


def frontier_delta(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per DISTINCT normalized URL of a delivery:
    (url, url_key).  ``url`` is the normalized form — the state never
    stores two spellings of one fetch."""
    norm = urls.select(normalize_url_expr(url_col).alias("url")).where(
        F.col("url").isNotNull() & (F.col("url") != "")
    )
    return norm.distinct().select(
        "url", F.md5("url").alias("url_key")
    )


def read_frontier_state(spark: SparkSession, path: str) -> DataFrame:
    if not parquet_exists(spark, path):
        raise FileNotFoundError(f"no frontier state at {path}")
    return spark.read.parquet(path)


def _decide(delta: DataFrame, history: DataFrame) -> DataFrame:
    """(url, url_key, is_new) for a normalized delta vs a history of
    ``url_key`` rows — one left join, pinned before the state
    mutates."""
    seen = history.select("url_key").distinct().withColumn(
        "__seen", F.lit(True)
    )
    return (
        delta.join(seen, "url_key", "left")
        .select(
            "url", "url_key",
            F.col("__seen").isNull().alias("is_new"),
        )
        .localCheckpoint(eager=True)
    )


def ingest_frontier_increment(
    spark: SparkSession,
    new_urls: DataFrame,
    state_path: str,
    url_col: str = "url",
) -> DataFrame:
    """The poll cycle: normalize + dedup the delivery, decide
    new-vs-seen against the persisted state, append ONLY the new keys,
    return per-URL decisions (url, url_key, is_new).  First delivery
    bootstraps an empty state.

    The store lease spans read-state → decide → append (the
    `ingest_increment` rule): two concurrent polls serialize, so the
    second sees the first's URLs and never double-schedules a fetch.
    Normalization of the delta runs BEFORE the lease is taken.
    """
    delta = frontier_delta(new_urls, url_col).localCheckpoint(
        eager=True
    )  # normalized once, outside the lease; reused by decide + append
    with StoreLease(spark, state_path.rstrip("/") + ".__lease"):
        if parquet_exists(spark, state_path):
            history = spark.read.parquet(state_path)
        else:
            history = spark.createDataFrame([], "url_key string")
        out = _decide(delta, history)
        out.where("is_new").select("url_key", "url").write.mode(
            "append"
        ).parquet(state_path)
    return out


def ingest_frontier_increment_bucketed(
    spark: SparkSession,
    new_urls: DataFrame,
    table_name: str,
    url_col: str = "url",
    n_buckets: int = 64,
    path: str | None = None,
) -> DataFrame:
    """The catalog-backed variant of :func:`ingest_frontier_increment`
    for 100 TB-of-history scale: the state lives as a table
    ``bucketBy(n_buckets, url_key)`` (`store/bucketed.py` strategy),
    so each poll's decision join reads history WITHOUT an exchange —
    only the (small) delta shuffles to the bucket layout.  Appends
    preserve the bucketing spec; same lease discipline, same
    decisions, proven equal to the parquet-path variant by test.
    """
    delta = frontier_delta(new_urls, url_col).localCheckpoint(
        eager=True
    )
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    lease_scope = (path or f"{warehouse}/{table_name}") + ".__lease"
    with StoreLease(spark, lease_scope):
        if spark.catalog.tableExists(table_name):
            history = spark.table(table_name)
        else:
            history = spark.createDataFrame([], "url_key string")
        out = _decide(delta, history)
        writer = (
            out.where("is_new")
            .select("url_key", "url")
            .write.mode("append")
            .bucketBy(n_buckets, "url_key")
            .sortBy("url_key")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
    return out
