"""Gate rows: crawl harvest, URL index, frontier arc.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table

from minerva_etl_spark.gate_common import (
    _PAGERANK_EDGES_SQL,
    _ascii_sanitize,
    _ascii_sanitize_col,
    _ascii_sanitize_sql,
    _prep,
)



def q_pagerank_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer PageRank (`operators/pagerank.py::pagerank` —
    crawl-frontier authority scoring, r12): three damped rounds over a
    deterministic doc-id link graph (hubs + chains + dangling mass),
    every arithmetic step integer so any partitioning of either
    engine lands bit-identically on the 10¹² rank grid.  Per round:
    one edge-vs-ranks equi-join + one combinable groupBy — the
    textbook iterative-Spark shape with an oracle that unrolls the
    recurrence closed-form."""
    _prep(spark)
    from minerva_etl_spark.operators.pagerank import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.sequence(F.lit(1), F.lit(1) + F.col("doc_id") % 3)
        ).alias("k"),
    ).select(
        "src",
        ((F.col("src") * 7 + F.col("k")) % F.lit(n)).alias("dst"),
        (F.col("src") * 7 + F.col("k")).alias("__raw"),
    ).where(F.col("__raw") != F.col("src")).drop("__raw")
    return pagerank(edges, iters=3, damping_pct=85)


def _oracle_pagerank_crawl() -> str:
    from minerva_etl_spark.operators.pagerank import pagerank_oracle_sql

    return pagerank_oracle_sql(
        _PAGERANK_EDGES_SQL, iters=3, damping_pct=85
    )


def q_pipeline_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused crawl-harvest pipeline, end to end: documents become
    HTML pages (the html_extract template), encoded per a charset
    scenario (even docs UTF-8 with a BOM, odd docs latin-1 with an
    ISO-8859-1 HTTP header), wrapped in HTTP responses (404 when
    doc_id % 7 = 0), written as REAL record-gzipped WARC files by the
    owning tasks, then harvested back: `read_warc` → status filter →
    `decode_text` (browser charset order; the BOM must be stripped) →
    `html_extract` → `with_token_count` → keep docs with ≥ 50 tokens.
    Five operators composed; the oracle replays the surviving rows
    closed-form (title, exact text, token count) — ANY stage breaking
    (offsets, charset, extraction, counting, filtering) shifts the
    hash."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.charset import decode_text
    from minerva_etl_spark.operators.html import html_extract
    from minerva_etl_spark.operators.text import with_token_count
    from minerva_etl_spark.sources.warc import (
        read_warc,
        write_warc_files,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                html = (
                    f"<html><head><title>Doc {d}</title></head>"
                    f"<body><p>{t}</p></body></html>"
                )
                if d % 2 == 0:
                    body = b"\xef\xbb\xbf" + html.encode()
                    ct = "text/html"
                else:
                    body = html.encode("latin-1")
                    ct = "text/html; charset=iso-8859-1"
                rows.append(
                    (
                        f"part-{d % 8}.warc.gz",
                        f"doc-{d:09d}",
                        f"https://corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        body,
                        404 if d % 7 == 0 else 200,
                        ct,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_id", "target_uri", "warc_date",
                    "body", "http_status", "http_content_type",
                ],
            )

    staged = docs.mapInPandas(
        synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, body binary, http_status int, "
        "http_content_type string",
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_crawl_")
    write_warc_files(staged, root).collect()
    recs = (
        read_warc(spark, root)
        .where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("bigint")
            .alias("doc_id"),
            "http_content_type",
            "body",
        )
    )
    decoded = decode_text(
        recs, body_col="body", content_type_col="http_content_type"
    )
    pages = html_extract(decoded.withColumnRenamed("text", "html"))
    out = (
        with_token_count(pages)
        .where(F.col("n_tokens") >= 50)
        .select("doc_id", "title", "text", "n_tokens")
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_pipeline_crawl() -> str:
    from minerva_etl_spark.operators.text import tokens_duck_sql

    toks = tokens_duck_sql("text")
    return f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text
  FROM documents
), kept AS (
  SELECT doc_id, text,
         CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM san WHERE doc_id % 7 <> 0
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       text,
       n_tokens
FROM kept WHERE n_tokens >= 50
"""


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (`operators/sitemap.py::sitemap_urls`, stdlib
    ElementTree in Arrow-batched tasks): per-doc urlset XML with
    1 + doc_id % 4 entries — loc/lastmod/changefreq/priority all
    formula-derived — where ODD docs carry the real sitemaps.org
    namespace and EVEN docs carry none (both must parse: local-name
    matching).  The oracle regenerates every exploded row with
    UNNEST; a namespace, explode, or field-mapping bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.sitemap import sitemap_urls

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            xmls = []
            for did in pdf["doc_id"]:
                d = int(did)
                ns = (
                    ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
                    if d % 2 else ""
                )
                entries = []
                for i in range(1 + d % 4):
                    cf = ["daily", "weekly", "monthly"][(d + i) % 3]
                    entries.append(
                        f"<url><loc>https://s{d}.com/p/{i}</loc>"
                        f"<lastmod>2026-0{1 + (d + i) % 9}-01</lastmod>"
                        f"<changefreq>{cf}</changefreq>"
                        f"<priority>0.{(d + i) % 10}</priority></url>"
                    )
                xmls.append(
                    f"<urlset{ns}>" + "".join(entries) + "</urlset>"
                )
            yield pd.DataFrame(
                {"sitemap_id": pdf["doc_id"], "xml": xmls}
            )

    maps = docs.mapInPandas(synth, "sitemap_id bigint, xml string")
    return sitemap_urls(maps)


_ORACLE_SITEMAP = """
SELECT doc_id AS sitemap_id,
       'url' AS kind,
       'https://s' || CAST(doc_id AS VARCHAR) || '.com/p/'
         || CAST(t.i AS VARCHAR) AS loc,
       '2026-0' || CAST(1 + (doc_id + t.i) % 9 AS VARCHAR) || '-01'
         AS lastmod,
       CASE (doc_id + t.i) % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
            ELSE 'monthly' END AS changefreq,
       CAST((doc_id + t.i) % 10 AS DOUBLE) / 10 AS priority
FROM documents,
     UNNEST(generate_series(0, doc_id % 4)) AS t(i)
"""


def q_frontier_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier composition — the crawl twin of
    `pipeline_crawl`'s harvest edge: per-doc sitemap XML →
    `sitemap.sitemap_urls` (stdlib ElementTree, Arrow-batched) →
    `urlops.with_url_parts` (pure Catalyst) → `robots.filter_allowed`
    (dedupe + broadcast-able join + mapInPandas parser-cache scan) →
    `skew.cap_per_key` at 20 URLs per registrable domain (two-level
    salted window).  Hosts reuse the four url_profile shapes; every
    third sitemap entry points under /private/, which every non-.org
    host's robots.txt disallows.  The oracle regenerates the exploded
    frontier closed-form (UNNEST), applies the fetchability predicate
    and the per-domain row_number — a bug in ANY of the four composed
    operators (namespace parse, registrable-domain rule, robots
    semantics, cap ordering) shifts the hash."""
    _prep(spark)
    from minerva_etl_spark.operators import skew as SK
    from minerva_etl_spark.operators.robots import filter_allowed
    from minerva_etl_spark.operators.sitemap import sitemap_urls
    from minerva_etl_spark.operators.urlops import with_url_parts

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            """
            CASE doc_id % 4
              WHEN 0 THEN concat('www.site',
                                 cast(doc_id % 7 as string), '.com')
              WHEN 1 THEN concat('blog.site',
                                 cast(doc_id % 5 as string), '.co.uk')
              WHEN 2 THEN concat('cdn.site',
                                 cast(doc_id % 3 as string), '.io')
              ELSE concat('site', cast(doc_id % 11 as string), '.org')
            END
            """
        ).alias("host"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            xmls = []
            for did, host in zip(pdf["doc_id"], pdf["host"]):
                d = int(did)
                entries = []
                for i in range(1 + d % 4):
                    seg = "private" if (d + i) % 3 == 2 else "a"
                    entries.append(
                        f"<url><loc>https://{host}/{seg}/{d}-{i}"
                        "</loc></url>"
                    )
                ns = (
                    ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
                    if d % 2 else ""
                )
                xmls.append(
                    f"<urlset{ns}>" + "".join(entries) + "</urlset>"
                )
            yield pd.DataFrame(
                {"sitemap_id": pdf["doc_id"], "xml": xmls}
            )

    maps = docs.mapInPandas(synth, "sitemap_id bigint, xml string")
    urls = sitemap_urls(maps).select(
        "sitemap_id", F.col("loc").alias("url")
    )
    parts = with_url_parts(urls, "url")
    robots = (
        docs.select("host")
        .distinct()
        .where(~F.col("host").endswith(".org"))
        .select(
            "host",
            F.lit("User-agent: *\nDisallow: /private/").alias(
                "robots_txt"
            ),
        )
    )
    fetchable = filter_allowed(parts, robots, agent="minerva-spark")
    capped = SK.cap_per_key(
        fetchable,
        keys=["registrable_domain"],
        order_by=[F.col("url").asc()],
        n=20,
        salt_col="url",
        salt_buckets=8,
    )
    return capped.select(
        "sitemap_id", "url", "host", "registrable_domain",
        F.col("rank").cast("int").alias("rank"),
    )


_ORACLE_FRONTIER = r"""
WITH pairs AS (
  SELECT doc_id, t.i AS i,
    CASE doc_id % 4
      WHEN 0 THEN 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      WHEN 1 THEN 'blog.site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      WHEN 2 THEN 'cdn.site' || CAST(doc_id % 3 AS VARCHAR) || '.io'
      ELSE 'site' || CAST(doc_id % 11 AS VARCHAR) || '.org'
    END AS host
  FROM documents, UNNEST(generate_series(0, doc_id % 4)) AS t(i)
), u AS (
  SELECT doc_id AS sitemap_id, host,
    'https://' || host || '/'
      || CASE WHEN (doc_id + i) % 3 = 2 THEN 'private' ELSE 'a' END
      || '/' || CAST(doc_id AS VARCHAR) || '-' || CAST(i AS VARCHAR)
      AS url,
    CASE WHEN doc_id % 4 = 1
         THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
         ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
    END AS registrable_domain,
    (doc_id % 4 = 3 OR (doc_id + i) % 3 <> 2) AS ok
  FROM pairs
), ranked AS (
  SELECT sitemap_id, url, host, registrable_domain,
         row_number() OVER (
           PARTITION BY registrable_domain ORDER BY url ASC) AS rank
  FROM u WHERE ok
)
SELECT sitemap_id, url, host, registrable_domain,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 20
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt politeness (`operators/robots.py::robots_allowed`,
    stdlib robotparser parsed ONCE per host group): per-doc URLs over
    the four url_profile host shapes with a 1-in-3 '/private/' path;
    every non-.org host carries a 'Disallow: /private/' robots.txt,
    .org hosts have NO robots row (left-join miss → the web's
    default-allow).  The oracle computes fetchability closed-form —
    a parser, grouping, or join-miss bug flips `allowed` bits and
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.robots import robots_allowed

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.expr(
            """
            CASE doc_id % 4
              WHEN 0 THEN concat('www.site',
                                 cast(doc_id % 7 as string), '.com')
              WHEN 1 THEN concat('blog.site',
                                 cast(doc_id % 5 as string), '.co.uk')
              WHEN 2 THEN concat('cdn.site',
                                 cast(doc_id % 3 as string), '.io')
              ELSE concat('site', cast(doc_id % 11 as string), '.org')
            END
            """
        ).alias("host"),
        F.expr(
            """
            CASE doc_id % 3
              WHEN 0 THEN ''
              WHEN 1 THEN concat('/a/', cast(doc_id as string))
              ELSE concat('/private/', cast(doc_id as string))
            END
            """
        ).alias("path"),
    ).select(
        "doc_id",
        "host",
        F.concat(F.lit("https://"), "host", "path").alias("url"),
    )
    robots = (
        urls.select("host")
        .distinct()
        .where(~F.col("host").endswith(".org"))
        .select(
            "host",
            F.lit("User-agent: *\nDisallow: /private/").alias(
                "robots_txt"
            ),
        )
    )
    out = robots_allowed(urls, robots, agent="minerva-spark")
    return out.select(
        "doc_id",
        "url",
        "host",
        F.col("allowed").cast("int").alias("allowed"),
    )


_ORACLE_ROBOTS = """
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      WHEN 1 THEN 'blog.site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      WHEN 2 THEN 'cdn.site' || CAST(doc_id % 3 AS VARCHAR) || '.io'
      ELSE 'site' || CAST(doc_id % 11 AS VARCHAR) || '.org'
    END AS host,
    CASE doc_id % 3
      WHEN 0 THEN ''
      WHEN 1 THEN '/a/' || CAST(doc_id AS VARCHAR)
      ELSE '/private/' || CAST(doc_id AS VARCHAR)
    END AS path
  FROM documents
)
SELECT doc_id,
       'https://' || host || path AS url,
       host,
       CAST(CASE WHEN doc_id % 4 = 3 OR doc_id % 3 <> 2
                 THEN 1 ELSE 0 END AS INT) AS allowed
FROM u
"""


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset detection + decode (`operators/charset.py::
    decode_text`, the browser resolution order: BOM > HTTP header >
    meta pre-scan > utf-8 default): per-doc payloads cycle five
    real-crawl scenarios — UTF-8 BOM; an ISO-8859-1 HTTP header
    (decoded as windows-1252 per the WHATWG aliasing, with a non-ASCII
    0xE9 byte appended to prove actual transcoding); a <meta charset>
    pre-scan; a UTF-16-LE BOM (stripped from the decoded stream); and
    no hints at all.  The oracle rebuilds the decoded text, the
    resolved charset label, and the resolution source closed-form —
    a priority-order or aliasing bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.charset import decode_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            bodies, cts = [], []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                k = d % 5
                if k == 0:
                    bodies.append(b"\xef\xbb\xbf" + t.encode())
                    cts.append("text/html")
                elif k == 1:
                    bodies.append(t.encode("latin-1") + b"\xe9")
                    cts.append("text/html; charset=ISO-8859-1")
                elif k == 2:
                    bodies.append(
                        b'<meta charset="utf-8"><p>' + t.encode()
                    )
                    cts.append("text/html")
                elif k == 3:
                    bodies.append(b"\xff\xfe" + t.encode("utf-16-le"))
                    cts.append(None)
                else:
                    bodies.append(t.encode())
                    cts.append("text/html")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "body": bodies,
                    "content_type": cts,
                }
            )

    payloads = docs.mapInPandas(
        synth, "doc_id bigint, body binary, content_type string"
    )
    return decode_text(payloads)


_ORACLE_CHARSET = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
  CASE doc_id % 5
    WHEN 1 THEN text || chr(233)
    WHEN 2 THEN '<meta charset="utf-8"><p>' || text
    ELSE text END AS text,
  CASE doc_id % 5 WHEN 0 THEN 'utf-8-sig' WHEN 1 THEN 'windows-1252'
    WHEN 2 THEN 'utf-8' WHEN 3 THEN 'utf-16-le'
    ELSE 'utf-8' END AS charset,
  CASE doc_id % 5 WHEN 0 THEN 'bom' WHEN 1 THEN 'header'
    WHEN 2 THEN 'meta' WHEN 3 THEN 'bom'
    ELSE 'default' END AS charset_source
FROM san
"""


def q_url_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL analysis (`operators/urlops.py::with_url_parts`): per-doc
    synthetic crawl URLs spanning four host shapes (plain .com,
    shared-suffix .co.uk, .io, bare .org), three path depths (0/2/3)
    and a 1-in-5 query string, parsed with Spark's BUILT-IN
    `parse_url` + array expressions — no UDF, whole-stage codegen end
    to end (the deliberate contrast to the codec operators).  The
    oracle rebuilds every derived column with regexps: scheme/host
    split, path-depth count, TLD, and the registrable-domain rule
    (last two labels, three under a shared second-level suffix like
    co.uk)."""
    _prep(spark)
    from minerva_etl_spark.operators.urlops import with_url_parts

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        "doc_id",
        F.expr(
            """
            concat('https://',
              CASE doc_id % 4
                WHEN 0 THEN concat('www.site',
                                   cast(doc_id % 7 as string), '.com')
                WHEN 1 THEN concat('blog.site',
                                   cast(doc_id % 5 as string), '.co.uk')
                WHEN 2 THEN concat('cdn.site',
                                   cast(doc_id % 3 as string), '.io')
                ELSE concat('site', cast(doc_id % 11 as string), '.org')
              END,
              CASE doc_id % 3
                WHEN 0 THEN ''
                WHEN 1 THEN concat('/a/', cast(doc_id as string))
                ELSE concat('/a/b/', cast(doc_id as string))
              END,
              CASE WHEN doc_id % 5 = 0
                   THEN concat('?q=', cast(doc_id as string))
                   ELSE '' END)
            """
        ).alias("url"),
    )
    return with_url_parts(urls, "url").select(
        "doc_id",
        "url",
        "scheme",
        "host",
        "path_depth",
        "tld",
        "registrable_domain",
        F.coalesce("query", F.lit("")).alias("query"),
    )


_ORACLE_URL_PROFILE = r"""
WITH u AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'www.site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      WHEN 1 THEN 'blog.site' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      WHEN 2 THEN 'cdn.site' || CAST(doc_id % 3 AS VARCHAR) || '.io'
      ELSE 'site' || CAST(doc_id % 11 AS VARCHAR) || '.org'
    END AS host,
    CASE doc_id % 3
      WHEN 0 THEN ''
      WHEN 1 THEN '/a/' || CAST(doc_id AS VARCHAR)
      ELSE '/a/b/' || CAST(doc_id AS VARCHAR)
    END AS path,
    CASE WHEN doc_id % 5 = 0 THEN 'q=' || CAST(doc_id AS VARCHAR)
         ELSE '' END AS q
  FROM documents
)
SELECT doc_id,
  'https://' || host || path
    || CASE WHEN q = '' THEN '' ELSE '?' || q END AS url,
  'https' AS scheme,
  host,
  CAST(CASE doc_id % 3 WHEN 0 THEN 0 WHEN 1 THEN 2 ELSE 3 END AS INT)
    AS path_depth,
  regexp_extract(host, '([^.]+)$', 1) AS tld,
  CASE WHEN doc_id % 4 = 1
       THEN regexp_extract(host, '([^.]+\.[^.]+\.[^.]+)$', 1)
       ELSE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
  END AS registrable_domain,
  q AS query
FROM u
"""


def q_warc_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive round-trip (`sources/warc.py`): every doc
    becomes an HTTP response record (status 404 when doc_id % 7 = 0,
    else 200; body = the raw doc text), grouped into 8 files by
    doc_id % 8 and written as REAL record-gzipped WARC files by the
    task owning each group (`write_warc_files`), then read back
    through `read_warc` (one task per file — the Common Crawl scale
    unit, see the module docstring).  The projection pins the gzip
    member walk, WARC header parse, Content-Length body slicing, and
    HTTP unwrap: `http_bytes` is the WARC-level Content-Length, which
    the oracle recomputes closed-form from the synthesized HTTP
    message (status-line length + fixed headers + digits of the body
    length + body), and `text` is the HTTP body decoded — equality
    with `documents.text` proves the offsets byte-exact."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.warc import (
        read_warc,
        write_warc_files,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = docs.select(
        F.concat(
            F.lit("part-"), (F.col("doc_id") % 8).cast("string"),
            F.lit(".warc.gz"),
        ).alias("warc_file"),
        F.format_string("doc-%09d", "doc_id").alias("record_id"),
        F.concat(
            F.lit("https://corpus.test/d/"), F.col("doc_id").cast("string")
        ).alias("target_uri"),
        F.lit("2026-02-03T04:05:06Z").alias("warc_date"),
        F.encode(_ascii_sanitize_col("text"), "UTF-8").alias("body"),
        F.when(F.col("doc_id") % 7 == 0, 404).otherwise(200)
        .alias("http_status"),
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_warc_")
    write_warc_files(staged, root).collect()  # 8 rows of file stats
    out = read_warc(spark, root).select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("bigint")
        .alias("doc_id"),
        F.regexp_extract("warc_file", r"([^/]+)$", 1).alias("warc_file"),
        "record_id",
        "warc_type",
        "warc_date",
        "http_status",
        "http_content_type",
        F.col("content_length").alias("http_bytes"),
        F.decode("body", "UTF-8").alias("text"),
    ).localCheckpoint(eager=True)  # pinned before the dir goes
    shutil.rmtree(root, ignore_errors=True)
    return out


# HTTP message size, closed-form: status line (17 for "HTTP/1.1 200
# OK\r\n", 24 for "HTTP/1.1 404 Not Found\r\n") + "Content-Type:
# text/html\r\n" (25) + "Content-Length: <n>\r\n" (18 + digits) +
# blank line (2) + body (n); text is ASCII so chars == bytes
_ORACLE_WARC_HARVEST = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'part-' || CAST(doc_id % 8 AS VARCHAR) || '.warc.gz' AS warc_file,
       'urn:uuid:doc-' || lpad(CAST(doc_id AS VARCHAR), 9, '0')
         AS record_id,
       'response' AS warc_type,
       '2026-02-03T04:05:06Z' AS warc_date,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INT)
         AS http_status,
       'text/html' AS http_content_type,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 69 ELSE 62 END
            + length(CAST(length(text) AS VARCHAR))
            + length(text) AS BIGINT) AS http_bytes,
       text
FROM san
"""


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-text extraction (`operators/html.py::html_extract`,
    stdlib HTMLParser, Arrow-batched): each doc is wrapped in-task in
    a fixed page template exercising every extraction rule — a
    <title> captured separately, a <script> whose body contains fake
    tags (must be dropped), a <nav> with an `&amp;` entity AND a
    double space (unescape + whitespace collapse), the doc text in a
    <p>, and two <a href> anchors separated by inline text.  The
    oracle rebuilds the exact extracted text by concatenation —
    'menu & more' \\n text \\n 'next top' — so a parser bug in
    skipping, block boundaries, entity decoding, or collapsing
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.html import html_extract

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            pages = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                pages.append(
                    f"<html><head><title>Doc {d}</title>"
                    "<script>var x = \"<p>boiler</p>\";</script></head>"
                    "<body><nav>menu &amp;  more</nav>"
                    f"<p>{t}</p>"
                    f'<a href="/d/{d + 1}">next</a> '
                    '<a href="#top">top</a></body></html>'
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "html": pages})

    pages = docs.mapInPandas(synth, "doc_id bigint, html string")
    return html_extract(pages)


_ORACLE_HTML_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'menu & more' || chr(10) || text || chr(10) || 'next top' AS text,
       CAST(2 AS INT) AS n_links
FROM san
"""


def q_wet_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WET ingest (`sources/wet.py::read_wet` /
    `write_wet_files`, r13): documents become conversion records in
    REAL gzip-membered WET shards written by owning tasks, harvested
    back through the typed reader (warc_type/content-type filters +
    UTF-8 decode).  The oracle rebuilds uri/text/n_chars closed-form;
    a record-frame, filter or decode bug hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.wet import read_wet, write_wet_files

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                t = _ascii_sanitize(str(t))
                rows.append(
                    (
                        f"part-{d % 8}.warc.wet.gz",
                        f"rec-{d:09d}",
                        f"https://corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        f"Doc {d} wet\n{t}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "target_uri",
                         "warc_date", "text"],
            )

    staged = docs.mapInPandas(
        synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, text string",
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_wet_")
    write_wet_files(staged, root).collect()
    out = (
        read_wet(spark, root)
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("bigint").alias("doc_id"),
            "target_uri",
            "text",
            "n_chars",
        )
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_WET_HARVEST = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'https://corpus.test/d/' || CAST(doc_id AS VARCHAR)
         AS target_uri,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' wet' || chr(10) || text
         AS text,
       CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || ' wet')
            + 1 + length(text) AS INT) AS n_chars
FROM san
"""


def q_wat_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WAT ingest (`sources/wet.py::read_wat`, r13):
    documents become metadata records whose JSON envelopes carry the
    response headers, HTML title and a formula-sized Links array,
    written as real gzip-membered WAT shards and harvested back
    through the codegen `get_json_object` extraction (no Python in
    the JSON path).  Docs at doc_id % 11 == 0 OMIT the HTML-Metadata
    block (non-HTML responses — title NULL, links 0), so the
    missing-path semantics are load-bearing."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.wet import read_wat, write_wat_files

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                http = {
                    "Headers": {
                        "Content-Type": "text/html"
                        if d % 3 else "application/pdf"
                    }
                }
                if d % 11 != 0:
                    http["HTML-Metadata"] = {
                        "Head": {"Title": f"Doc {d} title"},
                        "Links": [
                            {"url": f"/l/{d}/{j}"}
                            for j in range(d % 5)
                        ],
                    }
                env = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI":
                                f"https://corpus.test/d/{d}"
                        },
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": http
                        },
                    }
                }
                rows.append(
                    (
                        f"part-{d % 8}.warc.wat.gz",
                        f"rec-{d:09d}",
                        f"https://corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        _json.dumps(env, sort_keys=True),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "target_uri",
                         "warc_date", "meta_json"],
            )

    staged = docs.mapInPandas(
        synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_wat_")
    write_wat_files(staged, root).collect()
    out = (
        read_wat(spark, root)
        .select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("bigint").alias("doc_id"),
            "target_uri",
            "title",
            "n_links",
            "http_content_type",
        )
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_WAT_HARVEST = """
SELECT doc_id,
       'https://corpus.test/d/' || CAST(doc_id AS VARCHAR)
         AS target_uri,
       CASE WHEN doc_id % 11 = 0 THEN NULL
            ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || ' title'
       END AS title,
       CAST(CASE WHEN doc_id % 11 = 0 THEN 0
                 ELSE doc_id % 5 END AS INT) AS n_links,
       CASE WHEN doc_id % 3 = 0 THEN 'application/pdf'
            ELSE 'text/html' END AS http_content_type
FROM documents
"""


def q_cdx_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDXJ crawl-index round trip (`sources/cdx.py`, r13): documents
    become capture rows — SURT urlkeys derived by the pure-Catalyst
    `surt_key_expr`, formula timestamps/status/mime/digest/WARC
    coordinates — written as real sorted CDXJ shards by owning tasks
    and harvested back through the codegen line/JSON projection.
    The oracle rebuilds every field closed-form; a SURT, timestamp,
    JSON-extraction or sort bug hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.cdx import (
        read_cdxj,
        surt_key_expr,
        write_cdxj,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    captures = docs.selectExpr(
        "concat('part-', CAST(doc_id % 8 AS STRING), '.cdxj') "
        "AS cdx_file",
        "concat('https://h', CAST(doc_id % 20 AS STRING), "
        "'.corpus.test/d/', CAST(doc_id AS STRING)) AS url",
        "CAST(timestamp'2026-02-03 04:05:06' "
        "+ make_interval(0,0,0,0,0,0, CAST(doc_id % 50 AS INT)) "
        "AS timestamp_ntz) AS ts",
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 200 WHEN 1 THEN 301 "
        "ELSE 404 END AS status",
        "IF(doc_id % 2 = 0, 'text/html', 'application/pdf') AS mime",
        "concat('sha1:', md5(CAST(doc_id AS STRING))) AS digest",
        "concat('w-', CAST(doc_id % 4 AS STRING), '.warc.gz') "
        "AS warc_file",
        "CAST(doc_id * 1000 AS BIGINT) AS warc_offset",
        "CAST(100 + doc_id % 500 AS BIGINT) AS warc_length",
    ).selectExpr("*", f"{surt_key_expr('url')} AS urlkey")
    root = tempfile.mkdtemp(prefix="minerva_gate_cdx_")
    write_cdxj(captures, root).collect()
    out = (
        read_cdxj(spark, root)
        .select(
            F.regexp_extract("url", r"/d/(\d+)$", 1)
            .cast("bigint").alias("doc_id"),
            "urlkey", "ts", "host", "url", "mime", "status",
            "digest", "warc_file", "warc_offset", "warc_length",
        )
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_CDX_HARVEST = """
SELECT doc_id,
       'test,corpus,h' || CAST(doc_id % 20 AS VARCHAR) || ')/d/'
         || CAST(doc_id AS VARCHAR) AS urlkey,
       TIMESTAMP '2026-02-03 04:05:06'
         + (doc_id % 50) * INTERVAL 1 SECOND AS ts,
       'h' || CAST(doc_id % 20 AS VARCHAR) || '.corpus.test' AS host,
       'https://h' || CAST(doc_id % 20 AS VARCHAR)
         || '.corpus.test/d/' || CAST(doc_id AS VARCHAR) AS url,
       CASE WHEN doc_id % 2 = 0 THEN 'text/html'
            ELSE 'application/pdf' END AS mime,
       CAST(CASE doc_id % 3 WHEN 0 THEN 200 WHEN 1 THEN 301
            ELSE 404 END AS INT) AS status,
       'sha1:' || md5(CAST(doc_id AS VARCHAR)) AS digest,
       'w-' || CAST(doc_id % 4 AS VARCHAR) || '.warc.gz' AS warc_file,
       CAST(doc_id * 1000 AS BIGINT) AS warc_offset,
       CAST(100 + doc_id % 500 AS BIGINT) AS warc_length
FROM documents
"""


def q_cdx_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling over the CDX index (`sources/cdx.py::
    recrawl_candidates`, r13): every third URL carries TWO captures a
    day apart — the second's payload digest changes only for even
    doc_ids — round-tripped through real CDXJ shards, then the
    latest-per-urlkey window computes capture counts, the
    content-churn flag (tri-state: NULL without a baseline) and the
    capture gap.  The oracle rebuilds all of it closed-form; a
    window-order, lag, or tri-state bug hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.cdx import (
        read_cdxj,
        recrawl_candidates,
        surt_key_expr,
        write_cdxj,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def capture(ts_shift_days: int, v2: bool):
        digest = (
            "concat('sha1:', md5(concat(CAST(doc_id AS STRING), "
            "IF(doc_id % 2 = 0, ':v2', ''))))"
            if v2
            else "concat('sha1:', md5(CAST(doc_id AS STRING)))"
        )
        return docs.selectExpr(
            "concat('part-', CAST(doc_id % 8 AS STRING), '.cdxj') "
            "AS cdx_file",
            "concat('https://h', CAST(doc_id % 20 AS STRING), "
            "'.corpus.test/d/', CAST(doc_id AS STRING)) AS url",
            "CAST(timestamp'2026-02-03 04:05:06' "
            "+ make_interval(0,0,0,"
            f"{int(ts_shift_days)}"
            ",0,0, CAST(doc_id % 50 AS INT)) AS timestamp_ntz) AS ts",
            "CAST(200 AS INT) AS status",
            "'text/html' AS mime",
            f"{digest} AS digest",
            "'w-0.warc.gz' AS warc_file",
            "CAST(doc_id * 1000 AS BIGINT) AS warc_offset",
            "CAST(100 AS BIGINT) AS warc_length",
        ).selectExpr("*", f"{surt_key_expr('url')} AS urlkey")

    captures = capture(0, False).unionByName(
        capture(1, True).filter(
            "CAST(regexp_extract(url, '/d/([0-9]+)$', 1) AS BIGINT) "
            "% 3 = 0"
        )
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_cdxr_")
    write_cdxj(captures, root).collect()
    out = (
        recrawl_candidates(read_cdxj(spark, root))
        .select(
            F.regexp_extract("url", r"/d/(\d+)$", 1)
            .cast("bigint").alias("doc_id"),
            "urlkey", "ts", "status", "digest", "n_captures",
            "changed", "secs_since_prev",
        )
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_CDX_RECRAWL = """
SELECT doc_id,
       'test,corpus,h' || CAST(doc_id % 20 AS VARCHAR) || ')/d/'
         || CAST(doc_id AS VARCHAR) AS urlkey,
       TIMESTAMP '2026-02-03 04:05:06'
         + (doc_id % 50) * INTERVAL 1 SECOND
         + CASE WHEN doc_id % 3 = 0 THEN INTERVAL 1 DAY
                ELSE INTERVAL 0 DAY END AS ts,
       CAST(200 AS INT) AS status,
       'sha1:' || md5(CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 0
                 THEN ':v2' ELSE '' END) AS digest,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INT)
         AS n_captures,
       CASE WHEN doc_id % 3 = 0 THEN doc_id % 2 = 0
            ELSE NULL END AS changed,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 86400
                 ELSE NULL END AS BIGINT) AS secs_since_prev
FROM documents
"""


def q_cdx_index_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL crawl index (`sources/cdx.py::build_capture_state`
    / `ingest_captures_increment`, r14 — the signature-state protocol
    applied to the URL index): delivery 1 builds the
    ``bucketBy(urlkey)`` capture state from every URL's first capture
    (real CDXJ shards round-tripped first), delivery 2 carries the
    day-later second captures of every third URL — digest churn on
    even doc_ids — and its recrawl decisions must equal the
    FULL-INDEX recompute restricted to the touched urlkeys.  The
    delta's keys broadcast into a semi-join against the bucketed scan
    and the recrawl window's partitioning matches the bucket layout,
    so the history side is exchange-free (plan-pinned by pytest);
    the oracle replays the touched keys closed-form."""
    _prep(spark)
    import shutil
    import tempfile
    import uuid

    from minerva_etl_spark.sources.cdx import (
        build_capture_state,
        ingest_captures_increment,
        read_cdxj,
        surt_key_expr,
        write_cdxj,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def capture(ts_shift_days: int, v2: bool):
        digest = (
            "concat('sha1:', md5(concat(CAST(doc_id AS STRING), "
            "IF(doc_id % 2 = 0, ':v2', ''))))"
            if v2
            else "concat('sha1:', md5(CAST(doc_id AS STRING)))"
        )
        return docs.selectExpr(
            "concat('part-', CAST(doc_id % 8 AS STRING), '.cdxj') "
            "AS cdx_file",
            "concat('https://h', CAST(doc_id % 20 AS STRING), "
            "'.corpus.test/d/', CAST(doc_id AS STRING)) AS url",
            "CAST(timestamp'2026-02-03 04:05:06' "
            "+ make_interval(0,0,0,"
            f"{int(ts_shift_days)}"
            ",0,0, CAST(doc_id % 50 AS INT)) AS timestamp_ntz) AS ts",
            "CAST(200 AS INT) AS status",
            "'text/html' AS mime",
            f"{digest} AS digest",
            "'w-0.warc.gz' AS warc_file",
            "CAST(doc_id * 1000 AS BIGINT) AS warc_offset",
            "CAST(100 AS BIGINT) AS warc_length",
        ).selectExpr("*", f"{surt_key_expr('url')} AS urlkey")

    root = tempfile.mkdtemp(prefix="minerva_gate_cdxinc_")
    tbl = f"cdx_state_{uuid.uuid4().hex[:8]}"
    try:
        # delivery 1 arrives as real CDXJ shards, read back into the
        # bucketed state
        write_cdxj(capture(0, False), root + "/shards").collect()
        build_capture_state(
            spark, read_cdxj(spark, root + "/shards"), tbl,
            n_buckets=16, path=root + "/state",
        )
        delta = capture(1, True).filter(
            "CAST(regexp_extract(url, '/d/([0-9]+)$', 1) AS BIGINT) "
            "% 3 = 0"
        )
        out = (
            ingest_captures_increment(
                spark, delta, tbl, n_buckets=16, path=root + "/state"
            )
            .select(
                F.regexp_extract("url", r"/d/(\d+)$", 1)
                .cast("bigint").alias("doc_id"),
                "urlkey", "ts", "status", "digest", "n_captures",
                "changed", "secs_since_prev",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_CDX_INDEX_INCREMENT = """
SELECT doc_id,
       'test,corpus,h' || CAST(doc_id % 20 AS VARCHAR) || ')/d/'
         || CAST(doc_id AS VARCHAR) AS urlkey,
       TIMESTAMP '2026-02-03 04:05:06'
         + (doc_id % 50) * INTERVAL 1 SECOND
         + INTERVAL 1 DAY AS ts,
       CAST(200 AS INT) AS status,
       'sha1:' || md5(CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0 THEN ':v2' ELSE '' END) AS digest,
       CAST(2 AS INT) AS n_captures,
       doc_id % 2 = 0 AS changed,
       CAST(86400 AS BIGINT) AS secs_since_prev
FROM documents
WHERE doc_id % 3 = 0
"""


def q_feed_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing (`operators/feeds.py::feed_entries`):
    each doc becomes a real feed synthesized in-task — even doc_ids
    RSS 2.0 (plain tags), odd Atom (namespaced), 1 + doc_id % 3
    entries each.  Entries alternate the fallback paths: even entry
    indexes carry an explicit guid/id, odd ones fall back to the
    link; Atom entries carry a rel="self" decoy link BEFORE the
    alternate so the resolution order is exercised on every row.
    The oracle regenerates every exploded row closed-form with
    generate_series — a bug in either format's item walk, the link
    rel rules, or the guid/published fallbacks hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.feeds import feed_entries

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 1 + d % 3
                items = []
                for i in range(n):
                    link = f"https://corpus.test/d/{d}/{i}"
                    pub = f"2026-02-03T04:05:0{i}Z"
                    gid = f"guid:{d}:{i}" if i % 2 == 0 else None
                    if d % 2 == 0:
                        guid_el = f"<guid>{gid}</guid>" if gid else ""
                        items.append(
                            f"<item><title>Doc {d} item {i}</title>"
                            f"<link>{link}</link>"
                            f"<pubDate>{pub}</pubDate>{guid_el}</item>"
                        )
                    else:
                        id_el = f"<id>{gid}</id>" if gid else ""
                        items.append(
                            f"<entry><title>Doc {d} item {i}</title>"
                            f'<link rel="self" href="{link}.xml"/>'
                            f'<link rel="alternate" href="{link}"/>'
                            f"{id_el}<published>{pub}</published>"
                            "</entry>"
                        )
                if d % 2 == 0:
                    xml = (
                        '<rss version="2.0"><channel>'
                        f"<title>Feed {d}</title>"
                        + "".join(items)
                        + "</channel></rss>"
                    )
                else:
                    xml = (
                        '<feed xmlns="http://www.w3.org/2005/Atom">'
                        f"<title>Feed {d}</title>"
                        + "".join(items)
                        + "</feed>"
                    )
                rows.append((d, xml))
            yield pd.DataFrame(rows, columns=["feed_id", "xml"])

    feeds = docs.mapInPandas(synth, "feed_id bigint, xml string")
    return feed_entries(feeds)


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling (`operators/robots.py::crawl_delays` +
    `schedule_fetches`): 20 hosts, even hosts state a fractional
    Crawl-delay (0.5·(1 + h%4) — fractional BECAUSE the stdlib
    parser drops non-integer delays and this implementation must
    not), odd hosts state none and fall to the 1.0 default; every
    URL gets its per-host slot (deterministic: ordered by URL) and
    ``fetch_offset_s = slot × delay``.  The oracle replays the
    section parse closed-form and the slots with a partitioned
    row_number — a delay-parse, grouping, or ordering bug
    hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.robots import (
        crawl_delays,
        schedule_fetches,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    urls = docs.select(
        F.expr(
            "concat('https://h', doc_id % 20, '.test/p/', doc_id)"
        ).alias("url"),
        F.expr("concat('h', doc_id % 20, '.test')").alias("host"),
    )
    hosts = spark.range(20).select(
        F.expr("concat('h', id, '.test')").alias("host"),
        F.expr(
            "CASE WHEN id % 2 = 0 THEN concat("
            "  'User-agent: probe\\nCrawl-delay: 60\\n\\n',"
            "  'User-agent: *\\nCrawl-delay: ',"
            "  format_number(0.5 * (1 + id % 4), 1),"
            "  '\\nDisallow: /private/')"
            " ELSE 'User-agent: *\\nAllow: /' END"
        ).alias("robots_txt"),
    )
    out = schedule_fetches(urls, crawl_delays(hosts))
    return out.select(
        "url", "host",
        F.col("slot").cast("int").alias("slot"),
        F.col("fetch_offset_s").cast("double").alias("fetch_offset_s"),
    )


_ORACLE_FETCH_SCHEDULE = """
WITH u AS (
  SELECT 'https://h' || CAST(doc_id % 20 AS VARCHAR) || '.test/p/'
             || CAST(doc_id AS VARCHAR) AS url,
         'h' || CAST(doc_id % 20 AS VARCHAR) || '.test' AS host,
         doc_id % 20 AS h
  FROM documents
)
SELECT url, host,
       CAST(row_number() OVER (PARTITION BY host ORDER BY url) - 1
            AS INT) AS slot,
       CAST((row_number() OVER (PARTITION BY host ORDER BY url) - 1)
            * (CASE WHEN h % 2 = 0 THEN 0.5 * (1 + h % 4)
                    ELSE 1.0 END) AS DOUBLE) AS fetch_offset_s
FROM u
"""


def q_frontier_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl-frontier state (`operators/frontier.py::
    ingest_frontier_increment`): two polls through a persisted
    seen-URL set — poll 1 bootstraps the state with one URL per doc,
    poll 2 mixes noisy re-spellings of seen URLs (uppercase scheme +
    host, a fragment — every doc_id % 3 == 0) with genuinely new
    paths, and the decision must mark exactly the re-spellings as
    seen, proving the Catalyst URL normalization IS the state key.
    Oracle: the closed-form recompute (a poll-2 URL is new iff its
    doc is not a re-spelling), with DuckDB's md5 recomputing the
    key."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.frontier import (
        ingest_frontier_increment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    root = tempfile.mkdtemp(prefix="minerva_gate_frontier_")
    state_path = os.path.join(root, "frontier_state")

    def poll(n: int):
        # same URL strings as the r15 pandas synth, built in Catalyst
        # (r16, guide §4.1: the fixture is pure string-of-doc_id, so
        # the mapInPandas Python boundary bought nothing — both polls
        # now stay whole-stage codegen end to end)
        if n == 1:
            url = F.concat(
                F.lit("https://s"), F.col("doc_id") % 40,
                F.lit(".test/p/"), F.col("doc_id"),
            )
        else:
            url = F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit("HTTPS://S"), F.col("doc_id") % 40,
                    F.lit(".TEST/p/"), F.col("doc_id"), F.lit("#frag"),
                ),
            ).otherwise(
                F.concat(
                    F.lit("https://s"), F.col("doc_id") % 40,
                    F.lit(".test/q/"), F.col("doc_id"),
                )
            )
        return docs.select(url.cast("string").alias("url"))

    ingest_frontier_increment(spark, poll(1), state_path)
    out = ingest_frontier_increment(spark, poll(2), state_path)
    shutil.rmtree(root, ignore_errors=True)  # decisions checkpointed
    return out


_ORACLE_FRONTIER_INCREMENT = """
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN 'https://s' || CAST(doc_id % 40 AS VARCHAR)
                   || '.test/p/' || CAST(doc_id AS VARCHAR)
              ELSE 'https://s' || CAST(doc_id % 40 AS VARCHAR)
                   || '.test/q/' || CAST(doc_id AS VARCHAR) END AS url,
         doc_id % 3 <> 0 AS is_new
  FROM documents
)
SELECT url, md5(url) AS url_key, is_new FROM u
"""


def q_archive_harvest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive corpus ingest (`sources/archive.py`): documents are
    packed in-task into REAL archives — shard by doc_id % 6, even
    shards zip, odd shards tar.gz, so BOTH formats live in one
    delivery directory — via `write_archives` (one archive per group,
    written by the owning task), then harvested back with
    `read_archives` (one task per archive, member explode, utf-8
    text twin) and the doc_id recovered from the member name.  The
    oracle rebuilds shard name, member name, byte size, and text
    closed-form; a bug in either direction of either format
    hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.archive import (
        read_archives,
        write_archives,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                d = int(d)
                shard = d % 6
                ext = "zip" if shard % 2 == 0 else "tar.gz"
                rows.append(
                    (
                        f"shard-{shard}.{ext}",
                        f"doc_{d:06d}.txt",
                        _ascii_sanitize(str(t)).encode(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["archive", "member", "content"]
            )

    staged = docs.mapInPandas(
        synth, "archive string, member string, content binary"
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_archive_")
    write_archives(staged, root).collect()
    out = (
        read_archives(spark, root)
        .select(
            F.regexp_extract("member", r"doc_(\d+)\.txt", 1)
            .cast("bigint")
            .alias("doc_id"),
            "archive",
            "member",
            "size",
            "text",
        )
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_ARCHIVE_HARVEST = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       'shard-' || CAST(doc_id % 6 AS VARCHAR)
           || CASE WHEN (doc_id % 6) % 2 = 0
                   THEN '.zip' ELSE '.tar.gz' END AS archive,
       'doc_' || lpad(CAST(doc_id AS VARCHAR), 6, '0') || '.txt'
           AS member,
       CAST(length(text) AS BIGINT) AS size,
       text
FROM san
"""


_ORACLE_PDF_EXTRACT = f"""
WITH san AS (
  SELECT doc_id, {_ascii_sanitize_sql('text')} AS text FROM documents
)
SELECT doc_id,
       CAST(2 AS INT) AS n_pages,
       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
       'Doc ' || CAST(doc_id AS VARCHAR) || ' report'
           || chr(10) || chr(10) || text AS text,
       CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || ' report')
            + 2 + length(text) AS INT) AS n_chars
FROM san
"""


def q_wat_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from WAT metadata (`sources/wet.py::
    wat_links`, r14 — the web-graph build edge): per doc a WAT
    envelope whose Links array mixes ABSOLUTE cross-host urls (even
    link indexes → h{(d+j)%7}.ext.test) with ROOT-RELATIVE paths
    (odd indexes → resolve against the source host), written as real
    gzip-membered WAT shards and read back; `wat_links` explodes +
    resolves every edge in pure codegen and the graph aggregates per
    (src_host, dst_host).  The oracle regenerates the edge set
    closed-form — a JSON-path, resolution-rule, or host-extraction
    bug shifts counts and hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.sources.wet import (
        wat_links,
        write_wat_files,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                http = {"Headers": {"Content-Type": "text/html"}}
                if d % 11 != 0:
                    http["HTML-Metadata"] = {
                        "Links": [
                            {
                                "url": (
                                    f"https://h{(d + j) % 7}"
                                    f".ext.test/p/{j}"
                                    if j % 2 == 0
                                    else f"/l/{d}/{j}"
                                )
                            }
                            for j in range(d % 5)
                        ],
                    }
                env = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI":
                                f"https://corpus.test/d/{d}"
                        },
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": http
                        },
                    }
                }
                rows.append(
                    (
                        f"part-{d % 8}.warc.wat.gz",
                        f"rec-{d:09d}",
                        f"https://corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        _json.dumps(env, sort_keys=True),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "target_uri",
                         "warc_date", "meta_json"],
            )

    staged = docs.mapInPandas(
        synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_watlg_")
    write_wat_files(staged, root).collect()
    out = (
        wat_links(spark, root)
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_links"))
        .localCheckpoint(eager=True)  # pinned before the dir goes
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORACLE_WAT_LINK_GRAPH = """
WITH l AS (
  SELECT doc_id, j.j AS j
  FROM documents,
       UNNEST(generate_series(0, CAST(doc_id % 5 - 1 AS INT))) AS j(j)
  WHERE doc_id % 11 <> 0
), e AS (
  SELECT CASE WHEN j % 2 = 0
              THEN 'h' || CAST((doc_id + j) % 7 AS VARCHAR)
                   || '.ext.test'
              ELSE 'corpus.test' END AS dst_host
  FROM l
)
SELECT 'corpus.test' AS src_host, dst_host,
       CAST(count(*) AS BIGINT) AS n_links
FROM e GROUP BY dst_host
"""


def q_pipeline_webgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused WEB-GRAPH pipeline (r14): WAT shards → `wat_links`
    (explode + resolve + host extraction, codegen) → distinct
    cross-host edges (self-loops dropped) → three exact-integer
    PageRank rounds (`operators/pagerank.py`) — the authority scoring
    a crawl scheduler feeds back into fetch priorities, end to end
    from the real metadata format.  The oracle regenerates the edge
    set closed-form and unrolls the identical integer recurrence; any
    stage breaking (JSON paths, URL resolution, dedup, damping math)
    hash-mismatches."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.pagerank import pagerank
    from minerva_etl_spark.sources.wet import (
        wat_links,
        write_wat_files,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                http = {"Headers": {"Content-Type": "text/html"}}
                if d % 11 != 0:
                    http["HTML-Metadata"] = {
                        "Links": [
                            {
                                "url": (
                                    f"https://h{(d + j) % 7}"
                                    f".ext.test/p/{j}"
                                    if j % 2 == 0
                                    else f"/l/{d}/{j}"
                                )
                            }
                            for j in range(d % 5)
                        ],
                    }
                env = {
                    "Envelope": {
                        "WARC-Header-Metadata": {
                            "WARC-Target-URI":
                                f"https://h{d % 3}.corpus.test/d/{d}"
                        },
                        "Payload-Metadata": {
                            "HTTP-Response-Metadata": http
                        },
                    }
                }
                rows.append(
                    (
                        f"part-{d % 8}.warc.wat.gz",
                        f"rec-{d:09d}",
                        f"https://h{d % 3}.corpus.test/d/{d}",
                        "2026-02-03T04:05:06Z",
                        _json.dumps(env, sort_keys=True),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "target_uri",
                         "warc_date", "meta_json"],
            )

    staged = docs.mapInPandas(
        synth,
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    root = tempfile.mkdtemp(prefix="minerva_gate_webgraph_")
    write_wat_files(staged, root).collect()
    edges = (
        wat_links(spark, root)
        .where(F.col("dst_host") != F.col("src_host"))
        .select(
            F.col("src_host").alias("src"),
            F.col("dst_host").alias("dst"),
        )
        .distinct()
    )
    out = pagerank(edges, iters=3, damping_pct=85).localCheckpoint(
        eager=True
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_pipeline_webgraph() -> str:
    from minerva_etl_spark.operators.pagerank import pagerank_oracle_sql

    edges = """(
  SELECT DISTINCT
    'h' || CAST(doc_id % 3 AS VARCHAR) || '.corpus.test' AS src,
    CASE WHEN j.j % 2 = 0
         THEN 'h' || CAST((doc_id + j.j) % 7 AS VARCHAR)
              || '.ext.test'
         ELSE 'h' || CAST(doc_id % 3 AS VARCHAR) || '.corpus.test'
    END AS dst
  FROM documents,
       UNNEST(generate_series(0, CAST(doc_id % 5 - 1 AS INT))) AS j(j)
  WHERE doc_id % 11 <> 0
) eall WHERE src <> dst"""
    return pagerank_oracle_sql(f"(SELECT * FROM {edges})",
                               iters=3, damping_pct=85)
