"""robots.txt politeness filtering for crawl curation.

Given a URL table and a per-host robots.txt table, keep the URLs a
polite crawler may fetch.  Parsing is stdlib
``urllib.robotparser`` — but parsed once per host *run*, not per URL.

Scale shape (the r9 verdict's skew fix): the robots table is deduped
to one row per host, equi-joined onto the URLs (AQE broadcasts the
robots side when it is small), and the decision is evaluated by a
``mapInPandas`` SCAN over the join output with an LRU parser cache
keyed by host.  Unlike the earlier per-host ``applyInPandas``, no
host's URL set is ever materialized as one pandas group: a mega-host
(millions of frontier URLs) stays spread across however many
partitions the join produces, and because ``mapInPandas`` needs no
co-grouping, AQE's skew-join splitting is free to carve up a hot
host partition.  The parse still amortizes — within an Arrow batch
the rows are grouped by host before evaluation, and the parser cache
carries across batches — so the per-URL cost is one dict hit plus
``can_fetch``.  Bounded memory: the cache holds at most
``_PARSER_CACHE_MAX`` parsers (robots texts are KB-sized).

A host with no robots row (left join miss) allows everything — the
web's default.  Duplicate robots rows for one host are collapsed to
the lexicographically smallest text (deterministic) before the join,
so they can never fan out the URL rows.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

#: Max distinct hosts whose parsed robots live in one task's cache.
_PARSER_CACHE_MAX = 4096


def _is_blank(txt) -> bool:
    return txt is None or (isinstance(txt, float) and pd.isna(txt)) or txt == ""


def robots_allowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Append an ``allowed`` boolean to ``urls``.

    ``urls`` must carry ``host_col`` (use
    :func:`minerva_etl_spark.operators.urlops.with_url_parts`);
    ``robots`` is ``(host, robots_txt)``.
    """
    from urllib import robotparser

    robots_one = robots.groupBy(host_col).agg(
        F.min(robots_col).alias(robots_col)
    )
    joined = urls.join(robots_one, host_col, "left")
    out_fields = [f for f in joined.schema.fields if f.name != robots_col]
    schema = StructType(
        list(out_fields) + [StructField("allowed", BooleanType(), False)]
    )
    names = [f.name for f in out_fields]

    def eval_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # host -> RobotFileParser | None (None = allow-all), LRU-capped
        cache: dict = {}

        def parser_for(host, txt):
            key = host
            if key in cache:
                rp = cache.pop(key)
            elif _is_blank(txt):
                rp = None
            else:
                rp = robotparser.RobotFileParser()
                rp.parse(str(txt).splitlines())
            cache[key] = rp  # re-insert = move to MRU end
            if len(cache) > _PARSER_CACHE_MAX:
                cache.pop(next(iter(cache)))
            return rp

        for pdf in batches:
            allowed = [True] * len(pdf)
            groups = pdf.groupby(
                host_col, sort=False, dropna=False
            ).indices
            for host, idx in groups.items():
                rp = parser_for(host, pdf[robots_col].iloc[idx[0]])
                if rp is None:
                    continue
                col = pdf[url_col]
                for i in idx:
                    allowed[i] = rp.can_fetch(agent, str(col.iloc[i]))
            out = pdf[names].copy()
            out["allowed"] = allowed
            yield out

    return joined.mapInPandas(eval_batches, schema)


def filter_allowed(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    **kw,
) -> DataFrame:
    """The filtering form: only the fetchable URLs, ``allowed``
    dropped."""
    out = robots_allowed(urls, robots, agent, **kw)
    return out.where("allowed").drop("allowed")


def sitemaps_from_robots(
    robots: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt rows — the
    discovery edge that closes the frontier loop (robots → sitemap →
    `operators/sitemap.py` → `operators/frontier.py`).

    Per RFC 9309 §2.3 the directive is case-insensitive, takes a full
    URL, may appear multiple times, and lives outside any user-agent
    group.  Pure Catalyst: split lines, regexp-match the directive,
    explode — one row per (host, sitemap_url), no UDF, no shuffle.
    """
    line = F.explode(F.split(F.col(robots_col), "\r?\n")).alias("line")
    url = F.regexp_extract(
        F.col("line"), r"(?i)^\s*sitemap\s*:\s*(\S+)\s*$", 1
    )
    return (
        robots.select(F.col(host_col), line)
        .select(host_col, url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )
