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

#: Crawl-delay ceiling (seconds): stated delays above an hour are
#: treated as an hour, the convention large crawlers use.
_MAX_CRAWL_DELAY = 3600.0


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


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Per-host ``Crawl-delay`` (seconds, double; null = none stated)
    for ``agent``, honoring user-agent sections via the same stdlib
    parser as :func:`robots_allowed` — one row per host, a
    dimension-sized politeness table for `schedule_fetches`.

    The robots table is host-deduped first (min robots_txt, the
    :func:`robots_allowed` rule) so output is one row per host."""
    robots_one = robots.groupBy(host_col).agg(
        F.min(robots_col).alias(robots_col)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            delays = [
                None if _is_blank(txt)
                else _crawl_delay_from_text(str(txt), agent)
                for txt in pdf[robots_col]
            ]
            yield pd.DataFrame(
                {host_col: pdf[host_col], "crawl_delay": delays}
            )

    return robots_one.mapInPandas(
        run, f"{host_col} string, crawl_delay double"
    )


def _crawl_delay_from_text(txt: str, agent: str) -> float | None:
    """Section-aware ``Crawl-delay`` lookup.  NOT
    ``robotparser.crawl_delay`` because the stdlib silently drops
    non-integer delays (``isdigit()`` gate) and real robots.txt use
    decimals.  Grouping per RFC 9309: adjacent User-agent lines share
    a group until a non-UA directive; matching per the stdlib's rule
    (entry agent ``*`` matches all, otherwise substring of the
    agent's product token); a specific-agent group beats ``*``,
    longer agent matches beat shorter."""
    product = agent.split("/")[0].lower()
    groups: list[tuple[list[str], float]] = []
    cur_agents: list[str] = []
    cur_delay: float | None = None
    in_directives = False

    def flush():
        if cur_agents and cur_delay is not None:
            groups.append((list(cur_agents), cur_delay))

    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_directives:
                flush()
                cur_agents, cur_delay, in_directives = [], None, False
            cur_agents.append(val.split("/")[0].lower())
        else:
            in_directives = True
            if key == "crawl-delay":
                import math

                try:
                    v = float(val)
                except ValueError:
                    continue
                # the stdlib's isdigit() gate bounded this implicitly;
                # accepting floats must not admit nan/inf/negatives
                # ('Crawl-delay: -1' exists in the wild) — clamp to
                # the sane band real crawlers use
                if math.isfinite(v) and v >= 0:
                    cur_delay = min(v, _MAX_CRAWL_DELAY)
    flush()
    best: tuple[int, float] | None = None  # (match specificity, delay)
    for agents, delay in groups:
        for a in agents:
            if a == "*":
                spec = 0
            elif a and a in product:
                spec = len(a)
            else:
                continue
            if best is None or spec > best[0]:
                best = (spec, delay)
    return best[1] if best else None


def schedule_fetches(
    urls: DataFrame,
    delays: DataFrame,
    default_delay: float = 1.0,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Assign each URL a per-host fetch slot and a start offset that
    honors the host's crawl delay: slot = dense position of the URL
    within its host (deterministic: ordered by the URL string),
    ``fetch_offset_s = slot * coalesce(crawl_delay, default)``.

    The downstream contract: a fetcher partitioned by host replays
    each host's URLs in slot order, sleeping to its offset — hosts
    proceed in parallel, each politely serial.

    Scale shape: one shuffle on ``host`` for the window plus a
    broadcast-sized join of the delay table.  The per-host window is
    a SORT-based streaming rank — unlike a pandas co-group, a
    mega-host never materializes in memory, it just sorts (spillable)
    — so hot hosts degrade to disk, not OOM."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(F.col(url_col))
    return (
        urls.join(F.broadcast(delays), host_col, "left")
        .withColumn("slot", F.row_number().over(w) - F.lit(1))
        .withColumn(
            "fetch_offset_s",
            F.col("slot")
            * F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay))),
        )
    )
