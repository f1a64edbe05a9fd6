"""robots.txt politeness filtering for crawl curation.

Given a URL table and a per-host robots.txt table, keep the URLs a
polite crawler may fetch.  Parsing is stdlib
``urllib.robotparser`` — but parsed ONCE PER HOST GROUP, not per URL:
the URLs join their host's robots text (one equi-join; AQE broadcasts
the robots side when it is small) and ``applyInPandas`` over the host
group builds a single parser and evaluates every URL in the group.
At 100 TB that is the right shape — the expensive text parse
amortizes over a domain's whole URL set, and the grouping exchange
doubles as the per-domain locality a politeness pipeline wants
anyway (per-domain caps, rate buckets, dedup keys all share it).

A host with no robots row (left join miss) allows everything — the
web's default.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


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

    joined = urls.join(robots, host_col, "left")
    out_cols = [f for f in joined.schema.fields if f.name != robots_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_cols
    ) + ", allowed boolean"
    names = [f.name for f in out_cols]

    def eval_group(pdf: pd.DataFrame) -> pd.DataFrame:
        txt = pdf[robots_col].iloc[0]
        if txt is None or (isinstance(txt, float)) or txt == "":
            allowed = [True] * len(pdf)
        else:
            rp = robotparser.RobotFileParser()
            rp.parse(str(txt).splitlines())
            allowed = [
                rp.can_fetch(agent, str(u)) for u in pdf[url_col]
            ]
        out = pdf[names].copy()
        out["allowed"] = allowed
        return out

    return joined.groupBy(host_col).applyInPandas(eval_group, schema)


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
