"""Sitemap parsing for crawl frontier construction.

Parses sitemap XML — both ``<urlset>`` leaves and ``<sitemapindex>``
index files — into one row per referenced URL, with ``lastmod`` /
``changefreq`` / ``priority`` when present.  stdlib
``xml.etree.ElementTree`` inside an Arrow-batched ``mapInPandas``
scan: shuffle-free, payloads never visit the driver, and the output
feeds straight into `urlops.with_url_parts` / `robots_allowed` /
per-domain frontier scheduling.

Namespace handling is deliberate: real sitemaps carry the
``http://www.sitemaps.org/schemas/sitemap/0.9`` namespace, many
hand-rolled ones carry none — both parse (tags are matched by local
name).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SITEMAP_SCHEMA = (
    "sitemap_id bigint, kind string, loc string, lastmod string, "
    "changefreq string, priority double"
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml: str | bytes) -> list[dict]:
    """One dict per ``<url>``/``<sitemap>`` entry; ``kind`` is
    ``url`` for urlset members and ``sitemap`` for index members."""
    import xml.etree.ElementTree as ET

    if isinstance(xml, (bytes, bytearray)):
        xml = bytes(xml).decode("utf-8", "replace")
    root = ET.fromstring(xml)
    root_kind = _local(root.tag)
    if root_kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: <{root_kind}>")
    kind = "url" if root_kind == "urlset" else "sitemap"
    out = []
    for entry in root:
        if _local(entry.tag) not in ("url", "sitemap"):
            continue
        rec = {
            "kind": kind,
            "loc": None,
            "lastmod": None,
            "changefreq": None,
            "priority": None,
        }
        for child in entry:
            name = _local(child.tag)
            text = (child.text or "").strip()
            if name == "loc":
                rec["loc"] = text
            elif name == "lastmod":
                rec["lastmod"] = text
            elif name == "changefreq":
                rec["changefreq"] = text
            elif name == "priority":
                try:
                    rec["priority"] = float(text)
                except ValueError:
                    pass
        if rec["loc"]:
            out.append(rec)
    return out


def sitemap_urls(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """(id, xml) → one row per referenced URL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, xml in zip(pdf[id_col], pdf[xml_col]):
                for rec in parse_sitemap(xml):
                    rows.append(
                        (sid, rec["kind"], rec["loc"], rec["lastmod"],
                         rec["changefreq"], rec["priority"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["sitemap_id", "kind", "loc", "lastmod",
                         "changefreq", "priority"],
            )

    return df.select(id_col, xml_col).mapInPandas(run, SITEMAP_SCHEMA)
