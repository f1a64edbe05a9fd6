"""RSS / Atom feed parsing — the incremental half of crawl frontier
construction.

Sitemaps enumerate a site; feeds announce what CHANGED.  A freshness-
aware crawl frontier polls both: `operators/sitemap.py` for the full
URL inventory, this module for new/updated entries with their
publication metadata.  Parses RSS 2.0 (``<rss><channel><item>``,
incl. RSS 1.0 / RDF ``<item>`` layouts) and Atom
(``<feed><entry>``) into one row per entry — title, link, published
timestamp string, GUID — using stdlib ``xml.etree.ElementTree`` with
local-name tag matching, so namespaced (Atom always, RSS sometimes
via content/dc modules) and plain feeds both parse.

Link resolution follows each format's convention: RSS ``<link>``
element text; Atom ``<link href=...>`` preferring
``rel="alternate"`` (or unset rel, which means alternate per RFC
4287) over ``self``/``enclosure``.  Published time: RSS
``pubDate``, Atom ``published`` falling back to ``updated``.  GUID:
RSS ``guid``, Atom ``id``, falling back to the link.

Scale shape: identical to sitemap/HTML extraction — a shuffle-free
Arrow ``mapInPandas`` scan, one in-task parse per payload, output
feeding straight into `urlops.with_url_parts` → `robots_allowed` →
per-domain scheduling (the `frontier_build` composition).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEED_SCHEMA = (
    "feed_id bigint, format string, feed_title string, title string, "
    "link string, published string, guid string"
)


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _child_text(el, name: str) -> str | None:
    for c in el:
        if _local(c.tag) == name:
            t = (c.text or "").strip()
            return t or None
    return None


def _atom_link(entry) -> str | None:
    best = None
    for c in entry:
        if _local(c.tag) != "link":
            continue
        rel = c.get("rel") or "alternate"  # unset rel = alternate
        href = c.get("href")
        if not href:
            continue
        if rel == "alternate":
            return href
        if best is None:
            best = href
    return best


def parse_feed(xml: str | bytes) -> list[dict]:
    """One dict per item/entry: ``{format, feed_title, title, link,
    published, guid}``.  Raises ``ValueError`` for non-feed XML."""
    import xml.etree.ElementTree as ET

    if isinstance(xml, (bytes, bytearray)):
        xml = bytes(xml).decode("utf-8", "replace")
    root = ET.fromstring(xml)
    kind = _local(root.tag)
    out: list[dict] = []
    if kind in ("rss", "RDF"):
        # channel title; items live under <channel> (RSS 2.0) or as
        # siblings of it (RSS 1.0 / RDF)
        feed_title = None
        items = []
        for el in root.iter():
            name = _local(el.tag)
            if name == "channel" and feed_title is None:
                feed_title = _child_text(el, "title")
            elif name == "item":
                items.append(el)
        for it in items:
            link = _child_text(it, "link")
            guid = _child_text(it, "guid") or link
            out.append(
                {
                    "format": "rss",
                    "feed_title": feed_title,
                    "title": _child_text(it, "title"),
                    "link": link,
                    "published": _child_text(it, "pubDate"),
                    "guid": guid,
                }
            )
        return out
    if kind == "feed":
        feed_title = _child_text(root, "title")
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            link = _atom_link(entry)
            out.append(
                {
                    "format": "atom",
                    "feed_title": feed_title,
                    "title": _child_text(entry, "title"),
                    "link": link,
                    "published": _child_text(entry, "published")
                    or _child_text(entry, "updated"),
                    "guid": _child_text(entry, "id") or link,
                }
            )
        return out
    raise ValueError(f"not an RSS/Atom feed document: <{kind}>")


def feed_entries(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "feed_id",
    on_error: str = "fail",
) -> DataFrame:
    """(id, xml) → one row per feed entry; ``on_error='skip'`` drops
    unparseable payloads (a real feed poll always meets broken XML)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, xml in zip(pdf[id_col], pdf[xml_col]):
                try:
                    recs = parse_feed(xml)
                except (ValueError, SyntaxError):
                    if on_error == "skip":
                        continue
                    raise
                for r in recs:
                    rows.append(
                        (fid, r["format"], r["feed_title"], r["title"],
                         r["link"], r["published"], r["guid"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["feed_id", "format", "feed_title", "title",
                         "link", "published", "guid"],
            )

    return df.select(id_col, xml_col).mapInPandas(run, FEED_SCHEMA)
