"""HTML main-text extraction — the step between a WARC crawl record
and every text operator in this repo (quality, Gopher rules, dedup,
tokenization all consume plain text).

Pure stdlib ``html.parser.HTMLParser``; runs Arrow-batched inside
``mapInPandas`` so a 100-TB crawl extracts in-task with no shuffle and
no driver round-trip.  Python-per-row is the honest cost here — HTML
parsing is not expressible as Catalyst expressions — and it composes
with the WARC source's one-task-per-file parallelism.

Extraction semantics (deterministic, oracle-replayable):

- ``<script>/<style>/<noscript>/<template>`` subtrees are dropped.
- ``<title>`` text is captured separately, not into the body text.
- Block-level tags (p, div, li, headings, table rows, nav, br, …)
  contribute a newline boundary on open and close; inline tags do not.
- Character/entity references are unescaped (``convert_charrefs``).
- Whitespace is normalized the way a browser collapses it: horizontal
  runs become one space, spaces around newlines are dropped, newline
  runs become one newline, and the result is stripped.
- ``n_links`` counts ``<a href=...>`` anchors.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from pyspark.sql import DataFrame

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "br", "caption",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hr", "li", "main", "nav", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
}
_VOID_TAGS = {"br", "hr"}


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._in_title = False
        self._parts: list[str] = []
        self._title: list[str] = []
        self.n_links = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "title":
            self._in_title = True
        if tag == "a" and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _SKIP_TAGS and tag not in _VOID_TAGS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK_TAGS:
            self._parts.append("\n")

    def handle_data(self, data):
        if self._skip:
            return
        if self._in_title:
            self._title.append(data)
        else:
            self._parts.append(data)


def extract_html(html: str) -> dict:
    """Extract ``{title, text, n_links}`` from an HTML document."""
    p = _Extractor()
    p.feed(html)
    p.close()
    text = "".join(p._parts)
    text = re.sub(r"[ \t\r\f\v]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    text = re.sub(r"\n+", "\n", text)
    title = re.sub(r"\s+", " ", "".join(p._title)).strip()
    return {
        "title": title,
        "text": text.strip(),
        "n_links": p.n_links,
    }


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, html) → (id, title, text, n_links), Arrow-batched."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            titles, texts, links = [], [], []
            for h in pdf[html_col]:
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", "replace")
                d = extract_html(h if h is not None else "")
                titles.append(d["title"])
                texts.append(d["text"])
                links.append(d["n_links"])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "title": titles,
                    "text": texts,
                    "n_links": links,
                }
            )

    return df.select(id_col, html_col).mapInPandas(
        run, f"{id_col} bigint, title string, text string, n_links int"
    )
