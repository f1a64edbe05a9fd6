"""Sitemap parsing: urlset/sitemapindex, namespaces, field mapping."""

import pytest

from minerva_etl_spark.operators.sitemap import parse_sitemap, sitemap_urls

NS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def test_parse_urlset_with_and_without_namespace():
    body = (
        "<url><loc>https://a/1</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>https://a/2</loc></url>"
    )
    for ns in ("", NS):
        out = parse_sitemap(f"<urlset{ns}>{body}</urlset>")
        assert [r["loc"] for r in out] == ["https://a/1", "https://a/2"]
        assert out[0]["lastmod"] == "2026-01-02"
        assert out[0]["changefreq"] == "daily"
        assert out[0]["priority"] == 0.8
        assert out[1]["priority"] is None
        assert {r["kind"] for r in out} == {"url"}


def test_parse_sitemapindex():
    xml = (
        f"<sitemapindex{NS}>"
        "<sitemap><loc>https://a/s1.xml</loc>"
        "<lastmod>2026-02-01</lastmod></sitemap>"
        "<sitemap><loc>https://a/s2.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    out = parse_sitemap(xml)
    assert [r["loc"] for r in out] == ["https://a/s1.xml", "https://a/s2.xml"]
    assert {r["kind"] for r in out} == {"sitemap"}


def test_parse_rejects_non_sitemap_and_skips_locless():
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap("<html><body>nope</body></html>")
    out = parse_sitemap(
        "<urlset><url><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://a/x</loc></url></urlset>"
    )
    assert len(out) == 1 and out[0]["loc"] == "https://a/x"


def test_sitemap_urls_spark(spark):
    df = spark.createDataFrame(
        [
            (1, "<urlset><url><loc>https://a/1</loc></url>"
                "<url><loc>https://a/2</loc></url></urlset>"),
            (2, f"<sitemapindex{NS}><sitemap>"
                "<loc>https://b/s.xml</loc></sitemap></sitemapindex>"),
        ],
        "sitemap_id bigint, xml string",
    )
    rows = sitemap_urls(df).collect()
    assert len(rows) == 3
    by_id = {}
    for r in rows:
        by_id.setdefault(r.sitemap_id, []).append(r)
    assert {r.loc for r in by_id[1]} == {"https://a/1", "https://a/2"}
    assert by_id[2][0].kind == "sitemap"
