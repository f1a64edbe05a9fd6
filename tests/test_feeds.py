"""RSS/Atom feed parsing: both formats (namespaced and plain), link
resolution rules, fallbacks, dirty-feed policy, Spark operator, CLI."""

from __future__ import annotations

import pytest

from minerva_etl_spark.operators.feeds import feed_entries, parse_feed

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>Example Blog</title>
  <item><title>Post A</title><link>https://ex.test/a</link>
    <pubDate>Mon, 03 Feb 2026 04:05:06 GMT</pubDate>
    <guid>tag:ex,a</guid></item>
  <item><title>Post B</title><link>https://ex.test/b</link></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Site</title>
  <entry><title>E1</title>
    <link rel="self" href="https://ex.test/feed/e1.xml"/>
    <link rel="alternate" href="https://ex.test/e1"/>
    <id>urn:e1</id><published>2026-02-03T04:05:06Z</published></entry>
  <entry><title>E2</title>
    <link href="https://ex.test/e2"/>
    <updated>2026-02-04T00:00:00Z</updated></entry>
</feed>"""

RDF = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns="http://purl.org/rss/1.0/">
  <channel rdf:about="https://ex.test"><title>RSS1</title></channel>
  <item><title>Old School</title><link>https://ex.test/old</link></item>
</rdf:RDF>"""


def test_parse_rss_with_guid_and_fallbacks():
    recs = parse_feed(RSS)
    assert [r["format"] for r in recs] == ["rss", "rss"]
    assert recs[0]["feed_title"] == "Example Blog"
    assert recs[0]["link"] == "https://ex.test/a"
    assert recs[0]["published"] == "Mon, 03 Feb 2026 04:05:06 GMT"
    assert recs[0]["guid"] == "tag:ex,a"
    # no guid / no pubDate: guid falls back to link, published is None
    assert recs[1]["guid"] == "https://ex.test/b"
    assert recs[1]["published"] is None


def test_parse_atom_link_rel_and_time_fallback():
    recs = parse_feed(ATOM)
    assert recs[0]["link"] == "https://ex.test/e1"  # alternate beats self
    assert recs[0]["guid"] == "urn:e1"
    assert recs[0]["published"] == "2026-02-03T04:05:06Z"
    # unset rel means alternate; published falls back to updated;
    # guid falls back to link
    assert recs[1]["link"] == "https://ex.test/e2"
    assert recs[1]["published"] == "2026-02-04T00:00:00Z"
    assert recs[1]["guid"] == "https://ex.test/e2"


def test_parse_rss1_rdf_items():
    recs = parse_feed(RDF)
    assert len(recs) == 1
    assert recs[0]["feed_title"] == "RSS1"
    assert recs[0]["link"] == "https://ex.test/old"


def test_parse_rejects_non_feed():
    with pytest.raises(ValueError, match="not an RSS/Atom feed"):
        parse_feed("<urlset><url><loc>x</loc></url></urlset>")


def test_spark_feed_entries_and_skip(spark):
    df = spark.createDataFrame(
        [(1, RSS), (2, ATOM), (3, "<broken")],
        "feed_id bigint, xml string",
    )
    rows = feed_entries(df, on_error="skip").collect()
    assert len(rows) == 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r.feed_id, []).append(r)
    assert {r.format for r in by_id[1]} == {"rss"}
    assert {r.format for r in by_id[2]} == {"atom"}
    with pytest.raises(Exception):
        feed_entries(df, on_error="fail").collect()


def test_cli_crawl_feed_entries(tmp_path, spark):
    from minerva_etl_spark.cli import main

    df = spark.createDataFrame([(1, RSS)], "feed_id bigint, xml string")
    src = str(tmp_path / "feeds")
    df.write.parquet(src)
    out = str(tmp_path / "entries")
    main(["crawl", "feed-entries", "--input", src, "--output", out])
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2 and rows[0].feed_title == "Example Blog"
