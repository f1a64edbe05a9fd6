"""robots.txt filtering: parser semantics through the group-wise
operator, join-miss default, agent sections, and the filtering form."""

from minerva_etl_spark.operators.robots import filter_allowed, robots_allowed


def _tables(spark):
    urls = spark.createDataFrame(
        [
            (1, "a.com", "https://a.com/public/x"),
            (2, "a.com", "https://a.com/private/x"),
            (3, "b.com", "https://b.com/anything"),
            (4, "c.com", "https://c.com/private/x"),
            (5, "a.com", "https://a.com/"),
        ],
        "doc_id bigint, host string, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/"),
            # b.com: robots row exists but is empty -> allow all
            ("b.com", ""),
            # c.com has no row at all -> allow all (join miss)
        ],
        "host string, robots_txt string",
    )
    return urls, robots


def test_robots_allowed_semantics(spark):
    urls, robots = _tables(spark)
    got = {r.doc_id: r.allowed
           for r in robots_allowed(urls, robots).collect()}
    assert got == {1: True, 2: False, 3: True, 4: True, 5: True}


def test_filter_allowed_drops_blocked(spark):
    urls, robots = _tables(spark)
    kept = sorted(
        r.doc_id for r in filter_allowed(urls, robots).collect()
    )
    assert kept == [1, 3, 4, 5]


def test_duplicate_robots_rows_do_not_fan_out(spark):
    """Two robots rows for one host must not duplicate URL rows; the
    lexicographically smallest text wins (deterministic dedupe)."""
    urls = spark.createDataFrame(
        [(1, "a.com", "https://a.com/private/x"),
         (2, "a.com", "https://a.com/public/x")],
        "doc_id bigint, host string, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/"),
            ("a.com", "User-agent: *\nDisallow: /public/"),
        ],
        "host string, robots_txt string",
    )
    rows = robots_allowed(urls, robots).collect()
    assert len(rows) == 2
    got = {r.doc_id: r.allowed for r in rows}
    # min() picks "Disallow: /private/" (p < u in "public")
    assert got == {1: False, 2: True}


def test_scan_matches_grouped_reference(spark):
    """Differential: the skew-safe mapInPandas scan must equal the
    naive one-group-per-host evaluation on a many-host fixture with a
    deliberately hot host."""
    from urllib import robotparser

    urls_rows = []
    robots_rows = []
    doc = 0
    for h in range(12):
        host = f"h{h}.example"
        if h % 3 == 0:
            robots_rows.append(
                (host, "User-agent: *\nDisallow: /no/")
            )
        elif h % 3 == 1:
            robots_rows.append((host, ""))
        # h % 3 == 2: no robots row
        n = 200 if h == 0 else 5  # h0 = the hot host
        for i in range(n):
            path = "/no/x" if i % 2 else "/yes/x"
            urls_rows.append((doc, host, f"https://{host}{path}"))
            doc += 1
    urls = spark.createDataFrame(
        urls_rows, "doc_id bigint, host string, url string"
    ).repartition(8)
    robots = spark.createDataFrame(
        robots_rows, "host string, robots_txt string"
    )

    got = {r.doc_id: r.allowed
           for r in robots_allowed(urls, robots).collect()}

    txt_by_host = dict(robots_rows)
    want = {}
    for d, host, url in urls_rows:
        txt = txt_by_host.get(host)
        if not txt:
            want[d] = True
        else:
            rp = robotparser.RobotFileParser()
            rp.parse(txt.splitlines())
            want[d] = rp.can_fetch("*", url)
    assert got == want
    assert sum(1 for v in want.values() if not v) > 0


def test_agent_specific_section(spark):
    urls = spark.createDataFrame(
        [(1, "a.com", "https://a.com/x")],
        "doc_id bigint, host string, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: greedybot\nDisallow: /\n\n"
                   "User-agent: *\nDisallow:")],
        "host string, robots_txt string",
    )
    assert robots_allowed(urls, robots, agent="greedybot") \
        .collect()[0].allowed is False
    assert robots_allowed(urls, robots, agent="politebot") \
        .collect()[0].allowed is True


def test_sitemaps_from_robots(spark):
    from minerva_etl_spark.operators.robots import sitemaps_from_robots

    robots = spark.createDataFrame(
        [
            ("a.test",
             "User-agent: *\nDisallow: /x\n"
             "Sitemap: https://a.test/s1.xml\n"
             "SITEMAP:https://a.test/s2.xml\n"
             "  sitemap : not-extracted-has-space-in-url? no\n"),
            ("b.test", "User-agent: *\nAllow: /"),
        ],
        "host string, robots_txt string",
    )
    got = {(r.host, r.sitemap_url)
           for r in sitemaps_from_robots(robots).collect()}
    assert got == {
        ("a.test", "https://a.test/s1.xml"),
        ("a.test", "https://a.test/s2.xml"),
    }
    # plan stays Python-free (scan + generate, no BatchEvalPython)
    plan = sitemaps_from_robots(robots)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_crawl_delay_sections_and_decimals():
    from minerva_etl_spark.operators.robots import _crawl_delay_from_text

    # decimals parse (the stdlib's isdigit() gate drops these)
    assert _crawl_delay_from_text(
        "User-agent: *\nCrawl-delay: 2.5\nDisallow: /x", "*"
    ) == 2.5
    # specific-agent section beats *, and matching is by product token
    txt = ("User-agent: bot\nCrawl-delay: 9\n\n"
           "User-agent: *\nCrawl-delay: 1")
    assert _crawl_delay_from_text(txt, "MegaBot/2.0") == 9
    assert _crawl_delay_from_text(txt, "other") == 1
    # adjacent UA lines share one group (RFC 9309)
    assert _crawl_delay_from_text(
        "User-agent: a\nUser-agent: b\nCrawl-delay: 4", "b"
    ) == 4
    # no delay stated / unparseable value -> None
    assert _crawl_delay_from_text("User-agent: *\nAllow: /", "*") is None
    assert _crawl_delay_from_text(
        "User-agent: *\nCrawl-delay: soon", "*"
    ) is None


def test_schedule_fetches_slots_and_offsets(spark):
    from minerva_etl_spark.operators.robots import (
        crawl_delays,
        schedule_fetches,
    )

    robots = spark.createDataFrame(
        [("a.test", "User-agent: *\nCrawl-delay: 2.5"),
         ("b.test", "User-agent: *\nAllow: /")],
        "host string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("https://a.test/2", "a.test"),
         ("https://a.test/1", "a.test"),
         ("https://b.test/9", "b.test")],
        "url string, host string",
    )
    out = schedule_fetches(
        urls, crawl_delays(robots), default_delay=1.0
    ).orderBy("host", "slot").collect()
    assert [(r.url, r.slot, r.fetch_offset_s) for r in out] == [
        ("https://a.test/1", 0, 0.0),
        ("https://a.test/2", 1, 2.5),
        ("https://b.test/9", 0, 0.0),
    ]


def test_crawl_delay_rejects_nonfinite_and_negative():
    from minerva_etl_spark.operators.robots import _crawl_delay_from_text

    for bad in ("-1", "nan", "inf", "-inf"):
        assert _crawl_delay_from_text(
            f"User-agent: *\nCrawl-delay: {bad}", "*"
        ) is None
    # absurd-but-finite clamps to the hour ceiling
    assert _crawl_delay_from_text(
        "User-agent: *\nCrawl-delay: 1e99", "*"
    ) == 3600.0
