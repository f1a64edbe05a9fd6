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
