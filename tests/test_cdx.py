"""CDXJ crawl index (`sources/cdx.py`): SURT key semantics, write/
read round trip, sorted-shard contract, dirty lines, plugin."""

from pyspark.sql import functions as F


def test_surt_key_expr(spark):
    from minerva_etl_spark.sources.cdx import surt_key_expr

    rows = [
        (1, "https://www.Example.com/a/b?x=1"),
        (2, "http://sub.test.org"),
        (3, "https://one.two.three.io/p"),
    ]
    df = spark.createDataFrame(rows, "i bigint, url string")
    keys = {
        r.i: r.k
        for r in df.selectExpr("i", f"{surt_key_expr('url')} AS k")
        .collect()
    }
    assert keys[1] == "com,example,www)/a/b?x=1"
    assert keys[2] == "org,test,sub)/"
    assert keys[3] == "io,three,two,one)/p"


def _captures(spark):
    rows = [
        ("part-0.cdxj", "com,example)/p1", "2026-02-03 04:05:06",
         "https://example.com/p1", "text/html", 200, "sha1:AAA",
         "w-00.warc.gz", 1234, 555),
        ("part-0.cdxj", "com,example)/p0", "2026-02-03 04:05:07",
         "https://example.com/p0", "application/pdf", 301,
         "sha1:BBB", "w-01.warc.gz", 99, 42),
        ("part-1.cdxj", "org,other)/x", "2026-02-03 05:00:00",
         "https://other.org/x", "text/html", 404, "sha1:CCC",
         "w-02.warc.gz", 7, 8),
    ]
    return spark.createDataFrame(
        rows,
        "cdx_file string, urlkey string, ts string, url string, "
        "mime string, status int, digest string, warc_file string, "
        "warc_offset bigint, warc_length bigint",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def test_roundtrip_and_sorted_shards(spark, tmp_path):
    from minerva_etl_spark.sources.cdx import read_cdxj, write_cdxj

    d = str(tmp_path / "cdx")
    written = {r.cdx_file: r.n_lines
               for r in write_cdxj(_captures(spark), d).collect()}
    assert written == {"part-0.cdxj": 2, "part-1.cdxj": 1}
    back = {r.urlkey: r for r in read_cdxj(spark, d).collect()}
    assert len(back) == 3
    r = back["com,example)/p0"]
    assert (r.status, r.mime, r.warc_offset, r.warc_length) == (
        301, "application/pdf", 99, 42)
    assert r.host == "example.com"
    assert str(r.ts) == "2026-02-03 04:05:07"
    # shard lines sorted by (urlkey, ts) — the merge contract
    lines = (tmp_path / "cdx" / "part-0.cdxj").read_text().splitlines()
    assert lines[0].startswith("com,example)/p0 ")
    assert lines[1].startswith("com,example)/p1 ")


def test_malformed_lines_drop(spark, tmp_path):
    from minerva_etl_spark.sources.cdx import read_cdxj

    p = tmp_path / "dirty.cdxj"
    p.write_text(
        'com,a)/x 20260203040506 {"url": "https://a.com/x", '
        '"status": "200", "offset": "1", "length": "2", '
        '"filename": "w.warc.gz", "mime": "text/html", '
        '"digest": "sha1:D"}\n'
        "garbage line without json\n"
    )
    out = read_cdxj(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].urlkey == "com,a)/x"


def test_registered_as_harvest_plugin(spark, tmp_path):
    from minerva_etl_spark.sources.cdx import write_cdxj
    from minerva_etl_spark.sources.plugins import get_plugin

    d = str(tmp_path / "cdx")
    write_cdxj(_captures(spark), d).collect()
    assert get_plugin("cdxj")(spark, d, None).count() == 3


def test_recrawl_candidates(spark):
    """Latest-per-urlkey with the tri-state churn flag and the
    ntz-safe capture gap."""
    from minerva_etl_spark.sources.cdx import recrawl_candidates

    rows = [
        # two captures, digest changed
        ("com,a)/x", "2026-02-03 00:00:00", "https://a.com/x",
         200, "sha1:AAA"),
        ("com,a)/x", "2026-02-04 00:00:10", "https://a.com/x",
         200, "sha1:BBB"),
        # two captures, digest stable
        ("com,a)/y", "2026-02-03 00:00:00", "https://a.com/y",
         200, "sha1:CCC"),
        ("com,a)/y", "2026-02-03 06:00:00", "https://a.com/y",
         200, "sha1:CCC"),
        # single capture: no baseline
        ("com,a)/z", "2026-02-03 00:00:00", "https://a.com/z",
         404, "sha1:DDD"),
    ]
    df = spark.createDataFrame(
        rows,
        "urlkey string, ts string, url string, status int, "
        "digest string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r.urlkey: r for r in recrawl_candidates(df).collect()}
    assert len(out) == 3
    x = out["com,a)/x"]
    assert (x.n_captures, x.changed, x.secs_since_prev) == (
        2, True, 86410)
    assert x.digest == "sha1:BBB"  # the LATEST capture wins
    y = out["com,a)/y"]
    assert (y.n_captures, y.changed, y.secs_since_prev) == (
        2, False, 21600)
    z = out["com,a)/z"]
    assert (z.n_captures, z.changed, z.secs_since_prev) == (
        1, None, None)


def test_capture_state_increment_equals_full_recompute(spark, tmp_path):
    """r14: the bucketed capture state — a delivery's recrawl
    decisions equal the full-index recompute restricted to the
    urlkeys it touched; untouched keys are absent."""
    import uuid

    from pyspark.sql import functions as F

    from minerva_etl_spark.sources.cdx import (
        build_capture_state,
        ingest_captures_increment,
        recrawl_candidates,
    )

    def caps(rows):
        return spark.createDataFrame(
            rows, "urlkey string, url string, ts string, status int, "
                  "digest string"
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    first = caps([
        ("test,a)/x", "https://a.test/x", "2026-02-01 00:00:00", 200, "d1"),
        ("test,b)/y", "https://b.test/y", "2026-02-01 01:00:00", 200, "d2"),
        ("test,c)/z", "https://c.test/z", "2026-02-01 02:00:00", 200, "d3"),
    ])
    second = caps([
        ("test,a)/x", "https://a.test/x", "2026-02-02 00:00:00", 200, "d1b"),
        ("test,c)/z", "https://c.test/z", "2026-02-03 02:00:00", 200, "d3"),
    ])
    tbl = f"cdx_state_{uuid.uuid4().hex[:8]}"
    path = str(tmp_path / "state")
    try:
        n = build_capture_state(spark, first, tbl, n_buckets=4,
                                path=path)
        assert n == 3
        out = {r.urlkey: r for r in ingest_captures_increment(
            spark, second, tbl, n_buckets=4, path=path).collect()}
        # only touched keys come back
        assert set(out) == {"test,a)/x", "test,c)/z"}
        assert out["test,a)/x"].changed is True      # digest churned
        assert out["test,c)/z"].changed is False     # same digest
        assert out["test,a)/x"].n_captures == 2
        assert out["test,a)/x"].secs_since_prev == 86400
        # equal to the full recompute restricted to touched keys
        full = {r.urlkey: r for r in recrawl_candidates(
            first.unionByName(second)).collect()}
        for k, r in out.items():
            assert r == full[k]
        # the state itself accumulated both deliveries
        assert spark.table(tbl).count() == 5
        # increment against a missing table raises
        import pytest as _pytest

        with _pytest.raises(ValueError, match="does not exist"):
            ingest_captures_increment(
                spark, second, "cdx_state_never_built")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_capture_state_window_reads_bucketed_without_exchange(
    spark, tmp_path
):
    """Plan shape: the recrawl window over the bucketed state needs
    NO Exchange on the state scan (the bucket layout IS the window
    partitioning)."""
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from minerva_etl_spark.sources.cdx import build_capture_state

    rows = [(f"test,h{i % 7})/p{i}", f"https://h{i % 7}.test/p{i}",
             "2026-02-01 00:00:00", 200, f"d{i}") for i in range(50)]
    df = spark.createDataFrame(
        rows, "urlkey string, url string, ts string, status int, "
              "digest string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    tbl = f"cdx_state_{uuid.uuid4().hex[:8]}"
    try:
        build_capture_state(spark, df, tbl, n_buckets=4,
                            path=str(tmp_path / "s"))
        w = Window.partitionBy("urlkey").orderBy("ts")
        windowed = spark.table(tbl).withColumn(
            "rn", F.row_number().over(w)
        )
        plan = windowed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_wat_links_resolution_rules(spark, tmp_path):
    """r14: wat_links resolves absolute, protocol-relative,
    root-relative, and directory-relative urls against the source
    page, in pure codegen."""
    import json

    from pyspark.sql import functions as F  # noqa: F401

    from minerva_etl_spark.sources.wet import wat_links, write_wat_files

    links = [
        {"url": "https://other.test/abs"},
        {"url": "//cdn.test/pr"},
        {"url": "/root/rel"},
        {"url": "sib.html"},
    ]
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": "https://src.test/a/b/page.html"
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {"Links": links}
                }
            },
        }
    }
    df = spark.createDataFrame(
        [("w.warc.wat.gz", "rec-1", "https://src.test/a/b/page.html",
          "2026-02-03T04:05:06Z", json.dumps(env))],
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    root = str(tmp_path / "wat")
    write_wat_files(df, root).collect()
    rows = {r.link_pos: r for r in wat_links(spark, root).collect()}
    assert rows[0].url == "https://other.test/abs"
    assert rows[0].dst_host == "other.test" and rows[0].external
    assert rows[1].url == "https://cdn.test/pr"
    assert rows[2].url == "https://src.test/root/rel"
    assert not rows[2].external
    assert rows[3].url == "https://src.test/a/b/sib.html"
    assert rows[3].src_host == "src.test"


def test_wat_links_query_string_not_a_directory(spark, tmp_path):
    """r15 (ADVICE): slashes inside the source page's query string
    must not count as path directories — http://h/p?x=/y resolves
    'a.html' to http://h/a.html (RFC 3986 merge strips the query
    first), and a query-before-any-slash URL keeps a clean host."""
    import json

    from minerva_etl_spark.sources.wet import wat_links, write_wat_files

    def env_for(src, links):
        return {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": src},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": [{"url": u} for u in links]
                        }
                    }
                },
            }
        }

    cases = [
        ("https://h.test/p?x=/y", ["a.html"]),
        ("https://h.test/a/b.php?d=/e/f/", ["c.html"]),
        ("https://h.test?q=1", ["r.html"]),
        ("https://h.test/a/#frag/with/slash", ["s.html"]),
    ]
    df = spark.createDataFrame(
        [
            (f"w{i}.warc.wat.gz", f"rec-{i}", src,
             "2026-02-03T04:05:06Z", json.dumps(env_for(src, links)))
            for i, (src, links) in enumerate(cases)
        ],
        "warc_file string, record_id string, target_uri string, "
        "warc_date string, meta_json string",
    )
    root = str(tmp_path / "wat")
    write_wat_files(df, root).collect()
    got = {r.src_uri: r for r in wat_links(spark, root).collect()}
    assert got["https://h.test/p?x=/y"].url == "https://h.test/a.html"
    assert (got["https://h.test/a/b.php?d=/e/f/"].url
            == "https://h.test/a/c.html")
    assert got["https://h.test?q=1"].url == "https://h.test/r.html"
    assert got["https://h.test?q=1"].src_host == "h.test"
    assert (got["https://h.test/a/#frag/with/slash"].url
            == "https://h.test/a/s.html")
