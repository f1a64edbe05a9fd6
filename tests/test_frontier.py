"""Incremental crawl-frontier state: URL normalization semantics, the
two-delivery new-vs-seen cycle, within-delivery collapse, bootstrap,
and incremental == recompute."""

from __future__ import annotations

import pytest

from minerva_etl_spark.operators.frontier import (
    frontier_delta,
    ingest_frontier_increment,
    read_frontier_state,
)


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_normalization_semantics(spark):
    got = {
        r.url
        for r in frontier_delta(
            _urls(
                spark,
                [
                    "HTTPS://Ex.TEST/Path?q=1#frag",  # case + fragment
                    "https://ex.test:443/Path?q=1",   # default port
                    "http://ex.test:8080/a",          # kept port
                    "http://ex.test:80/a",            # default port
                    "https://ex.test",                # empty path -> /
                    "https://ex.test/x?",             # empty query
                ],
            )
        ).collect()
    }
    assert got == {
        "https://ex.test/Path?q=1",  # first two collapse to one key
        "http://ex.test:8080/a",
        "http://ex.test/a",
        "https://ex.test/",
        "https://ex.test/x",
    }


def test_two_poll_cycle_and_state_growth(tmp_path, spark):
    state = str(tmp_path / "frontier")
    d1 = ingest_frontier_increment(
        spark, _urls(spark, ["https://a.test/1", "https://a.test/2"]),
        state,
    )
    assert {(r.url, r.is_new) for r in d1.collect()} == {
        ("https://a.test/1", True),
        ("https://a.test/2", True),
    }
    # poll 2: one re-spelling of a seen URL, one genuinely new, one
    # within-delivery duplicate pair that must collapse to ONE row
    d2 = ingest_frontier_increment(
        spark,
        _urls(
            spark,
            [
                "HTTPS://A.TEST/1#top",   # seen (normalizes to /1)
                "https://a.test/3",       # new
                "https://a.test/4?x=1",   # new ...
                "HTTPS://a.test/4?x=1",   # ... same fetch, same row
            ],
        ),
        state,
    )
    assert {(r.url, r.is_new) for r in d2.collect()} == {
        ("https://a.test/1", False),
        ("https://a.test/3", True),
        ("https://a.test/4?x=1", True),
    }
    # state holds exactly the distinct seen keys, each once
    st = read_frontier_state(spark, state)
    assert st.count() == st.select("url_key").distinct().count() == 4


def test_incremental_equals_recompute(tmp_path, spark):
    """Decisions of poll 2 equal the closed-form recompute: a URL is
    new iff its normalized form is absent from poll 1."""
    p1 = [f"https://s{i % 5}.test/p/{i}" for i in range(40)]
    p2 = [f"https://s{i % 5}.test/p/{i}" for i in range(20, 60)]
    state = str(tmp_path / "f2")
    ingest_frontier_increment(spark, _urls(spark, p1), state)
    got = {
        r.url: r.is_new
        for r in ingest_frontier_increment(
            spark, _urls(spark, p2), state
        ).collect()
    }
    assert got == {u: u not in set(p1) for u in p2}


def test_read_missing_state_raises(tmp_path, spark):
    with pytest.raises(FileNotFoundError, match="no frontier state"):
        read_frontier_state(spark, str(tmp_path / "nope"))


def test_cli_crawl_frontier_ingest(tmp_path, spark):
    from minerva_etl_spark.cli import main

    state = str(tmp_path / "state")
    for n, urls in enumerate(
        [["https://c.test/1"], ["https://c.test/1", "https://c.test/2"]]
    ):
        src = str(tmp_path / f"urls{n}")
        _urls(spark, urls).write.parquet(src)
        out = str(tmp_path / f"dec{n}")
        main(["crawl", "frontier-ingest", "--input", src,
              "--output", out, "--state", state])
    rows = {r.url: r.is_new
            for r in spark.read.parquet(str(tmp_path / "dec1")).collect()}
    assert rows == {"https://c.test/1": False, "https://c.test/2": True}


def test_bucketed_state_matches_and_join_is_exchange_free(
    tmp_path, spark
):
    """The catalog-backed state: decisions equal the parquet-path
    variant, and the history side of the decision join is a bucketed
    scan with NO exchange (only the small delta shuffles)."""
    from minerva_etl_spark.operators.frontier import (
        _decide,
        frontier_delta,
        ingest_frontier_increment_bucketed,
    )

    tbl = "frontier_bkt_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    p1 = [f"https://b.test/p/{i}" for i in range(30)]
    p2 = [f"https://b.test/p/{i}" for i in range(15, 45)]
    ingest_frontier_increment_bucketed(spark, _urls(spark, p1), tbl)
    got = {
        r.url: r.is_new
        for r in ingest_frontier_increment_bucketed(
            spark, _urls(spark, p2), tbl
        ).collect()
    }
    assert got == {u: u not in set(p1) for u in p2}
    # state stays dedup'd and appends preserved the bucket spec
    st = spark.table(tbl)
    assert st.count() == 45

    # plan check: force SMJ so bucketing (not broadcast) carries the
    # join.  Differential: the SAME decision join against the SAME
    # rows read as plain parquet needs one MORE exchange — the one
    # bucketing removes from the history side (the delta side's two,
    # its distinct + conforming to the bucket layout, remain).
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        delta = frontier_delta(_urls(spark, p2))

        def join_plan(history):
            seen = history.select("url_key").distinct().withColumn(
                "__seen", F.lit(True)
            )
            return (
                delta.hint("merge").join(seen, "url_key", "left")
                ._jdf.queryExecution().executedPlan().toString()
            )

        bucketed = join_plan(spark.table(tbl))
        assert "Bucketed: true" in bucketed
        plain_dir = str(tmp_path / "plain_state")
        spark.table(tbl).write.parquet(plain_dir)
        plain = join_plan(spark.read.parquet(plain_dir))
        assert bucketed.count("Exchange") == 2  # both delta-side
        assert plain.count("Exchange") == 3  # + history shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_port_in_query_string_is_not_stolen(spark):
    """The port regex is anchored to THIS url's authority — a URL
    embedded in the query string must not contribute a port."""
    got = {
        r.url
        for r in frontier_delta(
            _urls(
                spark,
                [
                    "https://ex.test/r?to=http://a.b:8080/x",
                    "https://u:p@ex.test:8443/a",  # real port kept
                ],
            )
        ).collect()
    }
    assert "https://ex.test/r?to=http://a.b:8080/x" in got
    assert not any(u.startswith("https://ex.test:8080") for u in got)
