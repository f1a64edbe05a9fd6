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
