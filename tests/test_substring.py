"""Corpus-scale exact substring dedup (`operators/substring.py`):
planted-span removal semantics, keep-first policy, span merging,
short-doc passthrough, and the CLI verb."""

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.substring import substring_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_duplicate_removed_keep_first(spark):
    """A verbatim ≥w-token span shared by two docs survives only in
    the lower doc_id; the other doc loses exactly the span."""
    span = " ".join(f"s{i}" for i in range(10))
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"zero {span} one two three four five six"),
    ]
    out = {
        r.doc_id: r
        for r in substring_dedup(_df(spark, rows), w=8).collect()
    }
    assert out[1].n_removed == 0
    assert out[1].kept_text == rows[0][1]
    # doc 2 loses the 10 span tokens (w=8 shingles cover exactly them)
    assert out[2].n_removed == 10
    assert "s0" not in out[2].kept_text
    assert out[2].kept_text.startswith("zero ")
    assert out[2].kept_text.endswith("six")


def test_overlapping_windows_merge_into_one_span(spark):
    """Consecutive duplicated shingles merge: a 16-token duplicated
    region removes all 16 tokens in the later doc, not 8."""
    span = " ".join(f"m{i}" for i in range(16))
    rows = [
        (1, f"{span} tail0 tail1"),
        (2, f"head0 head1 {span}"),
    ]
    out = {
        r.doc_id: r
        for r in substring_dedup(_df(spark, rows), w=8).collect()
    }
    assert out[1].n_removed == 0
    assert out[2].n_removed == 16
    assert out[2].kept_text == "head0 head1"


def test_within_doc_repeat_keeps_first_occurrence(spark):
    """The rule also fires WITHIN one document: the second verbatim
    occurrence of a ≥w-token run is removed, the first kept."""
    span = " ".join(f"r{i}" for i in range(8))
    rows = [(7, f"{span} middle {span}")]
    out = substring_dedup(_df(spark, rows), w=8).collect()[0]
    assert out.n_removed == 8
    assert out.kept_text == f"{span} middle"


def test_short_docs_pass_through(spark):
    rows = [(1, "just a few tokens"), (2, "just a few tokens")]
    out = substring_dedup(_df(spark, rows), w=8).collect()
    assert all(r.n_removed == 0 for r in out)
    assert all(r.kept_text == "just a few tokens" for r in out)


def test_unique_corpus_untouched(spark):
    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
    ]
    out = substring_dedup(_df(spark, rows), w=8).collect()
    assert all(r.n_removed == 0 for r in out)
    assert all(r.n_tokens == 30 for r in out)


def test_w_bound(spark):
    with pytest.raises(ValueError, match="w must be"):
        substring_dedup(_df(spark, [(1, "x y")]), w=1)


def test_cli_substring_dedup(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_corpus

    span = " ".join(f"c{i}" for i in range(12))
    inp = str(tmp_path / "docs")
    _df(
        spark,
        [(1, f"{span} unique1 unique2"), (2, f"pre1 pre2 {span}")],
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "substring-dedup"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.window = 8
    a.text_col = "text"
    cmd_corpus(a)
    out = {
        r.doc_id: r
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out[1].n_removed == 0
    assert out[2].n_removed == 12


def test_plan_is_python_free_no_cartesian(spark):
    """The whole rule is Catalyst: shingle projection, digest groupBy,
    equi-joins, coverage rebuild — no Python eval nodes and no
    cartesian product anywhere."""
    span = " ".join(f"p{i}" for i in range(10))
    df = _df(spark, [(1, span), (2, span)])
    plan = (
        substring_dedup(df, w=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_matches_batch_restricted_to_delta(spark, tmp_path):
    """build(first half) + increment(second half) == the full batch
    run restricted to the delta (ascending-id deliveries), and the
    digest state grows append-only."""
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        substring_dedup,
        substring_increment,
    )

    span = " ".join(f"q{i}" for i in range(10))
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, " ".join(f"u{i}" for i in range(20))),
        # delta: re-uses history's span AND plants its own duplicate
        (10, f"zero {span} one two three four five six"),
        (11, f"pre {span} post " + " ".join(f"v{i}" for i in range(9))),
    ]
    df = _df(spark, rows)
    hist = df.filter("doc_id < 10")
    delta = df.filter("doc_id >= 10")
    p = str(tmp_path / "state")
    build_substring_state(spark, hist, p, w=8)
    n0 = spark.read.parquet(p).count()
    inc = {
        r.doc_id: (r.n_removed, r.kept_text)
        for r in substring_increment(spark, delta, p, w=8).collect()
    }
    batch = {
        r.doc_id: (r.n_removed, r.kept_text)
        for r in substring_dedup(df, w=8).collect()
        if r.doc_id >= 10
    }
    assert inc == batch
    assert inc[10][0] == 10  # the historic span is removed
    n1 = spark.read.parquet(p).count()
    assert n1 > n0  # new digests appended, history untouched


def test_increment_rejects_non_ascending_delivery(spark, tmp_path):
    """r12 ADVICE: the batch-equivalence guarantee assumes ascending
    delivery ids; the state now carries a _watermark sidecar and a
    delta at or below it raises instead of silently diverging."""
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        substring_increment,
    )

    rows = [(1, " ".join(f"a{i}" for i in range(12))),
            (5, " ".join(f"b{i}" for i in range(12)))]
    p = str(tmp_path / "state")
    build_substring_state(spark, _df(spark, rows), p, w=8)
    stale = _df(spark, [(5, " ".join(f"c{i}" for i in range(12)))])
    with pytest.raises(ValueError, match="watermark"):
        substring_increment(spark, stale, p, w=8)
    # fresh ids still flow, and the watermark advances with them
    ok = _df(spark, [(9, " ".join(f"d{i}" for i in range(12)))])
    assert substring_increment(spark, ok, p, w=8).count() == 1
    with pytest.raises(ValueError, match="watermark"):
        substring_increment(spark, ok, p, w=8)


def test_bucketed_state_matches_parquet_state(spark, tmp_path):
    """r13 (the r12 verdict's ask 4): the bucketed digest state makes
    the SAME decisions as the parquet-path state across build + two
    deliveries, and enforces the same watermark."""
    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        build_substring_state_bucketed,
        substring_increment,
        substring_increment_bucketed,
    )

    span = " ".join(f"s{i}" for i in range(10))
    hist = _df(spark, [
        (1, f"alpha {span} omega"),
        (2, " ".join(f"h{i}" for i in range(15))),
    ])
    d1 = _df(spark, [(10, f"pre {span} post one two three four five")])
    d2 = _df(spark, [(20, f"x {span} y " + " ".join(
        f"k{i}" for i in range(8)))])

    p = str(tmp_path / "plain")
    spark.sql("DROP TABLE IF EXISTS substr_state_bkt")
    r_plain = []
    r_bkt = []
    r_plain.append(build_substring_state(spark, hist, p, w=8))
    r_bkt.append(build_substring_state_bucketed(
        spark, hist, "substr_state_bkt", w=8, n_buckets=4,
        path=str(tmp_path / "bkt")))
    for d in (d1, d2):
        r_plain.append(substring_increment(spark, d, p, w=8))
        r_bkt.append(substring_increment_bucketed(
            spark, d, "substr_state_bkt", w=8, n_buckets=4,
            path=str(tmp_path / "bkt")))
    for a, b in zip(r_plain, r_bkt):
        ra = {(r.doc_id, r.n_removed, r.kept_text) for r in a.collect()}
        rb = {(r.doc_id, r.n_removed, r.kept_text) for r in b.collect()}
        assert ra == rb
    # identical watermark enforcement
    stale = _df(spark, [(15, " ".join(f"z{i}" for i in range(12)))])
    with pytest.raises(ValueError, match="watermark"):
        substring_increment_bucketed(
            spark, stale, "substr_state_bkt", w=8, n_buckets=4,
            path=str(tmp_path / "bkt"))


def test_bucketed_history_join_is_exchange_free(spark, tmp_path):
    """Differential plan assert: the delta-occurrences ⋈ history
    digest join has exactly ONE FEWER Exchange against the bucketed
    state than against the plain parquet state — the history side's
    shuffle is gone (the delta side still shuffles to the bucket
    layout, as designed)."""
    from minerva_etl_spark.operators.substring import (
        _occurrences,
        build_substring_state,
        build_substring_state_bucketed,
    )
    from minerva_etl_spark.store.bucketed import count_exchanges

    hist = _df(spark, [
        (i, " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(1, 6)
    ])
    p = str(tmp_path / "plain")
    spark.sql("DROP TABLE IF EXISTS substr_state_bkt2")
    build_substring_state(spark, hist, p, w=8)
    build_substring_state_bucketed(
        spark, hist, "substr_state_bkt2", w=8, n_buckets=4,
        path=str(tmp_path / "bkt"))
    delta = _df(spark, [(30, " ".join(f"d{j}" for j in range(12)))])
    _, occ = _occurrences(delta, 8, "doc_id", "text")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j_bkt = occ.join(
            spark.table("substr_state_bkt2").select("digest"), "digest"
        )
        j_plain = occ.join(
            spark.read.parquet(p).select("digest"), "digest"
        )
        n_bkt, n_plain = count_exchanges(j_bkt), count_exchanges(j_plain)
        assert n_bkt == n_plain - 1, (n_bkt, n_plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
