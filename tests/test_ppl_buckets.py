"""CCNet perplexity buckets: the skew-safe exact NTILE equals the
window formulation on every (language-size, remainder) shape."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minerva_etl_spark.operators.lm import perplexity_buckets


def _frame(spark, sizes):
    rows = []
    rid = 0
    for lang, cnt in sizes:
        for _ in range(cnt):
            rows.append((rid, lang, round((rid * 37 % 100) / 7.0, 4)))
            rid += 1
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, nll_bits double"
    )


def test_two_pass_ntile_equals_window_ntile(spark):
    """One giant language + a long tail incl. N < n languages and
    every remainder class — the two-pass prefix-rank form must match
    ntile() row for row."""
    df = _frame(
        spark,
        [("en", 37), ("de", 10), ("fr", 3), ("xx", 1), ("yy", 2),
         ("zz", 4), ("qq", 6)],
    )
    got = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(df, num_ranges=5).collect()
    }
    want = {
        r.doc_id: r.b
        for r in df.withColumn(
            "b",
            F.ntile(3).over(
                Window.partitionBy("lang").orderBy(
                    F.col("nll_bits").asc(), F.col("doc_id").asc()
                )
            ),
        ).collect()
    }
    assert got == want


def test_tier_labels_and_ordering(spark):
    df = _frame(spark, [("en", 9)])
    out = sorted(
        perplexity_buckets(df).collect(), key=lambda r: r.nll_bits
    )
    assert [r.tier for r in out] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # head = LOWEST bits/token (closest to the reference)
    assert max(r.nll_bits for r in out[:3]) <= min(
        r.nll_bits for r in out[6:]
    )


def test_custom_bucket_count_labels(spark):
    df = _frame(spark, [("en", 10)])
    out = perplexity_buckets(df, n_buckets=5).collect()
    assert {r.tier for r in out} == {"b1", "b2", "b3", "b4", "b5"}
    assert all(
        sum(1 for r in out if r.bucket == b) == 2 for b in range(1, 6)
    )


def test_prefix_offsets_ride_broadcast_joins_not_literal_maps(spark):
    """The per-(partition, language) prefix offsets are bounded, but a
    create_map LITERAL of them grows the plan with ranges × languages
    — the broadcast-join form keeps the plan constant-size (r11
    verdict ask 4).  Assert the literal map is gone from the plan and
    two broadcast joins carry the offsets/totals instead."""
    df = _frame(spark, [("en", 20), ("de", 7)])
    out = perplexity_buckets(df, num_ranges=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "map(" not in optimized
    # and the rewrite is still exact
    got = {r.doc_id: r.bucket for r in out.collect()}
    want = {
        r.doc_id: r.b
        for r in df.withColumn(
            "b",
            F.ntile(3).over(
                Window.partitionBy("lang").orderBy(
                    F.col("nll_bits").asc(), F.col("doc_id").asc()
                )
            ),
        ).collect()
    }
    assert got == want


def test_empty_input(spark):
    df = _frame(spark, [])
    assert perplexity_buckets(df).count() == 0
