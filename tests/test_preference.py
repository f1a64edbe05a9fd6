"""DPO preference-pair construction: deterministic tiebreaks, margin
filter, degenerate-prompt drops, partitioning invariance."""

from __future__ import annotations

from minerva_etl_spark.operators.preference import preference_pairs

SCHEMA = "prompt_id bigint, cand_id bigint, response string, score double"


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["prompt_id"]: r.asDict()
        for r in preference_pairs(df, **kw).collect()
    }


def test_basic_pair(spark):
    out = _pairs(
        spark,
        [
            (1, 10, "best", 9.0),
            (1, 11, "mid", 5.0),
            (1, 12, "worst", 1.0),
        ],
    )
    p = out[1]
    assert p["chosen"] == "best" and p["rejected"] == "worst"
    assert p["score_chosen"] == 9.0 and p["score_rejected"] == 1.0
    assert p["margin"] == 8.0 and p["n_cands"] == 3


def test_tiebreak_lowest_cand_id(spark):
    # two candidates tie at the top and two at the bottom: the lowest
    # cand_id wins on BOTH sides, regardless of insertion order
    rows = [
        (1, 7, "top-late", 9.0),
        (1, 3, "top-early", 9.0),
        (1, 9, "bot-late", 1.0),
        (1, 4, "bot-early", 1.0),
    ]
    for perm in (rows, rows[::-1], [rows[2], rows[0], rows[3], rows[1]]):
        p = _pairs(spark, perm)[1]
        assert p["chosen"] == "top-early"
        assert p["rejected"] == "bot-early"


def test_all_tied_prompt_dropped(spark):
    # zero margin = no preference signal -> dropped (also prevents the
    # degenerate chosen == rejected pair)
    out = _pairs(spark, [(1, 1, "a", 5.0), (1, 2, "b", 5.0)])
    assert out == {}


def test_single_candidate_dropped(spark):
    out = _pairs(spark, [(1, 1, "only", 5.0), (2, 1, "x", 3.0),
                         (2, 2, "y", 1.0)])
    assert set(out) == {2}


def test_min_margin(spark):
    rows = [
        (1, 1, "a", 5.0), (1, 2, "b", 4.5),   # margin 0.5
        (2, 1, "c", 9.0), (2, 2, "d", 1.0),   # margin 8.0
    ]
    assert set(_pairs(spark, rows)) == {1, 2}
    assert set(_pairs(spark, rows, min_margin=2.0)) == {2}
    # strictly greater: a margin exactly at the threshold is dropped
    assert set(_pairs(spark, rows, min_margin=8.0)) == set()


def test_null_rows_ignored(spark):
    out = _pairs(
        spark,
        [
            (1, 1, "a", 5.0),
            (1, 2, "b", 1.0),
            (1, 3, None, 99.0),   # null response: ignored
            (1, 4, "c", None),    # null score: ignored
        ],
    )
    p = out[1]
    assert p["n_cands"] == 2 and p["chosen"] == "a" and p["rejected"] == "b"


def test_partitioning_invariance(spark):
    rows = [
        (p, c, f"r{p}-{c}", float((p * 31 + c * 17) % 7))
        for p in range(1, 9)
        for c in range(1, 6)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, preference_pairs(df).collect()))
    b = sorted(map(tuple, preference_pairs(df.repartition(13)).collect()))
    assert a == b and len(a) > 0


def test_no_window_in_plan(spark):
    # the scale contract: ONE partial-aggregating groupBy, no window
    df = spark.createDataFrame([(1, 1, "a", 1.0)], SCHEMA)
    plan = preference_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "partial_min_by" in plan or (
        "HashAggregate" in plan or "ObjectHashAggregate" in plan
    )
