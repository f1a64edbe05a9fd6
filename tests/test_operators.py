"""Operator semantics on tiny in-memory DataFrames — mirrors the
reference's DataPackage / store / attribute unit+integration tiers
(`tests/storage/trend/test_datapackage.py`,
`integration_tests/storage/trend/test_store.py`,
`integration_tests/storage/attribute/test_attributestore.py`)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.aggregation import TrendAggSpec, time_aggregate
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import (
    dedup_last_wins,
    insert_missing,
    merge_packages,
    upsert,
)


def ts(*args):
    return datetime(*args)


@pytest.fixture()
def trend_df(spark):
    rows = [
        (1, ts(2024, 1, 1, 0, 5), 10.0),
        (1, ts(2024, 1, 1, 0, 55), 20.0),
        (1, ts(2024, 1, 1, 1, 0), 30.0),   # exact boundary -> 01:00 bucket
        (2, ts(2024, 1, 1, 1, 30), 5.0),
    ]
    return spark.createDataFrame(rows, "entity_id int, timestamp timestamp_ntz, v double")


def test_time_aggregate_half_open_window(trend_df):
    out = time_aggregate(
        trend_df, "1h", [TrendAggSpec("v", "sum", alias="sum_v")]
    ).collect()
    got = {(r.entity_id, r.timestamp): (r.samples, r.sum_v) for r in out}
    # rows at 00:05, 00:55 and the exact-boundary 01:00 row all label 01:00
    assert got[(1, ts(2024, 1, 1, 1, 0))] == (3, 60.0)
    assert got[(2, ts(2024, 1, 1, 2, 0))] == (1, 5.0)
    assert len(got) == 2


def test_time_aggregate_rollup_samples(spark, trend_df):
    hourly = time_aggregate(trend_df, "1h", [TrendAggSpec("v", "sum", alias="v")])
    daily = time_aggregate(hourly, "1d", [TrendAggSpec("v", "sum", alias="v")])
    row = daily.filter(F.col("entity_id") == 1).collect()[0]
    assert row.samples == 3  # summed, not recounted
    assert row.v == 60.0
    assert row.timestamp == ts(2024, 1, 2, 0, 0)


def test_upsert_last_wins(spark):
    df = spark.createDataFrame(
        [(1, "a", 1, 10.0), (1, "a", 2, 20.0), (2, "b", 1, 5.0)],
        "k int, t string, seq int, v double",
    )
    out = dedup_last_wins(df, ["k", "t"], "seq")
    got = {(r.k, r.t): r.v for r in out.collect()}
    assert got == {(1, "a"): 20.0, (2, "b"): 5.0}


def test_upsert_existing_vs_incoming(spark):
    existing = spark.createDataFrame([(1, 10.0, 100), (2, 20.0, 100)], "k int, v double, m int")
    incoming = spark.createDataFrame([(2, 99.0, 50), (3, 30.0, 100)], "k int, v double, m int")
    out = upsert(existing, incoming, ["k"], greatest_cols=["m"])
    got = {r.k: (r.v, r.m) for r in out.collect()}
    # key 2: incoming value wins, but m keeps greatest(100, 50)
    assert got == {1: (10.0, 100), 2: (99.0, 100), 3: (30.0, 100)}


def _upsert_table_cycle(spark, tmp_path, substrate):
    """Two delivery cycles through the upsert_table sink; returns the
    final table contents keyed by k."""
    from minerva_etl_spark.operators.upsert import (
        _delta_available,
        upsert_table,
    )

    if substrate is None:  # mirror upsert_table's auto-dispatch
        substrate = "delta" if _delta_available(spark) else "parquet"
    target = str(tmp_path / f"tbl_{substrate}")
    batch1 = spark.createDataFrame(
        [(1, 10.0, 100, 1), (2, 20.0, 100, 1), (2, 21.0, 100, 2)],
        "k int, v double, m int, seq int",
    )
    upsert_table(
        spark, target, batch1, ["k"], order_col="seq",
        greatest_cols=["m"], substrate=substrate,
    )
    batch2 = spark.createDataFrame(
        [(2, 99.0, 50, 3), (3, 30.0, 100, 1)],
        "k int, v double, m int, seq int",
    )
    upsert_table(
        spark, target, batch2, ["k"], order_col="seq",
        greatest_cols=["m"], substrate=substrate,
    )
    fmt = "delta" if substrate == "delta" else "parquet"
    rows = spark.read.format(fmt).load(target).collect()
    return {r.k: (r.v, r.m) for r in rows}


_UPSERT_TABLE_WANT = {
    # k=2: in-batch dedup keeps seq 2 (21.0) in cycle 1, then batch2's
    # 99.0 wins but m keeps greatest(100, 50)
    1: (10.0, 100),
    2: (99.0, 100),
    3: (30.0, 100),
}


def test_upsert_table_parquet_substrate(spark, tmp_path):
    assert _upsert_table_cycle(spark, tmp_path, "parquet") == \
        _UPSERT_TABLE_WANT


def test_upsert_table_delta_substrate(spark, tmp_path):
    """Same semantics through Delta MERGE INTO — runs only where
    delta-spark is installed (not in this image); the parquet twin
    above always runs."""
    from minerva_etl_spark.operators.upsert import _delta_available

    if not _delta_available(spark):
        pytest.skip("delta-spark not installed")
    assert _upsert_table_cycle(spark, tmp_path, "delta") == \
        _UPSERT_TABLE_WANT


def test_upsert_table_auto_substrate(spark, tmp_path):
    """The auto-dispatched substrate (whichever is available) produces
    the identical table."""
    assert _upsert_table_cycle(spark, tmp_path, None) == \
        _UPSERT_TABLE_WANT


def test_insert_missing(spark):
    existing = spark.createDataFrame([(1,), (2,)], "k int")
    incoming = spark.createDataFrame([(2, "x"), (3, "y")], "k int, name string")
    out = insert_missing(existing, incoming, ["k"])
    assert [(r.k, r.name) for r in out.collect()] == [(3, "y")]


def test_merge_packages_fills_nulls(spark):
    p1 = spark.createDataFrame([(1, 10, None), (2, 20, 200)], "k int, a int, b int")
    p2 = spark.createDataFrame([(1, 111)], "k int, b int")
    out = merge_packages([p1, p2], ["k"])
    got = {r.k: (r.a, r.b) for r in out.collect()}
    assert got == {1: (10, 111), 2: (20, 200)}


def test_compact_history_keeps_change_points(spark):
    df = spark.createDataFrame(
        [
            (1, ts(2024, 1, 1), "up"),
            (1, ts(2024, 1, 2), "up"),      # dropped (no change)
            (1, ts(2024, 1, 3), "down"),
            (1, ts(2024, 1, 4), "down"),    # dropped
            (1, ts(2024, 1, 5), "up"),
            (2, ts(2024, 1, 1), "up"),
        ],
        "entity_id int, timestamp timestamp_ntz, state string",
    )
    out = compact_history(df, ["state"])
    got = sorted((r.entity_id, r.timestamp.day, r.state) for r in out.collect())
    assert got == [(1, 1, "up"), (1, 3, "down"), (1, 5, "up"), (2, 1, "up")]


def test_latest_per_entity(spark):
    df = spark.createDataFrame(
        [(1, ts(2024, 1, 1), "a"), (1, ts(2024, 1, 3), "b"), (2, ts(2024, 1, 2), "c")],
        "entity_id int, timestamp timestamp_ntz, state string",
    )
    out = latest_per_entity(df)
    got = {r.entity_id: r.state for r in out.collect()}
    assert got == {1: "b", 2: "c"}


def test_trend_slope_native_matches_pandas_variant(spark):
    """X2: the applyInPandas mechanism demo computes the same fit as the
    production regr_slope/regr_intercept aggregates."""
    from minerva_etl_spark.operators.regression import (
        trend_slope,
        trend_slope_pandas,
    )
    from minerva_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value"
    )
    native = {r.user_id: r for r in trend_slope(ev).collect()}
    pandas_ = {r.user_id: r for r in trend_slope_pandas(ev).collect()}
    assert set(native) == set(pandas_)
    for uid, a in native.items():
        b = pandas_[uid]
        assert a.n == b.n
        assert abs(a.slope_per_hour - b.slope_per_hour) < 1e-4
        assert abs(a.intercept - b.intercept) < 1e-2


def test_attribute_store_array_roundtrip(spark, tmp_path):
    """Array-typed attributes round-trip staging -> history -> compact ->
    curr (reference round-trips text[]/int[] attributes,
    `integration_tests/storage/attribute/test_attributestore.py:21-415`):
    re-staged identical arrays compact away (null-safe array equality in
    the lag window), changed arrays survive as change points, and the
    curr pointer carries the latest array."""
    from datetime import datetime

    from minerva_etl_spark.store.attribute_store import AttributeStore

    st = AttributeStore("t", "node", ["kind", "tags", "weights"], str(tmp_path))
    rows = [
        (1, datetime(2024, 1, 1), "rtu", ["a", "b"], [1, 2]),
        (2, datetime(2024, 1, 1), "rtu", ["x"], None),
    ]
    schema = (
        "entity_id bigint, timestamp timestamp_ntz, kind string, "
        "tags array<string>, weights array<int>"
    )
    st.store_batch(spark, spark.createDataFrame(rows, schema))
    # day 2: entity 1 unchanged (same arrays), entity 2 changes its array
    st.store_batch(spark, spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2), "rtu", ["a", "b"], [1, 2]),
            (2, datetime(2024, 1, 2), "rtu", ["x", "y"], None),
        ],
        schema,
    ))
    st.compact(spark)
    hist = st.read_history(spark)
    got = {
        (r.entity_id, r.timestamp): (r.kind, tuple(r.tags), 
                                     tuple(r.weights) if r.weights else None)
        for r in hist.collect()
    }
    # entity 1's identical day-2 row compacted away; entity 2's survives
    assert got == {
        (1, datetime(2024, 1, 1)): ("rtu", ("a", "b"), (1, 2)),
        (2, datetime(2024, 1, 1)): ("rtu", ("x",), None),
        (2, datetime(2024, 1, 2)): ("rtu", ("x", "y"), None),
    }
    curr = st.materialize_curr(spark)
    got_curr = {r.entity_id: tuple(r.tags) for r in curr.collect()}
    assert got_curr == {1: ("a", "b"), 2: ("x", "y")}


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation: a 4-chain (worst diameter case), a
    triangle, and an isolated pair each collapse to their min id."""
    from minerva_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [
            # chain 10-11-12-13 (forces multiple propagation rounds)
            (10, 11), (11, 12), (12, 13),
            # triangle 20-21-22
            (20, 21), (21, 22), (20, 22),
            # pair 30-31
            (30, 31),
        ],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.doc_id: r.component_id
        for r in connected_components(pairs).collect()
    }
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_with_repetition_signals(spark):
    """Gopher-style duplicate-token / duplicate-bigram fractions."""
    from minerva_etl_spark.operators.text import with_repetition

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # 4 tokens, 1 distinct
            (2, "all tokens here differ"),     # no repetition
            (3, "a b a b a b"),                # bigrams: 5 total, 2 distinct
            (4, ""),                           # empty -> 0.0 / 0.0
            (5, "one"),                        # single token, no bigrams
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (round(r.dup_token_frac, 6), round(r.dup_2gram_frac, 6))
        for r in with_repetition(df).collect()
    }
    assert got[1] == (0.75, round(1 - 1 / 3, 6))
    assert got[2] == (0.0, 0.0)
    assert got[3] == (round(1 - 2 / 6, 6), round(1 - 2 / 5, 6))
    assert got[4] == (0.0, 0.0)
    assert got[5] == (0.0, 0.0)


def test_classify_quality_linear_model(spark):
    """Model-based quality filter: the logit is the fixed linear model
    over the engineered signals, and keep == (logit >= 0)."""
    import math

    from minerva_etl_spark.operators.text import (
        QUALITY_MODEL,
        QUALITY_MODEL_BIAS,
        classify_quality,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog barked for a while"),
            (2, "!!! ??? ;;; ,,, ... !!!"),
            (3, "spam spam spam spam spam spam spam spam"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in classify_quality(df).collect()}
    feats1 = {
        "alpha_ratio": rows[1].alpha_ratio,
        "stopword_ratio": rows[1].stopword_ratio,
        "punct_ratio": rows[1].punct_ratio,
        "dup_token_frac": rows[1].dup_token_frac,
        "mean_word_len": rows[1].n_chars / max(rows[1].n_tokens, 1),
        "sqrt_tokens": math.sqrt(rows[1].n_tokens),
    }
    expected = QUALITY_MODEL_BIAS
    for name, w in QUALITY_MODEL:
        expected += w * feats1[name]
    assert abs(rows[1].model_logit - expected) < 1e-9
    # stopword-rich English prose passes; punctuation soup and
    # repeated-token spam fail
    assert rows[1].keep
    assert not rows[2].keep
    assert not rows[3].keep
    for r in rows.values():
        assert r.keep == (r.model_logit >= 0.0)


def test_semantic_dedup_cluster_scoped(spark):
    """SemDeDup rule: within a cluster the lowest-id member of an ε-ball
    survives; cross-cluster near-dups are NOT compared."""
    from minerva_etl_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [
            (10, [1.0, 0.05]),    # cluster 0 representative
            (11, [0.99, 0.06]),   # ~same direction -> dropped vs 10
            (12, [0.6, 0.8]),     # cluster 1 (cos .8 vs c1 > .6 vs c0)
            (13, [0.05, 0.9]),    # cluster 1, cos(12,13) ~ .83 < .95
        ],
        "vec_id bigint, embedding array<float>",
    )
    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id bigint, cvec array<float>",
    )
    rows = {
        r.vec_id: r for r in semantic_dedup(emb, cent, threshold=0.95).collect()
    }
    assert rows[10].centroid_id == 0 and rows[10].kept
    assert rows[11].centroid_id == 0 and not rows[11].kept
    assert rows[12].centroid_id == 1 and rows[12].kept
    assert rows[13].centroid_id == 1 and rows[13].kept


def test_dsir_importance_selection(spark):
    """DSIR weights favor target-like documents; exactly k are selected;
    featureless docs carry weight 0.0 but still enter the draw."""
    from minerva_etl_spark.operators.dsir import dsir_select

    rows = [(i, "the quick brown fox jumps over the lazy dog", "en")
            for i in range(8)]
    rows += [(i, "zzz qqq xxx vvv kkk www jjj", "xx")
             for i in range(8, 16)]
    rows.append((16, "", "xx"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r.doc_id: r for r in dsir_select(
        df, "lang = 'en'", k=5, n_buckets=64).collect()}
    assert len(out) == 17
    assert sum(1 for r in out.values() if r.selected) == 5
    # target-like docs outweigh off-target docs
    assert out[0].log_weight > out[8].log_weight
    assert out[16].log_weight == 0.0


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_classify_quality_plan_no_shuffle(spark, tmp_path):
    """The quality classifier is a pure scan-project-filter: no
    Exchange anywhere in the plan — at 100 TB this stage must stream."""
    from minerva_etl_spark.operators.text import classify_quality

    rows = [(i, "some text here for doc %d" % i) for i in range(100)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "docs"))
    docs = spark.read.parquet(str(tmp_path / "docs"))
    plan = _plan_of(classify_quality(docs))
    assert "Exchange" not in plan


def test_dsir_plan_broadcasts_ratio(spark, tmp_path):
    """The DSIR per-doc scoring join against the n_buckets-row ratio
    table must broadcast — shuffling exploded corpus grams to meet a
    1024-row dimension would be the 100 TB mistake."""
    from minerva_etl_spark.operators.dsir import dsir_select

    rows = [(i, "w%d common tokens here" % (i % 7), "en" if i % 2 else "xx")
            for i in range(200)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    ).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    docs = spark.read.parquet(str(tmp_path / "docs"))
    plan = _plan_of(dsir_select(docs, "lang = 'en'", k=10, n_buckets=64))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ngram_lm_score_hand_computed(spark):
    """Bigram-LM scoring: add-one smoothed probabilities against a
    tiny reference slice, checked against hand-computed bits."""
    import math

    from minerva_etl_spark.operators.lm import ngram_lm_score

    df = spark.createDataFrame(
        [
            # reference slice (is_ref = lang 'en')
            (1, "a b a b", "en"),
            (2, "a b c", "en"),
            # scored-only docs
            (3, "a b", "xx"),       # in-model bigram
            (4, "z z", "xx"),       # fully OOV
            (5, "solo", "xx"),      # no bigrams
        ],
        "doc_id bigint, text string, lang string",
    )
    rows = {
        r.doc_id: r
        for r in ngram_lm_score(df, "lang = 'en'").collect()
    }
    # reference counts: tokens a:3 b:3 c:1 -> V=3
    # bigrams: 'a b':3, 'b a':1, 'b c':1
    v = 3
    p_ab = (3 + 1) / (3 + v)      # c2('a b')=3, c1('a')=3
    p_zz = (0 + 1) / (0 + v)      # unseen bigram, unseen history
    assert rows[3].n_bigrams == 1
    assert rows[3].oov_rate == 0.0
    assert abs(rows[3].nll_bits - round(-math.log2(p_ab), 4)) < 1e-9
    assert rows[4].n_bigrams == 1
    assert rows[4].oov_rate == 1.0
    assert abs(rows[4].nll_bits - round(-math.log2(p_zz), 4)) < 1e-9
    assert rows[5].n_bigrams == 0
    assert rows[5].oov_rate == 0.0 and rows[5].nll_bits == 0.0
    # reference docs are scored too (model covers them)
    assert rows[1].oov_rate == 0.0 and rows[1].n_bigrams == 3


def test_with_pii_counts_and_redaction(spark):
    """PII detection counts + placeholder redaction."""
    from minerva_etl_spark.operators.text import with_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or alice@test.org today"),
            (2, "server 192.168.0.1 and 10.0.0.255 are up"),
            (3, "call +31 6 1234 5678 now"),
            (4, "no pii here"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in with_pii(df).collect()}
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (2, 0, 0)
    assert rows[1].redacted == "mail me at <EMAIL> or <EMAIL> today"
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_phone) == (0, 2, 0)
    assert rows[2].redacted == "server <IP> and <IP> are up"
    assert (rows[3].n_email, rows[3].n_ipv4, rows[3].n_phone) == (0, 0, 1)
    assert rows[3].redacted == "call <PHONE> now"
    assert rows[4].redacted == "no pii here"


def test_contamination_check(spark):
    """Corpus docs sharing word 4-grams with the benchmark are flagged
    with exact distinct-shingle hit counts; clean docs are absent."""
    from minerva_etl_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        [
            # doc 1 contains the benchmark question verbatim (5 tokens ->
            # 2 4-gram shingles, both in the benchmark set)
            (1, "prefix what is the capital city"),
            # doc 2 shares no 4-gram with the benchmark
            (2, "a completely unrelated training document body"),
            # doc 3 too short for any 4-gram
            (3, "too short"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital city")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in contamination_check(corpus, bench).collect()}
    assert set(rows) == {1}
    r = rows[1]
    # "prefix what is the capital city" -> 3 shingles, 2 hit
    assert (r.n_hits, r.n_shingles) == (2, 3)
    assert abs(r.contaminated_frac - 2 / 3) < 1e-12


def test_contamination_ignores_empty_docs(spark):
    """An empty/whitespace benchmark doc must not flag empty corpus docs
    (the zero-token fallback shingle is excluded on both sides)."""
    from minerva_etl_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text that is clean")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, ""), (101, "entirely different benchmark question")],
        "doc_id bigint, text string",
    )
    assert contamination_check(corpus, bench).count() == 0


def test_source_mix_resample(spark):
    """Temperature mixing: alpha=0 equalizes source budgets, alpha=1 is
    the identity mix; n_copies is deterministic under repartitioning and
    resample explodes with 0-based copy indices."""
    from minerva_etl_spark.operators.mixing import (
        resample_by_source, source_mix_rates, with_mix_copies,
    )

    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")

    # alpha=1: natural mix, every rate exactly 1 -> n_copies all 1
    r1 = {
        r.source: float(r.rate)
        for r in source_mix_rates(docs, alpha=1.0).collect()
    }
    assert r1 == {"big": 1.0, "small": 1.0}

    # alpha=0: equal budgets (50/50) -> big rate 0.625, small 2.5
    r0 = {
        r.source: float(r.rate)
        for r in source_mix_rates(docs, alpha=0.0).collect()
    }
    assert r0 == {"big": 0.625, "small": 2.5}

    out = with_mix_copies(docs, alpha=0.0)
    per_src = {
        r.source: r.total
        for r in out.groupBy("source")
        .agg(F.sum("n_copies").alias("total"))
        .collect()
    }
    # realized sizes are within one bucket-rounding of the 50/50 target
    assert abs(per_src["big"] - 50) <= 8 and abs(per_src["small"] - 50) <= 8

    # deterministic under partitioning
    a = sorted(
        (r.doc_id, r.n_copies) for r in out.select("doc_id", "n_copies").collect()
    )
    b = sorted(
        (r.doc_id, r.n_copies)
        for r in with_mix_copies(docs.repartition(13), alpha=0.0)
        .select("doc_id", "n_copies")
        .collect()
    )
    assert a == b

    # explode: one row per copy, 0-based copy index
    res = resample_by_source(docs, alpha=0.0)
    assert res.count() == sum(per_src.values())
    small_copies = (
        res.filter(F.col("source") == "small")
        .groupBy("doc_id")
        .agg(F.collect_list("copy").alias("copies"))
        .collect()
    )
    for r in small_copies:
        assert sorted(r.copies) == list(range(len(r.copies)))


def test_select_token_budget(spark):
    """Per-source token-budget selection: greedy by priority, a doc is
    kept iff its running total fits; dict budgets drop absent sources;
    DuckDB twin agrees; deterministic under repartitioning."""
    import duckdb
    import pandas as pd

    from minerva_etl_spark.operators.mixing import (
        select_token_budget,
        select_token_budget_oracle_sql,
    )

    rows = [
        (1, "web", 40, 9.0), (2, "web", 40, 8.0), (3, "web", 40, 7.0),
        (4, "code", 10, 5.0), (5, "code", 100, 4.0), (6, "code", 10, 3.0),
        (7, "other", 1, 1.0),
    ]
    schema = "doc_id bigint, source string, n_tokens int, quality double"
    docs = spark.createDataFrame(rows, schema)
    budgets = {"web": 90, "code": 25}

    got = select_token_budget(
        docs, budgets, priority_col="quality"
    ).collect()
    kept = {r.doc_id: r.cum_tokens for r in got}
    # web: 40+40 fit, third 40 would hit 120 > 90; code: doc 4 fits,
    # doc 5 (100) overshoots AND blocks doc 6 (greedy running total —
    # the cumulative rule, not knapsack); other: no budget -> dropped
    assert kept == {1: 40, 2: 80, 4: 10}

    oracle = select_token_budget_oracle_sql(
        "docs", budgets, priority_col="quality",
        select_cols="doc_id, source, n_tokens, quality",
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(
        rows, columns=["doc_id", "source", "n_tokens", "quality"]
    ))
    duck = {r[0]: r[4] for r in con.execute(oracle).fetchall()}
    assert duck == kept

    # md5-priority default: same answer regardless of partitioning
    a = sorted(r.doc_id for r in select_token_budget(docs, 50).collect())
    b = sorted(
        r.doc_id
        for r in select_token_budget(docs.repartition(7), 50).collect()
    )
    assert a == b


def test_source_mix_plan_broadcasts_rates(spark, tmp_path):
    """The corpus side of the mix join must not shuffle: the per-source
    rate table is broadcast (BroadcastHashJoin, no SortMergeJoin) — at
    100 TB a sort-merge join here would shuffle the whole corpus to
    attach a 5-row dimension."""
    from minerva_etl_spark.operators.mixing import with_mix_copies

    rows = [(i, ["en", "de", "fr"][i % 3], "t" * 5) for i in range(300)]
    spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    docs = spark.read.parquet(str(tmp_path / "docs"))
    out = with_mix_copies(docs, alpha=0.5, source_col="lang")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_remove_boilerplate_segments(spark):
    """Segments shared by >= max_docs docs strip; unique content stays
    in order; an all-boilerplate doc survives with empty text."""
    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    spam = "visit our site now"     # 4-word boilerplate in every doc
    docs = spark.createDataFrame(
        [
            (1, f"{spam} alpha beta gamma delta"),
            (2, f"{spam} epsilon zeta eta theta"),
            (3, f"{spam} iota kappa lambda mu"),
            (4, spam),              # nothing but boilerplate
        ],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(
            docs, seg_words=4, max_docs=3
        ).collect()
    }
    assert len(out) == 4
    assert out[1].new_text == "alpha beta gamma delta"
    assert out[2].new_text == "epsilon zeta eta theta"
    assert (out[1].n_segs, out[1].n_kept, out[1].n_dropped) == (2, 1, 1)
    assert out[4].new_text == "" and out[4].n_kept == 0
    # below threshold: nothing strips
    loose = remove_boilerplate_segments(docs, seg_words=4, max_docs=5)
    assert loose.filter("n_dropped > 0").count() == 0


def test_boilerplate_plan_no_payload_shuffle(spark, tmp_path):
    """The boilerplate strip must not sort-merge-join document payloads:
    the only joins are the 1-row broadcast of the collected boilerplate
    set (BroadcastNestedLoopJoin); text shuffles nowhere."""
    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    rows = [(i, "w " * 20) for i in range(200)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "docs"))
    out = remove_boilerplate_segments(spark.read.parquet(str(tmp_path / "docs")))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_curate_corpus_end_to_end(spark):
    """The composed pipeline drops the right docs for the right
    reasons: low-quality, near-dup loser, and contaminated docs are
    out; survivors reach the shard export."""
    from minerva_etl_spark.operators.pipeline import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then the "
            "dog naps for a while near the old barn door")
    near = good + " extra tail words here"
    docs = spark.createDataFrame(
        [
            (1, good, "en"),
            (2, near, "en"),                       # near-dup of 1
            (3, "!!! ??? ;;; ,,, ... !!!", "en"),  # low quality
            (4, "a completely different story is told in the town "
                "square where the people gather for news and trade",
             "en"),
            (5, "the secret eval answer is forty two exactly as it "
                "was written in the big book of answers", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    bench = spark.createDataFrame(
        [(99, "the secret eval answer is forty two exactly", "en")],
        "doc_id bigint, text string, lang string",
    )
    out = curate_corpus(
        docs, bench, alpha=0.5, shard_tokens=50, shuffle_seed=1,
        source_col="lang",
    )
    survivors = {r.doc_id for r in out.collect()}
    assert 3 not in survivors          # quality filter
    assert 5 not in survivors          # decontamination
    assert not {1, 2} <= survivors     # near-dup pair collapsed to one
    assert 4 in survivors
    assert survivors & {1, 2}          # the cluster kept its exemplar


def test_gopher_rules_per_rule_flags(spark):
    """Each Gopher rule trips on its own violation; a clean long doc
    passes all."""
    from minerva_etl_spark.operators.text import gopher_rules

    clean = ("the tale begins with a small house near the river and "
             "every morning the people of the town walk to the market "
             "to trade fresh bread and fish with their neighbours and "
             "that habit has not changed over many long years of quiet "
             "life in the valley where children play games until dusk")
    docs = spark.createDataFrame(
        [
            (1, clean),
            (2, "too short to pass"),
            (3, clean + " " + " ".join(["#"] * 20)),
            (4, ("zq " * 60).strip()),  # short words -> mean_wl < 3
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert rows[1].keep
    assert not rows[2].ok_word_count and not rows[2].keep
    assert not rows[3].ok_symbol_ratio and not rows[3].keep
    assert not rows[4].ok_mean_word_len and not rows[4].keep
    assert rows[4].ok_word_count  # 60 words: only the length rule trips


def test_c4_rules_line_and_page_gates(spark):
    """Each C4 rule trips on its own violation; cleaned text keeps
    only surviving lines."""
    from minerva_etl_spark.operators.text import c4_rules

    good = "this line has enough words to pass easily."
    docs = spark.createDataFrame(
        [
            # three good lines -> >= 3 sentences, kept verbatim
            (1, f"{good}\n{good}\n{good}"),
            # line without terminal punctuation is dropped
            (2, f"{good}\nno terminal punctuation on this line\n"
                f"{good}\n{good}"),
            # short line dropped (min 5 words)
            (3, f"{good}\ntiny line.\n{good}\n{good}"),
            # javascript line dropped regardless of shape
            (4, f"{good}\nplease enable JavaScript to view this page."
                f"\n{good}\n{good}"),
            # page kills: lorem ipsum / curly brace
            (5, f"{good}\n{good}\nlorem ipsum dolor sit amet today."),
            (6, f"{good}\n{good}\nfunction() {{ return 1; }}\n{good}"),
            # too few sentences after cleaning
            (7, f"{good}\nno punct here at all on this line"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in c4_rules(docs).collect()}
    assert rows[1].keep and rows[1].text == f"{good}\n{good}\n{good}"
    assert rows[1].n_sentences == 3
    assert rows[2].keep and rows[2].n_lines_kept == 3
    assert "no terminal" not in rows[2].text
    assert rows[3].keep and "tiny" not in rows[3].text
    assert rows[4].keep and "JavaScript" not in rows[4].text
    assert not rows[5].ok_lorem and not rows[5].keep
    assert not rows[6].ok_brace and not rows[6].keep
    assert not rows[7].ok_sentences and not rows[7].keep
    assert rows[7].n_lines_kept == 1  # the good line survives cleaning


def test_corpus_report_totals(spark):
    """Per-group doc counts and token/char totals, one scan."""
    from minerva_etl_spark.operators.text import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "en", "web"),
            (3, "sechs", "de", "web"),
        ],
        "doc_id bigint, text string, lang string, source string",
    )
    rows = {(r.lang, r.source): r for r in corpus_report(docs).collect()}
    en = rows[("en", "web")]
    assert en.n_docs == 2 and en.total_tokens == 5
    assert en.min_tokens == 2 and en.max_tokens == 3
    assert en.total_chars == len("one two three") + len("four five")
    assert rows[("de", "web")].total_tokens == 1


def test_chunk_sequences_windows(spark):
    """Fixed-length chunking: disjoint stride reconstructs the token
    stream; overlapping stride repeats the overlap; short tails and
    empty docs behave."""
    from minerva_etl_spark.operators.text import chunk_sequences

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id bigint, text string",
    )
    # disjoint: chunk=4, stride=4 -> 4+4+2 tokens, reconstruction holds
    got = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
        for r in chunk_sequences(docs, 4, 4).collect()
    )
    d1 = [g for g in got if g[0] == 1]
    assert [g[2] for g in d1] == [4, 4, 2]
    assert " ".join(g[3] for g in d1) == " ".join(f"w{i}" for i in range(10))
    assert [g for g in got if g[0] == 2] == [(2, 0, 2, "a b")]
    assert not [g for g in got if g[0] == 3]  # empty doc -> no chunks
    # overlapping: chunk=4, stride=2 -> starts at 0,2,4,6,8
    over = [
        r for r in chunk_sequences(docs, 4, 2).collect() if r.doc_id == 1
    ]
    assert len(over) == 5
    by_id = {r.chunk_id: r for r in over}
    assert by_id[1].chunk_text == "w2 w3 w4 w5"
    assert by_id[4].n_tokens == 2 and by_id[4].chunk_text == "w8 w9"


def test_dedup_segments_keep_first(spark):
    """Keep-first exact segment dedup: later occurrences strip, first
    (by doc id then position) survives; intra-doc repeats dedup too."""
    from minerva_etl_spark.operators.text import dedup_segments_keep_first

    rep = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, rep + " unique one two three"),
            (2, rep + " other words here now"),   # rep seen in doc 1
            (3, rep + " " + rep),                 # inter+intra dup
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in dedup_segments_keep_first(
        docs, seg_words=4).collect()}
    assert got[1].n_segs == 2 and got[1].n_kept == 2
    assert got[1].new_text == rep + " unique one two three"
    assert got[2].n_kept == 1 and got[2].new_text == "other words here now"
    assert got[3].n_kept == 0 and got[3].new_text == ""


def test_keep_best_per_component(spark):
    """Per cluster: highest score survives, ties break by lowest id,
    singletons (absent from components) keep themselves."""
    from minerva_etl_spark.operators.dedup import keep_best_per_component

    docs = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (9, 0.2)],
        "doc_id bigint, quality_score double",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],  # {1,2,3} cluster, {4} alone
        "doc_id bigint, component_id bigint",
    )
    out = {r.doc_id: r for r in keep_best_per_component(docs, comps).collect()}
    assert out[2].keep and not out[3].keep  # 0.9 tie -> lowest id wins
    assert not out[1].keep
    assert out[1].n_members == 3 and out[2].component_id == 1
    assert out[4].keep and out[4].n_members == 1
    assert out[9].keep and out[9].component_id == 9  # singleton fallback


def test_keep_best_differential_vs_window(spark):
    """The aggregation-based winner (min_by over (-score, id)) must
    equal the window formulation row for row — including NULL scores
    (desc-NULLS-LAST: any real score beats NULL) — and the plan must
    contain NO window exchange (a giant template cluster would land in
    one task's sort under row_number; the aggregate combines
    map-side)."""
    import random

    from pyspark.sql import Window, functions as F

    from minerva_etl_spark.operators.dedup import keep_best_per_component

    rng = random.Random(7)
    docs_rows = [
        (i, rng.choice([None, round(rng.random(), 3)])) for i in range(300)
    ]
    comps_rows = [(i, i % 7) for i in range(0, 250)]  # 50 singletons
    docs = spark.createDataFrame(
        docs_rows, "doc_id bigint, quality_score double"
    )
    comps = spark.createDataFrame(
        comps_rows, "doc_id bigint, component_id bigint"
    )
    out = keep_best_per_component(docs, comps)
    # window reference formulation, computed inline
    joined = (
        docs.join(comps.withColumnRenamed("doc_id", "k"),
                  docs.doc_id == F.col("k"), "left")
        .drop("k")
        .withColumn("component_id",
                    F.coalesce("component_id", F.col("doc_id")))
    )
    w = Window.partitionBy("component_id")
    o = Window.partitionBy("component_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    ref = joined.select(
        "doc_id", "component_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_members"),
        (F.row_number().over(o) == 1).alias("keep"),
    )
    got = {r.doc_id: (r.component_id, r.n_members, r.keep)
           for r in out.collect()}
    want = {r.doc_id: (r.component_id, r.n_members, r.keep)
            for r in ref.collect()}
    assert got == want
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    # struct-typed min_by buffers plan as SortAggregate; all three
    # aggregate nodes do partial (map-side) aggregation, which is the
    # property the window could never have
    assert any(a in plan for a in
               ("HashAggregate", "ObjectHashAggregate", "SortAggregate"))


def test_boilerplate_join_path_matches_broadcast(spark):
    """broadcast_threshold=0 forces the distributed (digest, doc) join
    path; its output must match the broadcast fast path exactly —
    including segment order in the reconstructed text and the
    all-boilerplate empty-text doc."""
    import random

    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    rng = random.Random(11)
    spam = "visit our site now"
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(60):
        body = " ".join(rng.choices(words, k=rng.randrange(0, 12)))
        rows.append((i, f"{spam} {body}".strip()))
    rows.append((1000, spam))  # boilerplate-only doc
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    fast = remove_boilerplate_segments(docs, seg_words=4, max_docs=3)
    slow = remove_boilerplate_segments(
        docs, seg_words=4, max_docs=3, broadcast_threshold=0
    )
    key = lambda r: (r.doc_id, r.n_segs, r.n_kept, r.n_dropped, r.new_text)  # noqa: E731
    assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))
    assert slow.filter("doc_id = 1000").first().new_text == ""


def test_boilerplate_join_path_plan(spark, tmp_path):
    """Above the size guard nothing collects to one row: the join path
    plans as equi-joins (SortMergeJoin/ShuffledHashJoin allowed), never
    a BroadcastNestedLoopJoin of a collected array."""
    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    rows = [(i, "w " * 20) for i in range(200)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "docs"))
    out = remove_boilerplate_segments(
        spark.read.parquet(str(tmp_path / "docs")), broadcast_threshold=0
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "collect_set" not in plan


def test_ngram_lm_long_doc_chunked_fold(spark):
    """A >=100k-token document scores without a single monolithic
    collect_list buffer (chunk_size bounds it), and the chunked fold
    agrees with the single-chunk association to rounding precision."""
    from minerva_etl_spark.operators.lm import ngram_lm_score

    long_text = " ".join(
        f"w{i % 997}" for i in range(100_000)
    )
    df = spark.createDataFrame(
        [(1, long_text, "en"), (2, "w1 w2 w3", "xx")],
        "doc_id bigint, text string, lang string",
    )
    out = {r.doc_id: r for r in
           ngram_lm_score(df, "lang = 'en'", chunk_size=1024).collect()}
    assert out[1].n_bigrams == 99_999
    assert out[1].oov_rate == 0.0
    big = {r.doc_id: r for r in
           ngram_lm_score(df, "lang = 'en'", chunk_size=10**9).collect()}
    assert abs(out[1].nll_bits - big[1].nll_bits) <= 1e-4
    assert out[2] == big[2]


def test_curate_corpus_composition_plan(spark):
    """Regression-lock the composed pipeline's plan shape (SCALE.md
    claims): stages compose by doc-id equi-joins only — never a
    cartesian product — and the default (checkpointed) path's final
    export segment stays within its measured shuffle budget.  The two
    BroadcastNestedLoopJoins are the bounded one-row broadcasts
    (mixing totals, shard offsets), not corpus joins."""
    import re

    from minerva_etl_spark.operators.pipeline import curate_corpus

    rows = [
        (i, ("the quick brown fox jumps over the lazy dog near the old "
             f"barn and item {i} rests in the field while birds sing"),
         "web" if i % 2 else "wiki")
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    bench = spark.createDataFrame(
        [(1000, "benchmark eval text sample")], "doc_id bigint, text string"
    )
    out = curate_corpus(docs, bench)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("CartesianProduct") == 0
    assert len(re.findall(r"\bExchange\b", plan)) <= 30
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_boilerplate_shuffle_budget_both_paths(spark):
    """Both boilerplate apply strategies stay within their measured
    shuffle budgets: the broadcast fast path never shuffles document
    payloads (no SortMergeJoin; Exchanges only under the digest
    count), the join path never collects (no BroadcastNestedLoopJoin)
    and adds exactly the documented (digest, doc) join + per-doc
    rebuild shuffles."""
    import re

    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    rows = [(i, "alpha beta gamma delta " * 3) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    def shape(df):
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return (
            len(re.findall(r"\bExchange\b", p)),
            p.count("SortMergeJoin"),
            p.count("BroadcastNestedLoopJoin"),
        )

    ex_f, smj_f, bnlj_f = shape(remove_boilerplate_segments(docs))
    assert smj_f == 0 and bnlj_f >= 1 and ex_f <= 6
    ex_j, smj_j, bnlj_j = shape(
        remove_boilerplate_segments(docs, broadcast_threshold=0)
    )
    assert bnlj_j == 0 and ex_j <= 8


def test_shard_pack_empty_corpus(spark):
    """Empty input packs to an empty assignment instead of failing
    analysis on an untyped offsets map (the curated pipeline can
    legitimately filter a corpus to nothing)."""
    from minerva_etl_spark.operators.shard import assign_token_shards

    empty = spark.createDataFrame([], "doc_id bigint, text string")
    out = assign_token_shards(empty, 1000)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "shard_id"]


def test_curate_corpus_boilerplate_stage(spark):
    """With boilerplate_max_docs set, a header repeated verbatim across
    the corpus is stripped from every text before dedup — and a doc
    made ONLY of boilerplate is dropped entirely."""
    from minerva_etl_spark.operators.pipeline import curate_corpus

    header = "subscribe to our newsletter"  # exactly one 4-word segment
    bodies = [
        "the quick brown fox jumps over the lazy dog near the barn",
        "a completely different story is told in the town square today",
        "people gather for news and trade in the market every morning",
    ]
    rows = [(i + 1, f"{header} {b}", "en") for i, b in enumerate(bodies)]
    rows.append((9, header, "en"))  # boilerplate-only doc
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    bench = docs.limit(0)
    out = curate_corpus(
        docs, bench, shard_tokens=50, shuffle_seed=1, source_col="lang",
        boilerplate_max_docs=3,
    )
    survivors = {r.doc_id for r in out.collect()}
    assert 9 not in survivors           # stripped to nothing -> dropped
    assert {1, 2, 3} <= survivors       # bodies are all distinct
    # the stage rewrote texts: token budget reflects the stripped body,
    # not header+body (header is 5 words < every body's 11-12)
    toks = {r.doc_id: r.n_tokens for r in out.collect()}
    assert all(t <= 12 for t in toks.values())


def test_curate_corpus_cap_per_source(spark):
    """cap_per_source keeps the N best-quality docs per source after
    cleaning; worse docs of an over-represented source are dropped."""
    from minerva_etl_spark.operators.pipeline import curate_corpus
    from minerva_etl_spark.operators.text import classify_quality

    bodies = [
        "the quick brown fox jumps over the lazy dog near the old barn "
        "door while the farmer watches from the porch with his coffee",
        "seven sailors navigate the narrow strait under a pale moon and "
        "trade quiet stories about the harbors they have seen before",
        "fresh bread cools on the window sill of the village bakery as "
        "the first customers line up outside in the morning light",
        "an old clock ticks in the empty hall long after midnight and "
        "nobody in the house has wound it for many years now",
        "children chase paper boats down the gutter after the rain and "
        "argue cheerfully about whose boat will reach the corner first",
        "the lighthouse keeper climbs the spiral stairs at dusk to "
        "light the lamp that guides the fishing fleet safely home",
    ]
    rows = [(i + 1, b + " filler" * ((i + 1) % 3), "en")
            for i, b in enumerate(bodies)]
    rows += [(10, "a completely different tale is told in the town "
              "square where the people gather for news and trade", "fr")]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string"
    )
    out = curate_corpus(
        docs, docs.limit(0), alpha=1.0, shard_tokens=50, shuffle_seed=1,
        source_col="lang", cap_per_source=2,
    )
    survivors = {r.doc_id for r in out.collect()}
    en = {i for i in survivors if i < 10}
    assert len(en) == 2           # capped from 6 to 2
    assert 10 in survivors        # under-cap source untouched
    # the survivors are the two highest-quality en docs (same ranking
    # the pipeline used)
    q = {r.doc_id: r.quality_score
         for r in classify_quality(docs).collect() if r.doc_id < 10}
    best2 = set(sorted(q, key=lambda d: (-q[d], d))[:2])
    assert en == best2


def test_boilerplate_null_text_paths_agree(spark):
    """NULL-text documents behave as empty on BOTH apply strategies
    (the broadcast filter and the distributed join would otherwise
    disagree — review finding)."""
    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    docs = spark.createDataFrame(
        [(1, "common header line here body one"),
         (2, "common header line here body two"),
         (3, None),
         (4, "something else entirely different words")],
        "doc_id bigint, text string",
    )
    broadcast = {
        r.doc_id: (r.n_segs, r.n_kept, r.new_text)
        for r in remove_boilerplate_segments(
            docs, max_docs=2, broadcast_threshold=10**6
        ).collect()
    }
    joined = {
        r.doc_id: (r.n_segs, r.n_kept, r.new_text)
        for r in remove_boilerplate_segments(
            docs, max_docs=2, broadcast_threshold=0
        ).collect()
    }
    assert broadcast == joined
    assert broadcast[3][2] == ""  # NULL text behaves as empty


def test_semantic_decontamination_bucket_scoped(spark):
    """Embedding decontamination flags corpus vectors with a
    benchmark cosine >= threshold among LSH bucket-mates; a near
    vector in a DIFFERENT sign bucket is (by design) not a candidate —
    the documented ANN recall trade-off, same as sim_ann_lsh."""
    from minerva_etl_spark.operators.similarity import (
        semantic_decontamination,
    )

    pad = [0.0] * 6
    bench = spark.createDataFrame(
        [(100, [1.0, 0.5] + pad)],
        "vec_id bigint, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [0.9, 0.6] + pad),    # same bucket, cos ~ 0.99 -> hit
            (2, [0.0, 1.0] + pad),    # same bucket, cos ~ 0.45 -> miss
            (3, [1.0, -0.5] + pad),   # different bucket (dim2 < 0)
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r.vec_id: r
        for r in semantic_decontamination(
            corpus, bench, threshold=0.9, bucket_dims=list(range(8))
        ).collect()
    }
    assert set(out) == {1}
    assert out[1].contaminated_by == 100 and out[1].max_cosine >= 0.99


def test_embed_text_hashed_composes_with_vector_ops(spark):
    """The hashing-trick embedding is unit-normalized, deterministic,
    and composes with the vector operators — semantic dedup over
    hashed vectors flags the duplicated text end-to-end from raw
    docs, no model anywhere."""
    from minerva_etl_spark.operators.similarity import (
        semantic_decontamination,
    )
    from minerva_etl_spark.operators.text import embed_text_hashed

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon"),   # exact dup of 1
         (3, "totally different words entirely here")],
        "doc_id bigint, text string",
    )
    emb = embed_text_hashed(docs, dim=16)
    rows = {r.doc_id: list(r.embedding) for r in emb.collect()}
    assert rows[1] == rows[2] and rows[1] != rows[3]
    # unit norm on the 6-dp grid
    n = sum(x * x for x in rows[1]) ** 0.5
    assert abs(n - 1.0) < 1e-5
    # compose: docs 1/2 'contaminate' each other at cosine 1.0
    hits = semantic_decontamination(
        emb.filter("doc_id = 2").withColumnRenamed("doc_id", "vec_id"),
        emb.filter("doc_id = 1").withColumnRenamed("doc_id", "vec_id"),
        threshold=0.99,
    ).collect()
    assert [(r.vec_id, r.contaminated_by) for r in hits] == [(2, 1)]
