"""Corpus sketches (`operators/sketch.py`): estimate accuracy on
known universes, mergeability (half ∪ half == whole), and the
count-min overestimate-only guarantee."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.sketch import (
    cm_query,
    cm_sketch,
    hll_estimate,
    hll_registers,
    kmv_estimate_expr,
    kmv_sketch,
)


def _items(spark, n, prefix="item"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("item")
    )


def _halves(spark, n):
    whole = _items(spark, n)
    parity = "CAST(substring(item, 5) AS INT) % 2"
    return (
        whole,
        whole.filter(F.expr(f"{parity} = 0")),
        whole.filter(F.expr(f"{parity} = 1")),
    )


def test_kmv_estimate_within_tolerance(spark):
    """k=64 over 10 000 distinct items: the KMV estimate lands within
    the published ~1/sqrt(k) relative-error band (generous 3σ)."""
    df = _items(spark, 10_000)
    est = (
        kmv_sketch(df, "item", k=64)
        .filter("pos = 64")
        .select(kmv_estimate_expr(64).alias("e"))
        .collect()[0].e
    )
    assert 10_000 * 0.6 < est < 10_000 * 1.6, est


def test_kmv_merge_equals_whole(spark):
    """min-k of the UNION of two halves' hash sets == the whole-corpus
    sketch (the map-side-combine property)."""
    whole, h1, h2 = _halves(spark, 5_000)
    a = kmv_sketch(h1, "item", k=32).select("h")
    b = kmv_sketch(h2, "item", k=32).select("h")
    merged_h = sorted(
        r.h
        for r in a.unionByName(b)
        .distinct()
        .orderBy("h")
        .limit(32)
        .collect()
    )
    whole_h = sorted(
        r.h for r in kmv_sketch(whole, "item", k=32).collect()
    )
    assert merged_h == whole_h


def test_hll_estimate_within_tolerance(spark):
    """m=256 over 20 000 distinct items: raw HLL lands within the
    ~1.04/sqrt(m) band (generous 4σ ≈ 26%)."""
    est = hll_estimate(
        hll_registers(_items(spark, 20_000), "item", b=8), b=8
    ).collect()[0].estimate
    assert 20_000 * 0.74 < est < 20_000 * 1.26, est


def test_hll_merge_equals_whole(spark):
    """Per-bucket max over both halves' registers reproduces the
    whole-corpus estimate row exactly."""
    whole, h1, h2 = _halves(spark, 8_000)
    merged_regs = (
        hll_registers(h1, "item", b=8)
        .unionByName(hll_registers(h2, "item", b=8))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    a = hll_estimate(merged_regs, b=8).collect()[0]
    b = hll_estimate(
        hll_registers(whole, "item", b=8), b=8
    ).collect()[0]
    assert a == b


def test_cm_never_underestimates_and_is_tight_when_wide(spark):
    """CM estimates >= true counts always; with w >> distinct items
    the estimates are exact."""
    rows = [(f"w{i % 20}",) for i in range(400)]  # 20 items x 20 each
    df = spark.createDataFrame(rows, "item string")
    true = {
        r.item: r.cnt
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    sk = cm_sketch(df, "item", d=4, w=1024)
    est = {
        r.item: r.est
        for r in cm_query(
            sk, df.select("item").distinct(), "item", d=4, w=1024
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    assert est == true  # wide sketch, tiny universe -> no collisions


def test_cm_merge_equals_whole(spark):
    """Cell-wise sum of two halves' sketches == the whole sketch."""
    nums = spark.range(70).select(
        F.expr("concat('t', id % 7)").alias("item"),
        (F.col("id") % 2).alias("half"),
    )
    s1 = cm_sketch(nums.filter("half = 0"), "item", d=4, w=64)
    s2 = cm_sketch(nums.filter("half = 1"), "item", d=4, w=64)
    merged = (
        s1.unionByName(s2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cm_sketch(nums, "item", d=4, w=64)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_weighted_sample_bias_and_determinism(spark):
    """`mixing.weighted_sample`: heavy items are sampled far more
    often than light ones under ES A-Res, the draw is deterministic
    per seed, and different seeds give different samples."""
    from minerva_etl_spark.operators.mixing import weighted_sample

    rows = [(i, 1000 if i < 50 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    s1 = {r.doc_id for r in weighted_sample(df, 50, "w", seed=1).collect()}
    s1b = {r.doc_id for r in weighted_sample(df, 50, "w", seed=1).collect()}
    s2 = {r.doc_id for r in weighted_sample(df, 50, "w", seed=2).collect()}
    assert s1 == s1b          # deterministic per seed
    assert s1 != s2           # seed actually matters
    heavy = len([d for d in s1 if d < 50])
    assert heavy >= 35, heavy  # 50 heavy items at 1000x weight dominate
    assert len(s1) == 50
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "doc_id bigint, w bigint"
    )
    out = weighted_sample(df2, 3, "w").collect()
    assert [r.doc_id for r in out] == [3]


def test_hll_rho_is_exact_integer_cross_engine(spark):
    """r12 ADVICE: floor(log2(double)) disagrees between Spark
    (ln/ln2) and DuckDB (libm log2) on values like 2^48-1.  The rho
    expression is now a pure bit-length formulation; pin it against
    Python's int.bit_length() in BOTH engines on the adversarial
    boundary values."""
    import duckdb

    from minerva_etl_spark.operators.sketch import _rho_expr

    width = 52
    vals = [0, 1, 2, 3, (1 << 48) - 1, 1 << 48, (1 << 52) - 1, 255,
            256, (1 << 31) - 1]
    expect = [
        width + 1 if v == 0 else width + 1 - v.bit_length()
        for v in vals
    ]
    got_spark = [
        r.rho
        for r in spark.createDataFrame(
            [(v,) for v in vals], "rest bigint"
        ).selectExpr(f"{_rho_expr('rest', width)} AS rho").collect()
    ]
    assert got_spark == expect
    duck_case = (
        f"CASE WHEN rest = 0 THEN {width + 1} "
        f"ELSE {width} + 1 - length(bin(rest)) END"
    )
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {duck_case} FROM (SELECT CAST({v} AS BIGINT) "
            f"AS rest)"
        ).fetchone()[0]
        for v in vals
    ]
    assert got_duck == expect
