"""Select-builder AST: SQL rendering + DataFrame execution parity —
mirrors the reference's `tests/db/test_query.py` rendering tier."""

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.plans.builder import Select, ands, col, ors, select


def test_render_basic():
    q = select(["a", "b"], "t")
    assert q.to_sql() == "SELECT a, b FROM t"


def test_render_where_group_limit():
    q = (
        select(["k", "sum(v) AS s"], "t")
        .where((col("v") > 10) & (col("name") == "x"))
        .group_by("k")
        .order_by("k")
        .limit(5)
    )
    assert q.to_sql() == (
        "SELECT k, sum(v) AS s FROM t "
        "WHERE (v > 10 AND name = 'x') "
        "GROUP BY k ORDER BY k LIMIT 5"
    )


def test_clone_semantics():
    base = select(["a"], "t").where(col("a") > 1)
    narrowed = base.where(col("a") < 5)
    assert "a < 5" not in base.to_sql()
    assert "a < 5" in narrowed.to_sql()


def test_combinators_and_membership():
    p = ors([col("x") == 1, col("x") == 2])
    assert p.sql == "(x = 1 OR x = 2)"
    p2 = ands([col("x") >= 1, col("y").isin(["a", "b"])])
    assert p2.sql == "(x >= 1 AND y IN ('a', 'b'))"


def test_df_and_sql_agree(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", 7.0), (2, "a", 1.0)], "k int, tag string, v double"
    )
    df.createOrReplaceTempView("t")
    q = (
        select(["k", "CAST(sum(v) AS DOUBLE) AS s"], "t")
        .where(col("v") > 2)
        .group_by("k")
    )
    via_sql = {(r.k, r.s) for r in spark.sql(q.to_sql()).collect()}
    via_df = {(r.k, r.s) for r in q.to_df(spark, df).collect()}
    assert via_sql == via_df == {(1, 12.0)}


def test_array_containment(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"])], "k int, tags array<string>"
    )
    contains = col("tags").contains_array(["a", "b"])   # tags @> {a,b}
    within = col("tags").contained_by_array(["a", "b"])  # tags <@ {a,b}
    got_contains = {r.k for r in df.filter(contains.column).collect()}
    got_within = {r.k for r in df.filter(within.column).collect()}
    assert got_contains == {1}
    assert got_within == {2}
