"""Granularity arithmetic — mirrors the reference's pure unit tier
(`tests/storage/trend/test_granularity.py`)."""

from datetime import datetime

import pytest

from minerva_etl_spark.catalog.granularity import Granularity


def test_parse_seconds():
    assert Granularity.parse("900").seconds == 900
    assert Granularity.parse("15m").seconds == 900
    assert Granularity.parse("1h").seconds == 3600
    assert Granularity.parse("1d").seconds == 86400
    assert Granularity.parse("1w").seconds == 604800


def test_parse_months():
    assert Granularity.parse("1month").months == 1
    assert Granularity.parse("1year").months == 12


def test_name_roundtrip():
    for spec in ["15m", "1h", "1d", "1w", "1month"]:
        assert Granularity.parse(spec).name == spec


def test_truncate_seconds():
    g = Granularity.parse("15m")
    assert g.truncate(datetime(2024, 1, 1, 0, 10, 3)) == datetime(2024, 1, 1, 0, 0)
    assert g.truncate(datetime(2024, 1, 1, 0, 15)) == datetime(2024, 1, 1, 0, 15)


def test_truncate_month():
    g = Granularity.parse("1month")
    assert g.truncate(datetime(2024, 3, 15, 12)) == datetime(2024, 3, 1)


def test_bucket_end_half_open():
    """(start, end]: exact boundary belongs to the period it terminates."""
    g = Granularity.parse("1h")
    assert g.bucket_end(datetime(2024, 1, 1, 10, 0)) == datetime(2024, 1, 1, 10, 0)
    assert g.bucket_end(datetime(2024, 1, 1, 10, 0, 0, 1)) == datetime(2024, 1, 1, 11, 0)


def test_inc_decr_month_wraps():
    g = Granularity.parse("1month")
    assert g.inc(datetime(2024, 12, 1)) == datetime(2025, 1, 1)
    assert g.decr(datetime(2024, 1, 1)) == datetime(2023, 12, 1)


def test_range_half_open():
    g = Granularity.parse("1h")
    out = g.range(datetime(2024, 1, 1, 0), datetime(2024, 1, 1, 3))
    assert out == [
        datetime(2024, 1, 1, 1),
        datetime(2024, 1, 1, 2),
        datetime(2024, 1, 1, 3),
    ]


def test_invalid():
    with pytest.raises(ValueError):
        Granularity.parse("abc")


def test_spark_sql_emission_shape():
    g = Granularity.parse("15m")
    sql = g.bucket_end_spark_sql("ts")
    assert "900000000" in sql and "div" in sql
    duck = g.bucket_end_ansi_sql("ts")
    assert "900000000" in duck and "//" in duck


def test_week_truncation_is_monday():
    """Weeks align to Monday (reference/PG date_trunc('week')), not the
    raw epoch grid (1970-01-01 was a Thursday)."""
    g = Granularity.parse("1w")
    # 2024-01-10 is a Wednesday; its week starts Monday 2024-01-08
    assert g.truncate(datetime(2024, 1, 10, 15, 30)) == datetime(2024, 1, 8)
    assert g.bucket_end(datetime(2024, 1, 10)) == datetime(2024, 1, 15)
    assert g.bucket_end(datetime(2024, 1, 8)) == datetime(2024, 1, 8)


def test_dst_local_day_bucket(spark):
    """Europe/Amsterdam day buckets across the 2024-03-31 DST
    transition: local midnight maps to 23:00 UTC in winter, 22:00 UTC
    in summer (the 23-hour day)."""
    from pyspark.sql import functions as F

    g = Granularity.parse("1d")
    df = spark.createDataFrame(
        [
            (datetime(2024, 3, 30, 12, 0),),  # CET day
            (datetime(2024, 3, 31, 12, 0),),  # transition day (23h long)
            (datetime(2024, 4, 1, 12, 0),),   # CEST day
        ],
        "ts timestamp_ntz",
    )
    out = df.select(
        F.expr(g.bucket_end_local_spark_sql("ts", "Europe/Amsterdam")).alias("b")
    ).collect()
    assert [r.b for r in out] == [
        datetime(2024, 3, 30, 23, 0),  # Mar 31 00:00 CET
        datetime(2024, 3, 31, 22, 0),  # Apr 1 00:00 CEST (23h day)
        datetime(2024, 4, 1, 22, 0),
    ]


def test_multi_month_python_bucketing():
    g = Granularity.parse("3month")
    # grid: Jan/Apr/Jul/Oct starts; (start, end] labeling
    assert g.truncate(datetime(2023, 5, 20, 7)) == datetime(2023, 4, 1)
    assert g.bucket_end(datetime(2023, 5, 20, 7)) == datetime(2023, 7, 1)
    assert g.bucket_end(datetime(2023, 4, 1)) == datetime(2023, 4, 1)
    assert g.bucket_end(datetime(2023, 4, 1, 0, 0, 1)) == datetime(2023, 7, 1)
    y = Granularity.parse("1year")
    assert y.bucket_end(datetime(2023, 6, 1)) == datetime(2024, 1, 1)
    assert y.bucket_end(datetime(2023, 1, 1)) == datetime(2023, 1, 1)


def test_multi_month_sql_matches_python(spark):
    import duckdb
    import pandas as pd

    probes = [
        datetime(2023, 1, 1), datetime(2023, 2, 28, 13, 30),
        datetime(2023, 4, 1), datetime(2023, 4, 1, 0, 0, 1),
        datetime(2023, 7, 1), datetime(2023, 12, 31, 23, 59, 59),
        datetime(2024, 1, 1), datetime(2024, 6, 15, 6),
    ]
    for spec in ["3month", "6month", "1year"]:
        g = Granularity.parse(spec)
        want = [g.bucket_end(t) for t in probes]
        df = spark.createDataFrame(
            [(t,) for t in probes], "ts timestamp_ntz"
        ).selectExpr(f"{g.bucket_end_spark_sql('ts')} as e").orderBy("e")
        got_spark = sorted(r.e for r in df.collect())
        assert got_spark == sorted(want), f"spark {spec}"
        probes_df = pd.DataFrame({"ts": probes})
        got_duck = sorted(
            duckdb.sql(
                f"SELECT {g.bucket_end_ansi_sql('ts')} AS e FROM probes_df"
            ).df()["e"].dt.to_pydatetime(),
        )
        assert got_duck == sorted(want), f"duckdb {spec}"


def test_before_clamps_month_ends():
    g = Granularity.parse("1month")
    assert g.before(datetime(2024, 5, 31)) == datetime(2024, 4, 30)
    assert g.before(datetime(2024, 3, 31)) == datetime(2024, 2, 29)
    assert g.before(datetime(2023, 3, 31)) == datetime(2023, 2, 28)
    assert g.before(datetime(2024, 2, 5, 12, 30)) == datetime(2024, 1, 5, 12, 30)
    assert Granularity.parse("3month").before(datetime(2024, 1, 15)) == datetime(2023, 10, 15)
    assert Granularity.parse("1h").before(datetime(2024, 1, 1, 1)) == datetime(2024, 1, 1, 0)
