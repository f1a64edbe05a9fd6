"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``minerva_etl_spark`` (see SURVEY.md §2 and the
operator modules' docstrings for reference-parity citations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minerva_etl_spark import gate  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: A1 time aggregation (events → 1h trend store) on
    /root/testdata/sf0.001."""
    return gate.q_trend_time_agg_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return gate.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (the correctness gate)."""
    return gate.build_oracles()
