"""Bucketed layout: part joins are exchange-free (the SCALE.md
co-location strategy, verified at the plan level)."""

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.store.bucketed import (
    count_exchanges,
    read_parts_joined,
    write_bucketed_part,
)


def test_bucketed_part_join_has_no_exchange(spark, tmp_path):
    # force SMJ so bucketing (not broadcast) carries the join; restored
    # after — at real scale the sides exceed the threshold anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ts = F.expr("timestamp'2024-01-01 00:15:00'")
        main = spark.range(5000).select(
            F.col("id").alias("entity_id"), ts.alias("timestamp"),
            (F.col("id") * 2.0).alias("power_kwh"),
        )
        module = spark.range(5000).select(
            F.col("id").alias("entity_id"), ts.alias("timestamp"),
            (F.col("id") / 10.0).alias("cpu_load"),
        )
        spark.sql("DROP TABLE IF EXISTS node_main_bkt")
        spark.sql("DROP TABLE IF EXISTS node_module_bkt")
        write_bucketed_part(
            main, "node_main_bkt", n_buckets=8, path=str(tmp_path / "main")
        )
        write_bucketed_part(
            module, "node_module_bkt", n_buckets=8, path=str(tmp_path / "mod")
        )

        wide = read_parts_joined(spark, ["node_main_bkt", "node_module_bkt"])
        assert count_exchanges(wide) == 0, "bucketed join must not shuffle"
        row = wide.filter(F.col("entity_id") == 42).collect()[0]
        assert row.power_kwh == 84.0 and row.cpu_load == 4.2

        # contrast: the same join over plain (unbucketed) frames shuffles
        plain = main.join(module, ["entity_id", "timestamp"], "full_outer")
        assert count_exchanges(plain) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS node_main_bkt")
        spark.sql("DROP TABLE IF EXISTS node_module_bkt")
