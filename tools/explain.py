"""Print formatted physical plans of gate queries for plan review.

Usage: python tools/explain.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1:] or [
        "trend_time_agg_1h",
        "entity_agg_nation_1month",
        "text_profile",
        "dedup_minhash_pairs",
        "dsir_select",
        "semantic_dedup",
    ]
    import __spark_entry__ as entry_mod
    from minerva_etl_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    qs = entry_mod.queries()
    for name in names:
        print(f"\n{'=' * 30} {name} {'=' * 30}")
        df = qs[name](spark, "/root/testdata/sf0.001")
        df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
