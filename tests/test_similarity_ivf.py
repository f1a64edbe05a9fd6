"""IVF ANN index: recall vs brute force on the fixture embeddings, and
modified-log compaction."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.materialize.fingerprint import compact_modified_log
from minerva_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_search,
)
from minerva_etl_spark.sources.tables import load_table


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    query = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    query = [float(x) for x in query]

    exact = brute_force_topk(emb, query, k=10, exclude_id=0)
    exact_ids = {r.vec_id for r in exact.collect()}

    assigned, centroids = ivf_index(emb, n_centroids=8)
    approx = ivf_search(
        assigned.filter(F.col("vec_id") != 0), centroids, query, k=10, n_probe=4
    )
    approx_ids = {r.vec_id for r in approx.collect()}

    recall = len(exact_ids & approx_ids) / len(exact_ids)
    # probing half the clusters should catch most true neighbors
    assert recall >= 0.5, f"recall {recall} too low: {approx_ids} vs {exact_ids}"
    assert len(approx_ids) == 10


def test_compact_modified_log(spark, tmp_path):
    path = str(tmp_path / "log")
    rows = [
        ("p", datetime(2024, 1, 1, 0, 15), datetime(2024, 1, 1, 0, 16)),
        ("p", datetime(2024, 1, 1, 0, 15), datetime(2024, 1, 1, 0, 40)),
        ("p", datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 0, 31)),
    ]
    spark.createDataFrame(
        rows, "part string, timestamp timestamp_ntz, modified timestamp_ntz"
    ).write.mode("append").parquet(path)
    n = compact_modified_log(spark, path)
    assert n == 2
    folded = {
        (r.part, r.timestamp): r.modified
        for r in spark.read.parquet(path).collect()
    }
    assert folded[("p", datetime(2024, 1, 1, 0, 15))] == datetime(2024, 1, 1, 0, 40)


def test_ivf_join_recall_vs_brute_force(spark):
    """Batched corpus-vs-corpus IVF join: each query's top-k at
    n_probe=half-the-clusters catches most of the exact brute-force
    neighbors, and ranks are dense 1..k."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
        knn_join_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    _a, cent = kmeans_fit(emb, k=8, iters=2)
    assigned = assign_centroids(emb, cent)
    approx = ivf_join(queries, assigned, cent, k=10, n_probe=4)
    exact = knn_join_topk(emb, queries, k=10)
    approx_ids = {}
    for r in approx.collect():
        approx_ids.setdefault(r.query_id, set()).add(r.vec_id)
    exact_ids = {}
    for r in exact.collect():
        exact_ids.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(approx_ids) == set(exact_ids)
    recalls = [
        len(approx_ids[q] & exact_ids[q]) / len(exact_ids[q])
        for q in exact_ids
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"mean recall {mean_recall} too low"
    # ranks dense 1..k per query
    ranks = {}
    for r in approx.collect():
        ranks.setdefault(r.query_id, []).append(r.rank)
    for q, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1)), q


def test_ivf_join_plan_no_cartesian_bounded_exchanges(spark):
    """ivf_join must stay: broadcast-centroid probe (BNLJ over the
    K-row table is the DESIGNED bounded cross), candidate equi-join on
    centroid_id, two-level salted top-k with Spark's Partial
    WindowGroupLimit pushdown — and never a CartesianProduct or an
    unbounded nested loop over the corpus."""
    import re

    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    _a, cent = kmeans_fit(emb, k=4, iters=1)
    out = ivf_join(queries, assign_centroids(emb, cent), cent, k=5, n_probe=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) <= 8
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # every nested-loop is a BROADCAST nested loop (the K-row centroid
    # table), never a shuffled corpus x corpus loop
    assert "ShuffledNestedLoopJoin" not in plan
