"""Bitext mining (`operators/bitext.py`): planted translations are
mined, hubs are normalized away, ties break deterministically, and
the plan stays Python-free."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.bitext import (
    bitext_candidates,
    mine_bitext,
)


def _df(spark, rows, id_name):
    return spark.createDataFrame(
        rows, f"{id_name} bigint, embedding array<double>"
    )


def test_planted_translations_are_mined(spark):
    """Four source vectors each have an exact translation on the
    target side (same direction, different magnitude — cosine 1) plus
    noise targets; mining must pair every source with its planted
    twin at margin > 1."""
    src = _df(spark, [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
    ], "src_id")
    tgt = _df(spark, [
        (10, [2.0, 0.0, 0.0, 0.0]),   # twin of 0
        (11, [0.0, 3.0, 0.0, 0.0]),   # twin of 1
        (12, [0.0, 0.0, 0.5, 0.0]),   # twin of 2
        (13, [0.0, 0.0, 0.0, 9.0]),   # twin of 3
        (14, [1.0, 1.0, 1.0, 1.0]),   # hub: mid-cosine to everything
    ], "tgt_id")
    out = {
        r.src_id: r
        for r in mine_bitext(
            bitext_candidates(src, tgt), k=2, threshold=1.0
        ).collect()
    }
    assert {s: r.tgt_id for s, r in out.items()} == {
        0: 10, 1: 11, 2: 12, 3: 13
    }
    for r in out.values():
        assert r.cosine == 1.0 and r.margin > 1.0


def test_hub_is_normalized_away(spark):
    """A hub target close to every source must NOT win over a true
    pair even when its raw cosine beats the margin runner-up — the
    point of ratio margin over cosine thresholding."""
    src = _df(spark, [
        (0, [1.0, 0.05, 0.0]),
        (1, [0.05, 1.0, 0.0]),
    ], "src_id")
    tgt = _df(spark, [
        (10, [1.0, 0.0, 0.0]),     # near-twin of 0
        (11, [0.0, 1.0, 0.0]),     # near-twin of 1
        (12, [0.7, 0.7, 0.1]),     # hub: ~0.74 cosine to both
    ], "tgt_id")
    out = {
        r.src_id: r.tgt_id
        for r in mine_bitext(
            bitext_candidates(src, tgt), k=2, threshold=1.0
        ).collect()
    }
    assert out == {0: 10, 1: 11}


def test_threshold_filters_everything_when_unreachable(spark):
    src = _df(spark, [(0, [1.0, 0.0])], "src_id")
    tgt = _df(spark, [(10, [1.0, 0.0]), (11, [0.9, 0.1])], "tgt_id")
    assert (
        mine_bitext(
            bitext_candidates(src, tgt), k=2, threshold=99.0
        ).count()
        == 0
    )


def test_margin_is_symmetric_ratio(spark):
    """One source, one target: both neighborhoods are just the pair
    itself, so margin = 2c/(c+c) = 1 exactly."""
    src = _df(spark, [(0, [0.6, 0.8])], "src_id")
    tgt = _df(spark, [(10, [0.6, 0.8])], "tgt_id")
    rows = mine_bitext(
        bitext_candidates(src, tgt), k=4, threshold=1.0
    ).collect()
    assert len(rows) == 1 and rows[0].margin == 1.0


def test_plan_is_python_free(spark):
    src = _df(spark, [(0, [1.0, 0.0])], "src_id")
    tgt = _df(spark, [(10, [1.0, 0.0])], "tgt_id")
    plan = (
        mine_bitext(bitext_candidates(src, tgt))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_candidate_injection_matches_full_product_on_covering_graph(
    spark,
):
    """Feeding `mine_bitext` an externally-built candidate set (the
    corpus×corpus ANN path) that happens to cover all pairs must give
    the same answer as the built-in product."""
    src = _df(spark, [
        (0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]),
    ], "src_id")
    tgt = _df(spark, [
        (10, [0.9, 0.1, 0.0]), (11, [0.1, 0.9, 0.0]),
    ], "tgt_id")
    full = bitext_candidates(src, tgt)
    injected = full.select("src_id", "tgt_id", "cosine")  # same graph
    a = sorted(
        (r.src_id, r.tgt_id, r.margin)
        for r in mine_bitext(full, k=2, threshold=1.0).collect()
    )
    b = sorted(
        (r.src_id, r.tgt_id, r.margin)
        for r in mine_bitext(injected, k=2, threshold=1.0).collect()
    )
    assert a == b and len(a) == 2


def test_ann_candidates_recover_planted_translations(spark):
    """The REAL corpus×corpus path: ivf_join candidates (kmeans on
    the target side, probe-pruned equi-join) feeding mine_bitext must
    recover every planted translation — and the candidate graph must
    be strictly smaller than the bipartite product."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
    )

    # two well-separated direction families so k-means has real
    # structure; each source has an exact-direction twin
    src_rows = [(i, [1.0 + 0.01 * i, 0.02 * i, 0.0]) for i in range(4)]
    src_rows += [(i, [0.0, 0.02 * i, 1.0 + 0.01 * i]) for i in range(4, 8)]
    tgt_rows = [
        (100 + i, [2.0 * v for v in vec]) for i, vec in src_rows
    ]
    tgt_rows += [(200, [0.5, 0.5, 0.5]), (201, [-1.0, 0.1, 0.1])]
    src = _df(spark, [
        (i, [float(x) for x in v]) for i, v in src_rows
    ], "src_id")
    tgt = _df(spark, [
        (i, [float(x) for x in v]) for i, v in tgt_rows
    ], "vec_id")

    queries = src.select(
        F.col("src_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    _a, cent = kmeans_fit(tgt, k=2, iters=2)
    cand = ivf_join(
        queries, assign_centroids(tgt, cent), cent, k=4, n_probe=1
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("vec_id").alias("tgt_id"),
        "cosine",
    )
    n_cand = cand.count()
    assert n_cand < src.count() * tgt.count()  # pruned, not product
    mined = {
        r.src_id: r.tgt_id
        for r in mine_bitext(cand, k=2, threshold=1.0).collect()
    }
    for i, _ in src_rows:
        assert mined.get(i) == 100 + i, (i, mined)
