"""Connected-components hygiene + large-star/small-star properties.

Covers the three promises `operators/dedup.py::connected_components`
makes: (1) the ``star`` algorithm converges in O(log n) alternations on
an adversarial-diameter path graph where label propagation would need
diameter rounds, (2) both algorithms produce identical labelings, and
(3) superseded per-round localCheckpoints are freed so executor storage
stays flat no matter how many rounds run.
"""

import random

import pytest

from minerva_etl_spark.operators.dedup import connected_components


def _path_pairs(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )


def test_star_path_graph_converges_in_log_rounds(spark):
    """1,000-node path graph: star converges in O(log n) alternations
    (label propagation would need ~1,000 rounds) and labels everything
    with the component minimum."""
    n = 1000
    stats = {}
    got = {
        r.doc_id: r.component_id
        for r in connected_components(
            _path_pairs(spark, n), max_iter=30, algorithm="star",
            stats=stats,
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # O(log2 1000) ~ 10 alternations; generous headroom, but far below
    # the ~1000 rounds a diameter-bound algorithm would need
    assert stats["rounds"] <= 16, stats


def test_star_matches_label_propagation_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    lab = {
        r.doc_id: r.component_id
        for r in connected_components(df, max_iter=50).collect()
    }
    star = {
        r.doc_id: r.component_id
        for r in connected_components(
            df, max_iter=50, algorithm="star"
        ).collect()
    }
    assert lab == star
    assert len(lab) > 0


def test_auto_escalates_on_long_diameter(spark):
    """auto: a long path exhausts the label-propagation budget and
    finishes with star — correct labels, O(log n) total rounds."""
    n = 500
    stats = {}
    got = {
        r.doc_id: r.component_id
        for r in connected_components(
            _path_pairs(spark, n), max_iter=30, algorithm="auto",
            stats=stats,
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert stats["algorithm"] == "label-propagation+star"
    assert stats["rounds"] <= 25, stats


def test_auto_stays_label_propagation_on_cliques(spark):
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a bigint, id_b bigint",
    )
    stats = {}
    got = {
        r.doc_id: r.component_id
        for r in connected_components(
            pairs, algorithm="auto", stats=stats
        ).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert stats["algorithm"] == "label-propagation"


@pytest.mark.parametrize("algorithm", ["label-propagation", "star", "auto"])
def test_components_storage_stays_flat(spark, algorithm):
    """A long chain forces many rounds; after the call, at most the
    single returned-result checkpoint may remain persisted — superseded
    round state must have been freed."""
    before = spark._jsc.getPersistentRDDs().size()
    out = connected_components(
        _path_pairs(spark, 64), max_iter=80, algorithm=algorithm
    )
    assert out.count() == 64
    after = spark._jsc.getPersistentRDDs().size()
    assert after - before <= 1, (before, after)


def test_self_pair_only_doc_is_singleton(spark):
    """A doc whose only appearance is a self-pair keeps its contract
    row (doc_id, component_id=itself); self-loops on otherwise-paired
    docs change nothing."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7), (1, 1)], "id_a bigint, id_b bigint"
    )
    for algo in ("label-propagation", "star", "auto"):
        got = {
            (r.doc_id, r.component_id)
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (7, 7)}, algo
