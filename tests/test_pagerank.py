"""Exact-integer PageRank (`operators/pagerank.py`): authority
ordering on planted graphs, partitioning invariance, dangling-mass
semantics, and conservation bounds."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.pagerank import _Q, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_sink_hub_outranks_spokes(spark):
    """A star graph: every spoke links to the hub — the hub must end
    with the highest rank."""
    e = _edges(spark, [(i, 0) for i in range(1, 6)])
    ranks = {r.node: r.rank_grid for r in pagerank(e, iters=3).collect()}
    assert ranks[0] == max(ranks.values())
    assert all(ranks[0] > ranks[i] for i in range(1, 6))


def test_partitioning_invariance(spark):
    """Integer arithmetic makes the result independent of physical
    layout: 1-partition and 16-partition runs are bit-identical."""
    pairs = [(i, (i * 7 + k) % 50) for i in range(50) for k in (1, 2)]
    a = {
        r.node: r.rank_grid
        for r in pagerank(_edges(spark, pairs).coalesce(1)).collect()
    }
    b = {
        r.node: r.rank_grid
        for r in pagerank(
            _edges(spark, pairs).repartition(16)
        ).collect()
    }
    assert a == b


def test_total_mass_bounded_by_grid(spark):
    """Ranks sum to <= Q (dangling mass drops, never inflates)."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])  # 4 is dangling
    total = (
        pagerank(e, iters=3)
        .agg(F.sum("rank_grid").alias("t"))
        .collect()[0].t
    )
    assert 0 < total <= _Q


def test_superseded_checkpoints_are_freed(spark):
    """r15 (VERDICT ask 6): each iteration frees the previous
    round's localCheckpoint once its successor materializes — a long
    run retains O(1) checkpointed RDDs (nodes + final ranks), not
    one per iteration."""
    sc = spark.sparkContext
    pairs = [(i, (i * 3 + 1) % 20) for i in range(20)]
    before = sc._jsc.sc().getPersistentRDDs().size()
    result = pagerank(_edges(spark, pairs), iters=8)
    after = sc._jsc.sc().getPersistentRDDs().size()
    # pre-fix this grew by iters+2 (10); now: nodes + final ranks
    assert after - before <= 2
    # the surviving frame is still fully usable
    assert result.count() == 20


def test_symmetric_cycle_is_uniform(spark):
    """A directed cycle: perfect symmetry ⇒ identical ranks."""
    n = 6
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    vals = {r.rank_grid for r in pagerank(e, iters=4).collect()}
    assert len(vals) == 1
