"""Trained product quantization (`operators/pq.py`): recall parity
with the exact retrieval path at the documented over-fetch, payload
compression vs the int8 state, codebook determinism, and the CLI
verbs."""

import os

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.pq import (
    build_ivf_pq_state,
    ivf_pq_state_query,
    pq_encode,
    pq_fit,
)
from minerva_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _queries(emb):
    return emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _nbytes(root):
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def test_recall_pinned_at_documented_overfetch(spark, tmp_path):
    """PQ is LOSSY (unlike the near-lossless int8 state, where the
    same test demands equality): the honest contract is a pinned
    recall floor at the gate row's exact configuration — m=16 ×
    pq_k=16 over 64 dims, overfetch=10 — measured against the
    full-precision retrieval path on identical coarse centroids.
    Measured on this fixture: 147/150 (0.98); pinned at ≥ 0.95 so a
    codebook/ADC regression fails loudly while seed-level jitter
    doesn't."""
    from minerva_etl_spark.operators.incremental import (
        build_ivf_state,
        ivf_state_query,
    )

    emb = load_table(spark, SF, "embeddings")
    full_p = str(tmp_path / "full")
    pq_p = str(tmp_path / "pq")
    build_ivf_state(spark, emb, full_p, k=4, iters=2)
    build_ivf_pq_state(
        spark, emb, pq_p, coarse_k=4, coarse_iters=2,
        m=16, pq_k=16, pq_iters=2,
    )

    exact_sets: dict = {}
    for r in ivf_state_query(
        spark, _queries(emb), full_p, k=3, n_probe=2
    ).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    got: dict = {}
    for r in ivf_pq_state_query(
        spark, _queries(emb), pq_p, source=emb, k=3, n_probe=2,
        overfetch=10,
    ).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)

    total = sum(len(s) for s in exact_sets.values())
    hits = sum(
        len(got.get(qid, set()) & exact_sets[qid]) for qid in exact_sets
    )
    assert total == 3 * 50  # 50 queries x top-3
    assert hits / total >= 0.95, (hits, total)


def test_payload_smaller_than_int8_state(spark, tmp_path):
    """The point of trained PQ: the persisted assignment is materially
    smaller than the int8-quantized assignment on identical rows —
    m=16 bytes of vector payload vs 64 (SCALE.md records the measured
    ratio; at real embedding dims the ratio only grows)."""
    from minerva_etl_spark.operators.quantize import build_ivf_state_q

    emb = load_table(spark, SF, "embeddings")
    q_p = str(tmp_path / "quant")
    pq_p = str(tmp_path / "pq")
    build_ivf_state_q(spark, emb, q_p, k=4, iters=2)
    build_ivf_pq_state(
        spark, emb, pq_p, coarse_k=4, coarse_iters=2,
        m=16, pq_k=16, pq_iters=2,
    )
    q_b = _nbytes(os.path.join(q_p, "assigned_q"))
    pq_b = _nbytes(os.path.join(pq_p, "assigned_pq"))
    assert pq_b < 0.5 * q_b, (pq_b, q_b)


def test_fit_is_deterministic(spark):
    """Two independent fits produce byte-identical codebooks (seeded
    Lloyd's + grid-snapped exact means — the property every oracle row
    rests on)."""
    emb = load_table(spark, SF, "embeddings")
    a = pq_fit(emb, m=4, d_sub=16, pq_k=8, iters=2).collect()
    b = pq_fit(emb, m=4, d_sub=16, pq_k=8, iters=2).collect()
    ka = {(r.subspace, r.code_id): (r.cvec, r.csq_grid) for r in a}
    kb = {(r.subspace, r.code_id): (r.cvec, r.csq_grid) for r in b}
    assert ka == kb
    assert len(ka) == 4 * 8


def test_encode_shape_and_norm(spark):
    """Every vector encodes to exactly m codes in [0, pq_k) and the
    stored reconstruction norm is the exact integer sum of the chosen
    codewords' grid-snapped squared norms."""
    emb = load_table(spark, SF, "embeddings").limit(50)
    cb = pq_fit(emb, m=4, d_sub=16, pq_k=8, iters=1)
    codes = pq_encode(emb, cb, m=4, d_sub=16)
    rows = codes.collect()
    assert len(rows) == 50
    csq = {(r.subspace, r.code_id): r.csq_grid for r in cb.collect()}
    for r in rows:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)
        assert r.rnorm_grid == sum(
            csq[(j, c)] for j, c in enumerate(r.codes)
        )


def test_increment_is_frozen_parameter_encode(spark, tmp_path):
    """build(3/4) + increment(1/4) leaves the state identical to
    encoding the FULL corpus at the subset-trained frozen parameters —
    the property the `sim_ivf_tpq_increment` oracle replays — and the
    delivery never rewrites history rows."""
    from minerva_etl_spark.operators.pq import ivf_pq_increment
    from minerva_etl_spark.operators.similarity import assign_centroids

    emb = load_table(spark, SF, "embeddings")
    p = str(tmp_path / "state")
    build_ivf_pq_state(
        spark, emb.filter("vec_id % 4 < 3"), p,
        coarse_k=4, coarse_iters=2, m=16, pq_k=16, pq_iters=2,
    )
    before = {
        r.vec_id: (r.centroid_id, tuple(r.codes), r.rnorm_grid)
        for r in spark.read.parquet(p + "/assigned_pq").collect()
    }
    ivf_pq_increment(spark, emb.filter("vec_id % 4 = 3"), p)
    after = {
        r.vec_id: (r.centroid_id, tuple(r.codes), r.rnorm_grid)
        for r in spark.read.parquet(p + "/assigned_pq").collect()
    }
    # history untouched, delta appended
    assert all(after[k] == v for k, v in before.items())
    assert len(after) == emb.count()
    # delta rows == frozen-parameter recompute
    cent = spark.read.parquet(p + "/centroids")
    cb = spark.read.parquet(p + "/codebooks")
    delta = emb.filter("vec_id % 4 = 3")
    expect_coarse = {
        r.vec_id: r.centroid_id
        for r in assign_centroids(delta, cent).collect()
    }
    expect_codes = {
        r.vec_id: (tuple(int(c) for c in r.codes), r.rnorm_grid)
        for r in pq_encode(delta, cb, m=16, d_sub=4).collect()
    }
    for vid, want_cid in expect_coarse.items():
        got_cid, got_codes, got_rn = after[vid]
        assert got_cid == want_cid
        assert (got_codes, got_rn) == expect_codes[vid]


def test_dim_not_divisible_raises(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="not divisible"):
        build_ivf_pq_state(
            spark, emb, "/tmp/never_written_pq", m=5, dim=64
        )


def test_cli_pq_build_and_query(spark, tmp_path):
    """`minerva-spark corpus pq-build` then `pq-query` round-trips
    through the persisted state and emits ranked neighbors."""
    from minerva_etl_spark.cli import cmd_corpus

    class A:
        pass

    emb = load_table(spark, SF, "embeddings")
    inp = str(tmp_path / "emb")
    emb.write.parquet(inp)

    a = A()
    a.action = "pq-build"
    a.input = inp
    a.output = str(tmp_path / "built")
    a.state = str(tmp_path / "state")
    a.n = 4
    a.iters = 2
    a.pq_m = 4
    a.pq_k = 8
    a.benchmark = None
    cmd_corpus(a)

    b = A()
    b.action = "pq-query"
    b.input = inp
    b.output = str(tmp_path / "out")
    b.state = str(tmp_path / "state")
    b.n = 3
    b.benchmark = None
    cmd_corpus(b)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 3 * emb.count()
    assert set(out.columns) == {"query_id", "vec_id", "cosine", "rank"}


def test_query_plan_is_python_free_and_broadcasts(spark, tmp_path):
    """The whole retrieval path — probe, LUT build, ADC fold, rescore —
    stays JVM-side (no Python eval nodes), and the centroid + LUT
    sides arrive by broadcast, not shuffle."""
    emb = load_table(spark, SF, "embeddings")
    p = str(tmp_path / "state")
    build_ivf_pq_state(
        spark, emb, p, coarse_k=4, coarse_iters=2,
        m=16, pq_k=16, pq_iters=2,
    )
    out = ivf_pq_state_query(
        spark, _queries(emb), p, source=emb, k=3, n_probe=2,
        overfetch=10,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan


def test_pq_k_over_tinyint_range_raises(spark):
    """r12 ADVICE: codes persist as signed tinyint, so pq_k > 128
    must fail loudly instead of silently wrapping code ids."""
    vecs = spark.range(4).selectExpr(
        "id AS vec_id",
        "array(CAST(id AS float), CAST(id+1 AS float)) AS embedding",
    )
    with pytest.raises(ValueError, match="pq_k"):
        pq_fit(vecs, m=1, d_sub=2, pq_k=200)
