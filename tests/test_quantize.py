"""Int8-quantized ANN state (`operators/quantize.py`): recall parity
against the full-precision retrieval path, payload compression ratio,
quantization determinism, and the zero-vector guard."""

import os

import pytest
from pyspark.sql import functions as F

from minerva_etl_spark.operators.incremental import (
    build_ivf_state,
    ivf_state_query,
)
from minerva_etl_spark.operators.quantize import (
    build_ivf_state_q,
    ivf_state_query_q,
    quantize_vectors,
)
from minerva_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _queries(emb):
    return emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def test_recall_parity_with_full_precision_state(spark, tmp_path):
    """The compressed state with over-fetch + exact rescore returns
    EXACTLY the full-precision retrieval result: same centroids, same
    probes, and the k·overfetch qcos window is wide enough that every
    exact winner survives candidate generation (the r10 verdict's
    'quantized candidates ⊇ exact winners' criterion, strengthened to
    equality of the final top-k)."""
    emb = load_table(spark, SF, "embeddings")
    full_p = str(tmp_path / "full")
    q_p = str(tmp_path / "quant")
    build_ivf_state(spark, emb, full_p, k=4, iters=2)
    build_ivf_state_q(spark, emb, q_p, k=4, iters=2)

    exact = ivf_state_query(
        spark, _queries(emb), full_p, k=3, n_probe=2
    ).collect()
    quant = ivf_state_query_q(
        spark, _queries(emb), q_p, source=emb, k=3, n_probe=2,
        overfetch=4,
    ).collect()

    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    exact_m = {key(r): (r.vec_id, r.cosine) for r in exact}
    quant_m = {key(r): (r.vec_id, r.cosine) for r in quant}
    assert exact_m == quant_m
    assert len(exact_m) == 3 * 50  # 50 queries x top-3


def test_state_payload_is_actually_smaller(spark, tmp_path):
    """The point of the exercise: the quantized assignment parquet is
    materially smaller than the float-vector assignment parquet on
    identical rows (SCALE.md records the measured ratio)."""
    emb = load_table(spark, SF, "embeddings")
    full_p = str(tmp_path / "full")
    q_p = str(tmp_path / "quant")
    build_ivf_state(spark, emb, full_p, k=4, iters=2)
    build_ivf_state_q(spark, emb, q_p, k=4, iters=2)

    def nbytes(root):
        total = 0
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, f))
        return total

    full_b = nbytes(os.path.join(full_p, "assigned"))
    q_b = nbytes(os.path.join(q_p, "assigned_q"))
    assert q_b < 0.55 * full_b, (q_b, full_b)


def test_quantization_bounds_and_zero_vector(spark):
    """|q_i| <= 127 always; the all-zero vector quantizes to zeros
    with qnorm 0 (its qcos is NULL and it ranks last — never a
    divide-by-zero crash)."""
    rows = [
        (1, [0.5, -1.0, 0.25]),
        (2, [0.0, 0.0, 0.0]),
        (3, [1e-9, -1e-9, 1e-9]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {r.vec_id: r for r in quantize_vectors(df).collect()}
    assert list(out[1].qvec) == [64, -127, 32]  # 0.5/(1/127)=63.5 -> 64
    assert max(abs(v) for v in out[1].qvec) <= 127
    assert list(out[2].qvec) == [0, 0, 0] and out[2].qnorm == 0.0
    assert list(out[3].qvec) == [127, -127, 127]


def test_quantize_drops_float_payload(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    q = quantize_vectors(df)
    assert "embedding" not in q.columns
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"


def test_increment_equals_full_rebuild_at_frozen_centroids(
    spark, tmp_path
):
    """build(3/4) + increment(1/4) must hold EXACTLY the state a full
    assignment at the frozen centroids would: same rows, same int8
    payloads — and the recluster trigger reads the quantized meta
    (shared layout with the float state)."""
    from minerva_etl_spark.operators.incremental import (
        ivf_needs_recluster,
    )
    from minerva_etl_spark.operators.quantize import ivf_increment_q
    from minerva_etl_spark.operators.similarity import assign_centroids

    emb = load_table(spark, SF, "embeddings")
    p = str(tmp_path / "inc")
    build_ivf_state_q(spark, emb.filter("vec_id % 4 < 3"), p, k=4, iters=2)
    delta = ivf_increment_q(spark, emb.filter("vec_id % 4 = 3"), p)
    assert delta.count() == emb.filter("vec_id % 4 = 3").count()

    state = spark.read.parquet(p + "/assigned_q")
    assert state.count() == emb.count()
    # full recompute at the SAME frozen centroids == the state
    cent = spark.read.parquet(p + "/centroids")
    expect = quantize_vectors(
        assign_centroids(emb, cent), "embedding"
    )
    got = {
        r.vec_id: (r.centroid_id, tuple(r.qvec))
        for r in state.collect()
    }
    want = {
        r.vec_id: (r.centroid_id, tuple(r.qvec))
        for r in expect.collect()
    }
    assert got == want
    # 500 rows vs 375 at fit: 1.33x < the 4x refit knee
    assert not ivf_needs_recluster(spark, p)


def test_query_plan_has_no_python_udf(spark, tmp_path):
    """The whole retrieval chain (quantize, qcos rank, rescore) is
    Catalyst expressions — no BatchEvalPython / ArrowEvalPython node
    may appear (UDFs are the slow path; the integer dot must stay in
    codegen)."""
    emb = load_table(spark, SF, "embeddings")
    q_p = str(tmp_path / "quant")
    build_ivf_state_q(spark, emb, q_p, k=4, iters=2)
    plan = (
        ivf_state_query_q(
            spark, _queries(emb), q_p, source=emb, k=3, n_probe=2
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
