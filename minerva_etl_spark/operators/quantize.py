"""Int8-quantized ANN state — compressed payload for the persisted
IVF retrieval state (round 11; the r10 verdict's ask 5).

At 100 TB / billions of vectors the dominant cost of a persisted ANN
state is the raw float vectors themselves (`incremental.py`'s
embedding/IVF states store ``array<float>`` payloads).  Symmetric
per-vector int8 quantization cuts that payload ~4× vs float32 (~8×
vs the double arrays Spark writes for literal-built fixtures; see
SCALE.md "Quantized ANN state"), and — the part that matters for the
oracle discipline — makes candidate GENERATION exact integer
arithmetic:

    qcos(a, b) = dot_int(qa, qb) / (|qa| * |qb|)

The per-vector scales cancel out of the cosine ratio, so ranking by
``qcos`` needs no float payload at all: an integer dot product and
two precomputed integer-derived norms.  Integer math is
bit-reproducible across engines, which is how the ``sim_ivf_pq``
gate row can hash-match a DuckDB replay of the SAME quantized
pipeline (the md5-draw parity discipline, applied to vectors).

Retrieval therefore runs: probe centroids (full precision — the
centroid table is tiny and broadcast) → candidate equi-join on
``centroid_id`` ranking by ``qcos`` → over-fetch ``k·overfetch``
winners per query → join that SMALL winner set back to the
full-precision source BY ID for the exact rescore → exact top-k.
The state itself never stores a float vector; the exact vectors are
fetched from the base table only for the few hundred candidates that
survive, which is the standard PQ/SQ serving shape (Johnson et al.,
"Billion-scale similarity search with GPUs" — scalar-quantization
variant).

Quantization rule (both engines, deterministically):

    scale  = max(|v_i|) / 127          (0-vector → scale NULL → q=0)
    q_i    = floor(v_i / scale + 0.5)  (explicit half-up; floor is
                                        IEEE-identical in Spark and
                                        DuckDB, unlike round())

|q_i| ≤ 127 by construction, so the payload is a true
``array<tinyint>``.

Reference parity note: the reference engine has no ANN surface (its
nearest analog is trend-store compression); this module is part of
the LLM-pipeline extension arc alongside `similarity.py` and
`incremental.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minerva_etl_spark.operators.incremental import (
    _state_lease,
)
from minerva_etl_spark.operators.similarity import (
    cosine_from_norms_expr,
    norm_expr,
    probe_nearest_centroids,
)

__all__ = [
    "quantize_vectors",
    "build_ivf_state_q",
    "ivf_increment_q",
    "ivf_state_query_q",
    "ivf_pq_oracle_sql",
]


def _scale_sql(vec: str) -> str:
    # NULL for the all-zero vector: every q_i coalesces to 0 below and
    # the qnorm of 0 makes qcos NULL (ranks last), same posture as
    # cosine_expr's nullif guard.
    return (
        f"nullif(array_max(transform({vec}, "
        f"x -> abs(CAST(x AS DOUBLE)))), 0.0d) / 127.0d"
    )


def _qvec_sql(vec: str, scale: str) -> str:
    # floor(x/s + 0.5): explicit half-up in double precision — the
    # SAME expression DuckDB evaluates in the oracle, so the integer
    # payload is bit-identical across engines (round() is not: Spark
    # HALF_UP on DECIMAL vs DuckDB's double rounding).
    return (
        f"transform({vec}, x -> CAST(coalesce("
        f"floor(CAST(x AS DOUBLE) / ({scale}) + 0.5d), 0.0d) "
        f"AS TINYINT))"
    )


_QDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(x AS BIGINT) * CAST(y AS BIGINT)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _qnorm_sql(q: str) -> str:
    return f"sqrt(CAST({_QDOT.format(a=q, b=q)} AS DOUBLE))"


def qcos_expr(qa: str, qb: str, qna: str, qnb: str) -> F.Column:
    """Approximate cosine from int8 payloads: integer dot over
    precomputed integer-derived norms.  Scales cancel; every input to
    the division is integer-derived, so the double result (and hence
    the ranking) is bit-reproducible across engines."""
    return F.expr(
        f"round(CAST({_QDOT.format(a=qa, b=qb)} AS DOUBLE) / "
        f"nullif({qna} * {qnb}, 0.0d), 6)"
    )


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    prefix: str = "q",
) -> DataFrame:
    """Add ``{prefix}vec array<tinyint>`` + ``{prefix}norm double``
    columns and DROP the float vector — the state-compression step.
    One codegen projection, no shuffle."""
    scale = _scale_sql(vec_col)
    return df.withColumn(
        f"{prefix}vec", F.expr(_qvec_sql(vec_col, scale))
    ).withColumn(
        f"{prefix}norm", F.expr(_qnorm_sql(f"{prefix}vec"))
    ).drop(vec_col)


def _paths(state_path: str) -> tuple[str, str, str]:
    # meta lives at the SAME relative spot as the float state's
    # (`incremental._ivf_paths`), so `incremental.ivf_needs_recluster`
    # reads quantized states unchanged (k ~ √N refit discipline,
    # SCALE.md).
    root = state_path.rstrip("/")
    return root + "/centroids", root + "/assigned_q", root + "/meta"


def build_ivf_state_q(
    spark: SparkSession,
    embeddings: DataFrame,
    state_path: str,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + persist the QUANTIZED IVF state: full-precision centroids
    (tiny — k rows), but the per-vector assignment stores ONLY
    ``(id, centroid_id, qvec, qnorm)`` — no float payload.  Assignment
    itself runs at full precision (same `assign_centroids` as the
    uncompressed state, so cluster membership is identical); only the
    persisted payload is compressed.  Returns the persisted
    assignment."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import assign_centroids

    cent_p, asg_p, meta_p = _paths(state_path)
    with _state_lease(spark, state_path):
        _seed, cent = kmeans_fit(
            embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
        assigned = assign_centroids(
            embeddings, cent, id_col=id_col, vec_col=vec_col
        )
        cent.write.mode("overwrite").parquet(cent_p)
        quantize_vectors(assigned, vec_col).write.mode(
            "overwrite"
        ).parquet(asg_p)
        n = spark.read.parquet(asg_p).count()  # the persisted copy
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p, "n_at_fit bigint, n_total bigint", (n, n)
        )
    return spark.read.parquet(asg_p)


def ivf_increment_q(
    spark: SparkSession,
    new_embeddings: DataFrame,
    state_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One delivery against the quantized state: assign ONLY the
    delta at the frozen persisted centroids (broadcast — history
    untouched), quantize it with the same floor-half-up rule, append.
    History payloads are never dequantized or rescanned, so a
    delivery's cost is O(delta) regardless of state size — the same
    protocol as `incremental.ivf_increment`, with the 4× smaller
    append.  The lease spans read-centroids → assign → append.
    Delta-assign at frozen centroids == full recompute at those
    centroids, so the `sim_ivf_pq_increment` oracle can replay the
    whole cycle closed-form.  Returns the delta's quantized state
    rows."""
    from minerva_etl_spark.operators.similarity import assign_centroids

    cent_p, asg_p, meta_p = _paths(state_path)
    with _state_lease(spark, state_path):
        cent = spark.read.parquet(cent_p)
        delta_q = quantize_vectors(
            assign_centroids(
                new_embeddings, cent, id_col=id_col, vec_col=vec_col
            ),
            vec_col,
        ).localCheckpoint(eager=True)  # pinned before state mutates
        n_delta = delta_q.count()
        delta_q.write.mode("append").parquet(asg_p)
        meta = spark.read.parquet(meta_p).collect()[0]  # one row
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p, "n_at_fit bigint, n_total bigint",
            (meta.n_at_fit, meta.n_total + n_delta),
        )
    return delta_q


def ivf_state_query_q(
    spark: SparkSession,
    queries: DataFrame,
    state_path: str,
    source: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    overfetch: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    salt_buckets: int = 16,
) -> DataFrame:
    """Retrieval against the quantized state: probe → qcos candidate
    rank (pure integer state) → over-fetch ``k·overfetch`` → exact
    rescore by joining the winner set back to ``source`` by id →
    exact top-k.

    Plan shape at scale: the centroid probe broadcasts k rows; the
    candidate join is the same ``centroid_id`` equi-join as
    `similarity.ivf_join` but moves 4× fewer state bytes; the rescore
    join touches ``n_queries · k · overfetch`` ids — a sliver of the
    corpus — and AQE picks broadcast for small query batches.  The
    per-query windows run through `cap_per_key`'s two-level salted
    shape, so a skewed cluster never serializes one task.
    """
    from minerva_etl_spark.operators.skew import cap_per_key

    cent_p, asg_p, _meta_p = _paths(state_path)
    centroids = spark.read.parquet(cent_p)
    assigned_q = spark.read.parquet(asg_p)

    q = queries.select(query_id_col, query_vec_col).withColumn(
        "__qnorm", norm_expr(query_vec_col)
    )
    # fold-based probe choice over one broadcast centroid-array row —
    # same winners as the pre-r16 crossJoin+window, zero query shuffle
    # (r16; see similarity.probe_nearest_centroids)
    probes = probe_nearest_centroids(
        q, centroids, n_probe, query_vec_col
    ).select(query_id_col, query_vec_col, "centroid_id")
    # quantize the query batch with the SAME rule as the state — the
    # scales cancel in qcos, so any per-vector scale works, but using
    # one rule keeps the oracle replay one CTE
    probes_q = quantize_vectors(
        probes.withColumn("__qv", F.col(query_vec_col)),
        "__qv",
        prefix="__q",
    )
    cand = (
        probes_q.join(assigned_q, "centroid_id")
        .select(
            query_id_col,
            query_vec_col,
            F.col(id_col),
            qcos_expr("__qvec", "qvec", "__qnorm", "qnorm").alias(
                "qcos"
            ),
        )
    )
    winners = cap_per_key(
        cand,
        keys=[query_id_col],
        order_by=[F.col("qcos").desc(), F.col(id_col).asc()],
        n=int(k) * int(overfetch),
        salt_col=id_col,
        salt_buckets=salt_buckets,
    ).select(query_id_col, query_vec_col, id_col)
    # exact rescore: fetch the few winning float vectors by id
    exact = (
        winners.withColumn("__qn2", norm_expr(query_vec_col))
        .join(
            source.select(
                F.col(id_col), F.col(vec_col).alias("__srcvec")
            ).withColumn("__snorm", norm_expr("__srcvec")),
            id_col,
        )
        .select(
            query_id_col,
            F.col(id_col),
            cosine_from_norms_expr(
                "__srcvec", query_vec_col, "__snorm", "__qn2"
            ).alias("cosine"),
        )
    )
    return cap_per_key(
        exact,
        keys=[query_id_col],
        order_by=[F.col("cosine").desc(), F.col(id_col).asc()],
        n=int(k),
        salt_col=id_col,
        salt_buckets=salt_buckets,
    )


# ------------------------------------------------------------- oracle


def _duck_scale(vec: str) -> str:
    return (
        f"nullif(list_max(list_transform(CAST({vec} AS DOUBLE[]), "
        f"x -> abs(x))), 0.0) / 127.0"
    )


def _duck_qvec(vec: str, scale: str) -> str:
    return (
        f"list_transform(CAST({vec} AS DOUBLE[]), "
        f"x -> CAST(coalesce(floor(x / ({scale}) + 0.5), 0.0) "
        f"AS BIGINT))"
    )


def _duck_qdot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(acc, v) -> acc + v)"
    )


def ivf_pq_oracle_sql(
    kmeans_k: int,
    kmeans_iters: int,
    query_pred: str,
    k: int = 5,
    n_probe: int = 3,
    overfetch: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_pred: str | None = None,
) -> str:
    """DuckDB twin of `build_ivf_state_q` (+ `ivf_increment_q` when
    ``train_pred`` is given: Lloyd's trains on the history subset
    ONLY, the full corpus assigns at those frozen centroids — exactly
    what build-then-increment produces) + `ivf_state_query_q`: the
    unrolled Lloyd's chain, full-precision cluster argmax, the SAME
    floor-half-up int8 quantization of state and queries, the
    integer-dot qcos candidate ranking with ``k·overfetch``
    over-fetch, and the exact-cosine rescore top-k.  Every division
    input on the quantized path is integer-derived, so the two
    engines rank identically — a quantization or over-fetch bug
    hash-mismatches."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    train = (
        f"(SELECT * FROM {table} WHERE {train_pred})"
        if train_pred else table
    )
    ctes = kmeans_ctes(train, kmeans_k, kmeans_iters, id_col, vec_col)
    cent = f"cent{kmeans_iters}"
    body = ",\n".join(ctes)
    qdot_ss = _duck_qdot("qa.qvec", "s.qvec")
    return f"""
WITH {body},
assigned AS MATERIALIZED (
  SELECT {id_col}, {vec_col}, centroid_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM {table} e, {cent} c
  ) WHERE rn = 1
),
qstate AS MATERIALIZED (
  SELECT {id_col} AS vec_id, centroid_id, qvec,
         sqrt(CAST({_duck_qdot('qvec', 'qvec')} AS DOUBLE)) AS qnorm
  FROM (
    SELECT {id_col}, centroid_id,
           {_duck_qvec(vec_col, _duck_scale(vec_col))} AS qvec
    FROM assigned
  )
),
q AS (
  SELECT {id_col} AS query_id, {vec_col} AS query_vec
  FROM {table} WHERE {query_pred}
),
qq AS MATERIALIZED (
  SELECT query_id, query_vec, qvec,
         sqrt(CAST({_duck_qdot('qvec', 'qvec')} AS DOUBLE)) AS qnorm
  FROM (
    SELECT query_id, query_vec,
           {_duck_qvec('query_vec', _duck_scale('query_vec'))} AS qvec
    FROM q
  )
),
probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cos('q.query_vec', 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM q, {cent} c
  ) WHERE rn <= {int(n_probe)}
),
cand AS (
  SELECT p.query_id, s.vec_id,
         round(CAST({qdot_ss} AS DOUBLE)
               / nullif(qa.qnorm * s.qnorm, 0.0), 6) AS qcos
  FROM probe p
  JOIN qq qa USING (query_id)
  JOIN qstate s USING (centroid_id)
),
winners AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY qcos DESC, vec_id ASC) AS rn
    FROM cand
  ) WHERE rn <= {int(k) * int(overfetch)}
),
rescored AS (
  SELECT w.query_id, w.vec_id,
         {_duck_cos('e.' + vec_col, 'qy.query_vec')} AS cosine
  FROM winners w
  JOIN {table} e ON e.{id_col} = w.vec_id
  JOIN q qy ON qy.query_id = w.query_id
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM rescored
) WHERE rank <= {int(k)}
"""
