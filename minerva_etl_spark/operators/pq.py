"""Trained product quantization (IVF-PQ) — the 10–50× ANN-state
compression step past int8 (round 12; the r11 verdict's ask 5).

`operators/quantize.py`'s scalar int8 state stores one byte per
DIMENSION; product quantization (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011) stores one byte
per SUBSPACE: the vector is split into ``m`` contiguous sub-vectors,
each sub-vector is k-means-quantized against its own trained codebook
of ``pq_k`` codewords, and the persisted payload is the ``m``-byte
code word plus one reconstruction norm.  At 768 dims with m=48 that is
~16× smaller than int8, ~64× smaller than float32 — the step that
makes a billion-vector state fit a modest cluster.

Everything here keeps the repo's oracle discipline — the full
fit→encode→query cycle hash-matches a DuckDB replay:

* **Codebook training** is Lloyd's per subspace under squared-L2 (the
  published PQ objective), run as ONE DataFrame loop over the exploded
  ``(vec_id, subspace, subvec)`` table: per iteration one broadcast
  join on ``subspace`` (m·pq_k codeword rows — tiny), one
  ``row_number`` argmin, one map-side-combinable groupBy.  m never
  multiplies the number of Spark jobs.  The centroid update reuses
  `kmeans.py`'s exact-arithmetic discipline (elements snapped to a
  6-dp integer grid, summed as BIGINT, mean via two pinned IEEE
  divisions) so codebooks are bit-identical across engines; the L2
  argmin ranks by ``round(|c|² − 2·x·c, 6)`` with code-id tie-break —
  |x|² is constant per x and drops out.
* **Encoding** stores ``(vec_id, centroid_id, codes array<tinyint>,
  rnorm_grid bigint)`` where ``rnorm_grid`` is the exact integer sum
  of the chosen codewords' grid-snapped squared norms — so the
  reconstruction norm needs no float re-fold at query time and no
  order-dependent float sum ever happens.
* **ADC scoring** (asymmetric distance computation, the PQ serving
  trick): per query batch, a lookup table of grid-snapped
  ``dot(query_subvec, codeword)`` values — ``n_queries·m·pq_k`` rows,
  broadcastable — is folded into one ``array<array<bigint>>`` per
  query; each candidate's approximate dot is then ONE codegen
  expression (``aggregate(zip_with(codes, lut, element_at))`` — an
  exact BIGINT sum, no join explosion, no float nondeterminism), and
  the approximate cosine divides by the stored reconstruction norm.
* **Retrieval** keeps `quantize.ivf_state_query_q`'s shape: coarse
  IVF probe (full-precision centroids, broadcast) → candidate
  equi-join on ``centroid_id`` moving only m-byte codes → ADC rank →
  over-fetch ``k·overfetch`` → join the winner sliver back to the
  full-precision source by id → exact top-k.  Recall parity with the
  exact path at the documented over-fetch is pytest-pinned
  (tests/test_pq.py).

Reference parity note: the reference engine has no ANN surface; this
module extends the LLM-pipeline arc (`similarity.py`, `quantize.py`,
`incremental.py`) per the published IVFADC recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minerva_etl_spark.operators.incremental import _state_lease
from minerva_etl_spark.operators.similarity import (
    _dot_fold_spark,
    cosine_from_norms_expr,
    norm_expr,
    probe_nearest_centroids,
)

__all__ = [
    "pq_fit",
    "pq_encode",
    "build_ivf_pq_state",
    "ivf_pq_increment",
    "ivf_pq_state_query",
    "ivf_tpq_oracle_sql",
]

#: 6-dp integer grid shared with `kmeans.py` — exact BIGINT sums.
_GRID = 1_000_000.0


def _subspace_explode(
    df: DataFrame,
    m: int,
    d_sub: int,
    id_col: str,
    vec_col: str,
    out_id: str | None = None,
) -> DataFrame:
    """``(id, subspace, subvec)`` — one row per (vector, subspace).
    The slice is contiguous: subspace j owns dims [j·d_sub, (j+1)·d_sub).
    A sequence-explode + slice in one codegen projection; no shuffle."""
    out_id = out_id or id_col
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        F.col(vec_col),
    ).select(
        out_id,
        "subspace",
        F.expr(
            f"slice(CAST({vec_col} AS ARRAY<DOUBLE>), "
            f"subspace * {d_sub} + 1, {d_sub})"
        ).alias("subvec"),
    )


def _csq_sql(c: str) -> str:
    # squared norm of a codeword — double fold, identical in DuckDB
    return _dot_fold_spark(c, c)


def _l2_rank_col(subvec: str, cvec: str) -> F.Column:
    """The deterministic L2 ranking score: ``round(|c|² − 2·x·c, 6)``
    ascending (|x|² is constant within a (vector, subspace) group and
    cannot change the argmin).  Rounded BEFORE ranking, code-id
    tie-break at the call site — the `assign_centroids` discipline
    under the PQ metric."""
    return F.expr(
        f"round({_csq_sql(cvec)} - 2.0d * "
        f"{_dot_fold_spark(subvec, cvec)}, 6)"
    )


def _assign_codes(
    sub: DataFrame, codebooks: DataFrame, id_col: str
) -> DataFrame:
    """Nearest codeword per (vector, subspace): the per-subspace
    codebook collapses into ONE broadcast row per subspace holding a
    code_id-sorted struct array, the equi-join on ``subspace`` stays
    1:1 (no pq_k row multiplication), and each row folds over its
    codeword array keeping the L2 argmin (r16; the `assign_centroids`
    fold shape).  Reproduces the pre-r16 row_number window's
    (__d ASC NULLS FIRST, code_id ASC) winner exactly: scores use the
    identical round(|c|²−2·x·c, 6) doubles (|c|² now folded once per
    codeword instead of once per pair), ties keep the lower code id,
    and a NULL score ranks first as under ASC ordering.  Removes the
    Exchange+Sort that shuffled pq_k copies of every subvector.
    Returns ``(id, subspace, subvec, code_id)``."""
    cid_t = codebooks.schema["code_id"].dataType.simpleString()
    cb_arr = (
        codebooks.select(
            "subspace",
            F.col("code_id").alias("cid"),
            F.col("cvec").cast("array<double>").alias("cvec"),
        )
        .withColumn("csq", F.expr(_csq_sql("cvec")))
        .groupBy("subspace")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "cvec", "csq"))
            ).alias("__codes")
        )
    )
    pair_d = (
        f"round(c.csq - 2.0d * "
        f"{_dot_fold_spark('subvec', 'c.cvec')}, 6)"
    )
    best = (
        f"aggregate("
        f"transform(__codes, c -> named_struct("
        f"'cid', c.cid, 'd', {pair_d})), "
        f"CAST(NULL AS STRUCT<cid: {cid_t}, d: DOUBLE>), "
        f"(best, c) -> CASE "
        f"WHEN best IS NULL THEN c "
        f"WHEN best.d IS NOT NULL AND "
        f"(c.d IS NULL OR c.d < best.d) THEN c "
        f"ELSE best END)"
    )
    return (
        sub.join(F.broadcast(cb_arr), "subspace")
        .withColumn("__best", F.expr(best))
        .filter(F.col("__best").isNotNull())
        .select(
            id_col,
            "subspace",
            "subvec",
            F.col("__best.cid").alias("code_id"),
        )
    )


def _update_codebooks(
    assigned: DataFrame, prev: DataFrame
) -> DataFrame:
    """Exact-arithmetic per-(subspace, code) mean — `kmeans.py`'s
    grid-snap discipline keyed by the composite (subspace, code_id);
    codes that lost every member keep their previous codeword."""
    ex = assigned.select(
        "subspace",
        "code_id",
        F.posexplode("subvec").alias("__pos", "__el"),
    )
    sums = ex.select(
        "subspace",
        "code_id",
        "__pos",
        F.floor(F.round(F.col("__el"), 6) * F.lit(_GRID) + F.lit(0.5))
        .cast("bigint")
        .alias("__s"),
    ).groupBy("subspace", "code_id", "__pos").agg(
        F.sum("__s").alias("__sum"), F.count(F.lit(1)).alias("__n")
    )
    mean = (F.col("__sum").cast("double") / F.lit(_GRID)) / F.col(
        "__n"
    ).cast("double")
    fresh = (
        sums.select("subspace", "code_id", "__pos", mean.alias("__el"))
        .groupBy("subspace", "code_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__el"))),
                lambda s: s["__el"],
            ).alias("__cvec")
        )
    )
    return (
        prev.select("subspace", "code_id", F.col("cvec").alias("__prev"))
        .join(fresh, ["subspace", "code_id"], "left")
        .select(
            "subspace",
            "code_id",
            F.coalesce("__cvec", "__prev").alias("cvec"),
        )
    )


def pq_fit(
    embeddings: DataFrame,
    m: int,
    d_sub: int,
    pq_k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the ``m × pq_k`` codebook table: seed each subspace from
    the ``pq_k`` lowest-id vectors' sub-vectors (code_id = 0-based
    seed rank — deterministic, mirrored by the oracle), then run
    ``iters`` assign→update Lloyd's rounds over ALL subspaces at once.
    Returns ``(subspace, code_id, cvec, csq_grid)`` where ``csq_grid``
    is the grid-snapped squared norm used for exact reconstruction-norm
    sums."""
    if not 2 <= int(pq_k) <= 128:
        raise ValueError(
            f"pq_k must be in [2, 128] (codes persist as signed "
            f"tinyint); got {pq_k}"
        )
    sub = _subspace_explode(embeddings, m, d_sub, id_col, vec_col)
    w_seed = Window.partitionBy("subspace").orderBy(F.col(id_col).asc())
    cb = (
        sub.withColumn("__rn", F.row_number().over(w_seed))
        .filter(F.col("__rn") <= pq_k)
        .select(
            "subspace",
            (F.col("__rn") - 1).cast("bigint").alias("code_id"),
            F.col("subvec").alias("cvec"),
        )
        .localCheckpoint(eager=True)  # m·pq_k rows — tiny
    )
    for _ in range(iters):
        assigned = _assign_codes(sub, cb, id_col)
        cb = _update_codebooks(assigned, cb).localCheckpoint(eager=True)
    return cb.withColumn(
        "csq_grid",
        F.expr(
            f"CAST(floor(round({_csq_sql('cvec')}, 6) * {_GRID} + 0.5d) "
            f"AS BIGINT)"
        ),
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int,
    d_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector against trained codebooks: nearest codeword
    per subspace, collected into an ``m``-byte ``codes`` word plus the
    exact integer reconstruction-norm ``rnorm_grid = Σ csq_grid`` —
    the full persisted PQ payload.  Returns
    ``(id, codes array<tinyint>, rnorm_grid bigint)``."""
    sub = _subspace_explode(embeddings, m, d_sub, id_col, vec_col)
    assigned = _assign_codes(sub, codebooks, id_col).join(
        F.broadcast(codebooks.select("subspace", "code_id", "csq_grid")),
        ["subspace", "code_id"],
    )
    return assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "code_id"))),
            lambda s: s["code_id"].cast("tinyint"),
        ).alias("codes"),
        F.sum("csq_grid").alias("rnorm_grid"),
    )


def _paths(state_path: str) -> tuple[str, str, str, str]:
    root = state_path.rstrip("/")
    return (
        root + "/centroids",
        root + "/codebooks",
        root + "/assigned_pq",
        root + "/meta",
    )


def build_ivf_pq_state(
    spark: SparkSession,
    embeddings: DataFrame,
    state_path: str,
    coarse_k: int = 4,
    coarse_iters: int = 2,
    m: int = 4,
    pq_k: int = 8,
    pq_iters: int = 2,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + persist the IVF-PQ state: full-precision coarse centroids
    (cosine Lloyd's, `kmeans.kmeans_fit` — the same coarse partitioner
    as every other IVF state) and per-subspace PQ codebooks, with the
    per-vector assignment storing ONLY ``(id, centroid_id, codes,
    rnorm_grid)`` — m bytes of payload per vector.  Returns the
    persisted assignment."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import assign_centroids

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    cent_p, cb_p, asg_p, meta_p = _paths(state_path)
    with _state_lease(spark, state_path):
        _seed, cent = kmeans_fit(
            embeddings, k=coarse_k, iters=coarse_iters,
            id_col=id_col, vec_col=vec_col,
        )
        cb = pq_fit(
            embeddings, m, d_sub, pq_k, iters=pq_iters,
            id_col=id_col, vec_col=vec_col,
        ).localCheckpoint(eager=True)
        coarse = assign_centroids(
            embeddings, cent, id_col=id_col, vec_col=vec_col
        ).select(id_col, "centroid_id")
        codes = pq_encode(
            embeddings, cb, m, d_sub, id_col=id_col, vec_col=vec_col
        )
        cent.write.mode("overwrite").parquet(cent_p)
        cb.write.mode("overwrite").parquet(cb_p)
        coarse.join(codes, id_col).write.mode("overwrite").parquet(asg_p)
        n = spark.read.parquet(asg_p).count()
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p,
            "n_at_fit bigint, n_total bigint, m int, d_sub int",
            (n, n, m, d_sub),
        )
    return spark.read.parquet(asg_p)


def ivf_pq_increment(
    spark: SparkSession,
    new_embeddings: DataFrame,
    state_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One delivery against the trained-PQ state: coarse-assign ONLY
    the delta at the frozen persisted centroids and PQ-encode it at
    the frozen persisted codebooks — history payloads never rescanned,
    so a delivery costs O(delta) regardless of state size (the
    `incremental.ivf_increment` protocol, inherited by the m-byte
    payload).  Delta-assign + delta-encode at frozen parameters == the
    full recompute at those parameters, so the oracle replays the
    whole build→increment cycle closed-form (`ivf_tpq_oracle_sql` with
    ``train_pred``).  The lease spans read-state → assign/encode →
    append.  Returns the delta's state rows."""
    from minerva_etl_spark.operators.similarity import assign_centroids

    cent_p, cb_p, asg_p, meta_p = _paths(state_path)
    with _state_lease(spark, state_path):
        cent = spark.read.parquet(cent_p)
        cb = spark.read.parquet(cb_p)
        meta = spark.read.parquet(meta_p).collect()[0]  # one row
        m, d_sub = int(meta.m), int(meta.d_sub)
        coarse = assign_centroids(
            new_embeddings, cent, id_col=id_col, vec_col=vec_col
        ).select(id_col, "centroid_id")
        codes = pq_encode(
            new_embeddings, cb, m, d_sub, id_col=id_col, vec_col=vec_col
        )
        delta = coarse.join(codes, id_col).localCheckpoint(
            eager=True
        )  # pinned before state mutates
        n_delta = delta.count()
        delta.write.mode("append").parquet(asg_p)
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p,
            "n_at_fit bigint, n_total bigint, m int, d_sub int",
            (meta.n_at_fit, meta.n_total + n_delta, m, d_sub),
        )
    return delta


def _query_lut(
    queries_sub: DataFrame,
    codebooks: DataFrame,
    query_id_col: str,
) -> DataFrame:
    """Per-query ADC lookup table folded to ONE row per query:
    ``lut array<array<bigint>>`` (outer index = subspace, inner =
    code_id) of grid-snapped ``dot(query_subvec, codeword)`` values.
    ``n_queries · m · pq_k`` intermediate rows — broadcastable for any
    realistic query batch."""
    dots = queries_sub.join(
        F.broadcast(codebooks.select("subspace", "code_id", "cvec")),
        "subspace",
    ).select(
        query_id_col,
        "subspace",
        "code_id",
        F.expr(
            f"CAST(floor(round({_dot_fold_spark('subvec', 'cvec')}, 6) "
            f"* {_GRID} + 0.5d) AS BIGINT)"
        ).alias("dot_grid"),
    )
    per_sub = dots.groupBy(query_id_col, "subspace").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("code_id", "dot_grid"))),
            lambda s: s["dot_grid"],
        ).alias("__lrow")
    )
    return per_sub.groupBy(query_id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("subspace", "__lrow"))),
            lambda s: s["__lrow"],
        ).alias("lut")
    )


#: candidate ADC score: exact BIGINT fold of LUT entries selected by the
#: candidate's code word — one codegen expression, no per-candidate join.
_ADC_FOLD = (
    "aggregate(zip_with(codes, lut, (c, l) -> "
    "element_at(l, CAST(c AS INT) + 1)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def ivf_pq_state_query(
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
    """IVFADC retrieval: coarse probe (broadcast centroids) → candidate
    equi-join on ``centroid_id`` moving only m-byte codes → ADC rank
    (exact BIGINT LUT fold / stored reconstruction norm) → over-fetch
    ``k·overfetch`` per query → exact-cosine rescore against the
    full-precision source by id → exact top-k.

    At scale: the LUT build touches ``n_queries·m·pq_k`` rows and
    broadcasts one array-row per query; the candidate join moves ~m
    bytes per corpus row in the probed clusters (the whole point); the
    rescore join touches ``n_queries·k·overfetch`` ids.  Per-query
    windows run through `cap_per_key`'s two-level salted shape."""
    from minerva_etl_spark.operators.skew import cap_per_key

    cent_p, cb_p, asg_p, meta_p = _paths(state_path)
    centroids = spark.read.parquet(cent_p)
    codebooks = spark.read.parquet(cb_p)
    assigned = spark.read.parquet(asg_p)
    meta = spark.read.parquet(meta_p).collect()[0]  # one row
    m, d_sub = int(meta.m), int(meta.d_sub)

    q = queries.select(query_id_col, query_vec_col).withColumn(
        "__qnorm", norm_expr(query_vec_col)
    )
    # fold-based probe choice over one broadcast centroid-array row —
    # same winners as the pre-r16 crossJoin+window, zero query shuffle
    # (r16; see similarity.probe_nearest_centroids)
    probes = probe_nearest_centroids(
        q, centroids, n_probe, query_vec_col
    ).select(query_id_col, "centroid_id", "__qnorm")
    lut = _query_lut(
        _subspace_explode(q, m, d_sub, query_id_col, query_vec_col),
        codebooks,
        query_id_col,
    ).join(q.select(query_id_col, "__qnorm"), query_id_col)
    cand = (
        probes.select(query_id_col, "centroid_id")
        .join(assigned, "centroid_id")
        .join(F.broadcast(lut), query_id_col)
        .select(
            query_id_col,
            F.col(id_col),
            F.expr(
                f"round((CAST({_ADC_FOLD} AS DOUBLE) / {_GRID}) / "
                f"nullif(__qnorm * sqrt(CAST(rnorm_grid AS DOUBLE) "
                f"/ {_GRID}), 0.0d), 6)"
            ).alias("adc"),
        )
    )
    winners = cap_per_key(
        cand,
        keys=[query_id_col],
        order_by=[F.col("adc").desc(), F.col(id_col).asc()],
        n=int(k) * int(overfetch),
        salt_col=id_col,
        salt_buckets=salt_buckets,
    ).select(query_id_col, id_col)
    exact = (
        winners.join(
            q.select(query_id_col, query_vec_col, "__qnorm"),
            query_id_col,
        )
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
                "__srcvec", query_vec_col, "__snorm", "__qnorm"
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


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])), p -> p[1] * p[2])), "
        f"(acc, v) -> acc + v)"
    )


def _duck_l2_rank(subvec: str, cvec: str) -> str:
    return (
        f"round({_duck_dot(cvec, cvec)} - 2.0 * "
        f"{_duck_dot(subvec, cvec)}, 6)"
    )


def _pq_ctes(
    train: str,
    full: str,
    m: int,
    d_sub: int,
    pq_k: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> list[str]:
    """The unrolled PQ training chain: subspace explode → seed →
    ``iters`` L2 assign/update rounds → encode of the FULL corpus at
    the trained codebooks (codes word + exact integer reconstruction
    norm).  Mirrors `pq_fit` + `pq_encode` expression for expression."""
    ctes = [
        f"""sub AS MATERIALIZED (
  SELECT {id_col} AS vec_id, gs.j AS subspace,
         list_slice(CAST({vec_col} AS DOUBLE[]),
                    gs.j * {d_sub} + 1, gs.j * {d_sub} + {d_sub}) AS subvec
  FROM {train}
  CROSS JOIN UNNEST(generate_series(0, {m - 1})) AS gs(j)
)""",
        f"""subfull AS MATERIALIZED (
  SELECT {id_col} AS vec_id, gs.j AS subspace,
         list_slice(CAST({vec_col} AS DOUBLE[]),
                    gs.j * {d_sub} + 1, gs.j * {d_sub} + {d_sub}) AS subvec
  FROM {full}
  CROSS JOIN UNNEST(generate_series(0, {m - 1})) AS gs(j)
)""",
        f"""pq0 AS (
  SELECT subspace, CAST(rn - 1 AS BIGINT) AS code_id, subvec AS cvec
  FROM (
    SELECT subspace, subvec,
           row_number() OVER (
             PARTITION BY subspace ORDER BY vec_id ASC) AS rn
    FROM sub
  ) WHERE rn <= {pq_k}
)""",
    ]
    for t in range(iters):
        ctes.append(
            f"""pqassign{t} AS (
  SELECT vec_id, subspace, subvec, code_id FROM (
    SELECT s.vec_id, s.subspace, s.subvec, c.code_id,
           row_number() OVER (
             PARTITION BY s.vec_id, s.subspace
             ORDER BY {_duck_l2_rank('s.subvec', 'c.cvec')} ASC,
                      c.code_id ASC) AS rn
    FROM sub s JOIN pq{t} c USING (subspace)
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""pq{t + 1} AS MATERIALIZED (
  SELECT p.subspace, p.code_id, coalesce(f.cvec, p.cvec) AS cvec
  FROM pq{t} p LEFT JOIN (
    SELECT subspace, code_id, list(el ORDER BY pos) AS cvec FROM (
      SELECT subspace, code_id, pos,
             (CAST(sum(s) AS DOUBLE) / 1000000.0)
               / CAST(count(*) AS DOUBLE) AS el
      FROM (
        SELECT a.subspace, a.code_id, gs.i AS pos,
               CAST(floor(round(a.subvec[gs.i], 6)
                          * 1000000.0 + 0.5) AS BIGINT) AS s
        FROM pqassign{t} a
        CROSS JOIN UNNEST(generate_series(1, len(a.subvec))) AS gs(i)
      ) GROUP BY subspace, code_id, pos
    ) GROUP BY subspace, code_id
  ) f ON p.subspace = f.subspace AND p.code_id = f.code_id
)"""
        )
    ctes.append(
        f"""codebook AS MATERIALIZED (
  SELECT subspace, code_id, cvec,
         CAST(floor(round({_duck_dot('cvec', 'cvec')}, 6)
                    * 1000000.0 + 0.5) AS BIGINT) AS csq_grid
  FROM pq{iters}
)"""
    )
    ctes.append(
        """encoded AS MATERIALIZED (
  SELECT vec_id, list(code_id ORDER BY subspace) AS codes,
         sum(csq_grid) AS rnorm_grid
  FROM (
    SELECT vec_id, subspace, code_id, csq_grid FROM (
      SELECT s.vec_id, s.subspace, c.code_id, c.csq_grid,
             row_number() OVER (
               PARTITION BY s.vec_id, s.subspace
               ORDER BY """
        + _duck_l2_rank("s.subvec", "c.cvec")
        + """ ASC,
                        c.code_id ASC) AS rn
      FROM subfull s JOIN codebook c USING (subspace)
    ) WHERE rn = 1
  ) GROUP BY vec_id
)"""
    )
    return ctes


def ivf_tpq_oracle_sql(
    coarse_k: int,
    coarse_iters: int,
    m: int,
    d_sub: int,
    pq_k: int,
    pq_iters: int,
    query_pred: str,
    k: int = 5,
    n_probe: int = 3,
    overfetch: int = 4,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_pred: str | None = None,
) -> str:
    """DuckDB twin of `build_ivf_pq_state` + `ivf_pq_state_query`: the
    coarse cosine Lloyd's chain (shared with every IVF oracle), the
    per-subspace L2 Lloyd's chain, the grid-snapped encode, the ADC
    LUT with exact BIGINT candidate sums, the ``k·overfetch``
    over-fetch, and the exact-cosine rescore top-k.  Every candidate
    ranking input is integer-derived or a pinned IEEE fold, so both
    engines rank identically — a codebook, encode, or LUT bug
    hash-mismatches."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    train = (
        f"(SELECT * FROM {table} WHERE {train_pred})"
        if train_pred else table
    )
    ctes = kmeans_ctes(train, coarse_k, coarse_iters, id_col, vec_col)
    cent = f"cent{coarse_iters}"
    ctes.append(
        f"""coarse AS MATERIALIZED (
  SELECT {id_col} AS vec_id, centroid_id FROM (
    SELECT e.{id_col}, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM {table} e, {cent} c
  ) WHERE rn = 1
)"""
    )
    ctes += _pq_ctes(
        train, table, m, d_sub, pq_k, pq_iters, id_col, vec_col
    )
    ctes.append(
        f"""q AS (
  SELECT {id_col} AS query_id, CAST({vec_col} AS DOUBLE[]) AS query_vec,
         sqrt({_duck_dot(vec_col, vec_col)}) AS qnorm
  FROM {table} WHERE {query_pred}
)"""
    )
    ctes.append(
        f"""qsub AS (
  SELECT query_id, gs.j AS subspace,
         list_slice(query_vec, gs.j * {d_sub} + 1,
                    gs.j * {d_sub} + {d_sub}) AS subvec
  FROM q CROSS JOIN UNNEST(generate_series(0, {m - 1})) AS gs(j)
)"""
    )
    ctes.append(
        f"""lut AS MATERIALIZED (
  SELECT s.query_id, s.subspace, c.code_id,
         CAST(floor(round({_duck_dot('s.subvec', 'c.cvec')}, 6)
                    * 1000000.0 + 0.5) AS BIGINT) AS dot_grid
  FROM qsub s JOIN codebook c USING (subspace)
)"""
    )
    ctes.append(
        f"""probe AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cos('q.query_vec', 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM q, {cent} c
  ) WHERE rn <= {int(n_probe)}
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body},
cand AS (
  SELECT x.query_id, x.vec_id,
         round((CAST(sum(l.dot_grid) AS DOUBLE) / 1000000.0)
               / nullif(any_value(x.qnorm)
                        * sqrt(CAST(any_value(x.rnorm_grid) AS DOUBLE)
                               / 1000000.0), 0.0), 6) AS adc
  FROM (
    SELECT p.query_id, e.vec_id, e.rnorm_grid, qy.qnorm,
           gs.j AS subspace, e.codes[gs.j + 1] AS code_id
    FROM probe p
    JOIN coarse a USING (centroid_id)
    JOIN encoded e ON e.vec_id = a.vec_id
    JOIN q qy ON qy.query_id = p.query_id
    CROSS JOIN UNNEST(generate_series(0, {m - 1})) AS gs(j)
  ) x
  JOIN lut l ON l.query_id = x.query_id
            AND l.subspace = x.subspace AND l.code_id = x.code_id
  GROUP BY x.query_id, x.vec_id
),
winners AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY adc DESC, vec_id ASC) AS rn
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
