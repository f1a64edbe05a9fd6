"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a single narrow projection plus a
top-k, the right plan when the query set is small (query vectors are
broadcast as literals / a broadcast dim).  Scale path: LSH sign-bucket
index (deterministic md5-derived hyperplane surrogate) that prunes the
candidate set before exact scoring — the 100 TB posture is "bucket join
instead of cross join".

Parity design: all dot products are computed by an explicit left-to-right
``aggregate`` fold over the array after elementwise cast to double —
deterministic order, identical in DuckDB via ``list_``/unnest-free
folds — and cosine is rounded to 6 dp *before* ranking so rank
boundaries agree across engines (tie-broken by id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot_fold_spark(a: str, b: str) -> str:
    """Deterministic sequential dot-product fold (Spark SQL)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_fold_spark(a: str) -> str:
    return f"sqrt({_dot_fold_spark(a, a)})"


def cosine_expr(a: str, b: str) -> F.Column:
    # nullif: a zero-norm vector yields NULL cosine (ranks last under
    # DESC in both engines, fails every >= threshold) instead of an
    # ANSI DIVIDE_BY_ZERO crash — cosine is total over any corpus.
    return F.expr(
        f"round({_dot_fold_spark(a, b)} / nullif({_norm_fold_spark(a)} * "
        f"{_norm_fold_spark(b)}, 0.0), 6)"
    )


def norm_expr(a: str) -> F.Column:
    """The norm sub-expression of ``cosine_expr``, exposed so hot pair
    loops can precompute it once per ROW instead of once per PAIR."""
    return F.expr(_norm_fold_spark(a))


def cosine_from_norms_expr(a: str, b: str, na: str, nb: str) -> F.Column:
    """``cosine_expr`` with both norms read from precomputed columns.

    Bit-identical to ``cosine_expr``: the norm columns hold the exact
    same ``sqrt(fold)`` doubles, and the division/round sequence is
    unchanged — so oracle parity is preserved while a K-way or pairwise
    join stops re-folding each operand's norm per candidate (≈3× less
    fold work: one dot instead of dot + two norms)."""
    return F.expr(f"round({_dot_fold_spark(a, b)} / nullif({na} * {nb}, 0.0), 6)")


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine against one literal query vector.

    Plan: scan → per-row fold (codegen'd, no shuffle) → global top-k
    (TakeOrderedAndProject — no full sort at scale).
    """
    qlit = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in query_vec) + ")"
    df = embeddings
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    scored = df.select(
        F.col(id_col),
        cosine_expr(vec_col, qlit).alias("cosine"),
    )
    return (
        scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
    )


def brute_force_topk_oracle_sql(
    table: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> str:
    """DuckDB oracle: same fold order via list_reduce on the product list."""
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in query_vec) + "]"
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip(CAST({vec_col} AS DOUBLE[]), {qlit}), "
        f"p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    norm_a = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(CAST({vec_col} AS DOUBLE[]), x -> x * x)), "
        f"(acc, v) -> acc + v))"
    )
    norm_q = (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({qlit}, x -> x * x)), (acc, v) -> acc + v))"
    )
    where = f"WHERE {id_col} <> {exclude_id}" if exclude_id is not None else ""
    return f"""
SELECT {id_col}, round({dot} / nullif({norm_a} * {norm_q}, 0.0), 6) AS cosine
FROM {table}
{where}
ORDER BY cosine DESC, {id_col} ASC
LIMIT {k}
"""


def knn_join_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Top-k neighbors for each of a (small, broadcast) query set.

    Broadcast-nested-loop over queries × corpus with per-row folds, then
    window top-k per query.  For large query sets use
    :func:`lsh_bucket_candidates` first.
    """
    q = F.broadcast(
        queries.select(query_id_col, query_vec_col).withColumn(
            "__qnorm", norm_expr(query_vec_col)
        )
    )
    scored = (
        embeddings.withColumn("__enorm", norm_expr(vec_col))
        .crossJoin(q)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            cosine_from_norms_expr(
                vec_col, query_vec_col, "__enorm", "__qnorm"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 5,
):
    """IVF (inverted-file) ANN index: k-means centroids + per-vector
    cluster assignment.

    Returns (assigned_df, centroids) where ``assigned_df`` carries a
    ``centroid_id`` column and ``centroids`` is the (small, driver-side)
    list of centroid vectors.  Search = score query against centroids
    (driver-side, tiny), then exact-rescore only the nearest
    ``n_probe`` clusters — the classic corpus-pruning scale path,
    complementary to :func:`lsh_sign_bucket`.

    Uses MLlib KMeans (seeded, deterministic given a seed + data order);
    being iterative it has no SQL oracle — callers verify by recall
    against brute force (see tests).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features"),
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="__features"
    ).fit(feats)
    assigned = model.transform(feats).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("prediction").alias("centroid_id"),
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search an IVF index: pick the ``n_probe`` nearest centroids
    (driver-side — centroids are tiny), filter to those clusters
    (partition-prunable at scale), exact cosine rescore, top-k."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    probes = sorted(
        range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec)
    )[:n_probe]
    qlit = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in query_vec) + ")"
    scored = assigned.filter(F.col("centroid_id").isin(probes)).select(
        F.col(id_col), cosine_expr(vec_col, qlit).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def ivf_join(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
    salt_buckets: int = 16,
) -> DataFrame:
    """Batched IVF k-NN join — corpus-vs-corpus retrieval where BOTH
    sides are DataFrames (the gap `knn_join_topk`'s broadcast query set
    and `ivf_search`'s single literal query leave open).

    Each query picks its ``n_probe`` nearest centroids (broadcast
    centroid table, per-query window bounded by K rows), probe
    assignments equi-join the corpus's cluster assignment on
    ``centroid_id`` (never a cross join), candidates rescore with
    exact rounded cosine, and the per-query top-``k`` runs through
    `cap_per_key`'s two-level salted WindowGroupLimit shape — a query
    probing a giant skewed cluster sorts its candidates in
    ``salt_buckets`` parallel spillable tasks, not one.

    ``assigned`` must carry ``(id, vec, centroid_id)`` (from
    `assign_centroids`); each corpus vector has exactly ONE cluster, so
    (query, doc) candidate pairs are unique by construction — no
    dedup step.  Returns ``(query_id, id, cosine, rank)``.
    """
    from minerva_etl_spark.operators.skew import cap_per_key

    probes = probe_nearest_centroids(
        queries.select(query_id_col, query_vec_col).withColumn(
            "__qnorm", norm_expr(query_vec_col)
        ),
        centroids,
        n_probe,
        query_vec_col,
        centroid_id_col,
        centroid_vec_col,
    )
    cand = probes.join(
        assigned.select(
            F.col(id_col),
            F.col(vec_col),
            F.col(centroid_id_col),
        ).withColumn("__enorm", norm_expr(vec_col)),
        centroid_id_col,
    ).select(
        query_id_col,
        F.col(id_col),
        cosine_from_norms_expr(
            vec_col, query_vec_col, "__enorm", "__qnorm"
        ).alias("cosine"),
    )
    return cap_per_key(
        cand,
        keys=[query_id_col],
        order_by=[F.col("cosine").desc(), F.col(id_col).asc()],
        n=k,
        salt_col=id_col,
        salt_buckets=salt_buckets,
    )


def ivf_join_oracle_sql(
    kmeans_k: int,
    kmeans_iters: int,
    query_pred: str,
    k: int = 5,
    n_probe: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of `kmeans_fit` + `assign_centroids` + `ivf_join`:
    the unrolled Lloyd's CTE chain, the rounded-cosine cluster argmax,
    per-query probe ranking, candidate equi-join, and the plain
    single-window top-k that `cap_per_key` is provably equal to."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    ctes = kmeans_ctes(table, kmeans_k, kmeans_iters, id_col, vec_col)
    cent = f"cent{kmeans_iters}"
    body = ",\n".join(ctes)
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
q AS (
  SELECT {id_col} AS query_id, {vec_col} AS query_vec
  FROM {table} WHERE {query_pred}
),
probe AS (
  SELECT query_id, query_vec, centroid_id FROM (
    SELECT q.query_id, q.query_vec, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_duck_cos('q.query_vec', 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM q, {cent} c
  ) WHERE rn <= {int(n_probe)}
),
cand AS (
  SELECT p.query_id, a.{id_col},
         {_duck_cos('a.' + vec_col, 'p.query_vec')} AS cosine
  FROM probe p JOIN assigned a USING (centroid_id)
)
SELECT query_id, {id_col}, cosine, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, {id_col}, cosine,
         row_number() OVER (
           PARTITION BY query_id
           ORDER BY cosine DESC, {id_col} ASC) AS rank
  FROM cand
) WHERE rank <= {int(k)}
"""


def _centroid_array(
    centroids: DataFrame, centroid_id_col: str, centroid_vec_col: str
) -> DataFrame:
    """ONE row holding the centroid table as a cid-sorted array of
    ``(cid, cvec, cn)`` structs — the broadcast operand of the
    fold-based nearest/probe selections below (r16).  The norm is
    folded once per centroid here, exactly as the per-column
    ``__cnorm`` of the pre-r16 crossJoin shape."""
    return (
        centroids.select(
            F.col(centroid_id_col).alias("cid"),
            F.col(centroid_vec_col).cast("array<double>").alias("cvec"),
        )
        .withColumn("cn", norm_expr("cvec"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "cvec", "cn"))
            ).alias("__cents")
        )
    )


def probe_nearest_centroids(
    q: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    query_vec_col: str,
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
) -> DataFrame:
    """Per-query ``n_probe`` nearest-centroid choice folded over ONE
    broadcast centroid-array row (r16; the `assign_centroids` shape) —
    shared by `ivf_join` and the PQ / int8 search probes.  ``q`` must
    already carry a ``__qnorm`` column; the result is ``q``'s columns
    plus ``centroid_id_col``, one row per (query, probed centroid).

    The per-row array_sort comparator reproduces the pre-r16
    row_number window's (cosine DESC NULLS LAST, centroid_id ASC)
    order exactly — same rounded-cosine doubles — and
    ``slice(…, n_probe)`` the ``__rn <= n_probe`` filter, without the
    Exchange+Sort that shuffled K copies of every query vector."""
    pair_cos = (
        f"round({_dot_fold_spark(query_vec_col, 'c.cvec')} / "
        f"nullif(__qnorm * c.cn, 0.0), 6)"
    )
    by_cos_desc_cid_asc = (
        "(a, b) -> CASE "
        "WHEN a.cos IS NULL AND b.cos IS NULL THEN "
        "CASE WHEN a.cid < b.cid THEN -1 "
        "WHEN a.cid > b.cid THEN 1 ELSE 0 END "
        "WHEN a.cos IS NULL THEN 1 "
        "WHEN b.cos IS NULL THEN -1 "
        "WHEN a.cos > b.cos THEN -1 "
        "WHEN a.cos < b.cos THEN 1 "
        "ELSE CASE WHEN a.cid < b.cid THEN -1 "
        "WHEN a.cid > b.cid THEN 1 ELSE 0 END END"
    )
    in_cols = list(q.columns)
    return (
        q.crossJoin(
            F.broadcast(
                _centroid_array(
                    centroids, centroid_id_col, centroid_vec_col
                )
            )
        )
        .withColumn(
            "__probe",
            F.explode(
                F.expr(
                    f"slice(array_sort(transform(__cents, c -> "
                    f"named_struct('cid', c.cid, 'cos', {pair_cos})), "
                    f"{by_cos_desc_cid_asc}), 1, {int(n_probe)})"
                )
            ),
        )
        .select(
            *in_cols,
            F.col("__probe.cid").alias(centroid_id_col),
        )
    )


def assign_centroids(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
    keep_score: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment: the centroid table collapses into
    ONE broadcast row holding a cid-sorted array of (id, vec, norm)
    structs, and each corpus row folds over that array picking the
    argmax — rounded-cosine order with centroid-id tie-break, exactly
    as the oracle formulation.

    ZERO corpus exchange (r16; guide §2.4): the pre-r16 shape
    (broadcast crossJoin to K rows/vector → row_number window keyed by
    vector id) shuffled K copies of every embedding through an
    Exchange+Sort just to pick the per-row max — data each row already
    held.  The fold visits centroids in ascending-id order keeping
    strictly-greater cosines, which reproduces the window's
    (cosine DESC NULLS LAST, centroid_id ASC) winner bit-for-bit: same
    rounded-cosine doubles (identical fold expressions), ties keep the
    earlier = lower id, NULL cosines (zero-norm vectors) never replace
    a non-NULL best, and an all-NULL row falls to the lowest centroid
    id — each case matching the window ordering."""
    cid_t = centroids.schema[centroid_id_col].dataType.simpleString()
    cent_arr = _centroid_array(
        centroids, centroid_id_col, centroid_vec_col
    )
    pair_cos = (
        f"round({_dot_fold_spark(vec_col, 'c.cvec')} / "
        f"nullif(__enorm * c.cn, 0.0), 6)"
    )
    best = (
        f"aggregate("
        f"transform(__cents, c -> named_struct("
        f"'cid', c.cid, 'cos', {pair_cos})), "
        f"CAST(NULL AS STRUCT<cid: {cid_t}, cos: DOUBLE>), "
        f"(best, c) -> CASE "
        f"WHEN best IS NULL THEN c "
        f"WHEN c.cos IS NOT NULL AND "
        f"(best.cos IS NULL OR c.cos > best.cos) THEN c "
        f"ELSE best END)"
    )
    out_cols = [id_col, vec_col, F.col("__best.cid").alias(centroid_id_col)]
    if keep_score:  # the rounded cosine to the ASSIGNED centroid —
        out_cols.append(  # semantic packing orders within-cluster by it
            F.col("__best.cos").alias("affinity")
        )
    return (
        embeddings.withColumn("__enorm", norm_expr(vec_col))
        .crossJoin(F.broadcast(cent_arr))
        .withColumn("__best", F.expr(best))
        # empty centroid table → NULL best; the crossJoin+window shape
        # produced zero rows there, so drop them for exact parity
        .filter(F.col("__best").isNotNull())
        .select(*out_cols)
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
    materialize: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus by
    nearest centroid, then WITHIN each cluster drop every vector whose
    cosine to a lower-id cluster member is ``>= threshold`` (the
    standard non-chained rule — the lowest-id member of each ε-ball
    survives as the representative).

    Returns ``(id, centroid_id, kept)`` for every input vector.

    Scale shape: the expensive pairwise step is an equi-join on
    ``centroid_id`` — quadratic only within a cluster, never across
    the corpus.  At 100 TB the centroid count K grows with the corpus
    (SemDeDup uses ~100k clusters for billions of embeddings) so
    per-cluster membership stays bounded and the join stays balanced;
    skewed clusters are AQE-splittable.  Cosines are rounded to 6 dp
    before the threshold compare so the keep/drop boundary agrees
    across engines.

    The assignment subtree feeds three plan branches (both self-join
    sides + the output base); without materialization Spark recomputes
    the scan + K-way scoring + argmax window per branch (measured 3× =
    +2.5 s on the 5 k-doc bench row alone).  ``materialize=True``
    (default) localCheckpoints the assignment once — the same
    break-and-reuse pattern as `connected_components`; pass False to
    keep pure lineage (e.g. when the caller persists assignments to a
    table anyway).
    """
    assigned = assign_centroids(
        embeddings, centroids, id_col, vec_col,
        centroid_id_col, centroid_vec_col,
    ).withColumn("__norm", norm_expr(vec_col))
    # the norm rides into the checkpoint, so the pairwise filter below
    # reads it instead of re-folding both operands per candidate pair
    if materialize:
        assigned = assigned.localCheckpoint(eager=True)
    a = assigned.select(
        F.col(id_col).alias("__id_a"),
        F.col(vec_col).alias("__vec_a"),
        F.col("__norm").alias("__na"),
        centroid_id_col,
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"),
        F.col(vec_col).alias("__vec_b"),
        F.col("__norm").alias("__nb"),
        centroid_id_col,
    )
    dup = (
        a.join(b, centroid_id_col)
        .filter(F.col("__id_a") < F.col("__id_b"))
        .filter(
            cosine_from_norms_expr("__vec_a", "__vec_b", "__na", "__nb")
            >= threshold
        )
        .select(F.col("__id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dup, id_col, "left")
        .select(
            id_col,
            centroid_id_col,
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
    )


def lsh_sign_bucket(
    embeddings: DataFrame,
    dims: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-path ANN index: bucket = sign bits of selected dimensions
    (a deterministic stand-in for random hyperplanes — same plan shape).
    Near-neighbor search then equi-joins on bucket instead of a cross
    join, pruning the candidate set by ~2^len(dims)."""
    bits = [
        F.when(F.element_at(F.col(vec_col), d + 1) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("string")
        for d in dims
    ]
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.concat(*bits).alias("bucket"),
    )


def semantic_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: "list[int] | None" = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the vector
    complement of the shingle-based `dedup.contamination_check`: flag
    every corpus vector whose exact cosine against ANY benchmark
    vector reaches ``threshold`` (paraphrased eval leakage that 4-gram
    shingles miss).

    Returns ``(vec_id, contaminated_by, max_cosine)`` — one row per
    corpus vector with a hit, carrying the lowest matching benchmark
    id and the best score (callers anti-join corpus against it).

    Scale shape: candidates come from the LSH sign-bucket equi-join —
    never a cross join; norms are hoisted per row; the benchmark side
    is broadcast by default (eval sets are small by nature — the same
    posture as the shingle path), pass ``broadcast_benchmark=False``
    for an unusually large benchmark and AQE plans the shuffle join.
    """
    dims = list(bucket_dims or range(8))
    c = lsh_sign_bucket(corpus, dims, id_col, vec_col).select(
        F.col(id_col).alias("vec_id"),
        "bucket",
        norm_expr(vec_col).alias("__nc"),
        F.col(vec_col).alias("__vc"),
    )
    b = lsh_sign_bucket(benchmark, dims, id_col, vec_col).select(
        F.col(id_col).alias("bench_id"),
        "bucket",
        norm_expr(vec_col).alias("__nb"),
        F.col(vec_col).alias("__vb"),
    )
    if broadcast_benchmark:
        b = F.broadcast(b)
    cos = cosine_from_norms_expr("__vc", "__vb", "__nc", "__nb")
    return (
        c.join(b, "bucket")
        .filter(cos >= F.lit(float(threshold)))
        .groupBy("vec_id")
        .agg(
            F.min("bench_id").cast("bigint").alias("contaminated_by"),
            F.max(cos).alias("max_cosine"),
        )
    )


def semantic_decontamination_oracle_sql(
    corpus_pred: str,
    bench_pred: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bucket_dims: int = 8,
    threshold: float = 0.9,
) -> str:
    """DuckDB twin of :func:`semantic_decontamination` over one table
    split into corpus/benchmark by predicates."""

    def bucket_sql(alias: str) -> str:
        bits = [
            f"CASE WHEN {alias}.{vec_col}[{d + 1}] >= 0 "
            "THEN '1' ELSE '0' END"
            for d in range(n_bucket_dims)
        ]
        return " || ".join(bits)

    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip(CAST(c.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[])), p -> p[1] * p[2])), "
        "(acc, v) -> acc + v)"
    )

    def norm(al: str) -> str:
        return (
            "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({al}.{vec_col} AS DOUBLE[]), "
            "x -> x * x)), (acc, v) -> acc + v))"
        )

    cos = f"round({dot} / nullif({norm('c')} * {norm('b')}, 0.0), 6)"
    return f"""
SELECT c.{id_col} AS vec_id,
       CAST(min(b.{id_col}) AS BIGINT) AS contaminated_by,
       max({cos}) AS max_cosine
FROM (SELECT * FROM {table} WHERE {corpus_pred}) c
JOIN (SELECT * FROM {table} WHERE {bench_pred}) b
  ON ({bucket_sql('c')}) = ({bucket_sql('b')})
WHERE {cos} >= {threshold}
GROUP BY c.{id_col}
"""
