"""Distributed k-means (Lloyd's iterations) over an embedding column.

The engine already *consumes* centroid tables (``similarity.assign_
centroids`` / ``semantic_dedup`` — SemDeDup's cluster step; the IVF
index) but until now training them deterministically was left to MLlib
(``ivf_index``), whose float summation order is partition-dependent and
therefore not oracle-matchable.  This module is the missing trainer: a
pure-DataFrame Lloyd's loop whose every floating-point step is pinned to
a deterministic, engine-portable formulation, so the full fit can be
hash-verified against a SQL oracle.

Parity design (why the update step looks the way it does):

* **Assignment** reuses ``similarity.assign_centroids`` — cosine via a
  sequential left-to-right fold, rounded to 6 dp *before* ranking,
  centroid-id tie-break.  Identical formulation in the oracle SQL.
* **Centroid update** must average doubles per cluster — and a plain
  ``avg()`` is summation-order-dependent, so two engines (or two Spark
  runs with different partitioning) disagree in the last ulp and the
  next assignment round can flip a boundary vector.  Instead each
  element is snapped to a 6-dp integer grid (``floor(round(el, 6) *
  1e6 + 0.5)`` — round-half-up, identical in both engines), summed as
  BIGINT (exact, order-independent), and the mean is computed with a
  pinned expression ``(CAST(sum AS DOUBLE) / 1000000.0) / CAST(n AS
  DOUBLE)`` — the same two IEEE divisions in the same order on both
  sides.  Result: bit-identical centroids everywhere.
* Empty clusters keep their previous centroid (left join + coalesce),
  mirrored in the oracle.

Scale shape: per iteration, one broadcast of the K×dim centroid table
into a codegen'd scan+score (no corpus shuffle), one ``row_number``
window keyed by vector id (tiny groups — K rows each), and one
map-side-combinable groupBy on (centroid, position) whose output is
K×dim rows.  The corpus is scanned once per iteration and never
collected; centroid tables are localCheckpointed per round so lineage
stays flat for any iteration count.

Reference parity: the reference has no trainer (clustering arrives
pre-computed); this is a scale extension in the SemDeDup/IVF family
(`similarity.py`), per the published SemDeDup recipe (Abbas et al. 2023)
which k-means-clusters embeddings before per-cluster pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators.similarity import assign_centroids

#: elements are snapped to this grid before exact integer summation
_GRID = 1_000_000.0


def _update_centroids(
    assigned: DataFrame,
    prev: DataFrame,
    vec_col: str,
    centroid_id_col: str,
    centroid_vec_col: str,
) -> DataFrame:
    """Exact-arithmetic mean of each cluster's vectors (see module doc);
    clusters that lost every member keep their previous centroid."""
    ex = assigned.select(
        centroid_id_col,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "__pos", "__el"
        ),
    )
    scaled = ex.select(
        centroid_id_col,
        "__pos",
        F.floor(F.round(F.col("__el"), 6) * F.lit(_GRID) + F.lit(0.5))
        .cast("bigint")
        .alias("__s"),
    )
    sums = scaled.groupBy(centroid_id_col, "__pos").agg(
        F.sum("__s").alias("__sum"), F.count(F.lit(1)).alias("__n")
    )
    mean = (F.col("__sum").cast("double") / F.lit(_GRID)) / F.col(
        "__n"
    ).cast("double")
    fresh = (
        sums.select(centroid_id_col, "__pos", mean.alias("__el"))
        .groupBy(centroid_id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__el"))),
                lambda s: s["__el"],
            ).alias("__cvec")
        )
    )
    return (
        prev.select(
            centroid_id_col, F.col(centroid_vec_col).alias("__prev")
        )
        .join(fresh, centroid_id_col, "left")
        .select(
            centroid_id_col,
            F.coalesce("__cvec", "__prev").alias(centroid_vec_col),
        )
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
    init: DataFrame | None = None,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's k-means: ``iters`` assign→update rounds from a
    deterministic seed (the ``k`` lowest-id vectors, unless ``init``
    supplies a centroid table), then a final assignment against the
    fitted centroids.

    Returns ``(assignments, centroids)`` — assignments as
    ``(id, centroid_id)`` for every input vector, centroids as
    ``(centroid_id, cvec)`` ready for ``semantic_dedup`` /
    ``assign_centroids`` / ``ivf_search``.
    """
    if init is not None:
        cent = init.select(
            centroid_id_col,
            F.col(centroid_vec_col).cast("array<double>").alias(
                centroid_vec_col
            ),
        )
    else:
        cent = (
            embeddings.orderBy(F.col(id_col).asc())
            .limit(k)
            .select(
                F.col(id_col).alias(centroid_id_col),
                F.col(vec_col).cast("array<double>").alias(
                    centroid_vec_col
                ),
            )
        )
    if materialize:
        cent = cent.localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = assign_centroids(
            embeddings, cent, id_col, vec_col,
            centroid_id_col, centroid_vec_col,
        )
        cent = _update_centroids(
            assigned, cent, vec_col, centroid_id_col, centroid_vec_col
        )
        if materialize:
            # K×dim rows — tiny; keeps lineage flat across rounds.
            cent = cent.localCheckpoint(eager=True)
    final = assign_centroids(
        embeddings, cent, id_col, vec_col, centroid_id_col,
        centroid_vec_col,
    ).select(id_col, centroid_id_col)
    return final, cent


# ---------------------------------------------------------------------
# Oracle SQL (DuckDB) — the identical computation, unrolled per round
# ---------------------------------------------------------------------

def _duck_cos(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )

    def norm(x: str) -> str:
        return (
            f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({x} AS DOUBLE[]), x -> x * x)), "
            f"(acc, v) -> acc + v))"
        )

    return f"round({dot} / nullif({norm(a)} * {norm(b)}, 0.0), 6)"


def kmeans_ctes(
    table: str,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[str]:
    """The unrolled Lloyd's CTE chain (DuckDB); the fitted centroid
    table is named ``cent{iters}``.  Shared by the standalone k-means
    oracle and composed oracles (trained SemDeDup)."""
    ctes = [
        f"cent0 AS (SELECT {id_col} AS centroid_id, "
        f"CAST({vec_col} AS DOUBLE[]) AS cvec FROM {table} "
        f"ORDER BY {id_col} ASC LIMIT {k})"
    ]
    for t in range(iters):
        ctes.append(
            f"""assign{t} AS (
  SELECT {id_col}, {vec_col}, centroid_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM {table} e, cent{t} c
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""cent{t + 1} AS (
  SELECT p.centroid_id, coalesce(f.cvec, p.cvec) AS cvec
  FROM cent{t} p LEFT JOIN (
    SELECT centroid_id, list(el ORDER BY pos) AS cvec FROM (
      SELECT centroid_id, pos,
             (CAST(sum(s) AS DOUBLE) / 1000000.0)
               / CAST(count(*) AS DOUBLE) AS el
      FROM (
        SELECT a.centroid_id, gs.i AS pos,
               CAST(floor(round(CAST(a.{vec_col}[gs.i] AS DOUBLE), 6)
                          * 1000000.0 + 0.5) AS BIGINT) AS s
        FROM assign{t} a
        CROSS JOIN UNNEST(generate_series(1, len(a.{vec_col}))) AS gs(i)
      ) GROUP BY centroid_id, pos
    ) GROUP BY centroid_id
  ) f ON p.centroid_id = f.centroid_id
)"""
        )
    return ctes


def kmeans_oracle_sql(
    table: str,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of ``kmeans_fit`` (seeded from the ``k`` lowest-id
    vectors): unrolled assign/update CTE pair per iteration, identical
    rounded-cosine assignment and grid-snapped exact mean."""
    body = ",\n".join(kmeans_ctes(table, k, iters, id_col, vec_col))
    return f"""
WITH {body}
SELECT {id_col}, centroid_id FROM (
  SELECT e.{id_col}, c.centroid_id,
         row_number() OVER (
           PARTITION BY e.{id_col}
           ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                    c.centroid_id ASC) AS rn
  FROM {table} e, cent{iters} c
) WHERE rn = 1
"""


# ---------------------------------------------------------------------
# Trained SemDeDup: k-means fit + within-cluster ε-ball pruning
# ---------------------------------------------------------------------

def semantic_dedup_trained(
    embeddings: DataFrame,
    k: int,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full published SemDeDup recipe in one call (Abbas et al.
    2023): k-means-cluster the embeddings, then within each cluster
    drop every vector whose cosine to a lower-id member is ≥
    ``threshold``.  Until now the engine's ``semantic_dedup`` consumed
    *pre-computed* centroids; composing it with :func:`kmeans_fit`
    closes the loop — corpus in, keep/drop decisions out, every step
    oracle-verifiable."""
    from minerva_etl_spark.operators.similarity import semantic_dedup

    _, cent = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    return semantic_dedup(
        embeddings, cent, threshold=threshold,
        id_col=id_col, vec_col=vec_col,
    )


def semantic_dedup_trained_oracle_sql(
    table: str,
    k: int,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semantic_dedup_trained`: the Lloyd's CTE
    chain followed by the exact ε-ball pruning formulation of the
    standalone semantic-dedup oracle."""
    ctes = kmeans_ctes(table, k, iters, id_col, vec_col)
    cos = _duck_cos
    ctes.append(
        f"""final_assigned AS (
  SELECT {id_col}, {vec_col}, centroid_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM {table} e, cent{iters} c
  ) WHERE rn = 1
)"""
    )
    ctes.append(
        f"""dup AS (
  SELECT DISTINCT b.{id_col}
  FROM final_assigned a JOIN final_assigned b
    ON a.centroid_id = b.centroid_id AND a.{id_col} < b.{id_col}
  WHERE {cos('a.' + vec_col, 'b.' + vec_col)} >= {threshold}
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT s.{id_col}, s.centroid_id, (d.{id_col} IS NULL) AS kept
FROM final_assigned s LEFT JOIN dup d ON s.{id_col} = d.{id_col}
"""
