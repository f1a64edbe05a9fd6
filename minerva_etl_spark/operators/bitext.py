"""Bitext mining — margin-based parallel-corpus extraction from two
embedding spaces (round 11).

Multilingual training corpora (translation pairs, cross-lingual
alignment data) are mined, not collected: embed both sides with a
multilingual encoder, then keep pairs whose cosine is high *relative
to each side's neighborhood* — raw cosine thresholds fail because
"hub" sentences are close to everything.  This implements the RATIO
MARGIN of Artetxe & Schwenk, "Margin-based Parallel Corpus Mining
with Multilingual Sentence Embeddings" (ACL 2019) — the scoring used
at corpus scale by CCMatrix/WikiMatrix:

    margin(x, y) = 2·cos(x, y) /
                   ( avg_{z ∈ NNk(x)} cos(x, z)
                   + avg_{w ∈ NNk(y)} cos(w, y) )

A pair scores > 1 when it is closer than each side's average
neighborhood — hubs are normalized away.  Mining keeps, per source
item, its best-margin target when that margin clears ``threshold``
(the forward-best strategy; 1.04–1.06 is the published operating
band).

Oracle-parity discipline: cosines are the repo's standard rounded-6dp
doubles; the two neighborhood averages are summed as DECIMAL(10,6)
(EXACT — order-independent, unlike double sums), and the final ratio
is one double division with a fixed association order, so DuckDB
replays the margin bit-identically (`bitext_mine_oracle_sql`).

Scale shape: the default candidate set broadcasts the target side —
right when one side is bounded (a benchmark, a day's delivery, one
language's shard).  For corpus×corpus both-sides-large mining, pass
``candidates=`` from `similarity.ivf_join` (probe-pruned ANN pairs):
margins are then computed over the candidate graph instead of the
full bipartite product, which is exactly what the CCMatrix pipeline
does with its FAISS shards.  Neighborhood averages, margins, and the
per-source top-1 all run as partitioned windows / map-side-combinable
aggregations; the per-source winner uses `cap_per_key`'s two-level
salted shape so a hub target never serializes one task.

Reference parity: extension surface (the reference engine has no
embedding operations); the nearest reference analog is relation
materialization (`src/minerva/storage/relation.py` semantics) in
that the output is an (a, b) link table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from minerva_etl_spark.operators.similarity import (
    cosine_from_norms_expr,
    norm_expr,
)

__all__ = [
    "bitext_candidates",
    "mine_bitext",
    "bitext_mine_oracle_sql",
    "bitext_mine_ann_oracle_sql",
]


def bitext_candidates(
    src: DataFrame,
    tgt: DataFrame,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The default candidate set: every (src, tgt) pair with its
    rounded-6dp cosine, built by broadcasting the TARGET side (use
    only when one side is bounded; see module docstring for the
    corpus×corpus path).  Returns ``(src_id, tgt_id, cosine)``."""
    s = src.select(
        F.col(src_id), F.col(vec_col).alias("__sv")
    ).withColumn("__sn", norm_expr("__sv"))
    t = tgt.select(
        F.col(tgt_id), F.col(vec_col).alias("__tv")
    ).withColumn("__tn", norm_expr("__tv"))
    return s.crossJoin(F.broadcast(t)).select(
        src_id,
        tgt_id,
        cosine_from_norms_expr("__sv", "__tv", "__sn", "__tn").alias(
            "cosine"
        ),
    )


def mine_bitext(
    candidates: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    src_id: str = "src_id",
    tgt_id: str = "tgt_id",
    cosine_col: str = "cosine",
    salt_buckets: int = 16,
) -> DataFrame:
    """Ratio-margin mining over a candidate pair graph (from
    `bitext_candidates` or `similarity.ivf_join` output renamed to
    ``(src_id, tgt_id, cosine)``).

    Per pair: ``margin = 2·cos / (avgF(src) + avgB(tgt))`` where the
    averages run over each side's top-``k`` candidate cosines.  Keeps
    each source's best-margin target iff ``margin >= threshold``.
    Returns ``(src_id, tgt_id, cosine, margin)``.

    Parity mechanics (why the expression looks the way it does): the
    top-k cosines are DECIMAL(10,6)-exact, so their sums are exact
    and order-independent; the margin is assembled as
    ``((2·cos·nF)·nB) / (sF·nB + sB·nF)`` — one double division with
    a fixed multiplication order — then rounded to 6dp, making the
    ranking reproducible in DuckDB."""
    from minerva_etl_spark.operators.skew import cap_per_key

    c6 = F.round(F.col(cosine_col), 6)
    # the candidate product (bipartite crossJoin cosines, or the whole
    # ivf_join chain in the ANN path) feeds THREE consumers — the
    # forward neighborhood, the backward neighborhood, and the scored
    # join; checkpoint the 3-column pair list once so the expensive
    # candidate lineage executes once, not three times (r16; guide §5)
    pairs = candidates.select(
        src_id,
        tgt_id,
        c6.cast("decimal(10,6)").alias("__c"),
    ).localCheckpoint(eager=True)
    wf = Window.partitionBy(src_id).orderBy(
        F.col("__c").desc(), F.col(tgt_id).asc()
    )
    wb = Window.partitionBy(tgt_id).orderBy(
        F.col("__c").desc(), F.col(src_id).asc()
    )
    fwd = (
        pairs.withColumn("__rn", F.row_number().over(wf))
        .filter(F.col("__rn") <= k)
        .groupBy(src_id)
        .agg(
            F.sum("__c").alias("__sf"),
            F.count(F.lit(1)).alias("__nf"),
        )
    )
    bwd = (
        pairs.withColumn("__rn", F.row_number().over(wb))
        .filter(F.col("__rn") <= k)
        .groupBy(tgt_id)
        .agg(
            F.sum("__c").alias("__sb"),
            F.count(F.lit(1)).alias("__nb"),
        )
    )
    scored = (
        pairs.join(fwd, src_id)
        .join(bwd, tgt_id)
        .withColumn(
            "margin",
            F.expr(
                "round(((2.0d * CAST(__c AS DOUBLE) * CAST(__nf AS "
                "DOUBLE)) * CAST(__nb AS DOUBLE)) / nullif("
                "CAST(__sf AS DOUBLE) * CAST(__nb AS DOUBLE) + "
                "CAST(__sb AS DOUBLE) * CAST(__nf AS DOUBLE), 0.0d), 6)"
            ),
        )
        .filter(F.col("margin") >= F.lit(float(threshold)))
        .select(
            src_id,
            tgt_id,
            F.col("__c").cast("double").alias("cosine"),
            "margin",
        )
    )
    return cap_per_key(
        scored,
        keys=[src_id],
        order_by=[F.col("margin").desc(), F.col(tgt_id).asc()],
        n=1,
        salt_col=tgt_id,
        salt_buckets=salt_buckets,
    ).drop("rank")


def bitext_mine_oracle_sql(
    src_pred: str,
    tgt_pred: str,
    k: int = 4,
    threshold: float = 1.05,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of `bitext_candidates` + `mine_bitext`: the full
    bipartite cosine product, DECIMAL-exact top-k neighborhood sums,
    the identical fixed-association margin, threshold, and per-source
    best pair."""
    from minerva_etl_spark.operators.kmeans import _duck_cos

    return f"""
WITH srcv AS (
  SELECT {id_col} AS src_id, {vec_col} AS v FROM {table}
  WHERE {src_pred}
),
tgtv AS (
  SELECT {id_col} AS tgt_id, {vec_col} AS v FROM {table}
  WHERE {tgt_pred}
),
allp AS MATERIALIZED (
  SELECT s.src_id, t.tgt_id,
         CAST({_duck_cos('s.v', 't.v')} AS DECIMAL(10,6)) AS c
  FROM srcv s, tgtv t
),
{_margin_tail_sql(k, threshold)}
"""


def _margin_tail_sql(k: int, threshold: float) -> str:
    """The shared margin chain over a candidate CTE
    ``allp(src_id, tgt_id, c DECIMAL(10,6))`` — DECIMAL-exact top-k
    neighborhood sums, fixed-association margin, threshold, per-source
    best pair.  Used by both the full-product and the ANN-candidate
    oracle."""
    return f"""fwd AS (
  SELECT src_id, sum(c) AS sf, count(*) AS nf FROM (
    SELECT src_id, c,
           row_number() OVER (
             PARTITION BY src_id ORDER BY c DESC, tgt_id ASC) AS rn
    FROM allp
  ) WHERE rn <= {int(k)} GROUP BY src_id
),
bwd AS (
  SELECT tgt_id, sum(c) AS sb, count(*) AS nb FROM (
    SELECT tgt_id, c,
           row_number() OVER (
             PARTITION BY tgt_id ORDER BY c DESC, src_id ASC) AS rn
    FROM allp
  ) WHERE rn <= {int(k)} GROUP BY tgt_id
),
scored AS (
  SELECT p.src_id, p.tgt_id, CAST(p.c AS DOUBLE) AS cosine,
         round(((2.0 * CAST(p.c AS DOUBLE) * CAST(f.nf AS DOUBLE))
                * CAST(b.nb AS DOUBLE))
               / nullif(CAST(f.sf AS DOUBLE) * CAST(b.nb AS DOUBLE)
                      + CAST(b.sb AS DOUBLE) * CAST(f.nf AS DOUBLE),
                        0.0), 6) AS margin
  FROM allp p
  JOIN fwd f USING (src_id)
  JOIN bwd b USING (tgt_id)
)
SELECT src_id, tgt_id, cosine, margin FROM (
  SELECT src_id, tgt_id, cosine, margin,
         row_number() OVER (
           PARTITION BY src_id
           ORDER BY margin DESC, tgt_id ASC) AS rn
  FROM scored WHERE margin >= {float(threshold)}
) WHERE rn = 1"""


def bitext_mine_ann_oracle_sql(
    src_pred: str,
    tgt_pred: str,
    kmeans_k: int,
    kmeans_iters: int,
    cand_k: int,
    n_probe: int,
    k: int = 4,
    threshold: float = 1.05,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of the corpus×corpus hand-off path: IVF candidates
    (`kmeans_fit` on the target side + `assign_centroids` +
    `ivf_join`: probe ranking, candidate equi-join, per-source
    top-``cand_k``) feeding the SAME margin chain as
    :func:`bitext_mine_oracle_sql` — proving the documented
    candidate-injection route end to end, not just the full product."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    ctes = kmeans_ctes("tgtv", kmeans_k, kmeans_iters, id_col, vec_col)
    cent = f"cent{kmeans_iters}"
    body = ",\n".join(ctes)
    return f"""
WITH tgtv AS MATERIALIZED (
  SELECT {id_col}, {vec_col} FROM {table} WHERE {tgt_pred}
),
{body},
assigned AS MATERIALIZED (
  SELECT {id_col}, {vec_col}, centroid_id FROM (
    SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.{id_col}
             ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM tgtv e, {cent} c
  ) WHERE rn = 1
),
q AS (
  SELECT {id_col} AS src_id, {vec_col} AS qv
  FROM {table} WHERE {src_pred}
),
probe AS (
  SELECT src_id, qv, centroid_id FROM (
    SELECT q.src_id, q.qv, c.centroid_id,
           row_number() OVER (
             PARTITION BY q.src_id
             ORDER BY {_duck_cos('q.qv', 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM q, {cent} c
  ) WHERE rn <= {int(n_probe)}
),
cand0 AS (
  SELECT p.src_id, a.{id_col} AS tgt_id,
         {_duck_cos('a.' + vec_col, 'p.qv')} AS cosine
  FROM probe p JOIN assigned a USING (centroid_id)
),
allp AS MATERIALIZED (
  SELECT src_id, tgt_id, CAST(cosine AS DECIMAL(10,6)) AS c FROM (
    SELECT src_id, tgt_id, cosine,
           row_number() OVER (
             PARTITION BY src_id
             ORDER BY cosine DESC, tgt_id ASC) AS rnk
    FROM cand0
  ) WHERE rnk <= {int(cand_k)}
),
{_margin_tail_sql(k, threshold)}
"""
