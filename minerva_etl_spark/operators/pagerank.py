"""Deterministic integer PageRank — crawl-frontier authority scoring
(round 12).

The crawl arc (`operators/frontier.py`, `operators/robots.py`,
`operators/feeds.py`) builds and schedules a URL frontier; what it
lacked is the classic authority signal a production crawler
prioritizes by (Page, Brin, Motwani, Winograd 1999).  PageRank is
also THE canonical iterative Spark workload — but the float
formulation is summation-order-dependent and can never hash-match an
oracle.  This one is exact integer arithmetic end to end:

* ranks live on a ``Q = 10¹²`` integer grid (``rank_grid`` BIGINT);
* each iteration: ``contrib(u) = rank(u) div outdeg(u)`` (integer
  division), incoming contributions sum as BIGINT (exact, any
  partitioning / any order), and
  ``rank'(v) = (Q·(100−D)) div (100·N) + (D · Σ contrib) div 100``
  with damping ``D`` in percent — every operation is integer, so two
  engines (or two partitionings) agree bit-for-bit;
* dangling mass (nodes without out-edges) is dropped, not
  redistributed — the documented simplification (ranks then sum to
  < Q; relative ORDER, which is what frontier prioritization
  consumes, is unaffected for the common web-graph shapes).

Per iteration: one broadcast-or-shuffle equi-join of edges against
the rank table on ``src`` and one map-side-combinable groupBy on
``dst`` — the textbook shape; the rank table is node-sized, edges are
scanned once per round, nothing collects to the driver.  Lineage is
cut per round (``localCheckpoint``) and each superseded round's
checkpoint is freed as soon as its successor materializes, so any
iteration count runs flat in BOTH plan depth and executor storage
(O(1) retained RDDs, pytest-pinned).

Reference parity note: extension of the crawl arc (the reference has
no graph surface); the algorithm is the published recipe under the
exact-arithmetic discipline `kmeans.py` established.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators.dedup import _free_local_checkpoint

__all__ = ["pagerank", "pagerank_oracle_sql"]

#: rank grid — Q units == rank 1.0
_Q = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Run ``iters`` exact-integer PageRank rounds over an edge table.
    Nodes are everything appearing as src OR dst.  Returns
    ``(node, rank_grid bigint)`` — divide by 10¹² for the real-valued
    rank."""
    iters = int(iters)
    d = int(damping_pct)
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_grid", F.lit(0).cast("bigint"))
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    base = (_Q * (100 - d)) // (100 * n)
    init = _Q // n
    ranks = nodes.withColumn(
        "rank_grid", F.lit(init).cast("bigint")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contribs = (
            edges.join(
                ranks.withColumnRenamed("node", src_col), src_col
            )
            .join(outdeg.withColumnRenamed("node", src_col), src_col)
            .select(
                F.col(dst_col).alias("node"),
                F.expr("rank_grid div outdeg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        prev = ranks
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"(CAST({d} AS BIGINT) * coalesce(__in, "
                        f"CAST(0 AS BIGINT))) div 100"
                    )
                ).alias("rank_grid"),
            )
            .localCheckpoint(eager=True)
        )
        # free the superseded round's checkpoint the moment its
        # successor is materialized (the dedup.connected_components
        # pattern) — a 50-iteration run holds O(1) checkpointed RDDs
        # (nodes + current ranks), not O(iters) executor storage
        _free_local_checkpoint(prev)
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> str:
    """DuckDB twin of :func:`pagerank`: the identical integer
    recurrence unrolled one CTE pair per iteration (the `kmeans.py`
    pattern).  ``edges_sql`` is an inline ``(SELECT ...)`` edge
    corpus."""
    iters = int(iters)
    d = int(damping_pct)
    ctes = [
        f"edges AS MATERIALIZED (SELECT {src_col} AS src, "
        f"{dst_col} AS dst FROM {edges_sql} e)",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges
    UNION ALL SELECT dst AS node FROM edges
  )
)""",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        """outdeg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
  FROM edges GROUP BY src
)""",
        f"""r0 AS (
  SELECT node, CAST({_Q} // (SELECT n FROM nn) AS BIGINT)
    AS rank_grid
  FROM nodes
)""",
    ]
    for t in range(iters):
        ctes.append(
            f"""contrib{t} AS (
  SELECT e.dst AS node,
         CAST(sum(r.rank_grid // o.outdeg) AS BIGINT) AS cin
  FROM edges e
  JOIN r{t} r ON r.node = e.src
  JOIN outdeg o ON o.node = e.src
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{t + 1} AS MATERIALIZED (
  SELECT n.node,
         CAST(({_Q} * {100 - d}) // (100 * (SELECT n FROM nn))
              + ({d} * coalesce(c.cin, 0)) // 100 AS BIGINT)
           AS rank_grid
  FROM nodes n LEFT JOIN contrib{t} c ON n.node = c.node
)"""
        )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT node, rank_grid FROM r{iters}
"""
