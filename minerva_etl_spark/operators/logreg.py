"""Distributed logistic-regression training (batch gradient descent).

Completes the model-based quality filter's story: `text.classify_
quality` *applies* a linear model with bit-identical logits; this
module *trains* one — so a team can fit the filter to their own
labels (human ratings, teacher-model verdicts) with the same
engine-portable determinism guarantees as the k-means trainer.

Why this shape (same parity recipe as `kmeans.py`):

* The gradient is a SUM over rows of ``(sigmoid(w·x) - y) * x_j`` —
  float summation is order-dependent, so each row's contribution is
  snapped to a 6-dp integer grid (``floor(round(c, 6) * 1e6 + 0.5)``)
  and summed exactly as BIGINT: partitioning-independent,
  engine-identical.
* The weight update runs on the DRIVER over those exact sums —
  ``w_j - lr * ((sum/1e6) / n)`` with the same IEEE operation order
  the oracle's SQL uses, so driver Python doubles and DuckDB doubles
  agree bit for bit; weights re-enter the next round as ``repr``
  literals (exact round-trip).
* ``sigmoid`` is the pinned expression ``1/(1+exp(-z))`` with ``z``
  written as the same fixed-order sum of products on both engines.

Scale shape: one codegen'd scan + map-side-combinable aggregation per
iteration (the gradient is ``n_features + 1`` BIGINT sums — a single
row to the driver); weights broadcast back as literals.  Nothing else
moves.

Reference: extension (the reference has no model training); published
textbook batch GD.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_GRID = 1_000_000.0


def _z_sql(feature_cols: list[str], w: list[float]) -> str:
    """The fixed-order linear term: w0 + w1*x1 + w2*x2 + ..."""
    terms = [f"CAST({w[0]!r} AS DOUBLE)"]
    terms += [
        f"CAST({w[j + 1]!r} AS DOUBLE) * {c}"
        for j, c in enumerate(feature_cols)
    ]
    return " + ".join(terms)


def _snap(expr: str) -> str:
    return f"CAST(floor(round({expr}, 6) * 1000000.0 + 0.5) AS BIGINT)"


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.1,
    init: list[float] | None = None,
) -> list[float]:
    """Fit ``[bias, w_1..w_k]`` by ``iters`` full-batch GD rounds.

    ``feature_cols`` are column names (or SQL expressions) evaluated
    per row; ``label_col`` must be 0/1.  Returns the weight vector —
    tiny, driver-side, exactly reproducible.
    """
    k = len(feature_cols)
    w = list(init) if init is not None else [0.0] * (k + 1)
    n = df.count()
    if n == 0:
        return w
    for _ in range(int(iters)):
        z = _z_sql(feature_cols, w)
        sig = f"(1.0 / (1.0 + exp(-({z}))))"
        resid = f"({sig} - CAST({label_col} AS DOUBLE))"
        aggs = [
            F.sum(F.expr(_snap(resid))).alias("g0"),
        ] + [
            F.sum(F.expr(_snap(f"{resid} * {c}"))).alias(f"g{j + 1}")
            for j, c in enumerate(feature_cols)
        ]
        row = df.agg(*aggs).collect()[0]
        w = [
            wj - float(lr) * ((float(row[f"g{j}"]) / _GRID) / float(n))
            for j, wj in enumerate(w)
        ]
    return w


def logreg_weights_df(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.1,
) -> DataFrame:
    """Gate-friendly wrapper: the fitted weights as rows
    ``(idx, name, weight)`` with the weight rounded to 6 dp."""
    import math

    w = logreg_train(df, feature_cols, label_col, iters=iters, lr=lr)
    names = ["bias"] + [f"w_{j + 1}" for j in range(len(feature_cols))]
    # half-up 6-dp grid, NOT Python round() (banker's rounding) — the
    # same floor(x*1e6+0.5)/1e6 the oracle computes, so a weight on an
    # exact .5 boundary cannot diverge between the three runtimes
    rows = [
        (i, names[i], math.floor(w[i] * 1_000_000.0 + 0.5) / 1_000_000.0)
        for i in range(len(w))
    ]
    return df.sparkSession.createDataFrame(
        rows, "idx int, name string, weight double"
    )


def _z_duck(feature_sqls: list[str], prefix: str = "w") -> str:
    terms = [f"{prefix}.w0"]
    terms += [
        f"{prefix}.w{j + 1} * {c}" for j, c in enumerate(feature_sqls)
    ]
    return " + ".join(terms)


def _train_ctes(
    table: str,
    feature_sqls: list[str],
    label_sql: str,
    iters: int,
    lr: float,
) -> list[str]:
    """The unrolled GD rounds (DuckDB); fitted weights land in
    ``wt{iters}``.  Shared by the weights oracle and the composed
    train→score→evaluate oracle."""
    k = len(feature_sqls)
    init = ", ".join(
        f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1)
    )
    ctes = [
        f"d AS MATERIALIZED (SELECT * FROM {table})",
        "n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM d)",
        f"wt0 AS (SELECT {init})",
    ]
    for t in range(int(iters)):
        sig = f"(1.0 / (1.0 + exp(-({_z_duck(feature_sqls)}))))"
        resid = f"({sig} - CAST({label_sql} AS DOUBLE))"
        gsel = [f"CAST(sum({_snap(resid)}) AS BIGINT) AS g0"] + [
            f"CAST(sum({_snap(f'{resid} * {c}')}) AS BIGINT) AS g{j + 1}"
            for j, c in enumerate(feature_sqls)
        ]
        ctes.append(
            f"""g{t} AS MATERIALIZED (
  SELECT {', '.join(gsel)} FROM d, wt{t} w
)"""
        )
        # coalesce + nullif: an EMPTY table yields NULL gradient sums
        # and n=0 — weights then stay at their current value, exactly
        # matching the Spark side's early return (for non-empty input
        # both wrappers are identity, so the doubles are unchanged)
        upd = ", ".join(
            f"coalesce(w.w{j} - {float(lr)!r} * ((CAST(g.g{j} AS DOUBLE) "
            f"/ 1000000.0) / nullif(n.n, 0.0)), w.w{j}) AS w{j}"
            for j in range(k + 1)
        )
        ctes.append(
            f"wt{t + 1} AS (SELECT {upd} FROM wt{t} w, g{t} g, n)"
        )
    return ctes


def logreg_oracle_sql(
    table: str,
    feature_sqls: list[str],
    label_sql: str,
    iters: int = 3,
    lr: float = 0.1,
) -> str:
    """DuckDB twin of :func:`logreg_weights_df`: the same rounds
    unrolled, weights carried as one-row CTEs."""
    k = len(feature_sqls)
    ctes = _train_ctes(table, feature_sqls, label_sql, iters, lr)
    names = ["bias"] + [f"w_{j + 1}" for j in range(k)]
    outs = "\nUNION ALL\n".join(
        f"SELECT {i} AS idx, '{names[i]}' AS name, "
        f"floor(w{i} * 1000000.0 + 0.5) / 1000000.0 AS weight "
        f"FROM wt{int(iters)}"
        for i in range(k + 1)
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
{outs}
"""


# ---------------------------------------------------------------------
# Evaluation: exact binary metrics over grouped scores
# ---------------------------------------------------------------------

def binary_metrics(
    df: DataFrame,
    score_sql: str,
    label_sql: str,
) -> DataFrame:
    """Exact AUC (Mann-Whitney with tie correction) + accuracy@0.5 for
    a binary scorer — one row ``(auc, accuracy, n_pos, n_neg)``.

    Scale shape: scores round to 6 dp and aggregate to per-score
    (pos, neg) counts first — a map-side-combinable groupBy — so the
    rank accumulation runs over DISTINCT score values only (bounded by
    score resolution, ≤ 2e6 groups for a [-1, 1]-ish logit, NOT by
    corpus size); the cumulative window sorts that small table, never
    the corpus.  All tallies are exact integers; the two final
    divisions are pinned expressions, identical in the oracle.
    """
    s = f"round({score_sql}, 6)"
    y = f"CAST({label_sql} AS INT)"
    grouped = df.selectExpr(f"{s} AS s", f"{y} AS y").groupBy("s").agg(
        F.sum(F.expr("CASE WHEN y = 1 THEN 1 ELSE 0 END")).alias("np"),
        F.sum(F.expr("CASE WHEN y = 1 THEN 0 ELSE 1 END")).alias("nn"),
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acc = grouped.select(
        "s", "np", "nn",
        (F.sum("nn").over(w) - F.col("nn")).alias("neg_below"),
    )
    # 2x scaling keeps the tie half-credit integral: per score s,
    # positives beat neg_below outright and split ties -> contribution
    # np * (2*neg_below + nn)
    stats = acc.agg(
        F.sum(F.expr("np * (2 * neg_below + nn)")).alias("u2"),
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum(
            F.expr("CASE WHEN s >= 0.5 THEN np ELSE nn END")
        ).alias("n_correct"),
    )
    return stats.select(
        F.expr(
            "round(CAST(u2 AS DOUBLE) / nullif(2.0 * CAST(n_pos AS DOUBLE) "
            "* CAST(n_neg AS DOUBLE), 0.0), 6)"
        ).alias("auc"),
        F.expr(
            "round(CAST(n_correct AS DOUBLE) / CAST(n_pos + n_neg "
            "AS DOUBLE), 6)"
        ).alias("accuracy"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
    )


def binary_metrics_oracle_sql(
    table: str,
    score_sql: str,
    label_sql: str,
) -> str:
    """DuckDB twin of :func:`binary_metrics`."""
    return f"""
SELECT round(CAST(u2 AS DOUBLE) / nullif(2.0 * CAST(n_pos AS DOUBLE)
             * CAST(n_neg AS DOUBLE), 0.0), 6) AS auc,
       round(CAST(n_correct AS DOUBLE) / CAST(n_pos + n_neg
             AS DOUBLE), 6) AS accuracy,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg
FROM (
  SELECT sum(np * (2 * neg_below + nn)) AS u2,
         sum(np) AS n_pos, sum(nn) AS n_neg,
         sum(CASE WHEN s >= 0.5 THEN np ELSE nn END) AS n_correct
  FROM (
    SELECT s, np, nn,
           sum(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nn
             AS neg_below
    FROM (
      SELECT round({score_sql}, 6) AS s,
             sum(CASE WHEN CAST({label_sql} AS INT) = 1
                 THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN CAST({label_sql} AS INT) = 1
                 THEN 0 ELSE 1 END) AS nn
      FROM {table}
      GROUP BY round({score_sql}, 6)
    )
  )
)
"""


def logreg_eval(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
    lr: float = 0.1,
) -> DataFrame:
    """Train → score → evaluate in one call: fit the model, score every
    row with the fitted sigmoid, and return the one-row exact metrics
    table (:func:`binary_metrics`)."""
    w = logreg_train(df, feature_cols, label_col, iters=iters, lr=lr)
    score = f"(1.0 / (1.0 + exp(-({_z_sql(feature_cols, w)}))))"
    return binary_metrics(df, score, label_col)


def logreg_eval_oracle_sql(
    table: str,
    feature_sqls: list[str],
    label_sql: str,
    iters: int = 3,
    lr: float = 0.1,
) -> str:
    """DuckDB twin of :func:`logreg_eval`: training CTEs, a scored
    CTE against the fitted weights, then the metrics formulation."""
    ctes = _train_ctes(table, feature_sqls, label_sql, iters, lr)
    sig = f"(1.0 / (1.0 + exp(-({_z_duck(feature_sqls)}))))"
    ctes.append(
        f"""scored AS MATERIALIZED (
  SELECT round({sig}, 6) AS s, CAST({label_sql} AS INT) AS y
  FROM d, wt{int(iters)} w
)"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT round(CAST(u2 AS DOUBLE) / nullif(2.0 * CAST(n_pos AS DOUBLE)
             * CAST(n_neg AS DOUBLE), 0.0), 6) AS auc,
       round(CAST(n_correct AS DOUBLE) / CAST(n_pos + n_neg
             AS DOUBLE), 6) AS accuracy,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg
FROM (
  SELECT sum(np * (2 * neg_below + nn)) AS u2,
         sum(np) AS n_pos, sum(nn) AS n_neg,
         sum(CASE WHEN s >= 0.5 THEN np ELSE nn END) AS n_correct
  FROM (
    SELECT s, np, nn,
           sum(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nn
             AS neg_below
    FROM (
      SELECT s,
             sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS nn
      FROM scored GROUP BY s
    )
  )
)
"""
