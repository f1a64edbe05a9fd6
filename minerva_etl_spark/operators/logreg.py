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
    w = logreg_train(df, feature_cols, label_col, iters=iters, lr=lr)
    names = ["bias"] + [f"w_{j + 1}" for j in range(len(feature_cols))]
    rows = [(i, names[i], round(w[i], 6)) for i in range(len(w))]
    return df.sparkSession.createDataFrame(
        rows, "idx int, name string, weight double"
    )


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

    def z(prefix: str) -> str:
        terms = [f"{prefix}.w0"]
        terms += [
            f"{prefix}.w{j + 1} * {c}" for j, c in enumerate(feature_sqls)
        ]
        return " + ".join(terms)

    init = ", ".join(
        f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k + 1)
    )
    ctes = [
        f"d AS MATERIALIZED (SELECT * FROM {table})",
        "n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM d)",
        f"wt0 AS (SELECT {init})",
    ]
    for t in range(int(iters)):
        sig = f"(1.0 / (1.0 + exp(-({z('w')}))))"
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
        upd = ", ".join(
            f"w.w{j} - {float(lr)!r} * ((CAST(g.g{j} AS DOUBLE) "
            f"/ 1000000.0) / n.n) AS w{j}"
            for j in range(k + 1)
        )
        ctes.append(
            f"wt{t + 1} AS (SELECT {upd} FROM wt{t} w, g{t} g, n)"
        )
    names = ["bias"] + [f"w_{j + 1}" for j in range(k)]
    outs = "\nUNION ALL\n".join(
        f"SELECT {i} AS idx, '{names[i]}' AS name, "
        f"round(w{i}, 6) AS weight FROM wt{int(iters)}"
        for i in range(k + 1)
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
{outs}
"""
