"""Preference-pair construction for DPO/RLHF post-training data.

Post-training preference corpora are (prompt, chosen, rejected)
records: a prompt is sampled n ways (best-of-n), every candidate is
scored by a reward model or human ranking, and the pair keeps the
best and worst candidates when the best is strictly better.  Given a
scored-candidate table ``(prompt_id, cand_id, response, score)`` this
operator emits ONE pair per prompt:

- ``chosen``   = highest score, ties broken to the LOWEST ``cand_id``;
- ``rejected`` = lowest score, ties broken to the lowest ``cand_id``;
- prompts with fewer than two scored candidates are dropped;
- pairs must have ``margin = score_chosen - score_rejected`` strictly
  greater than ``min_margin`` (default 0: a prompt whose candidates
  all tie yields no training signal and is dropped).

Determinism: the tiebreaks make the output a pure function of the
candidate table — no RNG, no plan/partitioning dependence (pinned by
``tests/test_preference.py``).

Scale shape: ONE map-side-combinable ``groupBy(prompt_id)`` —
``max_by``/``min_by`` over struct ordering keys partial-aggregate, so
no window, no sort, and no per-prompt group materialization.  The
per-prompt candidate count is bounded by the sampling fan-out (the n
of best-of-n), so there is no skew hazard; the shuffle carries one
struct per (prompt, partition), not the candidate set.

Reference: extension (the reference engine has no post-training
surface); the record shape is the public DPO data format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def preference_pairs(
    cands: DataFrame,
    prompt_col: str = "prompt_id",
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "cand_id",
    min_margin: float = 0.0,
) -> DataFrame:
    """Build one (chosen, rejected) pair per prompt from scored
    candidates.

    Returns ``(prompt_id, n_cands, chosen, rejected, score_chosen,
    score_rejected, margin)`` where ``n_cands`` counts the prompt's
    scored candidates (null score/response rows are ignored) and
    ``margin > min_margin`` strictly.
    """
    valid = cands.filter(
        F.col(score_col).isNotNull() & F.col(response_col).isNotNull()
    )
    # Ordering keys as structs: max_by wants (score, -id) so a score
    # tie resolves to the lowest cand_id; min_by wants (score, id)
    # for the same lowest-id rule on the rejected side.  Both are
    # declarative aggregates — partial aggregation (map-side combine)
    # applies, unlike a row_number window.
    best = F.expr(
        f"max_by(named_struct('r', {response_col}, 's', {score_col}), "
        f"named_struct('s', {score_col}, 'i', -{id_col}))"
    )
    worst = F.expr(
        f"min_by(named_struct('r', {response_col}, 's', {score_col}), "
        f"named_struct('s', {score_col}, 'i', {id_col}))"
    )
    agg = valid.groupBy(F.col(prompt_col)).agg(
        F.count(F.lit(1)).alias("n_cands"),
        best.alias("__b"),
        worst.alias("__w"),
    )
    out = agg.select(
        F.col(prompt_col),
        F.col("n_cands"),
        F.col("__b.r").alias("chosen"),
        F.col("__w.r").alias("rejected"),
        F.col("__b.s").alias("score_chosen"),
        F.col("__w.s").alias("score_rejected"),
        (F.col("__b.s") - F.col("__w.s")).alias("margin"),
    )
    return out.filter(
        (F.col("n_cands") >= 2) & (F.col("margin") > F.lit(float(min_margin)))
    )


def preference_pairs_oracle_sql(
    cands_sql: str,
    prompt_col: str = "prompt_id",
    response_col: str = "response",
    score_col: str = "score",
    id_col: str = "cand_id",
    min_margin: float = 0.0,
) -> str:
    """DuckDB twin of :func:`preference_pairs` over a candidate CTE.

    The oracle spells the same tiebreaks with row_number windows
    (fine for an oracle; the Spark side deliberately avoids windows).
    """
    return f"""
WITH cand AS ({cands_sql}),
valid AS (
  SELECT * FROM cand
  WHERE {score_col} IS NOT NULL AND {response_col} IS NOT NULL
),
ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY {prompt_col}
                       ORDER BY {score_col} DESC, {id_col} ASC) AS rb,
    row_number() OVER (PARTITION BY {prompt_col}
                       ORDER BY {score_col} ASC, {id_col} ASC) AS rw,
    count(*) OVER (PARTITION BY {prompt_col}) AS n_cands
  FROM valid
)
SELECT b.{prompt_col} AS {prompt_col},
       CAST(b.n_cands AS BIGINT) AS n_cands,
       b.{response_col} AS chosen,
       w.{response_col} AS rejected,
       b.{score_col} AS score_chosen,
       w.{score_col} AS score_rejected,
       b.{score_col} - w.{score_col} AS margin
FROM (SELECT * FROM ranked WHERE rb = 1) b
JOIN (SELECT * FROM ranked WHERE rw = 1) w
  ON b.{prompt_col} = w.{prompt_col}
WHERE b.n_cands >= 2
  AND b.{score_col} - w.{score_col} > {float(min_margin)!r}
"""
