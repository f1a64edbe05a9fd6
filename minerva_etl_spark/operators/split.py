"""Leakage-safe train/val/test splitting.

Splitting a corpus doc-by-doc leaks: two near-duplicate documents land
on opposite sides of the train/test fence and the benchmark measures
memorization.  The fix every serious pipeline uses: split by near-dup
CLUSTER, not by document — every member of a connected component draws
the same ticket, so a template page and its 40k clones are either all
train or all held out.

Mechanics: documents join their component representative (docs in no
candidate pair are their own singleton rep), the rep — never the doc —
is hashed into a 10 000-bucket md5 draw (the engine's standard
reproducible-sampling idiom: engine-independent, stable under reruns,
repartitioning and restarts, unlike Bernoulli ``sample()``), and
cumulative basis-point thresholds carve the buckets into named splits.
Fractions are validated to sum to 1 at 4-decimal resolution so the
bucket→split mapping is exact integer arithmetic — no float boundary
ambiguity cross-engine.

Scale shape: one equi-join of the corpus against the membership table
(NOT broadcast — near-dup components can cover a large corpus
fraction; AQE handles the skewed reps), then a codegen'd projection.
No shuffle beyond the join.

Reference: extension (the reference has no training-split surface);
the cluster-level split rule follows the dedup literature (Lee et al.
2022 recommend removing or co-assigning near-dup clusters to avoid
train/test contamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: split resolution: fractions are snapped to basis points (1/10000)
_BUCKETS = 10_000


def _thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    bps = {name: round(frac * _BUCKETS) for name, frac in fractions.items()}
    total = sum(bps.values())
    if total != _BUCKETS:
        raise ValueError(
            f"split fractions must sum to 1 at 1/{_BUCKETS} resolution "
            f"(got {total}/{_BUCKETS})"
        )
    out, acc = [], 0
    for name, bp in bps.items():
        acc += bp
        out.append((name, acc))
    return out


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    fractions: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    component_id_col: str = "component_id",
) -> DataFrame:
    """Assign every document a split such that all members of a
    near-dup component share it.

    ``components`` is :func:`dedup.connected_components` output
    (``id_col``, ``component_id_col``); absent docs are singleton
    components of themselves.  ``fractions`` maps split name →
    fraction, in priority order, summing to 1.

    Returns ``(id, component_id, split_bucket, split)``.
    """
    thresholds = _thresholds(fractions)
    rep = F.coalesce(F.col(component_id_col), F.col(id_col))
    labeled = docs.select(id_col).join(
        components.select(id_col, component_id_col), id_col, "left"
    ).select(id_col, rep.alias(component_id_col))
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(seed)),
                        F.col(component_id_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(_BUCKETS),
    )
    split = F.lit(None).cast("string")
    for name, cum in reversed(thresholds):
        split = F.when(F.col("split_bucket") < cum, F.lit(name)).otherwise(
            split
        )
    return (
        labeled.withColumn("split_bucket", bucket.cast("bigint"))
        .withColumn("split", split)
    )


def leakage_split_oracle_sql(
    components_sql: str,
    table: str,
    fractions: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    component_id_col: str = "component_id",
) -> str:
    """DuckDB twin: ``components_sql`` must yield (id, component_id)
    exactly as the Spark components frame does."""
    thresholds = _thresholds(fractions)
    cc = component_id_col
    bucket = (
        f"CAST(('0x' || substr(md5('{seed}' || ':' || "
        f"CAST({cc} AS VARCHAR)), 1, 15)) AS BIGINT) % {_BUCKETS}"
    )
    case = "CAST(NULL AS VARCHAR)"
    for name, cum in reversed(thresholds):
        case = f"CASE WHEN split_bucket < {cum} THEN '{name}' ELSE {case} END"
    return f"""
WITH comps AS (
{components_sql}
),
labeled AS (
  SELECT d.{id_col},
         coalesce(c.{component_id_col}, d.{id_col}) AS {cc}
  FROM {table} d LEFT JOIN comps c ON d.{id_col} = c.{id_col}
),
bucketed AS (
  SELECT {id_col}, {cc},
         CAST({bucket} AS BIGINT) AS split_bucket
  FROM labeled
)
SELECT {id_col}, {cc}, split_bucket, {case} AS split
FROM bucketed
"""
