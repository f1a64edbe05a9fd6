"""One-call corpus curation pipeline.

Composes the individually-proven curation stages into the shape a
pretraining data team actually runs, end to end:

1. **quality filter** — linear classifier logit ≥ 0
   (`text.classify_quality`);
2. **near-dup dedup** — MinHash-LSH candidate pairs → connected
   components → keep the best-quality exemplar per cluster
   (`dedup.minhash_candidate_pairs` / `connected_components` /
   `keep_best_per_component`);
3. **benchmark decontamination** — drop documents sharing word 4-gram
   shingles with the held-out eval set
   (`dedup.contamination_check`);
4. **export** — temperature source mixing → seeded shuffle →
   token-budget shard packing (`mixing.curated_export`).

Every stage keeps its individual scale shape (broadcast benchmark
shingles, band-join-not-cross-join dedup, n-buckets mixing rates,
distributed prefix-sum packing); composition adds joins on the doc id
only — no stage ever re-shuffles another stage's payload.  The whole
pipeline is a pure function of (corpus, benchmark, parameters), so the
DuckDB oracle recomputes it as one SQL expression and the driver gate
hash-matches the final shard assignment — the strongest end-to-end
correctness statement in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators.mixing import curated_export
from minerva_etl_spark.operators.text import classify_quality


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    alpha: float = 0.5,
    shard_tokens: int = 100_000,
    shuffle_seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    boilerplate_max_docs: int | None = None,
    cap_per_source: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Run the full curation pipeline; returns the export table
    ``(doc_id, copy, n_tokens, shard_id)`` over the surviving corpus.

    Stage parameters stay at the stage defaults (MinHash 16 hashes /
    4 bands / 3-shingles; 4-gram decontamination) — they are the knobs
    the individual operators expose for standalone use.

    ``cap_per_source`` (optional) caps the post-decontamination corpus
    at N documents per source — highest quality score (original-text
    logit) first, doc-id tie-break — via the skew-safe two-level
    salted cap (`skew.cap_per_key`), the "at most N pages per domain"
    rule applied at its standard place: after cleaning, before mixing.

    ``boilerplate_max_docs`` (optional) inserts a boilerplate-strip
    stage between the quality filter and near-dup dedup: segments
    repeated across ≥ that many documents are removed from every text
    (`text.remove_boilerplate_segments`, inheriting its size guard),
    documents stripped to nothing are dropped, and every downstream
    stage — shingling, decontamination, token counts — sees the
    rewritten text.  Quality scores stay assessed on the ORIGINAL text
    (the filter already ran), restricted to the surviving documents so
    a stripped-empty doc can never win its dedup cluster.

    ``materialize`` (default True) localCheckpoints the two corpus
    frames that feed multiple downstream branches (the quality-kept
    corpus feeds pairing, scoring, and the dedup join; the deduped
    corpus feeds decontamination and export) — without it each branch
    re-runs the quality classifier over the raw scan.  Pass False to
    keep pure lineage when the caller persists intermediates itself.
    """
    # classify_quality already scores every row in the same codegen
    # scan that decides `keep`, so the quality-kept corpus WITH its
    # score is one filter-project over that scan — the pre-r16 shape
    # (a separate two-column score table joined back onto the docs)
    # paid an extra pass plus an extra join/exchange for data this
    # pipeline already had in hand (guide §2.4: don't re-join what one
    # projection carries).
    doc_cols = list(docs.columns)
    scored = classify_quality(docs, text_col)
    kept = scored.filter("keep").select(*doc_cols, "quality_score")
    if materialize:
        kept = kept.localCheckpoint(eager=True)

    if boilerplate_max_docs is not None:
        from minerva_etl_spark.operators.text import (
            remove_boilerplate_segments,
        )

        bp = remove_boilerplate_segments(
            kept, max_docs=boilerplate_max_docs,
            id_col=id_col, text_col=text_col,
        )
        kept = kept.drop(text_col).join(
            bp.filter(F.col("new_text") != "").select(
                id_col, F.col("new_text").alias(text_col)
            ),
            id_col,
        )
        if materialize:
            kept = kept.localCheckpoint(eager=True)

    # the decision table's input: id + score of every surviving doc
    # (a projection of `kept`, not a re-join)
    q = kept.select(id_col, "quality_score")

    pairs = D.minhash_candidate_pairs(kept, text_col=text_col, id_col=id_col)
    comps = D.connected_components(pairs)
    decision = D.keep_best_per_component(q, comps, id_col=id_col)
    winners = decision.filter("keep").select(id_col)
    deduped = kept.join(winners, id_col)
    if materialize:
        deduped = deduped.localCheckpoint(eager=True)

    contaminated = D.contamination_check(
        deduped, benchmark, text_col=text_col, id_col=id_col
    ).select(id_col)
    clean = deduped.join(contaminated, id_col, "left_anti")

    if cap_per_source is not None:
        from minerva_etl_spark.operators.skew import cap_per_key

        # `clean` still carries quality_score — no join needed to rank
        capped = cap_per_key(
            clean,
            keys=[source_col],
            order_by=[
                F.col("quality_score").desc(), F.col(id_col).asc()
            ],
            n=cap_per_source,
            salt_col=id_col,
        )
        clean = capped.drop("rank")

    # the export consumes its input twice (mix-rate aggregation + the
    # pack pass): materialize the final corpus once so the
    # decontamination explode / cap windows don't re-run per consumer
    if materialize:
        clean = clean.localCheckpoint(eager=True)
    return curated_export(
        clean.drop("quality_score"),
        alpha=alpha,
        shard_tokens=shard_tokens,
        shuffle_seed=shuffle_seed,
        source_col=source_col,
        id_col=id_col,
        text_col=text_col,
    )


def curate_corpus_oracle_sql(
    table: str,
    corpus_pred: str,
    bench_pred: str,
    alpha: float = 0.5,
    shard_tokens: int = 100_000,
    shuffle_seed: int = 0,
    source_col: str = "source",
    boilerplate_max_docs: int | None = None,
    cap_per_source: int | None = None,
) -> str:
    """DuckDB twin of :func:`curate_corpus` over one table split into
    corpus/benchmark by predicates — the stage oracles chained as CTEs
    (quality → [boilerplate rewrite] → recursive components →
    keep-best → shingle anti-join → curated export)."""
    from minerva_etl_spark.operators.dedup import (
        minhash_pairs_oracle_sql,
        shingles_duck_sql,
    )
    from minerva_etl_spark.operators.mixing import curated_export_oracle_sql
    from minerva_etl_spark.operators.text import (
        boilerplate_segments_ctes,
        quality_classifier_oracle_sql,
        quality_oracle_sql,
    )

    sh = shingles_duck_sql("text", 4)
    if boilerplate_max_docs is not None:
        bp_chain, bp_final = boilerplate_segments_ctes(
            "kept", max_docs=boilerplate_max_docs, prefix="bp_"
        )
        # MATERIALIZED: DuckDB otherwise inlines these CTEs and re-runs
        # the whole strip chain at every downstream reference (measured
        # 177 s -> 16 s at 500 docs)
        bp_ctes = f"""{bp_chain},
bp AS MATERIALIZED (
{bp_final}
),
corpus AS MATERIALIZED (
  SELECT k.* EXCLUDE (text), bp.new_text AS text
  FROM kept k JOIN bp ON k.doc_id = bp.doc_id
  WHERE bp.new_text <> ''
),"""
        # scores stay computed on the ORIGINAL kept text, restricted to
        # boilerplate survivors — mirrors the Spark stage exactly
        scored_src = (
            "SELECT qq.doc_id, qq.quality_score FROM ({q}) qq "
            "JOIN corpus k2 ON qq.doc_id = k2.doc_id"
        )
    else:
        bp_ctes = "corpus AS (SELECT * FROM kept),"
        scored_src = "SELECT doc_id, quality_score FROM ({q}) qq"
    if cap_per_source is not None:
        cap_cte = f"""final_corpus AS (
  SELECT * EXCLUDE (quality_score, __rnk) FROM (
    SELECT c.*, s.quality_score,
           row_number() OVER (
             PARTITION BY c.{source_col}
             ORDER BY s.quality_score DESC, c.doc_id ASC) AS __rnk
    FROM clean c JOIN scored s USING (doc_id)
  ) WHERE __rnk <= {int(cap_per_source)}
)"""
    else:
        cap_cte = "final_corpus AS (SELECT * FROM clean)"
    return f"""
WITH RECURSIVE
corpus_in AS (SELECT * FROM {table} WHERE {corpus_pred}),
qflag AS ({quality_classifier_oracle_sql("corpus_in")}),
kept AS MATERIALIZED (
  SELECT c.* FROM corpus_in c JOIN qflag ON c.doc_id = qflag.doc_id
  WHERE qflag.keep
),
{bp_ctes}
pairs AS ({minhash_pairs_oracle_sql("corpus")}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
),
comps AS (
  SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component_id
  FROM reach GROUP BY id
),
scored AS (
  {scored_src.format(q=quality_oracle_sql("kept"))}
),
labeled AS (
  SELECT s.doc_id, coalesce(c.component_id, s.doc_id) AS component_id,
         s.quality_score
  FROM scored s LEFT JOIN comps c ON s.doc_id = c.doc_id
),
winners AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (
      PARTITION BY component_id
      ORDER BY quality_score DESC, doc_id) AS rn
    FROM labeled
  ) WHERE rn = 1
),
deduped AS (SELECT k.* FROM corpus k JOIN winners USING (doc_id)),
dsh AS (SELECT doc_id, {sh} AS shingles FROM deduped),
bsh AS (
  SELECT DISTINCT unnest({sh}) AS s FROM {table} WHERE {bench_pred}
),
contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, unnest(shingles) AS s FROM dsh) c
  JOIN bsh USING (s)
  WHERE s <> ''
),
clean AS (
  SELECT d.* FROM deduped d
  LEFT JOIN contaminated x USING (doc_id)
  WHERE x.doc_id IS NULL
),
{cap_cte}
SELECT * FROM (
{curated_export_oracle_sql("final_corpus", alpha, None, shard_tokens, shuffle_seed, source_col)}
) export
"""
