"""Gate rows: dedup families, similarity/ANN, sketches, decontamination arc.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table

from minerva_etl_spark.gate_common import (
    _DECON_BENCH_PRED,
    _DECON_CORPUS_PRED,
    _SHINGLES_SQL,
    _STRATA_RATES,
    _TOKENS_SQL,
    _prep,
    _shingle_stream,
    _token_stream,
)



# =====================================================================
# LLM-pipeline extensions: dedup / similarity / text
# =====================================================================
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs)


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_candidate_pairs(docs)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs).select("id_a", "id_b")
    return D.ngram_jaccard_pairs(docs, pairs)


def _oracle_ngram_jaccard() -> str:
    pairs = D.minhash_pairs_oracle_sql("documents")
    sh = D.shingles_duck_sql("text")
    return f"""
WITH mh AS (
{pairs}
), pairs AS (
  SELECT id_a, id_b FROM mh
), sh AS (
  SELECT doc_id, {sh} AS shingles FROM documents
)
SELECT p.id_a, p.id_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         / CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE)
         AS jaccard
FROM pairs p
JOIN sh a ON a.doc_id = p.id_a
JOIN sh b ON b.doc_id = p.id_b
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs)


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: MinHash-LSH candidate pairs → connected
    components via iterative min-label propagation
    (`operators/dedup.py::connected_components`) — the step that turns
    pair lists into keep/drop decisions at corpus scale.  Oracle:
    DuckDB recursive CTE computing min reachable id over the same pair
    graph."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs)
    return D.connected_components(pairs)


def _oracle_dedup_components() -> str:
    pairs = D.minhash_pairs_oracle_sql("documents")
    return f"""
WITH RECURSIVE pairs AS (
{pairs}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
)
SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS component_id
FROM reach GROUP BY id
"""


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (`operators/dedup.py::contamination_check`):
    flag corpus documents sharing word 4-gram shingles with a held-out
    benchmark slice — the pre-training hygiene step that keeps eval
    questions out of the training set.  The benchmark's distinct shingle
    set is broadcast (eval sets are MBs, corpora TBs); the corpus side is
    one explode + broadcast-hash-join + map-side-combined count."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.expr(_DECON_CORPUS_PRED))
    bench = docs.filter(F.expr(_DECON_BENCH_PRED))
    return D.contamination_check(corpus, bench)


def _oracle_decontamination() -> str:
    return D.contamination_oracle_sql(
        _DECON_CORPUS_PRED, _DECON_BENCH_PRED, "documents"
    )


def q_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination (`operators/bloom.py::
    contamination_check_bloom`): the SAME answer as `decontamination`
    through the 100 TB plan — benchmark shingles folded into a
    broadcast Bloom bitmap (xxhash64 double hashing, JVM-side on both
    build and probe), corpus shingles prefiltered map-side, survivors
    exact-confirmed by a non-broadcast shuffle join.  The oracle IS
    the exact operator's oracle: no false negatives by construction,
    false positives removed by the confirm join — a hash mismatch
    here means the bloom path changed the semantics."""
    _prep(spark)
    from minerva_etl_spark.operators.bloom import contamination_check_bloom

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.expr(_DECON_CORPUS_PRED))
    bench = docs.filter(F.expr(_DECON_BENCH_PRED))
    # 2^16 bits for a few thousand benchmark shingles: realistic load
    # factor, nonzero fpp — the confirm join is load-bearing
    return contamination_check_bloom(
        corpus, bench, num_bits=1 << 16, num_hashes=5
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup (`operators/incremental.py::
    ingest_increment`): two real deliveries through a persisted
    signature store — delivery 1 bootstraps the state with 3/4 of the
    corpus, delivery 2 dedups the remaining quarter against history
    signature-to-signature (history text never rescanned), exact
    digest + banded MinHash (est Jaccard ≥ 0.5), first-seen-wins.
    Oracle: the FULL-RECOMPUTE formulation over history ∪ delta
    restricted to delta rows — pinning incremental == recompute."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.incremental import ingest_increment

    docs = load_table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="minerva_gate_incdedup_")
    state_path = os.path.join(root, "dedup_state")
    ingest_increment(spark, docs.filter("doc_id % 4 < 3"), state_path)
    out = ingest_increment(
        spark, docs.filter("doc_id % 4 = 3"), state_path
    )
    shutil.rmtree(root, ignore_errors=True)  # decisions are checkpointed
    return out


def _oracle_incremental_dedup() -> str:
    from minerva_etl_spark.operators.incremental import (
        dedup_increment_oracle_sql,
    )

    return dedup_increment_oracle_sql(
        "doc_id % 4 < 3", "doc_id % 4 = 3", "documents"
    )


def q_embed_text_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free text embeddings (`operators/text.py::
    embed_text_hashed`): signed feature hashing (md5 bucket + sign
    bit, exact integer bucket sums, half-up 6-dp normalize) — the
    GPU-free vector path that lets semantic dedup / retrieval /
    decontamination run end-to-end from raw text.  One shuffle keyed
    by doc id; the oracle replays the identical hash/sign/round
    arithmetic.

    Gate projection: the dim-16 vector is pivoted into scalar double
    columns e00..e15 — the driver's pandas canonicalizer cannot sort
    raw array cells (the `lifecycle_array_trend` rule).  The
    operator's own API stays array-typed."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return X.embed_text_hashed(docs, dim=16).select(
        "doc_id",
        *[F.col("embedding")[i].alias(f"e{i:02d}") for i in range(16)],
    )


def _oracle_embed_text_hashed() -> str:
    inner = X.embed_text_hashed_oracle_sql("documents", dim=16)
    # DuckDB lists are 1-indexed
    cols = ",\n       ".join(
        f"embedding[{i + 1}] AS e{i:02d}" for i in range(16)
    )
    return f"SELECT doc_id,\n       {cols}\nFROM (\n{inner}\n)"


def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination (`operators/similarity.py::
    semantic_decontamination`): corpus vectors (vec_id % 10 != 0) with
    exact cosine ≥ 0.1 against any benchmark vector (vec_id % 10 = 0)
    — the paraphrase-leakage complement of the shingle-based
    `decontamination` row.  LSH bucket equi-join + broadcast benchmark
    + hoisted-norm rescore; never a cross join."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_decontamination(
        emb.filter("vec_id % 10 != 0"),
        emb.filter("vec_id % 10 = 0"),
        threshold=0.1,
    )


def _oracle_semantic_decontamination() -> str:
    return S.semantic_decontamination_oracle_sql(
        "vec_id % 10 != 0", "vec_id % 10 = 0", threshold=0.1
    )


def q_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup (`operators/incremental.py::
    ingest_embedding_increment`): the text protocol's vector twin —
    two real deliveries through a persisted (bucket, norm, vector)
    state; delivery 2 decides the last quarter against history via an
    LSH bucket equi-join + hoisted-norm cosine rescore (history is
    never re-scored against itself).  Oracle: full recompute over
    history ∪ delta restricted to delta rows."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="minerva_gate_incemb_")
    state_path = os.path.join(root, "emb_state")
    ingest_embedding_increment(
        spark, emb.filter("vec_id % 4 < 3"), state_path
    )
    out = ingest_embedding_increment(
        spark, emb.filter("vec_id % 4 = 3"), state_path
    )
    shutil.rmtree(root, ignore_errors=True)  # decisions are checkpointed
    return out


def _oracle_incremental_embedding() -> str:
    from minerva_etl_spark.operators.incremental import (
        embedding_increment_oracle_sql,
    )

    return embedding_increment_oracle_sql(
        "vec_id % 4 < 3", "vec_id % 4 = 3", "embeddings"
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus curation: keep each
    doc iff ``md5_bucket(doc_id) < rate[lang]`` with per-language rates
    (the standard knob for rebalancing language mix in a training set).
    The md5 bucket is engine-independent and stable under reruns,
    repartitioning, and restarts — the property a 100 TB curation job
    needs (Bernoulli `sample()` is neither reproducible across plans
    nor stratified).

    The per-language rate is looked up through a tiny BROADCAST table
    rather than a CASE chain (r16; guide §2.4/§7.2): the keep filter
    referenced ``lang_pred`` through the CASE, so predicate pushdown
    inlined the whole stopword-profile fold into the filter — the
    token split ran ~40x per row interpreted (the blown-up predicate
    also fell out of whole-stage codegen).  A filter that references
    the build side of a join cannot be pushed below it, so the
    language fold now runs exactly once per row; same rows out
    (oracle-identical), measured 1.9 -> 1.05 s at sf0.1."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    lang = X.with_language_id(docs)
    bucket = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint"),
        F.lit(100),
    )
    rates = spark.createDataFrame(
        [(lg, r) for lg, r in _STRATA_RATES.items()],
        "lang_pred string, __rate int",
    )
    return (
        lang.withColumn("__bucket", bucket)
        .join(F.broadcast(rates), "lang_pred", "left")
        .filter(F.col("__bucket") < F.coalesce(F.col("__rate"), F.lit(100)))
        .select(
            "doc_id", "lang_pred",
            F.col("__bucket").cast("bigint").alias("sample_bucket"),
        )
    )


def _oracle_sample_stratified() -> str:
    langid = X.language_id_oracle_sql("documents")
    rate = "CAST(NULL AS INTEGER)"
    for lg, r in _STRATA_RATES.items():
        rate = f"CASE WHEN lang_pred = '{lg}' THEN {r} ELSE {rate} END"
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
        " % 100"
    )
    return f"""
WITH lang AS (
{langid}
)
SELECT doc_id, lang_pred, CAST({bucket} AS BIGINT) AS sample_bucket
FROM lang
WHERE {bucket} < coalesce({rate}, 100)
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline END-STEP: MinHash-LSH pairs → connected
    components → keep-best-per-cluster by quality score
    (`operators/dedup.py::keep_best_per_component`) — the decision
    table that actually drops near-duplicates while keeping the best
    exemplar.  Oracle: the recursive-CTE components joined with the
    quality expression and the same rank window."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs)
    comps = D.connected_components(pairs)
    scored = X.with_quality_score(docs).select("doc_id", "quality_score")
    return D.keep_best_per_component(scored, comps)


def _oracle_dedup_canonical() -> str:
    comps = _oracle_dedup_components()
    quality = X.quality_oracle_sql("documents")
    return f"""
WITH comps AS (
{comps}
),
scored AS (
  SELECT doc_id, quality_score FROM ({quality}) q
),
labeled AS (
  SELECT s.doc_id, coalesce(c.component_id, s.doc_id) AS component_id,
         s.quality_score
  FROM scored s LEFT JOIN comps c ON s.doc_id = c.doc_id
)
SELECT doc_id, component_id,
       CAST(count(*) OVER (PARTITION BY component_id) AS BIGINT)
           AS n_members,
       row_number() OVER (PARTITION BY component_id
                          ORDER BY quality_score DESC, doc_id) = 1 AS keep
FROM labeled
"""


def q_dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, keep-first (`operators/text.py::
    dedup_segments_keep_first`): every exact 4-word segment survives
    only at its first corpus occurrence (doc id, then position) — the
    scalable analog of suffix-array sequence dedup.  Two shuffles
    (digest window + per-doc rebuild); segment text flows through the
    shuffle because the winner set is corpus-sized (unlike
    boilerplate_strip's broadcast-back)."""
    _prep(spark)
    from minerva_etl_spark.operators.text import dedup_segments_keep_first

    docs = load_table(spark, sf_dir, "documents")
    return dedup_segments_keep_first(docs, seg_words=4)


def _oracle_dedup_segments() -> str:
    from minerva_etl_spark.operators.text import dedup_segments_oracle_sql

    return dedup_segments_oracle_sql("documents", 4)


#: shared by the Spark row and its oracle: the planted-duplicate
#: corpus for `dedup_substring` — the first 24 tokens of doc 0 become
#: a "boilerplate template" APPENDED to docs ≡1 (mod 7) and PREPENDED
#: to docs ≡4 (mod 7), so duplicated ≥w spans exist at different
#: positions, overlap document content, and merge across consecutive
#: shingles (the Lee et al. failure mode paragraph digests miss).
_SUBSTR_W = 8


def _substr_corpus_spark(docs: DataFrame) -> DataFrame:
    tmpl = docs.filter("doc_id = 0").select(
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, 24))"
        ).alias("__tmpl")
    )
    return docs.crossJoin(F.broadcast(tmpl)).select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 7 = 1 THEN concat(text, ' ', __tmpl) "
            "WHEN doc_id % 7 = 4 THEN concat(__tmpl, ' ', text) "
            "ELSE text END"
        ).alias("text"),
    )


_SUBSTR_CORPUS_SQL = """(
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 7 = 1 THEN d.text || ' ' || t.__tmpl
              WHEN d.doc_id % 7 = 4 THEN t.__tmpl || ' ' || d.text
              ELSE d.text END AS text
  FROM documents d CROSS JOIN (
    SELECT array_to_string(
             list_slice(string_split(text, ' '), 1, 24), ' ') AS __tmpl
    FROM documents WHERE doc_id = 0) t
)"""


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-SCALE exact substring dedup (`operators/substring.py::
    substring_dedup` — the r11 verdict's ask 6, the sorted-shingle
    formulation of Lee et al.'s suffix-array overlap rule): every
    duplicated ≥8-token span is removed at all but its first
    ``(doc, pos)`` occurrence, evaluated per TOKEN so overlapping and
    boundary-crossing duplicates merge — strictly stronger than
    `dedup_segments`' paragraph digests.  The corpus plants a 24-token
    template into 2/7 of docs at opposite ends (see
    `_substr_corpus_spark`) so span merging, keep-first tie-breaks,
    and coverage rebuild are all exercised.  One combinable digest
    groupBy (the suffix-sort stand-in) + one per-doc rebuild
    shuffle — never all-pairs."""
    _prep(spark)
    from minerva_etl_spark.operators.substring import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(_substr_corpus_spark(docs), w=_SUBSTR_W)


def _oracle_dedup_substring() -> str:
    from minerva_etl_spark.operators.substring import (
        substring_dedup_oracle_sql,
    )

    return substring_dedup_oracle_sql(_SUBSTR_CORPUS_SQL, w=_SUBSTR_W)


def q_dedup_substring_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL substring dedup (`operators/substring.py::
    build_substring_state` / `substring_increment` — the signature-
    state protocol applied to the Lee et al. rule, r12): the planted
    corpus's first half builds a digest-keyed state (one row per
    distinct shingle, first occurrence pinned), the second half
    arrives as one delivery that joins its shingles against history —
    history text is never rescanned — and the delivery's output is
    IDENTICAL to the full-corpus batch run restricted to the delta
    (ascending-id deliveries; the oracle replays exactly that).
    Every dedup family in the engine now has its incremental
    variant."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.substring import (
        build_substring_state,
        substring_increment,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = _substr_corpus_spark(docs)
    root = tempfile.mkdtemp(prefix="minerva_gate_substr_inc_")
    path = root + "/state"
    build_substring_state(
        spark, corpus.filter("doc_id < 250"), path, w=_SUBSTR_W
    )
    out = substring_increment(
        spark, corpus.filter("doc_id >= 250"), path, w=_SUBSTR_W
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_dedup_substring_increment() -> str:
    from minerva_etl_spark.operators.substring import (
        substring_dedup_oracle_sql,
    )

    inner = substring_dedup_oracle_sql(
        _SUBSTR_CORPUS_SQL, w=_SUBSTR_W
    ).strip()
    return f"""
SELECT * FROM ({inner}) WHERE doc_id >= 250
"""


def q_dedup_substring_increment_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BUCKETED substring-dedup state, driver-proven (r14 — the
    r13 verdict's ask 3): same planted corpus and same delivery
    protocol as `dedup_substring_increment`, but the digest state
    persists ``bucketBy(64, digest)`` (`operators/substring.py::
    build_substring_state_bucketed`) so the per-delivery history join
    reads the state WITHOUT an exchange — the 100 TB-of-history scale
    path.  Decisions must equal the plain-parquet variant (the
    differential-Exchange pytest pins the plan shape; THIS row pins
    the values against the full-corpus oracle restricted to the
    delta)."""
    _prep(spark)
    import shutil
    import tempfile
    import uuid

    from minerva_etl_spark.operators.substring import (
        build_substring_state_bucketed,
        substring_increment_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = _substr_corpus_spark(docs)
    root = tempfile.mkdtemp(prefix="minerva_gate_substr_bkt_")
    tbl = f"substr_state_bkt_{uuid.uuid4().hex[:8]}"
    try:
        build_substring_state_bucketed(
            spark, corpus.filter("doc_id < 250"), tbl, w=_SUBSTR_W,
            path=root + "/state",
        )
        out = substring_increment_bucketed(
            spark, corpus.filter("doc_id >= 250"), tbl, w=_SUBSTR_W,
            path=root + "/state",
        )  # localCheckpointed inside, before the state mutates
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(root, ignore_errors=True)
    return out


def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch (`operators/sketch.py::kmv_sketch` — the
    corpus-stats sketch family, r12): the 64 smallest distinct md5
    hashes of the document token stream, plus the exact-integer
    distinct estimate derived from the k-th value.  TakeOrdered plan
    (per-partition top-k), never a global sort; mergeability is
    pytest-pinned."""
    _prep(spark)
    from minerva_etl_spark.operators.sketch import (
        kmv_estimate_expr,
        kmv_sketch,
    )

    sk = kmv_sketch(_shingle_stream(spark, sf_dir), "item", k=64)
    return sk.withColumn(
        "estimate",
        F.when(
            F.col("pos") == 64, kmv_estimate_expr(64)
        ).otherwise(F.lit(None).cast("bigint")),
    )


def _oracle_sketch_kmv() -> str:
    from minerva_etl_spark.operators.sketch import kmv_oracle_sql

    inner = kmv_oracle_sql(_SHINGLES_SQL + " t", "item", k=64).strip()
    return f"""
WITH sk AS ({inner})
SELECT pos, h,
       CASE WHEN pos = 64
            THEN CAST((CAST(63 AS HUGEINT)
                       * CAST({1 << 60} AS HUGEINT))
                      // CAST(h AS HUGEINT) AS BIGINT)
            ELSE NULL END AS estimate
FROM sk
"""


def q_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct estimate (`operators/sketch.py::hll_registers` +
    `hll_estimate`): md5-bucketed registers (m=256, one combinable
    groupBy), exact integer harmonic numerator, ONE pinned IEEE
    division for the raw Flajolet estimate — bit-identical in the
    oracle because both engines divide the same BIGINT the same
    way."""
    _prep(spark)
    from minerva_etl_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    regs = hll_registers(_shingle_stream(spark, sf_dir), "item", b=8)
    return hll_estimate(regs, b=8)


def _oracle_sketch_hll() -> str:
    from minerva_etl_spark.operators.sketch import hll_oracle_sql

    return hll_oracle_sql(_SHINGLES_SQL + " t", "item", b=8)


def q_sketch_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy-hitter estimates (`operators/sketch.py::
    cm_sketch`/`cm_query`): a 4×256 exact-BIGINT sketch over the full
    token stream, point-queried for the distinct tokens of the first
    five documents.  CM never underestimates (pytest-pinned vs true
    counts); the oracle replays cells and min-queries exactly."""
    _prep(spark)
    from minerva_etl_spark.operators.sketch import cm_query, cm_sketch

    toks = _token_stream(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    queries = docs.filter("doc_id < 5").select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    sk = cm_sketch(toks, "token", d=4, w=256)
    return cm_query(sk, queries, "token", d=4, w=256)


def _oracle_sketch_cm() -> str:
    from minerva_etl_spark.operators.sketch import cm_oracle_sql

    return cm_oracle_sql(
        _TOKENS_SQL,
        "token",
        """(
  SELECT token AS item FROM (
    SELECT unnest(string_split(text, ' ')) AS token
    FROM documents WHERE doc_id < 5
  ) WHERE token <> ''
)""",
        d=4,
        w=256,
    )


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-20 against the vec_id=0 embedding."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("query_vec")
        )
    )
    scored = emb.filter(F.col("vec_id") != 0).crossJoin(query).select(
        "vec_id", S.cosine_expr("embedding", "query_vec").alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(20)


def _oracle_sim_topk() -> str:
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.embedding AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    norm_e = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    norm_q = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    return f"""
SELECT e.vec_id, round({dot} / nullif({norm_e} * {norm_q}, 0.0), 6) AS cosine
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id ASC
LIMIT 20
"""


def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search, fully oracle-checkable: centroids are seeded from
    data points (embeddings of vec_id < 8, k-means++-style seeding with
    no iterative refinement), assignment is argmax rounded-cosine with
    centroid-id tie-break, and the search probes the 2 centroids nearest
    the vec_id=100 query (driver-side — the centroid table is tiny BY
    DESIGN) then exact-rescores only those clusters via the real
    :func:`ivf_search` path (cluster filter = partition-prunable at
    scale)."""
    _prep(spark)
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "centroid_id",
        S.cosine_expr("embedding", "cvec").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "centroid_id")
    )
    centroids = [
        [float(x) for x in r.cvec]
        for r in cent.orderBy("centroid_id").collect()  # 8 rows: bounded
    ]
    query_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 100).collect()[0].embedding
    ]
    return S.ivf_search(assigned, centroids, query_vec, k=10, n_probe=2)


def _oracle_sim_ivf() -> str:
    def cos(a: str, b: str) -> str:
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(CAST({a} AS DOUBLE[]), "
            f"CAST({b} AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
        )
        norm_a = (
            f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({a} AS DOUBLE[]), x -> x * x)), "
            f"(acc, v) -> acc + v))"
        )
        norm_b = (
            f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({b} AS DOUBLE[]), x -> x * x)), "
            f"(acc, v) -> acc + v))"
        )
        return f"({dot} / nullif({norm_a} * {norm_b}, 0.0))"

    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 100),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({cos('e.embedding', 'c.cvec')}, 6) DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings e, cent c
  ) WHERE rn = 1
),
probes AS (
  SELECT centroid_id FROM (
    SELECT c.centroid_id,
           row_number() OVER (
             ORDER BY {cos('c.cvec', 'q.qvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM cent c, q
  ) WHERE rn <= 2
)
SELECT a.vec_id, round({cos('a.embedding', 'q.qvec')}, 6) AS cosine
FROM assigned a JOIN probes USING (centroid_id), q
ORDER BY cosine DESC, a.vec_id ASC
LIMIT 10
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (`operators/similarity.py::
    semantic_dedup`): nearest-centroid clustering (seeded from vec_id <
    8, as sim_ivf) then within-cluster cosine ε-ball pruning keeping the
    lowest-id representative.  Pairwise work is an equi-join on the
    cluster id — quadratic within a cluster only, never across the
    corpus."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    return S.semantic_dedup(emb, cent, threshold=0.3)


def _oracle_semantic_dedup() -> str:
    def cos(a: str, b: str) -> str:
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(CAST({a} AS DOUBLE[]), "
            f"CAST({b} AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
        )
        norm = lambda x: (  # noqa: E731
            f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({x} AS DOUBLE[]), x -> x * x)), "
            f"(acc, v) -> acc + v))"
        )
        return f"round({dot} / nullif({norm(a)} * {norm(b)}, 0.0), 6)"

    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {cos('e.embedding', 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM embeddings e, cent c
  ) WHERE rn = 1
),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {cos('a.embedding', 'b.embedding')} >= 0.3
)
SELECT s.vec_id, s.centroid_id, (d.vec_id IS NULL) AS kept
FROM assigned s LEFT JOIN dup d ON s.vec_id = d.vec_id
"""


def q_sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: top-5 neighbors for each query vector (vec_id < 5)."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = S.knn_join_topk(
        emb.filter(F.col("vec_id") >= 5), queries, k=5
    )
    return out


def _oracle_sim_knn() -> str:
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.embedding AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    norm_e = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    norm_q = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    return f"""
SELECT query_id, vec_id, cosine FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round({dot} / nullif({norm_e} * {norm_q}, 0.0), 6) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY round({dot} / nullif({norm_e} * {norm_q}, 0.0), 6) DESC,
                                     e.vec_id ASC) AS rn
  FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
  WHERE e.vec_id >= 5
) WHERE rn <= 5
"""


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: sign-bucket LSH prune + exact rescore.  Neighbors
    are only searched inside the query's bucket (equi-join on bucket
    instead of a cross join — the 100 TB posture)."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    dims = list(range(8))
    indexed = S.lsh_sign_bucket(emb, dims)
    queries = indexed.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("bucket"),
    )
    cands = indexed.filter(F.col("vec_id") >= 5).join(
        F.broadcast(queries), "bucket"
    )
    scored = cands.select(
        "query_id",
        "vec_id",
        S.cosine_expr("embedding", "query_vec").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


def _oracle_sim_ann_lsh() -> str:
    def bucket_sql(alias: str) -> str:
        bits = [
            f"CASE WHEN {alias}.embedding[{d + 1}] >= 0 THEN '1' ELSE '0' END"
            for d in range(8)
        ]
        return " || ".join(bits)

    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(CAST(e.embedding AS DOUBLE[]), "
        "CAST(q.embedding AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    norm_e = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(e.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    norm_q = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(CAST(q.embedding AS DOUBLE[]), x -> x * x)), "
        "(acc, v) -> acc + v))"
    )
    return f"""
SELECT query_id, vec_id, cosine FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         round({dot} / nullif({norm_e} * {norm_q}, 0.0), 6) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY round({dot} / nullif({norm_e} * {norm_q}, 0.0), 6) DESC,
                                     e.vec_id ASC) AS rn
  FROM embeddings e
  JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
    ON ({bucket_sql('e')}) = ({bucket_sql('q')})
  WHERE e.vec_id >= 5
) WHERE rn <= 5
"""


# =====================================================================
# Embedding near-dup + classic OLAP shapes
# =====================================================================
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: LSH sign-bucket candidates, exact
    rescore, keep pairs with cosine ≥ 0.3.  Same bucket-join-not-
    cross-join shape as sim_ann_lsh (the 100 TB dedup path)."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    indexed = S.lsh_sign_bucket(emb, list(range(8))).withColumn(
        "__norm", S.norm_expr("embedding")
    )
    a = indexed.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        F.col("__norm").alias("__na"),
        "bucket",
    )
    b = indexed.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        F.col("__norm").alias("__nb"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        S.cosine_from_norms_expr("vec_a", "vec_b", "__na", "__nb").alias(
            "cosine"
        ),
    )
    return scored.filter(F.col("cosine") >= 0.3)


def _oracle_dedup_embedding() -> str:
    def bucket_sql(alias: str) -> str:
        bits = [
            f"CASE WHEN {alias}.embedding[{d + 1}] >= 0 THEN '1' ELSE '0' END"
            for d in range(8)
        ]
        return " || ".join(bits)

    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])), p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    norm = lambda al: (  # noqa: E731
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(CAST({al}.embedding AS DOUBLE[]), x -> x * x)), "
        f"(acc, v) -> acc + v))"
    )
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({dot} / nullif({norm('a')} * {norm('b')}, 0.0), 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON ({bucket_sql('a')}) = ({bucket_sql('b')}) AND a.vec_id < b.vec_id
WHERE round({dot} / nullif({norm('a')} * {norm('b')}, 0.0), 6) >= 0.3
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: band the 60-bit fingerprint into
    2×30-bit chunks, bucket-join on any equal chunk (catches every pair
    with hamming ≤ 1 and near-dups generally; exact hamming attached
    for verification).  30-bit bands keep coincidental collisions
    negligible at corpus scale."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    # signatures are tiny (one long per doc): materialize once so the
    # band self-join broadcasts them instead of recomputing the
    # aggregation per side
    sh = D.simhash(docs).localCheckpoint(eager=True)
    chunks = sh.select(
        "doc_id", "simhash",
        *[
            F.expr(f"(simhash div {1 << (30 * c)}) % {1 << 30}")
            .alias(f"chunk_{c}")
            for c in range(2)
        ],
    )
    melted = chunks.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(c), F.col(f"chunk_{c}").cast("string"))
                for c in range(2)
            ])
        ).alias("band"),
    )
    l = melted.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band"
    )
    r = melted.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "band"
    )
    pairs = (
        l.join(r, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return pairs.select(
        "id_a", "id_b", hamming.cast("bigint").alias("hamming")
    )


def q_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming-radius search: 4×15-bit pigeonhole banding finds
    EVERY pair within hamming ≤ 3 (oracle = brute-force all-pairs, so a
    hash match proves perfect recall, not plausibility)."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_banded_pairs(docs, bands=4, radius=3)


def _oracle_simhash_hamming() -> str:
    return D.simhash_banded_pairs_oracle_sql("documents", radius=3)


def _oracle_simhash_pairs() -> str:
    sims = D.simhash_oracle_sql("documents")
    chunk_cols = ",\n    ".join(
        f"(simhash // {1 << (30 * c)}) % {1 << 30} AS chunk_{c}"
        for c in range(2)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, '{c}:' || CAST(chunk_{c} AS VARCHAR) AS band FROM chunks"
        for c in range(2)
    )
    return f"""
WITH sims AS (
{sims}
), chunks AS (
  SELECT doc_id, simhash, {chunk_cols} FROM sims
), melted AS (
{band_union}
), pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
         l.simhash AS sh_a, r.simhash AS sh_b
  FROM melted l JOIN melted r ON l.band = r.band
  WHERE l.doc_id < r.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM pairs
"""


# =====================================================================
# Round-7 additions: k-means trainer, per-key caps, TF-IDF keywords
# =====================================================================


def q_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (`operators/kmeans.py::kmeans_fit`):
    2 assign→update rounds from the 4 lowest-id seed vectors, then the
    final assignment.  Centroid updates snap elements to a 6-dp integer
    grid and sum exactly (order-independent BIGINT), so the fitted
    centroids — and therefore every assignment — are bit-identical to
    the unrolled SQL oracle."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cent = KM.kmeans_fit(emb, k=4, iters=2)
    return assigned


def _oracle_kmeans_fit() -> str:
    return KM.kmeans_oracle_sql("embeddings", k=4, iters=2)


def q_sim_ivf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF k-NN join (`operators/similarity.py::ivf_join`):
    corpus-vs-corpus retrieval where both sides are DataFrames — train
    centroids with the oracle-matched `kmeans_fit` (k=4, 2 rounds),
    assign the corpus, take every 25th vector as the query set, probe
    each query's 2 nearest centroids, equi-join candidates on
    centroid_id (no cross join), rescore exact rounded cosine, and
    keep the per-query top-5 through the skew-safe two-level cap.
    Oracle: the single-window formulation over the identical chain."""
    _prep(spark)
    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    _assigned, cent = KM.kmeans_fit(emb, k=4, iters=2)
    assigned = assign_centroids(emb, cent)
    queries = emb.filter("vec_id % 25 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivf_join(queries, assigned, cent, k=5, n_probe=2)


def _oracle_sim_ivf_join() -> str:
    from minerva_etl_spark.operators.similarity import ivf_join_oracle_sql

    return ivf_join_oracle_sql(
        kmeans_k=4, kmeans_iters=2, query_pred="vec_id % 25 = 0",
        k=5, n_probe=2,
    )


def q_sim_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF retrieval (`operators/incremental.py::
    build_ivf_state` / `ivf_increment` / `ivf_state_query`): fit
    centroids on the first three quarters of the corpus (oracle-matched
    Lloyd's, k=4, 2 rounds), persist (centroids, assignment), deliver
    the last quarter as an increment — assigned against the FROZEN
    centroids via one broadcast join over the delta only — then answer
    every 25th vector's top-5 against the persisted state through the
    plan-locked `ivf_join`.  Oracle: train on the history predicate,
    assign the FULL corpus at those fixed centroids, identical
    probe/equi-join/top-k — proving delta-assign == full-refit
    retrieval at fixed centroids (the daily-crawl shape: history
    vectors are never re-scored when an increment lands)."""
    _prep(spark)
    import os
    import shutil
    import tempfile

    from minerva_etl_spark.operators.incremental import (
        build_ivf_state,
        ivf_increment,
        ivf_state_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="minerva_gate_ivfinc_")
    path = os.path.join(root, "ivf_state")
    build_ivf_state(spark, emb.filter("vec_id % 4 < 3"), path, k=4, iters=2)
    ivf_increment(spark, emb.filter("vec_id % 4 = 3"), path)
    queries = emb.filter("vec_id % 25 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_state_query(
        spark, queries, path, k=5, n_probe=2
    ).localCheckpoint(eager=True)  # pinned before the state dir goes
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_sim_ivf_incremental() -> str:
    from minerva_etl_spark.operators.incremental import (
        ivf_incremental_oracle_sql,
    )

    return ivf_incremental_oracle_sql(
        train_pred="vec_id % 4 < 3",
        query_pred="vec_id % 25 = 0",
        kmeans_k=4,
        kmeans_iters=2,
        k=5,
        n_probe=2,
    )


#: Version salt for the on-disk prebuilt IVF state (bump when the
#: state layout or the fixture parameters change — stale /tmp state
#: from an older code era must never be reused).
_IVF_STATE_VERSION = "r10a"


def _ivf_prebuilt_state(spark: SparkSession, sf_dir: str) -> str:
    """Build (at most once per machine per sf_dir per version) and
    reuse the persisted IVF state used by `q_sim_ivf_query`, so that
    row times the RETRIEVAL join — `operators/incremental.py::
    ivf_state_query` — rather than state construction (the r9
    verdict's ask: the query-path latency of the persisted IVF was
    unmeasured because `sim_ivf_incremental` rebuilds state in-row).
    Contents are deterministic (seeded Lloyd's on deterministic
    fixtures), so reuse == rebuild."""
    import hashlib
    import os
    import tempfile

    from minerva_etl_spark.operators.incremental import (
        build_ivf_state,
        ivf_increment,
    )

    tag = hashlib.md5(
        f"{_IVF_STATE_VERSION}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"minerva_ivf_state_{tag}"
    )
    path = os.path.join(root, "ivf_state")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        emb = load_table(spark, sf_dir, "embeddings")
        build_ivf_state(
            spark, emb.filter("vec_id % 4 < 3"), path, k=4, iters=2
        )
        ivf_increment(spark, emb.filter("vec_id % 4 = 3"), path)
        with open(marker, "w") as fh:
            fh.write(_IVF_STATE_VERSION)
    return path


def q_sim_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF QUERY path (`operators/incremental.py::
    ivf_state_query`): answer every 10th vector's top-3 against the
    prebuilt (centroids + assignment) state — same state shape as
    `sim_ivf_incremental` (train on 3/4 of the corpus, one frozen-
    centroid increment), but the state is built once per process and
    cached on disk, so this row's cost IS the retrieval join:
    broadcast centroid probe → candidate equi-join on centroid_id →
    skew-safe top-k.  Oracle: fixed-centroid train + full-corpus
    assign + identical probe/rescore, exactly as the incremental
    oracle proves delta-assign == full-refit."""
    _prep(spark)
    from minerva_etl_spark.operators.incremental import ivf_state_query

    path = _ivf_prebuilt_state(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 10 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivf_state_query(spark, queries, path, k=3, n_probe=2)


def _oracle_sim_ivf_query() -> str:
    from minerva_etl_spark.operators.incremental import (
        ivf_incremental_oracle_sql,
    )

    return ivf_incremental_oracle_sql(
        train_pred="vec_id % 4 < 3",
        query_pred="vec_id % 10 = 0",
        kmeans_k=4,
        kmeans_iters=2,
        k=3,
        n_probe=2,
    )


_IVF_PQ_STATE_VERSION = "r11b"


def _ivf_pq_prebuilt_state(spark: SparkSession, sf_dir: str) -> str:
    """Disk-cached QUANTIZED IVF state for `q_sim_ivf_pq` — the
    `_ivf_prebuilt_state` pattern: built at most once per machine per
    (sf_dir, version), so the gate/bench row times the retrieval
    (integer-dot candidate rank + exact rescore), not the fit.
    Deterministic contents (seeded Lloyd's + floor-half-up int8), so
    reuse == rebuild."""
    import hashlib
    import os
    import tempfile

    from minerva_etl_spark.operators.quantize import build_ivf_state_q

    tag = hashlib.md5(
        f"{_IVF_PQ_STATE_VERSION}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"minerva_ivf_pq_state_{tag}"
    )
    path = os.path.join(root, "ivf_pq_state")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        emb = load_table(spark, sf_dir, "embeddings")
        build_ivf_state_q(spark, emb, path, k=4, iters=2)
        with open(marker, "w") as fh:
            fh.write(_IVF_PQ_STATE_VERSION)
    return path


def q_sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-state ANN retrieval (`operators/quantize.py::
    ivf_state_query_q` — the r10 verdict's ask 5): the persisted IVF
    assignment stores int8 payloads ONLY (~4× smaller than the float
    state; SCALE.md "Quantized ANN state"), candidates rank by the
    scale-cancelling integer-dot qcos, the top k·overfetch winners
    join BACK to the full-precision corpus by id, and the exact
    rescore emits the final top-k.  The oracle replays the identical
    quantized pipeline in DuckDB — integer arithmetic makes the
    candidate ranking bit-reproducible, so this is a full value-hash
    row, not a recall bound."""
    _prep(spark)
    from minerva_etl_spark.operators.quantize import ivf_state_query_q

    path = _ivf_pq_prebuilt_state(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivf_state_query_q(
        spark, queries, path, source=emb, k=3, n_probe=2, overfetch=4
    )


def _oracle_sim_ivf_pq() -> str:
    from minerva_etl_spark.operators.quantize import ivf_pq_oracle_sql

    return ivf_pq_oracle_sql(
        kmeans_k=4,
        kmeans_iters=2,
        query_pred="vec_id % 10 = 5",
        k=3,
        n_probe=2,
        overfetch=4,
    )


def q_sim_ivf_pq_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-state DELIVERY cycle (`operators/quantize.py::
    ivf_increment_q`): build the int8 state on 3/4 of the corpus,
    ingest the remaining quarter as one delivery (frozen-centroid
    assign + quantize + append — history payloads never rescanned),
    then query — proving build→increment→query composes and that
    delta-assign at frozen centroids == the full recompute the oracle
    replays (`ivf_pq_oracle_sql` with ``train_pred``).  The float
    state's protocol (`sim_ivf_incremental`), inherited by the
    compressed payload."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.quantize import (
        build_ivf_state_q,
        ivf_increment_q,
        ivf_state_query_q,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="minerva_gate_ivfpq_inc_")
    path = root + "/state"
    build_ivf_state_q(spark, emb.filter("vec_id % 4 < 3"), path, k=4, iters=2)
    ivf_increment_q(spark, emb.filter("vec_id % 4 = 3"), path)
    queries = emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_state_query_q(
        spark, queries, path, source=emb, k=3, n_probe=2, overfetch=4
    ).localCheckpoint(eager=True)  # pinned before the state dir goes
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_sim_ivf_pq_increment() -> str:
    from minerva_etl_spark.operators.quantize import ivf_pq_oracle_sql

    return ivf_pq_oracle_sql(
        kmeans_k=4,
        kmeans_iters=2,
        query_pred="vec_id % 10 = 5",
        k=3,
        n_probe=2,
        overfetch=4,
        train_pred="vec_id % 4 < 3",
    )


_IVF_TPQ_STATE_VERSION = "r12b"


def _ivf_tpq_prebuilt_state(spark: SparkSession, sf_dir: str) -> str:
    """Disk-cached TRAINED-PQ state for `q_sim_ivf_tpq` — the
    `_ivf_pq_prebuilt_state` pattern (built at most once per machine
    per (sf_dir, version); deterministic seeded Lloyd's ⇒ reuse ==
    rebuild), so the gate/bench row times retrieval (ADC LUT fold +
    exact rescore), not the two k-means fits."""
    import hashlib
    import os
    import tempfile

    from minerva_etl_spark.operators.pq import build_ivf_pq_state

    tag = hashlib.md5(
        f"{_IVF_TPQ_STATE_VERSION}:{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"minerva_ivf_tpq_state_{tag}"
    )
    path = os.path.join(root, "ivf_tpq_state")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        emb = load_table(spark, sf_dir, "embeddings")
        build_ivf_pq_state(
            spark, emb, path, coarse_k=4, coarse_iters=2,
            m=16, pq_k=16, pq_iters=2, dim=64,
        )
        with open(marker, "w") as fh:
            fh.write(_IVF_TPQ_STATE_VERSION)
    return path


def q_sim_ivf_tpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED product quantization retrieval (`operators/pq.py` — the
    r11 verdict's ask 5, the compression step past int8): per-subspace
    L2-Lloyd's codebooks (m=16 × pq_k=16 over 64 dims — 4 dims per
    subspace, the classic PQ shape), an m-BYTE code word + one integer
    reconstruction norm as the entire per-vector payload (64 bytes of
    int8 vector data → 16 — SCALE.md "Trained PQ"),
    IVFADC serving: coarse probe → candidate equi-join moving only
    codes → exact-BIGINT ADC LUT fold → k·overfetch → exact rescore
    by id.  The oracle replays fit→encode→LUT→rank closed-form; every
    ranking input is integer-derived or a pinned IEEE fold, so this is
    a full value-hash row, not a recall bound."""
    _prep(spark)
    from minerva_etl_spark.operators.pq import ivf_pq_state_query

    path = _ivf_tpq_prebuilt_state(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivf_pq_state_query(
        spark, queries, path, source=emb, k=3, n_probe=2, overfetch=10
    )


def _oracle_sim_ivf_tpq() -> str:
    from minerva_etl_spark.operators.pq import ivf_tpq_oracle_sql

    return ivf_tpq_oracle_sql(
        coarse_k=4,
        coarse_iters=2,
        m=16,
        d_sub=4,
        pq_k=16,
        pq_iters=2,
        query_pred="vec_id % 10 = 5",
        k=3,
        n_probe=2,
        overfetch=10,
    )


def q_sim_ivf_tpq_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-PQ DELIVERY cycle (`operators/pq.py::ivf_pq_increment`):
    fit coarse centroids + codebooks on 3/4 of the corpus, ingest the
    remaining quarter as one delivery (frozen-parameter coarse-assign
    + PQ-encode + append — history payloads never rescanned), then
    query — proving build→increment→query composes and that frozen-
    parameter delta-encode == the full recompute the oracle replays
    (`ivf_tpq_oracle_sql` with ``train_pred``).  The int8 state's
    protocol (`sim_ivf_pq_increment`), inherited by the m-byte
    payload."""
    _prep(spark)
    import shutil
    import tempfile

    from minerva_etl_spark.operators.pq import (
        build_ivf_pq_state,
        ivf_pq_increment,
        ivf_pq_state_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="minerva_gate_tpq_inc_")
    path = root + "/state"
    build_ivf_pq_state(
        spark, emb.filter("vec_id % 4 < 3"), path,
        coarse_k=4, coarse_iters=2, m=16, pq_k=16, pq_iters=2, dim=64,
    )
    ivf_pq_increment(spark, emb.filter("vec_id % 4 = 3"), path)
    queries = emb.filter("vec_id % 10 = 5").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = ivf_pq_state_query(
        spark, queries, path, source=emb, k=3, n_probe=2, overfetch=10
    ).localCheckpoint(eager=True)  # pinned before the state dir goes
    shutil.rmtree(root, ignore_errors=True)
    return out


def _oracle_sim_ivf_tpq_increment() -> str:
    from minerva_etl_spark.operators.pq import ivf_tpq_oracle_sql

    return ivf_tpq_oracle_sql(
        coarse_k=4,
        coarse_iters=2,
        m=16,
        d_sub=4,
        pq_k=16,
        pq_iters=2,
        query_pred="vec_id % 10 = 5",
        k=3,
        n_probe=2,
        overfetch=10,
        train_pred="vec_id % 4 < 3",
    )


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (`operators/bitext.py::mine_bitext`
    — the Artetxe & Schwenk ratio margin behind CCMatrix): vec_id
    quarter 0 plays the source language, quarter 1 the target
    (quarters, not halves, so the bench row's bipartite product stays
    ~1.5M pairs at sf0.1 — the quadratic bounded-side path is the
    point, the suite clock is not); every pair's rounded cosine feeds
    DECIMAL-exact top-4 neighborhood averages, the fixed-association
    margin normalizes hubs away, and each source keeps its
    best-margin target above 1.05.  The oracle replays the identical
    product/window/margin chain — a neighborhood-average,
    association-order, or tiebreak bug hash-mismatches."""
    _prep(spark)
    from minerva_etl_spark.operators.bitext import (
        bitext_candidates,
        mine_bitext,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter("vec_id % 4 = 0").select(
        F.col("vec_id").alias("src_id"), "embedding"
    )
    tgt = emb.filter("vec_id % 4 = 1").select(
        F.col("vec_id").alias("tgt_id"), "embedding"
    )
    return mine_bitext(
        bitext_candidates(src, tgt), k=4, threshold=1.05
    )


def _oracle_bitext_mine() -> str:
    from minerva_etl_spark.operators.bitext import bitext_mine_oracle_sql

    return bitext_mine_oracle_sql(
        "vec_id % 4 = 0", "vec_id % 4 = 1", k=4, threshold=1.05
    )


def q_bitext_mine_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus×corpus bitext mining over ANN candidates — the
    documented hand-off path (`operators/bitext.py::mine_bitext` fed
    by `similarity.ivf_join` candidates instead of the full bipartite
    product, the CCMatrix/FAISS-shard shape): centroids train on the
    TARGET quarter (oracle-matched `kmeans_fit`, k=4, 2 rounds), each
    source vector probes its 2 nearest centroids, candidates
    equi-join on centroid_id and keep the per-source top-8 rounded
    cosines, and the SAME DECIMAL-exact margin chain mines each
    source's best pair above threshold.  At 100 TB both sides are
    unbounded — this row pins that the quadratic `bitext_candidates`
    product is replaceable by the probe-pruned candidate graph with
    zero changes to the margin engine."""
    _prep(spark)
    from minerva_etl_spark.operators.bitext import mine_bitext
    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter("vec_id % 4 = 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    tgt = emb.filter("vec_id % 4 = 1")
    _assigned, cent = KM.kmeans_fit(tgt, k=4, iters=2)
    assigned = assign_centroids(tgt, cent)
    cand = ivf_join(src, assigned, cent, k=8, n_probe=2).select(
        F.col("query_id").alias("src_id"),
        F.col("vec_id").alias("tgt_id"),
        "cosine",
    )
    return mine_bitext(cand, k=4, threshold=1.02)


def _oracle_bitext_mine_ann() -> str:
    from minerva_etl_spark.operators.bitext import (
        bitext_mine_ann_oracle_sql,
    )

    return bitext_mine_ann_oracle_sql(
        "vec_id % 4 = 0", "vec_id % 4 = 1",
        kmeans_k=4, kmeans_iters=2, cand_k=8, n_probe=2,
        k=4, threshold=1.02,
    )


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe per-key document cap (`operators/skew.py::
    cap_per_key`): keep the 5 largest documents per (lang, source) —
    the "at most N pages per domain" crawl-curation rule.  Two-level
    salted row_number: a hot key sorts in `salt_buckets` parallel tasks
    first, then only the ≤ n×buckets survivors hit the per-key window;
    result provably equals the single-window formulation because the
    order (n_chars DESC, doc_id ASC) is total."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = SK.cap_per_key(
        docs,
        keys=["lang", "source"],
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
        n=5,
        salt_col="doc_id",
        salt_buckets=8,
    )
    return out.select("doc_id", "lang", "source", "n_chars", "rank")


def _oracle_domain_cap() -> str:
    return """
SELECT doc_id, lang, source, n_chars, CAST(rank AS INT) AS rank FROM (
  SELECT doc_id, lang, source, n_chars,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents
) WHERE rank <= 5
"""


def q_semantic_dedup_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL published SemDeDup recipe (`operators/kmeans.py::
    semantic_dedup_trained`): Lloyd's k-means (6 clusters, 2 rounds)
    trains the centroids, then within-cluster cosine ε-ball pruning
    keeps the lowest-id representative — corpus in, keep/drop out,
    every arithmetic step oracle-matched (the standalone
    `semantic_dedup` row consumes fixed seed centroids instead)."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return KM.semantic_dedup_trained(emb, k=6, iters=2, threshold=0.3)


def _oracle_semantic_dedup_trained() -> str:
    return KM.semantic_dedup_trained_oracle_sql(
        "embeddings", k=6, iters=2, threshold=0.3
    )


def q_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (`operators/split.py::
    leakage_safe_split`): near-dup components (same MinHash-LSH pair
    graph as `dedup_components`) draw ONE md5 ticket per component rep,
    so a template page and all its clones land on the same side of the
    train/test fence.  90/5/5 at exact basis-point thresholds."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_candidate_pairs(docs)
    comps = D.connected_components(pairs)
    return SPL.leakage_safe_split(
        docs, comps, {"train": 0.9, "val": 0.05, "test": 0.05}, seed=42
    )


def _oracle_leakage_split() -> str:
    return SPL.leakage_split_oracle_sql(
        _oracle_dedup_components(),
        "documents",
        {"train": 0.9, "val": 0.05, "test": 0.05},
        seed=42,
    )
