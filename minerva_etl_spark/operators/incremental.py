"""Incremental corpus dedup: persisted signature state + delta dedup.

The trend side of the engine has a full incremental protocol — modified
log + fingerprint staleness (`materialize/fingerprint.py`, mirroring
reference `src/minerva/commands/trend_store.py:908-963` and
`aggregation_compilation.py:773-785`).  This module applies the same
design to the LLM-curation side: ingesting a new crawl increment must
not re-read 100 TB of historical text.  The **dedup state** is one row
per ever-ingested document — a normalized content digest plus the
16-hash MinHash signature (~150 bytes/doc, ~10⁻⁶ of the text it
indexes) — enough to answer both exact- and near-dup questions against
all of history signature-to-signature.

The state keeps EVERY ingested doc's signature, kept and dropped alike.
That is load-bearing for recompute-equivalence: if dropped docs left
the state, a new doc C that collides only with dropped B (itself a dup
of kept A) would sail through incrementally while a full recompute
flags it — the same reason the reference's modified log records every
modification, not just surviving ones.

Scale shape: the history side of every decision is the state table
(signatures, never text); history-vs-delta near-dup candidates come
from a band equi-join (state melts to (band_key, id) — 4 rows/doc);
delta-vs-delta runs the ordinary LSH self-join on the delta only.  The
state append serializes under the same :class:`~minerva_etl_spark.
fsutil.StoreLease` protocol as the trend stores' modified log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.fsutil import (
    StoreLease,
    fs_create_atomic,
    parquet_exists,
    path_exists,
)
from minerva_etl_spark.operators.dedup import (
    MINHASH_COEFFS,
    MINHASH_PRIME,
    _base_hash_duck,
    minhash_signatures,
    shingles_duck_sql,
)
from minerva_etl_spark.operators.text import tokens_duck_sql, tokens_spark_sql


def build_dedup_state(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """(doc_id, content_key, mh_0..mh_{k-1}) for every document.

    ``content_key`` is the normalized-token digest `exact_dedup` uses;
    the signature columns are `minhash_signatures`'s.  Every doc has at
    least one shingle (short docs shingle to their whole text), so the
    join is total — one state row per input doc, always.
    """
    keys = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(
            F.array_join(F.expr(tokens_spark_sql(text_col)), " ")
        ).alias("content_key"),
    )
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_size
    ).withColumnRenamed(id_col, "doc_id")
    return keys.join(sigs, "doc_id")


def append_dedup_state(
    spark: SparkSession, state: DataFrame, path: str
) -> None:
    """Append a delta's signatures to the persisted state under the
    store-lease protocol (same single-writer rule as the trend stores'
    modified-log append — two concurrent appends serialize here).

    NOTE: callers composing read-state -> decide -> append (the ingest
    cycle) must hold the lease across ALL THREE steps, not just the
    append — otherwise two concurrent deliveries can each read state
    lacking the other's delta and neither dedups against the other.
    :func:`ingest_increment` / :func:`ingest_embedding_increment` do
    exactly that via :func:`_state_lease`."""
    with _state_lease(spark, path):
        state.write.mode("append").parquet(path)


def _state_lease(spark: SparkSession, path: str) -> StoreLease:
    return StoreLease(spark, path.rstrip("/") + ".__lease")


def read_dedup_state(spark: SparkSession, path: str) -> DataFrame:
    if not parquet_exists(spark, path):
        raise FileNotFoundError(f"no dedup state at {path}")
    return spark.read.parquet(path)


def _band_cols(num_hashes: int, bands: int) -> list:
    rows_per_band = num_hashes // bands
    cols = []
    for b in range(bands):
        parts = [
            f"mh_{i}"
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        cols.append(
            F.md5(F.concat_ws(",", F.lit(b), *parts)).alias(f"band_{b}")
        )
    return cols


def _melt_bands(state: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    banded = state.select(F.col("doc_id"), *_band_cols(num_hashes, bands))
    return banded.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"band_{b}") for b in range(bands)])
        ).alias("band_key"),
    )


def dedup_increment(
    delta_state: DataFrame,
    history_state: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup a delta against all of history WITHOUT reading history
    text — both sides are signature-state frames from
    :func:`build_dedup_state`.

    Per delta doc: ``exact_dup_of`` = the lowest doc id (history or
    lower-id delta) sharing its content digest, ``near_dup_of`` = the
    lowest doc id among LSH band-mates with estimated Jaccard ≥
    ``threshold``, ``keep`` = neither fired.  Decisions are exactly
    what a full recompute over history ∪ delta would say about the
    delta rows (pinned by the ``incremental_dedup`` oracle row and the
    two-delivery pytest) — "first seen wins", the same canonical rule
    as `keep_best_per_component`'s min-id default.

    Plan: one union of the two signature frames (history text never
    rescanned), an exact groupBy-min on the digest, a band equi-join
    melt (4 rows/doc) against delta bands, and a map-side-combinable
    min per delta doc.  No window, no cross join; AQE handles band
    skew the same way `minhash_candidate_pairs` relies on it.

    The signature columns RIDE the band melt (r16, the
    `minhash_candidate_pairs` shape): the verify step is a filter on
    data the band join already carries, so the pre-r16 candidate
    ``distinct`` + two signature re-joins (three exchanges) collapse
    into the one band-join exchange — duplicate band collisions are
    harmless under the final ``min`` aggregate.
    """
    assert num_hashes % bands == 0
    all_state = history_state.select(delta_state.columns).unionByName(
        delta_state
    )
    # exact: lowest id per digest over history ∪ delta, joined back
    min_per_key = all_state.groupBy("content_key").agg(
        F.min("doc_id").alias("__min_id")
    )
    exact = (
        delta_state.select("doc_id", "content_key")
        .join(min_per_key, "content_key")
        .select(
            "doc_id",
            "content_key",
            F.when(F.col("__min_id") < F.col("doc_id"), F.col("__min_id"))
            .cast("bigint")
            .alias("exact_dup_of"),
        )
    )
    # near: band-mates with lower id, signature-verified in the band
    # join itself (signatures ride the melt; no re-join, no distinct)
    sig_struct = F.struct(
        *[F.col(f"mh_{i}") for i in range(num_hashes)]
    )
    melted_all = all_state.select(
        F.col("doc_id").alias("partner_id"),
        sig_struct.alias("__sig_h"),
        F.explode(F.array(*_band_cols(num_hashes, bands))).alias(
            "band_key"
        ),
    )
    melted_delta = delta_state.select(
        "doc_id",
        sig_struct.alias("__sig_d"),
        F.explode(F.array(*_band_cols(num_hashes, bands))).alias(
            "band_key"
        ),
    )
    matches = sum(
        F.when(
            F.col("__sig_d")[f"mh_{i}"] == F.col("__sig_h")[f"mh_{i}"], 1
        ).otherwise(0)
        for i in range(num_hashes)
    )
    near = (
        melted_delta.join(melted_all, "band_key")
        .filter(F.col("partner_id") < F.col("doc_id"))
        .filter(
            matches.cast("double") / F.lit(float(num_hashes))
            >= F.lit(float(threshold))
        )
        .groupBy("doc_id")
        .agg(F.min("partner_id").cast("bigint").alias("near_dup_of"))
    )
    return (
        exact.join(near, "doc_id", "left")
        .select(
            "doc_id",
            "content_key",
            "exact_dup_of",
            "near_dup_of",
            (
                F.col("exact_dup_of").isNull()
                & F.col("near_dup_of").isNull()
            ).alias("keep"),
        )
    )


def ingest_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The full delivery cycle: signature the delta, dedup it against
    the persisted state, append the delta's signatures, return the
    per-doc decisions.  First delivery bootstraps an empty state.  The
    returned frame is computed BEFORE the append (a doc is never
    compared against itself).

    The store lease is held across read-state -> decide -> append, so
    two concurrent deliveries fully serialize: the second sees the
    first's signatures and dedups against them (signature work for the
    delta itself is computed before the lease is taken — only the
    history-dependent steps run under it)."""
    delta_state = build_dedup_state(
        new_docs, text_col, id_col, num_hashes, shingle_size
    ).localCheckpoint(eager=True)  # signatures computed once (outside
    # the lease): reused by the decision join AND the append below
    with _state_lease(spark, state_path):
        if parquet_exists(spark, state_path):
            history = read_dedup_state(spark, state_path)
        else:
            history = spark.createDataFrame([], delta_state.schema)
        out = dedup_increment(
            delta_state, history, num_hashes, bands, threshold
        ).localCheckpoint(eager=True)  # decisions pinned before state
        # mutates, still under the lease
        delta_state.write.mode("append").parquet(state_path)
    return out


def dedup_increment_oracle_sql(
    history_pred: str,
    delta_pred: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_size: int = 3,
) -> str:
    """DuckDB twin: the FULL-RECOMPUTE formulation restricted to delta
    rows — the equivalence the incremental path must reproduce.
    ``history_pred``/``delta_pred`` partition ``table`` by a SQL
    predicate over its columns."""
    sh = shingles_duck_sql(text_col, shingle_size)
    toks = tokens_duck_sql(text_col)
    mh_cols = ",\n    ".join(
        f"min(({a} * __h + {b}) % {MINHASH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    )
    rows_per_band = num_hashes // bands
    band_exprs = []
    for b in range(bands):
        parts = " || ',' || ".join(
            f"CAST(mh_{i} AS VARCHAR)"
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        )
        band_exprs.append(f"md5('{b}' || ',' || {parts}) AS band_{b}")
    bands_sql = ",\n    ".join(band_exprs)
    band_union = "\nUNION ALL\n".join(
        f"SELECT {id_col}, band_{b} AS band_key FROM banded"
        for b in range(bands)
    )
    match_sum = " + ".join(
        f"CASE WHEN d.mh_{i} = h.mh_{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    return f"""
WITH scoped AS MATERIALIZED (
  SELECT {id_col}, {text_col},
         ({delta_pred}) AS is_delta
  FROM {table}
  WHERE ({history_pred}) OR ({delta_pred})
),
keys AS MATERIALIZED (
  SELECT {id_col}, is_delta,
         md5(array_to_string({toks}, ' ')) AS content_key
  FROM scoped
),
exacts AS (
  SELECT k.{id_col}, k.content_key,
         CASE WHEN m.min_id < k.{id_col} THEN m.min_id END
           AS exact_dup_of
  FROM keys k
  JOIN (SELECT content_key, CAST(min({id_col}) AS BIGINT) AS min_id
        FROM keys GROUP BY content_key) m USING (content_key)
  WHERE k.is_delta
),
exploded AS (
  SELECT {id_col}, unnest({sh}) AS __shingle FROM scoped
), hashed AS (
  SELECT {id_col}, {_base_hash_duck('__shingle')} AS __h FROM exploded
), sigs AS MATERIALIZED (
  SELECT {id_col},
    {mh_cols}
  FROM hashed
  GROUP BY {id_col}
), banded AS (
  SELECT {id_col},
    {bands_sql}
  FROM sigs
), melted AS (
{band_union}
), near AS (
  SELECT dd.{id_col},
         CAST(min(p.partner) AS BIGINT) AS near_dup_of
  FROM (
    SELECT DISTINCT l.{id_col} AS partner, r.{id_col} AS {id_col}
    FROM melted l JOIN melted r ON l.band_key = r.band_key
    WHERE l.{id_col} < r.{id_col}
  ) p
  JOIN keys dd ON dd.{id_col} = p.{id_col} AND dd.is_delta
  JOIN sigs h ON h.{id_col} = p.partner
  JOIN sigs d ON d.{id_col} = p.{id_col}
  WHERE CAST(({match_sum}) AS DOUBLE) / {float(num_hashes)}
        >= {float(threshold)}
  GROUP BY dd.{id_col}
)
SELECT e.{id_col} AS doc_id, e.content_key,
       CAST(e.exact_dup_of AS BIGINT) AS exact_dup_of,
       n.near_dup_of,
       (e.exact_dup_of IS NULL AND n.near_dup_of IS NULL) AS keep
FROM exacts e LEFT JOIN near n ON n.{id_col} = e.{id_col}
"""


# ---------------------------------------------------------------------
# Embedding-space increments: the same protocol for vector near-dup.
# ---------------------------------------------------------------------


def build_embedding_state(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: "list[int] | None" = None,
) -> DataFrame:
    """(vec_id, bucket, norm, embedding) for every vector — the
    persisted state for :func:`embedding_increment`.

    Unlike the text state (where MinHash signatures suffice), vector
    near-dup needs the vectors themselves for the exact rescore; the
    state is still ~10³ × smaller than the media/text the embeddings
    index, and the LSH bucket + precomputed norm keep every later
    increment a bucket equi-join + one dot product per candidate."""
    from minerva_etl_spark.operators.similarity import (
        lsh_sign_bucket,
        norm_expr,
    )

    return lsh_sign_bucket(
        embeddings, list(bucket_dims or range(8)), id_col, vec_col
    ).select(
        F.col(id_col).alias("vec_id"),
        "bucket",
        norm_expr(vec_col).alias("norm"),
        F.col(vec_col).alias("embedding"),
    )


def embedding_increment(
    delta_state: DataFrame,
    history_state: DataFrame,
    threshold: float = 0.3,
) -> DataFrame:
    """Near-dup decisions for a delta of vectors against all history
    WITHOUT re-scoring history-vs-history — both sides are state frames
    from :func:`build_embedding_state`.

    Per delta vector: ``near_dup_of`` = the lowest id among LSH
    bucket-mates (history or lower-id delta) with exact cosine ≥
    ``threshold``; ``keep`` = no such neighbor.  Decisions equal a full
    recompute over history ∪ delta restricted to the delta rows
    ("first seen wins") — pinned by the ``incremental_embedding``
    oracle row and the two-delivery pytest.

    Plan: one union of the state frames, a bucket equi-join (never a
    cross join), a hoisted-norm rescore (one dot per candidate), and a
    map-side-combinable min per delta vector."""
    from minerva_etl_spark.operators.similarity import (
        cosine_from_norms_expr,
    )

    cols = ["vec_id", "bucket", "norm", "embedding"]
    all_state = history_state.select(cols).unionByName(
        delta_state.select(cols)
    )
    d = delta_state.select(
        F.col("vec_id"),
        "bucket",
        F.col("norm").alias("__nd"),
        F.col("embedding").alias("__vd"),
    )
    h = all_state.select(
        F.col("vec_id").alias("partner_id"),
        "bucket",
        F.col("norm").alias("__nh"),
        F.col("embedding").alias("__vh"),
    )
    near = (
        d.join(h, "bucket")
        .filter(F.col("partner_id") < F.col("vec_id"))
        .filter(
            cosine_from_norms_expr("__vd", "__vh", "__nd", "__nh")
            >= F.lit(float(threshold))
        )
        .groupBy("vec_id")
        .agg(F.min("partner_id").cast("bigint").alias("near_dup_of"))
    )
    return (
        delta_state.select("vec_id")
        .join(near, "vec_id", "left")
        .select(
            "vec_id",
            "near_dup_of",
            F.col("near_dup_of").isNull().alias("keep"),
        )
    )


def ingest_embedding_increment(
    spark: SparkSession,
    new_embeddings: DataFrame,
    state_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    epoch: int | None = None,
) -> DataFrame | None:
    """One embedding-delivery cycle: state the delta, decide it against
    persisted history (bootstrap: everything kept), append the delta's
    state rows.  Returns the decisions.  As in :func:`ingest_increment`
    the store lease is held across read-state -> decide -> append, so
    concurrent deliveries fully serialize.

    ``epoch`` makes the cycle EXACTLY-ONCE for at-least-once callers
    (the streaming ``foreachBatch`` path, which may retry a
    micro-batch after a crash — r16, the CDX epoch-stamp protocol
    applied here): every appended state row is STAMPED with its
    epoch (an internal bigint column readers never project; batch
    callers stamp -1), and each committed epoch additionally drops a
    marker file under ``<state>.__epochs/`` right after the append,
    inside the same lease.  A retry therefore distinguishes every
    crash position:

    * marker present (crash after commit, before/during the caller's
      decision write): the state already carries exactly this delta
      and nothing later (Structured Streaming replays only the LAST
      batch), so the decisions RECOMPUTE from state-minus-this-epoch
      versus the delta — equal to the original output — and return
      for the caller's idempotent partition overwrite;
    * marker absent but the epoch already stamped in the state
      (crash between the append and the marker — the window that was
      at-least-once before r16): the re-append is SKIPPED, the
      marker lands, and the decisions recompute exactly as above.
      No duplicate vectors, ever;
    * neither: the normal cycle runs.

    Legacy states whose files predate the epoch column keep the old
    behavior (marker no-op returns ``None``; appends unstamped) —
    stamping them would split the parquet schema."""
    delta_state = build_embedding_state(
        new_embeddings, id_col, vec_col
    ).localCheckpoint(eager=True)
    marker = (
        f"{state_path.rstrip('/')}.__epochs/{int(epoch)}"
        if epoch is not None
        else None
    )
    with _state_lease(spark, state_path):
        exists = parquet_exists(spark, state_path)
        history = spark.read.parquet(state_path) if exists else None
        has_epoch_col = history is not None and (
            "epoch" in history.columns
        )
        if epoch is not None and has_epoch_col:
            marker_hit = path_exists(spark, marker)
            appended = marker_hit or bool(
                history.filter(
                    F.col("epoch") == int(epoch)
                ).take(1)
            )
            if appended:
                # retried epoch: recompute the decisions from
                # state-minus-this-delta (equal to the original) and
                # make sure the marker is down
                decisions = embedding_increment(
                    delta_state,
                    history.filter(
                        F.col("epoch").isNull()
                        | (F.col("epoch") != int(epoch))
                    ),
                    threshold,
                ).localCheckpoint(eager=True)
                if not marker_hit:
                    fs_create_atomic(spark, marker, "committed")
                return decisions
        elif marker is not None and path_exists(spark, marker):
            return None  # legacy (unstamped) state: old behavior
        if history is not None:
            decisions = embedding_increment(
                delta_state, history, threshold
            )
        else:
            decisions = delta_state.select(
                "vec_id",
                F.lit(None).cast("bigint").alias("near_dup_of"),
            ).withColumn("keep", F.lit(True))
        decisions = decisions.localCheckpoint(eager=True)
        stamped = delta_state
        if not exists or has_epoch_col:
            stamped = delta_state.withColumn(
                "epoch",
                F.lit(int(-1 if epoch is None else epoch)).cast(
                    "bigint"
                ),
            )
        stamped.write.mode("append").parquet(state_path)
        if marker is not None:
            fs_create_atomic(spark, marker, "committed")
    return decisions


def embedding_increment_oracle_sql(
    history_pred: str,
    delta_pred: str,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bucket_dims: int = 8,
    threshold: float = 0.3,
) -> str:
    """DuckDB twin of :func:`embedding_increment` as a FULL recompute
    over history ∪ delta restricted to delta rows: lowest bucket-mate
    id (history or lower-id delta) with exact cosine ≥ threshold —
    pinning incremental == recompute."""

    def bucket_sql(alias: str) -> str:
        bits = [
            f"CASE WHEN {alias}.{vec_col}[{d + 1}] >= 0 "
            "THEN '1' ELSE '0' END"
            for d in range(n_bucket_dims)
        ]
        return " || ".join(bits)

    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip(CAST(a.{vec_col} AS DOUBLE[]), "
        f"CAST(b.{vec_col} AS DOUBLE[])), p -> p[1] * p[2])), "
        "(acc, v) -> acc + v)"
    )

    def norm(al: str) -> str:
        return (
            "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(CAST({al}.{vec_col} AS DOUBLE[]), "
            "x -> x * x)), (acc, v) -> acc + v))"
        )

    cos = f"round({dot} / nullif({norm('a')} * {norm('b')}, 0.0), 6)"
    return f"""
WITH pool AS (
  SELECT * FROM {table} WHERE ({history_pred}) OR ({delta_pred})
),
near AS (
  SELECT a.{id_col} AS vec_id,
         CAST(min(b.{id_col}) AS BIGINT) AS near_dup_of
  FROM pool a JOIN pool b
    ON ({bucket_sql('a')}) = ({bucket_sql('b')})
   AND b.{id_col} < a.{id_col}
  WHERE ({delta_pred.replace(id_col, 'a.' + id_col)})
    AND {cos} >= {threshold}
  GROUP BY a.{id_col}
)
SELECT d.{id_col} AS vec_id,
       near.near_dup_of,
       near.near_dup_of IS NULL AS keep
FROM (SELECT {id_col} FROM {table} WHERE {delta_pred}) d
LEFT JOIN near ON d.{id_col} = near.vec_id
"""


# ---------------------------------------------------------------------
# Incremental IVF retrieval: persisted centroids + assignments
# ---------------------------------------------------------------------
#
# `similarity.ivf_join` refits k-means on every call — right for a
# one-shot batch, wrong for the daily-increment shape this module
# exists for.  The IVF state applies the same protocol as the dedup
# states above: fit once, persist (centroids, per-vector assignment),
# and let each delivery assign ONLY its delta against the frozen
# centroids (one broadcast join over the delta — history vectors are
# never re-scored).  Queries run `ivf_join` against the persisted
# assignment.  Delta-assignment against frozen centroids is exactly
# what a full `assign_centroids` over history ∪ delta would produce,
# so incremental == recompute at fixed centroids — pinned by the
# `sim_ivf_incremental` oracle row and the three-delivery pytest.
#
# Recluster trigger: the SCALE.md IVF probe established the k ~ √N
# sizing discipline (fixed k degrades toward all-pairs as N grows).
# Frozen centroids inherit that: when the corpus has grown
# `recluster_factor`× past the fit-time size, per-cluster candidate
# lists have grown the same factor while k should have grown √factor —
# `ivf_needs_recluster` flips and the operator should be re-fit with
# k ~ √N_total (a full `build_ivf_state`; the default 4× matches the
# probe's measured degradation knee).


def _ivf_paths(state_path: str) -> tuple[str, str, str]:
    root = state_path.rstrip("/")
    return root + "/centroids", root + "/assigned", root + "/meta"


def build_ivf_state(
    spark: SparkSession,
    embeddings: DataFrame,
    state_path: str,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + persist the IVF state: oracle-matched Lloyd's centroids
    (`kmeans.kmeans_fit` — deterministic seed, SQL-replayable), full
    corpus assignment, and fit-time size for the recluster trigger.
    Returns the persisted assignment."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import assign_centroids

    cent_p, asg_p, meta_p = _ivf_paths(state_path)
    with _state_lease(spark, state_path):
        _seed_assigned, cent = kmeans_fit(
            embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
        )
        assigned = assign_centroids(
            embeddings, cent, id_col=id_col, vec_col=vec_col
        )
        cent.write.mode("overwrite").parquet(cent_p)
        assigned.write.mode("overwrite").parquet(asg_p)
        n = spark.read.parquet(asg_p).count()  # count the persisted copy
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p, "n_at_fit bigint, n_total bigint", (n, n)
        )
    return spark.read.parquet(asg_p)


def ivf_increment(
    spark: SparkSession,
    new_embeddings: DataFrame,
    state_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One delivery: assign ONLY the delta against the frozen persisted
    centroids (broadcast join over the delta — history untouched),
    append to the assignment state, bump the corpus size.  The lease
    spans read-state → assign → append, as in :func:`ingest_increment`.
    Returns the delta's assignment rows."""
    from minerva_etl_spark.operators.similarity import assign_centroids

    cent_p, asg_p, meta_p = _ivf_paths(state_path)
    with _state_lease(spark, state_path):
        cent = spark.read.parquet(cent_p)
        delta_assigned = assign_centroids(
            new_embeddings, cent, id_col=id_col, vec_col=vec_col
        ).localCheckpoint(eager=True)  # pinned before state mutates
        n_delta = delta_assigned.count()
        delta_assigned.write.mode("append").parquet(asg_p)
        meta = spark.read.parquet(meta_p).collect()[0]  # one row
        from minerva_etl_spark.fsutil import write_one_row_parquet

        write_one_row_parquet(
            spark, meta_p, "n_at_fit bigint, n_total bigint",
            (meta.n_at_fit, meta.n_total + n_delta),
        )
    return delta_assigned


def ivf_needs_recluster(
    spark: SparkSession, state_path: str, recluster_factor: float = 4.0
) -> bool:
    """True once the corpus has grown ``recluster_factor``× past the
    fit-time size — the documented refit point (k ~ √N, SCALE.md)."""
    _, _, meta_p = _ivf_paths(state_path)
    meta = spark.read.parquet(meta_p).collect()[0]
    return meta.n_total >= recluster_factor * meta.n_at_fit


def ivf_state_query(
    spark: SparkSession,
    queries: DataFrame,
    state_path: str,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Answer a query batch against the persisted state — the same
    plan-locked `ivf_join` (broadcast centroids, centroid_id equi-join,
    salted per-query top-k), reading assignment and centroids from
    parquet instead of refitting."""
    from minerva_etl_spark.operators.similarity import ivf_join

    cent_p, asg_p, _ = _ivf_paths(state_path)
    return ivf_join(
        queries,
        spark.read.parquet(asg_p),
        spark.read.parquet(cent_p),
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    )


def ivf_incremental_oracle_sql(
    train_pred: str,
    query_pred: str,
    kmeans_k: int,
    kmeans_iters: int,
    k: int = 5,
    n_probe: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of build_ivf_state(train_pred) + ivf_increment(rest)
    + ivf_state_query: Lloyd's trains on the HISTORY subset only, the
    FULL corpus assigns against those frozen centroids, retrieval runs
    the identical probe/equi-join/top-k chain — proving delta-assign ==
    full-refit retrieval at fixed centroids."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    train = f"(SELECT * FROM {table} WHERE {train_pred})"
    ctes = kmeans_ctes(train, kmeans_k, kmeans_iters, id_col, vec_col)
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
