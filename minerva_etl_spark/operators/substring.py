"""Corpus-scale exact substring deduplication — the sorted-shingle
formulation of the Lee et al. overlap rule (round 12; the r11
verdict's ask 6).

`operators/text.py::dedup_segments` removes duplicate PARAGRAPHS
(segment digests); the published substring rule (Lee, Ippolito,
Nystrom et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022) is stronger: any ``w``-token window that occurs
verbatim anywhere else in the corpus marks a duplicated SPAN, and
every occurrence except one is removed — regardless of paragraph
boundaries.  The reference implementation builds a corpus-wide suffix
array; a suffix array is a sequential construction that does not
shard.  The equivalent corpus-scale formulation used here:

    a maximal duplicated substring of ≥ w tokens
      ⟺ a maximal run of consecutive duplicated w-shingles

so exact substring dedup at window w reduces to:

1. **Shingle**: every doc emits its ``n_tokens − w + 1`` overlapping
   ``w``-token shingles as ``(doc, pos, md5(shingle))`` — one codegen
   projection (``transform(sequence(...))`` over the token array), no
   join, no Python.
2. **Sort/merge**: ONE map-side-combinable groupBy on the digest
   computes each shingle's global occurrence count and its FIRST
   occurrence ``min(struct(doc_id, pos))`` — this digest shuffle is
   the distributed stand-in for the suffix-array sort, linear in
   corpus tokens, never all-pairs.
3. **Mark**: occurrences of a duplicated digest that are NOT the
   global first occurrence are removable (keep-first, the engine-wide
   dedup convention; the first occurrence is the minimal
   ``(doc_id, pos)`` — deterministic, total order).
4. **Rebuild**: removable positions ship back to their doc (second
   and last shuffle, keyed by doc id); a token survives iff no
   removable shingle covers it, and the kept text is rebuilt in one
   projection.  Overlapping/adjacent duplicated windows merge into
   one span automatically — coverage is evaluated per token.

Guarantee: a token is removed iff it lies inside a ≥ w-token substring
whose text occurs elsewhere in the corpus (or earlier in the same doc)
at an occurrence that precedes this one in ``(doc_id, pos)`` order —
the Lee et al. rule with a pinned, oracle-matchable keep policy.

100 TB shape: step 2's agg combines map-side, so a pathological
shingle (a boilerplate line repeated 10⁹ times) arrives at the reducer
as one partial row per map task, not 10⁹ rows; the join of digest
stats back onto occurrences is a plain equi-join (AQE skew-split
handles hot digests).  Token arrays stay inside one row per document —
nothing here assumes documents fit together in memory, only that ONE
document does (the same bound every per-doc operator in `text.py`
carries).  w=50 at production per the paper; the gate row runs w=8
against the fixture's 10–99-token docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "substring_dedup",
    "build_substring_state",
    "substring_increment",
    "build_substring_state_bucketed",
    "substring_increment_bucketed",
    "substring_dedup_oracle_sql",
]


def substring_dedup(
    docs: DataFrame,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every duplicated ≥ ``w``-token span except its first
    occurrence (see module doc).  Whitespace tokens, as
    `dedup_segments` / the token counters.  Returns one row per input
    doc: ``(id, n_tokens, n_removed, kept_text)`` — docs shorter than
    ``w`` tokens pass through untouched."""
    w = int(w)
    if w < 2:
        raise ValueError(f"w must be >= 2, got {w}")
    base, occ = _occurrences(docs, w, id_col, text_col)
    # the suffix-sort stand-in: ONE combinable agg per digest.
    # DELIBERATELY not checkpointed (r17, measured): the removable
    # join re-executes this subtree (explode + digest exchange), but
    # materializing the distinct-digest stats costs more than the
    # recompute — A/B at sf0.1: 1.69 s/8 jobs lazy vs 2.60 s/11 jobs
    # checkpointed (floor of 6 runs each).  The STATE paths below DO
    # checkpoint their stats because they have a second heavyweight
    # consumer (the state write) and the swap would otherwise read
    # files being replaced; this pure-batch path has only the join.
    stats = occ.groupBy("digest").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("__first"),
    )
    removable = (
        occ.join(stats.filter(F.col("__cnt") >= 2), "digest")
        .filter(
            ~(
                (F.col(id_col) == F.col("__first.d"))
                & (F.col("pos") == F.col("__first.p"))
            )
        )
        .select(id_col, "pos")
    )
    return _rebuild(base, removable, w, id_col)


def _occurrences(
    docs: DataFrame, w: int, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """(base, occ) — the tokenized frame and its shingle occurrences,
    shared by the batch and incremental paths."""
    base = docs.select(
        id_col, F.split(F.col(text_col), " ").alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    occ = (
        base.filter(F.col("__n") >= w)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, __n - {w}), i -> "
                    f"struct(i AS pos, md5(concat_ws(' ', "
                    f"slice(__toks, i + 1, {w}))) AS digest))"
                )
            ).alias("__o"),
        )
        .select(id_col, F.col("__o.pos").alias("pos"), "__o.digest")
    )
    return base, occ


def _rebuild(
    base: DataFrame, removable: DataFrame, w: int, id_col: str
) -> DataFrame:
    """Per-token coverage rebuild shared by both paths."""
    rem = removable.groupBy(id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("__rps")
    )
    kept = (
        f"filter(sequence(0, __n - 1), t -> NOT exists(__rps, "
        f"p -> p <= t AND t < p + {w}))"
    )
    return (
        base.join(rem, id_col, "left")
        .withColumn(
            "__rps",
            F.coalesce("__rps", F.expr("CAST(array() AS ARRAY<INT>)")),
        )
        .select(
            id_col,
            F.col("__n").alias("n_tokens"),
            F.expr(f"__n - size({kept})")
            .cast("bigint")
            .alias("n_removed"),
            F.expr(
                f"concat_ws(' ', transform({kept}, "
                f"i -> element_at(__toks, i + 1)))"
            ).alias("kept_text"),
        )
    )


def build_substring_state(
    spark,
    docs: DataFrame,
    state_path: str,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Initialize the persisted substring-dedup state — one row per
    DISTINCT shingle digest ever seen, carrying its first occurrence
    ``(digest, first_doc, first_pos)`` — and return the initial
    corpus's dedup output (== :func:`substring_dedup`).  The state is
    digest-keyed and grows with distinct shingles, never with
    occurrences (the `incremental.py` signature-state family: history
    payloads are never rescanned by later deliveries)."""
    from minerva_etl_spark.operators.incremental import _state_lease

    w = int(w)
    with _state_lease(spark, state_path):
        base, occ = _occurrences(docs, w, id_col, text_col)
        stats = occ.groupBy("digest").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p")
                )
            ).alias("__first"),
        ).localCheckpoint(eager=True)
        # ^ the digest shuffle (the expensive suffix-sort stand-in)
        # runs ONCE; both consumers below — the state write and the
        # rebuild join — read the materialized blocks instead of each
        # re-running the full shingle scan + exchange (r16)
        stats.select(
            "digest",
            F.col("__first.d").alias("first_doc"),
            F.col("__first.p").alias("first_pos"),
            # epoch stamp (r16): -1 for the batch build; streaming
            # increments stamp their foreachBatch epoch so retries
            # are exactly-once (readers never project this column)
            F.lit(-1).cast("bigint").alias("epoch"),
        ).write.mode("overwrite").parquet(state_path.rstrip("/"))
        _write_watermark(
            spark,
            state_path,
            docs.agg(F.max(id_col)).collect()[0][0],
        )
        removable = (
            occ.join(stats.filter(F.col("__cnt") >= 2), "digest")
            .filter(
                ~(
                    (F.col(id_col) == F.col("__first.d"))
                    & (F.col("pos") == F.col("__first.p"))
                )
            )
            .select(id_col, "pos")
        )
        return _rebuild(base, removable, w, id_col).localCheckpoint(
            eager=True
        )


def _watermark_path(state_path: str) -> str:
    # `_`-prefixed entries are hidden from Spark's parquet file
    # listing, so the sidecar never pollutes reads of the state root.
    return state_path.rstrip("/") + "/_watermark"


def _write_watermark(spark, state_path: str, max_id) -> None:
    """One small text file via the Hadoop FS API (the lease-token
    mechanism) — NOT a Spark write: a 1-row `createDataFrame(...)
    .coalesce(1).write` costs ~6 s of job overhead per call (measured
    r13), which dominated the whole increment."""
    if max_id is None:
        return
    from minerva_etl_spark.fsutil import _fs

    fs, hpath, _jvm = _fs(spark, _watermark_path(state_path), raw=True)
    out = fs.create(hpath, True)  # overwrite; parents auto-created
    try:
        out.write(bytearray(str(int(max_id)).encode()))
    finally:
        out.close()


def _read_watermark(spark, state_path: str):
    """The largest doc id any prior delivery carried, or None for a
    pre-watermark state (best-effort fallback: max(first_doc) from
    the digest state — a floor, since docs contributing no new digest
    don't appear there)."""
    from minerva_etl_spark.fsutil import fs_read_small

    try:
        raw = fs_read_small(spark, _watermark_path(state_path))
        return int(raw) if raw not in (None, "") else None
    except Exception:
        return None


def substring_increment(
    spark,
    delta: DataFrame,
    state_path: str,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    epoch: int | None = None,
) -> DataFrame:
    """One delivery against the persisted state: the delta's shingles
    join the digest-keyed history (an equi-join moving only the
    delta's occurrences — history is never rescanned), every delta
    occurrence of a KNOWN digest is removable, and within the delta
    the usual keep-first applies to NEW digests; new digests append
    to the state inside the lease.

    Delivery ids must ascend (later deliveries carry larger doc ids —
    the append-only ingest order every incremental state here
    assumes); under that order the result is IDENTICAL to running
    :func:`substring_dedup` over history ∪ delta and keeping the
    delta's rows — which is exactly what the
    `dedup_substring_increment` oracle replays closed-form.  The
    assumption is ENFORCED (r12 ADVICE): the state carries a
    ``_watermark`` sidecar with the largest id ever delivered, and a
    delta row at or below it raises instead of silently producing
    keep-first winners that differ from the full-corpus run.

    ``epoch`` (r16 — the CDX epoch-stamp protocol): streaming
    callers stamp each appended digest with its foreachBatch epoch.
    A RETRIED delivery whose digests are already stamped in the
    state (any crash position after the append) recomputes its
    decisions with the state MINUS this epoch's rows as history —
    equal to the original output under last-batch-only replay —
    skips the re-append, and advances the watermark if the crash
    beat it.  Without this, a retry saw its own digests as history
    and removed EVERYTHING from the delivery.  Legacy states without
    the epoch column keep the old watermark-raise behavior."""
    from minerva_etl_spark.operators.incremental import _state_lease

    w = int(w)
    root = state_path.rstrip("/")
    with _state_lease(spark, state_path):
        hist_full = spark.read.parquet(root)
        has_epoch = "epoch" in hist_full.columns
        applied = (
            epoch is not None
            and has_epoch
            and bool(
                hist_full.filter(
                    F.col("epoch") == int(epoch)
                ).take(1)
            )
        )
        hist_rows = (
            hist_full.filter(
                F.col("epoch").isNull()
                | (F.col("epoch") != int(epoch))
            )
            if applied
            else hist_full
        )
        floor = _read_watermark(spark, state_path)
        if floor is None:  # pre-watermark state: best-available floor
            floor = hist_rows.agg(F.max("first_doc")).collect()[0][0]
        bounds = delta.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
        ).collect()[0]
        if (
            not applied
            and floor is not None
            and bounds["lo"] is not None
            and bounds["lo"] <= floor
        ):
            raise ValueError(
                f"substring_increment: delivery carries {id_col}="
                f"{bounds['lo']} <= state watermark {floor}; the "
                f"batch-equivalence guarantee needs ascending "
                f"delivery ids (re-deliver with fresh ids or rebuild "
                f"the state)"
            )
        hist = hist_rows.select("digest").withColumn(
            "__known", F.lit(True)
        )
        base, occ = _occurrences(delta, w, id_col, text_col)
        delta_stats = occ.groupBy("digest").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p")
                )
            ).alias("__first"),
        ).localCheckpoint(eager=True)
        # ^ one digest shuffle serves both the decision join and the
        # state append (r16) — previously the append re-ran the whole
        # delta shingle scan + exchange
        joined = occ.join(delta_stats, "digest").join(
            hist, "digest", "left"
        )
        removable = joined.filter(
            F.coalesce(F.col("__known"), F.lit(False))
            | (
                (F.col("__cnt") >= 2)
                & ~(
                    (F.col(id_col) == F.col("__first.d"))
                    & (F.col("pos") == F.col("__first.p"))
                )
            )
        ).select(id_col, "pos")
        out = _rebuild(base, removable, w, id_col).localCheckpoint(
            eager=True
        )  # pinned before the state mutates
        if not applied:
            append = delta_stats.join(
                hist, "digest", "left_anti"
            ).select(
                "digest",
                F.col("__first.d").alias("first_doc"),
                F.col("__first.p").alias("first_pos"),
            )
            if has_epoch:
                append = append.withColumn(
                    "epoch",
                    F.lit(int(-1 if epoch is None else epoch)).cast(
                        "bigint"
                    ),
                )
            append.write.mode("append").parquet(root)
        if bounds["hi"] is not None and (
            floor is None or bounds["hi"] > floor
        ):
            _write_watermark(
                spark,
                state_path,
                max(bounds["hi"], floor) if floor is not None
                else bounds["hi"],
            )
    return out


def build_substring_state_bucketed(
    spark,
    docs: DataFrame,
    table_name: str,
    w: int = 50,
    n_buckets: int = 64,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Catalog-backed variant of :func:`build_substring_state` for
    100 TB-of-history scale (r13, the r12 verdict's ask 4 — the
    `imagehash.ingest_hash_increment_bucketed` strategy): the digest
    state persists ``bucketBy(n_buckets, digest)``, so every later
    delivery's history join reads the (large) state WITHOUT an
    exchange — only the delta's occurrences shuffle to the bucket
    layout.  Same lease discipline, same output as the parquet-path
    variant (proven equal by test)."""
    from minerva_etl_spark.fsutil import StoreLease

    w = int(w)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    root = path or f"{warehouse}/{table_name}"
    with StoreLease(spark, root + ".__lease"):
        base, occ = _occurrences(docs, w, id_col, text_col)
        stats = occ.groupBy("digest").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p")
                )
            ).alias("__first"),
        ).localCheckpoint(eager=True)
        # one digest shuffle for both the bucketed write and the
        # rebuild join (r16), as in build_substring_state
        writer = (
            stats.select(
                "digest",
                F.col("__first.d").alias("first_doc"),
                F.col("__first.p").alias("first_pos"),
            )
            .write.mode("overwrite")
            .bucketBy(n_buckets, "digest")
            .sortBy("digest")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
        _write_watermark(
            spark,
            root + ".__wm__",
            docs.agg(F.max(id_col)).collect()[0][0],
        )
        removable = (
            occ.join(stats.filter(F.col("__cnt") >= 2), "digest")
            .filter(
                ~(
                    (F.col(id_col) == F.col("__first.d"))
                    & (F.col("pos") == F.col("__first.p"))
                )
            )
            .select(id_col, "pos")
        )
        return _rebuild(base, removable, w, id_col).localCheckpoint(
            eager=True
        )


def substring_increment_bucketed(
    spark,
    delta: DataFrame,
    table_name: str,
    w: int = 50,
    n_buckets: int = 64,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One delivery against the BUCKETED digest state: identical
    decisions to :func:`substring_increment` (watermark enforcement
    included), but the history side of the digest equi-join is a
    bucketed table scan — zero Exchange on the state, however large
    it has grown (plan-asserted by test)."""
    from minerva_etl_spark.fsutil import StoreLease

    w = int(w)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    root = path or f"{warehouse}/{table_name}"
    with StoreLease(spark, root + ".__lease"):
        if not spark.catalog.tableExists(table_name):
            raise ValueError(
                f"substring_increment_bucketed: state table "
                f"{table_name} does not exist — build it with "
                f"build_substring_state_bucketed first"
            )
        hist_full = spark.table(table_name)
        floor = _read_watermark(spark, root + ".__wm__")
        if floor is None:
            floor = hist_full.agg(F.max("first_doc")).collect()[0][0]
        bounds = delta.agg(
            F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
        ).collect()[0]
        if (
            floor is not None
            and bounds["lo"] is not None
            and bounds["lo"] <= floor
        ):
            raise ValueError(
                f"substring_increment_bucketed: delivery carries "
                f"{id_col}={bounds['lo']} <= state watermark {floor}; "
                f"ascending delivery ids required"
            )
        hist = hist_full.select("digest").withColumn(
            "__known", F.lit(True)
        )
        base, occ = _occurrences(delta, w, id_col, text_col)
        delta_stats = occ.groupBy("digest").agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p")
                )
            ).alias("__first"),
        ).localCheckpoint(eager=True)
        # one digest shuffle for decisions AND the bucketed append (r16)
        joined = occ.join(delta_stats, "digest").join(
            hist, "digest", "left"
        )
        removable = joined.filter(
            F.coalesce(F.col("__known"), F.lit(False))
            | (
                (F.col("__cnt") >= 2)
                & ~(
                    (F.col(id_col) == F.col("__first.d"))
                    & (F.col("pos") == F.col("__first.p"))
                )
            )
        ).select(id_col, "pos")
        out = _rebuild(base, removable, w, id_col).localCheckpoint(
            eager=True
        )  # pinned before the state mutates
        writer = (
            delta_stats.join(hist, "digest", "left_anti")
            .select(
                "digest",
                F.col("__first.d").alias("first_doc"),
                F.col("__first.p").alias("first_pos"),
            )
            .write.mode("append")
            .bucketBy(n_buckets, "digest")
            .sortBy("digest")
            .format("parquet")
        )
        if path is not None:
            writer = writer.option("path", path)
        writer.saveAsTable(table_name)
        if bounds["hi"] is not None:
            _write_watermark(
                spark,
                root + ".__wm__",
                max(bounds["hi"], floor) if floor is not None
                else bounds["hi"],
            )
    return out


def substring_dedup_oracle_sql(
    table: str,
    w: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`substring_dedup`: identical shingling
    (``md5`` of the space-joined ``w``-token slice), the keep-first
    mark as a ``row_number`` over ``(doc, pos)`` per digest (provably
    the same winner as Spark's combinable ``min(struct)``), identical
    per-token coverage rebuild.  ``table`` may be a named view or an
    inline ``(SELECT ...)`` corpus."""
    w = int(w)
    return f"""
WITH base AS MATERIALIZED (
  SELECT {id_col} AS doc_id, string_split({text_col}, ' ') AS toks
  FROM {table}
),
occ AS MATERIALIZED (
  SELECT doc_id, gs.i AS pos,
         md5(array_to_string(
               list_slice(toks, gs.i + 1, gs.i + {w}), ' ')) AS digest
  FROM base
  CROSS JOIN UNNEST(generate_series(0, len(toks) - {w})) AS gs(i)
  WHERE len(toks) >= {w}
),
marked AS (
  SELECT doc_id, pos,
         row_number() OVER (
           PARTITION BY digest ORDER BY doc_id ASC, pos ASC) AS rn,
         count(*) OVER (PARTITION BY digest) AS cnt
  FROM occ
),
rem AS (
  SELECT doc_id, list(pos ORDER BY pos) AS rps
  FROM marked WHERE cnt >= 2 AND rn > 1
  GROUP BY doc_id
),
rebuilt AS (
  SELECT b.doc_id, len(b.toks) AS n_tokens,
         list_filter(range(0, len(b.toks)),
                     t -> len(list_filter(coalesce(r.rps, []),
                              p -> p <= t AND t < p + {w})) = 0) AS kept,
         b.toks
  FROM base b LEFT JOIN rem r ON b.doc_id = r.doc_id
)
SELECT doc_id AS {id_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
       array_to_string(list_transform(kept, i -> toks[i + 1]), ' ')
         AS kept_text
FROM rebuilt
"""
