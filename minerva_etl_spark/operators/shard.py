"""Token-budget shard packing: the training-data EXPORT step.

A training pipeline's last hop writes the curated corpus into
fixed-token-budget shards (one file group per shard, each holding
~``shard_tokens`` tokens) so downstream loaders stream uniform work
units.  Assignment is a prefix-sum problem: with documents in a
deterministic order, ``shard_id = floor((cumsum(tokens) - tokens) /
shard_tokens)`` — a document starts in the shard where its first token
lands; oversized documents own one or more shards by themselves.

Scale shape: the naive formulation is a global window
(``sum() over (order by doc_id)``) — a SINGLE-REDUCER sort at 100 TB.
This implementation uses the classic two-pass distributed prefix sum
instead: range-repartition by doc id (Spark's range partitioner keeps
ranges ordered and balanced), per-partition token totals to the driver
(one row per partition — bounded), prefix offsets broadcast back, then
a WITHIN-partition cumulative window (parallel, no global sort).
Results are bit-identical to the global window, proven against the
DuckDB oracle's ``sum() over ()``.

No reference counterpart (the reference exports via COPY TO without
size budgeting) — LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from minerva_etl_spark.operators.text import tokens_duck_sql, tokens_spark_sql


def _global_token_offsets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    token_col: str | None,
    num_ranges: int | None,
    shuffle_seed: int | None,
    order_col: str | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(__id, n_tokens, __off[, carry_cols...]) for every document —
    ``__off`` is the document's first token's position in the
    deterministic global order (id order, the md5 permutation under
    ``shuffle_seed``, or a caller-supplied numeric ``order_col`` —
    semantic packing's cluster/affinity key).  The two-pass
    distributed prefix sum shared by shard packing and sequence
    packing; see :func:`assign_token_shards` for the shape discussion.

    ``carry_cols``: small caller columns that ride the range shuffle
    unchanged, so the caller can consume the assignment without
    joining it back onto its input (guide §2.4 — a join-back is a
    second exchange for data this pass already holds)."""
    if shuffle_seed is not None and order_col is not None:
        raise ValueError("pass shuffle_seed OR order_col, not both")
    n_expr = (
        F.size(F.expr(tokens_spark_sql(text_col))).cast("bigint")
        if token_col is None
        else F.col(token_col).cast("bigint")
    )
    sel = [F.col(id_col).alias("__id"), n_expr.alias("n_tokens")]
    sel += [F.col(c) for c in (carry_cols or [])]
    if order_col is not None:
        sel.append(F.col(order_col).cast("bigint").alias("__ord"))
    t = df.select(*sel)
    if order_col is not None:
        order_cols = ["__ord", "__id"]
    elif shuffle_seed is not None:
        t = t.withColumn(
            "__ord",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(str(int(shuffle_seed)) + ":"),
                                   F.col("__id").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("bigint"),
        )
        order_cols = ["__ord", "__id"]
    else:
        order_cols = ["__id"]
    n = num_ranges or max(t.sparkSession.sparkContext.defaultParallelism, 4)
    # checkpointed: range bounds are SAMPLED per execution, so the
    # totals pass and the cumsum pass must read the SAME materialized
    # partitioning or the prefix offsets would be wrong.  State is one
    # (id, count, pid) row per document — the shard index, tiny
    # relative to the corpus it indexes.
    ranged = (
        t.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # pass 1: per-range totals -> driver (one row per partition, bounded)
    totals = {
        r["__pid"]: r["total"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    # empty corpus: a bare create_map() is map<void,void> and fails
    # analysis on the [__pid] lookup — a typed null map keeps the
    # coalesce(off[__pid], 0) path valid and yields zero rows
    off = (
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        if offsets
        else F.lit(None).cast("map<int,bigint>")
    )
    # pass 2: within-partition cumsum + broadcast prefix offset.  The
    # window partitions by __pid — every range runs in parallel; no
    # global sort anywhere.
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exact integer division (operands are non-negative bigints): double
    # division would misplace boundary documents once the cumulative
    # token count exceeds ~2^53 — well inside a 100 TB corpus.
    return (
        ranged.withColumn(
            "__cum",
            F.sum("n_tokens").over(w)
            + F.coalesce(off[F.col("__pid")], F.lit(0)),
        )
        .select(
            "__id",
            "n_tokens",
            (F.col("__cum") - F.col("n_tokens")).cast("bigint").alias(
                "__off"
            ),
            *[F.col(c) for c in (carry_cols or [])],
        )
    )


def assign_token_shards(
    df: DataFrame,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int | None = None,
    shuffle_seed: int | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, n_tokens, shard_id[, carry_cols...]) for every document:
    deterministic ``id_col`` order, shards bounded by ``shard_tokens``.
    ``carry_cols`` ride through unchanged (see
    :func:`_global_token_offsets`).

    ``token_col`` reuses a precomputed count; otherwise whitespace
    tokens of ``text_col`` are counted (same expression the text
    profile uses, so counts agree across operators).

    ``shuffle_seed``: pack in a deterministic PSEUDO-RANDOM order
    instead of id order — the md5-derived permutation key
    ``md5(seed || id)`` (ties broken by id).  Training exports want
    source/time-decorrelated shards; a seeded hash permutation gives a
    reproducible global shuffle with no RNG state, and the two-pass
    prefix sum works unchanged because the range partitioner orders by
    the permutation key.
    """
    offs = _global_token_offsets(
        df, id_col, text_col, token_col, num_ranges, shuffle_seed,
        carry_cols=carry_cols,
    )
    return offs.select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.expr(f"__off div {int(shard_tokens)}")
        .cast("bigint")
        .alias("shard_id"),
        *[F.col(c) for c in (carry_cols or [])],
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_ranges: int | None = None,
    shuffle_seed: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Cross-document SEQUENCE packing — the canonical pretraining
    shape: concatenate the corpus in a deterministic (optionally
    md5-shuffled) order and cut it into fixed ``seq_len``-token
    sequences, documents spanning cuts split across neighbors.

    Returns one row per (sequence, document) intersection:
    ``(seq_id, id, n_tokens, tok_start, tok_end, pos_start)`` —
    the document's token half-open range [tok_start, tok_end) lands at
    ``pos_start`` inside sequence ``seq_id``.  Every sequence's spans
    sum to exactly ``seq_len`` (the last sequence may be short), which
    is what a loader needs to materialize token buffers and attention
    document-boundary masks.

    Scale shape: the same two-pass distributed prefix sum as shard
    packing (no global sort), then an in-row ``sequence()`` explode
    bounded by ceil(n_tokens/seq_len)+1 rows per document.  All
    arithmetic is exact integer ops — bit-identical to the oracle's
    global-window formulation.

    Complements :func:`text.chunk_sequences` (per-document windows,
    no cross-document concatenation) and :func:`assign_token_shards`
    (file-level budgets, no intra-document splitting).
    """
    L = int(seq_len)
    offs = _global_token_offsets(
        df, id_col, text_col, token_col, num_ranges, shuffle_seed,
        order_col,
    )
    return (
        offs.filter(F.col("n_tokens") > 0)
        .withColumn(
            "seq_id",
            F.explode(
                F.expr(
                    f"sequence(__off div {L}, "
                    f"(__off + n_tokens - 1) div {L})"
                )
            ),
        )
        .select(
            F.col("seq_id").cast("bigint").alias("seq_id"),
            F.col("__id").alias(id_col),
            "n_tokens",
            F.expr(f"greatest(__off, seq_id * {L}) - __off")
            .cast("bigint")
            .alias("tok_start"),
            F.expr(f"least(__off + n_tokens, seq_id * {L} + {L}) - __off")
            .cast("bigint")
            .alias("tok_end"),
            F.expr(f"greatest(__off, seq_id * {L}) - seq_id * {L}")
            .cast("bigint")
            .alias("pos_start"),
        )
    )


def pack_token_ids(
    docs: DataFrame,
    merges: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_ranges: int | None = None,
    shuffle_seed: int | None = None,
    vocab0: DataFrame | None = None,
) -> DataFrame:
    """Packed **token-id** sequences — the final pretraining artifact:
    BPE-encode every document with a learned merge table
    (:func:`~minerva_etl_spark.operators.bpe.bpe_encode_ids`), then cut
    the id-stream into fixed ``seq_len`` sequences with
    :func:`pack_sequences` and slice each document's id array to its
    span.  One row per (sequence, document) intersection:
    ``(seq_id, id, pos_start, token_ids array<int>)`` — concatenating a
    sequence's rows in ``pos_start`` order yields exactly ``seq_len``
    ids (last sequence may be short), and the row boundaries double as
    the attention document-boundary mask.

    Scale shape: encoding is vocab-bounded joins (no corpus-sized
    driver state), packing is the two-pass distributed prefix sum (no
    global sort), and the slice is in-row — the id arrays themselves
    never shuffle twice (the span join co-shuffles ids once on the doc
    key).  Conservation law (tested): the multiset of packed ids ==
    the multiset of encoded doc ids.
    """
    from minerva_etl_spark.operators.bpe import bpe_encode_ids

    enc = bpe_encode_ids(
        docs, merges, id_col=id_col, text_col=text_col, vocab0=vocab0
    ).localCheckpoint(eager=True)  # encode once: spans + slices reread it
    spans = pack_sequences(
        enc,
        seq_len,
        id_col=id_col,
        token_col="n_bpe_tokens",
        num_ranges=num_ranges,
        shuffle_seed=shuffle_seed,
    )
    return (
        enc.select(id_col, "token_ids")
        .join(spans, id_col)
        .select(
            "seq_id",
            id_col,
            "pos_start",
            F.expr("slice(token_ids, tok_start + 1, tok_end - tok_start)")
            .cast("array<int>")
            .alias("token_ids"),
        )
    )


def pack_token_ids_oracle_sql(
    seq_len: int,
    n_merges: int,
    min_count: int = 2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_seed: int | None = None,
) -> str:
    """DuckDB twin of :func:`pack_token_ids`: the encode-ids chain
    nested once, the global-window prefix sum over the identical
    order, and 1-based inclusive list slicing (DuckDB ``l[a:b]`` ==
    Spark ``slice(l, a, b - a + 1)``)."""
    from minerva_etl_spark.operators.bpe import bpe_encode_ids_oracle_sql

    L = int(seq_len)
    enc = bpe_encode_ids_oracle_sql(
        table, n_merges, min_count, id_col, text_col
    )
    if shuffle_seed is not None:
        ordkey = (
            f"CAST(('0x' || substr(md5('{int(shuffle_seed)}:' || "
            f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        )
        order_by = f"{ordkey}, {id_col}"
    else:
        order_by = id_col
    return f"""
WITH encdoc AS MATERIALIZED (
  SELECT * FROM (
{enc}
  )
),
o AS (
  SELECT {id_col}, n_bpe_tokens AS n_tokens, token_ids,
         CAST(SUM(n_bpe_tokens) OVER (ORDER BY {order_by}
                                      ROWS UNBOUNDED PRECEDING)
              - n_bpe_tokens AS BIGINT) AS off
  FROM encdoc
)
SELECT CAST(s.k AS BIGINT) AS seq_id,
       {id_col},
       CAST(greatest(off, s.k * {L}) - s.k * {L} AS BIGINT) AS pos_start,
       CAST(token_ids[CAST(greatest(off, s.k * {L}) - off + 1 AS INT) :
                      CAST(least(off + n_tokens, s.k * {L} + {L}) - off
                           AS INT)]
            AS INT[]) AS token_ids
FROM o
CROSS JOIN UNNEST(generate_series(off // {L},
                                  (off + n_tokens - 1) // {L})) AS s(k)
WHERE n_tokens > 0
"""


def pack_semantic(
    docs: DataFrame,
    embeddings: DataFrame,
    seq_len: int,
    k: int = 8,
    iters: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_ranges: int | None = None,
) -> DataFrame:
    """Semantic (in-context) packing — related documents become
    NEIGHBORS in the token stream instead of random ones, the
    in-context-pretraining recipe (Shi et al. 2023, "In-Context
    Pretraining: Language Modeling Beyond Document Boundaries"; their
    traveling-salesman doc ordering is approximated here by the
    scalable two-level key: k-means cluster, then affinity-to-
    centroid within the cluster).

    Order: ``(cluster ASC, affinity DESC, id ASC)`` encoded as ONE
    integer key (affinity is the repo's rounded-6dp cosine, so
    ``round((1 - affinity) · 1e6)`` is exact in both engines), fed to
    `pack_sequences`' two-pass prefix sum — no global sort, same
    spans contract.  Returns the pack_sequences schema plus
    ``cluster_id``.

    Scale shape: one k-means fit (k ~ √N discipline), one broadcast
    centroid assignment, then the documented packing machinery; the
    embedding table joins the corpus once on the id."""
    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.similarity import assign_centroids

    _seed, cent = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=emb_id_col, vec_col=vec_col
    )
    assigned = assign_centroids(
        embeddings, cent, id_col=emb_id_col, vec_col=vec_col,
        keep_score=True,
    ).select(
        F.col(emb_id_col).alias(id_col),
        "centroid_id",
        "affinity",
    )
    keyed = docs.join(assigned, id_col).withColumn(
        "__sem_ord",
        F.col("centroid_id").cast("bigint") * F.lit(4_000_000)
        + F.expr(
            "CAST(round((1.0d - coalesce(affinity, -1.0d)) "
            "* 1000000.0d, 0) AS BIGINT)"
        ),
    )
    spans = pack_sequences(
        keyed,
        seq_len,
        id_col=id_col,
        text_col=text_col,
        num_ranges=num_ranges,
        order_col="__sem_ord",
    )
    return spans.join(
        assigned.select(id_col, F.col("centroid_id").alias("cluster_id")),
        id_col,
    ).select(
        "seq_id", id_col, "n_tokens", "tok_start", "tok_end",
        "pos_start", "cluster_id",
    )


def pack_semantic_oracle_sql(
    seq_len: int,
    kmeans_k: int,
    kmeans_iters: int,
    table: str = "documents",
    emb_table: str = "embeddings",
    id_col: str = "doc_id",
    text_col: str = "text",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`pack_semantic`: the Lloyd's CTE chain,
    rounded-cosine argmax WITH its affinity, the identical integer
    order key, and the global-window cumsum the two-pass prefix sum
    is provably equal to."""
    from minerva_etl_spark.operators.kmeans import _duck_cos, kmeans_ctes

    L = int(seq_len)
    toks = tokens_duck_sql(text_col)
    ctes = kmeans_ctes(
        emb_table, kmeans_k, kmeans_iters, emb_id_col, vec_col
    )
    cent = f"cent{kmeans_iters}"
    body = ",\n".join(ctes)
    return f"""
WITH {body},
assigned AS MATERIALIZED (
  SELECT {emb_id_col} AS {id_col}, centroid_id, affinity FROM (
    SELECT e.{emb_id_col}, c.centroid_id,
           {_duck_cos('e.' + vec_col, 'c.cvec')} AS affinity,
           row_number() OVER (
             PARTITION BY e.{emb_id_col}
             ORDER BY {_duck_cos('e.' + vec_col, 'c.cvec')} DESC,
                      c.centroid_id ASC) AS rn
    FROM {emb_table} e, {cent} c
  ) WHERE rn = 1
),
t AS (
  SELECT d.{id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens,
         a.centroid_id,
         CAST(a.centroid_id AS BIGINT) * 4000000
           + CAST(round((1.0 - coalesce(a.affinity, -1.0))
                        * 1000000.0, 0) AS BIGINT) AS sem_ord
  FROM {table} d JOIN assigned a USING ({id_col})
),
o AS (
  SELECT {id_col}, n_tokens, centroid_id,
         CAST(SUM(n_tokens) OVER (ORDER BY sem_ord, {id_col}
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS off
  FROM t
)
SELECT CAST(s.k AS BIGINT) AS seq_id,
       {id_col},
       n_tokens,
       CAST(greatest(off, s.k * {L}) - off AS BIGINT) AS tok_start,
       CAST(least(off + n_tokens, s.k * {L} + {L}) - off AS BIGINT)
         AS tok_end,
       CAST(greatest(off, s.k * {L}) - s.k * {L} AS BIGINT)
         AS pos_start,
       centroid_id AS cluster_id
FROM o
CROSS JOIN UNNEST(generate_series(off // {L},
                                  (off + n_tokens - 1) // {L})) AS s(k)
WHERE n_tokens > 0
"""


def pack_sequences_oracle_sql(
    seq_len: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_seed: int | None = None,
) -> str:
    """DuckDB twin of :func:`pack_sequences` (global-window
    formulation over the identical order)."""
    L = int(seq_len)
    toks = tokens_duck_sql(text_col)
    if shuffle_seed is not None:
        ordkey = (
            f"CAST(('0x' || substr(md5('{int(shuffle_seed)}:' || "
            f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        )
        order_by = f"{ordkey}, {id_col}"
    else:
        order_by = id_col
    return f"""
WITH t AS (
  SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM {table}
),
o AS (
  SELECT {id_col}, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY {order_by}
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS off
  FROM t
)
SELECT CAST(s.k AS BIGINT) AS seq_id,
       {id_col},
       n_tokens,
       CAST(greatest(off, s.k * {L}) - off AS BIGINT) AS tok_start,
       CAST(least(off + n_tokens, s.k * {L} + {L}) - off AS BIGINT)
         AS tok_end,
       CAST(greatest(off, s.k * {L}) - s.k * {L} AS BIGINT) AS pos_start
FROM o
CROSS JOIN UNNEST(generate_series(off // {L},
                                  (off + n_tokens - 1) // {L})) AS s(k)
WHERE n_tokens > 0
"""


def token_shards_oracle_sql(
    shard_tokens: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_seed: int | None = None,
) -> str:
    """DuckDB twin: the naive global-window formulation (fine
    in-process; the point of the Spark variant is avoiding it)."""
    toks = tokens_duck_sql(text_col)
    if shuffle_seed is not None:
        ordkey = (
            f"CAST(('0x' || substr(md5('{int(shuffle_seed)}:' || "
            f"CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        )
        order_by = f"{ordkey}, {id_col}"
    else:
        order_by = id_col
    return f"""
WITH t AS (
  SELECT {id_col}, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM {table}
),
c AS (
  SELECT {id_col}, n_tokens,
         SUM(n_tokens) OVER (ORDER BY {order_by}
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT {id_col}, n_tokens,
       CAST((cum - n_tokens) // {int(shard_tokens)} AS BIGINT) AS shard_id
FROM c
"""


def write_token_shards(
    df: DataFrame,
    path: str,
    shard_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    format: str = "parquet",
) -> int:
    """Materialize the corpus into one directory partition per shard
    (``shard_id=N/``), each holding ~``shard_tokens`` tokens; returns
    the shard count.  One repartition on shard_id co-locates each
    shard's documents into one task's output file."""
    assigned = assign_token_shards(
        df, shard_tokens, id_col=id_col, text_col=text_col
    )
    out = df.join(assigned.select(id_col, "shard_id"), id_col)
    (
        out.repartition("shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(format)
        .save(path)
    )
    return out.select("shard_id").distinct().count()


def write_packed_token_ids(
    docs: DataFrame,
    merges: DataFrame,
    path: str,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seqs_per_file: int = 1024,
    shuffle_seed: int | None = None,
    format: str = "parquet",
) -> int:
    """Materialize :func:`pack_token_ids` grouped into
    ``seqs_per_file``-sequence file partitions (same layout contract as
    :func:`write_packed_sequences`, but carrying the actual token-id
    arrays a loader memory-maps).  Returns the sequence count."""
    spans = pack_token_ids(
        docs, merges, seq_len, id_col=id_col, text_col=text_col,
        shuffle_seed=shuffle_seed,
    )
    out = spans.withColumn(
        "file_id", F.expr(f"seq_id div {int(seqs_per_file)}")
    )
    (
        out.repartition("file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .format(format)
        .save(path)
    )
    mx = spans.agg(F.max("seq_id")).first()[0]
    return 0 if mx is None else int(mx) + 1


def write_packed_sequences(
    df: DataFrame,
    path: str,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seqs_per_file: int = 1024,
    shuffle_seed: int | None = None,
    format: str = "parquet",
) -> int:
    """Materialize :func:`pack_sequences` into actual packed rows:
    one row per (sequence, document) span carrying the span's tokens
    (``words``), written grouped into ``seqs_per_file``-sequence file
    partitions (one directory per file group — NOT one file per
    sequence, which would be millions of tiny files at scale).
    Returns the sequence count.

    A loader reconstructs sequence ``s`` by concatenating its rows in
    ``pos_start`` order; ``(id, pos_start)`` pairs double as the
    attention document-boundary mask.
    """
    spans = pack_sequences(
        df, seq_len, id_col=id_col, text_col=text_col,
        shuffle_seed=shuffle_seed,
    )
    out = (
        df.select(
            F.col(id_col),
            F.expr(tokens_spark_sql(text_col)).alias("__toks"),
        )
        .join(spans, id_col)
        .select(
            "seq_id",
            id_col,
            "pos_start",
            F.expr("slice(__toks, tok_start + 1, tok_end - tok_start)")
            .alias("words"),
            F.expr(f"seq_id div {int(seqs_per_file)}").alias("file_id"),
        )
    )
    (
        out.repartition("file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .format(format)
        .save(path)
    )
    # sequences are contiguous 0..max (every sequence owns >= 1 span),
    # so the count comes from the span index — never from re-scanning
    # the freshly written corpus-sized output
    mx = spans.agg(F.max("seq_id")).first()[0]
    return 0 if mx is None else int(mx) + 1


# ---------------------------------------------------------------------
# Loader-ready binary export: .bin (raw little-endian token ids) +
# .idx (sequence lengths) per file group, manifest parquet on top.
# ---------------------------------------------------------------------

#: magic + version for the sidecar index
_IDX_MAGIC = b"MVIDX\x01"


def write_token_ids_binary(
    docs: DataFrame,
    merges: DataFrame,
    path: str,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seqs_per_file: int = 1024,
    shuffle_seed: int | None = None,
    dtype: str = "uint16",
) -> DataFrame:
    """The last hop of the tokenizer arc: materialize
    :func:`pack_token_ids` as the flat binary a pretraining loader
    memory-maps — per file group one ``shard-NNNNN.bin`` (token ids
    back-to-back, little-endian ``dtype``) plus ``shard-NNNNN.idx``
    (magic, dtype code, sequence count, then one uint32 length per
    sequence: offsets are their prefix sums).

    Scale shape: sequences repartition by file group and EACH TASK
    writes its own pair of files straight to ``path`` (a shared
    filesystem on a cluster) — no driver round-trip, no single-writer
    bottleneck, file count = ``ceil(n_seqs / seqs_per_file)`` by
    construction (never millions of tiny files).  Returns the manifest
    as a DataFrame: ``(file_id, n_seqs, n_tokens, sha256)`` — the
    digest makes the export content-addressable so a resumed/repeated
    run is verifiable file by file.

    ``dtype='uint16'`` fits vocabularies below 65 536 ids (the common
    case); pass ``'uint32'`` past that — ids are range-checked inside
    the task so a too-narrow dtype fails loudly, not by overflow.
    """
    import os

    import numpy as np
    import pandas as pd

    if dtype not in ("uint16", "uint32"):
        raise ValueError(f"dtype must be uint16|uint32, got {dtype}")
    spans = pack_token_ids(
        docs, merges, seq_len, id_col=id_col, text_col=text_col,
        shuffle_seed=shuffle_seed,
    )
    grouped = spans.withColumn(
        "file_id", F.expr(f"seq_id div {int(seqs_per_file)}")
    )
    limit = 65536 if dtype == "uint16" else 2**32
    target = path[len("file:"):] if path.startswith("file:") else path

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import hashlib
        import os
        import struct

        fid = int(pdf["file_id"].iloc[0])
        # spans -> whole sequences, in order
        seqs: dict[int, list] = {}
        for sid, pos, ids in zip(
            pdf["seq_id"], pdf["pos_start"], pdf["token_ids"]
        ):
            seqs.setdefault(int(sid), []).append((int(pos), list(ids)))
        lengths = []
        body = bytearray()
        for sid in sorted(seqs):
            ids = [t for _, chunk in sorted(seqs[sid]) for t in chunk]
            if ids and max(ids) >= limit:
                raise ValueError(
                    f"token id {max(ids)} exceeds {dtype} in seq {sid}"
                )
            lengths.append(len(ids))
            body += np.asarray(ids, dtype=dtype).tobytes()
        os.makedirs(target, exist_ok=True)
        bin_path = os.path.join(target, f"shard-{fid:05d}.bin")
        idx_path = os.path.join(target, f"shard-{fid:05d}.idx")
        with open(bin_path, "wb") as fh:
            fh.write(bytes(body))
        with open(idx_path, "wb") as fh:
            fh.write(_IDX_MAGIC)
            fh.write(struct.pack("<BQ", 2 if dtype == "uint16" else 4,
                                 len(lengths)))
            fh.write(np.asarray(lengths, dtype="uint32").tobytes())
        return pd.DataFrame(
            {
                "file_id": [fid],
                "n_seqs": [len(lengths)],
                "n_tokens": [int(sum(lengths))],
                "sha256": [hashlib.sha256(bytes(body)).hexdigest()],
            }
        )

    manifest = grouped.groupBy("file_id").applyInPandas(
        write_group,
        "file_id bigint, n_seqs bigint, n_tokens bigint, sha256 string",
    )
    # the applyInPandas is lazy — materialize the manifest (and thereby
    # the file writes) before returning, and persist it next to the data
    manifest = manifest.localCheckpoint(eager=True)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "_manifest")
    )
    return manifest


def read_token_ids_binary(path: str, file_id: int) -> list[list[int]]:
    """Driver-side reader for one exported file pair (testing /
    spot-checks — a training loader memory-maps the .bin directly):
    returns the file's sequences as id lists."""
    import struct

    import numpy as np

    target = path[len("file:"):] if path.startswith("file:") else path
    with open(f"{target}/shard-{file_id:05d}.idx", "rb") as fh:
        magic = fh.read(6)
        if magic != _IDX_MAGIC:
            raise ValueError("bad index magic")
        width, n = struct.unpack("<BQ", fh.read(9))
        lengths = np.frombuffer(fh.read(4 * n), dtype="uint32")
    dtype = {2: "uint16", 4: "uint32"}[width]
    data = np.fromfile(f"{target}/shard-{file_id:05d}.bin", dtype=dtype)
    out, off = [], 0
    for ln in lengths:
        out.append([int(t) for t in data[off : off + int(ln)]])
        off += int(ln)
    return out
