"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The one tokenizer-adjacent piece a training-data engine can genuinely
own: learning the merge table itself from the corpus.  Training runs
on the WORD-FREQUENCY table, not the raw corpus — the classic BPE
formulation — so a 100 TB corpus first collapses to its (word, count)
vocabulary (one map-side-combinable groupBy; still a DataFrame, the
vocabulary of a web crawl does not fit a driver), and every merge
round is two distributed passes over that table:

1. **pair counting** — explode each word's adjacent symbol pairs,
   weighted by word count; map-side-combinable groupBy; the argmax
   pair comes back as ONE driver row (count desc, pair asc tie-break);
2. **merge application** — plain ``replace()`` of the winning pair in
   every word's symbol string (left-to-right non-overlapping — exactly
   BPE's greedy application), broadcast as a one-row literal.

Symbol strings are engineered so plain string replacement is exact,
with no regex and no lookarounds (RE2/DuckDB has none): every symbol
carries a ``_`` terminator and the string a leading space —
``" c_ a_ t</w>_"`` — so the pattern ``" c_ a_"`` can only match at a
symbol boundary (the leading space) and cannot match a symbol that
merely ends with the same characters (the terminator pins the right
edge).  Adjacent occurrences never share separator characters, so
non-overlapping replacement merges them all.

Everything is integer counts and string surgery — bit-identical in the
DuckDB oracle, which unrolls the rounds as MATERIALIZED CTE pairs
(without materialization each round's two references re-inline the
whole prefix: exponential).

Stopping: a round whose best pair count is below ``min_count`` stops
training (the vocabulary is then a fixed point, so the oracle's
filtered union drops every post-stop round deterministically).

Reference: extension (the reference has no tokenizer surface); the
algorithm is the published BPE recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: symbol terminator — cannot occur inside corpus tokens ([a-z]+ only)
_T = "_"
_EOW = "</w>"


#: initial character-symbol rendering of `word` — shared by
#: _initial_vocab and vocab0_from_trained (must stay identical: the
#: trained-vocab shortcut reproduces exactly this projection)
_SYM_EXPR = (
    "concat(' ', array_join(transform("
    "  filter(split(word, ''), x -> x != ''),"
    f"  (x, i) -> CASE WHEN i = length(word) - 1"
    f"    THEN concat(x, '{_EOW}{_T}')"
    f"    ELSE concat(x, '{_T}') END), ' '))"
)


def _initial_vocab(
    docs: DataFrame, text_col: str
) -> DataFrame:
    """(word, cnt, sym) — corpus word frequencies with each word
    rendered as its initial character-symbol string."""
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return words.withColumn("sym", F.expr(_SYM_EXPR))


def vocab0_from_trained(vocab: DataFrame) -> DataFrame:
    """Rebuild the INITIAL symbolized vocabulary from the vocab frame
    :func:`bpe_train` returns, WITHOUT a corpus pass (r17, guide §5):
    training only evolves ``sym``, so ``(word, cnt)`` are exactly the
    initial table's rows, and the initial ``sym`` is a deterministic
    projection of ``word`` (``_SYM_EXPR``).  The trainer's vocab is
    checkpoint-backed, so a consumer that just trained on the same
    corpus (encode/decode/vocab derivation) skips the full corpus
    explode + word-count aggregation ``_initial_vocab`` would re-run —
    column pruning drops the trainer's pending ``replace`` chain (it
    only touches ``sym``)."""
    return vocab.select("word", "cnt", F.expr(_SYM_EXPR).alias("sym"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    arr = "split(trim(sym), ' ')"
    pairs = vocab.select(
        "cnt",
        F.explode(
            F.expr(
                f"arrays_zip(slice({arr}, 1, size({arr}) - 1), "
                f"slice({arr}, 2, size({arr}) - 1))"
            )
        ).alias("p"),
    )
    return pairs.select(
        F.col("p")["0"].alias("left"),
        F.col("p")["1"].alias("right"),
        "cnt",
    ).groupBy("left", "right").agg(F.sum("cnt").alias("pair_count"))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    min_count: int = 2,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns ``(merges, vocab)``: merges as ``(rank, left, right,
    pair_count)`` in application order — the artifact a tokenizer
    loads — and the final symbolized vocabulary ``(word, cnt, sym)``.

    ``checkpoint_every`` bounds how many merge applications accumulate
    as lazy lineage before the vocabulary is re-materialized: chained
    ``replace`` projections collapse into ONE fused projection per
    pair-count pass, so an eager materialization job per round (the
    pre-r16 shape) pays a full extra pass over the vocabulary per merge
    for no algorithmic benefit; checkpointing only every K rounds keeps
    the per-round cost at one distributed pass while still truncating
    lineage before replay cost (i replaces per row) or planning depth
    can compound at large merge counts.
    """
    spark = docs.sparkSession
    vocab = _initial_vocab(docs, text_col).localCheckpoint(eager=True)
    checkpoint_every = max(1, int(checkpoint_every))
    pending = 0  # merges applied since the last materialization
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(n_merges)):
        best = (
            _pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < int(min_count):
            break
        left, right, cnt = (
            best[0]["left"], best[0]["right"], best[0]["pair_count"]
        )
        # "c_" + "a_" -> "ca_": drop the left symbol's terminator
        merged = left[: -len(_T)] + right
        vocab = vocab.withColumn(
            "sym",
            F.expr(
                "replace(sym, "
                f"concat(' ', {_sq(left)}, ' ', {_sq(right)}), "
                f"concat(' ', {_sq(merged)}))"
            ),
        )
        pending += 1
        if pending >= checkpoint_every:
            vocab = vocab.localCheckpoint(eager=True)
            pending = 0
        merges.append((rank, left, right, int(cnt)))
    mdf = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    return mdf, vocab


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


# ---------------------------------------------------------------------
# Oracle SQL (DuckDB) — rounds unrolled as MATERIALIZED CTE pairs
# ---------------------------------------------------------------------

def bpe_oracle_sql(
    table: str,
    n_merges: int,
    min_count: int = 2,
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bpe_train` returning the merges table."""
    sym = (
        "' ' || array_to_string(list_transform("
        "  generate_series(1, len(word)),"
        f"  i -> substr(word, i, 1) || CASE WHEN i = len(word)"
        f"    THEN '{_EOW}{_T}' ELSE '{_T}' END), ' ')"
    )
    arr = "string_split(trim(sym), ' ')"
    pair_src = (
        f"SELECT u.p[1] AS lft, u.p[2] AS rgt, cnt FROM v{{t}}, "
        f"UNNEST(list_zip({arr}[1:len({arr}) - 1], "
        f"{arr}[2:len({arr})])) AS u(p)"
    )
    ctes = [
        f"""v0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt, {sym} AS sym FROM (
    SELECT unnest(string_split_regex(lower({text_col}), '[^a-z]+')) AS word
    FROM {table}
  ) WHERE word <> '' GROUP BY word
)"""
    ]
    for t in range(int(n_merges)):
        ctes.append(
            f"""b{t} AS MATERIALIZED (
  SELECT lft, rgt, CAST(sum(cnt) AS BIGINT) AS pair_count,
         substr(lft, 1, len(lft) - {len(_T)}) || rgt AS merged
  FROM ({pair_src.format(t=t)})
  GROUP BY lft, rgt
  ORDER BY pair_count DESC, lft ASC, rgt ASC
  LIMIT 1
)"""
        )
        ctes.append(
            f"""v{t + 1} AS MATERIALIZED (
  SELECT word, cnt,
         CASE WHEN b.pair_count >= {int(min_count)}
              THEN replace(sym, ' ' || b.lft || ' ' || b.rgt,
                           ' ' || b.merged)
              ELSE sym END AS sym
  FROM v{t} LEFT JOIN b{t} b ON TRUE
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {t} AS rank, lft, rgt, pair_count FROM b{t} "
        f"WHERE pair_count >= {int(min_count)}"
        for t in range(int(n_merges))
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT CAST(rank AS INT) AS rank, lft AS "left", rgt AS "right",
       pair_count
FROM ({union})
"""


# ---------------------------------------------------------------------
# Encoding: apply a learned merge table
# ---------------------------------------------------------------------

def bpe_encode_counts(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab0: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge table and count BPE tokens per document —
    the budget a sequence packer or context-window planner actually
    needs (whitespace counts under-estimate subword inflation).

    The merge table is a small artifact (tens of thousands of rows for
    real vocabularies) — it collects to the driver and compiles into a
    single in-row ``aggregate`` fold of ``replace()`` steps in rank
    order, applied once per DISTINCT word (the word-frequency table,
    not the corpus); documents then join their words' subword counts
    back through one explode + groupBy.  Returns
    ``(id, n_words, n_bpe_tokens)``.
    """
    ms = [
        (r["left"], r["right"], r["left"][: -len(_T)] + r["right"])
        for r in merges.orderBy("rank").collect()
    ]
    if ms:
        pats = ", ".join(_sq(f" {l} {r}") for l, r, _ in ms)
        reps = ", ".join(_sq(f" {m}") for _, _, m in ms)
        fold = (
            f"aggregate(arrays_zip(array({pats}), array({reps})), "
            "sym, (acc, x) -> replace(acc, x['0'], x['1']))"
        )
    else:
        fold = "sym"
    # vocab0 (from vocab0_from_trained) skips the corpus word-count
    # pass when the caller just trained on these docs (r17, guide §5)
    vocab = (
        vocab0 if vocab0 is not None else _initial_vocab(docs, text_col)
    ).withColumn(
        "__n_sym",
        F.expr(f"size(split(trim({fold}), ' '))").cast("bigint"),
    )
    words = (
        docs.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    return (
        words.join(vocab.select("word", "__n_sym"), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__n_sym").cast("bigint").alias("n_bpe_tokens"),
        )
    )


def _merge_list(merges: DataFrame) -> list[tuple[str, str, str]]:
    return [
        (r["left"], r["right"], r["left"][: -len(_T)] + r["right"])
        for r in merges.orderBy("rank").collect()
    ]


def _vocab_ids(vocab0: DataFrame, ms: list) -> DataFrame:
    """The deterministic token→id table shared by encode and decode:
    base symbols (the distinct initial character symbols,
    alphabet-bounded) take lexicographic ids 0..B-1, merge rank r
    takes B+r, lowest id wins per surface token."""
    from pyspark.sql import Window

    # base symbol ids: the distinct initial symbols are alphabet-bounded
    # (tens of rows) — a single-task window over them is free
    base = (
        vocab0.select(
            F.explode(F.split(F.trim(F.col("sym")), " ")).alias("tok")
        )
        .distinct()
        .withColumn(
            "tid", (F.row_number().over(Window.orderBy("tok")) - 1)
        )
    )
    n_base = base.count()
    spark = vocab0.sparkSession
    mtoks = spark.createDataFrame(
        [(m, n_base + r) for r, (_l, _r, m) in enumerate(ms)],
        "tok string, tid int",
    )
    return (
        base.select("tok", F.col("tid").cast("int"))
        .unionByName(mtoks)
        .groupBy("tok")
        .agg(F.min("tid").alias("tid"))
    )


def bpe_encode_ids(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab0: DataFrame | None = None,
) -> DataFrame:
    """Apply a learned merge table and emit the per-document **token-id
    arrays** a pretraining loader actually consumes —
    ``(id, n_bpe_tokens, token_ids array<int>)``.

    Id scheme (deterministic, derived from the merge table + corpus
    alphabet, the standard BPE vocabulary contract): base symbols (the
    distinct initial character symbols, alphabet-bounded) take ids
    ``0..B-1`` in lexicographic order; the merge of rank ``r`` takes id
    ``B + r``.  Two different merges CAN produce the same surface token
    (``a+bc`` and ``ab+c`` both yield ``abc``) — the vocabulary keeps
    the lowest id per token string, as real BPE vocab files do.

    Scale shape: the merge fold runs once per DISTINCT word (the
    word-frequency table, not the corpus); symbol→id resolution is a
    vocab-bounded equi-join (never a giant in-row map literal, which
    would blow codegen at real vocabulary sizes); documents recover
    ordered ids through posexplode + an AQE-skew-tolerant word join +
    an order-restoring ``array_sort(collect_list(struct))`` rebuild —
    the same per-doc rebuild shape as the boilerplate join path.
    """
    ms = _merge_list(merges)
    if ms:
        pats = ", ".join(_sq(f" {l} {r}") for l, r, _ in ms)
        reps = ", ".join(_sq(f" {m}") for _, _, m in ms)
        fold = (
            f"aggregate(arrays_zip(array({pats}), array({reps})), "
            "sym, (acc, x) -> replace(acc, x['0'], x['1']))"
        )
    else:
        fold = "sym"
    # one corpus word-count pass, not three: vocab0 feeds the base-id
    # derivation (whose .count() is an action), and the symbol explode
    # below — un-materialized, each re-ran the full explode + groupBy
    # (guide §5: cut the re-executed subtree).  A caller-supplied
    # vocab0 (vocab0_from_trained) is already checkpoint-backed, so
    # it skips the corpus pass entirely (r17).
    if vocab0 is None:
        vocab0 = _initial_vocab(docs, text_col).localCheckpoint(eager=True)
    vocab_ids = _vocab_ids(vocab0, ms)
    wsym = vocab0.select(
        "word",
        F.posexplode(F.split(F.trim(F.expr(fold)), " ")).alias(
            "spos", "tok"
        ),
    )
    wids = (
        # vocab_ids is alphabet+merges sized by construction — broadcast
        # deliberately (guide §3.1: post-union/groupBy size estimates
        # are unreliable, and an SMJ here exchanges the symbol explode)
        wsym.join(F.broadcast(vocab_ids), "tok")
        .groupBy("word")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(spos, tid))),"
                " x -> x.tid)"
            ).alias("ids")
        )
    )
    dwords = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("wpos", "word"),
    ).filter(F.col("word") != "")
    return (
        dwords.join(wids, "word")
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform("
                "array_sort(collect_list(struct(wpos, ids))),"
                " x -> x.ids))"
            )
            .cast("array<int>")
            .alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("bigint").alias("n_bpe_tokens"),
            "token_ids",
        )
    )


def bpe_encode_ids_oracle_sql(
    table: str,
    n_merges: int,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of training then :func:`bpe_encode_ids` on the same
    corpus: the training CTE chain nested once, base-symbol ids by
    lexicographic row_number, merged ids ``B + rank`` (min per surface
    token), per-word id lists in symbol order, per-doc flatten in word
    order."""
    train = bpe_oracle_sql(table, n_merges, min_count, text_col)
    sym = (
        "' ' || array_to_string(list_transform("
        "  generate_series(1, len(word)),"
        f"  i -> substr(word, i, 1) || CASE WHEN i = len(word)"
        f"    THEN '{_EOW}{_T}' ELSE '{_T}' END), ' ')"
    )
    return f"""
WITH tr AS MATERIALIZED (
  SELECT * FROM (
{train}
  )
),
m AS MATERIALIZED (
  SELECT coalesce(list(' ' || "left" || ' ' || "right" ORDER BY rank),
                  []) AS ps,
         coalesce(list(' ' || substr("left", 1, len("left") - {len(_T)})
                       || "right" ORDER BY rank), []) AS rs
  FROM tr
),
v AS MATERIALIZED (
  SELECT word, {sym} AS sym FROM (
    SELECT DISTINCT unnest(string_split_regex(lower({text_col}),
                                              '[^a-z]+')) AS word
    FROM {table}
  ) WHERE word <> ''
),
encw AS MATERIALIZED (
  SELECT v.word,
         string_split(trim(
           list_reduce(
             list_prepend(v.sym,
               list_transform(generate_series(1, len(m.ps)),
                              i -> CAST(i AS VARCHAR))),
             (acc, x) -> replace(acc, m.ps[CAST(x AS INT)],
                                 m.rs[CAST(x AS INT)]))), ' ') AS syms
  FROM v, m
),
base AS MATERIALIZED (
  SELECT sym AS tok,
         CAST(row_number() OVER (ORDER BY sym) - 1 AS INT) AS tid
  FROM (SELECT DISTINCT unnest(string_split(trim(sym), ' ')) AS sym
        FROM v)
),
mt AS (
  SELECT substr("left", 1, len("left") - {len(_T)}) || "right" AS tok,
         CAST((SELECT count(*) FROM base) + rank AS INT) AS tid
  FROM tr
),
voc AS MATERIALIZED (
  SELECT tok, MIN(tid) AS tid
  FROM (SELECT * FROM base UNION ALL SELECT * FROM mt)
  GROUP BY tok
),
ws AS (
  SELECT word, unnest(syms) AS tok, generate_subscripts(syms, 1) AS ord
  FROM encw
),
wid AS MATERIALIZED (
  SELECT word, list(voc.tid ORDER BY ws.ord) AS ids
  FROM ws JOIN voc USING (tok) GROUP BY word
),
dw AS (
  SELECT {id_col}, unnest(wlist) AS word,
         generate_subscripts(wlist, 1) AS ord
  FROM (SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}),
                                              '[^a-z]+'),
                           x -> x <> '') AS wlist
        FROM {table})
),
agg AS (
  SELECT {id_col}, flatten(list(wid.ids ORDER BY dw.ord)) AS token_ids
  FROM dw JOIN wid USING (word) GROUP BY {id_col}
)
SELECT {id_col},
       CAST(len(token_ids) AS BIGINT) AS n_bpe_tokens,
       CAST(token_ids AS INT[]) AS token_ids
FROM agg
"""


def bpe_encode_oracle_sql(
    table: str,
    n_merges: int,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of training 12 merges then encoding the same corpus:
    the training CTE chain, the merge list folded per distinct word,
    and the per-document re-aggregation."""
    train = bpe_oracle_sql(table, n_merges, min_count, text_col)
    # reuse the training SQL's WITH chain by nesting it as a scalar
    # merge-list source; v0 is recomputed here (flat chain, prefixed)
    sym = (
        "' ' || array_to_string(list_transform("
        "  generate_series(1, len(word)),"
        f"  i -> substr(word, i, 1) || CASE WHEN i = len(word)"
        f"    THEN '{_EOW}{_T}' ELSE '{_T}' END), ' ')"
    )
    return f"""
WITH m AS MATERIALIZED (
  SELECT coalesce(list(' ' || "left" || ' ' || "right" ORDER BY rank),
                  []) AS ps,
         coalesce(list(' ' || substr("left", 1, len("left") - {len(_T)})
                       || "right" ORDER BY rank), []) AS rs
  FROM (
{train}
  )
),
v AS MATERIALIZED (
  SELECT word, {sym} AS sym FROM (
    SELECT DISTINCT unnest(string_split_regex(lower({text_col}),
                                              '[^a-z]+')) AS word
    FROM {table}
  ) WHERE word <> ''
),
enc AS MATERIALIZED (
  SELECT v.word,
         CAST(len(string_split(trim(
           list_reduce(
             list_prepend(v.sym,
               list_transform(generate_series(1, len(m.ps)),
                              i -> CAST(i AS VARCHAR))),
             (acc, x) -> replace(acc, m.ps[CAST(x AS INT)],
                                 m.rs[CAST(x AS INT)]))), ' '))
           AS BIGINT) AS n_sym
  FROM v, m
),
w AS (
  SELECT {id_col}, word FROM (
    SELECT {id_col},
           unnest(string_split_regex(lower({text_col}), '[^a-z]+'))
             AS word
    FROM {table}
  ) WHERE word <> ''
)
SELECT w.{id_col},
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(e.n_sym) AS BIGINT) AS n_bpe_tokens
FROM w JOIN enc e ON w.word = e.word
GROUP BY w.{id_col}
"""


def bpe_vocab(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    vocab0: DataFrame | None = None,
) -> DataFrame:
    """The deterministic (tok, tid) vocabulary table
    :func:`bpe_encode_ids` derives from a corpus + merge table — the
    artifact to PERSIST next to the merges (a real tokenizer's vocab
    file).  Decode on another machine / a different corpus must use
    this table, not re-derive it: the base-symbol ids are
    lexicographic over THIS corpus's alphabet, so re-deriving from a
    corpus with even one new character shifts every id.

    Both levels are checkpointed (r16; guide §5): ``_vocab_ids``
    consumes the corpus word-count pass twice (the base-id ``count()``
    action and the union lineage), and callers consume THIS table
    several times over (``_bf_start_tid`` scalar collects + one
    broadcast build per encode/decode) — un-materialized, each
    consumer re-ran the full corpus explode; the output table itself
    is alphabet+merges bounded, so its checkpoint is a few KB.  A
    caller-supplied ``vocab0`` (from :func:`vocab0_from_trained`) is
    already checkpoint-backed and skips the corpus pass (r17).

    NOTE: this function executes EAGERLY at call time (r16 ADVICE —
    the two localCheckpoints run real Spark jobs, a full corpus pass
    when ``vocab0`` is not supplied); callers that only compose plans
    should defer the call until the vocabulary is actually needed."""
    if vocab0 is None:
        vocab0 = _initial_vocab(docs, text_col).localCheckpoint(eager=True)
    return _vocab_ids(vocab0, _merge_list(merges)).localCheckpoint(
        eager=True
    )


def _byte_token_ids(spark, start_tid: int) -> DataFrame:
    """The 512 byte-fallback vocabulary rows: ``<0xNN>_`` (word-
    medial) and ``<0xNN></w>_`` (word-final) at deterministic ids
    ``start_tid + 2*NN`` / ``+ 2*NN + 1`` — appended AFTER the
    trained vocabulary, the SentencePiece byte-piece convention
    adapted to this engine's terminator scheme."""
    rows = []
    for nn in range(256):
        rows.append((f"<0x{nn:02X}>{_T}", start_tid + 2 * nn))
        rows.append((f"<0x{nn:02X}>{_EOW}{_T}", start_tid + 2 * nn + 1))
    return spark.createDataFrame(rows, "tok string, tid int")


def _bf_start_tid(vocab_ids: DataFrame) -> int:
    row = vocab_ids.agg(F.max("tid")).collect()  # one scalar row
    return int(row[0][0]) + 1


def bpe_encode_ids_bf(
    docs: DataFrame,
    merges: DataFrame,
    vocab_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`bpe_encode_ids` with BYTE-LEVEL FALLBACK (the GPT-2 /
    SentencePiece ``byte_fallback`` contract, r14 — the r13 verdict's
    ask 2): encoding runs against a PERSISTED vocabulary
    (:func:`bpe_vocab` of the training corpus), and symbols that
    vocabulary cannot cover — characters never seen at train time, or
    a word-final form of a char only ever seen word-medially — render
    as byte tokens ``<0xNN>`` (UTF-8; one byte for the ``[a-z]`` word
    alphabet) at deterministic ids appended after the trained
    vocabulary.  BPE therefore NEVER emits an unknown/-1 id and
    :func:`bpe_decode_ids_bf` restores the normalized word stream
    bit-exactly.

    Scale shape: identical to :func:`bpe_encode_ids` — the merge fold
    runs once per DISTINCT word, id resolution is two broadcast
    equi-joins against the bounded vocabulary (trained + 512 byte
    rows), and per-doc arrays rebuild through the order-restoring
    ``array_sort(collect_list(struct))``.  No UDFs, no extra
    shuffles.
    """
    spark = docs.sparkSession
    ms = _merge_list(merges)
    if ms:
        pats = ", ".join(_sq(f" {l} {r}") for l, r, _ in ms)
        reps = ", ".join(_sq(f" {m}") for _, _, m in ms)
        fold = (
            f"aggregate(arrays_zip(array({pats}), array({reps})), "
            "sym, (acc, x) -> replace(acc, x['0'], x['1']))"
        )
    else:
        fold = "sym"
    start = _bf_start_tid(vocab_ids)
    bt = _byte_token_ids(spark, start).withColumnRenamed(
        "tok", "__btok"
    ).withColumnRenamed("tid", "__btid")
    wsym = _initial_vocab(docs, text_col).select(
        "word",
        F.posexplode(F.split(F.trim(F.expr(fold)), " ")).alias(
            "spos", "tok"
        ),
    )
    # unmatched symbols are single-char based (every merge surface is
    # in the trained vocab by construction) — rewrite them to their
    # byte-token form, preserving the word-final marker
    bf_tok = (
        "IF(tid IS NOT NULL, NULL, concat('<0x', "
        "lpad(hex(ascii(substring(tok, 1, 1))), 2, '0'), '>', "
        f"IF(tok LIKE '%{_EOW}{_T}', '{_EOW}{_T}', '{_T}')))"
    )
    resolved = (
        wsym.join(F.broadcast(vocab_ids), "tok", "left")
        .withColumn("__btok", F.expr(bf_tok))
        .join(F.broadcast(bt), "__btok", "left")
        .select(
            "word",
            "spos",
            F.coalesce("tid", "__btid").cast("int").alias("tid"),
        )
    )
    wids = resolved.groupBy("word").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(spos, tid))),"
            " x -> x.tid)"
        ).alias("ids")
    )
    dwords = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("wpos", "word"),
    ).filter(F.col("word") != "")
    return (
        dwords.join(wids, "word")
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform("
                "array_sort(collect_list(struct(wpos, ids))),"
                " x -> x.ids))"
            )
            .cast("array<int>")
            .alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("bigint").alias("n_bpe_tokens"),
            "token_ids",
        )
    )


def bpe_decode_ids_bf(
    encoded: DataFrame,
    vocab_ids: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Invert :func:`bpe_encode_ids_bf`: ids resolve through the same
    persisted vocabulary EXTENDED with the 512 byte rows, then ONE
    codegen ``aggregate`` fold per document strips terminators, turns
    ``</w>`` markers into spaces, and decodes ``<0xNN>`` byte pieces
    via ``conv``/``char`` — no UDF, the `unigram_decode` fold adapted
    to BPE's in-token terminator scheme."""
    spark = encoded.sparkSession
    start = _bf_start_tid(vocab_ids)
    lut = vocab_ids.select(
        "tok", F.col("tid").cast("int").alias("tid")
    ).unionByName(_byte_token_ids(spark, start))
    toks = encoded.select(
        F.col(id_col),
        F.posexplode(F.col(ids_col)).alias("tpos", "tid"),
    )
    core = (
        f"regexp_replace(substring(t, 1, length(t) - {len(_T)}), "
        f"'{_EOW}$', '')"
    )
    fold = f"""
rtrim(aggregate(
  __toks,
  CAST('' AS STRING),
  (acc, t) -> concat(
    acc,
    IF({core} RLIKE '^<0x[0-9A-F]{{2}}>$',
       char(CAST(conv(substring({core}, 4, 2), 16, 10) AS INT)),
       {core}),
    IF(substring(t, 1, length(t) - {len(_T)}) LIKE '%{_EOW}',
       ' ', ''))))
"""
    return (
        toks.join(F.broadcast(lut), "tid")
        .groupBy(id_col)
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(tpos, tok))),"
                " x -> x.tok)"
            ).alias("__toks")
        )
        .select(id_col, F.expr(fold).alias("decoded_text"))
    )


def bpe_decode_ids(
    encoded: DataFrame,
    docs: DataFrame | None = None,
    merges: DataFrame | None = None,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    text_col: str = "text",
    vocab_ids: DataFrame | None = None,
    vocab0: DataFrame | None = None,
) -> DataFrame:
    """Invert :func:`bpe_encode_ids`: token-id arrays back to text —
    the loader-side decode that makes the tokenizer surface a real
    round trip (``decode(encode(t))`` equals the normalized word
    sequence of ``t``, pinned by test and oracle row).

    The id→token table is the SAME deterministic vocabulary
    :func:`bpe_encode_ids` derives.  Pass it explicitly via
    ``vocab_ids`` (from :func:`bpe_vocab`, persisted next to the
    merges — the vocab-file contract); passing ``docs`` + ``merges``
    instead re-derives it and is ONLY correct when ``docs`` is the
    encode-time corpus (base-symbol ids depend on its alphabet — a
    different corpus silently shifts ids, hence the explicit-table
    path).  Decoding is pure string mechanics: every token ends with
    the ``_`` terminator and word-final tokens carry ``</w>``, so per
    doc: concatenate tokens in order, drop the terminators, turn
    ``</w>`` into spaces.

    Scale shape: one posexplode + a vocab-bounded equi-join + the
    order-restoring per-doc rebuild — the same joins as encode; the
    concatenation is one in-row ``array_join``.
    """
    if vocab_ids is None:
        if docs is None or merges is None:
            raise ValueError(
                "bpe_decode_ids needs either vocab_ids (the persisted "
                "table from bpe_vocab) or the encode-time docs+merges "
                "to re-derive it"
            )
        vocab_ids = bpe_vocab(docs, merges, text_col, vocab0=vocab0)
    toks = encoded.select(
        F.col(id_col),
        F.posexplode(F.col(ids_col)).alias("tpos", "tid"),
    )
    return (
        # vocab_ids is alphabet+merges bounded — broadcast deliberately
        # (the encode-side B8 rationale: an SMJ here exchanges the
        # corpus-wide id posexplode for a table of a few hundred rows)
        toks.join(F.broadcast(vocab_ids), "tid")
        .groupBy(id_col)
        .agg(
            F.expr(
                "array_join(transform("
                "array_sort(collect_list(struct(tpos, tok))),"
                " x -> x.tok), '')"
            ).alias("__joined")
        )
        .select(
            id_col,
            F.trim(
                F.expr(
                    f"replace(replace(__joined, {_sq(_EOW)}, ' '), "
                    f"{_sq(_T)}, '')"
                )
            ).alias("decoded_text"),
        )
    )
