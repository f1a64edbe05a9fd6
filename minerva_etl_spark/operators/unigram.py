"""Distributed unigram-LM tokenizer (Kudo 2018, the SentencePiece
unigram model) — hard-EM Viterbi training + encoding, fully
oracle-verifiable (round 12).

`operators/bpe.py` owns the merge-table tokenizer family; this module
is the OTHER canonical subword algorithm: a unigram language model
over a candidate-piece vocabulary, trained by EM where the E-step
segments every word with Viterbi under the current piece costs and
the M-step re-estimates piece frequencies from the chosen
segmentations (hard EM — the deterministic variant of Kudo's
forward-backward EM; unused pieces prune to zero, single characters
are floored so coverage never breaks).

Like BPE, training runs on the distinct WORD-FREQUENCY table — the
100 TB corpus collapses to its (word, count) vocabulary first (one
map-side-combinable groupBy), and every EM round is: one broadcast
join of word-substrings against the (bounded) piece vocabulary, one
per-word DP, one combinable count groupBy.  Corpus size enters only
through word counts.

Cross-engine determinism (the part that makes `unigram_encode` a full
value-hash gate row):

* Piece costs are ``round(ln(total) − ln(freq), 6)`` snapped to a
  6-dp integer grid BEFORE the DP — so the DP itself is exact BIGINT
  arithmetic; ``ln`` is the only libm touch and the rounding absorbs
  last-ulp drift (the `lm.py` discipline).
* The Viterbi lattice folds left-to-right with every cell packed as
  ONE BIGINT — ``best_cost · 1024 + parent_j`` — because DuckDB
  1.0.0's ``list_reduce`` mis-evaluates struct accumulators but is
  sound for ``BIGINT[]`` states.  Minimizing the packed value IS the
  tie-break: lowest total cost, then smallest parent (= longest last
  piece), bit-identically in both engines.
* The backtrace is a second BIGINT[] fold following packed parents;
  pieces come from ``substring(word, ...)`` on boundary pairs.

Words are ``[a-z]+`` runs of the lowercased text (the `bpe.py`
tokenization); runs of 1024+ characters (binary blobs masquerading as
text) would alias the parent packing, so they are EXCLUDED from both
training and encoding (mirrored in the oracle) — the same class of
row a length-bounded quality filter drops first anyway.

Reference: extension (the reference has no tokenizer surface); the
algorithm is the published unigram-LM recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "unigram_train",
    "unigram_encode",
    "unigram_encode_bf",
    "unigram_decode",
    "unigram_encode_ids",
    "unigram_vocab_ids",
    "unigram_encode_oracle_sql",
    "unigram_encode_bf_oracle_sql",
    "unigram_encode_ids_oracle_sql",
]

#: parent-pointer packing base (word length < 1024 by construction)
_ENC = 1024
#: unreachable-cell cost on the 6-dp grid (far above any real path)
_INF = 4_000_000_000_000
#: cost grid
_GRID = 1_000_000.0
#: byte-fallback penalty cost (r13, the r12 verdict's ask 3): above
#: any real piece cost (ln-scale grid tops out ~28e6) so fallback
#: never displaces a trained segmentation, but low enough that a
#: worst-case all-fallback 1023-char word (1023 · 4e7 ≈ 4.1e10)
#: stays far below the _INF sentinel — the packed lattice is
#: UNCHANGED, fallback letters are just ordinary high-cost edges
_BF_COST = 40_000_000
#: end-of-word marker on the byte-fallback stream (the bpe.py `</w>`
#: convention) — what makes decode(encode(x)) a real round trip
_EOW = "</w>"


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct ``(word, cnt)`` — lowercased ``[a-z]+`` runs, the
    `bpe.py` word model."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word")
        )
        .filter(
            (F.col("word") != "") & (F.length("word") < _ENC)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _subs(words: DataFrame, max_len: int) -> DataFrame:
    """All substring occurrences ``(word, cnt, j, i, sub)`` with
    ``1 ≤ i−j ≤ max_len`` — one flatten-explode projection, reused by
    candidate counting and edge generation."""
    gen = (
        f"flatten(transform(sequence(0, length(word) - 1), j -> "
        f"transform(sequence(j + 1, least(j + {int(max_len)}, "
        f"length(word))), i -> struct(j AS j, i AS i, "
        f"substring(word, j + 1, i - j) AS sub))))"
    )
    return words.select(
        "word", "cnt", F.explode(F.expr(gen)).alias("__s")
    ).select(
        "word", "cnt",
        F.col("__s.j").alias("j"),
        F.col("__s.i").alias("i"),
        F.col("__s.sub").alias("sub"),
    )


def _with_costs(vocab: DataFrame) -> DataFrame:
    """Add the grid-snapped cost column: ``round(ln(total) − ln(freq),
    6) · 1e6`` as BIGINT (total folded in by a one-row broadcast)."""
    total = vocab.agg(F.sum("freq").alias("__tot"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "token",
        "freq",
        F.expr(
            f"CAST(floor(round(ln(CAST(__tot AS DOUBLE)) - "
            f"ln(CAST(freq AS DOUBLE)), 6) * {_GRID} + 0.5d) AS BIGINT)"
        ).alias("cost"),
    )


#: the packed Viterbi forward fold — per-word, over the sorted edge
#: array ``__edges: array<struct<i,j,cost>>``; cell = best·1024 + parent
_DP_VALS = f"""
aggregate(
  sequence(1, length(word)),
  array(CAST(0 AS BIGINT)),
  (acc, i) -> array_append(acc,
    coalesce(
      array_min(transform(
        filter(__edges, e -> e.i = i),
        e -> ((element_at(acc, e.j + 1) div {_ENC}) + e.cost)
             * {_ENC} + e.j)),
      CAST({_INF} AS BIGINT) * {_ENC})))
"""

#: the backtrace fold: follow packed parents from position n to 0
_DP_CHAIN = f"""
aggregate(
  sequence(1, length(word)),
  array(CAST(length(word) AS BIGINT)),
  (acc, s) -> array_append(acc,
    IF(element_at(acc, size(acc)) > 0,
       element_at(__vals,
                  CAST(element_at(acc, size(acc)) AS INT) + 1)
         % {_ENC},
       CAST(0 AS BIGINT))))
"""

#: boundary pairs (descending) → pieces in reading order
_DP_TOKENS = """
reverse(filter(
  transform(sequence(1, size(__chain) - 1), k ->
    IF(element_at(__chain, k) > element_at(__chain, k + 1),
       substring(word,
                 CAST(element_at(__chain, k + 1) AS INT) + 1,
                 CAST(element_at(__chain, k)
                      - element_at(__chain, k + 1) AS INT)),
       NULL)),
  x -> x IS NOT NULL))
"""


def _segment(
    words: DataFrame, vocab_costs: DataFrame, max_len: int
) -> DataFrame:
    """Viterbi-segment every distinct word under the current costs →
    ``(word, cnt, pieces array<string>)``.  One broadcast join of the
    substring explode against the bounded vocabulary, one combinable
    edge collect, one codegen DP projection — no per-word Python, no
    iterative driver loop.

    ``cnt`` rides the edge aggregation (constant per word, so
    ``first`` is deterministic) instead of joining ``words`` back on —
    the join re-executed the caller's word-count subtree as a second
    exchange for a column this groupBy already holds (guide §2.4); a
    word with no vocabulary edge produced no row under the old inner
    join and produces none now."""
    edges = (
        _subs(words, max_len)
        .join(
            F.broadcast(vocab_costs.select("token", "cost")),
            F.col("sub") == F.col("token"),
        )
        .groupBy("word")
        .agg(
            F.first("cnt").alias("cnt"),
            F.array_sort(
                F.collect_list(F.struct("i", "j", "cost"))
            ).alias("__edges"),
        )
    )
    return (
        edges.withColumn("__vals", F.expr(_DP_VALS))
        .withColumn("__chain", F.expr(_DP_CHAIN))
        .select(
            "word", "cnt", F.expr(_DP_TOKENS).alias("pieces")
        )
    )


def unigram_train(
    docs: DataFrame,
    max_vocab: int = 512,
    max_len: int = 5,
    iters: int = 2,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram vocabulary: seed with every single character
    plus the top multi-char substrings by weighted occurrence count
    (freq desc, token asc, occurrence count ≥ ``min_count``), then run
    ``iters`` hard-EM rounds — Viterbi-segment all distinct words,
    re-count piece usage, drop unused multi-char pieces, floor
    character frequencies at 1.  Returns ``(token, freq, cost)``."""
    words = _words(docs, text_col).localCheckpoint(eager=True)
    cand = _subs(words, max_len).groupBy(
        F.col("sub").alias("token")
    ).agg(F.sum("cnt").alias("freq"))
    chars = cand.filter(F.length("token") == 1)
    multi = (
        cand.filter(
            (F.length("token") > 1) & (F.col("freq") >= min_count)
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.orderBy(
                    F.col("freq").desc(), F.col("token").asc()
                )
            ),
        )
        .filter(F.col("__rn") <= max_vocab)
        .drop("__rn")
    )
    vocab = _with_costs(chars.unionByName(multi)).localCheckpoint(
        eager=True
    )
    for _ in range(int(iters)):
        seg = _segment(words, vocab, max_len)
        used = (
            seg.select(
                "cnt", F.explode("pieces").alias("token")
            )
            .groupBy("token")
            .agg(F.sum("cnt").alias("freq"))
        )
        # chars floor at 1 (coverage); unused multi-char pieces drop
        refreshed = (
            vocab.select("token")
            .filter(F.length("token") == 1)
            .join(used, "token", "left")
            .select(
                "token",
                F.coalesce("freq", F.lit(1)).alias("freq"),
            )
            .unionByName(used.filter(F.length("token") > 1))
        )
        vocab = _with_costs(refreshed).localCheckpoint(eager=True)
    return vocab


def unigram_encode(
    docs: DataFrame,
    vocab: DataFrame,
    max_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents at a trained vocabulary: Viterbi runs once per
    DISTINCT word (the corpus joins back by word — encoding cost
    follows the word table, not the corpus), then per-doc reassembly
    in word order.  Returns ``(id, n_words, n_tokens, pieces string)``
    with pieces space-joined in reading order."""
    doc_words = (
        docs.select(
            id_col,
            F.posexplode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("pos", "word"),
        )
        .filter(
            (F.col("word") != "") & (F.length("word") < _ENC)
        )
    )
    distinct_words = (
        doc_words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    seg = _segment(distinct_words, vocab, max_len).select(
        "word", "pieces"
    )
    return (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.expr(
                "flatten(transform("
                "array_sort(collect_list(struct(pos, pieces))), "
                "s -> s.pieces))"
            ).alias("__pieces"),
        )
        .select(
            id_col,
            "n_words",
            F.size("__pieces").cast("bigint").alias("n_tokens"),
            F.array_join("__pieces", " ").alias("pieces"),
        )
    )


def unigram_encode_bf(
    docs: DataFrame,
    vocab: DataFrame,
    max_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`unigram_encode` with the SentencePiece ``byte_fallback``
    contract (r13): characters the vocabulary cannot cover — letters
    never seen at train time — segment as penalty-cost single-char
    edges through the UNCHANGED packed lattice and render as byte
    pieces ``<0xNN>`` (UTF-8, one byte for the [a-z] word alphabet);
    the last piece of each word carries the ``</w>`` marker so
    :func:`unigram_decode` restores the normalized word stream
    bit-exactly.  Returns ``(id, n_words, n_tokens, pieces)``."""
    spark = docs.sparkSession
    letters = spark.range(26).select(
        F.expr("char(97 + id)").alias("token")
    )
    known = vocab.select("token").filter(F.length("token") == 1)
    missing = [
        r.token
        for r in letters.join(known, "token", "left_anti").collect()
    ]  # ≤ 26 rows — a bounded alphabet, not data
    vocab_bf = vocab.select("token", "cost").unionByName(
        spark.createDataFrame(
            [(t, _BF_COST) for t in sorted(missing)],
            "token string, cost bigint",
        )
    )
    doc_words = (
        docs.select(
            id_col,
            F.posexplode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("pos", "word"),
        )
        .filter((F.col("word") != "") & (F.length("word") < _ENC))
    )
    distinct_words = doc_words.groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    seg = _segment(distinct_words, vocab_bf, max_len)
    if missing:
        in_list = ", ".join(f"'{t}'" for t in sorted(missing))
        render = (
            f"IF(p IN ({in_list}), "
            f"concat('<0x', upper(hex(ascii(p))), '>'), p)"
        )
    else:
        render = "p"
    seg = seg.select(
        "word",
        F.expr(
            f"transform(pieces, (p, k) -> concat({render}, "
            f"IF(k = size(pieces) - 1, '{_EOW}', '')))"
        ).alias("pieces"),
    )
    return (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.expr(
                "flatten(transform("
                "array_sort(collect_list(struct(pos, pieces))), "
                "s -> s.pieces))"
            ).alias("__pieces"),
        )
        .select(
            id_col,
            "n_words",
            F.size("__pieces").cast("bigint").alias("n_tokens"),
            F.array_join("__pieces", " ").alias("pieces"),
        )
    )


def unigram_decode(
    encoded: DataFrame,
    id_col: str = "doc_id",
    pieces_col: str = "pieces",
    out_col: str = "text",
) -> DataFrame:
    """Invert :func:`unigram_encode_bf`: the space-joined byte-
    fallback piece stream back to the normalized word sequence —
    ``decode(encode(t))`` equals ``t``'s lowercased ``[a-z]+`` word
    stream joined by single spaces.  ONE codegen projection (an
    ``aggregate`` fold over the split pieces): strip ``</w>`` into
    spaces, decode ``<0xNN>`` byte pieces via ``conv``/``char`` —
    no join, no UDF."""
    fold = f"""
rtrim(aggregate(
  split({pieces_col}, ' '),
  CAST('' AS STRING),
  (acc, t) -> concat(
    acc,
    IF(regexp_replace(t, '{_EOW}$', '')
         RLIKE '^<0x[0-9A-F]{{2}}>$',
       char(CAST(conv(substring(
           regexp_replace(t, '{_EOW}$', ''), 4, 2), 16, 10)
           AS INT)),
       regexp_replace(t, '{_EOW}$', '')),
    IF(t LIKE '%{_EOW}', ' ', ''))))
"""
    return encoded.withColumn(out_col, F.expr(fold))


def unigram_vocab_ids(vocab: DataFrame) -> DataFrame:
    """Assign stable token ids: 0-based dense rank by ``(freq desc,
    token asc)`` — frequent pieces get small ids, ties break
    lexicographically (the `bpe_encode_ids` convention adapted to a
    probability-ranked vocabulary).  Returns ``(token, token_id)``."""
    return vocab.select(
        "token",
        (
            F.row_number().over(
                Window.orderBy(
                    F.col("freq").desc(), F.col("token").asc()
                )
            )
            - 1
        ).cast("int").alias("token_id"),
    )


def unigram_encode_ids(
    docs: DataFrame,
    vocab: DataFrame,
    max_len: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """`unigram_encode` emitting the trainable artifact: each doc's
    token-ID array (``array<int>``) under `unigram_vocab_ids` — the
    id stream a pretraining packer consumes.  Pieces not in the id
    table (the documented OOV collapse) map to -1."""
    ids = unigram_vocab_ids(vocab)
    pieces = unigram_encode(
        docs, vocab, max_len=max_len, id_col=id_col, text_col=text_col
    )
    ex = pieces.select(
        id_col,
        "n_words",
        F.posexplode(F.split("pieces", " ")).alias("pos", "token"),
    )
    return (
        ex.join(F.broadcast(ids), "token", "left")
        .groupBy(id_col)
        .agg(
            F.max("n_words").alias("n_words"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "token_id"))
                ),
                lambda s: F.coalesce(
                    s["token_id"], F.lit(-1).cast("int")
                ),
            ).alias("token_ids"),
        )
        .select(
            id_col,
            "n_words",
            F.size("token_ids").cast("bigint").alias("n_tokens"),
            "token_ids",
        )
    )


# ------------------------------------------------------------- oracle


def _duck_dp_ctes(
    words_cte: str,
    vocab_cte: str,
    max_len: int,
    tag: str,
    subs_cte: str = "subs",
) -> list[str]:
    """The DuckDB Viterbi chain over ``words_cte (word, cnt)`` at
    ``vocab_cte (token, cost)`` → ``seg{tag} (word, cnt, pieces)`` —
    the exact packed-BIGINT folds of the Spark `_segment`."""
    vals = f"""
list_reduce(
  list_prepend(CAST([0] AS BIGINT[]),
    list_transform(range(1, length(word) + 1),
                   i -> CAST([i] AS BIGINT[]))),
  (acc, x) -> list_append(acc,
    coalesce(
      list_min(list_transform(
        list_filter(edges, e -> e.i = x[1]),
        e -> ((acc[e.j + 1] // {_ENC}) + e.cost) * {_ENC} + e.j)),
      CAST({_INF} AS BIGINT) * {_ENC})))
"""
    chain = f"""
list_reduce(
  list_prepend(CAST([length(word)] AS BIGINT[]),
    list_transform(range(1, length(word) + 1),
                   i -> CAST([0] AS BIGINT[]))),
  (acc, x) -> list_append(acc,
    CASE WHEN acc[len(acc)] > 0
         THEN vals[CAST(acc[len(acc)] AS INT) + 1] % {_ENC}
         ELSE CAST(0 AS BIGINT) END))
"""
    toks = """
list_reverse(list_filter(
  list_transform(range(1, len(chain)),
    k -> CASE WHEN chain[k] > chain[k + 1]
              THEN substring(word, CAST(chain[k + 1] AS INT) + 1,
                             CAST(chain[k] - chain[k + 1] AS INT))
              ELSE NULL END),
  x -> x IS NOT NULL))
"""
    return [
        f"""edges{tag} AS MATERIALIZED (
  SELECT s.word, list({{'i': s.i, 'j': s.j, 'cost': v.cost}}
                      ORDER BY s.i, s.j) AS edges
  FROM {subs_cte} s JOIN {vocab_cte} v ON s.sub = v.token
  GROUP BY s.word
)""",
        f"""dp{tag} AS MATERIALIZED (
  SELECT word, cnt, chain FROM (
    SELECT word, cnt, {chain.replace('vals', 'vals_arr')} AS chain
    FROM (
      SELECT word, cnt, edges, {vals} AS vals_arr
      FROM {words_cte} w JOIN edges{tag} e USING (word)
    )
  )
)""",
        f"""seg{tag} AS MATERIALIZED (
  SELECT word, cnt, {toks} AS pieces FROM dp{tag}
)""",
    ]


def _oracle_ctes(
    table: str,
    max_vocab: int,
    max_len: int,
    iters: int,
    min_count: int,
    id_col: str,
    text_col: str,
) -> list[str]:
    """The full train+segment CTE chain shared by the pieces and
    token-ids oracles — ends with ``segF`` (final segmentation per
    distinct word) and ``doc_words`` (per-doc word occurrences)."""
    L = int(max_len)
    ctes = [
        f"""words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(string_split_regex(lower({text_col}), '[^a-z]+'))
      AS word
    FROM {table}
  ) WHERE word <> '' AND length(word) < 1024 GROUP BY word
)""",
        f"""subs AS MATERIALIZED (
  SELECT word, cnt, gs.j AS j, gi.i AS i,
         substring(word, gs.j + 1, gi.i - gs.j) AS sub
  FROM words
  CROSS JOIN UNNEST(generate_series(0, length(word) - 1)) AS gs(j)
  CROSS JOIN UNNEST(generate_series(gs.j + 1,
                    least(gs.j + {L}, length(word)))) AS gi(i)
)""",
        f"""cand AS (
  SELECT sub AS token, CAST(sum(cnt) AS BIGINT) AS freq
  FROM subs GROUP BY sub
)""",
        f"""vocab0raw AS (
  SELECT token, freq FROM cand WHERE length(token) = 1
  UNION ALL
  SELECT token, freq FROM (
    SELECT token, freq,
           row_number() OVER (ORDER BY freq DESC, token ASC) AS rn
    FROM cand WHERE length(token) > 1 AND freq >= {int(min_count)}
  ) WHERE rn <= {int(max_vocab)}
)""",
    ]

    def costs_cte(src: str, out: str) -> str:
        return f"""{out} AS MATERIALIZED (
  SELECT token, freq,
         CAST(floor(round(
           ln(CAST((SELECT sum(freq) FROM {src}) AS DOUBLE))
           - ln(CAST(freq AS DOUBLE)), 6) * 1000000.0 + 0.5)
           AS BIGINT) AS cost
  FROM {src}
)"""

    ctes.append(costs_cte("vocab0raw", "vocab0"))
    for t in range(int(iters)):
        ctes += _duck_dp_ctes("words", f"vocab{t}", L, str(t))
        ctes.append(
            f"""used{t} AS (
  SELECT piece AS token, CAST(sum(cnt) AS BIGINT) AS freq FROM (
    SELECT cnt, unnest(pieces) AS piece FROM seg{t}
  ) GROUP BY piece
)"""
        )
        ctes.append(
            f"""vocab{t + 1}raw AS (
  SELECT v.token, coalesce(u.freq, 1) AS freq
  FROM vocab{t} v LEFT JOIN used{t} u ON v.token = u.token
  WHERE length(v.token) = 1
  UNION ALL
  SELECT token, freq FROM used{t} WHERE length(token) > 1
)"""
        )
        ctes.append(costs_cte(f"vocab{t + 1}raw", f"vocab{t + 1}"))
    final = f"vocab{int(iters)}"
    ctes += _duck_dp_ctes("words", final, L, "F")
    ctes.append(
        f"""doc_words AS (
  SELECT {id_col} AS doc_id, pos, word FROM (
    SELECT {id_col},
           generate_subscripts(string_split_regex(lower({text_col}),
                               '[^a-z]+'), 1) - 1 AS pos,
           unnest(string_split_regex(lower({text_col}), '[^a-z]+'))
             AS word
    FROM {table}
  ) WHERE word <> '' AND length(word) < 1024
)"""
    )
    return ctes


def unigram_encode_oracle_sql(
    table: str,
    max_vocab: int = 512,
    max_len: int = 5,
    iters: int = 2,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `unigram_train` + `unigram_encode`: identical
    word model, candidate seeding, grid-snapped costs, packed-BIGINT
    Viterbi folds per EM round, hard-EM refresh, and per-doc
    reassembly.  Any cost, tie-break, pruning, or reassembly
    divergence hash-mismatches."""
    body = ",\n".join(
        _oracle_ctes(
            table, max_vocab, max_len, iters, min_count, id_col,
            text_col,
        )
    )
    return f"""
WITH {body}
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_tokens AS BIGINT) AS n_tokens, pieces
FROM (
  SELECT d.doc_id, count(*) AS n_words,
         sum(len(s.pieces)) AS n_tokens,
         array_to_string(
           flatten(list(s.pieces ORDER BY d.pos)), ' ') AS pieces
  FROM doc_words d JOIN segF s ON d.word = s.word
  GROUP BY d.doc_id
)
"""


def unigram_encode_bf_oracle_sql(
    train_table: str,
    encode_table: str,
    max_vocab: int = 512,
    max_len: int = 5,
    iters: int = 2,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `unigram_train` (over ``train_table``) +
    `unigram_encode_bf` + `unigram_decode` (over ``encode_table``):
    the full train chain, the encode corpus segmented under the
    trained vocabulary UNION the 26-letter penalty alphabet, byte
    pieces rendered ``<0xNN>`` with the ``</w>`` word marker — and
    ``decoded`` computed INDEPENDENTLY as the encode corpus's
    normalized word stream, so the row only hash-matches when
    decode(encode(x)) == x bit-exactly."""
    L = int(max_len)
    body = _oracle_ctes(
        train_table, max_vocab, max_len, iters, min_count, id_col,
        text_col,
    )
    final = f"vocab{int(iters)}"
    body.append(
        f"""doc_wordsE AS MATERIALIZED (
  SELECT {id_col} AS doc_id, pos, word FROM (
    SELECT {id_col},
           generate_subscripts(string_split_regex(lower({text_col}),
                               '[^a-z]+'), 1) - 1 AS pos,
           unnest(string_split_regex(lower({text_col}), '[^a-z]+'))
             AS word
    FROM {encode_table}
  ) WHERE word <> '' AND length(word) < 1024
)"""
    )
    body.append(
        """wordsE AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM doc_wordsE GROUP BY word
)"""
    )
    body.append(
        f"""subsE AS MATERIALIZED (
  SELECT word, cnt, gs.j AS j, gi.i AS i,
         substring(word, gs.j + 1, gi.i - gs.j) AS sub
  FROM wordsE
  CROSS JOIN UNNEST(generate_series(0, length(word) - 1)) AS gs(j)
  CROSS JOIN UNNEST(generate_series(gs.j + 1,
                    least(gs.j + {L}, length(word)))) AS gi(i)
)"""
    )
    body.append(
        f"""penalty AS MATERIALIZED (
  SELECT chr(CAST(96 + gs.i AS INT)) AS token
  FROM UNNEST(generate_series(1, 26)) AS gs(i)
  WHERE chr(CAST(96 + gs.i AS INT)) NOT IN
    (SELECT token FROM {final} WHERE length(token) = 1)
)"""
    )
    body.append(
        f"""vocabBF AS MATERIALIZED (
  SELECT token, CAST(0 AS BIGINT) AS freq, cost FROM {final}
  UNION ALL
  SELECT token, CAST(0 AS BIGINT) AS freq,
         CAST({_BF_COST} AS BIGINT) AS cost
  FROM penalty
)"""
    )
    body += _duck_dp_ctes("wordsE", "vocabBF", L, "BF",
                          subs_cte="subsE")
    body.append(
        f"""segR AS (
  SELECT word,
         list(
           CASE WHEN pen.token IS NOT NULL
                THEN '<0x' || upper(to_hex(ascii(x.piece))) || '>'
                ELSE x.piece END
           || CASE WHEN x.ppos = x.np THEN '{_EOW}' ELSE '' END
           ORDER BY x.ppos) AS pieces
  FROM (
    SELECT word, generate_subscripts(pieces, 1) AS ppos,
           unnest(pieces) AS piece, len(pieces) AS np
    FROM segBF
  ) x LEFT JOIN penalty pen ON x.piece = pen.token
  GROUP BY word
)"""
    )
    joined = ",\n".join(body)
    return f"""
WITH {joined}
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_tokens AS BIGINT) AS n_tokens, pieces, decoded
FROM (
  SELECT d.doc_id, count(*) AS n_words,
         sum(len(s.pieces)) AS n_tokens,
         array_to_string(
           flatten(list(s.pieces ORDER BY d.pos)), ' ') AS pieces,
         array_to_string(list(d.word ORDER BY d.pos), ' ') AS decoded
  FROM doc_wordsE d JOIN segR s ON d.word = s.word
  GROUP BY d.doc_id
)
"""


def unigram_encode_ids_oracle_sql(
    table: str,
    max_vocab: int = 512,
    max_len: int = 5,
    iters: int = 2,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `unigram_encode_ids`: the same chain with the
    final vocabulary dense-ranked ``(freq desc, token asc)`` into
    0-based ids and each doc's piece stream mapped through it (OOV →
    -1, the documented collapse class).  The gate projection joins the
    id array as a string (the `lifecycle_array_trend` convention)."""
    body = ",\n".join(
        _oracle_ctes(
            table, max_vocab, max_len, iters, min_count, id_col,
            text_col,
        )
    )
    final = f"vocab{int(iters)}"
    return f"""
WITH {body},
ids AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY freq DESC, token ASC) - 1
              AS INT) AS token_id
  FROM {final}
),
doc_pieces AS (
  SELECT d.doc_id, d.pos AS wpos,
         generate_subscripts(s.pieces, 1) AS ppos,
         unnest(s.pieces) AS token,
         len(s.pieces) AS n_in_word
  FROM doc_words d JOIN segF s ON d.word = s.word
),
mapped AS (
  SELECT p.doc_id, p.wpos, p.ppos,
         coalesce(i.token_id, -1) AS token_id
  FROM doc_pieces p LEFT JOIN ids i ON p.token = i.token
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       token_ids_str
FROM (
  SELECT m.doc_id,
         (SELECT count(*) FROM doc_words dw
          WHERE dw.doc_id = m.doc_id) AS n_words,
         count(*) AS n_tokens,
         array_to_string(
           list(CAST(token_id AS VARCHAR)
                ORDER BY m.wpos, m.ppos), ' ') AS token_ids_str
  FROM mapped m
  GROUP BY m.doc_id
)
"""
