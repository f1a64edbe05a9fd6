"""Chat / SFT conversation operators — the instruction-tuning side of
a training-data pipeline.

Post-training corpora are conversations, not documents: JSONL records
with a ``messages`` array of ``{role, content}`` turns.  The pipeline
needs to (1) parse them out of raw JSON, (2) validate structure (known
roles, strict user/assistant alternation, optional leading system
turn), (3) render each conversation into the single training string a
tokenizer consumes (a chat template), and (4) measure it (turns,
chars, tokens) for mixing/packing budgets.

Everything here is pure Catalyst — ``from_json`` for parsing and
higher-order array functions (``transform`` / ``filter`` /
``aggregate``) for validation and rendering — so conversations never
leave the JVM: one shuffle-free whole-stage-codegen scan, the same
posture as the text-quality operators (`operators/text.py`).

Template: ChatML-style by default —
``<|im_start|>role\\ncontent<|im_end|>\\n`` per turn — with the
markers parameterized so any ``prefix role \\n content suffix``
template family renders without code changes.

Reference: extension (the reference has no conversation surface); the
record shape is the de-facto public JSONL chat format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MESSAGE_SCHEMA = "array<struct<role:string, content:string>>"

#: roles a well-formed conversation may contain
KNOWN_ROLES = ("system", "user", "assistant")


def parse_conversations(
    df: DataFrame,
    json_col: str = "messages_json",
    out_col: str = "messages",
) -> DataFrame:
    """Parse a JSON string column into the typed ``messages`` array.
    BOTH public record shapes parse: a bare turn array
    ``[{role, content}, ...]`` and the object wrapper
    ``{"messages": [...]}`` (the de-facto OpenAI/HF JSONL format) —
    whichever matches wins.  Malformed JSON yields null (Spark's
    ``from_json`` contract) — filter with ``is_valid_conversation``
    rather than failing the scan."""
    bare = F.from_json(F.col(json_col), MESSAGE_SCHEMA)
    wrapped = F.from_json(
        F.col(json_col), f"struct<messages:{MESSAGE_SCHEMA}>"
    )["messages"]
    # wrapped FIRST: PERMISSIVE from_json parses an object under the
    # array schema as [struct(null, null)] rather than null, so the
    # bare branch can never be trusted to reject the object shape —
    # while an actual bare array IS null under the struct schema
    return df.withColumn(out_col, F.coalesce(wrapped, bare))


def is_valid_conversation(
    messages_col: str = "messages",
    require_alternation: bool = True,
) -> Column:
    """Structural validity as ONE boolean expression: parseable,
    non-empty, every role known and every content non-null/non-empty,
    at most one system turn and only at position 0, and (optionally)
    the non-system turns strictly alternate user/assistant starting
    with user AND ending with assistant — a body ending on a dangling
    unanswered user turn would train on dead prompt tokens with no
    loss span, so SFT curation rejects it."""
    m = F.col(messages_col)
    body_sql = f"filter({messages_col}, x -> x.role != 'system')"
    body = F.expr(body_sql)
    roles_ok = F.expr(
        f"forall({messages_col}, x -> x.role IN "
        f"{KNOWN_ROLES!r} AND x.content IS NOT NULL "
        "AND length(x.content) > 0)"
    )
    system_ok = F.expr(
        f"size(filter({messages_col}, x -> x.role = 'system')) = 0 "
        f"OR ({messages_col}[0].role = 'system' AND "
        f"size(filter({messages_col}, x -> x.role = 'system')) = 1)"
    )
    base = m.isNotNull() & (F.size(m) > 0) & roles_ok & system_ok
    if not require_alternation:
        return base
    # non-system turns: even indexes user, odd indexes assistant,
    # last turn assistant (even body length)
    alternates = (
        F.expr(
            f"forall(transform({body_sql}, (x, i) -> "
            "CASE WHEN i % 2 = 0 THEN x.role = 'user' "
            "ELSE x.role = 'assistant' END), p -> p)"
        )
        & (F.size(body) > 0)
        & (F.size(body) % 2 == 0)
    )
    return base & alternates


def _sql_str(s: str) -> str:
    """A template marker as a Spark SQL single-quoted literal body:
    backslashes first (or they re-escape what follows), then quotes,
    then control chars — an unescaped trailing backslash would
    swallow the closing quote and fail at plan time."""
    return (
        s.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    out_col: str = "text",
    prefix: str = "<|im_start|>",
    suffix: str = "<|im_end|>\n",
) -> DataFrame:
    """Render each conversation into its training string:
    ``prefix + role + '\\n' + content + suffix`` per turn,
    concatenated in order — pure Catalyst ``aggregate`` fold, one
    in-row pass, no UDF."""
    pfx = _sql_str(prefix)
    sfx = _sql_str(suffix)
    rendered = F.expr(
        f"aggregate({messages_col}, CAST('' AS STRING), "
        f"(acc, x) -> concat(acc, '{pfx}', x.role, '\\n', "
        f"x.content, '{sfx}'))"
    )
    return df.withColumn(out_col, rendered)


def render_chat_with_spans(
    df: DataFrame,
    messages_col: str = "messages",
    out_col: str = "text",
    spans_col: str = "assistant_spans",
    prefix: str = "<|im_start|>",
    suffix: str = "<|im_end|>\n",
) -> DataFrame:
    """:func:`render_chat` plus the SFT loss mask: 1-based inclusive
    character ranges of the rendered string that are ASSISTANT
    content — exactly the spans a trainer computes loss on (prompt
    and control tokens masked out).  One in-row ``aggregate`` fold
    carrying a ``(text, spans)`` struct accumulator; still pure
    Catalyst, still no UDF.

    Contract pinned by test: for every span,
    ``substring(text, start, end - start + 1)`` equals that assistant
    turn's content verbatim.
    """
    pfx = _sql_str(prefix)
    sfx = _sql_str(suffix)
    acc0 = (
        "named_struct('txt', CAST('' AS STRING), 'spans', "
        "CAST(array() AS array<struct<start:int, end:int>>))"
    )
    step = (
        "(acc, x) -> named_struct("
        f"'txt', concat(acc.txt, '{pfx}', x.role, '\\n', x.content, "
        f"'{sfx}'), "
        "'spans', CASE WHEN x.role = 'assistant' THEN concat(acc.spans,"
        " array(named_struct("
        f"'start', CAST(length(acc.txt) + length('{pfx}') + "
        "length(x.role) + 2 AS INT), "
        f"'end', CAST(length(acc.txt) + length('{pfx}') + "
        "length(x.role) + 1 + length(x.content) AS INT)))) "
        "ELSE acc.spans END)"
    )
    folded = F.expr(f"aggregate({messages_col}, {acc0}, {step})")
    return df.withColumn("__f", folded).select(
        "*",
        F.col("__f.txt").alias(out_col),
        F.col("__f.spans").alias(spans_col),
    ).drop("__f")


def chat_stats(
    df: DataFrame,
    messages_col: str = "messages",
) -> DataFrame:
    """Per-conversation size columns for mixing/packing budgets:
    ``n_turns`` (non-system), ``has_system``, ``n_chars`` (content
    only), ``n_tokens`` (whitespace tokens over all content) — one
    scan, all Catalyst."""
    body = f"filter({messages_col}, x -> x.role != 'system')"
    return (
        df.withColumn(
            "n_turns", F.expr(f"size({body})").cast("int")
        )
        .withColumn(
            "has_system",
            F.expr(
                f"size(filter({messages_col}, "
                "x -> x.role = 'system')) > 0"
            ),
        )
        .withColumn(
            "n_chars",
            F.expr(
                f"aggregate({messages_col}, 0L, "
                "(acc, x) -> acc + length(x.content))"
            ).cast("bigint"),
        )
        .withColumn(
            "n_tokens",
            F.expr(
                f"aggregate({messages_col}, 0L, (acc, x) -> acc + "
                "size(filter(split(x.content, '\\\\s+'), "
                "t -> t != '')))"
            ).cast("bigint"),
        )
    )


def curate_conversations(
    df: DataFrame,
    json_col: str = "messages_json",
    min_turns: int = 2,
    max_turns: int = 64,
    require_alternation: bool = True,
) -> DataFrame:
    """The composed SFT-prep pass: parse → validate → stats → turn
    bounds → render with the assistant loss-mask spans.  Invalid/
    malformed records are FILTERED (the dirty-corpus default), never
    job-failing."""
    parsed = parse_conversations(df, json_col)
    valid = parsed.where(
        is_valid_conversation("messages", require_alternation)
    )
    sized = chat_stats(valid).where(
        (F.col("n_turns") >= min_turns) & (F.col("n_turns") <= max_turns)
    )
    return render_chat_with_spans(sized)
