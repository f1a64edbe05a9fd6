"""Code-corpus profiling — pretraining curation stats for source code.

Code corpora are curated on different axes than prose: language
identity (shebang beats file extension), comment density, line-length
shape (minified/generated files have kilochar lines), alphanumeric
fraction (binary-ish blobs), and license headers (filter or attribute
before training).  This operator computes all of it in ONE
whole-stage-codegen scan — the text is split into a line array once
and every stat is a higher-order array function over it; no UDF, no
shuffle, no second pass.

Engine-portable semantics (each expression has a DuckDB twin in
:func:`code_profile_duck_exprs`):
- lines = split on ``\\n`` keeping trailing empties (a file ending in
  a newline contributes one final empty line — both engines agree);
- a comment line is one whose ``[ \\t]``-stripped form starts with
  ``#``, ``//``, ``--``, ``/*`` or ``*`` (a heuristic shared across
  the mainstream languages; markdown bullets count — documented, and
  identical in both engines);
- ``alnum_frac`` counts ASCII ``[A-Za-z0-9]`` only, so Java and RE2
  regex agree byte-for-byte;
- language: shebang first (``#!…python`` and friends), then the path
  extension map, else ``unknown``.

Scale: zero-shuffle row-local stats — the same posture as
`operators/text.py::with_quality` (single scan, codegen).  Reference:
extension (the reference engine has no code-corpus surface);
SURVEY §2 "beyond the reference" charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: extension → language (both engines build the same CASE chain)
EXT_LANG: dict[str, str] = {
    "py": "python",
    "js": "javascript", "jsx": "javascript", "mjs": "javascript",
    "ts": "typescript", "tsx": "typescript",
    "java": "java",
    "c": "c", "h": "c",
    "cc": "cpp", "cpp": "cpp", "cxx": "cpp", "hpp": "cpp",
    "go": "go",
    "rs": "rust",
    "rb": "ruby",
    "sh": "shell", "bash": "shell",
    "pl": "perl",
    "sql": "sql",
    "html": "html", "htm": "html",
    "css": "css",
    "json": "json",
    "yml": "yaml", "yaml": "yaml",
    "md": "markdown", "markdown": "markdown",
    "scala": "scala",
    "kt": "kotlin",
    "php": "php",
    "cs": "csharp",
}

#: shebang substring → language, checked in order on a ``#!`` first line
SHEBANG_LANG: tuple[tuple[str, str], ...] = (
    ("python", "python"),
    ("node", "javascript"),
    ("bash", "shell"),
    ("/sh", "shell"),
    ("env sh", "shell"),
    ("perl", "perl"),
    ("ruby", "ruby"),
)

#: license/copyright sniff over the head of the file
_LICENSE_RE = "(?i)(copyright|licen[cs]e)"
_LICENSE_HEAD = 500

#: comment-prefix test over a ``[ \t]``-stripped line ``{s}``
_COMMENT_PRED = (
    "substr({s}, 1, 1) = '#' OR substr({s}, 1, 2) = '//' "
    "OR substr({s}, 1, 2) = '--' OR substr({s}, 1, 2) = '/*' "
    "OR substr({s}, 1, 1) = '*'"
)


def _language_case(first_line: str, ext: str | None) -> str:
    """The shared shebang-then-extension CASE chain (Spark SQL and
    DuckDB parse it identically)."""
    branches = [
        f"WHEN substr({first_line}, 1, 2) = '#!' AND "
        f"{first_line} LIKE '%{sub}%' THEN '{lang}'"
        for sub, lang in SHEBANG_LANG
    ]
    if ext is not None:
        for e, lang in EXT_LANG.items():
            branches.append(f"WHEN {ext} = '{e}' THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'unknown' END"


def with_code_profile(
    df: DataFrame, text_col: str = "content", path_col: str | None = "path"
) -> DataFrame:
    """Attach ``language``, ``n_lines``, ``max_line_len``,
    ``avg_line_len``, ``comment_line_frac``, ``alnum_frac`` and
    ``has_license`` to a code-file DataFrame — one codegen scan."""
    staged = df.withColumn("__lines", F.split(F.col(text_col), "\n"))
    stripped = "regexp_replace(l, '^[ \\t]+', '')"
    comment = _COMMENT_PRED.format(s=stripped)
    ext = (
        f"lower(regexp_extract({path_col}, '\\\\.([A-Za-z0-9_]+)$', 1))"
        if path_col is not None
        else None
    )
    out = (
        staged.withColumn(
            "language",
            F.expr(_language_case("element_at(__lines, 1)", ext)),
        )
        .withColumn("n_lines", F.expr("size(__lines)").cast("int"))
        .withColumn(
            "max_line_len",
            F.expr(
                "array_max(transform(__lines, l -> length(l)))"
            ).cast("int"),
        )
        .withColumn(
            "avg_line_len",
            F.round(
                F.expr(
                    "aggregate(__lines, 0L, (a, l) -> a + length(l))"
                ).cast("double")
                / F.col("n_lines").cast("double"),
                6,
            ),
        )
        .withColumn(
            "comment_line_frac",
            F.round(
                F.expr(
                    f"size(filter(__lines, l -> {comment}))"
                ).cast("double")
                / F.col("n_lines").cast("double"),
                6,
            ),
        )
        .withColumn(
            "alnum_frac",
            F.when(
                F.length(text_col) > 0,
                F.round(
                    F.length(
                        F.regexp_replace(
                            F.col(text_col), "[^A-Za-z0-9]", ""
                        )
                    ).cast("double")
                    / F.length(text_col).cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "has_license",
            F.substring(F.col(text_col), 1, _LICENSE_HEAD).rlike(
                _LICENSE_RE
            ),
        )
    )
    return out.drop("__lines")


def normalize_code(
    df: DataFrame, text_col: str = "content", out_col: str = "normalized"
) -> DataFrame:
    """Comment/whitespace-invariant code normalization — the key for
    near-dedup of source files (reformatting and license-header churn
    are the dominant duplicate classes in code corpora).

    One codegen scan: strip ``/* */`` block comments (dotall, lazy),
    then per-line strip ``//``/``#``/``--`` tail comments, collapse
    runs of spaces/tabs, trim, drop blank lines, re-join.  The comment
    strip is deliberately heuristic (a ``#`` inside a string literal
    is treated as a comment) — for DEDUP KEYS that only makes the
    normalization slightly more aggressive; the original text is
    never modified.  Same expressions in :func:`normalize_code_duck_expr`.
    """
    body = f"regexp_replace({text_col}, '(?s)/\\\\*.*?\\\\*/', ' ')"
    line = (
        "trim(regexp_replace(regexp_replace(l, '(//|#|--).*', ''), "
        "'[ \\t]+', ' '))"
    )
    expr = (
        f"array_join(filter(transform(split({body}, '\\n'), "
        f"l -> {line}), l -> l != ''), '\\n')"
    )
    return df.withColumn(out_col, F.expr(expr))


def normalize_code_duck_expr(text_col: str = "content") -> str:
    """DuckDB twin of :func:`normalize_code`'s expression."""
    body = f"regexp_replace({text_col}, '(?s)/\\*.*?\\*/', ' ', 'g')"
    line = (
        "trim(regexp_replace(regexp_replace(l, '(//|#|--).*', '', 'g'), "
        "'[ \t]+', ' ', 'g'))"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — an all-comment file must normalize to ''
    return (
        f"coalesce(array_to_string(list_filter(list_transform("
        f"string_split({body}, chr(10)), l -> {line}), "
        f"l -> l != ''), chr(10)), '')"
    )


def dedup_code_groups(
    df: DataFrame, id_col: str = "file_id", text_col: str = "content"
) -> DataFrame:
    """Exact dedup over the normalized form: one map-side-combinable
    groupBy on ``md5(normalized)`` — no window, no sort.  Returns one
    row per distinct normalized body: ``(norm_digest, canonical_id,
    n_files)`` with the smallest id as canonical (the
    `operators/dedup.py::dedup_exact` convention, rescoped to the
    comment/whitespace-invariant key)."""
    norm = normalize_code(df, text_col, "__norm")
    return (
        norm.withColumn("norm_digest", F.md5(F.col("__norm")))
        .groupBy("norm_digest")
        .agg(
            F.min(id_col).cast("long").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_files"),
        )
    )


# ---------------------------------------------------------------- secrets
#: secret classes scanned before training on code — each pattern is
#: deliberately anchored to a vendor prefix or PEM armor (high
#:  precision; entropy-based detectors are a policy layer above this).
#: Every pattern parses identically under Java regex (Spark) and RE2
#: (DuckDB): char classes + counted repeats only.
SECRET_PATTERNS: tuple[tuple[str, str], ...] = (
    ("aws_key", "AKIA[0-9A-Z]{16}"),
    ("github_token", "gh[pousr]_[A-Za-z0-9]{36}"),
    ("slack_token", "xox[baprs]-[0-9A-Za-z-]{10,48}"),
    ("private_key", "-----BEGIN [A-Z ]{0,20}PRIVATE KEY-----"),
    (
        "jwt",
        "eyJ[A-Za-z0-9_-]{8,}[.][A-Za-z0-9_-]{8,}[.][A-Za-z0-9_-]{8,}",
    ),
)


def with_secret_scan(
    df: DataFrame, text_col: str = "content"
) -> DataFrame:
    """Per-class secret match counts plus ``n_secrets`` — one
    projection (``regexp_extract_all`` + ``size`` per class), no UDF,
    no shuffle."""
    out = df
    total = F.lit(0).cast("long")
    for name, pat in SECRET_PATTERNS:
        cnt = F.expr(
            f"size(regexp_extract_all({text_col}, '{pat}', 0))"
        ).cast("long")
        out = out.withColumn(f"n_{name}", cnt)
        total = total + cnt
    return out.withColumn("n_secrets", total)


def redact_secrets(
    df: DataFrame,
    text_col: str = "content",
    out_col: str = "redacted",
) -> DataFrame:
    """Replace every match with ``<SECRET:class>`` — the chained
    regexp_replace runs in one projection.  Order matters only in
    that redaction markers contain no pattern-matchable text, so the
    chain is confluent."""
    expr = F.col(text_col)
    for name, pat in SECRET_PATTERNS:
        expr = F.regexp_replace(expr, pat, f"<SECRET:{name}>")
    return df.withColumn(out_col, expr)


def secret_scan_duck_exprs(text_col: str = "content") -> dict[str, str]:
    """DuckDB twins of :func:`with_secret_scan` +
    :func:`redact_secrets` (same names; ``redacted`` included)."""
    exprs: dict[str, str] = {}
    total = []
    for name, pat in SECRET_PATTERNS:
        exprs[f"n_{name}"] = (
            f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"
        )
        total.append(exprs[f"n_{name}"])
    exprs["n_secrets"] = " + ".join(total)
    red = text_col
    for name, pat in SECRET_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '<SECRET:{name}>', 'g')"
    exprs["redacted"] = red
    return exprs


# -------------------------------------------------------------------- FIM
#: sentinel tokens of the fill-in-the-middle rendering (the public
#: FIM convention: prefix/suffix/middle markers, middle always last
#: so the trainer learns to generate it)
FIM_PREFIX, FIM_SUFFIX, FIM_MIDDLE = (
    "<|fim_prefix|>", "<|fim_suffix|>", "<|fim_middle|>"
)
_FIM_BUCKETS = 10_000


def _md5_bucket(expr: str, spark_side: bool, mod: str) -> str:
    """The engine's standard seeded md5 draw (gate.py convention):
    first 15 hex chars → BIGINT → pmod."""
    if spark_side:
        return f"pmod(conv(substr(md5({expr}), 1, 15), 16, 10), {mod})"
    return (
        f"((CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)) % {mod})"
    )


def fim_exprs(
    text_col: str,
    id_col: str,
    *,
    seed: int = 0,
    rate: float = 0.5,
    spm: bool = False,
    spark_side: bool = True,
) -> dict[str, str]:
    """Shared Spark/DuckDB SQL for :func:`fim_transform` — char-level
    fill-in-the-middle: two deterministic cut points from seeded md5
    draws split the doc into prefix/middle/suffix; a third draw
    selects ``rate`` of the docs.  PSM order by default; ``spm=True``
    renders suffix-before-prefix (both public FIM orders).  Docs not
    selected (or shorter than 2 chars) pass through verbatim with
    ``fim_applied = 0``."""
    sid = (
        f"CAST({id_col} AS STRING)" if spark_side
        else f"CAST({id_col} AS VARCHAR)"
    )
    n = f"length({text_col})"
    rate_i = int(round(rate * _FIM_BUCKETS))
    rate_key = f"'{seed}:r:' || {sid}"
    pick = (
        f"({_md5_bucket(rate_key, spark_side, str(_FIM_BUCKETS))}"
        f" < {rate_i}) AND {n} >= 2"
    )
    c1 = _md5_bucket(f"'{seed}:a:' || {sid}", spark_side, f"({n} + 1)")
    c2 = _md5_bucket(f"'{seed}:b:' || {sid}", spark_side, f"({n} + 1)")
    lo = f"least({c1}, {c2})"
    hi = f"greatest({c1}, {c2})"
    lo_i, hi_i = (
        (f"CAST({lo} AS INT)", f"CAST({hi} AS INT)") if spark_side
        else (f"CAST({lo} AS INTEGER)", f"CAST({hi} AS INTEGER)")
    )
    pre = f"substr({text_col}, 1, {lo_i})"
    mid = f"substr({text_col}, {lo_i} + 1, {hi_i} - {lo_i})"
    suf = f"substr({text_col}, {hi_i} + 1)"
    if spm:
        rendered = (
            f"'{FIM_PREFIX}' || '{FIM_SUFFIX}' || {suf} || "
            f"'{FIM_MIDDLE}' || {pre} || {mid}"
        )
    else:
        rendered = (
            f"'{FIM_PREFIX}' || {pre} || '{FIM_SUFFIX}' || {suf} || "
            f"'{FIM_MIDDLE}' || {mid}"
        )
    applied_cast = "INT" if spark_side else "INTEGER"
    return {
        "fim_applied": f"CAST({pick} AS {applied_cast})",
        "fim_text": (
            f"CASE WHEN {pick} THEN {rendered} ELSE {text_col} END"
        ),
        "cut_lo": f"CASE WHEN {pick} THEN {lo_i} ELSE NULL END",
        "cut_hi": f"CASE WHEN {pick} THEN {hi_i} ELSE NULL END",
    }


def fim_transform(
    df: DataFrame,
    text_col: str = "content",
    id_col: str = "file_id",
    *,
    seed: int = 0,
    rate: float = 0.5,
    spm: bool = False,
) -> DataFrame:
    """Attach ``fim_text``/``fim_applied``/``cut_lo``/``cut_hi`` —
    char-level FIM prep for code pretraining, pure Catalyst (the
    sentinel insertion happens BEFORE tokenization, the standard
    pipeline order).  Deterministic under reruns and partitioning:
    every draw is a seeded md5 of the id."""
    exprs = fim_exprs(
        text_col, id_col, seed=seed, rate=rate, spm=spm, spark_side=True
    )
    out = df
    for name, sql in exprs.items():
        out = out.withColumn(name, F.expr(sql))
    return out


def code_profile_duck_exprs(
    text_col: str = "content", path_col: str | None = "path"
) -> dict[str, str]:
    """DuckDB twins of :func:`with_code_profile` (same column names,
    same rounding)."""
    lines = f"string_split({text_col}, chr(10))"
    stripped = "regexp_replace(l, '^[ \t]+', '')"
    comment = _COMMENT_PRED.format(s=stripped)
    ext = (
        f"lower(regexp_extract({path_col}, '\\.([A-Za-z0-9_]+)$', 1))"
        if path_col is not None
        else None
    )
    n_lines = f"len({lines})"
    return {
        "language": _language_case(f"({lines})[1]", ext),
        "n_lines": f"CAST({n_lines} AS INTEGER)",
        "max_line_len": (
            f"CAST(list_aggregate(list_transform({lines}, "
            "l -> length(l)), 'max') AS INTEGER)"
        ),
        "avg_line_len": (
            f"round(CAST(list_aggregate(list_transform({lines}, "
            "l -> length(l)), 'sum') AS DOUBLE) "
            f"/ CAST({n_lines} AS DOUBLE), 6)"
        ),
        "comment_line_frac": (
            f"round(CAST(len(list_filter({lines}, l -> {comment})) "
            f"AS DOUBLE) / CAST({n_lines} AS DOUBLE), 6)"
        ),
        "alnum_frac": (
            f"CASE WHEN length({text_col}) > 0 THEN "
            f"round(CAST(length(regexp_replace({text_col}, "
            f"'[^A-Za-z0-9]', '', 'g')) AS DOUBLE) "
            f"/ CAST(length({text_col}) AS DOUBLE), 6) ELSE 0.0 END"
        ),
        "has_license": (
            f"regexp_matches(substring({text_col}, 1, {_LICENSE_HEAD}), "
            f"'{_LICENSE_RE}')"
        ),
    }
