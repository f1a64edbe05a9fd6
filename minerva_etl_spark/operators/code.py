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
