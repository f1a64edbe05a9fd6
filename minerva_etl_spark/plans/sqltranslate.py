"""PG→Spark SQL mini-translator for user-supplied view/KPI SQL.

Reference materialization views and KPI functions are arbitrary
PostgreSQL SELECTs (`materialization.py:168-204`, e.g.
`examples/tiny_instance/materialization/hub-kpi_node_15m.yaml`:
``power_kwh * 1000 AS power_mwh``).  The dialect gap is small
(SURVEY §4): ``::type`` casts, ``format()``, ``string_agg()``,
``generate_series()``, schema-qualified names.  This translates that
slice textually — it is NOT a general SQL parser; anything it does not
recognize passes through for Catalyst to accept or reject.
"""

from __future__ import annotations

import re

#: PG type name → Spark SQL type name (cast targets)
_TYPE_MAP = {
    "smallint": "smallint",
    "int2": "smallint",
    "integer": "int",
    "int4": "int",
    "int": "int",
    "bigint": "bigint",
    "int8": "bigint",
    "real": "float",
    "float4": "float",
    "double precision": "double",
    "float8": "double",
    "numeric": "decimal(38,18)",
    "text": "string",
    "varchar": "string",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "timestamp with time zone": "timestamp",
    "boolean": "boolean",
    "bool": "boolean",
    # PG json/jsonb/name have no Spark type — their textual form does
    "json": "string",
    "jsonb": "string",
    "name": "string",
    "date": "date",
}

_CAST_RE = re.compile(
    r"::\s*(" + "|".join(sorted(map(re.escape, _TYPE_MAP), key=len, reverse=True)) + r")\b",
    re.IGNORECASE,
)

_SCHEMA_QUAL_RE = re.compile(r'\b(trend|attribute|relation|entity|directory)\."?([A-Za-z_][A-Za-z0-9_-]*)"?')

_STRING_AGG_RE = re.compile(r"\bstring_agg\s*\(", re.IGNORECASE)
_GENERATE_SERIES_RE = re.compile(r"\bgenerate_series\s*\(", re.IGNORECASE)
_FORMAT_RE = re.compile(r"\bformat\s*\(", re.IGNORECASE)


def translate(pg_sql: str, table_resolver=None) -> str:
    """Translate the supported PG dialect slice to Spark SQL.

    ``table_resolver(schema, name) -> str`` maps schema-qualified
    reference table names (``trend."node_main_15m"``) to registered
    Spark view names; default strips the schema and quotes.
    """
    out = pg_sql

    # PG escape-string literals: E'\n' → '\n' (Spark single-quoted
    # strings interpret backslash escapes by default)
    out = re.sub(r"\bE'", "'", out)

    # trigger-row references: `$1.col` → `col` (the reference passes the
    # KPI row as a record argument; our trigger engine evaluates the
    # expression directly over the KPI frame columns)
    out = re.sub(r"\$\d+\.", "", out)

    # `'<text>'::interval` → INTERVAL '<text>' (Spark interval literal
    # accepts the PG multi-unit text form)
    out = re.sub(
        r"('[^']*')\s*::\s*interval\b", r"INTERVAL \1", out,
        flags=re.IGNORECASE,
    )

    # date_part('epoch', x) → unix_timestamp(x); other fields map 1:1
    # (Spark has date_part with the same field names)
    out = re.sub(
        r"\bdate_part\s*\(\s*'epoch'\s*,\s*([^()]+?)\)",
        r"unix_timestamp(\1)",
        out,
        flags=re.IGNORECASE,
    )

    # `expr::type` → CAST(expr AS type): handle simple operand forms
    # (identifier, literal, call, parenthesized) right-to-left.
    def cast_repl(match: re.Match) -> str:
        return f"⟦CAST_AS:{_TYPE_MAP[match.group(1).lower()]}⟧"

    out = _CAST_RE.sub(cast_repl, out)
    while "⟦CAST_AS:" in out:
        idx = out.index("⟦CAST_AS:")
        end = out.index("⟧", idx)
        target = out[idx + len("⟦CAST_AS:"):end]
        operand_start = _operand_start(out, idx)
        operand = out[operand_start:idx]
        out = (
            out[:operand_start]
            + f"CAST({operand} AS {target})"
            + out[end + 1:]
        )

    # schema-qualified names
    def qual_repl(match: re.Match) -> str:
        schema, name = match.group(1), match.group(2)
        if table_resolver is not None:
            return table_resolver(schema, name)
        return name.replace("-", "_")

    out = _SCHEMA_QUAL_RE.sub(qual_repl, out)

    # string_agg(x, 'sep') -> array_join(collect_list(x), 'sep')
    # (simple 2-arg form only — enough for the fingerprint/report SQL)
    out = _STRING_AGG_RE.sub("array_join(collect_list(", out)
    out = re.sub(
        r"array_join\(collect_list\(\s*([^,()]+?)\s*,\s*('[^']*')\s*\)",
        r"array_join(collect_list(\1), \2)",
        out,
    )
    # PG regex substring: substring(x from 'pat') -> regexp_extract(x, pat, g)
    # (group 1 when the pattern captures, whole match otherwise)
    def substr_repl(match: re.Match) -> str:
        operand, pattern = match.group(1).strip(), match.group(2)
        group = 1 if "(" in pattern else 0
        return f"regexp_extract({operand}, {pattern}, {group})"

    out = re.sub(
        r"substring\s*\(\s*([^()']+?)\s+from\s+('[^']*')\s*\)",
        substr_repl,
        out,
        flags=re.IGNORECASE,
    )

    out = _GENERATE_SERIES_RE.sub("explode(sequence(", out)
    out = re.sub(r"explode\(sequence\(([^;]*?)\)", r"explode(sequence(\1))", out, count=1)
    out = _FORMAT_RE.sub("format_string(", out)
    out = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    out = re.sub(r"\barray_to_string\s*\(", "array_join(", out, flags=re.IGNORECASE)
    out = _rewrite_array_literals(out)
    return out


def _rewrite_array_literals(text: str) -> str:
    """PG ``ARRAY[a, b]`` → Spark ``array(a, b)`` (bracket matching is
    nesting-aware; string literals are skipped)."""
    out = []
    i = 0
    pattern = re.compile(r"\bARRAY\s*\[", re.IGNORECASE)
    while True:
        match = pattern.search(text, i)
        if not match:
            out.append(text[i:])
            break
        out.append(text[i:match.start()])
        out.append("array(")
        depth = 1
        j = match.end()
        while j < len(text) and depth:
            ch = text[j]
            if ch == "'":
                end = text.find("'", j + 1)
                j = (end if end != -1 else len(text) - 1) + 1
                continue
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    j += 1
                    break
            j += 1
        inner = text[match.end():j - 1]
        out.append(_rewrite_array_literals(inner))
        out.append(")")
        i = j
    return "".join(out)


def _operand_start(text: str, cast_idx: int) -> int:
    """Find the start of the expression a ``::`` cast applies to."""
    i = cast_idx - 1
    while i >= 0 and text[i].isspace():
        i -= 1
    if i < 0:
        return 0
    if text[i] == ")":
        depth = 0
        while i >= 0:
            if text[i] == ")":
                depth += 1
            elif text[i] == "(":
                depth -= 1
                if depth == 0:
                    break
            i -= 1
        # include a preceding function name if present
        j = i - 1
        while j >= 0 and (text[j].isalnum() or text[j] in "_."):
            j -= 1
        return j + 1
    if text[i] in "'\"":
        quote = text[i]
        i -= 1
        while i >= 0 and text[i] != quote:
            i -= 1
        return i
    j = i
    while j >= 0 and (text[j].isalnum() or text[j] in "_.$"):
        j -= 1
    return j + 1
