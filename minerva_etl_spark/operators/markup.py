"""Markup-to-text extraction: Markdown and (a documented subset of)
LaTeX — the "papers and READMEs" ingest edge beside `operators/html.py`
and `operators/pdf.py`.

Both strippers are PURE CATALYST: fixed chains of ``regexp_replace``
(+ one whitespace collapse), so markup removal runs at scan speed
inside whole-stage codegen with no Python in the loop — the same
deliberate contrast to the byte-codec operators as `operators/urlops.py`
(plan-asserted in tests).

Markdown coverage: ATX headers, bold/italic (``**``/``__``/``*``/``_``),
inline code and fenced code blocks (fences dropped, content kept),
links/images (keep text/alt, drop URL), blockquote and list markers,
horizontal rules, setext underlines.

LaTeX coverage (the honest subset — real papers also need a macro
expander, which is a TeX engine, not a regex): ``%`` comments,
``$...$`` / ``$$...$$`` / ``\\[...\\]`` math → a single space,
``\\begin{x}`` / ``\\end{x}`` lines dropped, text-bearing one-argument
commands unwrapped (``\\section{X}`` → X — applied ``_NEST_ROUNDS``
times so braces nested that deep unwrap too), reference-bearing
commands dropped with their argument (``\\cite{..}``, ``\\ref{..}``,
``\\label{..}``, ``\\includegraphics[..]{..}``), ``\\\\`` → newline,
remaining bare ``\\command`` tokens dropped, ``~`` → space.  Deeper
nesting than ``_NEST_ROUNDS`` levels degrades gracefully (the inner
text still survives; only stray braces may remain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: how many times the one-argument-command unwrap rule is applied —
#: bounds the brace-nesting depth handled exactly.
_NEST_ROUNDS = 3


def _chain(col: Column, rules: list[tuple[str, str]]) -> Column:
    for pat, rep in rules:
        col = F.regexp_replace(col, pat, rep)
    return col


def markdown_to_text_expr(text_col: str) -> Column:
    """Markdown → plain text as one Catalyst expression."""
    c = F.col(text_col)
    rules = [
        (r"(?m)^```[^\n]*$", ""),          # code fences (keep content)
        (r"(?m)^(#{1,6})\s*", ""),         # ATX headers
        (r"(?m)^[ \t]*([-*_])[ \t]*\1[ \t]*\1[-*_ \t]*$", ""),  # hrules
        (r"(?m)^(=+|-{2,})\s*$", ""),      # setext underlines
        (r"(?m)^>\s?", ""),                # blockquotes
        (r"(?m)^[ \t]*[-*+][ \t]+", ""),   # unordered list markers
        (r"(?m)^[ \t]*\d+\.[ \t]+", ""),   # ordered list markers
        (r"!\[([^\]]*)\]\([^)]*\)", "$1"),  # images -> alt
        (r"\[([^\]]*)\]\([^)]*\)", "$1"),   # links -> text
        (r"\*\*([^*]+)\*\*", "$1"),         # bold
        (r"__([^_]+)__", "$1"),
        (r"\*([^*]+)\*", "$1"),             # italic
        (r"_([^_]+)_", "$1"),
        (r"`([^`]*)`", "$1"),               # inline code
    ]
    return _squeeze(_chain(c, rules))


def latex_to_text_expr(text_col: str) -> Column:
    """LaTeX (documented subset) → plain text as one Catalyst
    expression."""
    c = F.col(text_col)
    pre = [
        (r"(?<!\\)%[^\n]*", ""),            # comments (\% survives)
        (r"\$\$[^$]*\$\$", " "),            # display math
        (r"\$[^$]*\$", " "),                # inline math
        (r"\\\[[\s\S]*?\\\]", " "),         # \[ ... \]
        (r"(?m)^\\(begin|end)\{[^}]*\}[^\n]*$", ""),  # environments
        # reference-bearing commands: drop WITH argument
        (r"\\(cite|ref|eqref|label|includegraphics|input|include|"
         r"bibliography|bibliographystyle|usepackage|documentclass)"
         r"(\[[^\]]*\])?\{[^{}]*\}", ""),
    ]
    c = _chain(c, pre)
    # text-bearing one-argument commands unwrap; repeated so nested
    # braces up to _NEST_ROUNDS deep resolve exactly
    for _ in range(_NEST_ROUNDS):
        c = F.regexp_replace(c, r"\\[A-Za-z]+(\[[^\]]*\])?\{([^{}]*)\}",
                             "$2")
    post = [
        (r"\\\\", "\n"),                    # line breaks
        (r"\\[A-Za-z]+\*?", ""),            # bare commands
        (r"\\([%&#_$])", "$1"),             # escaped specials
        (r"~", " "),                        # non-breaking space
        (r"[{}]", ""),                      # stray braces
    ]
    return _squeeze(_chain(c, post))


def _squeeze(col: Column) -> Column:
    """Whitespace normalization shared by both strippers: spaces/tabs
    collapse, 3+ newlines become a blank line, edges trimmed."""
    col = F.regexp_replace(col, r"[ \t]+", " ")
    col = F.regexp_replace(col, r" ?\n ?", "\n")
    col = F.regexp_replace(col, r"\n{3,}", "\n\n")
    # Spark's trim() strips 0x20 only — edge NEWLINES need the regex
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def markup_to_text(
    df: DataFrame,
    kind_col: str = "kind",
    text_col: str = "raw",
    out_col: str = "text",
) -> DataFrame:
    """Dispatch per row on ``kind_col`` (``'markdown'`` | ``'latex'``,
    anything else passes through squeezed) — one scan, all three
    branches in a single Catalyst CASE."""
    return df.withColumn(
        out_col,
        F.when(F.col(kind_col) == "markdown",
               markdown_to_text_expr(text_col))
        .when(F.col(kind_col) == "latex", latex_to_text_expr(text_col))
        .otherwise(_squeeze(F.col(text_col))),
    )
