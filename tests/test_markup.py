"""Markdown / LaTeX markup stripping: rule coverage, dispatch, nesting
bound, and the Python-free plan assertion."""

from __future__ import annotations

from minerva_etl_spark.operators.markup import markup_to_text


def _one(spark, kind, raw):
    df = spark.createDataFrame([(kind, raw)], "kind string, raw string")
    return markup_to_text(df).collect()[0].text


def test_markdown_rules(spark):
    md = (
        "# Title\n\nSome **bold** and *italic* and `code`.\n\n"
        "- item one\n2. item two\n\n> quoted\n\n"
        "[a link](https://x.test/p) and ![img](https://x.test/i.png)\n\n"
        "```python\nkept code line\n```\n\n---\n"
    )
    assert _one(spark, "markdown", md) == (
        "Title\n\nSome bold and italic and code.\n\n"
        "item one\nitem two\n\nquoted\n\n"
        "a link and img\n\nkept code line"
    )


def test_latex_rules(spark):
    tex = (
        "\\documentclass{article}\n% comment line\n"
        "\\begin{document}\n\\section{Intro}\n"
        "Some \\textbf{bold \\emph{nested}} text~here \\cite{s20} "
        "with $x^2$ math.\nLine one \\\\ line two.\n100\\% sure.\n"
        "\\end{document}\n"
    )
    assert _one(spark, "latex", tex) == (
        "Intro\nSome bold nested text here with math.\n"
        "Line one\nline two.\n100% sure."
    )


def test_latex_nesting_bound_degrades_gracefully(spark):
    # 3 levels unwrap exactly; a 4th leaves the text intact (only a
    # stray-brace cleanup), never deletes content
    deep = "\\a{\\b{\\c{\\d{kernel}}}}"
    assert "kernel" in _one(spark, "latex", deep)


def test_passthrough_kind_squeezes_only(spark):
    assert _one(spark, "plain", "  a   b \n\n\n\n c  ") == "a b\n\nc"


def test_plan_is_python_free(spark):
    df = spark.createDataFrame(
        [("markdown", "# x")], "kind string, raw string"
    )
    plan = (markup_to_text(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
