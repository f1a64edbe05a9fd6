"""Code-corpus profiling: language detection (shebang beats
extension), line stats, comment fraction, alnum fraction, license
sniff — and the DuckDB twin expressions used by the oracle."""

from __future__ import annotations

import duckdb
import pandas as pd

from minerva_etl_spark.operators.code import (
    code_profile_duck_exprs,
    with_code_profile,
)

FILES = [
    # (file_id, path, content)
    (1, "src/app.py", "# header\ndef f():\n    return 1\n"),
    (2, "web/min.js", "const x=1;" * 40),  # one long minified line
    (3, "scripts/run", "#!/bin/bash\necho hi\n"),  # shebang, no ext
    (4, "lib/mod.rs", "// Copyright (c) 2020 Example\nlet x = 1;"),
    (5, "notes.txt", ""),  # empty file
    (6, "tool", "#!/usr/bin/env python\nprint(1)"),  # shebang wins
]
SCHEMA = "file_id bigint, path string, content string"


def _profiles(spark):
    df = spark.createDataFrame(FILES, SCHEMA)
    return {
        r["file_id"]: r.asDict()
        for r in with_code_profile(df, "content", "path").collect()
    }


def test_language_detection(spark):
    p = _profiles(spark)
    assert p[1]["language"] == "python"
    assert p[2]["language"] == "javascript"
    assert p[3]["language"] == "shell"   # shebang, no extension
    assert p[4]["language"] == "rust"
    assert p[5]["language"] == "unknown"
    assert p[6]["language"] == "python"  # shebang beats missing ext


def test_line_and_comment_stats(spark):
    p = _profiles(spark)
    # file 1: lines = ['# header', 'def f():', '    return 1', '']
    assert p[1]["n_lines"] == 4
    assert p[1]["max_line_len"] == 12
    assert p[1]["comment_line_frac"] == 0.25
    # file 2: a single 400-char minified line
    assert p[2]["n_lines"] == 1 and p[2]["max_line_len"] == 400
    assert p[2]["comment_line_frac"] == 0.0
    # file 4: the // Copyright line counts as a comment
    assert p[4]["comment_line_frac"] == 0.5


def test_alnum_license_empty(spark):
    p = _profiles(spark)
    assert p[4]["has_license"] == 1 and p[1]["has_license"] == 0
    assert p[5]["n_lines"] == 1 and p[5]["alnum_frac"] == 0.0
    assert p[5]["avg_line_len"] == 0.0
    assert 0.0 < p[1]["alnum_frac"] < 1.0


def test_duckdb_twin_agrees(spark):
    """Every profile column must hash-match its DuckDB twin on the
    same input — the property the oracle row depends on."""
    sdf = with_code_profile(
        spark.createDataFrame(FILES, SCHEMA), "content", "path"
    )
    spark_rows = {
        r["file_id"]: r.asDict()
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.register(
        "files",
        pd.DataFrame(FILES, columns=["file_id", "path", "content"]),
    )
    exprs = code_profile_duck_exprs("content", "path")
    sel = ", ".join(f"{sql} AS {name}" for name, sql in exprs.items())
    duck = con.execute(
        f"SELECT file_id, {sel} FROM files"
    ).fetchdf()
    for _, row in duck.iterrows():
        srow = spark_rows[row["file_id"]]
        for name in exprs:
            dv, sv = row[name], srow[name]
            if name == "has_license":
                dv, sv = bool(dv), bool(sv)
            assert dv == sv, (row["file_id"], name, dv, sv)
