"""Unicode script profile: exact code-point counts per block,
dominant-script argmax with alphabetical tie-break, no-UDF plan."""

from minerva_etl_spark.operators.text import with_script_profile


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    return {r.doc_id: r for r in with_script_profile(df).collect()}


def test_counts_and_dominant(spark):
    out = _run(spark, [
        "hello world 123",                # latin + digits
        "Привет мир",                     # cyrillic
        "hello Привет",                   # tie? latin 5, cyrillic 6
        "中文文本 test",                   # cjk 4, latin 4 -> tie
        "",                               # nothing
        "٣٣٣ שלום αβγ",                   # arabic digits, hebrew, greek
    ])
    r = out[0]
    assert r.n_latin == 10 and r.n_digit == 3 and r.n_cyrillic == 0
    assert r.dominant_script == "latin"
    assert out[1].n_cyrillic == 9 and out[1].dominant_script == "cyrillic"
    assert out[2].n_latin == 5 and out[2].n_cyrillic == 6
    assert out[2].dominant_script == "cyrillic"
    # exact tie -> alphabetical winner (cjk < latin)
    assert out[3].n_cjk == 4 and out[3].n_latin == 4
    assert out[3].dominant_script == "cjk"
    assert out[4].dominant_script == "none"
    r5 = out[5]
    assert r5.n_arabic == 3      # arabic-indic digits are ARABIC block
    assert r5.n_digit == 0       # ... not ASCII digits
    assert r5.n_hebrew == 4 and r5.n_greek == 3
    assert r5.dominant_script == "hebrew"


def test_plan_is_one_codegen_projection(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    plan = (
        with_script_profile(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
