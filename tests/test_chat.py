"""Chat/SFT conversation operators: parsing, structural validation,
ChatML rendering, stats, and the composed curation pass — all pure
Catalyst (plan-asserted)."""

from __future__ import annotations

import json

from minerva_etl_spark.operators.chat import (
    chat_stats,
    curate_conversations,
    is_valid_conversation,
    parse_conversations,
    render_chat,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id bigint, messages_json string"
    )


def _msgs(*pairs, system=None):
    msgs = []
    if system is not None:
        msgs.append({"role": "system", "content": system})
    for i, (u, a) in enumerate(pairs):
        msgs.append({"role": "user", "content": u})
        msgs.append({"role": "assistant", "content": a})
    return json.dumps(msgs)


def test_validation_matrix(spark):
    rows = [
        (1, _msgs(("hi", "hello"), system="be nice")),  # valid
        (2, _msgs(("q", "a"), ("q2", "a2"))),           # valid, no system
        (3, json.dumps([{"role": "assistant", "content": "x"}])),  # starts assistant
        (4, json.dumps([{"role": "user", "content": ""}])),        # empty content
        (5, "not json"),                                            # malformed
        (6, json.dumps([{"role": "tool", "content": "x"}])),       # unknown role
        (7, json.dumps([{"role": "user", "content": "u"},
                        {"role": "system", "content": "late"}])),  # system not first
        (8, json.dumps([{"role": "system", "content": "only"}])),  # no body turns
        (9, json.dumps([{"role": "user", "content": "u"},
                        {"role": "user", "content": "u2"}])),      # no alternation
        (10, json.dumps([{"role": "user", "content": "q"},
                         {"role": "assistant", "content": "a"},
                         {"role": "user", "content": "dangling"}])),  # trailing user
    ]
    parsed = parse_conversations(_df(spark, rows))
    ok = {r.conv_id for r in
          parsed.where(is_valid_conversation()).collect()}
    assert ok == {1, 2}
    # alternation optional: user-user now passes, role rules still hold
    loose = {r.conv_id for r in parsed.where(
        is_valid_conversation(require_alternation=False)).collect()}
    assert loose == {1, 2, 3, 8, 9, 10}


def test_render_and_stats(spark):
    rows = [(1, _msgs(("hi there", "hello friend"), system="be nice"))]
    out = render_chat(chat_stats(parse_conversations(_df(spark, rows))))
    r = out.collect()[0]
    assert r.text == (
        "<|im_start|>system\nbe nice<|im_end|>\n"
        "<|im_start|>user\nhi there<|im_end|>\n"
        "<|im_start|>assistant\nhello friend<|im_end|>\n"
    )
    assert (r.n_turns, r.has_system, r.n_chars, r.n_tokens) == (2, True, 27, 6)


def test_curate_filters_and_turn_bounds(spark):
    rows = [
        (1, _msgs(("q", "a"))),                       # 2 turns: kept
        (2, _msgs(("q", "a"), ("q2", "a2"), ("q3", "a3"))),  # 6 turns
        (3, "broken"),                                 # dropped
    ]
    out = curate_conversations(
        _df(spark, rows), min_turns=2, max_turns=4
    ).collect()
    assert [r.conv_id for r in out] == [1]


def test_whole_pipeline_is_python_free(spark):
    df = _df(spark, [(1, _msgs(("q", "a")))])
    plan = (curate_conversations(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_assistant_spans_slice_verbatim(spark):
    """Every span slices the rendered string to exactly that
    assistant turn's content (1-based inclusive, the SFT loss mask)."""
    from minerva_etl_spark.operators.chat import render_chat_with_spans

    rows = [(1, _msgs(("hi there", "hello friend"), ("more?", "sure thing"),
                      system="be nice"))]
    r = render_chat_with_spans(
        parse_conversations(_df(spark, rows))
    ).collect()[0]
    got = [r.text[s.start - 1 : s.end] for s in r.assistant_spans]
    assert got == ["hello friend", "sure thing"]
    # curate carries the spans through
    c = curate_conversations(_df(spark, rows)).collect()[0]
    assert [c.text[s.start - 1 : s.end] for s in c.assistant_spans] == got


def test_wrapped_messages_object_shape_parses(spark):
    """The de-facto {"messages": [...]} JSONL wrapper must parse, not
    silently vanish."""
    wrapped = json.dumps(
        {"messages": [{"role": "user", "content": "q"},
                      {"role": "assistant", "content": "a"}]}
    )
    out = curate_conversations(_df(spark, [(1, wrapped)])).collect()
    assert len(out) == 1 and out[0].n_turns == 2


def test_dangling_user_turn_rejected(spark):
    rows = [(1, json.dumps([{"role": "user", "content": "q"},
                            {"role": "assistant", "content": "a"},
                            {"role": "user", "content": "dangling"}]))]
    assert curate_conversations(_df(spark, rows)).count() == 0


def test_template_markers_with_backslashes(spark):
    """Markers containing backslashes/quotes must survive the SQL
    literal round trip (escaping order: backslash first)."""
    from minerva_etl_spark.operators.chat import render_chat_with_spans

    rows = [(1, _msgs(("q", "a")))]
    r = render_chat_with_spans(
        parse_conversations(_df(spark, rows)),
        prefix="<<\\'", suffix="\\end\n",
    ).collect()[0]
    assert r.text == "<<\\'user\nq\\end\n<<\\'assistant\na\\end\n".replace("\\", chr(92)).replace("\n", chr(10))
    assert [r.text[s.start - 1 : s.end] for s in r.assistant_spans] == ["a"]
