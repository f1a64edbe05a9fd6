"""Golden corpus: every SQL text in the reference's example instance
(`/root/reference/examples/tiny_instance/`) translates and EXECUTES on
Spark — relation defining queries, materialization views, trigger
condition / weight / notification / data expressions."""

from pyspark.sql import functions as F

from minerva_etl_spark.plans.sqltranslate import translate


def _fixture_views(spark):
    spark.createDataFrame(
        [(1, "alpha-1"), (2, "alpha-2"), (3, "beta-1")],
        "id bigint, name string",
    ).createOrReplaceTempView("entity_node")
    spark.createDataFrame(
        [(10, "alpha"), (11, "beta")], "id bigint, name string"
    ).createOrReplaceTempView("entity_v_site")
    from datetime import datetime

    spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, 15), 0.02),
            (2, datetime(2024, 1, 1, 0, 15), 1.50),
        ],
        "entity_id bigint, timestamp timestamp_ntz, power_kwh double",
    ).createOrReplaceTempView("hub_node_main_15m")


def _resolver(schema: str, name: str) -> str:
    slug = name.replace("->", "_").replace("-", "_")
    return f"entity_{slug}" if schema == "entity" else slug


def test_relation_defining_query(spark):
    # examples/tiny_instance/relation/node->v-site.yaml
    _fixture_views(spark)
    pg = '''
SELECT
  n.id AS source_id,
  vs.id AS target_id
FROM entity."node" n
JOIN entity."v-site" vs ON vs.name = substring(n.name from '([a-z]+)-.*')
GROUP BY n.id, vs.id
'''
    rows = spark.sql(translate(pg, table_resolver=_resolver)).collect()
    got = {(r.source_id, r.target_id) for r in rows}
    assert got == {(1, 10), (2, 10), (3, 11)}


def test_materialization_view(spark):
    # examples/tiny_instance/materialization/hub-kpi_node_15m.yaml
    _fixture_views(spark)
    pg = '''
SELECT
  timestamp,
  entity_id,
  power_kwh * 1000 as power_mwh
FROM trend."hub_node_main_15m"
'''
    rows = spark.sql(translate(pg)).collect()
    assert {r.power_mwh for r in rows} == {20.0, 1500.0}


def test_trigger_weight_case_expression(spark):
    # examples/tiny_instance/trigger/node-15m-highpowerusage.yaml weight
    pg = """
SELECT
    CASE
        WHEN $1.power_kwh > 1 THEN 500
        WHEN $1.power_kwh > 2 THEN 800
        ELSE 300
    END
"""
    _fixture_views(spark)
    sql = translate(pg).replace(
        "SELECT", "SELECT entity_id,", 1
    ) + ' FROM trend."hub_node_main_15m"'
    rows = spark.sql(translate(sql)).collect()
    got = {r[0]: r[1] for r in rows}
    assert got == {1: 300, 2: 500}


def test_trigger_notification_array_format(spark):
    # notification: array_to_string(ARRAY[...], E'\n') + format('%s > %s')
    pg = r"""
SELECT array_to_string(
    ARRAY[
        'HighPowerUsage',
        format('%s > %s', $1.power_kwh, $1.max_power)
    ],
    E'\n'
)
"""
    _fixture_views(spark)
    sql = (
        translate(pg)
        + ' FROM (SELECT power_kwh, 0.05 AS max_power'
        + ' FROM hub_node_main_15m WHERE entity_id = 2)'
    )
    row = spark.sql(sql).collect()[0]
    assert row[0] == "HighPowerUsage\n1.5 > 0.05"


def test_trigger_data_json_cast(spark):
    # data: format('{"power_kwh": %s, ...}')::json
    pg = (
        "format('{\"power_kwh\": %s, \"max_power\": %s}', "
        "$1.power_kwh, $1.max_power)::json"
    )
    _fixture_views(spark)
    sql = (
        "SELECT " + translate(pg) + " AS data FROM "
        "(SELECT power_kwh, 0.05 AS max_power FROM hub_node_main_15m "
        "WHERE entity_id = 1)"
    )
    row = spark.sql(sql).collect()[0]
    assert row.data == '{"power_kwh": 0.02, "max_power": 0.05}'


def test_virtual_entity_values_list(spark):
    # examples/tiny_instance/virtual-entity/v-site.sql view body
    pg = "SELECT name FROM (VALUES ('1001'), ('1002'), ('1003')) AS s(name)"
    rows = spark.sql(translate(pg)).collect()
    assert {r.name for r in rows} == {"1001", "1002", "1003"}


def test_interval_and_date_part(spark):
    pg = (
        "SELECT timestamp + '1 day 2 hours'::interval AS later, "
        "date_part('epoch', timestamp) AS epoch_s, "
        "date_part('year', timestamp) AS y "
        'FROM trend."hub_node_main_15m" WHERE entity_id = 1'
    )
    _fixture_views(spark)
    row = spark.sql(translate(pg)).collect()[0]
    assert str(row.later) == "2024-01-02 02:15:00"
    assert row.y == 2024
    assert row.epoch_s == 1704068100


def test_condition_passthrough(spark):
    assert translate("power_mwh > max_power") == "power_mwh > max_power"


def test_bpe_decode_round_trip(spark):
    """decode(encode(t)) == the normalized word sequence of t, with
    the merge table as the only shared artifact."""
    from minerva_etl_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "A cat AND a hat!"),
            (3, "cats, cats & more cats"),
            (4, "unseen zebra words"),
        ],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=8, min_count=2)
    dec = {
        r.doc_id: r.decoded_text
        for r in bpe_decode_ids(
            bpe_encode_ids(docs, merges), docs, merges
        ).collect()
    }
    assert dec == {
        1: "the cat sat on the mat",
        2: "a cat and a hat",
        3: "cats cats more cats",
        4: "unseen zebra words",
    }


def test_bpe_byte_fallback_roundtrip_and_fixed_ids(spark):
    """r14 (the r13 verdict's ask 2): encoding against a persisted
    vocabulary that has never seen 'q' must emit <0xNN> byte tokens —
    never -1, never dropped — and decode back bit-exactly; trained
    tokens keep their ids (fallback ids append AFTER the vocab)."""
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators.bpe import (
        bpe_decode_ids_bf,
        bpe_encode_ids_bf,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "cats chase rats on mats"),
        (3, "the rat sat too"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    vocab = bpe_vocab(docs, merges)
    n_vocab = vocab.count()
    max_tid = vocab.agg(F.max("tid")).collect()[0][0]

    # in-alphabet text: bf path == plain path (same ids, no fallback)
    plain = {
        r.doc_id: r.token_ids
        for r in bpe_encode_ids(docs, merges).collect()
    }
    bf = {
        r.doc_id: r.token_ids
        for r in bpe_encode_ids_bf(docs, merges, vocab).collect()
    }
    assert plain == bf

    # OOV text: 'q'/'z' never trained -> byte ids past the vocab
    oov = spark.createDataFrame(
        [(9, "quiz the qat")], "doc_id bigint, text string"
    )
    enc = bpe_encode_ids_bf(oov, merges, vocab).collect()[0]
    assert all(i is not None and i >= 0 for i in enc.token_ids)
    assert any(i > max_tid for i in enc.token_ids)  # fallback used
    dec = bpe_decode_ids_bf(
        spark.createDataFrame(
            [(9, enc.token_ids)], "doc_id bigint, token_ids array<int>"
        ),
        vocab,
    ).collect()[0]
    assert dec.decoded_text == "quiz the qat"
    assert vocab.count() == n_vocab  # vocab itself never mutated
