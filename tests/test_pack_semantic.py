"""Semantic (in-context) packing: clusters are contiguous in the
token stream, spans conserve tokens, and the order key is exact."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.shard import pack_semantic


def _fixture(spark):
    # two obvious clusters in 4-d embedding space; doc text lengths
    # chosen so documents straddle sequence boundaries
    docs = spark.createDataFrame(
        [
            (1, "alpha " * 30),
            (2, "bravo " * 40),
            (3, "charlie " * 25),
            (4, "delta " * 35),
            (5, "echo " * 20),
            (6, "foxtrot " * 45),
        ],
        "doc_id bigint, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.9, 0.0, 0.0]),
            (3, [0.9, 1.0, 0.0, 0.0]),
            (5, [1.0, 1.0, 0.1, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.9]),
            (4, [0.0, 0.1, 0.9, 1.0]),
            (6, [0.0, 0.0, 1.0, 1.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    return docs, emb


def test_clusters_are_contiguous_in_the_stream(spark):
    docs, emb = _fixture(spark)
    spans = pack_semantic(docs, emb, seq_len=64, k=2, iters=2)
    rows = spans.collect()
    # reconstruct each doc's global token range
    first = {}
    for r in rows:
        g0 = r.seq_id * 64 + r.pos_start - r.tok_start
        first.setdefault(r.doc_id, g0)
    clusters = {
        r.doc_id: r.cluster_id for r in rows
    }
    # group docs by cluster; each cluster's docs must occupy ONE
    # contiguous global token range (no interleaving across clusters)
    by_c = {}
    for d, c in clusters.items():
        by_c.setdefault(c, []).append(d)
    assert len(by_c) == 2
    ranges = []
    n_tok = {r.doc_id: r.n_tokens for r in rows}
    for c, ds in by_c.items():
        starts = [first[d] for d in ds]
        ends = [first[d] + n_tok[d] for d in ds]
        assert max(ends) - min(starts) == sum(n_tok[d] for d in ds)
        ranges.append((min(starts), max(ends)))
    ranges.sort()
    assert ranges[0][1] == ranges[1][0]  # clusters abut, no gap


def test_spans_conserve_tokens_and_fill_sequences(spark):
    docs, emb = _fixture(spark)
    spans = pack_semantic(docs, emb, seq_len=64, k=2, iters=2)
    per_doc = (
        spans.groupBy("doc_id")
        .agg(F.sum(F.col("tok_end") - F.col("tok_start")).alias("got"),
             F.max("n_tokens").alias("want"))
        .collect()
    )
    assert all(r.got == r.want for r in per_doc)
    per_seq = (
        spans.groupBy("seq_id")
        .agg(F.sum(F.col("tok_end") - F.col("tok_start")).alias("fill"))
        .orderBy("seq_id")
        .collect()
    )
    assert all(r.fill == 64 for r in per_seq[:-1])  # full but the tail
    assert 0 < per_seq[-1].fill <= 64


def test_order_col_and_shuffle_seed_are_exclusive(spark):
    import pytest as _pytest

    from minerva_etl_spark.operators.shard import pack_sequences

    docs, _ = _fixture(spark)
    with _pytest.raises(ValueError, match="not both"):
        pack_sequences(
            docs.withColumn("o", F.lit(1)), 64,
            shuffle_seed=7, order_col="o",
        ).collect()
