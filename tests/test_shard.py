"""Token-budget shard packing: distributed prefix sum vs the naive
global window, shard-budget invariants, and the partitioned writer."""

import pyspark.sql.functions as F

from minerva_etl_spark.operators.shard import (
    assign_token_shards,
    write_token_shards,
)


def _docs(spark, n=200, words=7):
    return spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(1 + (i * 13) % words)))
         for i in range(n)],
        "doc_id bigint, text string",
    ).repartition(7)  # deliberately scrambled input partitioning


def test_matches_global_window(spark):
    docs = _docs(spark)
    got = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in assign_token_shards(
            docs, shard_tokens=20, num_ranges=5
        ).collect()
    }
    # naive single-window reference
    from pyspark.sql import Window

    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).cast("bigint")
            .alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "shard_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / 20.0).cast("bigint"),
        )
        .drop("cum")
        .collect()
    }
    assert got == ref


def test_shard_budget_invariants(spark):
    docs = _docs(spark, n=300)
    out = assign_token_shards(docs, shard_tokens=25, num_ranges=6)
    per_shard = (
        out.groupBy("shard_id").agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    # every shard holds at most budget + (max doc - 1) overflow tokens
    max_doc = out.agg(F.max("n_tokens")).first()[0]
    assert all(r.total <= 25 + max_doc - 1 for r in per_shard)
    # shards are dense 0..k
    ids = sorted(r.shard_id for r in per_shard)
    assert ids == list(range(len(ids)))
    # deterministic under re-evaluation
    again = assign_token_shards(docs, shard_tokens=25, num_ranges=6)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_write_token_shards_partitions(spark, tmp_path):
    docs = _docs(spark, n=80)
    n_shards = write_token_shards(
        docs, str(tmp_path / "shards"), shard_tokens=30
    )
    assert n_shards >= 2
    back = spark.read.parquet(str(tmp_path / "shards"))
    assert back.count() == 80
    assert "shard_id" in back.columns
    dirs = [p.name for p in (tmp_path / "shards").iterdir()
            if p.name.startswith("shard_id=")]
    assert len(dirs) == n_shards


def test_exact_division_beyond_double_precision(spark):
    # cumulative token counts past 2^53 must not be rounded through a
    # double: documents near a shard boundary would land in the wrong
    # shard.  Token counts are supplied via token_col so the cumsum
    # crosses 2^53 with a handful of rows.
    big = 1 << 53
    rows = [(i, big // 4) for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    out = {
        r.doc_id: r.shard_id
        for r in assign_token_shards(
            docs, shard_tokens=big + 1, token_col="n_tokens", num_ranges=3
        ).collect()
    }
    # exact: doc i starts at i*big/4 tokens; shard = (i*big//4)//(big+1)
    ref = {i: (i * (big // 4)) // (big + 1) for i in range(12)}
    assert out == ref


def test_shuffled_order_is_permutation_and_deterministic(spark):
    """shuffle_seed packs in the md5 permutation order: same docs, same
    totals, different arrangement; stable across runs/partitioning and
    seed-sensitive."""
    rows = [(i, "x" * (10 + i % 7)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    plain = assign_token_shards(docs, shard_tokens=40, num_ranges=4)
    shuf = assign_token_shards(
        docs, shard_tokens=40, num_ranges=4, shuffle_seed=7
    )
    p = {r.doc_id: (r.n_tokens, r.shard_id) for r in plain.collect()}
    s = {r.doc_id: (r.n_tokens, r.shard_id) for r in shuf.collect()}
    assert set(p) == set(s)  # same documents
    assert all(p[k][0] == s[k][0] for k in p)  # same token counts
    assert any(p[k][1] != s[k][1] for k in p)  # genuinely reordered

    # deterministic under different range counts
    s2 = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in assign_token_shards(
            docs, shard_tokens=40, num_ranges=9, shuffle_seed=7
        ).collect()
    }
    assert s == s2
    # another seed gives another permutation
    s3 = {
        r.doc_id: r.shard_id
        for r in assign_token_shards(
            docs, shard_tokens=40, num_ranges=4, shuffle_seed=8
        ).collect()
    }
    assert any(s[k][1] != s3[k] for k in s)


def test_curated_export_composition(spark):
    """mix -> shuffle -> pack: output units equal the resampled corpus,
    copies of an upsampled doc scatter (not necessarily adjacent), and
    shard token budgets hold."""
    from minerva_etl_spark.operators.mixing import (
        curated_export, resample_by_source,
    )

    rows = [
        (i, "big" if i < 80 else "small", "w " * (5 + i % 5))
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = curated_export(
        docs, alpha=0.0, shard_tokens=30, shuffle_seed=3
    ).collect()
    res = resample_by_source(docs, alpha=0.0).select("doc_id", "copy").collect()
    assert sorted((r.doc_id, r.copy) for r in out) == sorted(
        (r.doc_id, r.copy) for r in res
    )
    # every unit has the doc's token count
    toks = {r.doc_id: r.n_tokens for r in out}
    for r in out:
        assert r.n_tokens == toks[r.doc_id]
    # shards are budget-bounded: each shard's tokens fit ~30 plus one
    # straddling doc (a doc starts in the shard its first token lands in)
    per_shard = {}
    for r in out:
        per_shard.setdefault(r.shard_id, 0)
        per_shard[r.shard_id] += r.n_tokens
    max_tok = max(r.n_tokens for r in out)
    assert all(v <= 30 + max_tok for v in per_shard.values())
    # deterministic
    again = curated_export(
        docs, alpha=0.0, shard_tokens=30, shuffle_seed=3
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
