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


def test_pack_sequences_hand_computed(spark):
    """Docs of 3/4/2 tokens packed into 4-token sequences in id order:
    spans split exactly at the cuts and tile each sequence."""
    from minerva_etl_spark.operators.shard import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i")],
        "doc_id bigint, text string",
    )
    rows = sorted(
        (r.seq_id, r.doc_id, r.tok_start, r.tok_end, r.pos_start)
        for r in pack_sequences(docs, seq_len=4, num_ranges=2).collect()
    )
    assert rows == [
        (0, 1, 0, 3, 0),   # doc1 fully in seq0 at pos 0
        (0, 2, 0, 1, 3),   # doc2's first token finishes seq0
        (1, 2, 1, 4, 0),   # doc2's remainder opens seq1
        (1, 3, 0, 1, 3),   # doc3 split across the seq1/seq2 cut
        (2, 3, 1, 2, 0),
    ]


def test_pack_sequences_tiles_every_sequence(spark):
    """Property over a larger corpus: every sequence's spans sum to
    seq_len (last may be short), start at pos 0, and abut without
    gaps; every document's spans reassemble [0, n_tokens)."""
    from minerva_etl_spark.operators.shard import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 23)))
         for i in range(60)],
        "doc_id bigint, text string",
    )
    out = pack_sequences(docs, seq_len=16, shuffle_seed=9).collect()
    by_seq, by_doc = {}, {}
    for r in out:
        by_seq.setdefault(r.seq_id, []).append(r)
        by_doc.setdefault(r.doc_id, []).append(r)
    total = sum(1 + (i * 7) % 23 for i in range(60))
    assert max(by_seq) == (total - 1) // 16
    for sid, spans in by_seq.items():
        spans.sort(key=lambda r: r.pos_start)
        assert spans[0].pos_start == 0
        pos = 0
        for s in spans:
            assert s.pos_start == pos
            pos += s.tok_end - s.tok_start
        assert pos == (16 if sid < max(by_seq) else total - 16 * sid)
    for did, spans in by_doc.items():
        spans.sort(key=lambda r: r.tok_start)
        assert spans[0].tok_start == 0
        assert spans[-1].tok_end == spans[-1].n_tokens
        for a, b in zip(spans, spans[1:]):
            assert a.tok_end == b.tok_start


def test_write_packed_sequences_roundtrip(spark, tmp_path):
    """The materialized packed export reassembles every sequence
    exactly as concatenating the corpus in pack order would."""
    from minerva_etl_spark.operators.shard import write_packed_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range((i % 5) + 2)))
         for i in range(30)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "packed")
    n_seqs = write_packed_sequences(
        docs, path, seq_len=8, seqs_per_file=4
    )
    back = spark.read.parquet(path).collect()
    seqs = {}
    for r in back:
        seqs.setdefault(r.seq_id, []).append(r)
    assert len(seqs) == n_seqs
    # reassemble and compare with the direct concatenation (id order)
    stream = []
    for i in range(30):
        stream.extend(f"t{i}_{j}" for j in range((i % 5) + 2))
    for sid, rows in seqs.items():
        rows.sort(key=lambda r: r.pos_start)
        got = [w for r in rows for w in r.words]
        assert got == stream[sid * 8:(sid + 1) * 8]
    # file grouping: ceil(n_seqs / 4) directories
    import os

    groups = [d for d in os.listdir(path) if d.startswith("file_id=")]
    assert len(groups) == (n_seqs + 3) // 4


def test_pack_token_ids_conservation_and_reassembly(spark):
    """The packed-id export conserves the encoded id stream exactly:
    the multiset of packed ids equals the multiset of per-doc encoded
    ids, and concatenating each sequence's spans in pos_start order
    reproduces the document-order id stream tile by tile."""
    from minerva_etl_spark.operators.bpe import bpe_encode_ids, bpe_train
    from minerva_etl_spark.operators.shard import pack_token_ids

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    enc = {r.doc_id: list(r.token_ids)
           for r in bpe_encode_ids(docs, merges).collect()}
    spans = pack_token_ids(docs, merges, seq_len=4).collect()
    # conservation: packed multiset == encoded multiset
    from collections import Counter

    packed = Counter(t for r in spans for t in r.token_ids)
    source = Counter(t for ids in enc.values() for t in ids)
    assert packed == source
    # reassembly: doc-id-order stream cut into 4-id tiles
    stream = [t for d in sorted(enc) for t in enc[d]]
    seqs = {}
    for r in spans:
        seqs.setdefault(r.seq_id, []).append(r)
    for sid, rows in seqs.items():
        rows.sort(key=lambda r: r.pos_start)
        got = [t for r in rows for t in r.token_ids]
        assert got == stream[sid * 4:(sid + 1) * 4]
    # every sequence except the last is exactly full
    total = len(stream)
    assert len(seqs) == (total + 3) // 4


def test_write_packed_token_ids_roundtrip(spark, tmp_path):
    from minerva_etl_spark.operators.bpe import bpe_train
    from minerva_etl_spark.operators.shard import write_packed_token_ids

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    path = str(tmp_path / "packed_ids")
    n_seqs = write_packed_token_ids(
        docs, merges, path, seq_len=4, seqs_per_file=2
    )
    back = spark.read.parquet(path)
    assert back.select("seq_id").distinct().count() == n_seqs
    # 8 + 9 + 2 = 19 ids -> 5 sequences of 4 (last short)
    assert n_seqs == 5


def test_write_token_ids_binary_roundtrip(spark, tmp_path):
    """The .bin/.idx export reconstructs bit-exactly: every sequence
    read back from the binary files equals the pack_token_ids assembly,
    and the manifest digests match the bytes on disk."""
    import hashlib

    from minerva_etl_spark.operators.bpe import bpe_train
    from minerva_etl_spark.operators.shard import (
        pack_token_ids,
        read_token_ids_binary,
        write_token_ids_binary,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    path = str(tmp_path / "bin_export")
    manifest = write_token_ids_binary(
        docs, merges, path, seq_len=4, seqs_per_file=2
    )
    man = {r.file_id: r for r in manifest.collect()}
    assert sum(r.n_seqs for r in man.values()) == 5  # 19 ids / 4

    # expected sequences from the span table
    spans = pack_token_ids(docs, merges, seq_len=4).collect()
    expected: dict[int, list] = {}
    for r in spans:
        expected.setdefault(r.seq_id, []).append(
            (r.pos_start, list(r.token_ids))
        )
    exp_seqs = {
        sid: [t for _, chunk in sorted(parts) for t in chunk]
        for sid, parts in expected.items()
    }

    got = {}
    for fid in man:
        for i, seq in enumerate(read_token_ids_binary(path, fid)):
            got[fid * 2 + i] = seq
    assert got == exp_seqs
    # manifest digests match the actual bytes
    for fid, r in man.items():
        body = open(f"{path}/shard-{fid:05d}.bin", "rb").read()
        assert hashlib.sha256(body).hexdigest() == r.sha256
        assert r.n_tokens == len(body) // 2  # uint16
    # manifest parquet persisted alongside the shards
    pm = spark.read.parquet(f"{path}/_manifest")
    assert pm.count() == len(man)


def test_write_token_ids_binary_dtype_guard(spark, tmp_path):
    """A vocabulary past the dtype limit fails loudly, not by
    overflow."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from minerva_etl_spark.operators.bpe import bpe_train
    from minerva_etl_spark.operators.shard import write_token_ids_binary

    docs = spark.createDataFrame(
        [(1, "aa bb aa bb cc")], "doc_id bigint, text string"
    )
    merges, _ = bpe_train(docs, n_merges=2, min_count=1)
    with _pytest.raises((ValueError, Py4JJavaError, Exception)) as ei:
        write_token_ids_binary(
            docs, merges, str(tmp_path / "x"), seq_len=4, dtype="uint8"
        )
    assert "uint16|uint32" in str(ei.value) or "dtype" in str(ei.value)
