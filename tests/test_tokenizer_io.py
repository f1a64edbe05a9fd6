"""HuggingFace tokenizer.json interop (`operators/tokenizer_io.py`):
export schema, exact table round trip, encode-through-imported
equality, byte-fallback id space."""

import json

import pytest

from minerva_etl_spark.operators.bpe import (
    bpe_encode_ids_bf,
    bpe_train,
    bpe_vocab,
)
from minerva_etl_spark.operators.tokenizer_io import (
    bpe_export_hf,
    bpe_import_hf,
)

_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "cats chase rats on mats"),
    (3, "the rat sat too"),
]


def test_export_schema_and_roundtrip_tables(spark, tmp_path):
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    vocab = bpe_vocab(docs, merges)
    path = str(tmp_path / "tokenizer.json")
    doc = bpe_export_hf(merges, vocab, path)
    on_disk = json.loads(open(path).read())
    assert on_disk == doc
    m = on_disk["model"]
    assert m["type"] == "BPE"
    assert m["end_of_word_suffix"] == "</w>"
    assert m["byte_fallback"] is True
    # merges are "left right" with terminators stripped, rank order
    assert len(m["merges"]) == merges.count()
    assert all(" " in x and "_" not in x.replace("</w>", "")
               for x in m["merges"])
    # byte rows present at ids past the trained vocab
    assert "<0x71>" in m["vocab"] and "<0x71></w>" in m["vocab"]

    m2, v2 = bpe_import_hf(spark, path)
    orig_m = [(r.rank, r.left, r.right)
              for r in merges.orderBy("rank").collect()]
    got_m = [(r.rank, r.left, r.right)
             for r in m2.orderBy("rank").collect()]
    assert orig_m == got_m
    orig_v = {(r.tok, r.tid) for r in vocab.collect()}
    got_v = {(r.tok, r.tid) for r in v2.collect()}
    assert orig_v == got_v  # byte rows dropped on import


def test_encode_through_imported_artifact_is_identical(spark, tmp_path):
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    vocab = bpe_vocab(docs, merges)
    path = str(tmp_path / "tok.json")
    bpe_export_hf(merges, vocab, path)
    m2, v2 = bpe_import_hf(spark, path)
    oov = spark.createDataFrame(
        [(9, "quiz the qat")], "doc_id bigint, text string"
    )
    a = bpe_encode_ids_bf(oov, merges, vocab).collect()[0]
    b = bpe_encode_ids_bf(oov, m2, v2).collect()[0]
    assert a.token_ids == b.token_ids


def test_full_document_sections(spark, tmp_path):
    """r15 (VERDICT ask 4): the artifact carries the engine's text
    contract so the external `tokenizers` loader reproduces the
    engine's encodings on raw text — normalizer (Lowercase),
    pre_tokenizer (Split on [^a-z]+ Removed), decoder (BPEDecoder
    with the </w> suffix), and added_tokens declaring the byte-row
    id block."""
    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    merges, _ = bpe_train(docs, n_merges=4, min_count=2)
    vocab = bpe_vocab(docs, merges)
    path = str(tmp_path / "full.json")
    doc = bpe_export_hf(merges, vocab, path)
    assert doc["normalizer"] == {"type": "Lowercase"}
    assert doc["pre_tokenizer"] == {
        "type": "Split",
        "pattern": {"Regex": "[^a-z]+"},
        "behavior": "Removed",
        "invert": False,
    }
    assert doc["decoder"] == {"type": "BPEDecoder", "suffix": "</w>"}
    # added_tokens cover exactly the 512 byte rows, ids matching the
    # vocab entries (the public schema's per-entry shape)
    assert len(doc["added_tokens"]) == 512
    for a in doc["added_tokens"]:
        assert set(a) == {"id", "content", "single_word", "lstrip",
                          "rstrip", "normalized", "special"}
        assert a["special"] is True
        assert doc["model"]["vocab"][a["content"]] == a["id"]
    # the sections are ignored gracefully by the engine's importer
    m2, v2 = bpe_import_hf(spark, path)
    assert m2.count() == merges.count()
    assert v2.count() == vocab.count()
    # unigram export declares the same contract
    from minerva_etl_spark.operators.tokenizer_io import (
        unigram_export_hf,
    )
    from minerva_etl_spark.operators.unigram import unigram_train

    uv = unigram_train(docs, max_vocab=32, max_len=4, iters=1)
    udoc = unigram_export_hf(uv, str(tmp_path / "u.json"))
    assert udoc["normalizer"] == doc["normalizer"]
    assert udoc["pre_tokenizer"] == doc["pre_tokenizer"]
    assert udoc["decoder"] == doc["decoder"]


def test_ambiguous_string_merge_raises(spark, tmp_path):
    """r15 (VERDICT ask 7): a string-form merge whose token contains
    a space cannot be split unambiguously — the importer must raise,
    not silently mis-split (the pair-list form carries such tokens
    losslessly and still imports)."""
    base = {
        "model": {
            "type": "BPE",
            "vocab": {"a": 0, "b": 1},
            "merges": ["a b c"],  # ("a b","c") or ("a","b c")?
            "end_of_word_suffix": "</w>",
        }
    }
    p = str(tmp_path / "amb.json")
    open(p, "w").write(json.dumps(base))
    with pytest.raises(ValueError, match="ambiguous"):
        bpe_import_hf(spark, p)
    # the pair-list form of the same merge is fine
    base["model"]["merges"] = [["a b", "c"]]
    open(p, "w").write(json.dumps(base))
    m2, _ = bpe_import_hf(spark, p)
    got = m2.collect()[0]
    assert (got.left, got.right) == ("a b_", "c_")


def test_import_rejects_non_bpe(spark, tmp_path):
    p = str(tmp_path / "bad.json")
    open(p, "w").write(json.dumps({"model": {"type": "Unigram"}}))
    with pytest.raises(ValueError, match="only .*BPE|BPE"):
        bpe_import_hf(spark, p)
    with pytest.raises(FileNotFoundError):
        bpe_import_hf(spark, str(tmp_path / "absent.json"))


def test_unigram_export_import_exact_costs(spark, tmp_path):
    """r14: Unigram tokenizer.json — ordered [piece, -cost] entries;
    integer grid costs survive the JSON float round trip losslessly
    and ids come from list position (the schema contract)."""
    from minerva_etl_spark.operators.tokenizer_io import (
        unigram_export_hf,
        unigram_import_hf,
    )
    from minerva_etl_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
        unigram_vocab_ids,
    )

    docs = spark.createDataFrame(_DOCS, "doc_id bigint, text string")
    vocab = unigram_train(docs, max_vocab=64, max_len=4, iters=1)
    path = str(tmp_path / "uni.json")
    doc = unigram_export_hf(vocab, path)
    assert doc["model"]["type"] == "Unigram"
    v2 = unigram_import_hf(spark, path)
    orig = {(r.token, r.cost) for r in vocab.collect()}
    got = {(r.token, r.cost) for r in v2.collect()}
    assert orig == got
    # ids from position == unigram_vocab_ids ranks
    ids = {r.token: r.token_id
           for r in unigram_vocab_ids(vocab).collect()}
    for r in v2.collect():
        assert ids[r.token] == r.token_id
    # encoding through the imported costs is identical
    a = {(r.doc_id, r.pieces)
         for r in unigram_encode(docs, vocab, max_len=4).collect()}
    b = {(r.doc_id, r.pieces)
         for r in unigram_encode(docs, v2, max_len=4).collect()}
    assert a == b
    import pytest as _p

    with _p.raises(ValueError, match="Unigram"):
        from minerva_etl_spark.operators.tokenizer_io import (
            bpe_export_hf,
        )
        # a BPE file must be rejected by the unigram importer
        from minerva_etl_spark.operators.bpe import bpe_train, bpe_vocab

        m, _ = bpe_train(docs, n_merges=2)
        bpe_export_hf(m, bpe_vocab(docs, m), str(tmp_path / "b.json"))
        unigram_import_hf(spark, str(tmp_path / "b.json"))


def test_vocab0_from_trained_equals_initial_vocab(spark):
    """r17: vocab0_from_trained must reproduce _initial_vocab exactly
    (word, cnt, sym) from the trainer's returned vocab — the shortcut
    every encode/decode/vocab consumer uses to skip the corpus pass."""
    from minerva_etl_spark.operators.bpe import (
        _initial_vocab,
        bpe_train,
        vocab0_from_trained,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran far"), (3, "a cat, a hat!")],
        "doc_id bigint, text string",
    )
    _, tvocab = bpe_train(docs, n_merges=3, min_count=1)
    a = sorted(map(tuple, _initial_vocab(docs, "text").collect()))
    b = sorted(map(tuple, vocab0_from_trained(tvocab).collect()))
    assert a == b and len(a) > 0
