"""Tokenizer artifact interop — HuggingFace ``tokenizer.json`` export
and import for BOTH trained tokenizer families, BPE and unigram
(round 14).

A tokenizer trained at corpus scale is only useful if the TRAINING
stack can hand it to the SERVING/loader stack.  The de-facto exchange
format is the HuggingFace *tokenizers* ``tokenizer.json`` (public
schema: a ``model`` object with ``type: "BPE"``, a ``vocab`` map of
token→id, an ordered ``merges`` list, and optional
``end_of_word_suffix`` / ``byte_fallback`` fields).  This module maps
the engine's artifacts onto that schema and back:

* the engine's internal ``_`` symbol terminator is an ENGINE encoding
  detail (it exists so plain ``replace()`` merges are boundary-exact
  — see `operators/bpe.py`) and is STRIPPED on export / re-added on
  import; uniqueness is preserved because every internal token ends
  with exactly one terminator;
* the ``</w>`` word-end marker is exported as
  ``end_of_word_suffix: "</w>"`` with suffixed tokens kept verbatim —
  the classic Sennrich formulation HF supports natively;
* with ``byte_fallback=True`` the 512 byte rows
  (``<0xNN>`` / ``<0xNN></w>``) are materialized into the vocab at
  their deterministic ids (`bpe._byte_token_ids`), so an external
  loader sees the SAME id space `bpe_encode_ids_bf` emits;
* the document declares the engine's TEXT CONTRACT so the external
  ``tokenizers`` loader reproduces the engine's encodings on raw
  text (r15): ``normalizer: Lowercase`` then ``pre_tokenizer: Split``
  on the regex ``[^a-z]+`` with behavior ``Removed`` — exactly the
  engine's ``split(lower(text), '[^a-z]+')`` word stream — and
  ``decoder: BPEDecoder`` with suffix ``</w>`` (the engine's decode
  folds ``</w>`` into spaces).  The byte rows are additionally
  declared as ``added_tokens`` (``special: true`` — they are id-space
  markers, not text-matchable content; the functional byte-fallback
  mechanism is the model's ``byte_fallback`` flag over the vocab
  entries, so an external decode keeps working even when a loader
  ignores the declarations).

Export collects the (bounded) vocab/merge tables to the driver — the
same documented contract as `bpe._merge_list` — and writes ONE small
JSON file through the Hadoop FS API (portable to HDFS/object stores).

Round trip is exact: ``bpe_import_hf(bpe_export_hf(...))`` returns
tables equal to the originals, pinned by pytest and by the
`bpe_hf_roundtrip` gate row (encode→decode through the re-imported
artifact must reproduce the normalized source bit-exactly).

Reference parity note: extension surface (the reference has no
tokenizer artifacts); the JSON schema is the public HF tokenizers
format.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from minerva_etl_spark.operators.bpe import _EOW, _T, _byte_token_ids

__all__ = [
    "bpe_export_hf",
    "bpe_import_hf",
    "unigram_export_hf",
    "unigram_import_hf",
]


#: the engine's text contract, declared in HF tokenizer.json terms:
#: ``split(lower(text), '[^a-z]+')`` == Lowercase, then Split on the
#: regex with the matched delimiters REMOVED (not kept as tokens)
_HF_NORMALIZER = {"type": "Lowercase"}
_HF_PRE_TOKENIZER = {
    "type": "Split",
    "pattern": {"Regex": "[^a-z]+"},
    "behavior": "Removed",
    "invert": False,
}


def _strip_term(tok: str) -> str:
    if not tok.endswith(_T):
        raise ValueError(
            f"internal token {tok!r} lacks the {_T!r} terminator"
        )
    return tok[: -len(_T)]


def bpe_export_hf(
    merges: DataFrame,
    vocab_ids: DataFrame,
    path: str,
    byte_fallback: bool = True,
) -> dict:
    """Serialize trained merges + the (tok, tid) vocabulary as a
    HuggingFace-schema ``tokenizer.json`` at ``path``.  Returns the
    document (handy for tests).  Ids are preserved verbatim; with
    ``byte_fallback`` the 512 deterministic byte rows are included so
    external loaders share `bpe_encode_ids_bf`'s id space."""
    spark = vocab_ids.sparkSession
    vrows = vocab_ids.orderBy("tid", "tok").collect()
    vocab = {_strip_term(r["tok"]): int(r["tid"]) for r in vrows}
    if len(vocab) != len(vrows):
        raise ValueError("vocab tokens collide after terminator strip")
    mrows = merges.orderBy("rank").collect()
    mlist = [
        f"{_strip_term(r['left'])} {_strip_term(r['right'])}"
        for r in mrows
    ]
    added_tokens = []
    if byte_fallback:
        start = (max(vocab.values()) + 1) if vocab else 0
        for r in _byte_token_ids(spark, start).collect():
            tok = _strip_term(r["tok"])
            vocab[tok] = int(r["tid"])
            added_tokens.append(
                {
                    "id": int(r["tid"]),
                    "content": tok,
                    "single_word": False,
                    "lstrip": False,
                    "rstrip": False,
                    "normalized": False,
                    "special": True,
                }
            )
    doc = {
        "version": "1.0",
        "normalizer": _HF_NORMALIZER,
        "pre_tokenizer": _HF_PRE_TOKENIZER,
        "decoder": {"type": "BPEDecoder", "suffix": _EOW},
        "added_tokens": added_tokens,
        "model": {
            "type": "BPE",
            "vocab": vocab,
            "merges": mlist,
            "end_of_word_suffix": _EOW,
            "byte_fallback": bool(byte_fallback),
            "unk_token": None,
        },
    }
    from minerva_etl_spark.fsutil import fs_write_small

    fs_write_small(
        spark, path, json.dumps(doc, indent=1, sort_keys=True)
    )
    return doc


def bpe_import_hf(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Load a ``tokenizer.json`` written by :func:`bpe_export_hf` (or
    any HF BPE file using ``end_of_word_suffix``) back into the
    engine's ``(merges, vocab_ids)`` tables — terminators re-added,
    byte rows dropped (they are re-derived deterministically by
    `bpe_encode_ids_bf`/`bpe_decode_ids_bf`).  ``merges`` carries
    ``pair_count = -1``: the artifact does not persist counts, and
    encode never reads them."""
    from minerva_etl_spark.fsutil import fs_read_small

    raw = fs_read_small(spark, path)
    if raw is None:
        raise FileNotFoundError(path)
    doc = json.loads(raw)
    model = doc.get("model", {})
    if model.get("type") != "BPE":
        raise ValueError(
            f"tokenizer.json model.type={model.get('type')!r} — only "
            "BPE is supported"
        )
    import re

    byte_re = re.compile(r"^<0x[0-9A-F]{2}>(</w>)?$")
    vocab_rows = [
        (tok + _T, int(tid))
        for tok, tid in model.get("vocab", {}).items()
        if not byte_re.match(tok)
    ]
    merge_rows = []
    for rank, m in enumerate(model.get("merges", [])):
        if isinstance(m, (list, tuple)):  # HF also allows pairs
            left, right = m
        else:
            # the string form is ambiguous when a token itself
            # contains a space: "a b c" could be ("a b","c") or
            # ("a","b c").  A well-formed space-free merge has
            # EXACTLY one separator — anything else must raise, not
            # silently mis-split (the pair-list form carries such
            # tokens losslessly; re-export in that form instead).
            if m.count(" ") != 1:
                raise ValueError(
                    f"ambiguous string-form merge {m!r} (rank "
                    f"{rank}): token contains a space — use the "
                    "pair-list merge form"
                )
            left, right = m.split(" ", 1)
        merge_rows.append((rank, left + _T, right + _T, -1))
    vocab_ids = spark.createDataFrame(
        vocab_rows, "tok string, tid int"
    )
    merges = spark.createDataFrame(
        merge_rows,
        "rank int, left string, right string, pair_count bigint",
    )
    return merges, vocab_ids


def unigram_export_hf(vocab: DataFrame, path: str) -> dict:
    """Serialize a trained unigram vocabulary (``token, freq,
    cost``) as a HuggingFace-schema Unigram ``tokenizer.json``: the
    vocab is the ORDERED ``[piece, score]`` list (order = token id,
    exactly `unigram_vocab_ids`'s (freq desc, token asc) rank), with
    ``score = -cost`` — the engine's grid costs are integers far
    below 2^53, so the JSON float round-trip is LOSSLESS and
    :func:`unigram_import_hf` reconstructs the exact lattice."""
    rows = vocab.orderBy(
        F.col("freq").desc(), F.col("token").asc()
    ).collect()
    entries = [[r["token"], -int(r["cost"])] for r in rows]
    doc = {
        "version": "1.0",
        # same text contract as the BPE artifact (r15): the unigram
        # lattice runs over the identical lowercased [a-z]+ word
        # stream, and decode folds </w> into spaces
        "normalizer": _HF_NORMALIZER,
        "pre_tokenizer": _HF_PRE_TOKENIZER,
        "decoder": {"type": "BPEDecoder", "suffix": _EOW},
        "added_tokens": [],
        "model": {
            "type": "Unigram",
            "vocab": entries,
            "unk_id": None,
            "byte_fallback": True,
        },
    }
    from minerva_etl_spark.fsutil import fs_write_small

    fs_write_small(
        vocab.sparkSession, path,
        json.dumps(doc, indent=1, sort_keys=True),
    )
    return doc


def unigram_import_hf(
    spark: SparkSession, path: str
) -> DataFrame:
    """Load a Unigram ``tokenizer.json`` back into the engine's
    ``(token, cost, token_id)`` table — costs reconstructed exactly
    (``cost = -score``, integers), ids from list position (the
    schema's contract).  ``<0xNN>`` byte pieces are dropped (the
    byte-fallback encoder derives them)."""
    from minerva_etl_spark.fsutil import fs_read_small

    raw = fs_read_small(spark, path)
    if raw is None:
        raise FileNotFoundError(path)
    doc = json.loads(raw)
    model = doc.get("model", {})
    if model.get("type") != "Unigram":
        raise ValueError(
            f"tokenizer.json model.type={model.get('type')!r} — "
            "expected Unigram"
        )
    import re as _re

    byte_re = _re.compile(r"^<0x[0-9A-F]{2}>(</w>)?$")
    rows = []
    for tid, (piece, score) in enumerate(model.get("vocab", [])):
        if byte_re.match(piece):
            continue
        cost = -int(round(float(score)))
        rows.append((piece, cost, tid))
    return spark.createDataFrame(
        rows, "token string, cost bigint, token_id int"
    )
