"""Bloom-prefiltered decontamination: exact-operator equality (the
no-false-negative + confirm-join contract), pruning, and the build
path."""

from __future__ import annotations

from minerva_etl_spark.operators.bloom import (
    bloom_maybe_members,
    build_bloom,
    contamination_check_bloom,
)
from minerva_etl_spark.operators.dedup import contamination_check

DOCS = "doc_id bigint, text string"


def _corpus_bench(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a totally original sentence with no overlap at all here"),
            (3, "exam question one is the quick brown fox jumps riddle"),
            (4, "short"),
            (5, ""),
        ],
        DOCS,
    )
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over a fence"),
            (101, "benchmark answer key text nothing shared"),
        ],
        DOCS,
    )
    return corpus, bench


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bloom_equals_exact(spark):
    corpus, bench = _corpus_bench(spark)
    exact = contamination_check(corpus, bench)
    bloom = contamination_check_bloom(corpus, bench)
    assert _rows(bloom) == _rows(exact)
    assert bloom.count() > 0  # fixture actually exercises overlap


def test_tiny_bloom_false_positives_confirmed_away(spark):
    # 64 bits for dozens of shingles -> the filter saturates and
    # passes nearly everything; the exact-confirm join must still
    # reduce the answer to the exact operator's
    corpus, bench = _corpus_bench(spark)
    exact = contamination_check(corpus, bench)
    bloom = contamination_check_bloom(
        corpus, bench, num_bits=64, num_hashes=2
    )
    assert _rows(bloom) == _rows(exact)


def test_no_false_negatives_and_pruning(spark):
    members = spark.createDataFrame(
        [(i, f"member-{i}") for i in range(50)], "i bigint, s string"
    )
    others = spark.createDataFrame(
        [(i, f"other-{i}") for i in range(500)], "i bigint, s string"
    )
    bitmap = build_bloom(members, "s", num_bits=1 << 13, num_hashes=5)
    kept_members = bloom_maybe_members(
        members, "s", bitmap, 1 << 13, 5
    ).count()
    assert kept_members == 50  # a Bloom filter never drops a member
    kept_others = bloom_maybe_members(
        others, "s", bitmap, 1 << 13, 5
    ).count()
    assert kept_others < 50  # 8192 bits / 50 elems: fpp ~ 1e-4


def test_empty_benchmark(spark):
    corpus, _ = _corpus_bench(spark)
    empty = corpus.filter("doc_id < 0")
    assert contamination_check_bloom(corpus, empty).count() == 0


def test_build_bloom_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s-{i}") for i in range(200)], "i bigint, s string"
    )
    a = build_bloom(df, "s", 1 << 12, 3)
    b = build_bloom(df.repartition(11), "s", 1 << 12, 3)
    assert a == b
