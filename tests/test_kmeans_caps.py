"""Round-7 operators: distributed k-means, skew-safe per-key caps,
TF-IDF keyword extraction."""

import math

import pytest
from pyspark.sql import Window, functions as F

from minerva_etl_spark.operators.kmeans import kmeans_fit
from minerva_etl_spark.operators.skew import cap_per_key
from minerva_etl_spark.operators.text import tfidf_top_terms


def test_kmeans_separable_clusters(spark):
    # two tight blobs on orthogonal axes; seeds 0 and 1 land one in each
    rows = []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, [10.0 + (i % 3), 0.1, 0.0]))
        else:
            rows.append((i, [0.1, 10.0 + (i % 3), 0.0]))
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    assigned, cent = kmeans_fit(emb, k=2, iters=2)
    got = {r.vec_id: r.centroid_id for r in assigned.collect()}
    # seed 0 is an x-blob member, seed 1 a y-blob member
    for i in range(20):
        assert got[i] == (0 if i % 2 == 0 else 1)
    cvecs = {r.centroid_id: r.cvec for r in cent.collect()}
    assert len(cvecs) == 2
    # fitted centroids sit inside their blob (x-dominant vs y-dominant)
    assert cvecs[0][0] > 5 and cvecs[0][1] < 1
    assert cvecs[1][1] > 5 and cvecs[1][0] < 1


def test_kmeans_centroids_deterministic_across_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    emb1 = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(7)
    emb2 = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(3)
    _, c1 = kmeans_fit(emb1, k=3, iters=2)
    _, c2 = kmeans_fit(emb2, k=3, iters=2)
    v1 = {r.centroid_id: r.cvec for r in c1.collect()}
    v2 = {r.centroid_id: r.cvec for r in c2.collect()}
    # exact bit equality: the grid-snapped integer sums make the mean
    # independent of partitioning / aggregation order
    assert v1 == v2


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # seed 1 is strictly dominated: every vector (incl. the seed point)
    # is closer to seed 0's direction after the first update, so the
    # cluster can empty out; the centroid must survive via coalesce
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1])] + [
        (i, [1.0, 0.01 * (i % 2)]) for i in range(2, 12)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    assigned, cent = kmeans_fit(emb, k=2, iters=3)
    assert cent.count() == 2  # never loses a centroid row
    assert assigned.count() == 12


def test_cap_per_key_equals_single_window(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, rng.choice(["a", "a", "a", "b", "c"]), rng.randint(0, 50))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id int, k string, v int").repartition(6)
    order = [F.col("v").desc(), F.col("id").asc()]
    capped = cap_per_key(
        df, keys=["k"], order_by=order, n=7, salt_col="id", salt_buckets=5
    )
    w = Window.partitionBy("k").orderBy(*order)
    direct = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
    )
    got = {(r.k, r.rank): r.id for r in capped.collect()}
    want = {(r.k, r.rank): r.id for r in direct.collect()}
    assert got == want
    assert len(got) == 21


def test_cap_per_key_requires_salt(spark):
    df = spark.createDataFrame([(1, "a")], "id int, k string")
    with pytest.raises(ValueError):
        cap_per_key(df, ["k"], [F.col("id").asc()], n=1)


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry durian cherry durian"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, n=2)
    rows = {
        (r.doc_id, r.rank): (r.term, r.tfidf) for r in out.collect()
    }
    ln = math.log
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert rows[(1, 1)] == ("apple", round(2 * ln(3.0), 6))
    assert rows[(1, 2)] == ("banana", round(ln(3.0 / 2.0), 6))
    # doc 3: cherry and durian both tf=2; cherry df=2, durian df=1
    assert rows[(3, 1)] == ("durian", round(2 * ln(3.0), 6))
    assert rows[(3, 2)] == ("cherry", round(2 * ln(3.0 / 2.0), 6))
    # every doc contributes at most n rows
    assert out.groupBy("doc_id").count().agg(F.max("count")).first()[0] <= 2


def test_leakage_split_component_invariant(spark):
    from minerva_etl_spark.operators.split import leakage_safe_split

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id bigint"
    )
    comps = spark.createDataFrame(
        # components 0 and 100, covering 40 docs each
        [(i, 0) for i in range(40)] + [(100 + i, 100) for i in range(40)],
        "doc_id bigint, component_id bigint",
    )
    out = leakage_safe_split(
        docs, comps, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )
    rows = out.collect()
    assert len(rows) == 200
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, set()).add(r.split)
    # every component draws exactly one split
    assert all(len(s) == 1 for s in by_comp.values())
    # cluster members share their rep's split
    assert len(by_comp[0]) == 1 and len(by_comp[100]) == 1
    # singletons still spread across all three splits
    singles = {r.split for r in rows if r.component_id == r.doc_id}
    assert singles == {"train", "val", "test"}


def test_leakage_split_fraction_validation(spark):
    import pytest as _pytest

    from minerva_etl_spark.operators.split import leakage_safe_split

    docs = spark.createDataFrame([(1,)], "doc_id bigint")
    comps = spark.createDataFrame(
        [], "doc_id bigint, component_id bigint"
    )
    with _pytest.raises(ValueError):
        leakage_safe_split(docs, comps, {"train": 0.8, "val": 0.1})


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cap_per_key_plan_two_windows_no_cartesian(spark, tmp_path):
    """The cap must stay two salted window passes — no cartesian, no
    extra exchange beyond the two window shuffles + final read."""
    rows = [(i, "k%d" % (i % 3), i * 7 % 101) for i in range(300)]
    spark.createDataFrame(rows, "id int, k string, v int").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "t"))
    df = spark.read.parquet(str(tmp_path / "t"))
    plan = _plan_of(
        cap_per_key(
            df,
            ["k"],
            [F.col("v").desc(), F.col("id").asc()],
            n=5,
            salt_col="id",
            salt_buckets=4,
        )
    )
    assert "CartesianProduct" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Window$", plan, re.M)) == 2
    assert len(re.findall(r"\(\d+\) Exchange$", plan, re.M)) <= 2
    # Spark pushes a Partial WindowGroupLimit below each exchange: only
    # the per-(key,salt) top-n survivors ever shuffle — lock that in.
    assert "row_number(), 5, Partial" in plan


def test_kmeans_plan_broadcasts_centroids(spark, tmp_path):
    """Every Lloyd's round must broadcast the K-row centroid table into
    the corpus scan — a shuffled corpus x centroid join would be the
    100 TB mistake."""
    rows = [(i, [float(i % 5), float(i % 3)]) for i in range(100)]
    spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "e"))
    emb = spark.read.parquet(str(tmp_path / "e"))
    assigned, _ = kmeans_fit(emb, k=3, iters=1)
    plan = _plan_of(assigned)
    assert "BroadcastNestedLoopJoin" in plan  # broadcast, by hint
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_tfidf_plan_broadcasts_doc_count(spark, tmp_path):
    """The one-row document-count side of TF-IDF must broadcast; the
    tf x df equi-join may shuffle (AQE skew-splits hot terms)."""
    rows = [(i, "alpha beta gamma delta word%d" % (i % 9)) for i in range(200)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "d"))
    docs = spark.read.parquet(str(tmp_path / "d"))
    plan = _plan_of(tfidf_top_terms(docs, n=3))
    assert "BroadcastNestedLoopJoin" in plan  # the one-row count
    assert "CartesianProduct" not in plan


def test_cosine_zero_vector_is_null_not_crash(spark):
    """ANSI mode turns double/0 into a hard error — a single all-zero
    embedding must not kill a 100 TB scoring job.  nullif makes the
    cosine NULL: ranks last, fails every threshold, crashes nothing."""
    from minerva_etl_spark.operators.similarity import brute_force_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.8, 0.2])],
        "vec_id int, embedding array<double>",
    )
    rows = brute_force_topk(emb, [1.0, 0.0], k=3).collect()
    assert [r.vec_id for r in rows] == [1, 3, 2]
    assert rows[-1].cosine is None


def test_semantic_dedup_trained_end_to_end(spark):
    """Trained SemDeDup: two tight blobs, near-identical members inside
    each blob — the composition must cluster, then keep exactly the
    lowest-id member of each ε-ball."""
    from minerva_etl_spark.operators.kmeans import semantic_dedup_trained

    rows = []
    for i in range(10):
        base = [1.0, 0.001 * i] if i % 2 == 0 else [0.001 * i, 1.0]
        rows.append((i, base))
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    out = {r.vec_id: r for r in
           semantic_dedup_trained(emb, k=2, iters=2, threshold=0.99).collect()}
    assert len(out) == 10
    # blob members share a cluster; only the lowest id of each survives
    assert out[0].kept and out[1].kept
    for i in range(2, 10):
        assert not out[i].kept, i
        assert out[i].centroid_id == out[i % 2].centroid_id


def test_bpe_train_textbook_merges(spark):
    """The classic low/lower/newest corpus: merges come out in the
    textbook order and the vocabulary reaches whole-word symbols."""
    from minerva_etl_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, vocab = bpe_train(docs, n_merges=6, min_count=2)
    rows = [(r["rank"], r["left"], r["right"], r.pair_count)
            for r in merges.collect()]
    assert rows == [
        (0, "l_", "o_", 6),
        (1, "n_", "e_", 5),
        (2, "lo_", "w</w>_", 4),
        (3, "w_", "e_", 4),
        (4, "ne_", "w</w>_", 3),
        (5, "lo_", "we_", 2),
    ]
    syms = {r.word: r.sym for r in vocab.collect()}
    assert syms["low"] == " low</w>_"          # fully merged word
    assert syms["lowest"] == " lowe_ s_ t</w>_"


def test_bpe_train_min_count_stops(spark):
    """Training stops when the best pair drops below min_count — no
    padding merges are emitted."""
    from minerva_etl_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "ab ab xy")], "doc_id bigint, text string"
    )
    merges, _ = bpe_train(docs, n_merges=10, min_count=2)
    rows = merges.collect()
    # only 'a b</w>' repeats (2x); everything after is < min_count
    assert len(rows) == 1
    assert (rows[0]["left"], rows[0]["right"]) == ("a_", "b</w>_")


def test_bpe_encode_counts_hand_computed(spark):
    """After the low/lower merges, 'low' is one token and 'lowest' is
    three; per-doc totals follow."""
    from minerva_etl_spark.operators.bpe import bpe_encode_counts, bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    rows = {r.doc_id: r for r in bpe_encode_counts(docs, merges).collect()}
    # doc1: low(1) lower(2: lowe_ r</w>) lowest(3) low(1) low(1) = 8
    assert (rows[1].n_words, rows[1].n_bpe_tokens) == (5, 8)
    # doc2: new(1) newer(3: ne_ we_ r</w>) newest(4) new(1) = 9
    assert (rows[2].n_words, rows[2].n_bpe_tokens) == (4, 9)
    assert (rows[3].n_words, rows[3].n_bpe_tokens) == (2, 2)


def test_bpe_encode_ids_hand_computed(spark):
    """Token-id arrays under the deterministic id scheme: base symbols
    0..B-1 lexicographic, merge rank r gets B+r.  For the textbook
    corpus B=9 (e_ l_ n_ o_ r</w>_ s_ t</w>_ w</w>_ w_ — note
    'w</w>_' < 'w_' because '<' < '_' in ASCII), so the 6 merges take
    ids 9..14."""
    from minerva_etl_spark.operators.bpe import bpe_encode_ids, bpe_train

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"),
         (2, "new newer newest new"),
         (3, "low new")],
        "doc_id bigint, text string",
    )
    merges, _ = bpe_train(docs, n_merges=6, min_count=2)
    rows = {r.doc_id: r for r in bpe_encode_ids(docs, merges).collect()}
    # low=[11] lower=[14,4] lowest=[14,5,6] new=[13] newer=[10,12,4]
    # newest=[10,12,5,6]
    assert list(rows[1].token_ids) == [11, 14, 4, 14, 5, 6, 11, 11]
    assert list(rows[2].token_ids) == [13, 10, 12, 4, 10, 12, 5, 6, 13]
    assert list(rows[3].token_ids) == [11, 13]
    for r in rows.values():
        assert r.n_bpe_tokens == len(r.token_ids)


def test_bpe_encode_no_merges_is_char_count(spark):
    from minerva_etl_spark.operators.bpe import bpe_encode_counts

    docs = spark.createDataFrame(
        [(1, "ab xyz")], "doc_id bigint, text string"
    )
    empty = spark.createDataFrame(
        [], "rank int, left string, right string, pair_count bigint"
    )
    r = bpe_encode_counts(docs, empty).collect()[0]
    assert (r.n_words, r.n_bpe_tokens) == (2, 5)


def test_logreg_train_learns_separable_signal(spark):
    """A perfectly separable 1-feature problem: GD pushes the feature
    weight positive; the fit is deterministic under repartitioning."""
    from minerva_etl_spark.operators.logreg import logreg_train

    rows = [(i, float(i % 2), i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, x double, y int")
    w1 = logreg_train(df.repartition(7), ["x"], "y", iters=20, lr=1.0)
    w2 = logreg_train(df.repartition(3), ["x"], "y", iters=20, lr=1.0)
    assert w1 == w2                    # exact: grid-snapped BIGINT sums
    assert w1[1] > 1.0                 # feature drives the label
    # the fitted model separates the classes
    import math

    def p(x):
        return 1 / (1 + math.exp(-(w1[0] + w1[1] * x)))

    assert p(1.0) > 0.5 > p(0.0)


def test_binary_metrics_hand_computed(spark):
    """AUC/accuracy against hand-computed Mann-Whitney with ties."""
    from minerva_etl_spark.operators.logreg import binary_metrics

    # scores: pos at .9, .7, .5; neg at .7, .3  ->
    # pairs: (.9 beats both)=2, (.7 ties .7 / beats .3)=1.5, (.5 loses
    # .7 / beats .3)=1 -> U = 4.5 of 6 -> AUC .75
    df = spark.createDataFrame(
        [(0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0)],
        "score double, y int",
    )
    r = binary_metrics(df, "score", "y").collect()[0]
    assert r.auc == 0.75
    # predictions at .5: pos .9/.7/.5 correct (3); neg .7 wrong, .3
    # correct (1) -> 4/5
    assert r.accuracy == 0.8
    assert (r.n_pos, r.n_neg) == (3, 2)


def test_binary_metrics_single_class_no_crash(spark):
    """All-positive input: AUC is undefined (NULL), not an ANSI
    divide-by-zero crash; accuracy still reports."""
    from minerva_etl_spark.operators.logreg import binary_metrics

    df = spark.createDataFrame(
        [(0.9, 1), (0.2, 1)], "score double, y int"
    )
    r = binary_metrics(df, "score", "y").collect()[0]
    assert r.auc is None
    assert r.accuracy == 0.5
    assert (r.n_pos, r.n_neg) == (2, 0)


def test_logreg_train_empty_corpus(spark):
    from minerva_etl_spark.operators.logreg import logreg_train

    df = spark.createDataFrame([], "x double, y int")
    assert logreg_train(df, ["x"], "y", iters=3) == [0.0, 0.0]


def test_cap_per_key_non_total_order_is_made_deterministic(spark):
    """A caller passing a NON-total ordering (no unique tiebreak) gets
    deterministic survivors anyway: cap_per_key appends salt_col asc
    as the final tiebreak, so the result equals the single-window
    formulation under (order, salt_col)."""
    rows = [(i, "a", i % 3) for i in range(60)]  # heavy ties in v
    df = spark.createDataFrame(rows, "id int, k string, v int").repartition(5)
    capped = cap_per_key(
        df, keys=["k"], order_by=[F.col("v").desc()], n=4,
        salt_col="id", salt_buckets=4,
    )
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("id").asc())
    direct = (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
    )
    got = {(r.k, r.rank): r.id for r in capped.collect()}
    want = {(r.k, r.rank): r.id for r in direct.collect()}
    assert got == want


def test_semantic_decontamination_plan_broadcasts_benchmark(spark, tmp_path):
    """The benchmark side must broadcast into the corpus bucket join —
    a shuffled or cross corpus x benchmark join would be the 100 TB
    mistake; the bucket key keeps it an equi-join."""
    from minerva_etl_spark.operators.similarity import (
        semantic_decontamination,
    )

    rows = [(i, [float((i % 7) - 3), float(i % 5)] + [0.0] * 6)
            for i in range(120)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "e"))
    emb = spark.read.parquet(str(tmp_path / "e"))
    plan = _plan_of(
        semantic_decontamination(
            emb.filter("vec_id % 10 != 0"),
            emb.filter("vec_id % 10 = 0"),
            threshold=0.5,
        )
    )
    assert "BroadcastHashJoin" in plan  # bucket equi-join, bench side
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_increment_plan_no_cross_join(spark, tmp_path):
    """The delta-vs-history rescore must stay a bucket equi-join —
    never a cross join, never a nested loop."""
    from minerva_etl_spark.operators.incremental import (
        build_embedding_state,
        embedding_increment,
    )

    rows = [(i, [float((i % 7) - 3), float(i % 5)] + [0.0] * 6)
            for i in range(120)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "e"))
    emb = spark.read.parquet(str(tmp_path / "e"))
    hist = build_embedding_state(emb.filter("vec_id % 4 < 3"))
    delta = build_embedding_state(emb.filter("vec_id % 4 = 3"))
    plan = _plan_of(embedding_increment(delta, hist, threshold=0.5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
