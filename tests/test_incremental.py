"""Incremental dedup: persisted signature state + delta deliveries.

The curation twin of the trend side's modified-log/fingerprint
protocol (`materialize/fingerprint.py`): decisions about a new
delivery must equal a full recompute over history ∪ delta, without
ever re-reading history text.
"""

import os

import pytest


@pytest.fixture()
def corpus(spark):
    base = " ".join(f"shared w{i} token" for i in range(12))
    rows = [
        (1, base + " ending today"),
        (2, base + " ending today"),
        (3, "completely different content about distributed query engines"),
        (4, base + " ending tomorrow"),
        (5, "an unrelated document describing parquet column encodings"),
        # delivery 2
        (6, base + " ending today"),
        (7, "fresh unseen text that matches nothing else in the corpus"),
        (8, "an unrelated document describing parquet column encodings"),
        (9, "fresh unseen text that matches nothing else in the corpus"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_two_delivery_increment_equals_full_recompute(spark, corpus, tmp_path):
    """Delivery 2's incremental decisions == what a single full-corpus
    pass says about the same docs (exact digests AND banded near-dups),
    including duplicate-of-a-DROPPED-doc resolution to the global min
    id — the property that forces the state to keep dropped docs'
    signatures."""
    from minerva_etl_spark.operators.incremental import (
        build_dedup_state,
        dedup_increment,
        ingest_increment,
    )

    state_path = str(tmp_path / "state")
    d1 = corpus.filter("doc_id <= 5")
    d2 = corpus.filter("doc_id > 5")
    ingest_increment(spark, d1, state_path)
    got = {
        r.doc_id: (r.exact_dup_of, r.near_dup_of, r.keep)
        for r in ingest_increment(spark, d2, state_path).collect()
    }
    # full recompute: everything as one delta against empty history
    all_state = build_dedup_state(corpus)
    empty = spark.createDataFrame([], all_state.schema)
    full = {
        r.doc_id: (r.exact_dup_of, r.near_dup_of, r.keep)
        for r in dedup_increment(all_state, empty).collect()
        if r.doc_id > 5
    }
    assert got == full
    # spot-checks: 6 is an exact dup of 1 (not of dropped 2 — min id
    # wins); 8 dups 5; 7 is new on arrival; 9 dups 7 within-delivery
    assert got[6][0] == 1 and not got[6][2]
    assert got[8][0] == 5 and not got[8][2]
    assert got[7][2] is True
    assert got[9][0] == 7 and not got[9][2]


def test_bootstrap_delivery_dedups_within_itself(spark, corpus, tmp_path):
    """Delivery 1 against an empty state still dedups inside the
    delivery: doc 2 resolves to doc 1, near-dup 4 resolves to 1."""
    from minerva_etl_spark.operators.incremental import ingest_increment

    state_path = str(tmp_path / "state")
    out = {
        r.doc_id: r
        for r in ingest_increment(
            spark, corpus.filter("doc_id <= 5"), state_path
        ).collect()
    }
    assert out[1].keep and out[3].keep and out[5].keep
    assert out[2].exact_dup_of == 1
    assert out[4].exact_dup_of is None  # one word differs
    assert out[4].near_dup_of == 1      # ...but near-dups doc 1
    assert not out[4].keep


def test_state_grows_by_delivery_and_lease_released(spark, corpus, tmp_path):
    """The state holds one signature row per EVER-ingested doc (kept
    and dropped), appended per delivery; the append lease is released
    afterwards."""
    from minerva_etl_spark.operators.incremental import (
        ingest_increment,
        read_dedup_state,
    )

    state_path = str(tmp_path / "state")
    ingest_increment(spark, corpus.filter("doc_id <= 5"), state_path)
    assert read_dedup_state(spark, state_path).count() == 5
    ingest_increment(spark, corpus.filter("doc_id > 5"), state_path)
    state = read_dedup_state(spark, state_path)
    assert state.count() == 9
    assert state.select("doc_id").distinct().count() == 9
    assert not os.path.exists(state_path + ".__lease")


def test_missing_state_raises(spark, tmp_path):
    from minerva_etl_spark.operators.incremental import read_dedup_state

    with pytest.raises(FileNotFoundError):
        read_dedup_state(spark, str(tmp_path / "nope"))


def test_embedding_increment_two_deliveries(spark, tmp_path):
    """The vector twin of the text protocol: delivery 2 is decided
    against persisted history state only (bucket + norm + vector, no
    re-scoring of history-vs-history), and a delta vector whose ONLY
    near neighbor was DROPPED in delivery 1 still resolves — the state
    keeps every ingested vector, kept and dropped alike."""
    from minerva_etl_spark.operators.incremental import (
        ingest_embedding_increment,
    )

    pad = [0.0] * 6
    a = [1.0, 0.0] + pad          # kept (first seen)
    b = [0.95, 0.31] + pad        # cos(a,b) ~ 0.95 -> dropped, dup of a
    c = [0.81, 0.59] + pad        # cos(b,c) ~ 0.95, cos(a,c) ~ 0.81
    d = [0.0, 1.0] + pad          # cos vs a/b/c <= 0.59 -> kept
    state = str(tmp_path / "emb_state")

    ddl = "vec_id bigint, embedding array<double>"
    dec1 = {
        r.vec_id: r
        for r in ingest_embedding_increment(
            spark, spark.createDataFrame([(1, a)], ddl), state,
            threshold=0.9,
        ).collect()
    }
    assert dec1[1].keep and dec1[1].near_dup_of is None  # bootstrap

    dec2 = {
        r.vec_id: r
        for r in ingest_embedding_increment(
            spark, spark.createDataFrame([(2, b)], ddl), state,
            threshold=0.9,
        ).collect()
    }
    assert not dec2[2].keep and dec2[2].near_dup_of == 1  # b dropped

    dec3 = {
        r.vec_id: r
        for r in ingest_embedding_increment(
            spark, spark.createDataFrame([(3, c), (4, d)], ddl), state,
            threshold=0.9,
        ).collect()
    }
    # c's ONLY >=0.9 neighbor is b, which was DROPPED in delivery 2 —
    # it must still resolve, because the state keeps dropped vectors
    assert not dec3[3].keep and dec3[3].near_dup_of == 2
    assert dec3[4].keep and dec3[4].near_dup_of is None


def test_ivf_incremental_three_deliveries(spark, tmp_path):
    """Incremental IVF: two increments land against the frozen
    centroids, the persisted assignment equals a fresh full
    assign_centroids at those centroids (delta-assign == recompute at
    fixed centroids), state queries retrieve across ALL deliveries,
    and the recluster trigger flips once the corpus has grown past the
    factor."""
    from minerva_etl_spark.operators.incremental import (
        build_ivf_state,
        ivf_increment,
        ivf_needs_recluster,
        ivf_state_query,
    )
    from minerva_etl_spark.operators.similarity import assign_centroids

    ddl = "vec_id bigint, embedding array<double>"

    def vec(i: int) -> list:
        # three well-separated directions + a per-id wiggle
        base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]][i % 3]
        return [v + 0.01 * ((i * 7) % 5) for v in base] + [0.0] * 5

    all_rows = [(i, vec(i)) for i in range(24)]
    d1 = spark.createDataFrame(all_rows[:12], ddl)
    d2 = spark.createDataFrame(all_rows[12:18], ddl)
    d3 = spark.createDataFrame(all_rows[18:], ddl)
    state = str(tmp_path / "ivf_state")

    build_ivf_state(spark, d1, state, k=3, iters=2)
    a2 = ivf_increment(spark, d2, state)
    assert a2.count() == 6
    a3 = ivf_increment(spark, d3, state)
    assert a3.count() == 6

    # persisted assignment == fresh full assignment at the frozen
    # centroids, for every delivery's rows
    cent = spark.read.parquet(state + "/centroids")
    full = spark.createDataFrame(all_rows, ddl)
    want = {
        (r.vec_id, r.centroid_id)
        for r in assign_centroids(full, cent).collect()
    }
    got = {
        (r.vec_id, r.centroid_id)
        for r in spark.read.parquet(state + "/assigned").collect()
    }
    assert got == want

    # retrieval sees all three deliveries: vector 23's direction-mates
    # include ids from every delivery
    q = spark.createDataFrame(
        [(99, vec(23))], "query_id bigint, query_vec array<double>"
    )
    hits = {
        r.vec_id
        for r in ivf_state_query(spark, q, state, k=24, n_probe=1)
        .collect()
    }
    assert hits & {2, 5, 8, 11} and hits & {14, 17} and hits & {20, 23}

    # recluster trigger: 24 vectors vs 12 at fit = 2.0x
    assert not ivf_needs_recluster(spark, state, recluster_factor=4.0)
    assert ivf_needs_recluster(spark, state, recluster_factor=2.0)
    # no lease left behind
    import os

    assert not os.path.exists(state + ".__lease")
