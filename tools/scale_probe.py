"""Scale probe: where does Spark's distributed plan overtake the
in-process oracle?

Synthesizes N× copies of the sf0.1 fixtures into /tmp (events with
shifted ids/timestamps so keys stay realistic; documents re-texted so
dedup stays non-trivial), then times the headline heavy operators on
Spark vs DuckDB at each scale.  Records the evidence behind SCALE.md's
claims.

Usage: python tools/scale_probe.py [multipliers...]  (default: 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
WORK = "/tmp/minerva_scale_probe"


def build(spark, mult: int) -> str:
    from pyspark.sql import functions as F

    out = f"{WORK}/x{mult}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    # shift each copy by its index × 1h: keys repeat, timestamps
    # interleave (realistic bucket growth).  The fixture's ts column is
    # raw int64 nanos under legacy nanosAsLong, a timestamp otherwise.
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        shifted = F.col("ts") + F.col("copy") * 3_600_000_000_000
    else:
        shifted = F.expr(
            "ts + make_interval(0, 0, 0, 0, cast(copy as int), 0, 0)"
        )
    big_ev = (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * 10_000_000).alias("event_id"),
            shifted.alias("ts"),
            (F.col("user_id") + (F.col("copy") % 4) * 10_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    big_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big_docs = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            F.when(F.col("copy") % 3 == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" v"), F.col("copy").cast("string"))
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    big_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big_emb = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
        # deterministic per-copy nudge on the first element keeps the
        # replicated vectors from being exact duplicates
        F.expr(
            "transform(embedding, (x, i) -> CAST(x AS DOUBLE) + "
            "CASE WHEN i = 0 THEN (copy % 7) * 0.001 ELSE 0.0 END)"
        ).alias("embedding"),
        "label",
    )
    big_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    open(f"{out}/_DONE", "w").write("ok")
    return out


def probe(spark, data_dir: str, mult: int) -> dict:
    from pyspark.sql import functions as F

    from minerva_etl_spark.operators import dedup as D
    from minerva_etl_spark.operators.aggregation import TrendAggSpec, time_aggregate

    results: dict[str, dict[str, float]] = {}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    ev = spark.read.parquet(f"{data_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] in ("bigint", "long"):
        ev = ev.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    docs = spark.read.parquet(f"{data_dir}/documents.parquet")

    t0 = time.time()
    n1 = time_aggregate(
        ev, "1h",
        [TrendAggSpec("value", "sum", alias="s"), TrendAggSpec("value", "avg", alias="a")],
        entity_col="user_id", timestamp_col="ts",
    ).count()
    results["time_agg_1h"] = {"spark": round(time.time() - t0, 2), "rows": n1}

    t0 = time.time()
    n2 = D.minhash_candidate_pairs(docs).count()
    results["minhash_pairs"] = {"spark": round(time.time() - t0, 2), "rows": n2}

    from minerva_etl_spark.operators.dsir import dsir_select
    from minerva_etl_spark.operators.lm import ngram_lm_score
    from minerva_etl_spark.operators.text import (
        classify_quality,
        dedup_segments_keep_first,
    )

    def timed(fn):
        # noop sink: count() would let Catalyst eliminate unique-key
        # left joins / prune projections and time nothing (see bench.py)
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    results["dedup_segments"] = {
        "spark": timed(lambda: dedup_segments_keep_first(docs))
    }
    results["dsir_select"] = {
        "spark": timed(lambda: dsir_select(docs, "lang = 'en'", k=100))
    }
    results["lm_perplexity"] = {
        "spark": timed(lambda: ngram_lm_score(docs, "lang = 'en'"))
    }
    results["quality_filter"] = {
        "spark": timed(lambda: classify_quality(docs))
    }

    from minerva_etl_spark.operators.text import remove_boilerplate_segments

    # low max_docs on a replicated corpus = a LARGE boilerplate set
    # (every segment repeats across copies): exercises the size guard's
    # distributed join path — no collected single-row array anywhere
    results["boilerplate_join_path"] = {
        "spark": timed(
            lambda: remove_boilerplate_segments(
                docs, max_docs=2, broadcast_threshold=1000
            )
        )
    }

    from minerva_etl_spark.operators.kmeans import kmeans_fit
    from minerva_etl_spark.operators.skew import cap_per_key
    from minerva_etl_spark.operators.split import leakage_safe_split
    from minerva_etl_spark.operators.text import tfidf_top_terms

    emb = spark.read.parquet(f"{data_dir}/embeddings.parquet")
    results["kmeans_fit"] = {
        "spark": timed(lambda: kmeans_fit(emb, k=8, iters=2)[0])
    }
    results["domain_cap"] = {
        "spark": timed(
            lambda: cap_per_key(
                docs,
                ["lang", "source"],
                [F.col("n_chars").desc(), F.col("doc_id").asc()],
                n=5,
                salt_col="doc_id",
                salt_buckets=8,
            )
        )
    }
    results["tfidf_terms"] = {
        "spark": timed(lambda: tfidf_top_terms(docs, n=3))
    }
    from minerva_etl_spark.operators.bpe import bpe_train
    from minerva_etl_spark.operators.logreg import logreg_train

    t0 = time.time()
    bpe_train(docs, n_merges=8, min_count=2)[0].collect()
    results["bpe_train"] = {"spark": round(time.time() - t0, 2)}
    t0 = time.time()
    logreg_train(
        docs,
        ["CAST(least(n_chars, 1000) AS DOUBLE) / 1000.0"],
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
        iters=2,
    )
    results["logreg_train"] = {"spark": round(time.time() - t0, 2)}

    results["leakage_split"] = {
        "spark": timed(
            lambda: leakage_safe_split(
                docs,
                D.connected_components(D.minhash_candidate_pairs(docs)),
                {"train": 0.9, "val": 0.05, "test": 0.05},
                seed=42,
            )
        )
    }

    from pyspark.sql import functions as PF

    from minerva_etl_spark.operators.pipeline import curate_corpus

    corpus = docs.filter(PF.expr("doc_id % 10 <> 0"))
    bench = docs.filter(PF.expr("doc_id % 10 = 0"))
    results["pipeline_curate"] = {
        "spark": timed(
            lambda: curate_corpus(
                corpus, bench, shard_tokens=5000, shuffle_seed=42,
                source_col="lang",
            )
        )
    }

    # round-8 probes ------------------------------------------------
    from minerva_etl_spark.operators.incremental import (
        build_dedup_state,
        dedup_increment,
    )

    # history signatures are PRE-PERSISTED state in real use — build
    # them outside the timer; the timed section is one delivery:
    # signature the delta + decide it against all of history
    hist_state = build_dedup_state(
        docs.filter(PF.expr("doc_id % 4 < 3"))
    ).localCheckpoint(eager=True)

    def _increment():
        delta_state = build_dedup_state(
            docs.filter(PF.expr("doc_id % 4 = 3"))
        )
        return dedup_increment(delta_state, hist_state)

    results["incremental_dedup"] = {"spark": timed(_increment)}

    from minerva_etl_spark.operators.similarity import (
        assign_centroids,
        ivf_join,
    )

    # index build (kmeans_fit) is probed above; this times the JOIN:
    # probe ranking + candidate equi-join + rescore + capped top-k.
    # IVF operating discipline: the cluster count scales ~sqrt(N) so
    # per-cluster candidate lists stay bounded — a FIXED k on a growing
    # corpus degrades toward all-pairs (measured 4.2x wall per 4x data
    # before this probe scaled k; ~linear after)
    import math as _math

    ivf_k = 8 * _math.isqrt(mult)
    _assigned8, cent8 = kmeans_fit(emb, k=ivf_k, iters=1)
    assigned8 = assign_centroids(emb, cent8).localCheckpoint(eager=True)
    queries8 = emb.filter(PF.expr("vec_id % 20 = 0")).select(
        PF.col("vec_id").alias("query_id"),
        PF.col("embedding").alias("query_vec"),
    )
    results["ivf_join"] = {
        "spark": timed(
            lambda: ivf_join(queries8, assigned8, cent8, k=10, n_probe=2)
        ),
        "ivf_k": ivf_k,
    }

    from minerva_etl_spark.operators.shard import pack_token_ids

    merges8, _v8 = bpe_train(docs, n_merges=8, min_count=2)
    merges8 = merges8.localCheckpoint(eager=True)
    results["pack_token_ids"] = {
        "spark": timed(
            lambda: pack_token_ids(
                docs, merges8, seq_len=2048, shuffle_seed=42
            )
        )
    }

    # round-8.5 probes ----------------------------------------------
    # PNG decode is shuffle-free mapInPandas — expected linear in docs
    from minerva_etl_spark.operators.multimodal import (
        png_features,
        synthesize_png,
    )

    def _png_media():
        import pandas as pd

        def synth(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    d = int(did)
                    w, h = 8 + d % 9, 6 + d % 7
                    px = bytes(
                        (d * 7 + i) % 256 for i in range(w * h * 3)
                    )
                    payloads.append(
                        synthesize_png(px, w, h, 3, [(d + y) % 5 for y in range(h)])
                    )
                yield pd.DataFrame(
                    {"media_id": pdf["doc_id"], "payload": payloads}
                )

        media = docs.select("doc_id").mapInPandas(
            synth, "media_id bigint, payload binary"
        )
        return png_features(media)

    results["png_features"] = {"spark": timed(_png_media)}

    # binary token-id export: per-task file writes, expected linear
    from minerva_etl_spark.operators.shard import write_token_ids_binary

    def _bin_export():
        import shutil
        import tempfile

        out = tempfile.mkdtemp(prefix="probe_bin_")
        t0 = time.time()
        write_token_ids_binary(
            docs, merges8, out, seq_len=2048, seqs_per_file=256,
            shuffle_seed=42, dtype="uint32",
        )
        dt = round(time.time() - t0, 2)
        shutil.rmtree(out, ignore_errors=True)
        return dt

    results["token_ids_binary"] = {"spark": _bin_export()}

    # round-9 probes ------------------------------------------------
    # JPEG decode: Huffman + IDCT per payload, shuffle-free
    # mapInPandas — expected linear in docs like PNG, with a higher
    # per-byte constant (entropy decode is bit-serial Python)
    from minerva_etl_spark.operators.jpeg import synthesize_jpeg
    from minerva_etl_spark.operators.multimodal import jpeg_features

    def _jpeg_media():
        import pandas as pd

        def synth(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    d = int(did)
                    w, h = 8 + (d % 2) * 8, 8
                    px = bytes(
                        (d * 7 + i) % 256 for i in range(w * h * 3)
                    )
                    payloads.append(synthesize_jpeg(px, w, h, quality=75))
                yield pd.DataFrame(
                    {"media_id": pdf["doc_id"], "payload": payloads}
                )

        media = docs.select("doc_id").mapInPandas(
            synth, "media_id bigint, payload binary"
        )
        return jpeg_features(media)

    results["jpeg_features"] = {"spark": timed(_jpeg_media)}

    # Incremental IVF: the headline claim is that one delivery's cost
    # is INDEPENDENT of history size (fixed delta assigned against
    # frozen broadcast centroids + one append) — so the timed section
    # is a FIXED ~2k-vector delta against the mult-scaled history
    # state, built outside the timer.  Flat wall across mults proves
    # the daily-crawl posture.
    import shutil as _sh
    import tempfile as _tmp

    from minerva_etl_spark.operators.incremental import (
        build_ivf_state,
        ivf_increment,
    )

    ivf_root = _tmp.mkdtemp(prefix="probe_ivfinc_")
    ivf_state = ivf_root + "/state"
    build_ivf_state(spark, emb, ivf_state, k=ivf_k, iters=1)
    delta_fixed = (
        emb.limit(2048)
        .select(
            (PF.col("vec_id") + PF.lit(10**12)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint(eager=True)
    )

    def _ivf_inc():
        t0 = time.time()
        ivf_increment(spark, delta_fixed, ivf_state)
        return round(time.time() - t0, 2)

    results["ivf_increment_fixed_delta"] = {
        "spark": _ivf_inc(),
        "history_n": emb.count(),
    }
    _sh.rmtree(ivf_root, ignore_errors=True)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{data_dir}/events.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{data_dir}/documents.parquet/*.parquet'"
    )
    ts_kind = con.execute("SELECT typeof(ts) FROM events LIMIT 1").fetchone()[0]
    if ts_kind in ("BIGINT", "HUGEINT"):
        bucket = (
            "make_timestamp((((ts // 1000) + 3599999999)"
            " // 3600000000) * 3600000000)"
        )
    else:
        bucket = (
            "time_bucket(INTERVAL 1 HOUR, ts)"
            " + CASE WHEN date_trunc('hour', ts) = ts"
            " THEN INTERVAL 0 HOUR ELSE INTERVAL 1 HOUR END"
        )
    t0 = time.time()
    con.execute(
        f"""
        SELECT user_id, {bucket} AS b,
               CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE)
        FROM events GROUP BY 1, 2
        """
    ).fetchall()
    results["time_agg_1h"]["duckdb"] = round(time.time() - t0, 2)

    from minerva_etl_spark.operators.dedup import minhash_pairs_oracle_sql

    t0 = time.time()
    con.execute(minhash_pairs_oracle_sql("documents")).fetchall()
    results["minhash_pairs"]["duckdb"] = round(time.time() - t0, 2)

    from minerva_etl_spark.operators.lm import ngram_lm_oracle_sql
    from minerva_etl_spark.operators.text import dedup_segments_oracle_sql

    t0 = time.time()
    con.execute(dedup_segments_oracle_sql("documents")).fetchall()
    results["dedup_segments"]["duckdb"] = round(time.time() - t0, 2)
    t0 = time.time()
    con.execute(ngram_lm_oracle_sql("documents", "lang = 'en'")).fetchall()
    results["lm_perplexity"]["duckdb"] = round(time.time() - t0, 2)
    con.close()

    return results


def main() -> None:
    mults = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    # x16+ needs headroom beyond the library's 8g default (measured OOM
    # at 1g; clean at 16g); respect an explicit caller override
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    for mult in mults:
        data_dir = build(spark, mult)
        res = probe(spark, data_dir, mult)
        print(f"x{mult}: {res}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
