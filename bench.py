"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"sf": ..., "n_queries": N, "queries": {<worst 3>}, "detail": path}.

The FULL per-query map goes to BENCH_DETAIL.json next to this file —
the stdout line must stay small enough to survive the driver's tail
window (round 8 lesson: an 80-row inline map outgrew it and the round
recorded "parsed": null).

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 2) and the MIN is
reported — single-run numbers at toy scale are dominated by JIT/codegen
warmup and GC noise, which made round-over-round deltas unreadable.

A frozen 24-row CANARY subset (the round-1 BASELINE.md table) is
measured FIRST — fixed session position, fresh JVM — and reported as
`canary_total`: that number, not the growing suite total, is the
round-over-round regression comparable (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Frozen canary (r10, the r9 verdict's ask 3): the 24 rows of the
# round-1 BASELINE.md table that still exist, measured FIRST — i.e. at
# a fixed position in a fresh session, before the 90+-row suite
# accumulates JVM/GC state.  `canary_total` in the output JSON is the
# round-over-round comparable; the full-suite total keeps drifting
# with suite size and session position (r4/r8/r9 all re-litigated
# "1.2x but it's session noise" — this kills that argument).  DO NOT
# edit this list: its value is that it never changes.
CANARY = [
    "trend_time_agg_1h",
    "trend_time_agg_1d_rollup",
    "trend_time_agg_1month",
    "entity_agg_nation_1month",
    "kpi_revenue",
    "upsert_last_wins",
    "attr_compact",
    "attr_curr",
    "package_merge",
    "anti_join_no_orders",
    "report_stats",
    "series_fill_hours",
    "asof_join",
    "sessionize",
    "sim_topk",
    "sim_knn_join",
    "sim_ann_lsh",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "pricing_summary",
    "shipping_priority",
    "rollup_report",
]

HEADLINE = [
    "trend_time_agg_1h",
    "trend_time_agg_1d_rollup",
    "trend_time_agg_1month",
    "entity_agg_nation_1month",
    "kpi_revenue",
    "upsert_last_wins",
    "attr_compact",
    "attr_curr",
    "package_merge",
    "anti_join_no_orders",
    "report_stats",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_profile",
    "dedup_components",
    "sample_stratified",
    "shard_pack",
    "sim_topk",
    "sim_knn_join",
    "entity_resolution",
    "relation_regex",
    "trigger_eval",
    "type_deduction",
    "sim_ann_lsh",
    "multimodal_features",
    "asof_join",
    "sessionize",
    "moving_window",
    "pivot_events",
    "rollup_report",
    "dedup_embedding",
    "dedup_ngram_jaccard",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "quantiles",
    "trend_time_agg_1d_dst",
    "trend_time_agg_3month",
    "trend_slope",
    "series_fill_hours",
    "dedup_simhash_hamming",
    "sim_ivf",
    "source_mix",
    "shard_pack_shuffled",
    "curated_export",
    "boilerplate_strip",
    "dedup_canonical",
    "quality_filter",
    "lm_perplexity",
    "semantic_dedup",
    "dsir_select",
    "dedup_segments",
    "chunk_sequences",
    "corpus_report",
    "pipeline_curate",
    "gopher_rules",
    # round-12: C4 line/page cleaning (one codegen scan-project)
    "c4_rules",
    "live_monitor",
    "kmeans_fit",
    "domain_cap",
    "tfidf_terms",
    "leakage_split",
    "semantic_dedup_trained",
    "pipeline_curate_bp",
    "pack_sequences",
    "bpe_train",
    "bpe_encode",
    # round-12: unigram-LM tokenizer (hard-EM Viterbi train + encode
    # over the distinct-word table — the train IS the story, as with
    # bpe_train)
    "unigram_encode",
    # r13: byte-fallback roundtrip (q-stripped retrain + penalty
    # lattice + decode) — times the full contract, not just encode
    "unigram_encode_bf",
    "logreg_train",
    "logreg_eval",
    # round-8 rows
    "bpe_encode_ids",
    "pack_token_ids",
    "incremental_dedup",
    "sim_ivf_join",
    "wav_features",
    "png_features",
    "avi_features",
    # round-9 rows
    "jpeg_features",
    "incremental_embedding",
    "semantic_decontamination",
    "embed_text_hashed",
    "gif_features",
    "wav_g711_features",
    # round-14: IMA-ADPCM decode (stateful 89-step machine; oracle
    # replays it via DuckDB list_reduce)
    "wav_adpcm_features",
    "wav_spectral",
    "image_features_mixed",
    # round-14: MJPEG-in-AVI — compressed video via the per-frame
    # baseline-JPEG chain (fixture staged outside the clock)
    "video_features_mjpeg",
    # round-14: baseline TIFF (IFD walk both byte orders, PackBits,
    # multi-strip/multi-page; fixture staged outside the clock)
    "tiff_features",
    # round-14: BMP/DIB (24-bit both row orders, palette, RLE8)
    "bmp_features",
    # round-14: JPEG-in-TIFF (per-strip baseline JPEG inside the
    # IFD walk)
    "tiff_jpeg_features",
    "exif_scan",
    "warc_harvest",
    "wet_harvest",
    "wat_harvest",
    "cdx_harvest",
    "cdx_recrawl",
    "html_extract",
    "url_profile",
    "charset_decode",
    "robots_filter",
    "sitemap_urls",
    "pipeline_crawl",
    # round-10 rows
    "frontier_build",
    "sim_ivf_query",
    # round-11: quantized-state retrieval (state prebuilt outside the
    # clock like sim_ivf_query — the row times integer-qcos candidate
    # rank + exact rescore).  sim_ivf_pq_increment is deliberately
    # NOT here (the sim_ivf_incremental rule: it refits Lloyd's
    # in-row; the increment path's join shape is timed by sim_ivf_pq
    # and the append by incremental_embedding).
    "sim_ivf_pq",
    # round-12: trained-PQ retrieval (state prebuilt outside the clock
    # like sim_ivf_pq — the row times the ADC LUT fold over m-byte
    # codes + exact rescore, the IVFADC serving path)
    "sim_ivf_tpq",
    # round-12: corpus-scale exact substring dedup (sorted-shingle
    # digest groupBy + per-doc coverage rebuild — the Lee et al. rule)
    "dedup_substring",
    # round-12: the substring rule's delivery protocol (digest-keyed
    # history join, state build is part of the story — the
    # frontier_increment rule)
    "dedup_substring_increment",
    # round-14: the bucketBy(64, digest) state variant — the
    # exchange-free history join (state build + one delivery, same
    # story shape as the plain row)
    "dedup_substring_increment_bucketed",
    # round-11: ratio-margin bitext mining (pure Catalyst: broadcast
    # product -> decimal top-k sums -> margin windows)
    "bitext_mine",
    # round-12: the corpus×corpus hand-off — ivf_join candidates
    # feeding the same margin engine (candidate graph, never the
    # bipartite product; kmeans fit is part of the story)
    "bitext_mine_ann",
    # round-11: WebDataset shard export/import round trip (one task
    # per tar shard, both directions — the multimodal hand-off edge)
    "wds_roundtrip",
    # round-11: semantic (in-context) packing — kmeans fit + affinity
    # order + the prefix-sum pack (the fit is the story, as with
    # semantic_dedup_trained)
    "pack_semantic",
    # round-11: CCNet head/middle/tail via the skew-safe exact NTILE
    "ccnet_buckets",
    # round-11: unicode script histogram — one codegen projection
    "script_profile",
    # r10 document-ingest edge: PDF codec, archive round trip, feeds,
    # the fused archives->PDF->filter pipeline, and the two-poll
    # frontier state cycle (state build is part of the story here —
    # each poll is one delivery, unlike sim_ivf's amortized fit)
    "pdf_extract",
    # round-12: OOXML office-document extraction (stdlib zip +
    # WordprocessingML walk inside Arrow mapInPandas; fixture staged
    # outside the clock like the other media rows)
    "docx_extract",
    # round-12: EPUB container walk (spine-ordered XHTML chapters
    # through the one HTML extractor; fixture staged outside the clock)
    "epub_extract",
    # round-12: mixed-format dispatch over all three document codecs
    "office_extract",
    "odf_extract",
    "xlsb_extract",
    # r15: default-password decryption — Standard/Agile AES +
    # BIFF8 RC4 verify+decrypt per payload (fixtures staged
    # outside the clock like every media row)
    "office_decrypt_default",
    "xls_decrypt_velvet",
    # r16: CryptoAPI RC4 (xls/doc, 40-bit), XOR Method 1, and
    # Office-2010 agile parameters + locked census leg
    "office_decrypt_cryptoapi",
    # r16: supplied-password ODF (PBKDF2 + Blowfish-CFB8 / AES-CBC)
    "odf_decrypt_password",
    "format_census",
    # round-14: provenance census — three container parsers, no
    # content extraction
    "office_metadata",
    "xlsx_extract",
    "pptx_extract",
    "doc_extract",
    "xls_extract",
    "ppt_extract",
    "msg_extract",
    "mail_extract",
    # round-12: the fused archives -> dispatch -> codecs -> filter
    # lineage (the pipeline_document shape over the r12 edges)
    "pipeline_office",
    # round-12: mail-corpus edge (MIME walk + mbox split; fixtures
    # staged outside the clock)
    "eml_extract",
    "mbox_extract",
    # round-14: MIME attachment explode -> office dispatch (fixture
    # staged outside the clock)
    "mail_attachment_extract",
    # round-12: RTF group-stack tokenizer
    "rtf_extract",
    # round-12: exact-integer PageRank (3 damped rounds, edge join +
    # combinable groupBy per round)
    "pagerank_crawl",
    # round-12: deterministic corpus sketches (KMV top-k scan, HLL
    # combinable registers, count-min cells + broadcast point query)
    "sketch_kmv",
    "sketch_hll",
    "sketch_cm",
    # round-12: ES weighted sampling (key projection + salted top-n)
    "weighted_sample",
    # round-14: incremental crawl index (bucketed capture state;
    # build + one delivery is the story, the frontier_increment rule)
    "cdx_index_increment",
    # round-14: web-graph edges from WAT Links (codegen explode +
    # URL resolution + host aggregation)
    "wat_link_graph",
    # round-14: the fused WAT -> links -> host graph -> PageRank
    # composition
    "pipeline_webgraph",
    "archive_harvest",
    "feed_entries",
    "pipeline_document",
    "frontier_increment",
    "fetch_schedule",
    "chat_curate",
    "markup_extract",
    "preference_pairs",
    "decontamination_bloom",
    "code_profile",
    "code_dedup",
    "code_fim",
    "image_dedup_dhash",
    "token_budget_select",
    "audio_dedup_fingerprint",
    "video_dedup_dhash",
    "code_secrets",
    # incremental_image_dedup IS benched (the frontier_increment rule:
    # each poll is one delivery — state build is the operator, unlike
    # sim_ivf where the fit amortizes outside the clock)
    "incremental_image_dedup",
    "incremental_video_dedup",
    # bpe_roundtrip / bpe_roundtrip_bf are deliberately NOT here
    # (the sim_ivf_incremental rule): their gate rows retrain 12
    # merges in-row, so benching them times the training harness
    # again — encode is already timed by bpe_encode_ids, and decode
    # is two joins + one fold.
    # engine write paths: CSV ingest -> upsert -> read-back, and the
    # fingerprint materialization loop (sf-dependent ingest volume)
    "lifecycle_load_store",
    "lifecycle_materialize",
    "lifecycle_array_trend",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from minerva_etl_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="minerva_etl_spark_bench")
    qs = entry_mod.queries()

    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))

    # r13 (the r12 verdict's ask 5): per-query SAMPLES are recorded
    # and BENCH_DETAIL carries {median, min, max} per query, so a
    # single-session scheduler hiccup (r12's 0.39->1.95s
    # type_deduction "regression" on unchanged code) is readable as
    # spread instead of re-litigated as a regression.  `value` stays
    # the MIN for continuity with twelve rounds of history.
    samples: dict[str, list[float]] = {}

    def _median(xs: list[float]) -> float:
        ys = sorted(xs)
        n = len(ys)
        mid = n // 2
        return ys[mid] if n % 2 else (ys[mid - 1] + ys[mid]) / 2.0

    def measure(name: str, n_runs: int | None = None) -> float:
        fn = qs[name]
        best = None
        samples[name] = []
        for _ in range(n_runs or runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop sink: forces FULL evaluation of every column and
            # join.  A count() here lets Catalyst eliminate unique-key
            # left joins and prune all projections — projection-heavy
            # queries then time the parquet row count, not the operator
            # (measured: lm_perplexity at x16 "ran" in 0.3 s via count
            # while computing nothing).
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples[name].append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        return best

    # canary first: fixed session position, fresh JVM (see CANARY).
    # 3+ runs so the canary MEDIAN — the round-over-round comparable
    # quoted in close-outs — is a real median, not a mean-of-two.
    canary_runs = max(runs, 3)
    canary_timings: dict[str, float] = {}
    for name in CANARY:
        canary_timings[name] = round(measure(name, canary_runs), 3)
        print(
            f"# canary {name}: {canary_timings[name]:.2f}s",
            file=sys.stderr,
        )
    canary_total = round(sum(canary_timings.values()), 3)

    # sim_ivf_query times the RETRIEVAL join against prebuilt state —
    # build the state (deterministic, disk-cached) outside the clock
    from minerva_etl_spark import gate as _gate

    _gate._ivf_prebuilt_state(spark, sf_dir)
    _gate._ivf_pq_prebuilt_state(spark, sf_dir)

    # media fixtures staged outside the clock too (r10 verdict ask 3):
    # constructing each query once triggers _media_fixture_staged's
    # one-time synthesis->parquet write, so the timed runs below see
    # only the operator (decode + band join), never fixture synthesis.
    for _row in ("audio_dedup_fingerprint", "video_dedup_dhash",
                 "jpeg_features", "pdf_extract", "docx_extract",
                 "epub_extract", "office_extract", "eml_extract",
                 "mbox_extract", "rtf_extract", "xlsx_extract",
                 "pptx_extract", "doc_extract", "xls_extract",
                 "ppt_extract", "msg_extract", "mail_extract",
                 "exif_scan", "format_census",
                 "video_features_mjpeg", "tiff_features",
                 "tiff_jpeg_features", "office_metadata",
                 "office_decrypt_default", "xls_decrypt_velvet",
                 "office_decrypt_cryptoapi", "odf_decrypt_password",
                 "odf_extract", "xlsb_extract",
                 "mail_attachment_extract",
                 # r16: the incremental media rows now stage their
                 # delivery payloads through _media_fixture_staged
                 # like every other media row — construct once here so
                 # the timed runs see only decode + increment
                 "incremental_image_dedup", "incremental_video_dedup",
                 # r16: the last unstaged media synth rows converted
                 # to _media_fixture_staged (same ask-3 rule)
                 "image_dedup_dhash", "wav_features",
                 "wav_g711_features", "wav_spectral", "gif_features",
                 "png_features", "avi_features", "image_features_mixed",
                 "wav_adpcm_features", "bmp_features"):
        qs[_row](spark, sf_dir)

    # Known-bounded window note (r10 verdict ask 8): any
    # 'WindowExec: No Partition Defined' warnings in this log come
    # from binary_metrics' cumulative AUC window (operators/
    # logreg.py, DISTINCT rounded scores <= 2e6 rows), the BPE
    # base-vocab ranking (operators/bpe.py, alphabet-sized input),
    # the unigram vocab seed/id ranks (operators/unigram.py, vocab
    # bounded by max_vocab), and the KMV sketch position rank
    # (operators/sketch.py, k rows after TakeOrdered) — all
    # single-partition over DOMAIN-BOUNDED inputs by design;
    # not a scale risk, do not re-investigate.
    print("# note: WindowExec 'No Partition Defined' = bounded-domain"
          " windows (logreg AUC / BPE base vocab) — known, by design",
          file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(measure(name), 3)
        n = qs[name](spark, sf_dir).count()  # rows reported, not timed
        print(f"# {name}: {timings[name]:.2f}s rows={n}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    stats = {
        name: {
            "median": round(_median(xs), 3),
            "min": min(xs),
            "max": max(xs),
        }
        for name, xs in samples.items()
    }
    canary_median_total = round(
        sum(stats[n]["median"] for n in CANARY), 3
    )
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "stats": stats,
                "canary_total": canary_total,
                "canary_median_total": canary_median_total,
                "canary": canary_timings,
                "sf": sf,
                "runs": runs,
                "canary_runs": canary_runs,
            },
            fh,
            indent=1,
        )
    worst3 = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:3]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": worst3,
                "canary_total": canary_total,
                "canary_median_total": canary_median_total,
                "canary_n": len(canary_timings),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
