"""Shared gate helpers: session prep, sanitizers, staged fixtures, cross-arc corpus builders.

Mechanically split out of gate.py (r14); see gate.py for the registry.
"""
from __future__ import annotations



from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from minerva_etl_spark.catalog import directory
from minerva_etl_spark.catalog.granularity import Granularity
from minerva_etl_spark.operators import asof
from minerva_etl_spark.operators import dedup as D
from minerva_etl_spark.operators import multimodal as M
from minerva_etl_spark.plans.sqltranslate import translate
from minerva_etl_spark.trigger import trigger as trigger_mod
from minerva_etl_spark.operators import kmeans as KM
from minerva_etl_spark.operators import similarity as S
from minerva_etl_spark.operators import skew as SK
from minerva_etl_spark.operators import split as SPL
from minerva_etl_spark.operators import text as X
from minerva_etl_spark.operators.aggregation import (
    TrendAggSpec,
    entity_aggregate,
    time_aggregate,
    time_aggregate_oracle_sql,
    _oracle_agg_sql,
)
from minerva_etl_spark.operators.attribute import compact_history, latest_per_entity
from minerva_etl_spark.operators.upsert import dedup_last_wins, insert_missing, merge_packages
from minerva_etl_spark.sources.tables import load_table



def _prep(spark: SparkSession) -> None:
    """Session invariants the gate depends on (driver may hand us an
    arbitrary session)."""
    import os

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:  # default 200 shuffle partitions is wrong for local fixtures
        cores = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))
    except Exception:
        pass


def _ascii_sanitize(t: str) -> str:
    """Printable-ASCII, single-space, markup-free projection of doc
    text used by the crawl-arc fixtures (mirrored in SQL by
    :func:`_ascii_sanitize_sql`) so their byte-exact oracles hold for
    ANY test-data text: non-ASCII chars (which latin-1 encodes can't
    carry and char-count != byte-count breaks) are dropped, ``<>&``
    (which HTML-embedding would mangle) become spaces, and whitespace
    runs (which HTML extraction collapses) are collapsed up front."""
    import re

    s = re.sub(r"[^ -~]", "", t)
    s = re.sub(r"[<>&]", " ", s)
    return re.sub(r" +", " ", s).strip()


def _ascii_sanitize_sql(col: str) -> str:
    """The DuckDB twin of :func:`_ascii_sanitize` (identical regex
    sequence; RE2 and Python agree on these patterns)."""
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '[^ -~]', '', 'g'), '[<>&]', ' ', 'g'),"
        " ' +', ' ', 'g'))"
    )


def _ascii_sanitize_col(col: str):
    """The Spark-side twin, for fixtures synthesized in pure Catalyst
    (same regex sequence, JVM-side)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col(col), "[^ -~]", ""),
                "[<>&]", " ",
            ),
            " +", " ",
        )
    )


# =====================================================================
# Trend-store aggregation queries (SURVEY A1-A5, W4)
# =====================================================================
_EV_SPECS = [
    TrendAggSpec("value", "sum", alias="sum_value"),
    TrendAggSpec("value", "avg", alias="avg_value"),
    TrendAggSpec("value", "max", alias="max_value"),
]


#: corpus/benchmark split predicates for the decontamination demo —
#: every 10th doc plays the held-out eval set, the rest is the corpus
_DECON_CORPUS_PRED = "doc_id % 10 <> 0"
_DECON_BENCH_PRED = "doc_id % 10 = 0"


def _code_synth_exprs(spark_side: bool) -> tuple[str, str, str, str]:
    """Shared code-file synthesis for the `code_profile` row — the
    SAME SQL text runs on Spark (selectExpr) and DuckDB (oracle CTE),
    parameterized only where the dialects force it (regexp_replace's
    'g' flag, the cast type name).  Returns (t, lic, path, content)
    expression strings; path/content reference columns ``t``/``lic``."""
    rr = (
        "regexp_replace(lower(text), '[^a-z0-9 ]', '')"
        if spark_side
        else "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"
    )
    d = (
        "CAST(doc_id AS STRING)"
        if spark_side
        else "CAST(doc_id AS VARCHAR)"
    )
    t = f"trim({rr})"
    lic = (
        "CASE WHEN doc_id % 5 = 0 THEN chr(10) || "
        "'# Copyright (c) 2020 Example' ELSE '' END"
    )
    path = f"""CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'src/mod_' || {d} || '.py'
      WHEN 1 THEN 'web/app_' || {d} || '.js'
      WHEN 2 THEN 'lib/mod_' || {d} || '.rs'
      ELSE 'scripts/run_' || {d} END"""
    content = f"""CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '# doc ' || {d} || chr(10) || 'def f():' || chr(10)
        || '    return "' || t || '"' || lic || chr(10)
      WHEN 1 THEN '// doc ' || {d} || chr(10) || 'const x = "' || t
        || '";' || chr(10) || '/* tail */' || lic
      WHEN 2 THEN '// doc ' || {d} || chr(10) || 'let x = "' || t
        || '"; // inline' || lic
      ELSE '#!' || '/bin/bash' || chr(10) || '# doc ' || {d} || chr(10)
        || 'echo "' || t || '"' || lic || chr(10) END"""
    return t, lic, path, content


#: bump when ANY staged fixture's generating formula changes — the
#: stage cache key includes it, so stale payloads can never leak
#: across formula revisions.
_MEDIA_STAGE_VERSION = "r14b"  # tiff fixture gained LZW/predictor legs


def _media_fixture_staged(spark, sf_dir, kind, build):
    """Synthesize a deterministic media fixture ONCE per machine per
    (sf_dir, kind, version) and reuse the staged parquet — the
    `_ivf_prebuilt_state` precedent applied to fixtures (the r10
    verdict's ask 3): media bench rows must time the OPERATOR
    (decode + band join), not in-task fixture synthesis, which was
    dominating `audio_dedup_fingerprint` / `video_dedup_dhash` wall
    time and polluting round-over-round comparability.  Payloads are
    md5-derived and deterministic, so reuse == rebuild — and the
    correctness oracle recomputes them in DuckDB from the formula
    either way, so a stale-stage bug would hash-mismatch, never pass
    silently.  The write is atomic (tmp dir + rename) so concurrent
    builders (pytest vs bench) cannot expose a half-written stage."""
    import glob
    import hashlib
    import os
    import shutil
    import tempfile

    # the stage key folds in a fingerprint of the SOURCE parquet
    # files (name, size, mtime): regenerated fixture data at the same
    # sf_dir path must invalidate the stage — the oracle would catch
    # a stale stage, but the bench path would otherwise silently time
    # against stale payloads (r11 advice)
    src_sig = ";".join(
        f"{os.path.basename(p)}:{os.path.getsize(p)}"
        f":{os.stat(p).st_mtime_ns}"
        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet")))
    )
    tag = hashlib.md5(
        f"{_MEDIA_STAGE_VERSION}:{kind}:{os.path.abspath(sf_dir)}"
        f":{src_sig}".encode()
    ).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"minerva_media_stage_{kind}_{tag}"
    )
    if not os.path.isdir(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        # repartition to core count at WRITE time: the fixture source
        # is a 1-2-file parquet, and a 1-2-file stage would serialize
        # the downstream decode into 1-2 tasks (measured: the audio
        # row's Arrow decode ran single-task off a 1-partition stage)
        build().repartition(
            spark.sparkContext.defaultParallelism
        ).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:  # lost the build race: the winner's stage is
            shutil.rmtree(tmp, ignore_errors=True)  # identical bytes
    return spark.read.parquet(path)


#: per-source TOKEN budgets for the budget-selection row: 15 of the 20
#: sources get a budget (the rest must drop out entirely)
_TOKEN_BUDGETS = {f"src{i}": 300 + 37 * i for i in range(15)}


#: per-language keep rates (percent) for the stratified-sampling demo:
#: downsample the dominant languages, keep every rare-language doc
_STRATA_RATES = {"en": 30, "de": 60, "fr": 60, "es": 60, "und": 100}


#: shared by the Spark row and its oracle: the deterministic link
#: graph for `pagerank_crawl` — every doc links to its 1 + doc_id % 3
#: successors at stride 7 (mod N), giving hubs, chains and a few
#: dangling targets.
_PAGERANK_EDGES_SQL = """(
  SELECT d.doc_id AS src,
         (d.doc_id * 7 + gs.k) % (SELECT count(*) FROM documents)
           AS dst
  FROM documents d
  CROSS JOIN UNNEST(generate_series(1, 1 + d.doc_id % 3)) AS gs(k)
  WHERE d.doc_id * 7 + gs.k <> d.doc_id
)"""


def _token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")


_TOKENS_SQL = """(
  SELECT token FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) WHERE token <> ''
)"""


def _shingle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-token shingles — the fixture's word POOL is tiny (~31
    types), so token-level distinct sketches would be degenerate;
    shingles give a universe in the tens of thousands, which is what
    a distinct sketch is for."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(split(text, ' '))"
                " - 3, 0)), i -> concat_ws(' ', "
                "slice(split(text, ' '), i + 1, 3)))"
            )
        ).alias("item")
    ).filter(F.col("item") != "")


_SHINGLES_SQL = """(
  SELECT item FROM (
    SELECT array_to_string(list_slice(toks, gs.i + 1, gs.i + 3), ' ')
      AS item
    FROM (SELECT string_split(text, ' ') AS toks FROM documents) d
    CROSS JOIN UNNEST(generate_series(0,
      greatest(len(toks) - 3, 0))) AS gs(i)
  ) WHERE item <> ''
)"""


def _markup_sanitize(t: str) -> str:
    """Markup-inert projection of doc text for the markup fixtures:
    only chars that no Markdown/LaTeX stripping rule can touch
    survive (SQL twin :func:`_markup_sanitize_sql`)."""
    import re

    s = re.sub(r"[^A-Za-z0-9 .,;:!?'()]", "", t)
    return re.sub(r" +", " ", s).strip()


def _markup_sanitize_sql(col: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace("
        f"{col}, '[^A-Za-z0-9 .,;:!?''()]+', '', 'g'), ' +', ' ', 'g'))"
    )
