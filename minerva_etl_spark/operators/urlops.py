"""URL analysis for crawl curation — pure Catalyst expressions.

The counterweight to the codec operators: URL parsing is string work
the JVM excels at, so everything here is built-in expressions
(`parse_url`, `split`, `filter`, `element_at`) that stay inside
whole-stage codegen — NO Python UDF, no Arrow hop.  At 100 TB these
run at scan speed and the per-domain report is one map-side-combined
groupBy.

Components: scheme/host/path/query split (`parse_url` — Spark's
built-in, same grammar Hive used), path depth, top-level domain, and
a registrable-domain approximation (last two host labels, or three
when the second-level label is a known shared suffix like ``co.uk`` —
the stdlib has no public-suffix list, and the approximation is
documented rather than hidden; swap in a real PSL table via the
optional ``suffix_overrides`` join when one is available).

The crawl pipeline uses these for per-domain caps (`domain_cap`
composes on the registrable domain), URL-level dedup keys, and
domain-mix reports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: second-level labels that act as shared suffixes under 2-letter TLDs
#: (the high-traffic subset of the public-suffix list; documented
#: approximation, not a hidden guess)
SHARED_SECOND_LEVEL = (
    "co", "com", "net", "org", "ac", "gov", "edu",
)


def _part(url_col: str, part: str) -> Column:
    return F.expr(f"parse_url({url_col}, '{part}')")


def registrable_domain_expr(host_col: str) -> Column:
    """Registrable-domain approximation from a host column: the last
    two labels, or three when the second-to-last is a shared
    second-level suffix under a 2-letter TLD (``co.uk`` style); a
    dotless host is returned whole."""
    labels = F.split(F.col(host_col), r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    sld = F.element_at(labels, -2)
    last2 = F.concat_ws(".", F.element_at(labels, -2), tld)
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), tld
    )
    in_set = sld.isin(*SHARED_SECOND_LEVEL)
    return (
        F.when(n <= 1, F.col(host_col))
        .when((n >= 3) & in_set & (F.length(tld) == 2), last3)
        .otherwise(last2)
    )


def with_registrable_domain(
    df: DataFrame,
    suffix_table: DataFrame,
    host_col: str = "host",
    out_col: str = "registrable_domain",
    suffix_col: str = "suffix",
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Public-suffix-list registrable domains — the exact variant of
    :func:`registrable_domain_expr` for when a user supplies a PSL
    table (one row per suffix, e.g. ``co.uk``, ``com.au``,
    ``blogspot.com``; wildcard/exception PSL rules must be
    pre-expanded to plain suffixes).

    Scale shape: ``max_suffix_labels`` LEFT broadcast hash joins (one
    per candidate suffix length, longest first), each matching the
    host's last-*k*-labels string against the suffix table — the PSL
    is ~10k short strings, a canonical broadcast dim, so the whole
    resolution is map-side with zero shuffle and no UDF.  The longest
    matching suffix wins (the PSL rule); registrable domain = suffix
    plus one more label.  Hosts matching no suffix fall back to the
    documented two-label heuristic; a host that IS a bare suffix (or
    dotless) is returned whole."""
    labels = F.split(F.col(host_col), r"\.")
    sfx = F.broadcast(
        suffix_table.select(F.col(suffix_col)).distinct()
    )
    out = df
    match_cols = []
    for k in range(max_suffix_labels, 0, -1):
        cand = F.when(
            F.size(labels) >= k, F.concat_ws(".", F.slice(labels, -k, k))
        )
        mcol = f"__psl_match_{k}"
        out = out.join(
            sfx.withColumnRenamed(suffix_col, mcol),
            cand == F.col(mcol),
            "left",
        )
        match_cols.append((k, mcol))
    reg = None
    for k, mcol in match_cols:  # longest suffix first
        hit = F.when(
            F.col(mcol).isNotNull(),
            F.when(
                F.size(labels) >= k + 1,
                F.concat_ws(".", F.slice(labels, -(k + 1), k + 1)),
            ).otherwise(F.col(host_col)),
        )
        reg = hit if reg is None else F.coalesce(reg, hit)
    reg = F.coalesce(reg, registrable_domain_expr(host_col))
    return out.withColumn(out_col, reg).drop(
        *[m for _, m in match_cols]
    )


def with_url_parts(
    df: DataFrame,
    url_col: str = "url",
    suffix_table: DataFrame | None = None,
) -> DataFrame:
    """Add ``scheme, host, path, query, path_depth, tld,
    registrable_domain`` columns — all JVM-side expressions.

    With ``suffix_table`` (a user-supplied public-suffix list, see
    :func:`with_registrable_domain`) the registrable domain is
    PSL-exact via broadcast joins; without it, the documented
    two-label approximation."""
    out = df.select(
        "*",
        _part(url_col, "PROTOCOL").alias("scheme"),
        _part(url_col, "HOST").alias("host"),
        _part(url_col, "PATH").alias("path"),
        _part(url_col, "QUERY").alias("query"),
    )
    out = out.select(
        "*",
        F.size(
            F.filter(F.split("path", "/"), lambda x: x != "")
        ).alias("path_depth"),
        F.element_at(F.split("host", r"\."), -1).alias("tld"),
    )
    if suffix_table is not None:
        return with_registrable_domain(out, suffix_table)
    return out.withColumn(
        "registrable_domain", registrable_domain_expr("host")
    )


def domain_report(
    df: DataFrame,
    url_col: str = "url",
    suffix_table: DataFrame | None = None,
) -> DataFrame:
    """Per-registrable-domain crawl report: page count, distinct
    hosts, mean path depth, query-string share.  One shuffle, partial
    aggregation map-side.  Pass ``suffix_table`` for PSL-exact
    domain grouping."""
    parts = with_url_parts(df, url_col, suffix_table=suffix_table)
    return parts.groupBy("registrable_domain").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        F.avg("path_depth").alias("avg_depth"),
        F.avg(F.col("query").isNotNull().cast("double")).alias(
            "query_share"
        ),
    )
