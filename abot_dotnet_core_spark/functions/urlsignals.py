"""URL-shape features + per-domain crawl-trap signals.

Crawl traps (calendar pages, session-id link farms, recursive path loops)
waste most of a frontier's budget at Common-Crawl scale; the reference has
no defense beyond MaxCrawlDepth (CrawlDecisionMaker.cs just counts depth).
This module scores them from URL *shape alone* — available before any
fetch, so the scheduler can down-prioritize a trapped domain's backlog.

Everything is JVM codegen (parse_url / split / array HOFs / rlike): zero
Python, zero shuffle for the per-URL features, ONE hash aggregation per
domain for the signals — the cheapest possible 10^10-URL sweep. Rates are
integer fixed-point thousandths (floor division), so a SQL oracle
reproduces every value exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# query keys that mark per-visitor URL variants (infinite-URL generators)
SESSION_KEY_RE = r"(^|&)(sid|sessionid|session|phpsessid|jsessionid)="
# /YYYY/MM or /YYYY/MM/DD path runs — the calendar-archive trap
CALENDAR_RE = r"/[0-9]{4}/[0-9]{2}(/[0-9]{2})?(/|$)"


def url_shape_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL shape facts: domain, path_depth, n_params, repeated_segment,
    calendar_path, session_query, url_len. Row-local codegen only."""
    u = F.col(url_col)
    path = F.parse_url(u, F.lit("PATH"))
    query = F.parse_url(u, F.lit("QUERY"))
    segs = F.filter(F.split(F.coalesce(path, F.lit("")), "/"),
                    lambda s: s != "")
    return df.select(
        u.alias("url"),
        F.parse_url(u, F.lit("HOST")).alias("domain"),
        F.size(segs).alias("path_depth"),
        F.when(query.isNull() | (query == ""), F.lit(0))
         .otherwise(F.size(F.split(query, "&"))).alias("n_params"),
        (F.size(segs) > F.size(F.array_distinct(segs)))
         .alias("repeated_segment"),
        F.coalesce(path, F.lit("")).rlike(CALENDAR_RE)
         .alias("calendar_path"),
        F.coalesce(F.lower(query), F.lit("")).rlike(SESSION_KEY_RE)
         .alias("session_query"),
        F.length(u).alias("url_len"))


def domain_trap_signals(features: DataFrame) -> DataFrame:
    """Per-domain trap profile. trap_score_millis sums the three
    infinite-URL-generator rates (repeated-segment, calendar, session-id),
    each 0..1000 — a scheduler treats >~800 as 'probe with a tiny budget
    before committing'. Weights are deliberately 1:1:1; a tuned deployment
    multiplies the rate columns itself (they are all in the output)."""
    n = F.count("*")
    def rate(flag):
        return F.expr(f"cast((count_if({flag}) * 1000) div count(*) as int)")
    return (features
            .groupBy("domain")
            .agg(n.alias("n_urls"),
                 F.expr("cast((sum(path_depth) * 1000) div count(*) as int)")
                  .alias("avg_depth_millis"),
                 F.expr("cast((sum(n_params) * 1000) div count(*) as int)")
                  .alias("avg_params_millis"),
                 F.max("path_depth").alias("max_depth"),
                 rate("repeated_segment").alias("repeated_segment_millis"),
                 rate("calendar_path").alias("calendar_millis"),
                 rate("session_query").alias("session_millis"))
            .withColumn("trap_score_millis",
                        F.col("repeated_segment_millis")
                        + F.col("calendar_millis")
                        + F.col("session_millis")))


# --- registered domain (eTLD+1) ----------------------------------------------

# Frozen multi-label public-suffix subset (publicsuffix.org shape; a real
# deployment broadcasts the full ~9k-entry PSL as a dimension — the logic
# below is unchanged, only the list grows). Single-label suffixes (com,
# org, de, ...) need no listing: they are the default 2-label rule.
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.kr", "com.cn",
]


def registered_domain_cols(host) -> dict:
    """public_suffix / registered_domain Columns from a host Column —
    eTLD+1 semantics over the frozen PSL subset. Row-local codegen
    (split + slice + concat_ws + isin); no UDF, zero shuffle.

    eTLD+1 is what per-domain budgets, dedup caps and politeness should
    really key on: 'a.blogspot.co.uk' and 'b.blogspot.co.uk' are distinct
    hosts but the same registrant only if the suffix is 'co.uk' — the
    host-level fallback treats every subdomain as its own domain.

    Expects an already-lowercased host (``with_registered_domain``
    normalizes; hosts are case-insensitive per RFC but corpus url columns
    record them as-crawled). IPv4 literals pass through whole — octets
    are not labels, and collapsing '10.9.0.1' and '192.168.0.1' to '0.1'
    would lump distinct servers under one budget key.
    """
    is_ip = host.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
    parts = F.split(host, "\\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.try_element_at(parts, F.lit(-2)),
                        F.try_element_at(parts, F.lit(-1)))
    is_multi = last2.isin(*MULTI_SUFFIXES) & (n >= 3)
    suffix = (F.when(is_ip, host)
              .when(is_multi, last2)
              .otherwise(F.element_at(parts, -1)))
    reg = (F.when(is_ip, host)
           .when(is_multi,
                 F.concat_ws(".", F.try_element_at(parts, F.lit(-3)), last2))
           .when(n >= 2, last2)
           .otherwise(host))
    return {"public_suffix": suffix, "registered_domain": reg}


def with_registered_domain(df: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """(existing cols) + host (lowercased), public_suffix,
    registered_domain."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    cols = registered_domain_cols(host)
    return (df.withColumn("host", host)
            .withColumn("public_suffix", cols["public_suffix"])
            .withColumn("registered_domain", cols["registered_domain"]))


def url_param_variants(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Collapse query-parameter variants of the same resource: one row per
    base URL (query stripped) with the variant count and the sorted set of
    parameter keys seen — the companion to crawl-trap detection (calendars
    and session ids manufacture unbounded ?-variants of one page) and the
    evidence for a cleanURLFunc parameter-strip rule.

    One hash-agg keyed by base URL; parameter keys come from a row-local
    split (codegen), aggregated as a sorted-distinct join so the output is
    deterministic and narrow. At index scale the base-URL agg shuffles
    distinct bases only (map-side combine collapses variant floods).
    """
    url = F.col(url_col)
    base = F.substring_index(url, "?", 1)
    # everything after the FIRST '?' — substring_index(url, '?', -1) would
    # cut at the LAST '?', silently dropping keys when a '?' appears inside
    # a query value (legal per RFC 3986, e.g. ...?q=what?&a=1)
    query = F.when(url.contains("?"),
                   F.expr(f"substring({url_col}, "
                          f"instr({url_col}, '?') + 1)")) \
             .otherwise(F.lit(None))
    keys = F.when(query.isNotNull(),
                  F.transform(F.split(query, "&"),
                              lambda kv: F.substring_index(kv, "=", 1))) \
            .otherwise(F.array().cast("array<string>"))
    rows = df.select(base.alias("base_url"), url.alias("__url"),
                     F.explode(F.concat(keys, F.array(F.lit(None)
                                                      .cast("string"))))
                      .alias("param_key"))
    return (rows.groupBy("base_url")
            .agg(F.countDistinct("__url").alias("n_variants"),
                 F.concat_ws(",", F.sort_array(
                     F.collect_set("param_key"))).alias("param_keys")))
