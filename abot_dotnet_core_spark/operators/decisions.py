"""Decision cascades P1-P13 as single ``F.when`` chains.

Each function returns a *reason column*: NULL means allow, otherwise the
golden reason string (byte-identical to CrawlDecisionMaker.cs, same
first-failure-wins order). The chains are pure JVM-side column expressions —
whole-stage-codegen'd, no Python in the cascade itself.

Column-name contract (produced upstream):
  url, domain, scheme, depth, is_internal, is_retry,
  redirected_from, redirect_position, status, content_type, content_length,
  text, retry_count, crawled_in_domain (pre-joined running count)
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..config import CrawlConfig
from ..kernel.decisions import clean_content_types


def should_crawl_page_reason(cfg: CrawlConfig, *, budget_denied: Column | None = None,
                             domain_budget_denied: Column | None = None,
                             robots_denied: Column | None = None) -> Column:
    """P1,P2,P3,(P4),(P5),P6 + robots-first override (PoliteWebCrawler.cs:104-149).

    The two sequential-context predicates (P4 global budget, P5 per-domain
    budget) can't be row-local — the caller computes them with window
    functions over the canonical order and passes boolean columns here so the
    reason string still lands in the right cascade position.
    """
    not_retry = ~F.col("is_retry")
    chain = F.when(
        robots_denied if robots_denied is not None else F.lit(False),
        F.lit("Disallowed by robots.txt file"))
    chain = chain.when(
        F.col("redirected_from").isNotNull()
        & (F.col("redirect_position") > cfg.http_request_max_auto_redirects),
        F.lit(f"HttpRequestMaxAutoRedirects limit of [{cfg.http_request_max_auto_redirects}] has been reached"))
    chain = chain.when(F.col("depth") > cfg.max_crawl_depth,
                       F.lit("Crawl depth is above max"))
    chain = chain.when(~F.col("scheme").startswith("http"),
                       F.lit("Scheme does not begin with http"))
    if cfg.max_pages_to_crawl > 0 and budget_denied is not None:
        chain = chain.when(
            not_retry & budget_denied,
            F.lit(f"MaxPagesToCrawl limit of [{cfg.max_pages_to_crawl}] has been reached"))
    if cfg.max_pages_to_crawl_per_domain > 0 and domain_budget_denied is not None:
        chain = chain.when(
            not_retry & domain_budget_denied,
            F.concat(
                F.lit(f"MaxPagesToCrawlPerDomain limit of [{cfg.max_pages_to_crawl_per_domain}] has been reached for domain ["),
                F.col("domain"), F.lit("]")))
    if not cfg.is_external_page_crawling_enabled:
        chain = chain.when(~F.col("is_internal"), F.lit("Link is external"))
    return chain.otherwise(F.lit(None))


def should_crawl_page_links_reason(cfg: CrawlConfig,
                                   text_blank: Column | None = None) -> Column:
    """P7,P8,P9 — CrawlDecisionMaker.cs:81-99. ``text_blank`` lets callers
    that never materialize the text column (the engine's fused-UDF path)
    supply the P7 predicate directly."""
    if text_blank is None:
        text_blank = F.col("text").isNull() | (F.trim(F.col("text")) == "")
    chain = F.when(text_blank, F.lit("Page has no content"))
    if not cfg.is_external_page_links_crawling_enabled:
        chain = chain.when(~F.col("is_internal"), F.lit("Link is external"))
    chain = chain.when(F.col("depth") >= cfg.max_crawl_depth,
                       F.lit("Crawl depth is above max"))
    return chain.otherwise(F.lit(None))


def should_download_reason(cfg: CrawlConfig) -> Column:
    """P10,P11,P12 — CrawlDecisionMaker.cs:101-136."""
    clean = clean_content_types(cfg.downloadable_content_types)
    ct = F.lower(F.trim(F.coalesce(F.col("content_type"), F.lit(""))))
    downloadable = F.lit(False)
    for t in clean:
        downloadable = downloadable | ct.contains(t.lower().strip())
    chain = (
        F.when(F.col("status").isNull(), F.lit("Null HttpWebResponse"))
        .when(F.col("status") != 200, F.lit("HttpStatusCode is not 200"))
        .when(~downloadable,
              F.lit("Content type is not any of the following: " + ",".join(clean)))
    )
    if cfg.max_page_size_in_bytes > 0:
        chain = chain.when(
            F.col("content_length") > cfg.max_page_size_in_bytes,
            F.concat(F.lit("Page size of ["), F.col("content_length").cast("string"),
                     F.lit(f"] bytes is above the max allowable of [{cfg.max_page_size_in_bytes}] bytes")))
    return chain.otherwise(F.lit(None))


def should_recrawl_reason(cfg: CrawlConfig) -> Column:
    """P13 — CrawlDecisionMaker.cs:138-156. had_request_exception is a column
    (status non-null and outside 2xx — PageRequester.cs:102)."""
    had_exc = F.col("status").isNotNull() & ~F.col("status").between(200, 299)
    chain = F.when(~had_exc, F.lit("HttpRequestException did not occur"))
    if cfg.max_retry_count < 1:
        chain = chain.when(F.lit(True), F.lit("MaxRetryCount is less than 1"))
    else:
        chain = chain.when(F.col("retry_count") >= cfg.max_retry_count,
                           F.lit("MaxRetryCount has been reached"))
    return chain.otherwise(F.lit(None))
