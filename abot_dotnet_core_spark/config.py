"""Crawl configuration — mirror of the reference ``CrawlConfiguration``.

Reference: /root/reference/Abot/src/Abot/Poco/CrawlConfiguration.cs:8-23
(defaults) and :26-241 (knobs). Names are snake_cased 1:1 so pytest oracles
read across. The frozen dataclass is broadcast-safe (pickled once per round).

Deliberately NOT mirrored (process-local HTTP-client/memory knobs with no
analogue in the corpus-join fetch model): HttpServicePointConnectionLimit,
IsSendingCookiesEnabled, IsSslCertificateValidationEnabled,
IsHttpRequestAutomaticDecompressionEnabled, IsAlwaysLogin/LoginUser/
LoginPassword, MaxMemoryUsageInMb/MaxMemoryUsageCacheTimeInSeconds/
MinAvailableMemoryRequiredInMb (executor memory is Spark's concern).
Every crawl-semantics knob in the reference has a field here.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class CrawlConfig:
    # crawlBehavior — CrawlConfiguration.cs:8-23 defaults
    max_concurrent_threads: int = 10
    max_pages_to_crawl: int = 1000
    max_pages_to_crawl_per_domain: int = 0
    max_page_size_in_bytes: int = 0
    user_agent_string: str = (
        "Mozilla/5.0 (Windows NT 6.3; Trident/7.0; rv:11.0) like Gecko"
    )
    max_crawl_depth: int = 100
    max_links_per_page: int = 0
    downloadable_content_types: str = "text/html"
    is_external_page_crawling_enabled: bool = False
    is_external_page_links_crawling_enabled: bool = False
    is_forced_link_parsing_enabled: bool = False
    max_retry_count: int = 0
    min_retry_delay_in_milliseconds: int = 0

    # http — CrawlConfiguration.cs
    http_request_max_auto_redirects: int = 7
    is_http_request_auto_redirects_enabled: bool = True
    http_request_timeout_in_seconds: int = 15
    # S6 — CrawlConfiguration.CrawlTimeoutSeconds (WebCrawler.cs:231-234):
    # 0 = no timeout; otherwise stop scheduling rounds once elapsed
    crawl_timeout_seconds: int = 0

    # politeness — CrawlConfiguration.cs:185-222
    is_respect_robots_dot_text_enabled: bool = False
    is_respect_meta_robots_no_follow_enabled: bool = False
    is_respect_http_x_robots_tag_header_no_follow_enabled: bool = False
    is_respect_anchor_rel_no_follow_enabled: bool = False
    is_ignore_robots_dot_text_if_root_disallowed_enabled: bool = False
    robots_dot_text_user_agent_string: str = "abot"
    max_robots_dot_text_crawl_delay_in_seconds: int = 5
    min_crawl_delay_per_domain_milli_seconds: int = 0

    # link handling — HyperLinkParser.cs:105-107
    is_respect_url_named_anchor_or_hashbang_enabled: bool = False
    is_uri_recrawling_enabled: bool = False
    # T2/T3 — which reference parser's semantics to reproduce:
    # "hap" (HtmlAgilityPack, the default — WebCrawler.cs:186) or
    # "anglesharp" (document-order a+area; canonical only when it differs
    # from the page URL — AngleSharpHyperLinkParser.cs:35-79)
    hyperlink_parser: str = "hap"

    # engine extensions (ours — no reference counterpart)
    # Round wall-length used by budgeted politeness admission (S3): per round,
    # a domain with effective delay d ms may fetch floor(round_length_ms / d).
    round_length_ms: int = 60_000
    # Number of hash buckets for frontier/seen partitioning at scale.
    state_buckets: int = 32
    # Salt fan-out for hot domains (deterministic pmod(xxhash64(url), salt)).
    skew_salt: int = 8
    # Fetch-queue size above which the corpus join switches from the
    # broadcast semi-join to the Bloom scan-pushdown path (extraction runs
    # on the corpus scan; html never shuffles).
    fetch_broadcast_threshold: int = 200_000
    # Robots-table row count above which the P14 dimension join stops
    # broadcasting and shuffles on domain instead (10^7-10^8-domain crawls).
    robots_broadcast_threshold: int = 2_000_000
    # Header-metadata subset size (charset-bearing content types + X-Robots
    # rows) above which the big-round scan-side join stops broadcasting and
    # falls back to the bloom-routed shuffle of just that subset.
    meta_broadcast_threshold: int = 2_000_000
    # Consolidate the last N per-round seen appends into one directory every
    # N rounds (bounded incremental merge; 0 disables).
    seen_compact_every: int = 8
    # Total Bloom-sidecar blob bytes above which the prefilter stops
    # collecting blobs to the driver + broadcasting and switches to the
    # bucket-aligned probe (blobs stay a bucketed state table; candidates
    # repartition by bucket; each task reads only its co-located blobs).
    # At the tens-of-GB blob volume a 10^10-key seen set needs, driver
    # memory and broadcast both break — the bucketed path has no such
    # ceiling.
    bloom_broadcast_max_bytes: int = 268_435_456
    # P4 survivor-set size (remaining budget + retries + probes) above which
    # the budget predicate switches from TakeOrdered + single-partition
    # window to the two-pass range-partitioned running sum
    # (assign_global_cumsum) — the single window would serialize a ~10^9
    # budget on one task.
    budget_topk_threshold: int = 4_000_000
    # Big-round scan-side extraction implementation: "arrow" (mapInArrow —
    # html consumed row-by-row from the Arrow batch, links built columnarly;
    # measured ~14% faster at contended core counts) or "pandas"
    # (pandas_udf). Identical output; pinned by parity tests on both.
    extract_impl: str = "arrow"

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = CrawlConfig()
