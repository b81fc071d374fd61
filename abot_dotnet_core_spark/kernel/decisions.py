"""Crawl decision predicates P1-P13 with golden reason strings.

Pure-Python mirror of /root/reference/Abot/src/Abot/Core/CrawlDecisionMaker.cs
(order and first-failure-wins preserved; reason strings byte-identical to the
reference so event/emission parity is checkable). The Spark layer re-expresses
the same cascade as a single ``F.when`` chain (operators/decisions.py); this
module is the oracle and the per-row spec.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..config import CrawlConfig


@dataclass(frozen=True)
class Decision:
    allow: bool
    reason: str = ""


ALLOW = Decision(True, "")


def should_crawl_page(
    *,
    cfg: CrawlConfig,
    depth: int,
    scheme: str,
    domain: str,
    is_internal: bool,
    is_retry: bool = False,
    redirected_from: str | None = None,
    redirect_position: int = 0,
    crawled_count: int = 0,
    scheduled_count: int = 0,
    crawled_in_domain: int = 0,
) -> Decision:
    """CrawlDecisionMaker.ShouldCrawlPage — CrawlDecisionMaker.cs:37-79."""
    if redirected_from is not None and redirect_position > cfg.http_request_max_auto_redirects:
        return Decision(False, f"HttpRequestMaxAutoRedirects limit of [{cfg.http_request_max_auto_redirects}] has been reached")
    if depth > cfg.max_crawl_depth:
        return Decision(False, "Crawl depth is above max")
    if not scheme.startswith("http"):
        return Decision(False, "Scheme does not begin with http")
    if (not is_retry and cfg.max_pages_to_crawl > 0
            and crawled_count + scheduled_count + 1 > cfg.max_pages_to_crawl):
        return Decision(False, f"MaxPagesToCrawl limit of [{cfg.max_pages_to_crawl}] has been reached")
    if (not is_retry and cfg.max_pages_to_crawl_per_domain > 0
            and crawled_in_domain > 0
            and crawled_in_domain >= cfg.max_pages_to_crawl_per_domain):
        return Decision(False, f"MaxPagesToCrawlPerDomain limit of [{cfg.max_pages_to_crawl_per_domain}] has been reached for domain [{domain}]")
    if not cfg.is_external_page_crawling_enabled and not is_internal:
        return Decision(False, "Link is external")
    return ALLOW


def should_crawl_page_links(
    *,
    cfg: CrawlConfig,
    text: str | None,
    is_internal: bool,
    depth: int,
) -> Decision:
    """CrawlDecisionMaker.ShouldCrawlPageLinks — CrawlDecisionMaker.cs:81-99."""
    if text is None or not text.strip():
        return Decision(False, "Page has no content")
    if not cfg.is_external_page_links_crawling_enabled and not is_internal:
        return Decision(False, "Link is external")
    if depth >= cfg.max_crawl_depth:
        return Decision(False, "Crawl depth is above max")
    return ALLOW


def clean_content_types(downloadable_content_types: str) -> list[str]:
    """Split/trim/drop-empties — CrawlDecisionMaker.cs:113-118."""
    return [t.strip() for t in downloadable_content_types.split(",") if t.strip()]


def should_download_page_content(
    *,
    cfg: CrawlConfig,
    status: int | None,
    content_type: str | None,
    content_length: int | None,
) -> Decision:
    """CrawlDecisionMaker.ShouldDownloadPageContent — CrawlDecisionMaker.cs:101-136."""
    if status is None:
        return Decision(False, "Null HttpWebResponse")
    if status != 200:
        return Decision(False, "HttpStatusCode is not 200")
    page_ct = (content_type or "").lower().strip()
    clean = clean_content_types(cfg.downloadable_content_types)
    if not any(t.lower().strip() in page_ct for t in clean):
        return Decision(False, "Content type is not any of the following: " + ",".join(clean))
    if (cfg.max_page_size_in_bytes > 0 and content_length is not None
            and content_length > cfg.max_page_size_in_bytes):
        return Decision(False, f"Page size of [{content_length}] bytes is above the max allowable of [{cfg.max_page_size_in_bytes}] bytes")
    return ALLOW


def should_recrawl_page(
    *,
    cfg: CrawlConfig,
    had_request_exception: bool,
    retry_count: int,
) -> Decision:
    """CrawlDecisionMaker.ShouldRecrawlPage — CrawlDecisionMaker.cs:138-156."""
    if not had_request_exception:
        return Decision(False, "HttpRequestException did not occur")
    if cfg.max_retry_count < 1:
        return Decision(False, "MaxRetryCount is less than 1")
    if retry_count >= cfg.max_retry_count:
        return Decision(False, "MaxRetryCount has been reached")
    return ALLOW


def parse_retry_after(value: str | None, last_request=None) -> float | None:
    """Retry-After header -> seconds to wait (S4) — WebCrawler.cs:848-868.

    The reference tries ``DateTime.TryParse`` first (seconds = date -
    LastRequest) and falls back to ``double.TryParse``. Mirrored here:
    an HTTP-date or ISO form parses as a date when ``last_request`` is
    provided; a bare numeric string (which .NET's date parse rejects)
    takes the double branch. Unparseable -> None (no RetryAfter)."""
    if value is None or not str(value).strip():
        return None
    s = str(value).strip()
    if last_request is not None:
        from datetime import datetime
        dt = None
        try:
            from email.utils import parsedate_to_datetime
            dt = parsedate_to_datetime(s)
        except (TypeError, ValueError):
            try:
                dt = datetime.fromisoformat(s)
            except ValueError:
                dt = None
        if dt is not None:
            if dt.tzinfo is not None and last_request.tzinfo is None:
                dt = dt.replace(tzinfo=None)
            return (dt - last_request).total_seconds()
    try:
        return float(s)
    except ValueError:
        return None


def retry_delay_ms(cfg: CrawlConfig, retry_after_s: float | None) -> float:
    """Effective wait before re-fetching a retried page since its last
    request — WebCrawler.cs:1030-1057: the server-provided Retry-After wins
    over the config minimum when present."""
    if retry_after_s is not None:
        return retry_after_s * 1000.0
    return float(cfg.min_retry_delay_in_milliseconds)


def retry_not_before_round(cfg: CrawlConfig, fetch_round: int,
                           retry_after_s: float | None) -> int:
    """Round-granular form of the retry delay under the engine's virtual
    clock (round k fetches at time (k-1) * round_length_ms): the earliest
    round whose start time satisfies the wait, never sooner than the next
    round (a retry cannot re-run inside its own round)."""
    import math
    d = retry_delay_ms(cfg, retry_after_s)
    return fetch_round + max(1, math.ceil(d / max(cfg.round_length_ms, 1)))


def effective_domain_delay_ms(cfg: CrawlConfig, robots_delay_s: int) -> int:
    """Per-domain effective politeness delay in ms.

    Combines PoliteWebCrawler.cs:85-97 (robots delay respected only when it
    exceeds the config minimum, clamped at MaxRobotsDotTextCrawlDelayInSeconds)
    with DomainRateLimiter.cs:46-47 (+20 ms fudge on the default) and
    DomainRateLimiter.AddDomain's max(param, default)."""
    default_ms = (cfg.min_crawl_delay_per_domain_milli_seconds + 20
                  if cfg.min_crawl_delay_per_domain_milli_seconds > 0 else 0)
    robots_ms = robots_delay_s * 1000
    if robots_delay_s > 0 and robots_ms > cfg.min_crawl_delay_per_domain_milli_seconds:
        if robots_delay_s > cfg.max_robots_dot_text_crawl_delay_in_seconds > 0:
            robots_ms = cfg.max_robots_dot_text_crawl_delay_in_seconds * 1000
        return max(robots_ms, default_ms)
    return default_ms
