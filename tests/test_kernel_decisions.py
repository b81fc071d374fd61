"""Decision cascade oracle tests — transcribed from CrawlDecisionMakerTest.cs."""

import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.kernel import decisions as D


def crawl_page(cfg=None, **kw):
    base = dict(depth=0, scheme="http", domain="a.com", is_internal=True)
    base.update(kw)
    return D.should_crawl_page(cfg=cfg or CrawlConfig(), **base)


class TestShouldCrawlPage:
    def test_allows(self):
        assert crawl_page().allow

    def test_redirect_chain_over_max(self):  # CrawlDecisionMaker.cs:45-46
        d = crawl_page(redirected_from="http://x.com/", redirect_position=8)
        assert not d.allow
        assert d.reason == "HttpRequestMaxAutoRedirects limit of [7] has been reached"

    def test_redirect_chain_at_max_allowed(self):
        assert crawl_page(redirected_from="http://x.com/", redirect_position=7).allow

    def test_depth_above_max(self):  # CrawlDecisionMakerTest.cs:312-328
        cfg = CrawlConfig(max_crawl_depth=2)
        assert not crawl_page(cfg, depth=3).allow
        assert crawl_page(cfg, depth=3).reason == "Crawl depth is above max"

    def test_depth_equal_max_allowed(self):  # boundary: strictly greater denies
        cfg = CrawlConfig(max_crawl_depth=2)
        assert crawl_page(cfg, depth=2).allow

    @pytest.mark.parametrize("scheme", ["ftp", "mailto", "file", "tel"])
    def test_non_http_scheme(self, scheme):
        d = crawl_page(scheme=scheme)
        assert not d.allow
        assert d.reason == "Scheme does not begin with http"

    def test_https_allowed(self):
        assert crawl_page(scheme="https").allow

    def test_max_pages_counts_scheduled(self):  # CrawlDecisionMakerTest.cs:124-137
        cfg = CrawlConfig(max_pages_to_crawl=100)
        # crawled + scheduled + 1 > max -> deny
        d = crawl_page(cfg, crawled_count=100, scheduled_count=0)
        assert not d.allow
        assert d.reason == "MaxPagesToCrawl limit of [100] has been reached"
        d = crawl_page(cfg, crawled_count=1, scheduled_count=100)
        assert not d.allow
        assert crawl_page(cfg, crawled_count=50, scheduled_count=49).allow

    def test_max_pages_zero_disables(self):
        cfg = CrawlConfig(max_pages_to_crawl=0)
        assert crawl_page(cfg, crawled_count=10**6).allow

    def test_retry_bypasses_budget(self):
        cfg = CrawlConfig(max_pages_to_crawl=10)
        assert crawl_page(cfg, crawled_count=100, is_retry=True).allow

    def test_per_domain_limit(self):  # CrawlDecisionMakerTest.cs:257-284
        cfg = CrawlConfig(max_pages_to_crawl_per_domain=10)
        d = crawl_page(cfg, crawled_in_domain=10)
        assert not d.allow
        assert d.reason == ("MaxPagesToCrawlPerDomain limit of [10] has been "
                            "reached for domain [a.com]")
        assert crawl_page(cfg, crawled_in_domain=9).allow
        # zero count in domain -> TryGetValue false branch -> allowed
        assert crawl_page(cfg, crawled_in_domain=0).allow
        # retries bypass the per-domain cap
        assert crawl_page(cfg, crawled_in_domain=10, is_retry=True).allow

    def test_external_page(self):
        d = crawl_page(is_internal=False)
        assert not d.allow and d.reason == "Link is external"
        cfg = CrawlConfig(is_external_page_crawling_enabled=True)
        assert crawl_page(cfg, is_internal=False).allow


class TestShouldCrawlPageLinks:
    def links(self, cfg=None, **kw):
        base = dict(text="<html>content</html>", is_internal=True, depth=0)
        base.update(kw)
        return D.should_crawl_page_links(cfg=cfg or CrawlConfig(), **base)

    def test_allows(self):
        assert self.links().allow

    @pytest.mark.parametrize("text", [None, "", "   "])
    def test_no_content(self, text):
        d = self.links(text=text)
        assert not d.allow and d.reason == "Page has no content"

    def test_external_links(self):
        d = self.links(is_internal=False)
        assert not d.allow and d.reason == "Link is external"
        cfg = CrawlConfig(is_external_page_links_crawling_enabled=True)
        assert self.links(cfg, is_internal=False).allow

    def test_depth_at_max_denies(self):  # >= here, vs > in ShouldCrawlPage
        cfg = CrawlConfig(max_crawl_depth=2)
        d = self.links(cfg, depth=2)
        assert not d.allow and d.reason == "Crawl depth is above max"
        assert self.links(cfg, depth=1).allow


class TestShouldDownloadPageContent:
    def dl(self, cfg=None, **kw):
        base = dict(status=200, content_type="text/html", content_length=100)
        base.update(kw)
        return D.should_download_page_content(cfg=cfg or CrawlConfig(), **base)

    def test_allows(self):
        assert self.dl().allow

    def test_null_response(self):
        d = self.dl(status=None)
        assert not d.allow and d.reason == "Null HttpWebResponse"

    @pytest.mark.parametrize("status", [301, 403, 404, 500, 503])
    def test_non_200(self, status):
        d = self.dl(status=status)
        assert not d.allow and d.reason == "HttpStatusCode is not 200"

    def test_content_type_mismatch(self):
        d = self.dl(content_type="image/jpeg")
        assert not d.allow
        assert d.reason == "Content type is not any of the following: text/html"

    def test_content_type_contains(self):  # CrawlDecisionMakerTest.cs:682-713
        assert self.dl(content_type="text/html; charset=utf-8").allow
        cfg = CrawlConfig(downloadable_content_types="text/html, text/plain")
        assert self.dl(cfg, content_type="text/plain").allow
        # list entries are trimmed; empties dropped
        cfg = CrawlConfig(downloadable_content_types=" text/html , ,text/plain ")
        assert self.dl(cfg, content_type="text/plain").allow
        d = self.dl(cfg, content_type="image/png")
        assert d.reason == "Content type is not any of the following: text/html,text/plain"

    def test_page_size(self):
        cfg = CrawlConfig(max_page_size_in_bytes=5)
        d = self.dl(cfg, content_length=100)
        assert not d.allow
        assert d.reason == "Page size of [100] bytes is above the max allowable of [5] bytes"
        assert self.dl(cfg, content_length=5).allow

    def test_page_size_zero_disables(self):
        assert self.dl(content_length=10**9).allow


class TestShouldRecrawlPage:
    def rc(self, cfg=None, **kw):
        base = dict(had_request_exception=True, retry_count=0)
        base.update(kw)
        return D.should_recrawl_page(cfg=cfg or CrawlConfig(max_retry_count=3), **base)

    def test_allows(self):
        assert self.rc().allow

    def test_no_exception(self):
        d = self.rc(had_request_exception=False)
        assert not d.allow and d.reason == "HttpRequestException did not occur"

    def test_max_retry_below_1(self):
        d = self.rc(cfg=CrawlConfig(max_retry_count=0))
        assert not d.allow and d.reason == "MaxRetryCount is less than 1"

    def test_retry_count_reached(self):
        d = self.rc(retry_count=3)
        assert not d.allow and d.reason == "MaxRetryCount has been reached"
        assert self.rc(retry_count=2).allow


class TestEffectiveDelay:
    # DomainRateLimiterTest.cs / PoliteWebCrawler.cs:85-97 semantics
    def test_no_delays(self):
        assert D.effective_domain_delay_ms(CrawlConfig(), 0) == 0

    def test_config_min_gets_fudge(self):  # DomainRateLimiter.cs:46-47 +20ms
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=1000)
        assert D.effective_domain_delay_ms(cfg, 0) == 1020

    def test_robots_delay_wins_when_larger(self):
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=1000)
        assert D.effective_domain_delay_ms(cfg, 3) == 3000

    def test_robots_delay_clamped(self):  # MaxRobotsDotTextCrawlDelayInSeconds=5
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=1000)
        assert D.effective_domain_delay_ms(cfg, 20) == 5000

    def test_robots_delay_below_min_ignored(self):
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=2000)
        assert D.effective_domain_delay_ms(cfg, 1) == 2020

    def test_clamp_zero_means_unclamped(self):
        cfg = CrawlConfig(max_robots_dot_text_crawl_delay_in_seconds=0)
        assert D.effective_domain_delay_ms(cfg, 60) == 60000
