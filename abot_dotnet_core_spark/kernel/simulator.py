"""Single-threaded reference crawl simulator — the end-to-end pytest oracle.

Replays the reference's orchestration loop (WebCrawler.CrawlSite +
ProcessPageAsync, /root/reference/Abot/src/Abot/Crawler/WebCrawler.cs:517-720,
with the PoliteWebCrawler robots override PoliteWebCrawler.cs:104-149) over an
in-memory corpus, with ``MaxConcurrentThreads=1`` semantics. That single-
threaded FIFO order is the canonical crawl order the Spark engine must
reproduce (the reference's multi-threaded order is only approximately FIFO).

Fetch model (mirrors the engine's corpus join):
- url present in corpus -> (status, content_type, content_length, html)
- non-2xx status        -> HttpRequestException on the row
  (PageRequester.cs:102 EnsureSuccessStatusCode) => retry-eligible (P13)
- url absent            -> transport error: no response object at all
  (PageRequester.cs:75-80 catch) => NOT retry-eligible (quirk preserved)

Generalization beyond the reference: the reference fetches one robots.txt for
the seed's root only; the engine (and this simulator) accept a per-domain
robots map, which degrades to reference behavior when only the root domain
has an entry.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..config import CrawlConfig
from . import decisions as D
from .extract import extract_links
from .robots import RobotsRules, is_url_allowed
from .urlnorm import authority, normalize_url, scheme_of, url_hash64


@dataclass
class PageRecord:
    """One corpus row (the synthetic 'web')."""
    status: int | None = 200          # None => transport error
    content_type: str = "text/html"
    html: str = ""                    # decoded html text (link source)
    redirect_to: str | None = None
    content_length: int | None = None
    x_robots: str | None = None       # X-Robots-Tag response header (T4)
    retry_after: str | None = None    # Retry-After response header (S4)

    def length(self) -> int:
        return self.content_length if self.content_length is not None else len(self.html.encode("utf-8"))


@dataclass
class CrawledEvent:
    order: int
    url: str
    status: int | None
    depth: int
    parent_url: str | None
    is_retry: bool
    retry_count: int
    links_extracted: int


@dataclass
class DisallowedEvent:
    url: str
    reason: str
    stage: str  # 'page' | 'links' | 'schedule'


@dataclass
class _Page:
    url: str
    parent_url: str | None = None
    depth: int = 0
    is_root: bool = False
    is_internal: bool = True
    is_retry: bool = False
    retry_count: int = 0
    redirected_from: str | None = None
    redirect_position: int = 0


@dataclass
class CrawlResultState:
    crawled: list[CrawledEvent] = field(default_factory=list)
    disallowed: list[DisallowedEvent] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    crawled_count: int = 0
    count_by_domain: dict[str, int] = field(default_factory=dict)
    # S4: (url, wait_ms) per scheduled retry — the blocking wait the
    # reference would take (WaitMinimumRetryDelayAsync); in the engine the
    # same delay becomes the not_before_round deferral, whose earliest
    # waiting row blocks the whole queue tail behind it. Order is unaffected
    # either way (the wait happens on the popped head; nothing overtakes).
    retry_waits: list = field(default_factory=list)

    def seen_hashes(self) -> set[int]:
        return {url_hash64(u) for u in self.seen}


class CrawlSimulator:
    def __init__(
        self,
        corpus: dict[str, PageRecord],
        cfg: CrawlConfig | None = None,
        robots_map: dict[str, RobotsRules] | None = None,
        delegates=None,
    ) -> None:
        from ..operators.delegates import CrawlDelegates
        self.corpus = corpus
        self.cfg = cfg or CrawlConfig()
        # robots_map keys are root urls ("http://host/"); values parsed rules
        self.robots_map = robots_map or {}
        # same Series-contract delegates the engine takes, invoked per-row
        self.delegates = delegates or CrawlDelegates()

    def _dg(self, name, *args) -> bool:
        """Invoke a user delegate on one row; True when unset."""
        from ..operators.delegates import scalar_call
        fn = getattr(self.delegates, name)
        return True if fn is None else scalar_call(fn, *args)

    # --- robots (PoliteWebCrawler.ShouldCrawlPage override) ---------------

    def _robots_root_for(self, url: str) -> str | None:
        root = f"{scheme_of(url)}://{authority(url)}/"
        return root if root in self.robots_map else None

    def _allowed_by_robots(self, page: _Page) -> bool:
        if not self.cfg.is_respect_robots_dot_text_enabled:
            return True
        root = self._robots_root_for(page.url)
        if root is None:
            return True
        rules = self.robots_map[root]
        allowed = is_url_allowed(rules, root, page.url,
                                 self.cfg.robots_dot_text_user_agent_string)
        if page.is_root and self.cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled:
            # PoliteWebCrawler.cs:111-133 — root-disallow (or all-below-root
            # disallow via the "/aaaaa" probe) drops robots for the site.
            probe = page.url + "aaaaa" if page.url.endswith("/") else page.url + "/aaaaa"
            probe_ok = is_url_allowed(rules, root, probe,
                                      self.cfg.robots_dot_text_user_agent_string)
            if not allowed or not probe_ok:
                del self.robots_map[root]
                return True
        return allowed

    # --- decision wrappers -------------------------------------------------

    def _should_crawl_page(self, page: _Page, state: CrawlResultState,
                           queue_len: int) -> D.Decision:
        if not self._allowed_by_robots(page):
            return D.Decision(False, "Disallowed by robots.txt file")
        d = D.should_crawl_page(
            cfg=self.cfg,
            depth=page.depth,
            scheme=scheme_of(page.url),
            domain=authority(page.url),
            is_internal=page.is_internal,
            is_retry=page.is_retry,
            redirected_from=page.redirected_from,
            redirect_position=page.redirect_position,
            crawled_count=state.crawled_count,
            scheduled_count=queue_len,
            crawled_in_domain=state.count_by_domain.get(authority(page.url), 0),
        )
        if d.allow and not self._dg("should_crawl_page", page.url,
                                    page.depth, page.is_internal):
            from ..operators.delegates import REASON_CUSTOM
            return D.Decision(False, REASON_CUSTOM)
        return d

    # --- main loop ----------------------------------------------------------

    def crawl(self, seed_url: str) -> CrawlResultState:
        cfg = self.cfg
        state = CrawlResultState()
        queue: deque[_Page] = deque()

        seed = normalize_url(seed_url)
        root_auth = authority(seed)
        original_root_auth = root_auth

        def is_internal(url: str) -> bool:
            if self.delegates.is_internal_uri is not None:
                return self._dg("is_internal_uri", url)
            return authority(url) in (root_auth, original_root_auth)

        root = _Page(url=seed, is_root=True, is_internal=True)
        decision = self._should_crawl_page(root, state, len(queue))
        if decision.allow:
            if not self.cfg.is_uri_recrawling_enabled:
                # Scheduler.Add -> AddIfNew (Scheduler.cs:78-87); with
                # recrawling enabled Add bypasses the crawled repo, so the
                # seed stays unknown until some page links to it (AddKnownUri)
                # — one link back to the root re-schedules it exactly once.
                state.seen.add(seed)
            queue.append(root)
        else:
            state.disallowed.append(DisallowedEvent(seed, decision.reason, "page"))
            return state

        order = 0
        while queue:
            page = queue.popleft()

            # AddPageToContext — WebCrawler.cs:918-928
            if page.is_retry:
                page.retry_count += 1
            else:
                state.crawled_count += 1
                dom = authority(page.url)
                state.count_by_domain[dom] = state.count_by_domain.get(dom, 0) + 1

            # fetch (corpus join)
            rec = self.corpus.get(page.url)
            status = rec.status if rec is not None else None
            had_request_exception = status is not None and not (200 <= status < 300)

            # content download gate P10-P12 (PageRequester passes
            # shouldDownloadContent into the fetch)
            text: str | None = None
            if rec is not None:
                dl = D.should_download_page_content(
                    cfg=cfg, status=status, content_type=rec.content_type,
                    content_length=rec.length())
                if dl.allow and not self._dg("should_download_page_content",
                                            page.url, status,
                                            rec.content_type):
                    dl = D.Decision(False, "custom")
                if dl.allow:
                    text = rec.html

            links: list[str] = []
            links_decision = D.should_crawl_page_links(
                cfg=cfg, text=text, is_internal=page.is_internal, depth=page.depth)
            if links_decision.allow and not self._dg(
                    "should_crawl_page_links", page.url, page.depth,
                    page.is_internal):
                from ..operators.delegates import REASON_CUSTOM
                links_decision = D.Decision(False, REASON_CUSTOM)
            parsed_n = 0
            if links_decision.allow or cfg.is_forced_link_parsing_enabled:
                # ParsePageLinks runs when allowed OR forced
                # (WebCrawler.cs:688-690); SchedulePageLinks only when allowed
                parsed = extract_links(
                    text, page.url,
                    x_robots_tag=rec.x_robots if rec is not None else None,
                    respect_meta_robots_nofollow=cfg.is_respect_meta_robots_no_follow_enabled,
                    respect_anchor_rel_nofollow=cfg.is_respect_anchor_rel_no_follow_enabled,
                    respect_x_robots_nofollow=cfg.is_respect_http_x_robots_tag_header_no_follow_enabled,
                    keep_fragment=cfg.is_respect_url_named_anchor_or_hashbang_enabled,
                    clean_url=self.delegates.clean_url,
                    parser=cfg.hyperlink_parser,
                )
                parsed_n = len(parsed)
                if links_decision.allow:
                    links = parsed
            if not links_decision.allow:
                state.disallowed.append(
                    DisallowedEvent(page.url, links_decision.reason, "links"))

            state.crawled.append(CrawledEvent(
                order=order, url=page.url, status=status, depth=page.depth,
                parent_url=page.parent_url, is_retry=page.is_retry,
                retry_count=page.retry_count, links_extracted=parsed_n))
            order += 1

            # root-redirect rebinding — ValidateRootUriForRedirection
            # (WebCrawler.cs:676-678, 1063-1073): a redirected root page
            # rebinds root_auth (original stays internal via
            # original_root_auth) BEFORE the redirect child is scheduled
            if (page.is_root and rec is not None and rec.redirect_to
                    and not cfg.is_http_request_auto_redirects_enabled):
                target = normalize_url(rec.redirect_to)
                if target is not None:
                    root_auth = authority(target)

            # manual redirect scheduling — WebCrawler.cs:680-681, 722-749
            if (rec is not None and rec.redirect_to
                    and not cfg.is_http_request_auto_redirects_enabled):
                target = normalize_url(rec.redirect_to)
                if target is not None:
                    child = _Page(
                        url=target, parent_url=page.parent_url, depth=page.depth,
                        is_internal=is_internal(target),
                        redirected_from=page.url,
                        redirect_position=page.redirect_position + 1)
                    if self._schedule_one(child, state, queue):
                        pass

            # SchedulePageLinks — WebCrawler.cs:935-971
            if links_decision.allow:
                links_added = 0
                for uri in links:
                    if uri not in state.seen:
                        # ShouldScheduleLinkDecisionMaker — silent gate before
                        # child construction (WebCrawler.cs:943-946); the
                        # link is still marked known below
                        if not self._dg("should_schedule_link",
                                        page.url, uri):
                            state.seen.add(uri)
                            continue
                        child = _Page(url=uri, parent_url=page.url,
                                      depth=page.depth + 1,
                                      is_internal=is_internal(uri))
                        if self._schedule_one(child, state, queue):
                            links_added += 1
                        if cfg.max_links_per_page != 0 and links_added >= cfg.max_links_per_page:
                            state.seen.add(uri)
                            break
                    state.seen.add(uri)   # AddKnownUri — always, even unscheduled

            # retry — WebCrawler.cs:702-706
            recrawl = D.should_recrawl_page(
                cfg=cfg, had_request_exception=had_request_exception,
                retry_count=page.retry_count)
            if recrawl.allow and not self._dg("should_recrawl_page",
                                              page.url, status,
                                              page.retry_count):
                recrawl = D.Decision(False, "custom")
            if recrawl.allow:
                page.is_retry = True
                ra = D.parse_retry_after(
                    rec.retry_after) if rec is not None else None
                state.retry_waits.append(
                    (page.url, D.retry_delay_ms(cfg, ra)))
                queue.append(page)    # Scheduler.Add bypasses seen for retries

        return state

    def _schedule_one(self, child: _Page, state: CrawlResultState,
                      queue: deque[_Page]) -> bool:
        """ShouldSchedulePageLink + Scheduler.Add — WebCrawler.cs:973-984,
        Scheduler.cs:73-87."""
        if not (child.is_internal or self.cfg.is_external_page_crawling_enabled):
            return False
        decision = self._should_crawl_page(child, state, len(queue))
        if not decision.allow:
            state.disallowed.append(DisallowedEvent(child.url, decision.reason, "schedule"))
            return False
        if self.cfg.is_uri_recrawling_enabled or child.is_retry:
            queue.append(child)
            return True
        if child.url not in state.seen:   # AddIfNew
            state.seen.add(child.url)
            queue.append(child)
            return True
        return False
