"""Manual-redirect parity (ProcessRedirect, WebCrawler.cs:722-749): redirect
children scheduled before the page's links, same depth, position+1, P1
(HttpRequestMaxAutoRedirects) firing on long chains, known-target dedup."""

import pandas as pd
import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.kernel.simulator import CrawlSimulator, PageRecord

ROOT = "http://r.test/"


def corpus_dict():
    def link(*hrefs):
        return "".join(f'<a href="{h}"></a>' for h in hrefs)
    pages = {
        ROOT: PageRecord(html=link("/a", "/r1", "/l1") + "root"),
        ROOT + "a": PageRecord(html=link("/r1", "/c") + "page a"),
        ROOT + "r1": PageRecord(status=301, redirect_to=ROOT + "r2", html=""),
        ROOT + "r2": PageRecord(status=301, redirect_to=ROOT + "r3", html=""),
        ROOT + "r3": PageRecord(status=301, redirect_to=ROOT + "b", html=""),
        ROOT + "b": PageRecord(html=link("/a") + "page b"),
        ROOT + "c": PageRecord(status=302, redirect_to=ROOT + "a", html=""),
    }
    # a 9-hop chain: positions exceed HttpRequestMaxAutoRedirects=7 at l9
    for i in range(1, 10):
        nxt = ROOT + f"l{i + 1}" if i < 10 else None
        pages[ROOT + f"l{i}"] = PageRecord(status=301, redirect_to=nxt, html="")
    pages[ROOT + "l10"] = PageRecord(html="end of chain")
    return pages


def write_corpus(tmp_path):
    rows = []
    for url, rec in corpus_dict().items():
        raw = rec.html.encode("utf-8")
        rows.append({
            "url": url, "warc_ts": pd.Timestamp("2024-01-01"),
            "html": raw, "text": rec.html, "lang": "en",
            "status": rec.status, "content_type": rec.content_type,
            "content_length": len(raw), "redirect_to": rec.redirect_to,
        })
    pdf = pd.DataFrame(rows)
    d = tmp_path / "corpus"
    d.mkdir()
    pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True)
    pdf[["url", "status", "content_type", "content_length", "redirect_to"]] \
        .to_parquet(f"{d}/corpus_meta.parquet", index=False)
    return str(d)


CFG = CrawlConfig(is_http_request_auto_redirects_enabled=False)


def test_redirect_parity(spark, tmp_path):
    sim = CrawlSimulator(corpus_dict(), CFG).crawl(ROOT)
    d = write_corpus(tmp_path)
    eng = CrawlEngine(spark, CFG,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"))
    eng.seed([ROOT])
    eng.run(max_rounds=50)

    rows = eng.store.read_events(spark, "crawled").orderBy("crawl_order").collect()
    got = [(r["url"], r["status"], r["depth"]) for r in rows]
    want = [(c.url, c.status, c.depth) for c in sim.crawled]
    assert got == want, f"\n got={got}\nwant={want}"

    # the redirect chain is followed (r1->r2->r3->b all crawled)
    urls = [u for u, _, _ in got]
    assert ROOT + "r2" in urls and ROOT + "r3" in urls and ROOT + "b" in urls

    # the long chain stops at position > 7 with the golden P1 reason
    dis = [(r["url"], r["reason"]) for r in
           eng.store.read_events(spark, "disallowed").collect()]
    want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                      if e.stage in ("links", "schedule"))
    assert sorted(dis) == want_dis
    assert any("HttpRequestMaxAutoRedirects limit of [7]" in r for _, r in dis)

    # seen parity
    assert ({r["url_hash"] for r in eng._read_seen().collect()}
            == sim.seen_hashes())


def test_redirect_known_target_not_requeued(spark, tmp_path):
    # /c redirects to /a which is already crawled -> child silently dropped
    sim = CrawlSimulator(corpus_dict(), CFG).crawl(ROOT)
    urls = [c.url for c in sim.crawled]
    assert urls.count(ROOT + "a") == 1


# --------------------------------------------------------------------------
# Root-redirect rebinding (ValidateRootUriForRedirection,
# WebCrawler.cs:1063-1073; test WebCrawlerTest.cs:926-997)
# --------------------------------------------------------------------------

def rebind_corpus_dict():
    def link(*hrefs):
        return "".join(f'<a href="{h}"></a>' for h in hrefs)
    return {
        "http://x.test/": PageRecord(status=301,
                                     redirect_to="http://y.test/home",
                                     html=""),
        "http://y.test/home": PageRecord(html=link("/p1", "/p2") + "home"),
        "http://y.test/p1": PageRecord(html=link("/p2") + "p one"),
        "http://y.test/p2": PageRecord(html="p two"),
    }


def write_rebind_corpus(tmp_path):
    rows = []
    for url, rec in rebind_corpus_dict().items():
        raw = rec.html.encode("utf-8")
        rows.append({
            "url": url, "warc_ts": pd.Timestamp("2024-01-01"),
            "html": raw, "text": rec.html, "lang": "en",
            "status": rec.status, "content_type": rec.content_type,
            "content_length": len(raw), "redirect_to": rec.redirect_to,
        })
    pdf = pd.DataFrame(rows)
    d = tmp_path / "corpus_rebind"
    d.mkdir()
    pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True)
    pdf[["url", "status", "content_type", "content_length", "redirect_to"]] \
        .to_parquet(f"{d}/corpus_meta.parquet", index=False)
    return str(d)


def test_root_redirect_rebinds_internality(spark, tmp_path):
    """The seed 302s to another authority: after rebinding, y.test pages are
    internal and get crawled even with external crawling DISABLED. Without
    rebinding the crawl would die after the root."""
    sim = CrawlSimulator(rebind_corpus_dict(), CFG).crawl("http://x.test/")
    sim_urls = [c.url for c in sim.crawled]
    assert "http://y.test/home" in sim_urls        # simulator rebinds
    assert "http://y.test/p1" in sim_urls and "http://y.test/p2" in sim_urls

    d = write_rebind_corpus(tmp_path)
    eng = CrawlEngine(spark, CFG,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"))
    eng.seed(["http://x.test/"])
    eng.run(max_rounds=50)

    rows = (eng.store.read_events(spark, "crawled")
            .orderBy("crawl_order").collect())
    got = [(r["url"], r["status"], r["depth"]) for r in rows]
    want = [(c.url, c.status, c.depth) for c in sim.crawled]
    assert got == want, f"\n got={got}\nwant={want}"
    # both authorities ended up root-sanctioned (RootUri + OriginalRootUri)
    assert eng.root_authorities == ["x.test", "y.test"]
    # rebinding survives resume (persisted in the commit manifest)
    eng2 = CrawlEngine.resume(
        spark, CFG,
        corpus_path=f"{d}/corpus.parquet",
        corpus_meta_path=f"{d}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"))
    assert eng2.root_authorities == ["x.test", "y.test"]


# --------------------------------------------------------------------------
# S6 crawl timeout (CrawlTimeoutSeconds, WebCrawler.cs:231-234, 653-661)
# --------------------------------------------------------------------------

def test_crawl_timeout_stops_scheduling(spark, tmp_path):
    d = write_corpus(tmp_path)
    cfg = CrawlConfig(is_http_request_auto_redirects_enabled=False,
                      crawl_timeout_seconds=2)
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"))
    eng.seed([ROOT])
    # fake clock: t_start=0, round-1 check sees 0 (runs), round-2 check
    # sees 10 >= 2 -> timeout fires after exactly one round
    ticks = iter([0, 0] + [10] * 100)
    stats = eng.run(max_rounds=50, clock=lambda: next(ticks))
    assert len(stats) == 1                       # stopped scheduling
    assert eng.pending_total > 0                 # crawl incomplete...
    crawled_partial = eng.store.read_events(spark, "crawled").count()

    # ...but committed and resumable (stronger than the reference's
    # scheduler-clearing stop)
    eng2 = CrawlEngine.resume(
        spark, cfg,
        corpus_path=f"{d}/corpus.parquet",
        corpus_meta_path=f"{d}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"))
    # resumed engine keeps the timeout config; give it a fresh clock
    eng2.run(max_rounds=50, clock=lambda: 0)
    assert eng2.store.read_events(spark, "crawled").count() > crawled_partial


def test_no_timeout_by_default(spark, tmp_path):
    d = write_corpus(tmp_path)
    eng = CrawlEngine(spark, CFG,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"))
    eng.seed([ROOT])
    stats = eng.run(max_rounds=50)
    assert eng.pending_total == 0                # ran to completion
