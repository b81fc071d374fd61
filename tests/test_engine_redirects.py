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
