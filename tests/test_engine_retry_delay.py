"""S4 retry delay: Retry-After / MinRetryDelayInMilliseconds semantics
(WebCrawler.cs:1030-1057, Retry-After parse :848-868). The engine defers the
retry by ceil(delay / round_length_ms) rounds under its virtual clock, and
the deferral BLOCKS the whole queue tail behind it — the reference's wait
happens on the popped head of a single-threaded loop, so nothing queued
after the waiting retry can crawl before it. Crawl ORDER is therefore
byte-equal to the blocking reference; rows behind a blocker inherit its
round."""

import os
from datetime import datetime

import pandas as pd
import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.kernel import decisions as D
from abot_dotnet_core_spark.kernel.extract import golden_text
from abot_dotnet_core_spark.kernel.simulator import CrawlSimulator, PageRecord


class TestParseRetryAfter:
    def test_numeric_seconds(self):
        assert D.parse_retry_after("30") == 30.0
        assert D.parse_retry_after(" 4.5 ") == 4.5

    def test_http_date_with_last_request(self):
        lr = datetime(1999, 12, 31, 23, 58, 59)
        got = D.parse_retry_after("Fri, 31 Dec 1999 23:59:59 GMT", lr)
        assert got == 60.0

    def test_unparseable_and_empty(self):
        assert D.parse_retry_after(None) is None
        assert D.parse_retry_after("") is None
        assert D.parse_retry_after("soon") is None

    def test_delay_precedence(self):
        cfg = CrawlConfig(min_retry_delay_in_milliseconds=5000)
        # server Retry-After wins over the config minimum when present
        assert D.retry_delay_ms(cfg, 120.0) == 120_000.0
        assert D.retry_delay_ms(cfg, None) == 5000.0

    def test_not_before_round(self):
        cfg = CrawlConfig(min_retry_delay_in_milliseconds=0,
                          round_length_ms=60_000)
        # no delay: still never sooner than the next round
        assert D.retry_not_before_round(cfg, 2, None) == 3
        assert D.retry_not_before_round(cfg, 2, 120.0) == 4
        assert D.retry_not_before_round(cfg, 2, 61.0) == 4
        assert D.retry_not_before_round(cfg, 2, 59.0) == 3


HTML_ROOT = ('<html><body><a href="/a">a</a><a href="/b">b</a>'
             '<a href="/c">c</a></body></html>')
HTML_LEAF = "<html><body>leaf</body></html>"


def write_retry_corpus(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rows = [
        ("http://e0.test/", 200, None, HTML_ROOT),
        ("http://e0.test/a", 503, "120", HTML_LEAF),   # Retry-After: 120 s
        ("http://e0.test/b", 503, None, HTML_LEAF),    # config min only
        ("http://e0.test/c", 200, None, HTML_LEAF),
    ]
    ts = datetime(2024, 1, 1)
    corpus = pd.DataFrame([{
        "url": u, "warc_ts": ts, "html": h.encode(),
        "text": golden_text(h.encode(), "text/html"), "lang": "en",
    } for u, _s, _ra, h in rows])
    meta = pd.DataFrame([{
        "url": u, "status": s, "content_type": "text/html",
        "content_length": len(h), "redirect_to": None,
        "x_robots": None, "retry_after": ra,
    } for u, s, ra, h in rows])
    corpus.to_parquet(f"{outdir}/corpus.parquet", index=False,
                      coerce_timestamps="us", allow_truncated_timestamps=True)
    meta.to_parquet(f"{outdir}/corpus_meta.parquet", index=False)


def sim_corpus():
    return {
        "http://e0.test/": PageRecord(200, "text/html", HTML_ROOT),
        "http://e0.test/a": PageRecord(503, "text/html", HTML_LEAF,
                                       retry_after="120"),
        "http://e0.test/b": PageRecord(503, "text/html", HTML_LEAF),
        "http://e0.test/c": PageRecord(200, "text/html", HTML_LEAF),
    }


CFG = CrawlConfig(max_retry_count=1, min_retry_delay_in_milliseconds=30_000,
                  round_length_ms=60_000)


class TestEngineRetryDelay:
    def test_deferred_rounds_and_order_parity(self, spark, tmp_path):
        corpus_dir = str(tmp_path / "corpus")
        write_retry_corpus(corpus_dir)
        eng = CrawlEngine(
            spark, CFG,
            corpus_path=f"{corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed(["http://e0.test/"])
        eng.run(max_rounds=20)

        rows = (eng.store.read_events(spark, "crawled")
                .orderBy("crawl_order").collect())
        got = [(r["url"], r["status"], r["is_retry"]) for r in rows]

        sim = CrawlSimulator(sim_corpus(), CFG).crawl("http://e0.test/")
        want = [(c.url, c.status, c.is_retry) for c in sim.crawled]
        assert got == want   # order parity despite deferral

        # the simulator recorded the blocking waits the reference would take
        waits = dict(sim.retry_waits)
        assert waits["http://e0.test/a"] == 120_000.0   # Retry-After wins
        assert waits["http://e0.test/b"] == 30_000.0    # config minimum

        # engine deferral: root in round 1; a/b/c fetched round 2; a's retry
        # waits 120 s = 2 rounds -> round 4, and it is queued BEFORE b's, so
        # b (30 s wait, eligible round 3) is blocked behind it — both crawl
        # in round 4, in queue order, exactly like the reference sleeping
        # 120 s on a's pop then crawling b immediately after
        by_retry = {(r["url"], r["is_retry"]): r["round"] for r in rows}
        assert by_retry[("http://e0.test/a", True)] == 4
        assert by_retry[("http://e0.test/b", True)] == 4

    def test_no_delay_config_unchanged(self, spark, tmp_path):
        """min_retry_delay=0 and no Retry-After: retries join the very next
        round (the pre-S4 behavior) with no extra admission jobs."""
        corpus_dir = str(tmp_path / "corpus")
        write_retry_corpus(corpus_dir)
        cfg = CrawlConfig(max_retry_count=1)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed(["http://e0.test/"])
        eng.run(max_rounds=20)
        rows = (eng.store.read_events(spark, "crawled")
                .orderBy("crawl_order").collect())
        by_retry = {(r["url"], r["is_retry"]): r["round"] for r in rows}
        # a's Retry-After header still defers it to round 4 (the server
        # instruction is honored regardless of the config minimum), and b —
        # queued behind a, itself eligible round 3 — waits behind the
        # blocker like the reference's pop loop would
        assert by_retry[("http://e0.test/a", True)] == 4
        assert by_retry[("http://e0.test/b", True)] == 4
