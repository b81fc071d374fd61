"""User-delegate surface (WebCrawler.cs:458-504): custom pandas-Series
predicates composed after the built-in cascade, changing admission
identically in the reference simulator and the Spark engine."""

import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.kernel.simulator import CrawlSimulator
from abot_dotnet_core_spark.operators.delegates import (
    REASON_CUSTOM, CrawlDelegates, scalar_call)
from abot_dotnet_core_spark.sources.corpus import TINY, to_simulator_corpus

from test_engine_parity import SEED, assert_parity, engine_crawled


def run_both(spark, cfg, delegates, tiny_corpus_dir, tmp_path):
    eng = CrawlEngine(
        spark, cfg,
        corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"),
        delegates=delegates)
    eng.seed([SEED])
    eng.run(max_rounds=100)
    sim = CrawlSimulator(to_simulator_corpus(TINY), cfg,
                         delegates=delegates).crawl(SEED)
    return eng, sim


class TestScalarCall:
    def test_series_contract(self):
        fn = lambda url, depth, ok: ~url.str.contains("x")
        assert scalar_call(fn, "http://a/", 0, True) is True
        assert scalar_call(fn, "http://x/", 0, True) is False


class TestDelegateParity:
    def test_should_crawl_page(self, spark, tiny_corpus_dir, tmp_path):
        dg = CrawlDelegates(
            should_crawl_page=lambda url, depth, is_internal:
                ~url.str.contains("p3", regex=False))
        cfg = CrawlConfig()
        eng, sim = run_both(spark, cfg, dg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim)
        # the delegate actually denied something, with the golden reason
        dis = eng.store.read_events(spark, "disallowed").collect()
        assert any(r["reason"] == REASON_CUSTOM for r in dis)
        assert not any("p3" in r["url"] for r in
                       engine_crawled(spark, eng))

    def test_should_schedule_link_silent(self, spark, tiny_corpus_dir,
                                         tmp_path):
        dg = CrawlDelegates(
            should_schedule_link=lambda src, dst:
                ~dst.str.contains("p5", regex=False))
        cfg = CrawlConfig()
        eng, sim = run_both(spark, cfg, dg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim)
        crawled = {r["url"] for r in engine_crawled(spark, eng)}
        assert not any(u.endswith("/p5") for u in crawled)
        # silent: no disallowed event for the gated link
        dis = eng.store.read_events(spark, "disallowed").collect()
        assert not any(r["reason"] == REASON_CUSTOM for r in dis)
        # ...but the link IS marked known (AddKnownUri always runs)
        from abot_dotnet_core_spark.kernel.urlnorm import url_hash64
        seen = {r["url_hash"] for r in eng._read_seen().collect()}
        assert url_hash64("http://d0.test/p5") in seen

    def test_should_download_and_links_delegates(self, spark,
                                                 tiny_corpus_dir, tmp_path):
        dg = CrawlDelegates(
            should_download_page_content=lambda url, status, ct:
                ~url.str.endswith("/p2"),
            should_crawl_page_links=lambda url, depth, is_internal:
                ~url.str.endswith("/p1"))
        cfg = CrawlConfig()
        eng, sim = run_both(spark, cfg, dg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim, check_text=False)
        rows = {r["url"]: r for r in engine_crawled(spark, eng)}
        # /p2 content not downloaded -> no links extracted from it
        assert rows["http://d0.test/p2"]["links_extracted"] == 0
        # /p1 links suppressed by the custom links gate, with an event
        assert rows["http://d0.test/p1"]["links_extracted"] == 0
        dis = eng.store.read_events(spark, "disallowed").collect()
        assert any(r["reason"] == REASON_CUSTOM
                   and r["url"].endswith("/p1") for r in dis)

    def test_is_internal_override(self, spark, tiny_corpus_dir, tmp_path):
        # treat d1.test as internal too: the cross-domain link gets crawled
        dg = CrawlDelegates(
            is_internal_uri=lambda url:
                url.str.contains("d0.test", regex=False)
                | url.str.contains("d1.test", regex=False))
        cfg = CrawlConfig(max_pages_to_crawl=2000)
        eng, sim = run_both(spark, cfg, dg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim)
        domains = {r["url"].split("/")[2]
                   for r in engine_crawled(spark, eng)}
        assert domains == {"d0.test", "d1.test"}

    def test_clean_url_func(self, spark, tiny_corpus_dir, tmp_path):
        # cleanURLFunc rewrites /p4 hrefs to /p2 before resolution
        def clean(href: str) -> str:
            return href.replace("p4", "p2")
        dg = CrawlDelegates(clean_url=clean)
        cfg = CrawlConfig()
        eng, sim = run_both(spark, cfg, dg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim, check_text=False)
        crawled = {r["url"] for r in engine_crawled(spark, eng)}
        assert "http://d0.test/p4" not in crawled

    def test_combined_big_round_path(self, spark, tiny_corpus_dir, tmp_path):
        """All delegates at once through the Bloom scan-pushdown path."""
        dg = CrawlDelegates(
            should_crawl_page=lambda url, depth, is_internal:
                ~url.str.contains("p3", regex=False),
            should_schedule_link=lambda src, dst:
                ~dst.str.contains("p5", regex=False),
            should_download_page_content=lambda url, status, ct:
                ~url.str.endswith("/p2"),
            clean_url=lambda h: h.replace("p9", "p8"))
        cfg = CrawlConfig(fetch_broadcast_threshold=0)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"),
            delegates=dg)
        eng.seed([SEED])
        eng.run(max_rounds=100)
        sim = CrawlSimulator(to_simulator_corpus(TINY), CrawlConfig(),
                             delegates=dg).crawl(SEED)
        assert_parity(spark, eng, sim, check_text=False)
