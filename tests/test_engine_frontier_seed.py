"""Frontier-seeded crawls (seed_from_frontier): per-row internality from the
root_domains state table, robots gating of seeded roots, and resume fallback
for pre-next_seq checkpoints."""

import json
import os

from pyspark.sql import functions as F

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine


def make_engine(spark, cfg, corpus_dir, store_root, robots=True):
    return CrawlEngine(
        spark, cfg,
        corpus_path=f"{corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
        store_root=store_root,
        robots_path=f"{corpus_dir}/robots.parquet" if robots else None)


class TestFrontierSeededGrowth:
    def test_crawl_grows_past_seeds_and_stays_internal(
            self, spark, tiny_corpus_dir, tmp_path):
        """With default config (external crawling disabled) a frontier-seeded
        crawl must still grow: links into seeded domains are internal; links
        into non-seeded domains are rejected as external."""
        cfg = CrawlConfig()
        eng = make_engine(spark, cfg, tiny_corpus_dir,
                          str(tmp_path / "state"))
        urls = spark.createDataFrame(
            [("http://d0.test/",), ("http://d1.test/",)], "url string")
        eng.seed_from_frontier(urls)
        eng.run(max_rounds=50)

        rows = eng.store.read_events(spark, "crawled").collect()
        crawled = {r["url"] for r in rows}
        assert len(crawled) > 2, "frontier-seeded crawl never grew"
        domains = {u.split("/")[2] for u in crawled}
        assert domains == {"d0.test", "d1.test"}

    def test_root_domains_survive_resume(self, spark, tiny_corpus_dir,
                                         tmp_path):
        cfg = CrawlConfig()
        store = str(tmp_path / "state")
        eng = make_engine(spark, cfg, tiny_corpus_dir, store)
        urls = spark.createDataFrame(
            [("http://d0.test/",), ("http://d1.test/",)], "url string")
        eng.seed_from_frontier(urls)
        eng.run(max_rounds=1)
        assert eng.n_root_domains == 2

        eng2 = CrawlEngine.resume(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=store,
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        assert eng2.n_root_domains == 2
        assert eng2._root_domains_df is not None
        eng2.run(max_rounds=50)
        rows = eng2.store.read_events(spark, "crawled").collect()
        domains = {r["url"].split("/")[2] for r in rows}
        assert domains == {"d0.test", "d1.test"}

    def test_robots_gate_applies_to_seeded_frontier(
            self, spark, tiny_corpus_dir, tmp_path):
        """A seeded URL disallowed by its domain's robots.txt must be dropped
        at seeding (the same robots-first gate seed() applies to roots)."""
        from abot_dotnet_core_spark.sources.corpus import (
            TINY, domain_name, robots_txt_for)
        from abot_dotnet_core_spark.kernel.robots import (
            parse_robots, is_url_allowed)
        blocked = None
        for i in range(TINY.n_domains):
            txt = robots_txt_for(TINY, i)
            if txt and "Disallow: /blocked" in txt:
                blocked = f"http://{domain_name(i)}/blocked/x"
                break
        assert blocked is not None, "fixture has no /blocked robots domain"

        cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
        eng = make_engine(spark, cfg, tiny_corpus_dir,
                          str(tmp_path / "state"))
        urls = spark.createDataFrame(
            [(blocked,), ("http://d0.test/",)], "url string")
        eng.seed_from_frontier(urls)
        fr = eng.store.read_table(spark, "frontier", 0)
        seeded = {r["url"] for r in fr.collect()}
        assert blocked not in seeded
        assert "http://d0.test/" in seeded


class TestResumeNextSeqFallback:
    def test_resume_without_next_seq_counter(self, spark, tiny_corpus_dir,
                                             tmp_path):
        """Checkpoints committed before next_seq existed must still resume
        (high-water mark recomputed from the persisted frontier)."""
        cfg = CrawlConfig()
        store = str(tmp_path / "state")
        eng = make_engine(spark, cfg, tiny_corpus_dir, store)
        eng.seed(["http://d0.test/"])
        eng.run(max_rounds=2)
        want_next = eng.next_seq

        # strip next_seq from the latest manifest (simulating an old commit)
        last = eng.store.latest_round()
        path = eng.store._commit_path(last)
        with open(path) as f:
            manifest = json.load(f)
        manifest["counters"].pop("next_seq")
        with open(path, "w") as f:
            json.dump(manifest, f)

        eng2 = CrawlEngine.resume(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=store,
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        # recomputed mark must cover every persisted frontier row
        fr = eng2.store.read_table(spark, "frontier", last)
        max_seq = fr.agg(F.max("priority_seq")).collect()[0][0]
        assert eng2.next_seq == (max_seq if max_seq is not None else -1) + 1
        assert eng2.next_seq <= want_next
        eng2.run(max_rounds=50)  # completes without KeyError
