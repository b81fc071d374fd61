"""Distributed robots parsing: the Arrow-UDF parse and the JVM-side delay
expression must match the pure-Python kernel exactly (no driver-side
iterrows anywhere in the robots path)."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.functions.udfs import make_robots_parse_udf
from abot_dotnet_core_spark.kernel.decisions import effective_domain_delay_ms
from abot_dotnet_core_spark.kernel.robots import parse_robots, rules_to_flat
from abot_dotnet_core_spark.sources.corpus import _ROBOTS_VARIANTS


class TestParseUdf:
    def test_matches_kernel_on_fixture_variants(self, spark):
        texts = [t for t in _ROBOTS_VARIANTS if t is not None] + [
            "User-agent: abot\nDisallow: /private\nCrawl-delay: 7\n",
            "",
        ]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "i int, robots_txt string")
        parse = make_robots_parse_udf("abot")
        got = {r["i"]: (r["p"]["rules_flat"], r["p"]["crawl_delay_s"])
               for r in df.select("i", parse(F.col("robots_txt"))
                                  .alias("p")).collect()}
        for i, t in enumerate(texts):
            rules = parse_robots(t)
            assert got[i] == (rules_to_flat(rules), rules.crawl_delay("abot"))


class TestDelayExpression:
    @pytest.mark.parametrize("min_ms,max_s", [
        (0, 5), (1000, 5), (2500, 5), (1000, 0), (7000, 2), (0, 0)])
    def test_matches_kernel(self, spark, min_ms, max_s):
        cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=min_ms,
                          max_robots_dot_text_crawl_delay_in_seconds=max_s,
                          is_respect_robots_dot_text_enabled=True)
        delays = [0, 1, 2, 5, 6, 20]
        eng = CrawlEngine.__new__(CrawlEngine)
        eng.spark = spark
        eng.cfg = cfg
        eng._robots_df = spark.createDataFrame(
            [(f"d{s}.test", [], s) for s in delays],
            "domain string, rules_flat array<string>, crawl_delay_s int")
        got = {r["domain"]: r["delay_ms"]
               for r in eng._domain_state_df().collect()}
        for s in delays:
            assert got[f"d{s}.test"] == effective_domain_delay_ms(cfg, s), \
                f"min_ms={min_ms} max_s={max_s} s={s}"


class TestNoDriverSideRobots:
    def test_load_robots_is_distributed(self, spark, tiny_corpus_dir,
                                        tmp_path, monkeypatch):
        """The robots load must never call DataFrame.toPandas on the full
        table (seed() may fetch only the seed domains' rows)."""
        cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"),
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        df = eng._load_robots()
        assert df is not None
        assert eng._robots_count == df.count() > 0
        # parsed columns present and usable without any pandas round-trip
        row = df.filter(F.size("rules_flat") > 0).first()
        assert row is not None
