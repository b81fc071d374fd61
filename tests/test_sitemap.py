"""Sitemap ingestion: kernel parse + Spark explode/recursion/frontier seed."""

import gzip

import pytest
from pyspark.sql import Row, functions as F

from abot_dotnet_core_spark.sources.sitemap import (
    parse_sitemap, sitemap_entries, sitemaps_from_robots, resolve_sitemaps,
    sitemap_frontier)


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.test/p1</loc><lastmod>2024-03-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://a.test/q?x=1&amp;y=2</loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://a.test/p2</loc><priority>junk</priority></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.test/sm1.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
  <sitemap><loc>http://a.test/sm2.xml</loc></sitemap>
</sitemapindex>"""


class TestKernel:
    def test_urlset(self):
        kind, entries = parse_sitemap(URLSET)
        assert kind == "urlset"
        # the loc-less <url> is dropped; entities in loc are decoded
        assert [e["loc"] for e in entries] == [
            "http://a.test/p1", "http://a.test/q?x=1&y=2", "http://a.test/p2"]
        assert entries[0]["lastmod"] == "2024-03-01"
        assert entries[0]["changefreq"] == "daily"
        assert entries[0]["priority_millis"] == 800
        # absent / junk priority -> default 500
        assert entries[1]["priority_millis"] == 500
        assert entries[2]["priority_millis"] == 500

    def test_sitemapindex(self):
        kind, entries = parse_sitemap(INDEX)
        assert kind == "sitemapindex"
        assert [e["loc"] for e in entries] == [
            "http://a.test/sm1.xml", "http://a.test/sm2.xml"]
        assert entries[0]["lastmod"] == "2024-02-02"
        assert entries[0]["changefreq"] is None

    def test_gzip_bytes(self):
        kind, entries = parse_sitemap(gzip.compress(URLSET.encode()))
        assert kind == "urlset" and len(entries) == 3

    def test_no_namespace_and_case(self):
        kind, entries = parse_sitemap(
            "<urlset><url><loc>http://b.test/</loc>"
            "<priority>1.0</priority></url></urlset>")
        assert kind == "urlset"
        assert entries[0]["priority_millis"] == 1000

    @pytest.mark.parametrize("raw", [
        None, "", b"", "not xml <", "<html><body/></html>",
        b"\x1f\x8bnot-really-gzip", "<urlset><url></url></urlset>"])
    def test_total_on_junk(self, raw):
        kind, entries = parse_sitemap(raw)
        assert entries == []

    def test_priority_out_of_range(self):
        _, e = parse_sitemap(
            "<urlset><url><loc>u</loc><priority>7.5</priority></url>"
            "<url><loc>v</loc><priority>-0.1</priority></url></urlset>")
        assert [x["priority_millis"] for x in e] == [500, 500]


class TestSpark:
    def test_entries_explode(self, spark):
        df = spark.createDataFrame(
            [("http://a.test/sitemap.xml", URLSET.encode()),
             ("http://a.test/idx.xml", INDEX.encode()),
             ("http://a.test/bad.xml", b"garbage")],
            "url string, body binary")
        rows = (sitemap_entries(df).orderBy("sitemap_url", "entry_pos")
                .collect())
        assert [(r.sitemap_url, r.kind, r.entry_pos, r.loc) for r in rows] == [
            ("http://a.test/idx.xml", "sitemapindex", 0, "http://a.test/sm1.xml"),
            ("http://a.test/idx.xml", "sitemapindex", 1, "http://a.test/sm2.xml"),
            ("http://a.test/sitemap.xml", "urlset", 0, "http://a.test/p1"),
            ("http://a.test/sitemap.xml", "urlset", 1, "http://a.test/q?x=1&y=2"),
            ("http://a.test/sitemap.xml", "urlset", 2, "http://a.test/p2"),
        ]

    def test_robots_directives(self, spark):
        robots = spark.createDataFrame([
            ("a.test", "User-agent: *\nDisallow: /x\n"
                       "Sitemap: http://a.test/sm.xml\n"
                       "Sitemap: http://a.test/sm2.xml"),
            ("b.test", "User-agent: *\nAllow: /"),
            ("c.test", None),
        ], "domain string, robots_txt string")
        got = (sitemaps_from_robots(robots).orderBy("domain", "sitemap_pos")
               .collect())
        assert [(r.domain, r.sitemap_url) for r in got] == [
            ("a.test", "http://a.test/sm.xml"),
            ("a.test", "http://a.test/sm2.xml")]

    def test_resolve_recursion_and_cycle(self, spark):
        # idx -> (sm1, idx2); idx2 -> (sm2, idx  <- cycle, already visited)
        idx2 = ("<sitemapindex>"
                "<sitemap><loc>http://a.test/sm2.xml</loc></sitemap>"
                "<sitemap><loc>http://a.test/idx.xml</loc></sitemap>"
                "</sitemapindex>")
        idx = ("<sitemapindex>"
               "<sitemap><loc>http://a.test/sm1.xml</loc></sitemap>"
               "<sitemap><loc>http://a.test/idx2.xml</loc></sitemap>"
               "</sitemapindex>")
        sm = "<urlset><url><loc>http://a.test/page%d</loc></url></urlset>"
        bodies = spark.createDataFrame(
            [("http://a.test/idx.xml", idx.encode()),
             ("http://a.test/idx2.xml", idx2.encode()),
             ("http://a.test/sm1.xml", (sm % 1).encode()),
             ("http://a.test/sm2.xml", (sm % 2).encode())],
            "url string, body binary")
        roots = spark.createDataFrame(
            [Row(sitemap_url="http://a.test/idx.xml")])
        got = resolve_sitemaps(bodies, roots, max_depth=5)
        assert sorted(r.loc for r in got.collect()) == [
            "http://a.test/page1", "http://a.test/page2"]

    def test_frontier_priority_order(self, spark):
        df = spark.createDataFrame(
            [("s", "urlset", 0, "http://a.test/low", None, None, 100),
             ("s", "urlset", 1, "http://a.test/high", None, None, 900)],
            "sitemap_url string, kind string, entry_pos int, loc string, "
            "lastmod string, changefreq string, priority_millis int")
        assert [r.url for r in sitemap_frontier(df).collect()] == [
            "http://a.test/high", "http://a.test/low"]


class TestEngineSeed:
    def test_sitemap_seeds_crawl(self, spark, tiny_corpus_dir, tmp_path):
        """End-to-end: robots Sitemap directive -> resolve -> frontier ->
        CrawlEngine.seed_from_frontier -> crawl grows from the sitemap
        seeds (the Common-Crawl bootstrap path)."""
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.crawler import CrawlEngine

        robots = spark.createDataFrame(
            [("d0.test", "User-agent: *\nAllow: /\n"
                         "Sitemap: http://d0.test/sitemap.xml")],
            "domain string, robots_txt string")
        sm_xml = ("<urlset>"
                  "<url><loc>http://d0.test/</loc>"
                  "<priority>0.9</priority></url>"
                  "</urlset>")
        bodies = spark.createDataFrame(
            [("http://d0.test/sitemap.xml", sm_xml.encode())],
            "url string, body binary")

        roots = sitemaps_from_robots(robots)
        entries = resolve_sitemaps(bodies, roots)
        frontier = sitemap_frontier(entries)
        assert [r.url for r in frontier.collect()] == ["http://d0.test/"]

        eng = CrawlEngine(
            spark, CrawlConfig(),
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed_from_frontier(frontier)
        eng.run(max_rounds=10)
        crawled = {r["url"] for r in
                   eng.store.read_events(spark, "crawled").collect()}
        assert "http://d0.test/" in crawled
        assert len(crawled) > 1      # grew past the sitemap seed via links
        assert {u.split("/")[2] for u in crawled} == {"d0.test"}
