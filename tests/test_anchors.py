"""Anchor-text extraction kernel + per-target aggregation."""

from pyspark.sql import functions as F

from abot_dotnet_core_spark.kernel.extract import extract_anchors
from abot_dotnet_core_spark.functions.anchors import (
    anchor_mentions, anchor_text_agg)


class TestKernel:
    def test_basic_and_duplicates_kept(self):
        html = ('<a href="/a">One</a><a href="/b">Two</a>'
                '<a href="/a">One</a>')
        got = extract_anchors(html, "http://x.test/")
        assert got == [("http://x.test/a", "One"),
                       ("http://x.test/b", "Two"),
                       ("http://x.test/a", "One")]

    def test_whitespace_collapse_and_entities(self):
        html = '<a href="/a">  Tom &amp;\n\t Jerry </a>'
        assert extract_anchors(html, "http://x.test/") == [
            ("http://x.test/a", "Tom & Jerry")]

    def test_nested_markup_text_included(self):
        html = '<a href="/a"><b>Bold</b> plain <i>it</i></a>'
        assert extract_anchors(html, "http://x.test/") == [
            ("http://x.test/a", "Bold plain it")]

    def test_script_inside_anchor_excluded(self):
        html = '<a href="/a">ok<script>var x="no";</script> yes</a>'
        assert extract_anchors(html, "http://x.test/") == [
            ("http://x.test/a", "ok yes")]

    def test_unclosed_anchor_implicitly_closed(self):
        html = '<a href="/a">first <a href="/b">second</a>'
        assert extract_anchors(html, "http://x.test/") == [
            ("http://x.test/a", "first"),
            ("http://x.test/b", "second")]

    def test_hrefless_and_empty_href_skipped(self):
        html = '<a name="top">skip</a><a href=" ">skip</a><a href="/k">k</a>'
        assert extract_anchors(html, "http://x.test/") == [
            ("http://x.test/k", "k")]

    def test_base_href_and_fragment_strip(self):
        html = ('<base href="http://cdn.test/dir/">'
                '<a href="p#frag">txt</a>')
        assert extract_anchors(html, "http://x.test/") == [
            ("http://cdn.test/dir/p", "txt")]

    def test_total_on_junk(self):
        assert extract_anchors(None, "http://x.test/") == []
        assert extract_anchors("", "http://x.test/") == []
        # non-http schemes pass through, same as extract_links — the
        # decision cascade (P3) owns scheme filtering
        assert extract_anchors("<a href='mailto:x@y'>m</a>",
                               "http://x.test/") == [("mailto:x@y", "m")]


class TestAgg:
    def test_counts_sources_and_tie_break(self, spark):
        # target /t: "B" x2 (from 2 sources), "A" x2 (from 1 source) ->
        # tie on count, "A" wins lexicographically
        pages = spark.createDataFrame([
            ("http://s.test/p1",
             '<a href="/t">B</a><a href="/t">A</a><a href="/t">A</a>'),
            ("http://s.test/p2", '<a href="/t">B</a><a href="/u">C</a>'),
        ], "url string, html string")
        m = anchor_mentions(pages)
        assert m.count() == 5
        rows = {r.target_url: r for r in anchor_text_agg(m).collect()}
        t = rows["http://s.test/t"]
        assert (t.n_mentions, t.n_sources) == (4, 2)
        assert (t.top_anchor, t.top_anchor_count) == ("A", 2)
        u = rows["http://s.test/u"]
        assert (u.n_mentions, u.n_sources, u.top_anchor) == (1, 1, "C")

    def test_mention_pos_document_order(self, spark):
        pages = spark.createDataFrame(
            [("http://s.test/", '<a href="/1">x</a><a href="/2">y</a>')],
            "url string, html string")
        got = anchor_mentions(pages).orderBy("mention_pos").collect()
        assert [(r.mention_pos, r.target_url) for r in got] == [
            (0, "http://s.test/1"), (1, "http://s.test/2")]
