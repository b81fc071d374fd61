"""jusText-shaped boilerplate removal: segmentation kernel, classification
arithmetic, context pass, main-content reassembly."""

from abot_dotnet_core_spark.functions.boilerplate import (
    segment_blocks, page_blocks, classify_blocks, main_content)


class TestSegment:
    def test_block_boundaries_and_link_chars(self):
        html = ('<html><body><div><a href="/1">nav one</a> '
                '<a href="/2">nav two</a></div>'
                '<p>plain text</p></body></html>')
        got = segment_blocks(html)
        assert got == [("nav one nav two", 14), ("plain text", 0)]

    def test_script_style_excluded(self):
        html = '<p>keep<script>drop()</script> this</p>'
        assert segment_blocks(html) == [("keep this", 0)]

    def test_br_splits_blocks(self):
        assert segment_blocks("a<br>b") == [("a", 0), ("b", 0)]

    def test_trailing_text_flushed(self):
        assert segment_blocks("<p>one</p>tail") == [("one", 0), ("tail", 0)]

    def test_total_on_junk(self):
        assert segment_blocks(None) == []
        assert segment_blocks("   ") == []
        # malformed markup degrades to text, never raises (total function)
        assert segment_blocks("<><<<") == [("<><<<", 0)]

    def test_inline_tags_do_not_split(self):
        assert segment_blocks("<p>a <b>b</b> <i>c</i></p>") == [("a b c", 0)]


GOOD = ("the cat and the dog are in the house with a ball near town tx "
        "and it was a fine day for all of them to be out there")


def _classify(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return classify_blocks(page_blocks(df), length_low=20, length_high=60,
                           stop_low_millis=300, stop_high_millis=320)


class TestClassify:
    def test_classes_and_context(self, spark):
        html = ('<div><a href="/1">nav one</a> <a href="/2">nav two</a></div>'
                '<p>tiny bit</p>'
                f'<p>{GOOD}</p>'
                '<p>it is a xx day for everyone here</p>')
        rows = {r.block_pos: r for r in
                _classify(spark, [("http://s.test/", html)]).collect()}
        assert rows[0].cls_raw == "bad" and rows[0].cls == "bad"
        assert rows[1].cls_raw == "short"
        assert rows[1].cls == "bad"          # prev neighbor is bad
        assert rows[2].cls_raw == "good" and rows[2].cls == "good"
        assert rows[3].cls_raw == "near_good"
        assert rows[3].cls == "good"         # prev neighbor is good

    def test_short_between_goods_kept(self, spark):
        html = f'<p>{GOOD}</p><p>tiny bit</p><p>{GOOD}</p>'
        rows = {r.block_pos: r for r in
                _classify(spark, [("http://s.test/", html)]).collect()}
        assert rows[1].cls_raw == "short" and rows[1].cls == "good"

    def test_integer_densities(self, spark):
        html = '<div><a href="/1">nav one</a> <a href="/2">nav two</a></div>'
        r = _classify(spark, [("http://s.test/", html)]).collect()[0]
        assert r.n_chars == 15 and r.n_link_chars == 14
        assert r.link_density_millis == 14 * 1000 // 15


class TestMainContent:
    def test_reassembly_order_and_empty(self, spark):
        html = f'<p>{GOOD}</p><p><a href="/x">all nav</a></p><p>{GOOD}</p>'
        out = {r.url: r for r in main_content(
            _classify(spark, [("http://a.test/", html),
                              ("http://b.test/", "<p>x y</p>")])).collect()}
        a = out["http://a.test/"]
        assert a.n_good_blocks == 2
        assert a.main_text == GOOD + "\n" + GOOD
        b = out["http://b.test/"]
        assert b.n_good_blocks == 0 and b.main_text == ""
