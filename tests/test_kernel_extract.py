"""Link + text extraction oracle tests — transcribed from
HyperlinkParserTest.cs (T1-T4) and WebContentExtractor.cs behavior (T5)."""

import pytest

from abot_dotnet_core_spark.kernel.extract import (
    charset_from_body, charset_from_header, clean_charset, extract_links,
    extract_text,
)

PAGE = "http://a.com/"


class TestAnchorAndArea:
    def test_anchor_tags(self):  # :38-49
        html = '<a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
        assert extract_links(html, PAGE) == ["http://aaa.com/", "http://a.com/aaa/a.html"]

    def test_area_tags(self):  # :52-62
        html = '<area href="http://bbb.com" /><area href="bbb/b.html" />'
        assert extract_links(html, PAGE) == ["http://bbb.com/", "http://a.com/bbb/b.html"]

    def test_anchor_upper_case(self):  # :65-75
        html = '<A HREF="http://aaa.com/" ></A><A HREF="/aaa/a.html" /></A>'
        assert extract_links(html, PAGE) == ["http://aaa.com/", "http://a.com/aaa/a.html"]

    def test_area_upper_case(self):  # :78-88
        html = '<AREA HREF="http://bbb.com" /><AREA HREF="bbb/b.html" />'
        assert extract_links(html, PAGE) == ["http://bbb.com/", "http://a.com/bbb/b.html"]

    def test_no_links(self):  # :91-97
        assert extract_links("<html></html>", PAGE) == []

    def test_any_scheme(self):  # :100-112
        html = ('<a href="mailto:aaa@gmail.com" /><a href="tel:+123456789" />'
                '<a href="callto:+123456789" /><a href="ftp://user@yourdomainname.com/" />'
                '<a href="file:///C:/Users/" />')
        assert extract_links(html, PAGE) == [
            "mailto:aaa@gmail.com", "tel:+123456789", "callto:+123456789",
            "ftp://user@yourdomainname.com/", "file:///C:/Users/"]

    def test_invalid_url_skipped(self):  # :115-122
        assert extract_links('<a href="http://////" />', PAGE) == []

    def test_empty_and_whitespace_html(self):  # :228-247
        assert extract_links("", PAGE) == []
        assert extract_links("         ", PAGE) == []
        assert extract_links(None, PAGE) == []


class TestExclusions:
    def test_links_in_comments(self):  # :125-143
        html = """<html><head><!--
            <a href='http://a1.com' /><area href='http://a2.com' />
        --></head><body><!--
            <a href='http://b1.com' /><area href='http://b2.com' />
        --></body></html"""
        assert extract_links(html, PAGE) == []

    def test_links_in_script(self):  # :146-164
        html = """<html><head><script>
            <a href='http://a1.com' /><area href='http://a2.com' />
        </script></head><body><script>
            <a href='http://b1.com' /><area href='http://b2.com' />
        </script></body></html"""
        assert extract_links(html, PAGE) == []

    def test_links_in_style(self):  # :167-185
        html = """<html><head><style>
            <a href='http://a1.com' /><area href='http://a2.com' />
        </style></head><body><style>
            <a href='http://b1.com' /><area href='http://b2.com' />
        </style></body></html"""
        assert extract_links(html, PAGE) == []


class TestDedupAndFragments:
    def test_duplicate_links(self):  # :188-198
        html = '<a href="/aaa/a.html" ></a><a href="/aaa/a.html" /></a>'
        assert extract_links(html, PAGE) == ["http://a.com/aaa/a.html"]

    def test_fragments_stripped(self):  # :201-213
        html = ('<a href="/aaa/a.html" ></a><a href="/aaa/a.html#top" ></a>'
                '<a href="/aaa/a.html#bottom" /></a>'
                '<a href="/aaa/a.html/#someaction/someid" /></a>')
        assert extract_links(html, PAGE) == [
            "http://a.com/aaa/a.html", "http://a.com/aaa/a.html/"]

    def test_fragments_kept_when_enabled(self):  # :216-228
        html = ('<a href="/aaa/a.html" ></a><a href="/aaa/a.html#top" ></a>'
                '<a href="/aaa/a.html#bottom" /></a>'
                '<a href="/aaa/a.html/#someaction/someid" /></a>')
        assert extract_links(html, PAGE, keep_fragment=True) == [
            "http://a.com/aaa/a.html", "http://a.com/aaa/a.html#top",
            "http://a.com/aaa/a.html#bottom",
            "http://a.com/aaa/a.html/#someaction/someid"]


class TestBaseTag:
    def test_valid_base(self):  # :250-260
        html = '<base href="http://bbb.com"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
        assert extract_links(html, PAGE) == ["http://aaa.com/", "http://bbb.com/aaa/a.html"]

    def test_relative_base_uses_page(self):  # :263-273
        html = '<base href="/images"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
        assert extract_links(html, PAGE) == ["http://aaa.com/", "http://a.com/aaa/a.html"]

    def test_invalid_base_uses_page(self):  # :276-286
        html = '<base href="http:http://http:"><a href="http://aaa.com/" ></a><a href="/aaa/a.html" /></a>'
        assert extract_links(html, PAGE) == ["http://aaa.com/", "http://a.com/aaa/a.html"]

    def test_scheme_relative_base_http(self):  # :289-297
        html = '<base href="//aaa.com"><a href="/aaa/a.html" ></a>'
        assert extract_links(html, "http://aaa.com/") == ["http://aaa.com/aaa/a.html"]

    def test_scheme_relative_base_https(self):  # :300-308
        html = '<base href="//aaa.com"><a href="/aaa/a.html" ></a>'
        assert extract_links(html, "https://aaa.com/") == ["https://aaa.com/aaa/a.html"]


class TestResponseUrl:
    def test_response_uri_used(self):  # :311-321 (Issue 82)
        html = '<a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'
        assert extract_links(html, PAGE, response_url="http://zzz.com/") == [
            "http://zzz.com/aaa/a.html", "http://zzz.com/bbb/b.html"]


class TestEntities:
    def test_entity_decoded(self):  # :333-342
        html = '<a href="http://a.com/search?rls=en&amp;q=stack+overflow" ></a>'
        assert extract_links(html, PAGE) == ["http://a.com/search?rls=en&q=stack+overflow"]

    def test_colon_in_url(self):  # :548-556
        html = '<a href="http://www.gamespot.com/pc/rpg/numen/index.html?om_act=convert&om_clk=tabs&tag=tabs;summary" ></a>'
        assert extract_links(html, PAGE) == [
            "http://www.gamespot.com/pc/rpg/numen/index.html?om_act=convert&om_clk=tabs&tag=tabs;summary"]


class TestNoFollow:
    META = '<meta name="robots" content="{}" /><a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'

    def test_meta_not_respected_by_default(self):  # :346-355
        assert len(extract_links(self.META.format("noindex, nofollow"), PAGE)) == 2

    @pytest.mark.parametrize("content", ["noindex, nofollow", "NOINDEX, NOFOLLOW",
                                         "none", "NONE", "nofollow"])
    def test_meta_nofollow(self, content):  # :358-418
        html = self.META.format(content)
        assert extract_links(html, PAGE, respect_meta_robots_nofollow=True) == []

    def test_meta_noindex_only_returns_links(self):  # :421-431
        html = self.META.format("noindex")
        assert len(extract_links(html, PAGE, respect_meta_robots_nofollow=True)) == 2

    LINKS = '<a href="/aaa/a.html" ></a><a href="/bbb/b.html" /></a>'

    @pytest.mark.parametrize("header", ["noindex, nofollow", "NOINDEX, NOFOLLOW",
                                        "none", "NONE", "nofollow"])
    def test_x_robots_nofollow(self, header):  # :435-497
        assert extract_links(self.LINKS, PAGE, x_robots_tag=header,
                             respect_x_robots_nofollow=True) == []

    def test_x_robots_noindex_returns_links(self):  # :500-510
        assert len(extract_links(self.LINKS, PAGE, x_robots_tag="noindex",
                                 respect_x_robots_nofollow=True)) == 2

    @pytest.mark.parametrize("html", [
        '<a href="/aaa/a.html" rel="nofollow"></a><a href="/bbb/b.html" rel="nofollow" /></a>',
        '<a href="/aaa/a.html" REL="NOFOLLOW"></a><a href="/bbb/b.html" REL="NOFOLLOW" /></a>',
    ])
    def test_rel_nofollow(self, html):  # :514-531
        assert extract_links(html, PAGE, respect_anchor_rel_nofollow=True) == []

    def test_rel_nofollow_not_respected_by_default(self):
        html = '<a href="/aaa/a.html" rel="nofollow"></a>'
        assert len(extract_links(html, PAGE)) == 1


class TestCanonical:
    def test_canonical_link(self):  # :558-566 — a-tags first, canonical after
        html = ('<html><head><link rel="canonical" href="http://a.com/page1" /></head>'
                '<body><a href="http://a.com/page2"></a></body></html>')
        assert extract_links(html, PAGE) == ["http://a.com/page2", "http://a.com/page1"]


class TestTextExtraction:
    def test_header_charset_wins(self):
        raw = "héllo wörld".encode("windows-1251", errors="replace")
        cs, text = extract_text(raw, "text/html; charset=windows-1251")
        assert cs == "windows-1251"
        assert text == raw.decode("cp1251")

    def test_meta_charset_sniffed(self):
        body = '<html><head><meta charset="windows-1251"></head>Привет</html>'
        raw = body.encode("windows-1251")
        cs, text = extract_text(raw, "text/html")
        assert cs == "windows-1251"
        assert text == body

    def test_meta_http_equiv_content(self):
        body = ('<html><head><meta http-equiv="Content-Type" '
                'content="text/html; charset=utf-8"></head>héllo</html>')
        raw = body.encode("utf-8")
        cs, text = extract_text(raw, None)
        assert cs == "utf-8"
        assert text == body

    def test_cp1251_alias(self):  # WebContentExtractor.cs:94-101
        assert clean_charset("cp1251") == "windows-1251"
        body = '<meta charset="cp1251">Привет'
        raw = body.encode("windows-1251")
        cs, text = extract_text(raw, None)
        assert cs == "windows-1251"
        assert text == body

    def test_default_utf8(self):
        raw = "plain utf-8 Ω text".encode("utf-8")
        cs, text = extract_text(raw, "text/html")
        assert cs is None
        assert text == "plain utf-8 Ω text"

    def test_bom_stripped(self):
        raw = b"\xef\xbb\xbfhello"
        _, text = extract_text(raw, None)
        assert text == "hello"

    def test_unknown_charset_falls_back_utf8(self):
        raw = "text".encode("utf-8")
        cs, text = extract_text(raw, "text/html; charset=not-a-charset")
        assert text == "text"

    def test_header_parse(self):
        assert charset_from_header("text/html; charset=utf-8") == "utf-8"
        assert charset_from_header('text/html; charset="iso-8859-1"') == "iso-8859-1"
        assert charset_from_header("text/html") is None
        assert charset_from_header(None) is None

    def test_body_regex_group2_semantics(self):
        # exact regex from WebContentExtractor.cs:69
        assert charset_from_body('<meta charset="utf-8">') == "utf-8"
        assert charset_from_body(
            '<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">'
        ) == "windows-1251"
        assert charset_from_body("<html>no meta</html>") is None
        assert charset_from_body(None) is None


class TestAngleSharpVariant:
    """T2 — AngleSharpHyperLinkParser.cs:35-79: a+area in document order
    (one 'a, area' query) and canonical only when it differs from the page
    URL case-insensitively."""

    def test_interleaved_document_order(self):
        from abot_dotnet_core_spark.kernel.extract import extract_links
        html = ('<a href="/a1">x</a><area href="/m1">'
                '<a href="/a2">y</a>')
        hap = extract_links(html, "http://s.test/")
        ang = extract_links(html, "http://s.test/", parser="anglesharp")
        assert hap == ["http://s.test/a1", "http://s.test/a2",
                       "http://s.test/m1"]           # all a, then all area
        assert ang == ["http://s.test/a1", "http://s.test/m1",
                       "http://s.test/a2"]           # document order

    def test_canonical_same_as_page_excluded(self):
        from abot_dotnet_core_spark.kernel.extract import extract_links
        page = "http://s.test/page"
        html = ('<link rel="canonical" href="HTTP://S.TEST/page">'
                '<a href="/x">x</a>')
        hap = extract_links(html, page)
        ang = extract_links(html, page, parser="anglesharp")
        assert "http://s.test/page" in hap            # HAP keeps it
        assert "http://s.test/page" not in ang        # differs only by case

    def test_canonical_different_included_by_both(self):
        from abot_dotnet_core_spark.kernel.extract import extract_links
        page = "http://s.test/page"
        html = '<link rel="canonical" href="http://s.test/other">'
        assert extract_links(html, page) == ["http://s.test/other"]
        assert extract_links(html, page,
                             parser="anglesharp") == ["http://s.test/other"]
