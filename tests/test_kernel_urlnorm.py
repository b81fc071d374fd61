"""URL normalization / hashing oracle tests.

Cases transcribed from the reference's observable .NET Uri behavior as pinned
by HyperlinkParserTest.cs and CompactCrawledUrlRepository.cs.
"""

import hashlib

import pytest

from abot_dotnet_core_spark.kernel.urlnorm import (
    authority, effective_base, is_base_of, normalize_url, resolve_href,
    url_hash64,
)


class TestNormalize:
    @pytest.mark.parametrize("raw,expected", [
        # trailing slash added for empty http path (HyperlinkParserTest.cs:53)
        ("http://bbb.com", "http://bbb.com/"),
        ("http://aaa.com/", "http://aaa.com/"),
        # scheme+host lowercased
        ("HTTP://AAA.Com/Path", "http://aaa.com/Path"),
        # default port stripped
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        # query preserved incl. ';' (HyperlinkParserTest.cs:548-555)
        ("http://www.gamespot.com/pc/rpg/numen/index.html?om_act=convert&om_clk=tabs&tag=tabs;summary",
         "http://www.gamespot.com/pc/rpg/numen/index.html?om_act=convert&om_clk=tabs&tag=tabs;summary"),
        # any-scheme pass-through (HyperlinkParserTest.cs:100-112)
        ("mailto:aaa@gmail.com", "mailto:aaa@gmail.com"),
        ("tel:+123456789", "tel:+123456789"),
        ("callto:+123456789", "callto:+123456789"),
        ("ftp://user@yourdomainname.com/", "ftp://user@yourdomainname.com/"),
        ("file:///C:/Users/", "file:///C:/Users/"),
        # dot-segment collapse
        ("http://a.com/x/../y", "http://a.com/y"),
        ("http://a.com/x/./y", "http://a.com/x/y"),
    ])
    def test_normalize(self, raw, expected):
        assert normalize_url(raw) == expected

    @pytest.mark.parametrize("raw", [
        "http://////",           # HyperlinkParserTest.cs:115-122 (invalid)
        "", "   ", None, "no-scheme-here",
    ])
    def test_invalid(self, raw):
        assert normalize_url(raw) is None


class TestResolve:
    @pytest.mark.parametrize("base,href,expected", [
        ("http://a.com/", "http://aaa.com/", "http://aaa.com/"),
        ("http://a.com/", "/aaa/a.html", "http://a.com/aaa/a.html"),
        ("http://a.com/", "bbb/b.html", "http://a.com/bbb/b.html"),
        ("http://a.com/", "http://bbb.com", "http://bbb.com/"),
        # fragment stripped before resolution (HyperlinkParserTest.cs:201-213)
        ("http://a.com/", "/aaa/a.html#top", "http://a.com/aaa/a.html"),
        ("http://a.com/", "/aaa/a.html/#someaction/someid", "http://a.com/aaa/a.html/"),
        # fragment-only href resolves to the base itself
        ("http://a.com/x", "#top", "http://a.com/x"),
        # entity-decoded href with query (HyperlinkParserTest.cs:333-342)
        ("http://a.com/", "http://a.com/search?rls=en&q=stack+overflow",
         "http://a.com/search?rls=en&q=stack+overflow"),
        ("http://a.com/", "mailto:aaa@gmail.com", "mailto:aaa@gmail.com"),
        ("http://a.com/", "http://////", None),
    ])
    def test_resolve(self, base, href, expected):
        assert resolve_href(base, href) == expected

    def test_keep_fragment(self):
        assert resolve_href("http://a.com/", "/a.html#top", keep_fragment=True) \
            == "http://a.com/a.html#top"


class TestEffectiveBase:
    # HyperlinkParserTest.cs:250-307
    def test_valid_base(self):
        assert effective_base("http://a.com/", None, "http://bbb.com") == "http://bbb.com/"

    def test_relative_base_falls_back(self):
        assert effective_base("http://a.com/", None, "/images") == "http://a.com/"

    def test_invalid_base_falls_back(self):
        assert effective_base("http://a.com/", None, "http:http://http:") == "http://a.com/"

    def test_scheme_relative_base_http(self):
        assert effective_base("http://aaa.com/", None, "//aaa.com") == "http://aaa.com/"

    def test_scheme_relative_base_https(self):
        assert effective_base("https://aaa.com/", None, "//aaa.com") == "https://aaa.com/"

    def test_response_url_preferred(self):
        # HyperlinkParserTest.cs:311-321 (Issue 82)
        assert effective_base("http://a.com/", "http://zzz.com/", None) == "http://zzz.com/"


class TestAuthority:
    @pytest.mark.parametrize("url,expected", [
        ("http://A.com/x", "a.com"),
        ("http://a.com:8080/x", "a.com:8080"),
        ("http://a.com:80/x", "a.com"),
        ("https://sub.b.org/", "sub.b.org"),
    ])
    def test_authority(self, url, expected):
        assert authority(url) == expected


class TestIsBaseOf:
    # RobotsDotText.cs:55-56 external bypass relies on this
    def test_same_domain(self):
        assert is_base_of("http://www.spidertestsite1.com/",
                          "http://www.spidertestsite1.com/disallowedfolder/")

    def test_external(self):
        assert not is_base_of("http://www.spidertestsite1.com/", "http://yahoo.com/")

    def test_scheme_mismatch(self):
        assert not is_base_of("http://a.com/", "https://a.com/")


class TestUrlHash64:
    def test_matches_md5_prefix_little_endian(self):
        # CompactCrawledUrlRepository.cs:35-46 formula, independent recompute
        for u in ["http://a.com/", "http://a.com/aaa/a.html",
                  "https://x.org/path?q=1", "http://a.com/\u00e9"]:
            digest = hashlib.md5(u.encode("utf-8")).digest()
            expected = sum(digest[i] << (i * 8) for i in range(8))
            if expected >= 1 << 63:
                expected -= 1 << 64
            assert url_hash64(u) == expected

    def test_signed_range(self):
        vals = [url_hash64(f"http://a.com/{i}") for i in range(200)]
        assert any(v < 0 for v in vals) and any(v > 0 for v in vals)
        assert all(-(1 << 63) <= v < (1 << 63) for v in vals)

    def test_distinct(self):
        vals = {url_hash64(f"http://a.com/p{i}") for i in range(10000)}
        assert len(vals) == 10000
