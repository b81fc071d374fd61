"""Property-based tests (hypothesis) for the pure-Python semantic kernel.

The reference ships no property tests (SURVEY.md §5); these pin the
INVARIANTS the distributed design rests on, beyond the NUnit-transcribed
example tables:

- normalize_url is idempotent and total (never raises) — the seen-set is
  keyed by normalized form, so double-normalization must be a no-op or the
  same URL could occupy two seen slots across rounds.
- url_hash64 is a pure function of the normalized string with the exact
  CompactCrawledUrlRepository bit layout (signed int64, first 8 MD5 bytes
  little-endian) — recomputed here independently against hashlib.
- resolve_href output, when non-None, is already in normalized form
  (extraction feeds the frontier directly; a non-canonical link would
  bypass dedup).
- robots: parse_robots is total on arbitrary text; the flat Arrow encoding
  round-trips losslessly (broadcast path == kernel path); external URLs
  always bypass (RobotsDotText.cs:53-59); a '/'-disallow-all group denies
  every path under the root for its agent.
- extract_text is total on arbitrary bytes and returns (str|None, str).
"""

import hashlib
import string

from hypothesis import given, settings, strategies as st

from abot_dotnet_core_spark.kernel.extract import extract_links, extract_text
from abot_dotnet_core_spark.kernel.robots import (
    flat_to_rules, is_url_allowed, parse_robots, rules_to_flat)
from abot_dotnet_core_spark.kernel.urlnorm import (
    authority, is_base_of, normalize_url, path_of, resolve_href, url_hash64)

# -- URL strategies ----------------------------------------------------------

_host = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9\-]{0,10}[a-zA-Z0-9])?"
                      r"(\.[a-zA-Z]{2,6}){1,2}", fullmatch=True)
_path = st.lists(
    st.text(string.ascii_letters + string.digits + "._~%-", min_size=0,
            max_size=8),
    min_size=0, max_size=4).map(lambda segs: "/" + "/".join(segs))
_query = st.one_of(st.just(""), st.text(
    string.ascii_letters + string.digits + "=&;%", max_size=12).map(
        lambda q: f"?{q}"))
_port = st.one_of(st.just(""), st.integers(1, 65535).map(lambda p: f":{p}"))


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
    return (f"{scheme}://{draw(_host)}{draw(_port)}"
            f"{draw(_path)}{draw(_query)}")


# -- normalize / hash --------------------------------------------------------

@settings(max_examples=300)
@given(http_urls())
def test_normalize_idempotent(url):
    once = normalize_url(url)
    assert once is not None
    assert normalize_url(once) == once


@settings(max_examples=300)
@given(st.text(max_size=40))
def test_normalize_total_on_garbage(s):
    out = normalize_url(s)          # never raises; None or a str
    assert out is None or isinstance(out, str)
    if out is not None:
        assert normalize_url(out) == out


@settings(max_examples=200)
@given(http_urls())
def test_hash64_reference_bit_layout(url):
    u = normalize_url(url)
    h = url_hash64(u)
    # independent recomputation of CompactCrawledUrlRepository.cs:35-46:
    # sum(md5[i] << 8*i) in unchecked C# long arithmetic
    digest = hashlib.md5(u.encode("utf-8")).digest()
    acc = 0
    for i in range(8):
        acc = (acc + (digest[i] << (8 * i))) & ((1 << 64) - 1)
    want = acc - (1 << 64) if acc >= (1 << 63) else acc
    assert h == want
    assert -(1 << 63) <= h < (1 << 63)


@settings(max_examples=200)
@given(http_urls(), _path)
def test_resolve_href_emits_normalized(base, href):
    base_n = normalize_url(base)
    out = resolve_href(base_n, href)
    if out is not None:
        # frontier links must already be canonical or dedup is broken
        assert normalize_url(out) == out
        if not href.startswith("//"):
            # '//x' is scheme-relative and legitimately rebinds authority
            # (HyperlinkParserTest.cs:286-307); every other generated href
            # here is path-only and must stay on the base's authority
            assert authority(out) == authority(base_n)


# -- robots ------------------------------------------------------------------

@settings(max_examples=200)
@given(st.text(max_size=300))
def test_parse_robots_total(txt):
    rules = parse_robots(txt)               # hostile input never raises
    assert rules.allowed_path("/", "abot") in (True, False)
    # Arrow flat encoding round-trips to identical decisions
    rt = flat_to_rules(rules_to_flat(rules))
    for p in ("/", "/a", "/a/b.html"):
        assert rt.allowed_path(p, "abot") == rules.allowed_path(p, "abot")


@settings(max_examples=200)
@given(http_urls(), http_urls())
def test_robots_external_bypass(root, url):
    root_n, url_n = normalize_url(root), normalize_url(url)
    rules = parse_robots("User-agent: *\nDisallow: /\n")
    if not is_base_of(root_n, url_n):
        assert is_url_allowed(rules, root_n, url_n, "abot")


@settings(max_examples=200)
@given(http_urls())
def test_robots_disallow_all_denies_under_root(url):
    u = normalize_url(url)
    root = f"{u.split('://')[0]}://{authority(u)}/"
    rules = parse_robots("User-agent: *\nDisallow: /\n")
    assert is_url_allowed(rules, root, u, "abot") is False
    assert path_of(u).startswith("/")


# -- extraction --------------------------------------------------------------

@settings(max_examples=200)
@given(st.binary(max_size=400), st.one_of(
    st.none(), st.just("text/html"),
    st.just("text/html; charset=utf-8"),
    st.just("text/html; charset=windows-1251"),
    st.text(string.printable, max_size=30)))
def test_extract_text_total(raw, ctype):
    charset, text = extract_text(raw, ctype)
    assert isinstance(text, str)
    assert charset is None or isinstance(charset, str)


@settings(max_examples=150)
@given(st.text(string.printable, max_size=200), http_urls())
def test_extract_links_total_and_absolute(html, page_url):
    base = normalize_url(page_url)
    links = extract_links(html, base)
    for l in links:
        assert isinstance(l.url, str)
        # every emitted link is canonical-absolute (frontier contract)
        assert normalize_url(l.url) == l.url


# --- round-2 kernels: sitemap parse, anchor text, block segmentation -------

@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_parse_sitemap_total_on_bytes(raw):
    from abot_dotnet_core_spark.sources.sitemap import parse_sitemap
    kind, entries = parse_sitemap(raw)
    assert kind in (None, "urlset", "sitemapindex")
    for e in entries:
        assert e["loc"]
        assert 0 <= e["priority_millis"] <= 1000


@given(st.text(max_size=400))
@settings(max_examples=200, deadline=None)
def test_parse_sitemap_total_on_text(txt):
    from abot_dotnet_core_spark.sources.sitemap import parse_sitemap
    parse_sitemap(txt)          # must never raise


@given(st.lists(st.tuples(st.text(string.ascii_lowercase + "/", min_size=1,
                                  max_size=12),
                          # XML 1.0 forbids most control chars (\x0b, \x0c,
                          # ...): ElementTree correctly rejects documents
                          # containing them, so draw only legal text here
                          st.text(string.ascii_letters + string.digits
                                  + string.punctuation + " \t\n",
                                  max_size=20)),
                max_size=8))
@settings(max_examples=100, deadline=None)
def test_parse_sitemap_urlset_roundtrip(entries):
    """Entries written as well-formed XML come back verbatim (escaped),
    in document order, with default priority."""
    from xml.sax.saxutils import escape
    from abot_dotnet_core_spark.sources.sitemap import parse_sitemap
    xml = "<urlset>" + "".join(
        f"<url><loc>{escape(loc)}</loc><lastmod>{escape(lm)}</lastmod></url>"
        for loc, lm in entries) + "</urlset>"
    kind, got = parse_sitemap(xml)
    assert kind == "urlset"
    # entries whose loc strips to empty are dropped; others keep order
    expect = [(loc, lm.strip() or None) for loc, lm in entries
              if loc.strip()]
    assert [(e["loc"], e["lastmod"]) for e in got] == \
        [(loc.strip(), lm) for loc, lm in expect]
    assert all(e["priority_millis"] == 500 for e in got)


@given(st.text(max_size=600), st.sampled_from(
    ["http://a.test/", "http://b.test/x/y", "https://c.test/p?q=1"]))
@settings(max_examples=200, deadline=None)
def test_extract_anchors_total_and_resolved(html, page_url):
    from abot_dotnet_core_spark.kernel.extract import extract_anchors
    for target, text in extract_anchors(html, page_url):
        assert isinstance(target, str) and isinstance(text, str)
        assert text == text.strip()
        assert "\n" not in text and "\t" not in text


@given(st.text(max_size=600))
@settings(max_examples=200, deadline=None)
def test_segment_blocks_total_and_collapsed(html):
    from abot_dotnet_core_spark.functions.boilerplate import segment_blocks
    for text, n_link in segment_blocks(html):
        assert text.strip() == text and text != ""
        assert "\n" not in text
        assert 0 <= n_link
