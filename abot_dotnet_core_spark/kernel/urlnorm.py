"""URL canonicalization, resolution and 64-bit identity hashing.

Reproduces the observable behavior of .NET ``System.Uri`` as exercised by the
reference's tests (it is the identity function of the whole crawler: every
dedup/lookup keys on ``Uri.AbsoluteUri``):

- scheme + host lowercased, default port stripped, empty http(s)/ftp path
  becomes "/"  (HyperlinkParserTest.cs:49-60 expects "http://bbb.com" ->
  "http://bbb.com/")
- fragment stripped *before* resolution when configured
  (HyperLinkParser.cs:105-107 splits on '#')
- any-scheme absolute hrefs pass through (mailto:, tel:, callto:, ftp:,
  file: — HyperlinkParserTest.cs:100-112)
- "http://////" (empty host) is invalid (HyperlinkParserTest.cs:115-122)

The 64-bit id reproduces ``CompactCrawledUrlRepository.ComputeNumericId``
(/root/reference/Abot/src/Abot/Core/CompactCrawledUrlRepository.cs:35-46):
little-endian assembly of the first 8 MD5 bytes, wrapped to signed int64.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "ws": 80, "wss": 443}
# Schemes .NET Uri treats as hierarchical with a host component.
_HOST_SCHEMES = {"http", "https", "ftp", "ws", "wss"}


def normalize_url(url: str) -> str | None:
    """Canonical absolute form (the ``Uri.AbsoluteUri`` equivalent).

    Returns None if the URL is not a valid absolute URI.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if not scheme:
        return None
    if scheme in _HOST_SCHEMES:
        host = parts.hostname
        if not host:
            return None  # e.g. "http://////" — .NET throws UriFormatException
        host = host.lower()
        netloc = host
        if parts.port is not None and parts.port != _DEFAULT_PORTS.get(scheme):
            netloc = f"{host}:{parts.port}"
        if parts.username:
            userinfo = parts.username
            if parts.password is not None:
                userinfo += f":{parts.password}"
            netloc = f"{userinfo}@{netloc}"
        path = parts.path or "/"
        path = _collapse_dots(path)
        return urlunsplit((scheme, netloc, path, parts.query, parts.fragment))
    # Non-hierarchical schemes (mailto:, tel:, callto:, file:, ...): keep the
    # original form with only the scheme lowercased, matching AbsoluteUri.
    rest = url[len(parts.scheme) + 1:]
    return f"{scheme}:{rest}"


def _collapse_dots(path: str) -> str:
    """RFC 3986 5.2.4 remove_dot_segments (what .NET path normalization does)."""
    if "." not in path:
        return path
    output: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
            continue
        output.append(seg)
    # Preserve a trailing slash implied by ./ or ../ at the end
    if path.endswith(("/.", "/..")) and output and output[-1] != "":
        output.append("")
    norm = "/".join(output)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def strip_fragment(href: str) -> str:
    """HyperLinkParser.cs:105-107 — everything after the first '#' is dropped
    (before resolution) unless IsRespectUrlNamedAnchorOrHashbangEnabled."""
    return href.split("#")[0]


def resolve_href(base_url: str, href: str, keep_fragment: bool = False) -> str | None:
    """Resolve an href against a base the way ``new Uri(baseUri, href)`` does.

    Returns the normalized absolute URL, or None when unparsable
    (the reference logs-and-skips, HyperLinkParser.cs:117-121).
    """
    if href is None:
        return None
    h = href if keep_fragment else strip_fragment(href)
    h = h.strip()
    if not h and not keep_fragment:
        # "<a href='#top'>" with fragments stripped resolves to the base itself
        return normalize_url(base_url)
    try:
        parts = urlsplit(h)
    except ValueError:
        return None
    if parts.scheme:
        # Absolute href: validated on its own ("http://////" must fail the
        # way new Uri(...) throws, not inherit the base authority).
        return normalize_url(h)
    try:
        joined = urljoin(base_url, h)
    except ValueError:
        return None
    return normalize_url(joined)


def effective_base(page_url: str, response_url: str | None, base_href: str | None) -> str:
    """Base-URI selection — HyperLinkParser.cs:80-96.

    Order: valid absolute <base href> (with ``//host`` getting the page
    scheme) > response URL (Issue 82) > page URL. A relative or invalid base
    tag falls back to the page/response URL (HyperlinkParserTest.cs:250-307).
    """
    use = response_url or page_url
    if base_href:
        b = base_href.strip()
        if b.startswith("//"):
            scheme = urlsplit(page_url).scheme or "http"
            b = f"{scheme}:{b}"
        parts = urlsplit(b)
        if parts.scheme and (parts.scheme.lower() not in _HOST_SCHEMES or parts.hostname):
            norm = normalize_url(b)
            if norm is not None:
                return norm
    return use


def authority(url: str) -> str:
    """``Uri.Authority`` — host[:non-default-port], lowercased.

    This is the reference's "domain" everywhere (per-domain budgets
    CrawlDecisionMaker.cs:62-70, rate limiting DomainRateLimiter.cs:104).
    """
    try:
        parts = urlsplit(url)
    except ValueError:
        return ""
    host = (parts.hostname or "").lower()
    if parts.port is not None and parts.port != _DEFAULT_PORTS.get(parts.scheme.lower()):
        return f"{host}:{parts.port}"
    return host


def scheme_of(url: str) -> str:
    try:
        return urlsplit(url).scheme.lower()
    except ValueError:
        return ""


def path_of(url: str) -> str:
    """Path component only (no query) — what the robots matcher compares."""
    try:
        p = urlsplit(url).path
    except ValueError:
        return "/"
    return p or "/"


def is_base_of(root_url: str, url: str) -> bool:
    """``Uri.IsBaseOf`` as used by RobotsDotText.cs:55-56: same scheme +
    authority and the url path sits at/under the root path."""
    try:
        r, u = urlsplit(root_url), urlsplit(url)
    except ValueError:
        return False
    if r.scheme.lower() != u.scheme.lower():
        return False
    if authority(root_url) != authority(url):
        return False
    rpath = r.path or "/"
    upath = u.path or "/"
    base = rpath if rpath.endswith("/") else rpath.rsplit("/", 1)[0] + "/"
    return upath == rpath or upath.startswith(base)


def url_hash64(url: str) -> int:
    """Signed int64 from the first 8 MD5 bytes, little-endian.

    Bit-identical to CompactCrawledUrlRepository.cs:35-46 (unchecked C# long
    addition of shifted bytes == unsigned little-endian value wrapped to
    signed). The DuckDB oracle expression for the same value is::

        ((md5_number(url)::hugeint % 18446744073709551616 + ...) -- lower 64
    see __spark_entry__.oracle_sql()['url_hash64'].
    """
    digest = hashlib.md5(url.encode("utf-8", errors="surrogatepass")).digest()
    v = int.from_bytes(digest[:8], "little")
    return v - (1 << 64) if v >= (1 << 63) else v
