"""HTML hyperlink + text extraction (the T1-T5 operators).

Link extraction reproduces the reference's default HtmlAgilityPack parser
pipeline (/root/reference/Abot/src/Abot/Core/HapHyperLinkParser.cs:31-114 and
HyperLinkParser.cs:42-123) as pinned by HyperlinkParserTest.cs:

- collect hrefs of all <a>, then all <area>, then <link rel=canonical>
  (HapHyperLinkParser.cs:41-43 — this order matters for first-seen dedup)
- tags inside comments / <script> / <style> are ignored
  (HyperlinkParserTest.cs:121-187)
- hrefs are entity-decoded (&amp; -> &, HapHyperLinkParser.cs:94-108)
- page-level nofollow gates: X-Robots-Tag header / <meta name=robots>
  containing "nofollow" or "none" (HyperLinkParser.cs:125-155); per-anchor
  rel="nofollow" equality match (HapHyperLinkParser.cs:110-114)
- <base href> overrides the resolution base when it is a valid absolute URI;
  "//host" gets the page scheme (HyperLinkParser.cs:85-96)
- fragments stripped before resolution unless configured
  (HyperLinkParser.cs:105-107)
- first-seen in-page dedup on the absolute form (HyperLinkParser.cs:113-114)

Text extraction reproduces WebContentExtractor.cs:23-126: charset from the
Content-Type header, else a regex sniff over the ASCII-decoded body, the
cp1251 -> windows-1251 alias, UTF-8 fallback, BOM-aware decode. This is the
byte-identical-text contract surface.
"""

from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

from .urlnorm import effective_base, normalize_url, resolve_href

# --------------------------------------------------------------------------
# Link extraction
# --------------------------------------------------------------------------


class _LinkCollector(HTMLParser):
    """Collects hrefs in document order, bucketed a/area/canonical/base/meta.

    stdlib HTMLParser already treats <script>/<style> bodies as CDATA and
    routes comments to handle_comment, giving the exclusion semantics the
    reference gets from a DOM parser. convert_charrefs decodes entities in
    attribute values (the DeEntitize step).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.a_hrefs: list[tuple[str, str]] = []      # (href, rel)
        self.area_hrefs: list[tuple[str, str]] = []
        self.aa_hrefs: list[tuple[str, str]] = []     # a+area, document order
        self.canonical_hrefs: list[str] = []
        self.base_href: str | None = None
        self.meta_robots: str | None = None

    def handle_starttag(self, tag, attrs):
        d = dict(attrs)
        if tag == "a" and d.get("href") is not None:
            self.a_hrefs.append((d["href"], d.get("rel") or ""))
            self.aa_hrefs.append((d["href"], d.get("rel") or ""))
        elif tag == "area" and d.get("href") is not None:
            self.area_hrefs.append((d["href"], d.get("rel") or ""))
            self.aa_hrefs.append((d["href"], d.get("rel") or ""))
        elif tag == "link":
            if (d.get("rel") or "").strip().lower() == "canonical" and d.get("href"):
                self.canonical_hrefs.append(d["href"])
        elif tag == "base":
            if self.base_href is None:
                self.base_href = (d.get("href") or "").strip()
        elif tag == "meta":
            if (d.get("name") or "").strip().lower() == "robots":
                if self.meta_robots is None:
                    self.meta_robots = d.get("content") or ""

    # <a href=...> without explicit close also arrives via handle_startendtag,
    # which the base class routes through handle_starttag by default.


def _nofollow(value: str | None) -> bool:
    # total over Arrow-batch cells: a NULL string column reaches the pandas
    # UDF as None OR float NaN depending on the batch's null layout
    if not isinstance(value, str):
        return False
    v = value.lower()
    return "nofollow" in v or "none" in v


def extract_links(
    html_text: str | None,
    page_url: str,
    response_url: str | None = None,
    *,
    x_robots_tag: str | None = None,
    respect_meta_robots_nofollow: bool = False,
    respect_anchor_rel_nofollow: bool = False,
    respect_x_robots_nofollow: bool = False,
    keep_fragment: bool = False,
    clean_url=None,
    parser: str = "hap",
) -> list[str]:
    """Absolute, deduped (first-seen) link list for one page.

    Two parser variants, matching the reference's two implementations:
      "hap" (default — WebCrawler.cs:186): all <a>, then all <area>, then
        every <link rel=canonical> (HapHyperLinkParser.cs:41-43).
      "anglesharp": a+area in DOCUMENT order (one 'a, area' CSS query,
        AngleSharpHyperLinkParser.cs:35-38), and the canonical link only
        when its raw href differs from the page URL case-insensitively
        (:73-79 HasRelCanonicalPointingToDifferentUrl).
    """
    if html_text is None or not html_text.strip():
        return []
    if respect_x_robots_nofollow and _nofollow(x_robots_tag):
        return []

    collector = _LinkCollector()
    try:
        collector.feed(html_text)
        collector.close()
    except Exception:
        return []

    if respect_meta_robots_nofollow and _nofollow(collector.meta_robots):
        return []

    anchors = (collector.aa_hrefs if parser == "anglesharp"
               else collector.a_hrefs + collector.area_hrefs)
    hrefs: list[str] = []
    for href, rel in anchors:
        if respect_anchor_rel_nofollow and rel.lower().strip() == "nofollow":
            continue
        if href and href.strip():
            hrefs.append(href)
    if parser == "anglesharp":
        hrefs.extend(h for h in collector.canonical_hrefs
                     if h and h.strip() and h.lower() != page_url.lower())
    else:
        hrefs.extend(collector.canonical_hrefs)

    base = effective_base(page_url, response_url, collector.base_href)

    out: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        if clean_url is not None:
            # user cleanURLFunc — HyperLinkParser.cs:25,110-111: applied to
            # the raw (de-entitized) href before URI construction
            try:
                href = clean_url(href)
            except Exception:
                continue
            if not href:
                continue
        absolute = resolve_href(base, href, keep_fragment=keep_fragment)
        if absolute is None:
            continue
        if absolute not in seen:
            seen.add(absolute)
            out.append(absolute)
    return out


# --------------------------------------------------------------------------
# Anchor-text extraction (beyond-reference: web-graph/quality signal)
# --------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")


class _AnchorTextCollector(HTMLParser):
    """Collects (href, text) per <a href=...> in document order, text being
    the whitespace-collapsed character data between the tag and its close.

    A new <a> implicitly closes an open one (nested anchors are invalid
    HTML; browsers auto-close — same here). <script>/<style> bodies inside
    an anchor are excluded: the parser delivers their CDATA via
    handle_data, so we gate on a skip counter driven by their tag events.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self.base_href: str | None = None
        self._open: tuple[str, list[str]] | None = None
        self._skip = 0

    def _finalize(self) -> None:
        if self._open is not None:
            href, parts = self._open
            self.anchors.append((href, _WS_RE.sub(" ", "".join(parts)).strip()))
            self._open = None

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._finalize()
            d = dict(attrs)
            if d.get("href") is not None and d["href"].strip():
                self._open = (d["href"], [])
        elif tag in ("script", "style"):
            self._skip += 1
        elif tag == "base":
            if self.base_href is None:
                d = dict(attrs)
                self.base_href = (d.get("href") or "").strip()

    def handle_endtag(self, tag):
        if tag == "a":
            self._finalize()
        elif tag in ("script", "style"):
            self._skip = max(0, self._skip - 1)

    def handle_data(self, data):
        if self._open is not None and not self._skip:
            self._open[1].append(data)

    def close(self):
        super().close()
        self._finalize()


def extract_anchors(
    html_text: str | None,
    page_url: str,
    response_url: str | None = None,
    *,
    keep_fragment: bool = False,
) -> list[tuple[str, str]]:
    """All (absolute_target_url, anchor_text) mentions on one page, document
    order, NO dedup — every mention is one observation for the per-target
    anchor-text aggregate (the classic web-corpus relevance/quality signal;
    outside the reference's surface, which only needs the deduped link list
    from ``extract_links``). Resolution shares T6's base/href semantics."""
    if html_text is None or not html_text.strip():
        return []
    collector = _AnchorTextCollector()
    try:
        collector.feed(html_text)
        collector.close()
    except Exception:
        return []
    base = effective_base(page_url, response_url, collector.base_href)
    out: list[tuple[str, str]] = []
    for href, text in collector.anchors:
        absolute = resolve_href(base, href, keep_fragment=keep_fragment)
        if absolute is not None:
            out.append((absolute, text))
    return out


# --------------------------------------------------------------------------
# Charset + text extraction (WebContentExtractor.cs)
# --------------------------------------------------------------------------

# Exact regex from WebContentExtractor.cs:69 (charset sniff over the body).
_META_CHARSET_RE = re.compile(
    r"""<meta(?!\s*(?:name|value)\s*=)(?:[^>]*?content\s*=[\s"']*)?([^>]*?)[\s"';]*charset\s*=[\s"']*([^\s"'/>]*)""",
    re.IGNORECASE,
)

_HEADER_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([^\s\"';,]+)", re.IGNORECASE)

_BOMS: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]


def charset_from_header(content_type: str | None) -> str | None:
    """``ContentType.CharSet`` — WebContentExtractor.cs:57-60."""
    if not content_type:
        return None
    m = _HEADER_CHARSET_RE.search(content_type)
    return m.group(1) if m else None


def charset_from_body(body_ascii: str | None) -> str | None:
    """WebContentExtractor.cs:62-77 — regex sniff, group 2, empty -> None."""
    if body_ascii is None:
        return None
    m = _META_CHARSET_RE.search(body_ascii)
    if not m:
        return None
    cs = m.group(2)
    return cs if cs and cs.strip() else None


def clean_charset(charset: str | None) -> str | None:
    """cp1251 alias hack — WebContentExtractor.cs:94-101."""
    return "windows-1251" if charset == "cp1251" else charset


def _ascii_view(raw: bytes) -> str:
    """.NET Encoding.ASCII maps every byte >0x7F to '?' (1 byte : 1 char)."""
    return raw.decode("ascii", errors="replace").replace("�", "?")


def extract_text(raw: bytes | None, content_type: str | None) -> tuple[str | None, str]:
    """(charset, text) — the full header -> meta-sniff -> utf-8 cascade with
    BOM-aware decode (StreamReader detectEncodingFromByteOrderMarks=true)."""
    if raw is None:
        return None, ""
    charset = charset_from_header(content_type)
    if charset is None:
        charset = charset_from_body(_ascii_view(raw))
    charset = clean_charset(charset)

    codec = "utf-8"
    if charset is not None:
        try:
            codecs.lookup(charset)
            codec = charset
        except LookupError:
            codec = "utf-8"

    for bom, bom_codec in _BOMS:
        if raw.startswith(bom):
            return charset, raw[len(bom):].decode(bom_codec, errors="replace")
    return charset, raw.decode(codec, errors="replace")


def golden_text(raw: bytes | None, content_type: str | None) -> str:
    """Text-only convenience used by the corpus generator and UDF."""
    return extract_text(raw, content_type)[1]


__all__ = [
    "extract_links",
    "extract_anchors",
    "extract_text",
    "golden_text",
    "charset_from_header",
    "charset_from_body",
    "clean_charset",
    "normalize_url",
]
