"""Sitemap ingestion (sitemaps.org XML -> crawl frontier seeds).

The reference crawler has no sitemap support — Abot discovers URLs only by
parsing fetched pages (`HyperLinkParser`); its robots integration
(`RobotsDotText.cs`) ignores `Sitemap:` directives even though the parse
layer sees them. A Common-Crawl-scale frontier, however, is bootstrapped
from sitemaps as much as from link expansion, so this module adds the
standard pipeline as a beyond-reference source:

  robots.txt `Sitemap:` directives        (kernel/robots.py already parses
      -> sitemap URL list                  them into RobotsRules.sitemaps)
  sitemap XML (urlset | sitemapindex)     one Arrow-batched parse UDF;
      -> (loc, lastmod, changefreq,        gzip members (.xml.gz) inflated
          priority) entries                in the same pass
  sitemapindex recursion                  driver-bounded rounds (an index
      -> child sitemap fetch-join          is fetched like any page: an
                                           equi-join against the body table)
  entries -> CrawlEngine.seed_from_frontier (url column contract)

Scale posture: parsing is executor-side over whatever partitioning the
sitemap-body table already has (one row per sitemap document, bodies never
shuffle — the parse UDF projects them down to entry structs on the scan).
The index recursion is a per-round broadcast-or-shuffle equi-join on the
child URL, bounded by ``max_depth`` exactly like crawl rounds; a 10^6-domain
sitemap sweep is ~10^6 rows of XML per round, trivial next to the page
corpus.

Entries carry ``priority_millis`` (the sitemaps.org 0.0-1.0 priority in
exact integer thousandths, default 500) so frontier ordering by priority is
integer arithmetic — bit-identical between Spark and any SQL oracle.
"""

from __future__ import annotations

import gzip
import re
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# kernel (pure python, unit-testable)
# --------------------------------------------------------------------------

_GZIP_MAGIC = b"\x1f\x8b"

# sitemaps.org documents entity-escaping for loc values; ElementTree decodes
# XML entities natively. Namespaces vary in the wild ("...0.9", none, typos)
# so tags are matched on their local name.
_LOCAL = re.compile(r"^(?:\{[^}]*\})?(.*)$")


def _local(tag: str) -> str:
    m = _LOCAL.match(tag)
    return (m.group(1) if m else tag).lower()


def _priority_millis(text: str | None) -> int:
    """0.0-1.0 -> exact integer thousandths; default 500 (sitemaps.org:
    'The default priority of a page is 0.5'). Out-of-range / junk -> 500."""
    if text is None:
        return 500
    try:
        p = float(text.strip())
    except ValueError:
        return 500
    if not (0.0 <= p <= 1.0):
        return 500
    return int(round(p * 1000))


def parse_sitemap(raw: bytes | str | None) -> tuple[str | None, list[dict]]:
    """Parse one sitemap document -> (kind, entries).

    kind: "urlset" | "sitemapindex" | None (unparseable / wrong root).
    entries: [{loc, lastmod, changefreq, priority_millis}] in document
    order; for a sitemapindex only ``loc`` and ``lastmod`` are populated
    (changefreq None, priority_millis 500). Gzipped bytes are inflated
    first (.xml.gz convention). Entries without a <loc> are dropped.
    """
    if raw is None:
        return None, []
    if isinstance(raw, bytes):
        if raw[:2] == _GZIP_MAGIC:
            try:
                raw = gzip.decompress(raw)
            except (OSError, EOFError):
                # EOFError: valid gzip magic but stream cut mid-member —
                # totality contract says skip, never fail the task
                return None, []
        try:
            text = raw.decode("utf-8", errors="replace")
        except Exception:
            return None, []
    else:
        text = raw
    text = text.strip()
    if not text:
        return None, []
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return None, []

    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return None, []
    child_tag = "url" if kind == "urlset" else "sitemap"

    entries: list[dict] = []
    for node in root:
        if _local(node.tag) != child_tag:
            continue
        fields: dict[str, str | None] = {}
        for leaf in node:
            fields[_local(leaf.tag)] = (leaf.text or "").strip() or None
        loc = fields.get("loc")
        if not loc:
            continue
        entries.append({
            "loc": loc,
            "lastmod": fields.get("lastmod"),
            "changefreq": (fields.get("changefreq")
                           if kind == "urlset" else None),
            "priority_millis": (_priority_millis(fields.get("priority"))
                                if kind == "urlset" else 500),
        })
    return kind, entries


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

_ENTRY_TYPE = T.StructType([
    T.StructField("loc", T.StringType()),
    T.StructField("lastmod", T.StringType()),
    T.StructField("changefreq", T.StringType()),
    T.StructField("priority_millis", T.IntegerType()),
])

_PARSED_TYPE = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("entries", T.ArrayType(_ENTRY_TYPE)),
])


@pandas_udf(_PARSED_TYPE)
def parse_sitemap_udf(body: pd.Series) -> pd.DataFrame:
    kinds, all_entries = [], []
    for raw in body:
        kind, entries = parse_sitemap(
            bytes(raw) if isinstance(raw, (bytes, bytearray)) else raw)
        kinds.append(kind)
        all_entries.append(entries)
    return pd.DataFrame({"kind": kinds, "entries": all_entries})


def sitemap_entries(sitemaps: DataFrame, url_col: str = "url",
                    body_col: str = "body") -> DataFrame:
    """Explode sitemap documents into ordered entry rows.

    Output: (sitemap_url, kind, entry_pos, loc, lastmod, changefreq,
    priority_millis). ``kind`` distinguishes page entries (urlset) from
    child-sitemap pointers (sitemapindex); unparseable documents vanish
    (kind NULL -> zero entries). Bodies are projected away before the
    explode, so only entry structs move downstream."""
    parsed = (sitemaps
              .withColumn("_p", parse_sitemap_udf(F.col(body_col)))
              .select(F.col(url_col).alias("sitemap_url"),
                      F.col("_p.kind").alias("kind"),
                      F.posexplode_outer("_p.entries")
                       .alias("entry_pos", "e"))
              .filter(F.col("e").isNotNull()))
    return parsed.select(
        "sitemap_url", "kind", "entry_pos",
        F.col("e.loc").alias("loc"),
        F.col("e.lastmod").alias("lastmod"),
        F.col("e.changefreq").alias("changefreq"),
        F.col("e.priority_millis").alias("priority_millis"))


@pandas_udf(T.ArrayType(T.StringType()))
def robots_sitemaps_udf(txt: pd.Series) -> pd.Series:
    from ..kernel.robots import parse_robots
    return pd.Series([parse_robots(t).sitemaps if t is not None else []
                      for t in txt])


def sitemaps_from_robots(robots: DataFrame, domain_col: str = "domain",
                         txt_col: str = "robots_txt") -> DataFrame:
    """`Sitemap:` directives per domain -> (domain, sitemap_url), document
    order preserved per robots file (directives are cross-group in the
    protocol, which kernel/robots.py already honors)."""
    return (robots
            .withColumn("_s", robots_sitemaps_udf(F.col(txt_col)))
            .select(F.col(domain_col).alias("domain"),
                    F.posexplode("_s").alias("sitemap_pos", "sitemap_url")))


def resolve_sitemaps(bodies: DataFrame, roots: DataFrame,
                     max_depth: int = 3) -> DataFrame:
    """Recursively resolve sitemapindex files against a sitemap-body table.

    ``bodies``: (url, body) — the fetched sitemap documents (the corpus-join
    model: fetching is an equi-join, same as page fetches). ``roots``: a
    DataFrame with a ``sitemap_url`` column (e.g. from
    ``sitemaps_from_robots``). Returns urlset entries only, annotated with
    the sitemap that contributed them. Each recursion level is one
    fetch-join + parse round; cycles are cut by an anti-join on already-
    visited sitemap URLs, depth is bounded by ``max_depth`` (sitemaps.org
    caps real nesting at 50k children / level — depth 3 covers practice).
    """
    visited = roots.select("sitemap_url").dropDuplicates()
    frontier = visited
    out: DataFrame | None = None
    for _ in range(max_depth):
        fetched = bodies.join(
            frontier.select(F.col("sitemap_url").alias("url")),
            "url")
        # no forced broadcast: round 1's frontier is ALL roots (can be 10^8
        # rows from sitemaps_from_robots) — Catalyst/AQE picks broadcast vs
        # shuffle per round, per the module's scale contract.
        # localCheckpoint (not .cache()): one materialization feeds the
        # pages/children/isEmpty reads this round, and the blocks are
        # released by the ContextCleaner when the round's DataFrame is
        # GC'd — .cache() would pin every round's parse in executor
        # storage for the life of the session.
        entries = sitemap_entries(fetched).localCheckpoint(eager=True)
        pages = entries.filter(F.col("kind") == "urlset")
        out = pages if out is None else out.unionByName(pages)
        children = (entries.filter(F.col("kind") == "sitemapindex")
                    .select(F.col("loc").alias("sitemap_url"))
                    .dropDuplicates()
                    .join(visited, "sitemap_url", "left_anti"))
        if children.isEmpty():
            break
        visited = visited.unionByName(children)
        frontier = children
    return out if out is not None else sitemap_entries(
        bodies.limit(0))


def sitemap_frontier(entries: DataFrame) -> DataFrame:
    """Project resolved entries into the ``seed_from_frontier`` contract
    (a ``url`` column), highest-priority first within a sitemap — callers
    hand this straight to ``CrawlEngine.seed_from_frontier`` which
    normalizes/hashes/dedups distributively."""
    return (entries
            .select(F.col("loc").alias("url"), "priority_millis")
            .orderBy(F.col("priority_millis").desc(), "url")
            .select("url"))
