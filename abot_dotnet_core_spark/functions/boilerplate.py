"""Boilerplate removal — jusText-shaped block classification + main content.

The web-corpus cleaning step the reference never needed (Abot hands raw
html to the caller): segment a page into block-level text blocks, classify
each block by link density / stopword density / length (Pomikalek 2011,
"Removing boilerplate and duplicate content from web corpora", ch. 3 —
the jusText algorithm), apply the context pass (short/near-good blocks
inherit from their classified neighbors), and reassemble the good blocks
as the page's main content.

Determinism contract: the Arrow UDF only reports structural FACTS per
block (collapsed text, char count, chars under <a>); every density and
class is integer arithmetic in JVM columns (thousandths, floor division),
so a SQL oracle reproduces the classification bit-for-bit from the same
facts. The stopword list is a frozen module constant shared with oracles.

Scale posture: segmentation is one Arrow pass on the scan (html never
shuffles; blocks explode to narrow rows). Classification is pure codegen
over the exploded rows. The context pass is two windows partitioned BY
PAGE (bounded by a page's block count — never a corpus-wide sort).
main_content is one hash agg per page with an in-group array sort.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# frozen 30-entry English stopword head — enough signal for the density
# gate; a production run swaps per-language lists (same column plumbing)
STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they",
    "at be this have from or had by not",
)
STOPWORD_LIST = " ".join(STOPWORDS).split()

_WS_RE = re.compile(r"\s+")

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "blockquote", "pre", "table", "tr", "td", "th", "article", "section",
    "header", "footer", "nav", "aside", "br", "hr", "form", "dl", "dt",
    "dd", "body", "html", "main", "figure", "figcaption",
}


class _BlockCollector(HTMLParser):
    """Flushes a text block at every block-level tag boundary, tracking how
    many characters sit under an <a> (the link-density numerator)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []   # (text, n_link_chars)
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._a_depth = 0
        self._skip = 0

    def _flush(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._parts)).strip()
        if text:
            link_text = _WS_RE.sub(" ", "".join(self._link_parts)).strip()
            self.blocks.append((text, len(link_text)))
        self._parts = []
        self._link_parts = []

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1
        elif tag in ("script", "style"):
            self._skip += 1

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth = max(0, self._a_depth - 1)
        elif tag in ("script", "style"):
            self._skip = max(0, self._skip - 1)

    def handle_data(self, data):
        if self._skip:
            return
        self._parts.append(data)
        if self._a_depth:
            self._link_parts.append(data)

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html_text: str | None) -> list[tuple[str, int]]:
    """(collapsed_text, n_link_chars) per block, document order. Total on
    junk input. n_link_chars counts the collapsed anchor text — the same
    collapse the block text gets, so density ratios are consistent."""
    if html_text is None or not html_text.strip():
        return []
    c = _BlockCollector()
    try:
        c.feed(html_text)
        c.close()
    except Exception:
        return []
    return c.blocks


_BLOCK_TYPE = T.ArrayType(T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("n_link_chars", T.IntegerType()),
]))


@pandas_udf(_BLOCK_TYPE)
def segment_blocks_udf(html: pd.Series) -> pd.Series:
    return pd.Series([
        [{"text": t, "n_link_chars": lc} for t, lc in segment_blocks(h)]
        for h in html])


def page_blocks(pages: DataFrame, html_col: str = "html",
                url_col: str = "url") -> DataFrame:
    """(url, block_pos, text, n_chars, n_link_chars, n_words,
    n_stop_words) — facts only; words/stopwords derived JVM-side from the
    collapsed text so any SQL engine recomputes them identically."""
    stop = F.array(*[F.lit(w) for w in STOPWORD_LIST])
    words = F.split(F.col("text"), " ")
    # posexplode_outer, not posexplode: the non-outer form plants an
    # implicit size(_b)>0 filter UNDER the Generate, which Catalyst
    # satisfies by evaluating the (deterministic) UDF a second time —
    # the html would be parsed twice per page
    return (pages
            .withColumn("_b", segment_blocks_udf(F.col(html_col)))
            .select(F.col(url_col).alias("url"),
                    F.posexplode_outer("_b").alias("block_pos", "b"))
            .filter(F.col("b").isNotNull())
            .select("url", "block_pos",
                    F.col("b.text").alias("text"),
                    F.length("b.text").alias("n_chars"),
                    F.col("b.n_link_chars").alias("n_link_chars"))
            .withColumn("n_words", F.size(words))
            .withColumn(
                "n_stop_words",
                F.size(F.filter(F.transform(words, F.lower),
                                lambda w: F.array_contains(stop, w)))))


def classify_blocks(blocks: DataFrame, *, max_link_density_millis: int = 200,
                    length_low: int = 70, length_high: int = 200,
                    stop_low_millis: int = 300,
                    stop_high_millis: int = 320) -> DataFrame:
    """jusText-shaped two-pass classification, integer-exact.

    Context-free pass (cls_raw):
      bad        link_density > max (thousandths, floor)
      short      n_chars < length_low
      good       stop_density >= high AND n_chars > length_high
      near_good  stop_density >= low (incl. high-but-short blocks)
      bad        otherwise
    Context pass (cls): good/bad keep; near_good -> good iff the nearest
    context-free good/bad neighbor on EITHER side is good; short -> good
    iff BOTH nearest such neighbors are good (page edges count as bad —
    jusText ch. 3.3 simplified to its deterministic core: no
    paragraph-merging heuristics, one neighbor probe each way)."""
    # exact integer fixed-point (div = floor division on longs) — the same
    # convention as the pagerank/tfidf ops, so SQL oracles match bit-for-bit
    link_density = F.expr(
        "cast((n_link_chars * 1000L) div greatest(n_chars, 1) as int)")
    stop_density = F.expr(
        "cast((n_stop_words * 1000L) div greatest(n_words, 1) as int)")

    raw = (F.when(link_density > max_link_density_millis, "bad")
           .when(F.col("n_chars") < length_low, "short")
           .when((stop_density >= stop_high_millis)
                 & (F.col("n_chars") > length_high), "good")
           .when(stop_density >= stop_low_millis, "near_good")
           .otherwise("bad"))

    b = (blocks
         .withColumn("link_density_millis", link_density)
         .withColumn("stop_density_millis", stop_density)
         .withColumn("cls_raw", raw))

    page = W.partitionBy("url").orderBy("block_pos")
    ctx = F.when(F.col("cls_raw").isin("good", "bad"), F.col("cls_raw"))
    prev_ctx = F.coalesce(
        F.last(ctx, ignorenulls=True).over(
            page.rowsBetween(W.unboundedPreceding, -1)), F.lit("bad"))
    next_ctx = F.coalesce(
        F.first(ctx, ignorenulls=True).over(
            page.rowsBetween(1, W.unboundedFollowing)), F.lit("bad"))

    final = (F.when(F.col("cls_raw").isin("good", "bad"), F.col("cls_raw"))
             .when(F.col("cls_raw") == "near_good",
                   F.when((prev_ctx == "good") | (next_ctx == "good"),
                          "good").otherwise("bad"))
             .otherwise(  # short
                 F.when((prev_ctx == "good") & (next_ctx == "good"),
                        "good").otherwise("bad")))
    return b.withColumn("cls", final)


def main_content(classified: DataFrame) -> DataFrame:
    """(url, main_text, n_good_blocks) — good blocks rejoined in document
    order; pages with no good block keep an empty string (the page is all
    boilerplate, a real outcome worth distinguishing from absent)."""
    good = F.when(F.col("cls") == "good",
                  F.struct("block_pos", "text"))
    return (classified
            .groupBy("url")
            .agg(F.sort_array(F.collect_list(good)).alias("g"))
            .select("url",
                    F.array_join(F.transform("g", lambda x: x["text"]),
                                 "\n").alias("main_text"),
                    F.size("g").alias("n_good_blocks")))
