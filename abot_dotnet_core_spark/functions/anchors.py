"""Anchor-text aggregation — the per-target-URL link-text signal.

For every URL the corpus links to, aggregate what the linking pages SAY
about it: mention count, distinct linking pages, and the dominant anchor
text. Search engines and corpus quality classifiers both consume this
shape (anchor text is the strongest off-page description of a target);
the reference crawler never needed it because Abot only consumes the
deduped link *list* (HyperLinkParser.cs keeps hrefs, drops the text).

Scale posture:
- extraction is one Arrow pass over the page text (mentions never leave
  the executor unexploded; html/text is projected away before any
  shuffle);
- the aggregate is two hash aggregations sharing the target-url key:
  (target, anchor) counts map-side-combine first, so a boilerplate anchor
  ("home", "click here") repeated 10^9 times arrives at the reducer as
  one row per distinct (target, text) — the hot-key damping that makes
  this safe on a 100 TB corpus;
- the dominant anchor is an aggregation, not a window: min over the
  struct (-cnt, text) picks highest count, ties to the lexicographically
  smallest text, with no per-target sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.extract import extract_anchors

_MENTION_TYPE = T.ArrayType(T.StructType([
    T.StructField("target", T.StringType()),
    T.StructField("anchor", T.StringType()),
]))


@pandas_udf(_MENTION_TYPE)
def extract_anchors_udf(text: pd.Series, page_url: pd.Series) -> pd.Series:
    out = []
    for t, u in zip(text, page_url):
        if t is None or u is None:
            out.append([])
            continue
        out.append([{"target": a, "anchor": x}
                    for a, x in extract_anchors(t, u)])
    return pd.Series(out)


def anchor_mentions(pages: DataFrame, html_col: str = "html",
                    url_col: str = "url") -> DataFrame:
    """(source_url, target_url, anchor) — one row per mention, document
    order within a page preserved via mention_pos."""
    # posexplode_outer + post-filter: the non-outer form's implicit
    # size>0 filter would make Catalyst evaluate the extraction UDF twice
    return (pages
            .withColumn("_m", extract_anchors_udf(F.col(html_col),
                                                  F.col(url_col)))
            .select(F.col(url_col).alias("source_url"),
                    F.posexplode_outer("_m").alias("mention_pos", "m"))
            .filter(F.col("m").isNotNull())
            .select("source_url", "mention_pos",
                    F.col("m.target").alias("target_url"),
                    F.col("m.anchor").alias("anchor")))


def anchor_text_agg(mentions: DataFrame) -> DataFrame:
    """Per-target anchor profile: (target_url, n_mentions, n_sources,
    top_anchor, top_anchor_count). top_anchor = most frequent anchor text,
    ties broken by lexicographic order.

    The (target, anchor, source) combine is localCheckpoint'ed because two
    aggregates derive from it (anchor-level top + source-distinct) — without
    the checkpoint each branch would re-run the html extraction UDF from
    the scan (the repo-wide materialize-reused-aggregates rule)."""
    m1 = (mentions
          .groupBy("target_url", "anchor", "source_url")
          .agg(F.count("*").alias("c0"))
          .localCheckpoint(eager=True))
    per_text = (m1.groupBy("target_url", "anchor")
                .agg(F.sum("c0").alias("cnt")))
    top = (per_text
           .groupBy("target_url")
           .agg(F.min(F.struct((-F.col("cnt")).alias("neg_cnt"),
                               F.col("anchor").alias("anchor"))).alias("t"),
                F.sum("cnt").alias("n_mentions"))
           .select("target_url", "n_mentions",
                   F.col("t.anchor").alias("top_anchor"),
                   (-F.col("t.neg_cnt")).alias("top_anchor_count")))
    sources = (m1
               .groupBy("target_url")
               .agg(F.countDistinct("source_url").alias("n_sources")))
    return (top.join(sources, "target_url")
            .select("target_url", "n_mentions", "n_sources",
                    "top_anchor", "top_anchor_count"))
