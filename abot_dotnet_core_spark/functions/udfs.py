"""Arrow-batched pandas UDFs wrapping the semantic kernel (the only Python
that runs in the hot path — everything else is JVM-side column expressions).

Three UDF families, exactly as the north_star mandates:
  1. URL normalize + hash (T6/T7)
  2. link extraction (T1-T4)
  3. text extraction (T5, the byte-identical contract)
plus the robots allow-check (P14) evaluated after a broadcast join of
pre-parsed per-domain rules.

Scale notes: every UDF is Series-in/Series-out over Arrow batches
(spark.sql.execution.arrow.maxRecordsPerBatch rows per call); none of them
hold per-partition state, so they parallelize to any executor count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

from ..kernel import urlnorm as U
from ..kernel.extract import extract_links, extract_text
from ..kernel.robots import flat_to_rules


@pandas_udf(T.StringType())
def normalize_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: U.normalize_url(u) if u is not None else None)


@pandas_udf(T.LongType())
def url_hash64_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: U.url_hash64(u) if u is not None else None).astype("Int64")


@pandas_udf(T.StringType())
def authority_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: U.authority(u) if u is not None else None)


@pandas_udf(T.StringType())
def scheme_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: U.scheme_of(u) if u is not None else None)


# --- link extraction (T1-T4) ------------------------------------------------

_LINKS_TYPE = T.ArrayType(T.StringType())


def make_extract_links_udf(cfg) -> callable:
    """Config is baked in at UDF-construction time (broadcast by closure)."""
    meta_nf = cfg.is_respect_meta_robots_no_follow_enabled
    rel_nf = cfg.is_respect_anchor_rel_no_follow_enabled
    x_nf = cfg.is_respect_http_x_robots_tag_header_no_follow_enabled
    keep_frag = cfg.is_respect_url_named_anchor_or_hashbang_enabled
    parser = getattr(cfg, "hyperlink_parser", "hap")

    @pandas_udf(_LINKS_TYPE)
    def extract_links_udf(text: pd.Series, page_url: pd.Series,
                          response_url: pd.Series, x_robots: pd.Series) -> pd.Series:
        out = []
        for t, u, ru, xr in zip(text, page_url, response_url, x_robots):
            if t is None or u is None:
                out.append([])
                continue
            out.append(extract_links(
                t, u, ru,
                x_robots_tag=xr,
                respect_meta_robots_nofollow=meta_nf,
                respect_anchor_rel_nofollow=rel_nf,
                respect_x_robots_nofollow=x_nf,
                keep_fragment=keep_frag,
                parser=parser,
            ))
        return pd.Series(out)

    return extract_links_udf


# --- text extraction (T5) ---------------------------------------------------

_TEXT_TYPE = T.StructType([
    T.StructField("charset", T.StringType()),
    T.StructField("text", T.StringType()),
])


@pandas_udf(_TEXT_TYPE)
def extract_text_udf(html: pd.Series, content_type: pd.Series) -> pd.DataFrame:
    charsets, texts = [], []
    for raw, ct in zip(html, content_type):
        if raw is None:
            charsets.append(None)
            texts.append(None)
            continue
        cs, text = extract_text(bytes(raw), ct)
        charsets.append(cs)
        texts.append(text)
    return pd.DataFrame({"charset": charsets, "text": texts})


# --- fused page extraction (T5 + T1-T4 in one Arrow pass) --------------------

_LINK_TYPE = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("hash", T.LongType()),
    T.StructField("domain", T.StringType()),
    T.StructField("scheme", T.StringType()),
])

_PAGE_TYPE = T.StructType([
    T.StructField("charset", T.StringType()),
    T.StructField("text_md5", T.StringType()),
    T.StructField("text_blank", T.BooleanType()),
    T.StructField("links", T.ArrayType(_LINK_TYPE)),
])


def make_extract_page_udf(cfg, clean_url=None) -> callable:
    """One Arrow round trip per page instead of two: decode bytes -> text
    (T5 charset cascade) and, when ``want_links`` is set for the row
    (the P7-P9 gate is computed JVM-side from depth/is_internal), extract
    links from the just-decoded text (T1-T4).

    The decoded text never leaves the UDF: only its md5 (the byte-identical
    contract digest, == F.md5 over the utf-8 string), blank-ness (the P7
    input) and the link list are returned — at 10^10 scale the text column
    would otherwise dominate every downstream checkpoint and shuffle.

    Each link is returned as a (url, hash, domain, scheme) struct: the T6/T7
    derivations ride the same Arrow pass in the wide extraction stage, so the
    exploded link stream downstream is pure JVM column work (AQE may coalesce
    that narrow stream to few partitions without cost — there is no Python
    left in it)."""
    import hashlib
    meta_nf = cfg.is_respect_meta_robots_no_follow_enabled
    rel_nf = cfg.is_respect_anchor_rel_no_follow_enabled
    x_nf = cfg.is_respect_http_x_robots_tag_header_no_follow_enabled
    keep_frag = cfg.is_respect_url_named_anchor_or_hashbang_enabled
    parser = getattr(cfg, "hyperlink_parser", "hap")

    @pandas_udf(_PAGE_TYPE)
    def extract_page_udf(html: pd.Series, content_type: pd.Series,
                         page_url: pd.Series, want_links: pd.Series,
                         x_robots: pd.Series) -> pd.DataFrame:
        import os as _os
        if _os.environ.get("SPARK_GRAFT_UDF_COUNT"):
            import sys as _sys
            print(f"UDFBATCH {len(html)}", file=_sys.stderr, flush=True)
        charsets, md5s, blanks, links = [], [], [], []
        for raw, ct, u, wl, xr in zip(html, content_type, page_url,
                                      want_links, x_robots):
            if raw is None:
                charsets.append(None)
                md5s.append(None)
                blanks.append(True)
                links.append([])
                continue
            cs, text = extract_text(bytes(raw), ct)
            charsets.append(cs)
            md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            blank = not text.strip()
            blanks.append(blank)
            if wl and not blank:
                links.append([
                    {"url": l, "hash": U.url_hash64(l),
                     "domain": U.authority(l), "scheme": U.scheme_of(l)}
                    for l in extract_links(
                        text, u, None, x_robots_tag=xr,
                        respect_meta_robots_nofollow=meta_nf,
                        respect_anchor_rel_nofollow=rel_nf,
                        respect_x_robots_nofollow=x_nf,
                        keep_fragment=keep_frag,
                        clean_url=clean_url, parser=parser)])
            else:
                links.append([])
        return pd.DataFrame({"charset": charsets, "text_md5": md5s,
                             "text_blank": blanks, "links": links})

    return extract_page_udf


# --- robots parsing (T10, distributed) ---------------------------------------

_ROBOTS_PARSED_TYPE = T.StructType([
    T.StructField("rules_flat", T.ArrayType(T.StringType())),
    T.StructField("crawl_delay_s", T.IntegerType()),
])


def make_robots_parse_udf(user_agent: str) -> callable:
    """Arrow-batched robots.txt parse: (robots_txt) -> (rules_flat,
    crawl_delay_s). A 10^7-domain robots table parses executor-side — the
    driver never sees a robots body."""
    from ..kernel.robots import parse_robots, rules_to_flat

    @pandas_udf(_ROBOTS_PARSED_TYPE)
    def robots_parse_udf(txt: pd.Series) -> pd.DataFrame:
        flats, delays = [], []
        for t in txt:
            if t is None:
                flats.append(None)
                delays.append(None)
                continue
            rules = parse_robots(t)
            flats.append(rules_to_flat(rules))
            delays.append(int(rules.crawl_delay(user_agent)))
        return pd.DataFrame({"rules_flat": flats, "crawl_delay_s": delays})

    return robots_parse_udf


# --- robots allow check (P14) ------------------------------------------------

def make_robots_allowed_udf(user_agent: str) -> callable:
    @pandas_udf(T.BooleanType())
    def robots_allowed_udf(url: pd.Series, rules_flat: pd.Series) -> pd.Series:
        # rows with NULL rules are allowed by definition (no robots.txt, or
        # masked out by the caller's gate) — touch only the non-null rows so
        # batch cost tracks the checked-row count, not the batch size
        import numpy as np
        mask = rules_flat.notna().to_numpy()
        out = np.ones(len(url), dtype=bool)
        if mask.any():
            cache: dict[tuple, object] = {}
            urls = url.to_numpy(dtype=object)
            flats = rules_flat.to_numpy(dtype=object)
            for i in np.flatnonzero(mask):
                u, flat = urls[i], flats[i]
                if u is None:
                    continue
                key = tuple(flat)
                rules = cache.get(key)
                if rules is None:
                    rules = flat_to_rules(list(flat))
                    cache[key] = rules
                out[i] = rules.allowed_path(U.path_of(u), user_agent)
        return pd.Series(out)

    return robots_allowed_udf


# --- column helpers (pure JVM-side) -----------------------------------------

def domain_col(url_col):
    """Registrable-authority via built-ins where possible is preferable, but
    .NET Authority semantics (port handling) live in the kernel — use the UDF
    at table-build time and carry `domain` as a materialized column so the
    hot path never recomputes it."""
    return authority_udf(url_col)


def salt_col(url_col, salt: int):
    """Deterministic skew salt — pmod(xxhash64(url), salt), JVM-side."""
    return F.pmod(F.xxhash64(url_col), F.lit(salt))
