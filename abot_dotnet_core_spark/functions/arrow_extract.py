"""mapInArrow variant of the fused page-extraction stage.

Same kernel semantics as ``udfs.make_extract_page_udf`` (T1-T5: charset
cascade -> byte-identical text digest -> link structs), but the Arrow batch
is consumed and produced directly:

- input: html bytes are pulled row-by-row from the Arrow array (one bytes
  object alive at a time) instead of materializing a whole pandas block of
  10k bytes objects per batch;
- output: the nested links column is built COLUMNARLY
  (ListArray.from_arrays over flat child arrays + offsets) instead of a
  pandas Series of list-of-dicts that the pandas_udf return path must
  convert row-wise.

Used by the big-round scan path when ``CrawlConfig.extract_impl == "arrow"``;
the pandas_udf path remains the default. Output parity is pinned by
tests (same rows, hashes, links as the pandas implementation).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

from ..kernel import urlnorm as U
from ..kernel.extract import extract_links, extract_text

PAGE_DDL = ("url string, charset string, text_md5 string, "
            "text_blank boolean, "
            "links array<struct<url:string,hash:bigint,"
            "domain:string,scheme:string>>")


def make_arrow_extract_fn(cfg, clean_url=None, with_headers: bool = False):
    import pyarrow as pa
    meta_nf = cfg.is_respect_meta_robots_no_follow_enabled
    rel_nf = cfg.is_respect_anchor_rel_no_follow_enabled
    x_nf = cfg.is_respect_http_x_robots_tag_header_no_follow_enabled
    keep_frag = cfg.is_respect_url_named_anchor_or_hashbang_enabled
    parser = getattr(cfg, "hyperlink_parser", "hap")

    def fn(batches):
        for batch in batches:
            idx = batch.schema.get_field_index
            urls = batch.column(idx("url"))
            htmls = batch.column(idx("html"))
            n = batch.num_rows
            if with_headers:
                cts = batch.column(idx("__ct")).to_pylist()
                xrs = batch.column(idx("__xr")).to_pylist()
            else:
                cts = xrs = None
            url_list = urls.to_pylist()

            charsets: list = [None] * n
            md5s: list = [None] * n
            blanks: list = [True] * n
            l_url: list = []
            l_hash: list = []
            l_dom: list = []
            l_sch: list = []
            offsets = [0] * (n + 1)

            for i in range(n):
                raw = htmls[i].as_py()
                if raw is None:
                    offsets[i + 1] = len(l_url)
                    continue
                ct = cts[i] if cts is not None else None
                cs, text = extract_text(raw, ct)
                charsets[i] = cs
                md5s[i] = hashlib.md5(text.encode("utf-8")).hexdigest()
                blank = not text.strip()
                blanks[i] = blank
                if not blank:
                    for link in extract_links(
                            text, url_list[i], None,
                            x_robots_tag=xrs[i] if xrs is not None else None,
                            respect_meta_robots_nofollow=meta_nf,
                            respect_anchor_rel_nofollow=rel_nf,
                            respect_x_robots_nofollow=x_nf,
                            keep_fragment=keep_frag,
                            clean_url=clean_url, parser=parser):
                        l_url.append(link)
                        l_hash.append(U.url_hash64(link))
                        l_dom.append(U.authority(link))
                        l_sch.append(U.scheme_of(link))
                offsets[i + 1] = len(l_url)

            links = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.StructArray.from_arrays(
                    [pa.array(l_url, pa.string()),
                     pa.array(l_hash, pa.int64()),
                     pa.array(l_dom, pa.string()),
                     pa.array(l_sch, pa.string())],
                    names=["url", "hash", "domain", "scheme"]))
            yield pa.RecordBatch.from_arrays(
                [urls, pa.array(charsets, pa.string()),
                 pa.array(md5s, pa.string()),
                 pa.array(blanks, pa.bool_()), links],
                names=["url", "charset", "text_md5", "text_blank", "links"])

    return fn


def extract_pages_arrow(df: DataFrame, cfg, clean_url=None) -> DataFrame:
    """(url, html[, __ct, __xr]) -> (url, charset, text_md5, text_blank,
    links). The scan-side big-round extraction as one mapInArrow pass."""
    with_headers = "__ct" in df.columns
    fn = make_arrow_extract_fn(cfg, clean_url=clean_url,
                               with_headers=with_headers)
    cols = ["url", "html"] + (["__ct", "__xr"] if with_headers else [])
    return df.select(*cols).mapInArrow(fn, PAGE_DDL)
