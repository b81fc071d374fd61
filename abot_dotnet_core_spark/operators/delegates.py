"""User-suppliable decision delegates (the reference's extension points,
WebCrawler.cs:458-504), vectorized.

Each delegate is a pandas Series-in -> boolean Series-out callable (the
``input_hint`` mandate: batch-evaluated, never per-row Python in the JVM
loop). Composition follows the reference exactly: the custom delegate runs
only where the built-in cascade allowed (WebCrawler.cs:821-822) — in
vectorized form the delegate computes on the whole batch but only APPLIES
where the built-in reason is NULL, which is equivalent for pure predicates.

Delegate arities:

  should_crawl_page(url, depth, is_internal)        -> bool   (fires event)
  should_crawl_page_links(url, depth, is_internal)  -> bool   (fires event)
  should_download_page_content(url, status, content_type) -> bool
  should_recrawl_page(url, status, retry_count)     -> bool
  should_schedule_link(src_url, dst_url)            -> bool   (silent; the
      link is still marked known — WebCrawler.cs:943-946,969)
  is_internal_uri(url)                              -> bool   (replaces the
      authority-equality internality primitive; reference signature is
      (uri, rootUri) — the root set is a closure here)
  clean_url(href)                                   -> str    (scalar; runs
      inside the extraction kernel per href, HyperLinkParser.cs:25,110-111)

The same callables drive the pytest oracle simulator via ``scalar_call``,
so parity between engine and reference semantics is testable per delegate.
"""

from dataclasses import dataclass

import pandas as pd

# Golden reason string for custom denials. The reference surfaces whatever
# Reason the user's CrawlDecision carried; the vectorized surface returns
# booleans, so denials share one fixed reason (shared with the simulator
# for event parity).
REASON_CUSTOM = "Disallowed by custom decision"


@dataclass(frozen=True)
class CrawlDelegates:
    should_crawl_page: object = None
    should_crawl_page_links: object = None
    should_download_page_content: object = None
    should_recrawl_page: object = None
    should_schedule_link: object = None
    is_internal_uri: object = None
    clean_url: object = None

    def any_set(self) -> bool:
        return any(getattr(self, f) is not None for f in (
            "should_crawl_page", "should_crawl_page_links",
            "should_download_page_content", "should_recrawl_page",
            "should_schedule_link", "is_internal_uri", "clean_url"))


def scalar_call(fn, *args) -> bool:
    """Invoke a Series-contract delegate on one row (the simulator path)."""
    series = [pd.Series([a]) for a in args]
    out = fn(*series)
    return bool(out.iloc[0] if hasattr(out, "iloc") else out[0])


DELEGATE_ARITY = {
    "should_crawl_page": 3,
    "should_crawl_page_links": 3,
    "should_download_page_content": 3,
    "should_recrawl_page": 3,
    "should_schedule_link": 2,
    "is_internal_uri": 1,
}


def as_pandas_udf(fn, arity: int):
    """Wrap a Series->Series delegate as a Spark boolean pandas UDF
    (pandas_udf needs a concrete signature — one wrapper per arity)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    def _wrap(out):
        return out if isinstance(out, pd.Series) else pd.Series(out)

    if arity == 1:
        @pandas_udf(T.BooleanType())
        def _udf(a: pd.Series) -> pd.Series:
            return _wrap(fn(a))
    elif arity == 2:
        @pandas_udf(T.BooleanType())
        def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
            return _wrap(fn(a, b))
    elif arity == 3:
        @pandas_udf(T.BooleanType())
        def _udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
            return _wrap(fn(a, b, c))
    else:
        raise ValueError(f"unsupported delegate arity {arity}")
    return _udf
