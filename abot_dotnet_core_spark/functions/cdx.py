"""CDX URL index — SURT keys + range-sorted index layout.

Common Crawl publishes a CDX(J) index beside its WARC segments: one row
per capture, keyed by the SURT form of the URL (Sort-friendly URI
Reordering Transform) so that a lexicographic range scan retrieves a
domain's captures contiguously. The reference crawler has no index sink;
this op closes that ecosystem gap for the WARC source/sink pair
(sources/warc.py) already in the repo.

Simplified SURT implemented here (the documented subset — enough for
range-scan locality, all JVM codegen):
  - lowercase; scheme dropped; port dropped; leading ``www.`` dropped
  - host labels reversed and comma-joined   example.com -> com,example
  - ``)`` + path (empty path -> ``/``)
  - query params sorted ascending, re-joined with ``&`` after ``?``

Scale posture: SURT is a row-local expression (zero Python, zero
shuffle); the index layout is ONE range-partition exchange on
(surt_key, ts) + an in-partition sort — the classic write-a-sorted-index
plan (never a single-partition global sort). Each output partition is a
contiguous SURT range, so a reader binary-searches partition boundaries
then scans one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def surt_key_col(url_col):
    """SURT key as a pure column expression."""
    low = F.lower(url_col)
    host = F.regexp_replace(
        F.regexp_replace(F.parse_url(low, F.lit("HOST")), r"^www\.", ""),
        r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    raw_path = F.coalesce(F.parse_url(low, F.lit("PATH")), F.lit(""))
    path = F.when(raw_path == "", "/").otherwise(raw_path)
    query = F.parse_url(low, F.lit("QUERY"))
    qsorted = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.concat(
        rev, F.lit(")"), path,
        F.when(query.isNotNull() & (query != ""),
               F.concat(F.lit("?"), qsorted)).otherwise(F.lit("")))


def cdx_index(captures: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", num_partitions: int | None = None,
              extra_cols: list[str] | None = None) -> DataFrame:
    """(surt_key, ts, url, *extra) range-partitioned and sorted by
    (surt_key, ts) — write each partition to one index shard and the shard
    boundaries ARE the lookup fan-out. extra_cols carries locator columns
    (segment file, record offset) straight through."""
    cols = [surt_key_col(F.col(url_col)).alias("surt_key"),
            F.col(ts_col).alias("ts"), F.col(url_col).alias("url")]
    cols += [F.col(c) for c in (extra_cols or [])]
    idx = captures.select(*cols)
    if num_partitions:
        idx = idx.repartitionByRange(num_partitions, "surt_key", "ts")
    else:
        idx = idx.repartitionByRange("surt_key", "ts")
    return idx.sortWithinPartitions("surt_key", "ts")


def cdx_range_lookup(idx: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures under a SURT prefix (a domain, a path subtree) from
    the range-sorted index — the read path the CDX layout exists for.

    ``startswith`` compiles to a StringStartsWith scan filter, which is
    sargable against both parquet row-group min/max stats and the
    range-partition boundaries cdx_index wrote: only shards whose
    [min, max] SURT range intersects the prefix interval are read at all,
    so a single-domain lookup over a 10^10-capture index touches O(1)
    shards. No shuffle — the result stays in captured (surt, ts) order
    per shard.
    """
    return idx.filter(F.col("surt_key").startswith(surt_prefix))
