"""abot_dotnet_core_spark — a from-scratch PySpark-native distributed crawl engine.

Re-expresses the query/data-processing capabilities of the reference crawler
(ninameed/abot-dotnet-core, a single-process multi-threaded polite web crawler)
as set-at-a-time DataFrame jobs:

- frontier / seen-set / domain-state live in partitioned, snapshot-checkpointed
  tables (parquet in this sandbox; the state-store API is Iceberg-shaped);
- every per-page decision of the reference (``CrawlDecisionMaker``,
  ``Scheduler``, ``DomainRateLimiter``, ``RobotsDotText``) becomes a column
  expression, window function, or broadcast join over a whole crawl round;
- HTML link/text extraction run as Arrow-batched pandas UDFs
  (no per-row Python in the relational path).

Layout:
  kernel/    pure-Python semantics (also the pytest oracle; no Spark imports)
  functions/ pandas UDFs + column-expression libraries (dedup, similarity, text)
  operators/ DataFrame-level crawl operators (decisions, admission, frontier)
  sources/   corpus generator/reader + snapshot state store
  plans/     plan inspection helpers (explain/pushdown assertions)
  streaming/ Structured Streaming variants (metrics over event streams)
  crawler.py the round-loop driver (CrawlEngine)
"""

__version__ = "0.1.0"
