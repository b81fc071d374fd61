"""Streaming crawl/event telemetry (windowed aggregation with watermarks).

Demonstrates the engine's streaming surface over an event feed (the driver's
``events`` table shape: event_id, ts, user_id, event_type, value, props):

  tumbling_counts   1-minute tumbling windows per event_type, 10-min watermark
  sliding_counts    hopping windows (size > slide, epoch-aligned overlap)
  session_stats     session windows (30-min gap) per user

Batch equivalents of the same windows are exposed in __spark_entry__ (they
share these builders — DataFrames don't care if the source is a stream), so
the correctness oracle covers the window logic even though the driver can't
diff a live stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "10 minutes") -> DataFrame:
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the cast
    # is value-preserving
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def sliding_counts(events: DataFrame, window: str = "2 hours",
                   slide: str = "1 hour",
                   watermark: str = "10 minutes") -> DataFrame:
    """Hopping-window aggregation (each event lands in window/slide
    overlapping windows, epoch-aligned — F.window's sliding form). Same
    stream/batch duality as tumbling_counts; with watermarking this is the
    standard late-data-tolerant rolling rate metric (e.g. 2-hour crawl
    throughput refreshed hourly)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window, slide).alias("w"),
                        "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows via gap detection (batch form: lag + cumulative sum;
    streaming form would use F.session_window — same semantics)."""
    from pyspark.sql import Window as W
    w_user = W.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP_NTZ (parquet) — normalize to TIMESTAMP up front so
    # session_start/session_end come out as plain timestamps (the same route
    # tumbling_counts takes; session tz is UTC so the cast is value-preserving)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    epoch = F.col("ts").cast("long")
    gap = epoch - F.lag(epoch).over(w_user)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w_user.rowsBetween(W.unboundedPreceding, W.currentRow)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.round(F.sum("value"), 6).alias("sum_value")))


def interval_join(views: DataFrame, clicks: DataFrame,
                  lookback: str = "2 hours",
                  watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream (or batch) event-time interval join: each click pairs
    with every view by the same user whose timestamp falls in
    ``[click_ts - lookback, click_ts]`` — the attribution join (view→click
    conversion within a lookback horizon).

    In streaming mode both sides carry watermarks and the join condition
    bounds view_ts by click_ts on both ends, so Spark can expire join state
    once the watermark passes ``click_ts`` (bounded state — the requirement
    for a stream-stream inner join). The batch form is the identical plan
    minus watermarks, which is what the SQL oracle diffs.
    """
    v = views.select(F.col("event_id").alias("view_id"), "user_id",
                     F.col("ts").cast("timestamp").alias("view_ts"))
    c = clicks.select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("click_user"),
                      F.col("ts").cast("timestamp").alias("click_ts"))
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = ((v["user_id"] == c["click_user"])
            & (v["view_ts"] <= c["click_ts"])
            & (v["view_ts"] >= c["click_ts"] - F.expr(f"INTERVAL {lookback}")))
    return (v.join(c, cond)
            .select("user_id", "view_id", "click_id",
                    (F.col("click_ts").cast("long")
                     - F.col("view_ts").cast("long")).alias("gap_sec")))


def stream_interval_join(spark, source_path: str, checkpoint: str,
                         out_path: str, lookback: str = "2 hours"):
    """availableNow wiring for interval_join over one parquet event feed
    (view rows join click rows read from the same stream)."""
    schema = spark.read.parquet(source_path).schema

    def side(event_type):
        return (spark.readStream.schema(schema).parquet(source_path)
                .filter(F.col("event_type") == event_type))

    joined = interval_join(side("view"), side("click"), lookback=lookback)
    return (joined.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .format("parquet").option("path", out_path))


DOMAIN_COUNTS_OUT = "domain string, crawled_total bigint"
DOMAIN_COUNTS_STATE = "cnt bigint"


def domain_counts_stateful(crawled: DataFrame) -> DataFrame:
    """A2 as a custom stateful streaming operator: per-domain cumulative
    crawled counters via ``applyInPandasWithState`` — the streaming analogue
    of the reference's ``CrawlContext.CrawlCountByDomain``
    (Abot/src/Abot/Poco/CrawlContext.cs:41, updated WebCrawler.cs:927).
    State (one int64 per domain) survives across triggers through the
    checkpoint, so a restarted telemetry job resumes exact totals."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"domain": [key[0]], "crawled_total": [cnt]})

    return (crawled.groupBy("domain")
            .applyInPandasWithState(update,
                                    outputStructType=DOMAIN_COUNTS_OUT,
                                    stateStructType=DOMAIN_COUNTS_STATE,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def stream_domain_counts(spark, source_path: str, checkpoint: str,
                         out_path: str):
    """availableNow wiring for domain_counts_stateful over a parquet feed of
    crawled events (any schema with a ``domain`` column)."""
    schema = spark.read.parquet(source_path).schema
    stream = spark.readStream.schema(schema).parquet(source_path)
    agg = domain_counts_stateful(stream)
    return (agg.writeStream.outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, epoch:
                          df.write.mode("append").parquet(out_path)))


def stream_url_dedup(spark, source_path: str, checkpoint: str,
                     out_path: str, watermark: str = "1 hour"):
    """Streaming URL seen-filter: the frontier dedup (S2) as a structured-
    streaming operator. A parquet feed of discovered links (url, ts) is
    deduplicated on the kernel's int64 url hash with
    ``dropDuplicatesWithinWatermark`` — state for a url is retained until
    the watermark passes its event time + delay, so re-discoveries inside
    the politeness horizon are dropped exactly once-per-url while state
    stays bounded (the streaming analogue of the batch engine's seen
    anti-join + bloom filter; Abot's CrawledUrlRepository.AddIfNew).
    State survives availableNow restarts via the checkpoint."""
    from abot_dotnet_core_spark.functions.udfs import url_hash64_udf
    schema = spark.read.parquet(source_path).schema
    stream = (spark.readStream.schema(schema).parquet(source_path)
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .withColumn("url_hash", url_hash64_udf(F.col("url")))
              .withWatermark("ts", watermark)
              .dropDuplicatesWithinWatermark(["url_hash"]))
    return (stream.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .format("parquet").option("path", out_path))


def stream_tumbling_counts(spark, source_path: str, checkpoint: str,
                           out_path: str, window: str = "1 hour"):
    """availableNow streaming job over a parquet directory feed — the real
    readStream/writeStream wiring (used by tests with a tmp checkpoint)."""
    schema = spark.read.parquet(source_path).schema
    stream = (spark.readStream.schema(schema).parquet(source_path))
    agg = tumbling_counts(stream, window=window)
    return (agg.writeStream.outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", checkpoint)
            .format("parquet").option("path", out_path))


def funnel_stages(events: DataFrame, stages: list,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered funnel analysis: for each user, the earliest time each
    stage was completed IN ORDER — stage k counts only strictly after the
    user's stage-k-1 completion time (first signup, first view AFTER
    that, ...). The classic conversion-funnel query, here as one
    conditional-min aggregation pass per stage over the pre-aggregated
    (user, stage) -> min/sorted-ts table.

    Returns (user, t_<stage>... as epoch-microsecond bigints, n_stages)
    for every user with at least stage 1; NULL ts marks an unreached
    stage. Epoch integers, not timestamps, so the output hashes
    identically across engines regardless of timezone normalization.

    Scale posture: ONE groupBy(user, type) collecting each user's sorted
    event-time array per stage type (shuffle volume = users x stages,
    event volume collapses map-side), then a row-local fold across the
    <= |stages| arrays — no per-stage join cascade, no window over the
    raw event stream. Array sizes are per-user-per-type event counts;
    a pathological single user with 10^8 events of one type would need
    the windowed variant instead (documented, not guarded)."""
    sl = list(stages)
    ev = (events
          .where(F.col(type_col).isin(sl))
          .select(F.col(user_col).alias("user"),
                  F.col(type_col).alias("etype"),
                  F.col(ts_col).cast("timestamp").alias("t")))
    per = (ev.groupBy("user", "etype")
           .agg(F.sort_array(F.collect_list(
               F.unix_micros(F.col("t")))).alias("ts_sorted")))
    wide = (per.groupBy("user")
            .pivot("etype", sl)
            .agg(F.first("ts_sorted")))
    # fold: t_0 = min(arr_0); t_k = min over arr_k of values > t_{k-1}
    prev = None
    cols = [F.col("user")]
    names = []
    for i, st in enumerate(sl):
        arr = F.coalesce(F.col(st), F.array().cast("array<long>"))
        if prev is None:
            t = F.try_element_at(arr, F.lit(1))
        else:
            t = F.when(prev.isNotNull(),
                       F.try_element_at(F.filter(arr, lambda x: x > prev),
                                        F.lit(1)))
        t = t.alias(f"t_{st}")
        names.append(f"t_{st}")
        cols.append(t)
        prev = F.col(f"t_{st}")
        wide = wide.select(*cols, *[F.col(s) for s in sl[i + 1:]])
        cols = [F.col("user")] + [F.col(n) for n in names]
    n_stages = sum(F.when(F.col(n).isNotNull(), 1).otherwise(0)
                   for n in names)
    return (wide.select("user", *names,
                        n_stages.cast("int").alias("n_stages"))
            .where(F.col(names[0]).isNotNull()))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (integer weeks since epoch — pure bigint arithmetic, no calendar
    functions, so every engine agrees), counted as active at each
    week-offset from their cohort. The standard retention triangle.

    Returns (cohort_week, week_offset, n_users) with n_users = distinct
    users of that cohort active in that offset week.

    Scale posture: one (user, week) dedup hash-agg (map-side combine
    collapses event volume), one per-user min, a broadcast-able join
    back (users dimension), one final hash-agg. No windows, no UDF."""
    uw = (events.select(F.col(user_col).alias("user"),
                        F.expr(f"unix_micros(cast({ts_col} as timestamp))"
                               " DIV 604800000000").alias("week"))
          .distinct())
    cohort = uw.groupBy("user").agg(F.min("week").alias("cohort_week"))
    return (uw.join(cohort, "user")
            .groupBy("cohort_week",
                     (F.col("week") - F.col("cohort_week"))
                     .alias("week_offset"))
            .agg(F.count("*").alias("n_users")))
