"""Streaming crawl/event telemetry (windowed aggregation with watermarks).

Demonstrates the engine's streaming surface over an event feed (the driver's
``events`` table shape: event_id, ts, user_id, event_type, value, props):

  tumbling_counts   1-minute tumbling windows per event_type, 10-min watermark
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


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows via gap detection (batch form: lag + cumulative sum;
    streaming form would use F.session_window — same semantics)."""
    from pyspark.sql import Window as W
    w_user = W.partitionBy("user_id").orderBy("ts")
    # ts may be TIMESTAMP_NTZ (parquet) — route through timestamp for epoch
    epoch = F.col("ts").cast("timestamp").cast("long")
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
