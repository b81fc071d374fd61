"""Recrawl / snapshot-history operators over (url, warc_ts) page tables.

A steady-state crawler re-fetches URLs and accumulates snapshot history in
the corpus table (the BASELINE input shape: url, warc_ts, html, text, lang).
These operators answer the two standard questions over that history:

  keep_latest   one row per key = the newest snapshot (recrawl dedup); the
                Abot analogue is CrawledUrlRepository replacing a re-seen
                URL's PageToCrawl (Abot/src/Abot/Core/CrawledUrlRepository.cs
                semantics generalised to timestamped history)
  asof_join     for each probe row, the newest build-side row at-or-before
                its timestamp per key ("state as of fetch time") — e.g. the
                robots snapshot / domain config in force when a page was
                fetched

Scale posture: keep_latest is a single hash-shuffle on the key with a
per-key window whose partitions are snapshot-count sized (bounded by
recrawl frequency, not corpus size). asof_join is the union-tag trick —
one shuffle on the key, one ordered window pass, no range-explosion and no
per-row Python; ties at equal timestamps resolve build-before-probe, which
matches ANSI/DuckDB ``ASOF JOIN`` (>= semantics).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def keep_latest(df: DataFrame, key_cols: Sequence[str], ts_col: str,
                tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Newest snapshot per key; deterministic under timestamp ties via
    ``tiebreak_cols`` (descending, then any remaining ambiguity is a data
    bug the caller owns)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def asof_join(probe: DataFrame, build: DataFrame, key_cols: Sequence[str],
              probe_ts: str, build_ts: str,
              value_cols: Sequence[str]) -> DataFrame:
    """Left as-of join: every probe row, annotated with the build row having
    the greatest ``build_ts`` <= ``probe_ts`` for the same key (NULLs when
    none exists).

    Implementation is the scalable union-tag form: tag build rows 0 and
    probe rows 1, sort each key group by (ts, tag), and carry the last
    non-null build values forward with ``last(..., ignorenulls=True)`` over
    an unbounded-preceding window. One shuffle on the key, linear scan per
    group — no inequality-join explosion. Equal timestamps: the build row
    sorts first (tag 0 < 1), so it IS visible to probes at the same instant
    (>= semantics, matching DuckDB ASOF JOIN).

    ``build`` must be unique per (key, build_ts); pre-aggregate otherwise.
    Output columns: all probe columns, then ``asof_<build_ts>`` and
    ``asof_<c>`` for each value column."""
    b = build.select(
        *key_cols,
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(F.col(build_ts).alias(build_ts), *value_cols).alias("__bv"))
    p = probe.select(
        *key_cols,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(b.schema["__bv"].dataType).alias("__bv"),
        F.struct(*probe.columns).alias("__pv"))
    b = b.withColumn("__pv", F.lit(None).cast(p.schema["__pv"].dataType))

    w = (W.partitionBy(*key_cols).orderBy("__ts", "__tag")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    merged = (p.unionByName(b)
              .withColumn("__last", F.last("__bv", ignorenulls=True).over(w))
              .where(F.col("__tag") == 1))
    out_cols = [F.col(f"__pv.{c}").alias(c) for c in probe.columns]
    out_cols.append(F.col(f"__last.{build_ts}").alias(f"asof_{build_ts}"))
    out_cols += [F.col(f"__last.{c}").alias(f"asof_{c}") for c in value_cols]
    return merged.select(*out_cols)


def recrawl_schedule(snaps: DataFrame, now_epoch: int,
                     key_cols: Sequence[str] = ("url",),
                     ts_col: str = "warc_ts", fp_col: str = "fingerprint",
                     min_interval_s: int = 3600,
                     max_interval_s: int = 30 * 86400) -> DataFrame:
    """Change-rate recrawl scheduling over snapshot history (the freshness
    model of Cho & Garcia-Molina, "Effective Page Refresh Policies for Web
    Crawlers", TODS 2003, in integer-exact form).

    Per key: count content changes between consecutive snapshots (by
    fingerprint), estimate the change interval as observed_span / changes,
    clamp it to [min_interval_s, max_interval_s], and schedule the next
    fetch that far after the newest snapshot. ``priority_micro`` is
    age/interval in millionths at ``now_epoch`` (a fixed epoch-seconds
    instant the caller supplies — determinism requires the clock to be an
    input, never wall time): >= 1e6 means overdue (``due``). URLs with one
    snapshot (or none changed) get the max interval — unknown-rate pages
    sink to the slow tier instead of hogging the frontier.

    Every derived quantity is int64 floor arithmetic, so distributed
    partial-agg order cannot perturb the result and a sequential SQL
    oracle matches bit-for-bit.

    Plan shape: one shuffle on the key for the consecutive-change window
    (partitions sized by snapshots-per-url, bounded by recrawl frequency),
    then a partial agg on the same key — Catalyst reuses the window's
    partitioning, so the agg adds no second shuffle.
    """
    keys = list(key_cols)
    # fingerprint tiebreak: equal-timestamp snapshots would otherwise make
    # the lag order (and so n_changes) depend on partition layout
    w = W.partitionBy(*keys).orderBy(ts_col, fp_col)
    marked = snaps.withColumn(
        "__chg",
        F.coalesce((F.col(fp_col) != F.lag(fp_col).over(w)).cast("int"),
                   F.lit(0)))
    agg = (marked.groupBy(*keys)
           .agg(F.count("*").alias("n_snaps"),
                F.sum("__chg").alias("n_changes"),
                F.min(F.unix_timestamp(ts_col)).alias("__first"),
                F.max(F.unix_timestamp(ts_col)).alias("__last")))
    raw = F.when(F.col("n_changes") > 0,
                 F.expr("(__last - __first) DIV n_changes")) \
           .otherwise(F.lit(max_interval_s))
    interval = F.least(F.greatest(raw, F.lit(min_interval_s)),
                       F.lit(max_interval_s))
    age = F.lit(now_epoch) - F.col("__last")
    return (agg.withColumn("interval_s", interval.cast("long"))
            .withColumn("next_fetch_epoch",
                        (F.col("__last") + F.col("interval_s")).cast("long"))
            .withColumn("priority_micro", F.expr(
                f"(({now_epoch} - __last) * 1000000) DIV interval_s"))
            .withColumn("due", F.col("priority_micro") >= 1000000)
            .select(*keys, "n_snaps", "n_changes", "interval_s",
                    "next_fetch_epoch", "priority_micro", "due"))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: Sequence[str] = ("url",),
                  fp_col: str = "fingerprint") -> DataFrame:
    """Classify every key across two crawl snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, different fingerprint),
    ``unchanged`` — the delta report a recrawl round feeds back into
    freshness models (``recrawl_schedule``) and incremental exports.

    Inputs must be one row per key (run ``keep_latest`` first on raw
    snapshot history). Plan shape: one full-outer hash join on the key —
    one shuffle per side, or zero if both snapshots are bucketed/stored
    partitioned by the key (the statestore layout), since Catalyst reuses
    co-partitioning. No window, no skew exposure beyond the key itself.

    Returns (key..., old_fp, new_fp, change).
    """
    keys = list(key_cols)
    o = old.select(*keys, F.col(fp_col).alias("old_fp"))
    n = new.select(*keys, F.col(fp_col).alias("new_fp"))
    change = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
              .otherwise(F.lit("unchanged")))
    return (o.join(n, keys, "full_outer")
            .select(*keys, "old_fp", "new_fp", change.alias("change")))


def capture_stats(df: DataFrame, url_col: str = "url",
                  ts_col: str = "ts") -> DataFrame:
    """Per-URL capture-history profile from a (url, ts) capture log (a CDX
    index, the url_history table, a WARC manifest): capture count, first /
    last timestamp, mean and max inter-capture gap in whole seconds.

    The change-rate input for recrawl scheduling: URLs with short, regular
    gaps are news-like (recrawl often); a large max/mean gap ratio marks
    bursty histories (one-off edits). mean_gap_s is exact integer
    (last-first) DIV (n-1) — no per-row gap pass needed; max_gap_s is the
    one window pass (lag over ts within url, partition size = captures per
    url, bounded by crawl frequency, never by corpus size).
    """
    w = W.partitionBy("__u").orderBy("__ts")
    gaps = (df.select(F.col(url_col).alias("__u"),
                      F.col(ts_col).cast("long").alias("__ts"))
            .withColumn("__gap", F.col("__ts") - F.lag("__ts").over(w)))
    return (gaps.groupBy(F.col("__u").alias(url_col))
            .agg(F.count("*").alias("n_captures"),
                 F.min("__ts").alias("first_ts"),
                 F.max("__ts").alias("last_ts"),
                 F.expr("CASE WHEN count(*) > 1 THEN "
                        "(max(__ts) - min(__ts)) DIV (count(*) - 1) "
                        "ELSE 0 END").alias("mean_gap_s"),
                 F.coalesce(F.max("__gap"), F.lit(0)).alias("max_gap_s")))
