"""Scalable deterministic global sequencing (the FIFO-frontier order, S1).

The engine needs dense global ranks in canonical order (round, parent_seq,
sub_order, link_pos) to (a) assign next-round ``priority_seq`` values and
(b) evaluate the sequential budget predicates P4/P16. A naive
``row_number() OVER (ORDER BY ...)`` collapses to a single partition — fine
at test scale, fatal at 10^10 URLs. This module implements the standard
two-pass range-partition trick instead:

  1. ``repartitionByRange`` + ``sortWithinPartitions`` on the sort keys
  2. count rows per partition, cumulative-sum the counts on the driver
     (O(#partitions), tiny)
  3. ``mapInPandas`` adds partition_offset + local_index

Deterministic given deterministic sort keys (ties must be impossible — the
caller includes a unique tiebreaker). Scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def assign_global_seq(df: DataFrame, sort_cols: list[str], out_col: str,
                      start: int = 0, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col``: dense 0-based global rank by ``sort_cols`` + start."""
    if df.isEmpty():
        return df.withColumn(out_col, F.lit(None).cast("long"))
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)

    ranged = (df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
                .sortWithinPartitions(*sort_cols))
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    # cache so pass 1 (counts) and pass 2 (offsets) see identical partitioning
    ranged = ranged.localCheckpoint(eager=True)

    counts = {r["__pid"]: r["cnt"] for r in
              ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = T.StructType(ranged.schema.fields + [T.StructField(out_col, T.LongType())])
    out_names = [f.name for f in schema.fields]

    def add_seq(batches):
        import pandas as pd
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[out_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf[out_names]

    return ranged.mapInPandas(add_seq, schema=schema).drop("__pid")


def assign_global_cumsums(df: DataFrame, sort_cols: list[str],
                          inc_out: list[tuple[str, str]],
                          num_partitions: int | None = None,
                          register_ckpt: list | None = None) -> DataFrame:
    """Multi-column form of :func:`assign_global_cumsum`: one ranged
    shuffle + one driver round-trip produces an inclusive running sum per
    (inc_col, out_col) pair — the P4 segment-quota admission needs three
    prefixes (consuming links, retries, corrections) over the same order
    and must not pay three shuffles for them."""
    if df.isEmpty():
        for _, out_col in inc_out:
            df = df.withColumn(out_col, F.lit(None).cast("long"))
        return df
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)

    ranged = (df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
                .sortWithinPartitions(*sort_cols))
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)
    if register_ckpt is not None:
        register_ckpt.append(ranged)

    sums = {r["__pid"]: r for r in
            ranged.groupBy("__pid")
                  .agg(*[F.sum(F.col(ic).cast("long")).alias(oc)
                         for ic, oc in inc_out])
                  .collect()}
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(inc_out)
    for pid in sorted(sums):
        offsets[pid] = list(acc)
        for i, (_ic, oc) in enumerate(inc_out):
            acc[i] += sums[pid][oc] or 0

    schema = T.StructType(ranged.schema.fields
                          + [T.StructField(oc, T.LongType())
                             for _ic, oc in inc_out])
    out_names = [f.name for f in schema.fields]

    def add_cumsums(batches):
        carry = [0] * len(inc_out)
        started = False
        base = [0] * len(inc_out)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not started:
                base = offsets[int(pdf["__pid"].iloc[0])]
                started = True
            pdf = pdf.copy()
            for i, (ic, oc) in enumerate(inc_out):
                run = pdf[ic].astype("int64").cumsum() + (base[i] + carry[i])
                pdf[oc] = run
                carry[i] = int(run.iloc[-1]) - base[i]
            yield pdf[out_names]

    return ranged.mapInPandas(add_cumsums, schema=schema).drop("__pid")


def assign_global_cumsum(df: DataFrame, sort_cols: list[str], inc_col: str,
                         out_col: str,
                         num_partitions: int | None = None,
                         register_ckpt: list | None = None) -> DataFrame:
    """Add ``out_col``: inclusive running sum of ``inc_col`` in global
    ``sort_cols`` order — the distributed form of
    ``sum(inc) OVER (ORDER BY sort_cols ROWS UNBOUNDED PRECEDING)``.

    Same two-pass range-partition scheme as :func:`assign_global_seq`:
    pass 1 sums ``inc_col`` per range partition (O(#partitions) driver
    state), pass 2 adds each partition's prefix offset to its local
    cumulative sum. Used by the P4 budget predicate when the remaining
    budget is too large for a TakeOrdered + single-partition window
    (WebCrawler.cs:739-755 evaluates the same running backlog count
    sequentially; this is its scalable batch equivalent).
    """
    if df.isEmpty():
        return df.withColumn(out_col, F.lit(None).cast("long"))
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)

    ranged = (df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
                .sortWithinPartitions(*sort_cols))
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    # the checkpoint pins shuffle output so pass 1 (sums) and pass 2
    # (offsets) see identical partitioning; callers that invoke this
    # per-round pass register_ckpt so the blocks are released at round end
    ranged = ranged.localCheckpoint(eager=True)
    if register_ckpt is not None:
        register_ckpt.append(ranged)

    sums = {r["__pid"]: r["s"] for r in
            ranged.groupBy("__pid")
                  .agg(F.sum(F.col(inc_col).cast("long")).alias("s"))
                  .collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid] or 0

    schema = T.StructType(ranged.schema.fields + [T.StructField(out_col, T.LongType())])
    out_names = [f.name for f in schema.fields]

    def add_cumsum(batches):
        carry = 0
        started = False
        base = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not started:
                base = offsets[int(pdf["__pid"].iloc[0])]
                started = True
            pdf = pdf.copy()
            run = pdf[inc_col].astype("int64").cumsum() + (base + carry)
            pdf[out_col] = run
            carry = int(run.iloc[-1]) - base
            yield pdf[out_names]

    return ranged.mapInPandas(add_cumsum, schema=schema).drop("__pid")
