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
  3. ``mapInArrow`` adds partition_offset + local_index

Pass 3 deliberately uses ``mapInArrow``, NOT ``mapInPandas``: payload
columns never round-trip through pandas. Arrow→pandas renders a nullable
int64 column as float64, silently rounding any co-batched 64-bit hash
above 2^53 (the P4 segment-quota stream carries NULL-hash correction rows
next to real url_hash64 values — exactly that shape), and object-converts
every string column. In Arrow the payload arrays pass through untouched;
only the tiny inc/marker columns are materialized as numpy.

Deterministic given deterministic sort keys (ties must be impossible — the
caller includes a unique tiebreaker). Scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _ranged(df: DataFrame, sort_cols: list[str], num_partitions: int | None,
            register_ckpt: list | None) -> DataFrame:
    """Range-partition + sort + stamp ``__pid``, pinned by localCheckpoint
    so pass 1 (per-partition aggregates) and pass 2 (offset apply) see
    identical partitioning. Callers that run per-round register the block
    for release at round end."""
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 4)
    ranged = (df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
                .sortWithinPartitions(*sort_cols))
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=True)
    if register_ckpt is not None:
        register_ckpt.append(ranged)
    return ranged


def assign_global_seq(df: DataFrame, sort_cols: list[str], out_col: str,
                      start: int = 0, num_partitions: int | None = None) -> DataFrame:
    """Add ``out_col``: dense 0-based global rank by ``sort_cols`` + start."""
    if df.isEmpty():
        return df.withColumn(out_col, F.lit(None).cast("long"))
    ranged = _ranged(df, sort_cols, num_partitions, None)

    counts = {r["__pid"]: r["cnt"] for r in
              ranged.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = T.StructType(ranged.schema.fields + [T.StructField(out_col, T.LongType())])
    out_names = [f.name for f in schema.fields]
    pid_idx = ranged.columns.index("__pid")

    def add_seq(batches):
        import numpy as np
        import pyarrow as pa
        local = 0
        base = None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            if base is None:
                base = offsets[rb.column(pid_idx)[0].as_py()]
            seq = pa.array(np.arange(base + local, base + local + n,
                                     dtype=np.int64))
            local += n
            yield pa.RecordBatch.from_arrays(list(rb.columns) + [seq],
                                             names=out_names)

    return ranged.mapInArrow(add_seq, schema=schema).drop("__pid")


def assign_global_cumsums(df: DataFrame, sort_cols: list[str],
                          inc_out: list[tuple[str, str]],
                          num_partitions: int | None = None,
                          register_ckpt: list | None = None) -> DataFrame:
    """Multi-column form of :func:`assign_global_cumsum`: one ranged
    shuffle + one driver round-trip produces an inclusive running sum per
    (inc_col, out_col) pair — the P4 segment-quota admission needs three
    prefixes (consuming links, retries, corrections) over the same order
    and must not pay three shuffles for them. Inc columns must be
    non-null integers; payload columns may be anything (they pass through
    as Arrow arrays untouched — see module docstring)."""
    if df.isEmpty():
        for _, out_col in inc_out:
            df = df.withColumn(out_col, F.lit(None).cast("long"))
        return df
    ranged = _ranged(df, sort_cols, num_partitions, register_ckpt)

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
    pid_idx = ranged.columns.index("__pid")
    inc_idx = [ranged.columns.index(ic) for ic, _oc in inc_out]

    def add_cumsums(batches):
        import numpy as np
        import pyarrow as pa
        carry = [0] * len(inc_out)
        base = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if base is None:
                base = offsets[rb.column(pid_idx)[0].as_py()]
            new = []
            for i, idx in enumerate(inc_idx):
                inc = rb.column(idx).to_numpy(zero_copy_only=False) \
                        .astype(np.int64)
                run = inc.cumsum() + (base[i] + carry[i])
                new.append(pa.array(run))
                carry[i] = int(run[-1]) - base[i]
            yield pa.RecordBatch.from_arrays(list(rb.columns) + new,
                                             names=out_names)

    return ranged.mapInArrow(add_cumsums, schema=schema).drop("__pid")


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
    return assign_global_cumsums(df, sort_cols, [(inc_col, out_col)],
                                 num_partitions=num_partitions,
                                 register_ckpt=register_ckpt)
