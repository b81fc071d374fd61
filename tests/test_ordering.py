"""Direct unit tests for the two-pass range-partitioned sequencers
(operators/ordering.py) — the scalable replacements for single-partition
``row_number()/sum() OVER (ORDER BY ...)`` windows (S1 frontier order and
the P4 budget backlog; WebCrawler.cs evaluates both sequentially)."""

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from abot_dotnet_core_spark.operators.ordering import (assign_global_cumsum,
                                                       assign_global_cumsums,
                                                       assign_global_seq)


def _rows(n, seed=7):
    # deterministic shuffled keys with a 0/1 inc column
    keys = [((i * 48271 + seed) % 60013, i) for i in range(n)]
    return [(k, i, (k + i) % 3 == 0) for k, i in keys]


class TestAssignGlobalSeq:
    def test_matches_single_window(self, spark):
        df = spark.createDataFrame(_rows(5000), "k long, i long, flag boolean") \
                  .repartition(16)
        got = assign_global_seq(df, ["k", "i"], "seq", start=10)
        w = W.orderBy("k", "i")
        want = df.withColumn("seq", F.row_number().over(w) + 9)
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    def test_empty(self, spark):
        df = spark.createDataFrame([], "k long, i long")
        out = assign_global_seq(df, ["k", "i"], "seq")
        assert out.count() == 0 and "seq" in out.columns


class TestAssignGlobalCumsum:
    def test_matches_single_window(self, spark):
        df = spark.createDataFrame(
            [(k, i, 1 if f else 0) for k, i, f in _rows(5000)],
            "k long, i long, inc int").repartition(16)
        got = assign_global_cumsum(df, ["k", "i"], "inc", "cum")
        w = (W.orderBy("k", "i")
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        want = df.withColumn("cum", F.sum("inc").over(w).cast("long"))
        assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    def test_all_zero_inc(self, spark):
        df = spark.createDataFrame([(i, 0) for i in range(100)],
                                   "k long, inc int").repartition(8)
        got = assign_global_cumsum(df, ["k"], "inc", "cum")
        assert got.filter(F.col("cum") != 0).count() == 0

    def test_empty(self, spark):
        df = spark.createDataFrame([], "k long, inc int")
        out = assign_global_cumsum(df, ["k"], "inc", "cum")
        assert out.count() == 0 and "cum" in out.columns


# A url_hash64 value above 2^53 — float64 cannot represent it exactly, so
# any pandas round-trip of a NULL-bearing int64 column rounds it. The P4
# segment-quota stream co-batches NULL-hash correction rows with real link
# hashes (crawler._budget_admit_with_retry_pops), which silently
# budget-denied admissible links before ordering.py moved to mapInArrow.
BIG_HASH = 8430173677383578461


class TestArrowPayloadFidelity:
    """Nullable int64 payloads must survive the sequencers bit-exactly
    even when a NULL lands in the same Arrow batch (num_partitions=1
    forces co-batching)."""

    def test_cumsums_nullable_int64_payload(self, spark):
        rows = [(0, BIG_HASH, 1), (1, None, 0), (2, BIG_HASH + 7, 1)]
        df = spark.createDataFrame(rows, "k long, payload long, inc int")
        got = assign_global_cumsums(df, ["k"], [("inc", "cum")],
                                    num_partitions=1)
        by_k = {r["k"]: (r["payload"], r["cum"]) for r in got.collect()}
        assert by_k == {0: (BIG_HASH, 1), 1: (None, 1), 2: (BIG_HASH + 7, 2)}

    def test_cumsum_nullable_int64_payload(self, spark):
        rows = [(0, None, 1), (1, BIG_HASH, 1)]
        df = spark.createDataFrame(rows, "k long, payload long, inc int")
        got = assign_global_cumsum(df, ["k"], "inc", "cum", num_partitions=1)
        by_k = {r["k"]: (r["payload"], r["cum"]) for r in got.collect()}
        assert by_k == {0: (None, 1), 1: (BIG_HASH, 2)}

    def test_seq_nullable_int64_payload(self, spark):
        rows = [(0, BIG_HASH), (1, None), (2, BIG_HASH + 1)]
        df = spark.createDataFrame(rows, "k long, payload long")
        got = assign_global_seq(df, ["k"], "seq", num_partitions=1)
        by_k = {r["k"]: (r["payload"], r["seq"]) for r in got.collect()}
        assert by_k == {0: (BIG_HASH, 0), 1: (None, 1), 2: (BIG_HASH + 1, 2)}
