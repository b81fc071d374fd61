"""Unit tests for distributed BPE training: the Sennrich et al. (2016)
reference example, greedy non-overlapping merge semantics, deterministic
tiebreaks, and early stop when the vocab runs out of pairs."""

from pyspark.sql import Row


def _words(spark, counts):
    return spark.createDataFrame(
        [Row(word=w, cnt=c) for w, c in counts.items()],
        schema="word string, cnt long")


class TestBpeTrain:
    def test_sennrich_example(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        words = _words(spark, {"low": 5, "lower": 2,
                               "newest": 6, "widest": 3})
        out = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_train(words, n_merges=5)
               .orderBy("rank").collect()]
        # ranks 1-3: the es/est/est</w> chain at count 9 (ties broken by
        # pair asc), then the low/lower stem at 7
        assert out == [(1, "e", "s", 9),
                       (2, "es", "t", 9),
                       (3, "est", "</w>", 9),
                       (4, "l", "o", 7),
                       (5, "lo", "w", 7)]

    def test_greedy_nonoverlap(self, spark):
        from abot_dotnet_core_spark.functions.bpe import (bpe_segment,
                                                          bpe_train)
        words = _words(spark, {"aaaa": 1})
        out = bpe_train(words, n_merges=1).collect()
        assert (out[0].left_sym, out[0].right_sym,
                out[0].pair_count) == ("a", "a", 3)
        seg = bpe_segment(words, [("a", "a")]).collect()[0]
        assert seg.syms == ["aa", "aa", "</w>"]  # NOT [aa, a, a...] overlap

    def test_early_stop_when_pairs_exhausted(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        out = bpe_train(_words(spark, {"a": 1}), n_merges=5).collect()
        assert len(out) == 1
        assert (out[0].left_sym, out[0].right_sym) == ("a", "</w>")

    def test_chained_merges_segment(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_segment
        seg = bpe_segment(_words(spark, {"lowest": 1}),
                          [("e", "s"), ("es", "t"), ("est", "</w>"),
                           ("l", "o"), ("lo", "w")]).collect()[0]
        assert seg.syms == ["low", "est</w>"]
