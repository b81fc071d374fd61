"""phrase_search, index_merge, cdx_range_lookup unit + plan tests."""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from abot_dotnet_core_spark.functions.cdx import (
    cdx_index, cdx_range_lookup, surt_key_col)
from abot_dotnet_core_spark.functions.textfns import index_merge, phrase_search
from abot_dotnet_core_spark.plans.inspect import formatted_plan, simple_plan


class TestPhraseSearch:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])

    def test_counts_and_positions(self, spark):
        df = self._df(spark, [
            "x quick brown fox y quick brown fox z",   # matches at 1 and 5
            "quick brown fox",                          # match at 0
            "quick fox brown",                          # scrambled: no match
            "nothing here",
        ])
        got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
               for r in phrase_search(df, "quick brown fox").collect()}
        assert got == {0: (2, 1), 1: (1, 0)}

    def test_overlapping_matches(self, spark):
        df = self._df(spark, ["a a a a"])
        got = phrase_search(df, "a a").collect()
        assert (got[0]["n_matches"], got[0]["first_pos"]) == (3, 0)

    def test_case_insensitive(self, spark):
        df = self._df(spark, ["The Quick BROWN fox"])
        assert phrase_search(df, "Quick brown FOX").count() == 1

    def test_single_term(self, spark):
        df = self._df(spark, ["b a b a b"])
        got = phrase_search(df, "b").collect()
        assert (got[0]["n_matches"], got[0]["first_pos"]) == (3, 0)

    def test_empty_phrase_raises(self, spark):
        with pytest.raises(ValueError):
            phrase_search(self._df(spark, ["x"]), "  ")


class TestIndexMerge:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            [Row(term=t, doc_id=d) for t, d in rows])

    def test_merge_overlap_and_tombstones(self, spark):
        base = self._pairs(spark, [("cat", 1), ("cat", 2), ("dog", 1)])
        delta = self._pairs(spark, [("cat", 2), ("cat", 3), ("emu", 9)])
        tomb = spark.createDataFrame([Row(doc_id=1)])
        got = {r["term"]: (r["doc_freq"], r["postings_md5"])
               for r in index_merge(base, delta, tomb).collect()}
        def dig(ids):
            return hashlib.md5(",".join(map(str, sorted(ids)))
                               .encode()).hexdigest()
        # cat: {1,2,3} minus tombstone 1 -> {2,3}; dog: {1} fully deleted
        assert got["cat"] == (2, dig([2, 3]))
        assert got["emu"] == (1, dig([9]))
        assert "dog" not in got

    def test_empty_delta_is_identity_minus_tombstones(self, spark):
        base = self._pairs(spark, [("t", 5), ("t", 6)])
        delta = spark.createDataFrame([], "term string, doc_id bigint")
        tomb = spark.createDataFrame([], "doc_id bigint")
        got = index_merge(base, delta, tomb).collect()
        assert [(r["term"], r["doc_freq"]) for r in got] == [("t", 2)]


class TestCdxLookup:
    def test_prefix_scan_exact_set(self, spark):
        caps = spark.createDataFrame([
            Row(url=f"http://d{i % 3}.test/p{i}", warc_ts=1000 + i)
            for i in range(30)])
        idx = cdx_index(caps, num_partitions=4)
        got = cdx_range_lookup(idx, "test,d1)").collect()
        assert len(got) == 10
        assert all(r["surt_key"].startswith("test,d1)") for r in got)

    def test_startswith_pushed_to_parquet_scan(self, spark, tmp_path):
        caps = spark.createDataFrame([
            Row(url=f"http://d{i % 3}.test/p{i}", warc_ts=1000 + i)
            for i in range(30)])
        p = str(tmp_path / "cdx")
        cdx_index(caps, num_partitions=2).write.parquet(p)
        df = cdx_range_lookup(spark.read.parquet(p), "test,d1)")
        plan = formatted_plan(df)
        assert "StartsWith" in plan, plan      # sargable: reaches the scan
        assert df.count() == 10


class TestProximitySearch:
    def _df(self, spark, texts):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])

    def test_window_and_span(self, spark):
        from abot_dotnet_core_spark.functions.textfns import proximity_search
        df = self._df(spark, [
            "alpha x x beta",          # span 4: within window 4
            "alpha x x x beta",        # span 5: outside window 4
            "beta alpha",              # order-free, span 2
            "alpha only here",
            "nothing at all",
        ])
        got = {r["doc_id"]: (r["n_matches"], r["min_span"], r["first_pos"])
               for r in proximity_search(df, ["alpha", "beta"],
                                         window=4).collect()}
        assert got == {0: (1, 4, 0), 2: (1, 2, 0)}

    def test_three_terms_and_counts(self, spark):
        from abot_dotnet_core_spark.functions.textfns import proximity_search
        # a..b..c tight cluster + a second far 'a' that still pairs with
        # nothing (b,c out of its window)
        df = self._df(spark, ["a b c x x x x x x x x x a"])
        got = proximity_search(df, ["a", "b", "c"], window=3).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["n_matches"], r["min_span"], r["first_pos"]) == (1, 3, 0)

    def test_repeated_positions_count_tuples(self, spark):
        from abot_dotnet_core_spark.functions.textfns import proximity_search
        # two alphas near one beta -> two match tuples
        df = self._df(spark, ["alpha alpha beta"])
        r = proximity_search(df, ["alpha", "beta"], window=3).collect()[0]
        assert (r["n_matches"], r["min_span"]) == (2, 2)

    def test_input_validation(self, spark):
        from abot_dotnet_core_spark.functions.textfns import proximity_search
        df = self._df(spark, ["x"])
        with pytest.raises(ValueError):
            proximity_search(df, ["one"])
        with pytest.raises(ValueError):
            proximity_search(df, ["dup", "dup"])
        with pytest.raises(ValueError):
            proximity_search(df, ["a", "b", "c"], window=2)
