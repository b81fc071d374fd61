"""Trap-aware frontier prioritization: priority arithmetic + global order
+ seed_from_frontier composition."""

from pyspark.sql import functions as F

from abot_dotnet_core_spark.operators.prioritize import (
    frontier_priority, prioritized_order)


def _frontier(spark):
    return spark.createDataFrame([
        ("http://clean.test/a", 0, "clean.test"),
        ("http://clean.test/b/c", 2, "clean.test"),
        ("http://trap.test/x", 0, "trap.test"),
        ("http://nosignal.test/y", 1, "nosignal.test"),
    ], "url string, depth int, domain string")


def _signals(spark):
    return spark.createDataFrame(
        [("clean.test", 0), ("trap.test", 2000)],
        "domain string, trap_score_millis int")


class TestPriority:
    def test_arithmetic_and_missing_domain(self, spark):
        got = {r.url: r.priority_millis
               for r in frontier_priority(_frontier(spark),
                                          _signals(spark)).collect()}
        assert got == {
            "http://clean.test/a": 0,
            "http://clean.test/b/c": 2000,
            "http://trap.test/x": 2000,     # depth 0 but trapped domain
            "http://nosignal.test/y": 1000,  # unknown domain -> no penalty
        }

    def test_trap_weight_scales(self, spark):
        got = {r.url: r.priority_millis
               for r in frontier_priority(_frontier(spark), _signals(spark),
                                          trap_weight_pct=50).collect()}
        assert got["http://trap.test/x"] == 1000

    def test_no_signals_is_pure_depth(self, spark):
        got = {r.url: r.priority_millis
               for r in frontier_priority(_frontier(spark)).collect()}
        assert got["http://clean.test/b/c"] == 2000
        assert got["http://trap.test/x"] == 0

    def test_global_order_dense_and_deterministic(self, spark):
        ranked = prioritized_order(
            frontier_priority(_frontier(spark), _signals(spark)))
        rows = sorted(ranked.collect(), key=lambda r: r.priority_seq)
        assert [r.priority_seq for r in rows] == [0, 1, 2, 3]
        # ties (clean/b/c vs trap/x at 2000) break on url
        assert [r.url for r in rows] == [
            "http://clean.test/a", "http://nosignal.test/y",
            "http://clean.test/b/c", "http://trap.test/x"]


class TestEngineComposition:
    def test_prioritized_frontier_seeds_engine(self, spark, tiny_corpus_dir,
                                               tmp_path):
        """The ranked frontier feeds seed_from_frontier unchanged — the
        steady-state recrawl loop shape (rank between rounds, reseed)."""
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.crawler import CrawlEngine
        fr = spark.createDataFrame(
            [("http://d0.test/", 0, "d0.test"),
             ("http://d1.test/", 1, "d1.test")],
            "url string, depth int, domain string")
        ranked = prioritized_order(frontier_priority(fr))
        eng = CrawlEngine(
            spark, CrawlConfig(),
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed_from_frontier(ranked.orderBy("priority_seq").select("url"))
        eng.run(max_rounds=3)
        crawled = {r["url"] for r in
                   eng.store.read_events(spark, "crawled").collect()}
        assert {"http://d0.test/", "http://d1.test/"} <= crawled

    def test_priority_column_orders_round0(self, spark, tiny_corpus_dir,
                                           tmp_path):
        """A priority_millis column on the seeded frontier REORDERS the
        engine's round-0 fetch sequence (and the computed rank is not the
        alphabetical-url fallback): d1 (depth 0) outranks d0 (depth 1)
        even though 'http://d0.test/' sorts first as a string. Duplicate
        URLs keep their minimum priority."""
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.crawler import CrawlEngine
        fr = spark.createDataFrame(
            [("http://d0.test/", 1, "d0.test"),
             ("http://d1.test/", 0, "d1.test"),
             ("http://d1.test/", 5, "d1.test")],   # dup keeps min priority
            "url string, depth int, domain string")
        with_pri = frontier_priority(fr)
        eng = CrawlEngine(
            spark, CrawlConfig(),
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed_from_frontier(with_pri.select("url", "priority_millis"))
        seq = {r["url"]: r["priority_seq"] for r in
               eng.store.read_table(spark, "frontier", 0).collect()}
        assert seq == {"http://d1.test/": 0, "http://d0.test/": 1}


class TestBudgetApportion:
    def _run(self, spark, pairs, budget):
        from pyspark.sql import Row
        from abot_dotnet_core_spark.operators.prioritize import (
            budget_apportion)
        df = spark.createDataFrame(
            [Row(host=h, weight=w) for h, w in pairs])
        return {r["host"]: r for r in
                budget_apportion(df, budget).collect()}

    def test_exact_sum_and_largest_remainder(self, spark):
        # weights 3:3:1 over budget 10 -> bases 30//7, 30//7, 10//7 =
        # 4,4,1 (sum 9) with remainders 2,2,3; the single leftover slot
        # goes to c, whose remainder (3) is the largest
        got = self._run(spark, [("a", 3), ("b", 3), ("c", 1)], 10)
        assert sum(r["alloc"] for r in got.values()) == 10
        assert (got["a"]["alloc"], got["b"]["alloc"], got["c"]["alloc"]) \
            == (4, 4, 2)
        assert got["c"]["plus_one"] == 1

    def test_zero_weight_gets_zero_and_hamilton_quota(self, spark):
        got = self._run(spark, [("a", 0), ("b", 1), ("c", 1)], 7)
        assert got["a"]["alloc"] == 0
        assert sum(r["alloc"] for r in got.values()) == 7
        # Hamilton: each alloc within 1 of its exact share 3.5
        assert {got["b"]["alloc"], got["c"]["alloc"]} == {3, 4}
        # the 3/4 split tie-breaks by host asc on the equal remainders
        assert got["b"]["alloc"] == 4

    def test_negative_or_zero_total_raises(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            self._run(spark, [("a", 0)], 5)
        with _pytest.raises(ValueError):
            self._run(spark, [("a", -1), ("b", 5)], 5)

    def test_matches_sequential_hamilton(self, spark):
        ws = [(f"h{i}", (i * 37 + 11) % 29) for i in range(40)]
        budget = 1234
        got = self._run(spark, ws, budget)
        W = sum(w for _, w in ws)
        base = {h: budget * w // W for h, w in ws}
        rem = {h: (budget * w) % W for h, w in ws}
        R = budget - sum(base.values())
        order = sorted(ws, key=lambda p: (-rem[p[0]], p[0]))
        plus = {h for h, _ in order[:R]}
        for h, w in ws:
            assert got[h]["alloc"] == base[h] + (1 if h in plus else 0), h
        assert sum(r["alloc"] for r in got.values()) == budget
