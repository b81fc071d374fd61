"""Unit tests for the deterministic sketches (KMV distinct, count-min
heavy hitters) — estimator accuracy and the structural guarantees the
entry-oracle mirror can't judge (CMS one-sided error, KMV exact-below-k)."""

from pyspark.sql import Row, functions as F


def _occ(spark, rows):
    return spark.createDataFrame(rows, schema="grp string, v string")


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        from abot_dotnet_core_spark.functions.sketches import kmv_distinct
        rows = ([Row(grp="a", v=f"x{i}") for i in range(10)]
                + [Row(grp="a", v="x3")] * 5       # duplicates are free
                + [Row(grp="b", v=f"y{i}") for i in range(63)])
        out = {r["grp"]: r for r in
               kmv_distinct(_occ(spark, rows), "grp", "v", k=64).collect()}
        assert out["a"]["n_tracked"] == 10
        assert out["a"]["est_distinct"] == 10
        assert out["b"]["est_distinct"] == 63

    def test_estimate_accuracy_above_k(self, spark):
        from abot_dotnet_core_spark.functions.sketches import kmv_distinct
        n = 5000
        rows = [Row(grp="g", v=f"value-{i}") for i in range(n)]
        r = kmv_distinct(_occ(spark, rows), "grp", "v", k=64).collect()[0]
        assert r["n_tracked"] == 64
        # k=64 -> relative std ~ 1/sqrt(64) = 12.5%; allow 3 sigma
        assert abs(r["est_distinct"] - n) / n < 0.375

    def test_null_values_ignored(self, spark):
        from abot_dotnet_core_spark.functions.sketches import kmv_distinct
        rows = ([Row(grp="a", v=f"x{i}") for i in range(5)]
                + [Row(grp="a", v=None)])
        r = kmv_distinct(_occ(spark, rows), "grp", "v", k=64).collect()[0]
        assert r["n_tracked"] == 5
        assert r["est_distinct"] == 5

    def test_occurrence_multiplicity_is_invisible(self, spark):
        from abot_dotnet_core_spark.functions.sketches import kmv_distinct
        base = [Row(grp="g", v=f"value-{i}") for i in range(500)]
        once = kmv_distinct(_occ(spark, base), "grp", "v").collect()[0]
        thrice = kmv_distinct(_occ(spark, base * 3), "grp", "v").collect()[0]
        assert once["est_distinct"] == thrice["est_distinct"]
        assert once["kth_hash"] == thrice["kth_hash"]


class TestCmsHeavyHitters:
    def _run(self, spark, tokens, **kw):
        from abot_dotnet_core_spark.functions.sketches import cms_heavy_hitters
        df = spark.createDataFrame([Row(tok=t) for t in tokens],
                                   schema="tok string")
        return cms_heavy_hitters(df, "tok", **kw).collect()

    def test_never_undercounts_and_orders(self, spark):
        toks = (["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 10
                + [f"tail{i}" for i in range(200)])
        out = self._run(spark, toks, depth=3, width=1024, topk=5)
        assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
        assert out[0]["tok"] == "alpha" and out[0]["exact_count"] == 50
        assert out[1]["tok"] == "beta"
        for r in out:
            assert r["cms_count"] >= r["exact_count"]

    def test_tiny_vocab_is_exact(self, spark):
        # 3 keys in a 3x4096 sketch: collision odds (1/4096)^3 -> exact
        out = self._run(spark, ["a"] * 7 + ["b"] * 3 + ["c"],
                        depth=3, width=4096, topk=3)
        got = {r["tok"]: r for r in out}
        assert got["a"]["cms_count"] == 7 == got["a"]["exact_count"]
        assert got["b"]["cms_count"] == 3
        assert got["c"]["cms_count"] == 1

    def test_rank_tiebreak_is_key_order(self, spark):
        out = self._run(spark, ["zz", "aa", "mm"], depth=3, width=4096,
                        topk=3)
        assert [r["tok"] for r in out] == ["aa", "mm", "zz"]
