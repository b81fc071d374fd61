"""Engine with the Bloom prefilter on must produce identical results to the
exact-only path (the sidecar is a pre-filter, never a decider)."""

from pyspark.sql import functions as F

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine

SEED = "http://d0.test/"


class TestSidecarMerge:
    def test_incremental_merge_membership(self, spark):
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter, build_bloom_sidecar, merge_bloom_sidecar)
        base = spark.range(0, 100).select(
            (F.col("id") * 7919).alias("url_hash"))
        extra = spark.range(100, 150).select(
            (F.col("id") * 7919).alias("url_hash"))
        sidecar = build_bloom_sidecar(base, buckets=4)
        merged = merge_bloom_sidecar(sidecar, extra, buckets=4)
        assert merged.agg(F.sum("n_keys")).collect()[0][0] == 150

        # every key (old and new) must be maybe_seen after the merge
        probe = spark.range(0, 150).select(
            (F.col("id") * 7919).alias("url_hash"))
        out = bloom_prefilter(probe, merged, spark=spark, buckets=4)
        assert out.filter(~F.col("maybe_seen")).count() == 0

    def test_saturated_bucket_degrades_to_exact(self, spark):
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter, build_bloom_sidecar, merge_bloom_sidecar)
        base = spark.range(0, 10).select(F.col("id").alias("url_hash"))
        # tiny capacity: the merge overloads the blobs past 50% set bits
        sidecar = build_bloom_sidecar(base, buckets=1, min_capacity=16)
        extra = spark.range(10, 5000).select(F.col("id").alias("url_hash"))
        merged = merge_bloom_sidecar(sidecar, extra, buckets=1,
                                     min_capacity=16)
        rows = merged.collect()
        assert all(r["blob"] is None for r in rows)   # dropped, not grown
        # saturated bucket: everything is maybe_seen (exact join decides)
        probe = spark.range(100_000, 100_010).select(
            F.col("id").alias("url_hash"))
        out = bloom_prefilter(probe, merged, spark=spark, buckets=1)
        assert out.filter(~F.col("maybe_seen")).count() == 0


def run(spark, corpus_dir, tmp, bloom, cfg=None, name=None):
    eng = CrawlEngine(
        spark, cfg or CrawlConfig(),
        corpus_path=f"{corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
        store_root=str(tmp / (name or ("b" if bloom else "x")) / "state"),
        robots_path=f"{corpus_dir}/robots.parquet",
        bloom_prefilter=bloom)
    eng.seed([SEED])
    eng.run(max_rounds=50)
    return eng


def test_bloom_prefilter_identical_crawl(spark, tiny_corpus_dir, tmp_path):
    exact = run(spark, tiny_corpus_dir, tmp_path, bloom=False)
    bloom = run(spark, tiny_corpus_dir, tmp_path, bloom=True)
    e = [(r["url"], r["status"], r["depth"], r["crawl_order"]) for r in
         exact.store.read_events(spark, "crawled").orderBy("crawl_order").collect()]
    b = [(r["url"], r["status"], r["depth"], r["crawl_order"]) for r in
         bloom.store.read_events(spark, "crawled").orderBy("crawl_order").collect()]
    assert e == b
    assert ({r["url_hash"] for r in exact._read_seen().collect()}
            == {r["url_hash"] for r in bloom._read_seen().collect()})


def test_sidecar_built_once_then_incremental(spark, tiny_corpus_dir,
                                             tmp_path, monkeypatch):
    """The full-seen sidecar build must run AT MOST ONCE per crawl — every
    later round folds seen_new into the blobs incrementally."""
    from abot_dotnet_core_spark.operators import seenfilter as SF
    calls = {"build": 0, "merge": 0}
    real_build, real_merge = SF.build_bloom_sidecar, SF.merge_bloom_sidecar

    def counted_build(*a, **k):
        calls["build"] += 1
        return real_build(*a, **k)

    def counted_merge(*a, **k):
        calls["merge"] += 1
        return real_merge(*a, **k)

    monkeypatch.setattr(SF, "build_bloom_sidecar", counted_build)
    monkeypatch.setattr(SF, "merge_bloom_sidecar", counted_merge)
    eng = run(spark, tiny_corpus_dir, tmp_path / "inc", bloom=True)
    n_rounds = eng.round
    assert n_rounds >= 3
    assert calls["build"] == 1, "full-seen rebuild ran more than once"
    assert calls["merge"] == n_rounds


class TestBucketedProbe:
    """VERDICT r02 item 3: above cfg.bloom_broadcast_max_bytes the sidecar
    must never ride through the driver or a broadcast — blobs stay a
    bucketed state table, probed via repartition-by-bucket + mapInArrow."""

    def test_bucketed_probe_matches_broadcast_probe(self, spark, tmp_path):
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter, bloom_prefilter_bucketed, build_bloom_sidecar)
        seen = spark.range(0, 400).select(
            (F.col("id") * 7919 + 3).alias("url_hash"))
        sidecar = build_bloom_sidecar(seen, buckets=4, min_capacity=256)
        path = str(tmp_path / "sc" / "round=1")
        sidecar.write.mode("overwrite").parquet(path)
        probes = spark.range(0, 900).select(
            (F.col("id") * 7919 + 3).alias("url_hash"))
        via_bc = {(r["url_hash"], r["maybe_seen"]) for r in bloom_prefilter(
            probes, spark.read.parquet(path), spark=spark,
            buckets=4).collect()}
        via_bk = {(r["url_hash"], r["maybe_seen"])
                  for r in bloom_prefilter_bucketed(
                      probes, path, buckets=4).collect()}
        assert via_bc == via_bk
        # all 400 inserted keys maybe_seen; FP rate on the rest is tiny
        assert all(ms for h, ms in via_bk if (h - 3) // 7919 < 400)

    def test_bucketed_probe_plan_no_broadcast(self, spark, tmp_path):
        """The whole point: the bucketed probe plan must contain the Arrow
        probe and NO broadcast exchange — blobs reach tasks via co-located
        reads, not the driver."""
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter_bucketed, build_bloom_sidecar)
        from abot_dotnet_core_spark.plans.inspect import simple_plan
        seen = spark.range(0, 50).select(F.col("id").alias("url_hash"))
        path = str(tmp_path / "scp" / "round=1")
        build_bloom_sidecar(seen, buckets=4, min_capacity=64) \
            .write.mode("overwrite").parquet(path)
        probes = spark.range(0, 100).select(F.col("id").alias("url_hash"))
        plan = simple_plan(bloom_prefilter_bucketed(probes, path, buckets=4))
        assert "MapInArrow" in plan, plan
        assert "BroadcastExchange" not in plan, plan

    def test_bucketed_absent_bucket_is_definitely_new(self, spark, tmp_path):
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter_bucketed, build_bloom_sidecar)
        # seed only a few keys so some of the 8 buckets never get a blob row
        seen = spark.range(0, 3).select((F.col("id") * 31).alias("url_hash"))
        path = str(tmp_path / "sc2" / "round=1")
        build_bloom_sidecar(seen, buckets=8, min_capacity=64) \
            .write.mode("overwrite").parquet(path)
        probes = spark.range(0, 500).select(
            (F.col("id") * 17 + 5).alias("url_hash"))
        out = bloom_prefilter_bucketed(probes, path, buckets=8)
        # probes landing in never-seeded buckets must come back False
        assert out.filter(~F.col("maybe_seen")).count() > 0

    def test_null_hash_rejected_not_silently_rounded(self, spark, tmp_path):
        """A null in the int64 hash column would make Arrow's to_numpy fall
        back to float64, silently rounding hashes above 2^53 — the probe
        must refuse instead."""
        import pytest
        from pyspark.errors.exceptions.captured import PythonException
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_prefilter_bucketed, build_bloom_sidecar)
        seen = spark.range(0, 50).select(F.col("id").alias("url_hash"))
        path = str(tmp_path / "sc3" / "round=1")
        build_bloom_sidecar(seen, buckets=4, min_capacity=64) \
            .write.mode("overwrite").parquet(path)
        probes = spark.range(0, 10).select(
            F.when(F.col("id") == 5, F.lit(None))
            .otherwise(F.col("id")).alias("url_hash"))
        with pytest.raises(PythonException, match="NULL in url_hash"):
            bloom_prefilter_bucketed(probes, path, buckets=4).collect()
        # and big hashes stay exact end-to-end (> 2^53 would corrupt if a
        # float64 path were ever taken)
        big = spark.createDataFrame(
            [((1 << 62) + 1,), ((1 << 62) + 3,)], "url_hash long")
        sidecar2 = build_bloom_sidecar(big, buckets=4, min_capacity=64)
        path2 = str(tmp_path / "sc4" / "round=1")
        sidecar2.write.mode("overwrite").parquet(path2)
        out = {r["url_hash"]: r["maybe_seen"]
               for r in bloom_prefilter_bucketed(
                   big, path2, buckets=4).collect()}
        assert out == {(1 << 62) + 1: True, (1 << 62) + 3: True}

    def test_tiny_threshold_crawl_identical_admission(self, spark,
                                                      tiny_corpus_dir,
                                                      tmp_path):
        """bloom_broadcast_max_bytes=0 forces the bucketed path from the
        first build; the crawl must be indistinguishable from exact-only."""
        exact = run(spark, tiny_corpus_dir, tmp_path, bloom=False)
        bk = run(spark, tiny_corpus_dir, tmp_path, bloom=True,
                 cfg=CrawlConfig(bloom_broadcast_max_bytes=0), name="bk")
        assert bk._sidecar_bucketed and bk._sidecar is None
        e = [(r["url"], r["status"], r["depth"], r["crawl_order"]) for r in
             exact.store.read_events(spark, "crawled")
             .orderBy("crawl_order").collect()]
        b = [(r["url"], r["status"], r["depth"], r["crawl_order"]) for r in
             bk.store.read_events(spark, "crawled")
             .orderBy("crawl_order").collect()]
        assert e == b
        assert ({r["url_hash"] for r in exact._read_seen().collect()}
                == {r["url_hash"] for r in bk._read_seen().collect()})

    def test_bucketed_resume(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(bloom_broadcast_max_bytes=0)
        store = str(tmp_path / "bkr" / "state")
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=store,
            robots_path=f"{tiny_corpus_dir}/robots.parquet",
            bloom_prefilter=True)
        eng.seed([SEED])
        eng.run(max_rounds=2)
        assert eng._sidecar_bucketed

        eng2 = CrawlEngine.resume(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=store,
            robots_path=f"{tiny_corpus_dir}/robots.parquet",
            bloom_prefilter=True)
        # the manifest counter (exact blob-byte gate recorded at merge
        # time) must choose bucketed without loading blobs; pre-counter
        # checkpoints fall back to the parquet-footer heuristic
        assert eng2._sidecar_bucketed and eng2._sidecar is None
        assert eng2.store.read_manifest(
            eng2.round)["counters"]["sidecar_bucketed"] is True
        eng2.run(max_rounds=50)
        exact = run(spark, tiny_corpus_dir, tmp_path / "bkr_exact",
                    bloom=False)
        e = [(r["url"], r["crawl_order"]) for r in
             exact.store.read_events(spark, "crawled")
             .orderBy("crawl_order").collect()]
        g = [(r["url"], r["crawl_order"]) for r in
             eng2.store.read_events(spark, "crawled")
             .orderBy("crawl_order").collect()]
        assert e == g


def test_sidecar_survives_resume(spark, tiny_corpus_dir, tmp_path):
    from abot_dotnet_core_spark.crawler import CrawlEngine
    store = str(tmp_path / "r" / "state")
    eng = CrawlEngine(
        spark, CrawlConfig(),
        corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
        store_root=store,
        robots_path=f"{tiny_corpus_dir}/robots.parquet",
        bloom_prefilter=True)
    eng.seed([SEED])
    eng.run(max_rounds=2)
    assert eng._sidecar is not None

    eng2 = CrawlEngine.resume(
        spark, CrawlConfig(),
        corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
        store_root=store,
        robots_path=f"{tiny_corpus_dir}/robots.parquet")
    eng2.use_bloom_prefilter = True
    assert eng2._sidecar is not None          # loaded, not rebuilt
    assert {b for b in eng2._sidecar} == {b for b in eng._sidecar}
    eng2.run(max_rounds=50)
    # resumed+bloom crawl matches the uninterrupted exact crawl
    exact = run(spark, tiny_corpus_dir, tmp_path / "exact", bloom=False)
    e = [(r["url"], r["crawl_order"]) for r in
         exact.store.read_events(spark, "crawled")
         .orderBy("crawl_order").collect()]
    g = [(r["url"], r["crawl_order"]) for r in
         eng2.store.read_events(spark, "crawled")
         .orderBy("crawl_order").collect()]
    assert e == g
