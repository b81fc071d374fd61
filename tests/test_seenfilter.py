"""Bloom + cuckoo seen-set sidecar tests (T8 + north_star deletion support)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.operators.seenfilter import (
    BloomFilter, CuckooFilter, best_m_k, bloom_prefilter,
    build_bloom_sidecar, build_cuckoo_sidecar, _key_of,
)


class TestBloomLocal:
    def test_sizing_formulas(self):
        # BloomFilter.cs:178-192 — reference defaults 2,000,001 @ 0.1%
        m, k = best_m_k(2_000_001, 0.001)
        assert 28_000_000 < m < 29_000_000   # ~14.4 bits/key
        assert k == 10

    def test_no_false_negatives(self):
        bf = BloomFilter(10_000, 0.001)
        keys = [_key_of(i * 7919) for i in range(5000)]
        bf.add_many(keys)
        assert all(k in bf for k in keys)

    def test_fp_rate_bounded(self):
        bf = BloomFilter(10_000, 0.001)
        bf.add_many(_key_of(i) for i in range(10_000))
        fps = sum(_key_of(i) in bf for i in range(10_000, 60_000))
        assert fps / 50_000 < 0.005

    def test_serialization_roundtrip(self):
        bf = BloomFilter(1000, 0.01)
        bf.add_many(_key_of(i) for i in range(500))
        rt = BloomFilter.from_bytes(bf.to_bytes())
        assert all(_key_of(i) in rt for i in range(500))
        assert rt.m == bf.m and rt.k == bf.k

    def test_truthiness(self):
        bf = BloomFilter(1000, 0.01)
        assert bf.truthiness() == 0.0
        bf.add_many(_key_of(i) for i in range(500))
        assert 0.1 < bf.truthiness() < 0.6


class TestCuckooLocal:
    def test_add_contains_delete(self):
        cf = CuckooFilter(10_000)
        keys = [_key_of(i * 31 + 7) for i in range(8000)]
        for k in keys:
            assert cf.add(k)
        assert all(k in cf for k in keys)
        # deletion actually removes (the capability Bloom lacks)
        for k in keys[:4000]:
            assert cf.delete(k)
        present = sum(k in cf for k in keys[:4000])
        assert present < 200  # only fp-collisions remain
        assert all(k in cf for k in keys[4000:])

    def test_serialization_roundtrip(self):
        cf = CuckooFilter(1000)
        for i in range(800):
            cf.add(_key_of(i))
        rt = CuckooFilter.from_bytes(cf.to_bytes())
        assert all(_key_of(i) in rt for i in range(800))
        assert rt.delete(_key_of(5))
        assert _key_of(5) not in rt or _key_of(5) in cf  # fp collision ok


class TestSidecarSpark:
    def test_bloom_prefilter_exactness(self, spark):
        seen = spark.range(0, 5000).select(
            (F.col("id") * 2654435761).alias("url_hash"))
        sidecar = build_bloom_sidecar(seen, buckets=8)
        # candidates: half seen, half new
        cands = spark.range(2500, 7500).select(
            (F.col("id") * 2654435761).alias("url_hash"))
        flagged = bloom_prefilter(cands, sidecar, buckets=8)
        rows = flagged.collect()
        seen_set = {i * 2654435761 for i in range(5000)}
        # NO false negatives: every truly-seen candidate must be flagged
        for r in rows:
            if r["url_hash"] in seen_set:
                assert r["maybe_seen"], r
        # prefilter effectiveness: most truly-new rows pass through unflagged
        new_rows = [r for r in rows if r["url_hash"] not in seen_set]
        flagged_new = sum(r["maybe_seen"] for r in new_rows)
        assert flagged_new < len(new_rows) * 0.05

    def test_bloom_lossy_mode(self, spark):
        seen = spark.range(0, 1000).select(F.col("id").alias("url_hash"))
        sidecar = build_bloom_sidecar(seen, buckets=4)
        cands = spark.range(0, 2000).select(F.col("id").alias("url_hash"))
        kept = bloom_prefilter(cands, sidecar, buckets=4, lossy=True)
        ids = {r["url_hash"] for r in kept.collect()}
        assert not (ids & set(range(1000)))       # all seen dropped
        assert len(ids) > 900                      # most new kept

    def test_merge_incremental_and_saturation_lifecycle(self, spark):
        """merge_bloom_sidecar: (1) incremental merge finds both old and new
        keys; (2) a bucket saturated to blob=None STAYS saturated through a
        further merge (regression: the None-blob sidecar row used to be
        misread as a new-hash row and crash on int(NaN))."""
        from abot_dotnet_core_spark.operators.seenfilter import (
            merge_bloom_sidecar)
        seen0 = spark.range(0, 200).select(F.col("id").alias("url_hash"))
        # tiny min_capacity so adding many keys saturates the bitset
        sidecar = build_bloom_sidecar(seen0, buckets=1, min_capacity=64)
        new1 = spark.range(200, 3000).select(F.col("id").alias("url_hash"))
        m1 = merge_bloom_sidecar(sidecar, new1, buckets=1, min_capacity=64)
        rows1 = m1.collect()
        assert len(rows1) == 1 and rows1[0]["n_keys"] == 3000
        assert rows1[0]["blob"] is None  # 3000 keys >> capacity: saturated
        # re-merge on the already-saturated sidecar must not crash and must
        # stay saturated with an accumulating key count
        new2 = spark.range(3000, 3100).select(F.col("id").alias("url_hash"))
        rows2 = merge_bloom_sidecar(m1, new2, buckets=1,
                                    min_capacity=64).collect()
        assert len(rows2) == 1 and rows2[0]["n_keys"] == 3100
        assert rows2[0]["blob"] is None
        # saturated bucket: prefilter reports maybe_seen for everything
        cands = spark.range(0, 50).select(F.col("id").alias("url_hash"))
        flagged = bloom_prefilter(cands, spark.createDataFrame(
            rows2, schema=m1.schema), buckets=1)
        assert all(r["maybe_seen"] for r in flagged.collect())

    def test_merge_unsaturated_keeps_blob(self, spark):
        from abot_dotnet_core_spark.operators.seenfilter import (
            merge_bloom_sidecar)
        seen0 = spark.range(0, 500).select(F.col("id").alias("url_hash"))
        sidecar = build_bloom_sidecar(seen0, buckets=2)
        new = spark.range(500, 600).select(F.col("id").alias("url_hash"))
        merged = merge_bloom_sidecar(sidecar, new, buckets=2)
        rows = merged.collect()
        assert sum(r["n_keys"] for r in rows) == 600
        assert all(r["blob"] is not None for r in rows)
        flagged = bloom_prefilter(
            spark.range(0, 600).select(F.col("id").alias("url_hash")),
            merged, buckets=2)
        assert all(r["maybe_seen"] for r in flagged.collect())

    def test_cuckoo_sidecar_build(self, spark):
        seen = spark.range(0, 2000).select(F.col("id").alias("url_hash"))
        sidecar = build_cuckoo_sidecar(seen, buckets=4).collect()
        assert sum(r["n_keys"] for r in sidecar) == 2000
        cf = CuckooFilter.from_bytes(bytes(sidecar[0]["blob"]))
        assert cf.count > 0


class TestHashBloom:
    def test_vectorized_hash_bloom_no_false_negatives(self, spark):
        """build_hash_bloom/make_hash_bloom_member_udf: every inserted hash
        must probe positive (prefilter exactness contract); FP rate sane."""
        from pyspark.sql import functions as F
        from abot_dotnet_core_spark.operators.seenfilter import (
            build_hash_bloom, make_hash_bloom_member_udf)
        df = spark.range(0, 20_000).select(F.xxhash64("id").alias("h"))
        m, k, bits = build_hash_bloom(df, "h", capacity=20_000,
                                      error_rate=0.01)
        member = make_hash_bloom_member_udf(spark, m, k, bits)
        hits = df.filter(member(F.col("h"))).count()
        assert hits == 20_000  # no false negatives
        other = (spark.range(100_000, 200_000)
                 .select(F.xxhash64("id").alias("h")))
        fp = other.filter(member(F.col("h"))).count()
        assert fp < 100_000 * 0.05, fp  # fp rate in the right ballpark


class TestMergeInt64Exactness:
    def test_merge_into_existing_bucket_keeps_full_hash_precision(self, spark):
        """Regression (found by the engine fuzz): merging new keys into a
        bucket that ALREADY has a sidecar row mixes the int64 hash column
        with the sidecar rows' NULLs, which Arrow->pandas renders as
        float64 — rounding hashes above 2^53 before they enter the Bloom
        and producing permanent false negatives. Keys must round-trip
        bit-exactly through the merge."""
        import pyspark.sql.functions as F

        from abot_dotnet_core_spark.operators.seenfilter import (
            BloomFilter, _key_of, build_bloom_sidecar, merge_bloom_sidecar)

        # large-magnitude int64s whose float64 rounding differs from the
        # exact value (the failure requires |h| >> 2^53 and h != round(h))
        base = [(-8559989218380841370,), (8430173677383578461,),
                (-2958652254293752954,), (7868751755959358743,)]
        seeds = spark.createDataFrame(base[:1], "url_hash long")
        sidecar = build_bloom_sidecar(seeds, buckets=1, min_capacity=64)
        new = spark.createDataFrame(base[1:], "url_hash long")
        merged = merge_bloom_sidecar(sidecar, new, buckets=1,
                                     min_capacity=64)
        row = merged.collect()[0]
        bf = BloomFilter.from_bytes(bytes(row["blob"]))
        for (h,) in base:
            assert _key_of(h) in bf, h
        # and the off-by-rounding neighbours are NOT all present (would be
        # if the rounded value had been added instead)
        assert any(_key_of(h + 1) not in bf for (h,) in base)


class TestBloomFprEval:
    def test_matches_operational_filter(self, spark):
        """The relational FPR plan must agree bit-for-bit with the
        imperative BloomFilter over the same string keys."""
        from pyspark.sql import Row
        from abot_dotnet_core_spark.operators.seenfilter import (
            BloomFilter, bloom_fpr_eval, best_m_k)
        ins = [f"http://k{i}.test/x" for i in range(200)]
        probes = [f"http://p{i}.test/y" for i in range(80)]
        cap, err = 200, 0.05
        bf = BloomFilter(cap, err)
        bf.add_many(k.encode() for k in ins)
        expected_fp = sum(1 for p in probes if p.encode() in bf)
        r = bloom_fpr_eval(
            spark.createDataFrame([Row(url=u) for u in ins]),
            spark.createDataFrame([Row(url=u) for u in probes]),
            capacity=cap, error_rate=err).collect()[0]
        m, k = best_m_k(cap, err)
        assert (r["m"], r["k"]) == (m, k)
        assert (r["n_inserted"], r["n_probes"]) == (200, 80)
        assert r["n_fp"] == expected_fp
        assert r["fpr_millis"] == expected_fp * 1000 // 80

    def test_inserted_keys_always_positive(self, spark):
        """Sanity: probing the filter with its own keys reports 100%
        'false'-positive (they are true members)."""
        from pyspark.sql import Row
        from abot_dotnet_core_spark.operators.seenfilter import (
            bloom_fpr_eval)
        ins = spark.createDataFrame(
            [Row(url=f"http://k{i}.test/") for i in range(60)])
        r = bloom_fpr_eval(ins, ins, capacity=60,
                           error_rate=0.01).collect()[0]
        assert r["n_fp"] == 60 and r["fpr_millis"] == 1000
