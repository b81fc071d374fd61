"""Training-data pipeline operator tests: dedup, similarity, multimodal
plumbing, streaming windows — including pure-Python oracles for the
non-SQL-expressible ops (simhash)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.01"


class TestExactDedup:
    def test_duplicates_collapse(self, spark):
        from abot_dotnet_core_spark.functions.dedup import exact_dedup
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
            "doc_id long, text string")
        rows = {r["keep_id"]: r["n_dups"] for r in exact_dedup(df).collect()}
        assert rows == {1: 2, 3: 1}


class TestMinhash:
    def test_identical_docs_same_signature(self, spark):
        from abot_dotnet_core_spark.functions.dedup import minhash_signatures
        df = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
            "doc_id long, text string")
        sigs = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(4))
                for r in minhash_signatures(df, k=4).collect()}
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]

    def test_short_docs_skipped(self, spark):
        from abot_dotnet_core_spark.functions.dedup import minhash_signatures
        df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
        assert minhash_signatures(df, k=4).count() == 0

    def test_lsh_finds_near_dups(self, spark):
        from abot_dotnet_core_spark.functions.dedup import (
            jaccard_pairs, lsh_candidate_pairs, minhash_signatures)
        base = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [(1, base), (2, base + " extra"), (3, "completely different words "
              "nothing shared here at all believe me")],
            "doc_id long, text string")
        sigs = minhash_signatures(df, k=4)
        pairs = lsh_candidate_pairs(sigs, k=4, bands=2)
        verified = jaccard_pairs(df, pairs, threshold=0.5).collect()
        ids = {(r["id_a"], r["id_b"]) for r in verified}
        assert (1, 2) in ids
        assert all(3 not in p for p in ids)


class TestComponents:
    def test_chain_and_islands(self, spark):
        """Min-label must cross a chain (multiple star rounds) and leave
        islands separate; singletons label themselves via the docs join."""
        from abot_dotnet_core_spark.functions.dedup import neardup_components
        docs = spark.createDataFrame([(i,) for i in (1, 3, 5, 9, 20, 21, 40)],
                                     "doc_id long")
        # chain 9-5-3-1 (decreasing through hops), island 20-21, singleton 40
        pairs = spark.createDataFrame(
            [(5, 9), (3, 5), (1, 3), (20, 21)], "id_a long, id_b long")
        out = {r["doc_id"]: (r["comp_id"], r["cluster_size"])
               for r in neardup_components(docs, pairs).collect()}
        assert out == {1: (1, 4), 3: (1, 4), 5: (1, 4), 9: (1, 4),
                       20: (20, 2), 21: (20, 2), 40: (40, 1)}

    def test_min_propagates_through_larger_hub(self, spark):
        """The component min must reach nodes whose only path runs through a
        LARGER intermediate (star-contraction handles what one-directional
        min-passing would miss)."""
        from abot_dotnet_core_spark.functions.dedup import connected_components
        # 2 and 4 connect only through hub 50; component min is 2
        pairs = spark.createDataFrame(
            [(2, 50), (4, 50), (4, 60), (60, 3)], "id_a long, id_b long")
        comp = {r["node"]: r["comp"]
                for r in connected_components(pairs).collect()}
        assert comp == {2: 2, 3: 2, 4: 2, 50: 2, 60: 2}

    def test_empty_pairs(self, spark):
        from abot_dotnet_core_spark.functions.dedup import neardup_components
        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        out = {r["doc_id"]: (r["comp_id"], r["cluster_size"])
               for r in neardup_components(docs, pairs).collect()}
        assert out == {1: (1, 1), 2: (2, 1)}


class TestSimhash:
    def _py_simhash(self, text: str) -> int:
        toks = text.split()
        votes = [0] * 64
        for tok in toks:
            # little-endian 8-byte prefix == DuckDB md5_number_upper
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                               "little")
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        v = 0
        for j in range(64):
            if votes[j] > 0:
                v |= 1 << j
        return v - (1 << 64) if v >= (1 << 63) else v

    def test_matches_python_oracle(self, spark):
        from abot_dotnet_core_spark.functions.dedup import simhash64_udf
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30)
        got = {r["doc_id"]: r["sh"] for r in docs.select(
            "doc_id", simhash64_udf(F.col("text")).alias("sh")).collect()}
        want = {r["doc_id"]: self._py_simhash(r["text"])
                for r in docs.collect()}
        assert got == want

    def test_near_docs_close_hamming(self, spark):
        from abot_dotnet_core_spark.functions.dedup import simhash_hamming_pairs
        base = " ".join(f"word{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, base), (2, base + " tail"), (3, " ".join(
                f"other{i}" for i in range(60)))],
            "doc_id long, text string")
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in simhash_hamming_pairs(df,
                                                max_hamming=10).collect()}
        assert (1, 2) in pairs and pairs[(1, 2)] <= 5

    def test_pigeonhole_recall_complete(self, spark):
        """Blocked candidate generation must equal the exact O(n^2) scan —
        including pairs whose differing bits all fall in the TOP 16 bits
        (the recall hole of single-prefix blocking)."""
        from abot_dotnet_core_spark.functions.dedup import (
            simhash_hamming_pairs, simhash64_udf)
        import itertools
        docs = [(i, f"tok{i}a tok{i}b " + " ".join(
            f"w{j}" for j in range(40))) for i in range(1, 21)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for max_h in (4, 8):
            got = {(r["id_a"], r["id_b"]): r["hamming"]
                   for r in simhash_hamming_pairs(
                       df, max_hamming=max_h).collect()}
            sims = {r["doc_id"]: r["sh"] & ((1 << 64) - 1) for r in df.select(
                "doc_id", simhash64_udf(F.col("text")).alias("sh")).collect()}
            want = {}
            for a, b in itertools.combinations(sorted(sims), 2):
                h = bin(sims[a] ^ sims[b]).count("1")
                if h <= max_h:
                    want[(a, b)] = h
            assert got == want

    def test_top_bits_difference_found(self, spark):
        """A pair differing ONLY in the top 16 signature bits is still paired
        (the recall hole of single-16-bit-prefix blocking, fixed by pigeonhole
        banding). Crafted signatures drive the blocking machinery directly."""
        from abot_dotnet_core_spark.functions.dedup import \
            hamming_pairs_from_sigs

        def s64(u):  # unsigned -> signed int64
            return u - (1 << 64) if u >= (1 << 63) else u

        base = 0x0123456789ABCDEF
        rows = [
            (1, s64(base)),
            (2, s64(base ^ (0b111 << 61))),         # bits 61,62,63: top 16 only
            (3, s64(base ^ 0xFFFF)),                # 16 low bits: beyond max_h
            (4, s64(base ^ (1 << 63) ^ (1 << 2))),  # bits 63,2: top + bottom
        ]
        sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in hamming_pairs_from_sigs(sigs, max_hamming=8).collect()}
        assert got[(1, 2)] == 3   # would be MISSED by 16-bit-prefix blocking
        assert got[(1, 4)] == 2
        assert got[(2, 4)] == 3   # {61,62,63} xor {63,2} = {61,62,2}
        assert (1, 3) not in got  # hamming 16 > 8 correctly excluded
        assert (3, 4) not in got


class TestPagerank:
    def test_matches_python_fixed_point(self, spark):
        """The integer-mass recurrence must equal a sequential Python loop
        exactly (that is the whole point of fixed-point: no FP divergence
        between partial-aggregate orders)."""
        from abot_dotnet_core_spark.functions.graph import pagerank_mass
        edge_list = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0)]
        n, total, damp, iters = 4, 10**12, 85, 5
        base = total // n
        tele = (100 - damp) * base // 100
        outdeg = {}
        for s, _ in edge_list:
            outdeg[s] = outdeg.get(s, 0) + 1
        mass = {v: base for v in range(n)}
        for _ in range(iters):
            inc = {v: 0 for v in range(n)}
            for s, d in edge_list:
                inc[d] += mass[s] // outdeg[s]
            mass = {v: tele + damp * inc[v] // 100 for v in range(n)}
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges = spark.createDataFrame(edge_list, "src long, dst long")
        got = {r["node"]: r["rank_mass"]
               for r in pagerank_mass(nodes, edges, iterations=iters)
               .collect()}
        assert got == mass
        # sink node 3 keeps only teleport mass; hub 0 ranks above it
        assert got[3] == tele
        assert got[0] > got[3]

    def test_weighted_edges_hand_computed(self, spark):
        """weight_col: contribution = floor(mass * w / weighted_outdeg).
        One iteration on a 3-node graph, checked against hand arithmetic
        (base 4000, teleport 600): a->b w=3 carries 3000 of a's 4000."""
        from abot_dotnet_core_spark.functions.graph import pagerank_mass
        nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
        edges = spark.createDataFrame(
            [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
            "src string, dst string, n_links long")
        got = {r["node"]: r["rank_mass"]
               for r in pagerank_mass(nodes, edges, iterations=1,
                                      total_mass=12000,
                                      weight_col="n_links").collect()}
        assert got == {"a": 7400, "b": 3150, "c": 1450}


class TestContamination:
    def test_overlap_counts_and_coverage(self, spark):
        from abot_dotnet_core_spark.functions.dedup import contamination_pairs
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta")],   # shingles: ab g, b g d -> 2
            "bench_id long, text string")
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta extra"),   # shares both shingles
             (2, "alpha beta gamma nothing else"),  # shares 1 (below min 2)
             (3, "totally unrelated words here")],
            "doc_id long, text string")
        out = {(r["doc_id"], r["bench_id"]): (r["n_overlap"],
                                              r["bench_coverage"])
               for r in contamination_pairs(docs, bench,
                                            min_overlap=2).collect()}
        assert out == {(1, 100): (2, 1.0)}

    def test_benchmark_side_broadcast(self, spark):
        """The corpus-side shingle stream must hash-join a broadcast bench
        side (no shuffle of the corpus before the overlap count)."""
        from abot_dotnet_core_spark.functions.dedup import contamination_pairs
        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w x y z q"), F.col("id").cast("string"))
            .alias("text"))
        bench = spark.createDataFrame([(1, "w x y z")],
                                      "bench_id long, text string")
        plan = contamination_pairs(docs, bench)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # per-doc shingle dedup is row-local (array_distinct), so the
        # exploded shingle stream itself must never shuffle — the old
        # dropDuplicates([doc_id, sh_h]) form showed up here as an
        # Exchange hashpartitioning(..., sh_h, ...)
        import re
        assert not re.search(r"Exchange hashpartitioning\([^)]*sh_h", plan)


class TestSamplingPacking:
    def test_stratified_nested_and_deterministic(self, spark):
        """Raising a stratum's fraction must only ADD rows (nested samples),
        and the same fractions must reproduce the same set."""
        from abot_dotnet_core_spark.functions.sampling import stratified_sample
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "es") for i in range(400)],
            "doc_id long, lang string")
        small = {r["doc_id"] for r in
                 stratified_sample(df, {"en": 0.2, "es": 0.2}).collect()}
        again = {r["doc_id"] for r in
                 stratified_sample(df, {"en": 0.2, "es": 0.2}).collect()}
        big = {r["doc_id"] for r in
               stratified_sample(df, {"en": 0.6, "es": 0.2}).collect()}
        assert small == again
        assert small <= big
        # rough rate sanity (hash-uniform): 20% of 400 within wide bounds
        assert 40 <= len(small) <= 140

    def test_stratified_default_fraction(self, spark):
        from abot_dotnet_core_spark.functions.sampling import stratified_sample
        df = spark.createDataFrame([(i, "xx") for i in range(100)],
                                   "doc_id long, lang string")
        assert stratified_sample(df, {"en": 1.0}).count() == 0
        assert stratified_sample(df, {}, default_fraction=1.0).count() == 100

    def test_pack_sequences_prefix_shards(self, spark):
        from abot_dotnet_core_spark.functions.sampling import pack_sequences
        df = spark.createDataFrame(
            [(1, "w " * 5, "a"), (2, "w " * 4, "a"), (3, "w " * 3, "a"),
             (4, "w " * 2, "b")],
            "doc_id long, text string, source string")
        out = {r["doc_id"]: (r["n_tokens"], r["shard_id"], r["shard_offset"])
               for r in pack_sequences(df, budget=6).collect()}
        # group a: prefix sums 0,5,9 -> shards 0,0,1; group b restarts at 0
        assert out == {1: (5, 0, 0), 2: (4, 0, 5), 3: (3, 1, 3),
                       4: (2, 0, 0)}

    def test_shuffle_shards_permutation(self, spark):
        """shuffle_shards is a deterministic permutation: every row lands in
        exactly one (shard, pos) slot, shards are rank-striped so round-robin
        reading replays the exact global (key, doc_id) order, shard sizes
        balance to +-1, the key is the md5-u32 the docstring promises, and
        the result is independent of the input partitioning."""
        import hashlib
        from abot_dotnet_core_spark.functions.sampling import shuffle_shards
        df = spark.range(300).select(F.col("id").alias("doc_id"))
        out = shuffle_shards(df, n_shards=8).collect()
        assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
        # rank striping: shard_id/shard_pos are exactly (rank % 8, rank // 8)
        # of the global (shuffle_key, doc_id) order — the round-robin read
        # contract — which also balances shard sizes to +-1
        glob = sorted(out, key=lambda r: (r["shuffle_key"], r["doc_id"]))
        for rank, r in enumerate(glob):
            assert (r["shard_id"], r["shard_pos"]) == (rank % 8, rank // 8)
        sizes = {}
        for r in out:
            sizes[r["shard_id"]] = sizes.get(r["shard_id"], 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # bit-exact key: little-endian uint32 of the first 4 md5 bytes
        for r in out[:5]:
            d = hashlib.md5(f"shuf1|{r['doc_id']}".encode()).digest()
            assert r["shuffle_key"] == int.from_bytes(d[:4], "little")
        # partitioning-invariant
        again = {(r["doc_id"], r["shard_id"], r["shard_pos"])
                 for r in shuffle_shards(df.repartition(13), n_shards=8)
                 .collect()}
        assert again == {(r["doc_id"], r["shard_id"], r["shard_pos"])
                         for r in out}
        # re-salting gives a different epoch permutation
        other = {(r["doc_id"], r["shard_id"], r["shard_pos"])
                 for r in shuffle_shards(df, n_shards=8, salt="e2").collect()}
        assert other != again


class TestSimilarity:
    def test_brute_force_matches_numpy(self, spark):
        from abot_dotnet_core_spark.functions.similarity import brute_force_topk
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = (emb.filter(F.col("vec_id") < 2)
             .select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("q_vec")))
        got = brute_force_topk(emb, q, k=3).collect()

        rows = emb.collect()
        vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                for r in rows}
        for q_id in (0, 1):
            qv = vecs[q_id]
            sims = sorted(
                ((round(float(np.dot(v, qv) / (np.linalg.norm(v) * np.linalg.norm(qv))), 6), vid)
                 for vid, v in vecs.items() if vid != q_id),
                key=lambda t: (-t[0], t[1]))[:3]
            want_ids = [vid for _, vid in sims]
            got_ids = [r["vec_id"] for r in sorted(
                (g for g in got if g["q_id"] == q_id), key=lambda r: r["rank"])]
            assert got_ids == want_ids, (q_id, got_ids, want_ids)

    def test_lsh_recall_reasonable(self, spark):
        from abot_dotnet_core_spark.functions.similarity import (
            brute_force_topk, lsh_topk)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = (emb.filter(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("q_vec")))
        exact = {(r["q_id"], r["vec_id"])
                 for r in brute_force_topk(emb, q, k=3).collect()}
        approx = {(r["q_id"], r["vec_id"])
                  for r in lsh_topk(emb, q, k=3, n_planes=4, dim=64).collect()}
        # approximate: same-bucket neighbors should recover a decent fraction
        assert len(exact & approx) >= len(exact) * 0.2

    def test_ivf_partition_and_recall(self, spark):
        from abot_dotnet_core_spark.functions.similarity import (
            brute_force_topk, ivf_assign, ivf_fit_centroids, ivf_topk)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = (emb.filter(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("q_vec")))

        cents = ivf_fit_centroids(emb, n_centroids=4, lloyd_iters=1, dim=64)
        assert len(cents) == 4 and all(len(c) == 64 for c in cents)
        # the quantizer is deterministic: refitting gives identical centroids
        assert cents == ivf_fit_centroids(emb, n_centroids=4,
                                          lloyd_iters=1, dim=64)
        # the inverted file is a partition: every vector in exactly one list
        inv = ivf_assign(emb, cents, "embedding")
        n = emb.count()
        assert inv.count() == n
        by_cluster = dict(inv.groupBy("cluster").count().collect())
        assert set(by_cluster) <= {0, 1, 2, 3} and sum(by_cluster.values()) == n

        exact = {(r["q_id"], r["vec_id"])
                 for r in brute_force_topk(emb, q, k=3).collect()}
        approx = {(r["q_id"], r["vec_id"])
                  for r in ivf_topk(emb, q, k=3, n_centroids=4, nprobe=2,
                                    dim=64).collect()}
        # probing half the lists should recover a decent fraction
        assert len(exact & approx) >= len(exact) * 0.2
        # nprobe = n_centroids degenerates to exact search
        full = {(r["q_id"], r["vec_id"])
                for r in ivf_topk(emb, q, k=3, n_centroids=4, nprobe=4,
                                  dim=64).collect()}
        assert full == exact


class TestMultimodal:
    def test_meta_pass(self, spark):
        from abot_dotnet_core_spark.functions.multimodal import with_media_meta
        df = spark.createDataFrame(
            [(1, bytearray(b"\xff\xd8\xffrest")), (2, bytearray(b"\x89PNG\r\n\x1a\nxx")),
             (3, bytearray(b"plain")), (4, None)],
            "media_id long, payload binary")
        rows = {r["media_id"]: r for r in with_media_meta(df).collect()}
        assert rows[1]["mime"] == "image/jpeg"
        assert rows[2]["mime"] == "image/png"
        assert rows[3]["mime"] == "application/octet-stream"
        assert rows[4]["n_bytes"] == 0 and rows[4]["content_md5"] is None
        assert rows[3]["content_md5"] == hashlib.md5(b"plain").hexdigest()

    def test_feature_stub_deterministic(self, spark):
        from abot_dotnet_core_spark.functions.multimodal import extract_features
        df = spark.createDataFrame(
            [(1, bytearray(b"payload-a")), (2, bytearray(b"payload-a"))],
            "media_id long, payload binary")
        rows = {r["media_id"]: r["feature"]
                for r in extract_features(df, dim=8).collect()}
        assert rows[1] == rows[2]
        assert len(rows[1]) == 8

    def test_real_decode_raises(self, spark):
        from abot_dotnet_core_spark.functions.multimodal import extract_features
        df = spark.createDataFrame([(1, bytearray(b"x"))],
                                   "media_id long, payload binary")
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            extract_features(df, decode_stub=False).collect()

    def test_frame_sampling_plan(self, spark):
        from abot_dotnet_core_spark.functions.multimodal import sample_frames
        df = spark.createDataFrame([(1, 3), (2, 0)],
                                   "media_id long, duration_s int")
        rows = {r["media_id"]: r["frame_idx"]
                for r in sample_frames(df, fps_out=2).collect()}
        assert rows[1] == [0, 1, 2, 3, 4, 5]
        assert rows[2] == []

    def test_resize_stub(self, spark):
        from abot_dotnet_core_spark.functions.multimodal import resize_images
        df = spark.createDataFrame(
            [(1, bytearray(b"imgdata")), (2, bytearray(b"imgdata")),
             (3, None)],
            "media_id long, payload binary")
        rows = {r["media_id"]: r for r in
                resize_images(df, width=8, height=4).collect()}
        assert len(rows[1]["payload"]) == 32
        assert bytes(rows[1]["payload"]) == bytes(rows[2]["payload"])
        assert rows[3]["payload"] is None
        assert (rows[1]["width"], rows[1]["height"]) == (8, 4)


class TestStreaming:
    def test_available_now_stream(self, spark, tmp_path):
        """Real readStream/writeStream round trip with availableNow trigger;
        result must equal the batch window aggregation."""
        import shutil
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            stream_tumbling_counts, tumbling_counts)
        # FileStreamSource needs a directory feed
        src = str(tmp_path / "feed")
        import os
        os.makedirs(src)
        shutil.copy(f"{SF}/events.parquet", f"{src}/part-0.parquet")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = stream_tumbling_counts(spark, src, ckpt, out).start()
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        want = tumbling_counts(spark.read.parquet(src))
        g = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
             for r in got.collect()}
        w = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
             for r in want.collect()}
        # append mode: every emitted window must match the batch result
        # exactly; windows still above the watermark at end-of-stream are
        # (correctly) never finalized, so only trailing windows may be absent
        assert g.items() <= w.items()
        missing = set(w) - set(g)
        max_start = max(k[0] for k in w)
        assert all((max_start - k[0]).total_seconds() <= 2 * 3600
                   for k in missing), f"non-trailing windows missing: {missing}"

    def test_stateful_domain_counters(self, spark, tmp_path):
        """applyInPandasWithState custom stateful operator: per-domain
        cumulative counters must ACCUMULATE across two availableNow runs
        that share a checkpoint (state survives restarts)."""
        import os
        import pandas as pd
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            stream_domain_counts)
        src = str(tmp_path / "feed")
        os.makedirs(src)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        pd.DataFrame({"domain": ["a.test"] * 3 + ["b.test"] * 2,
                      "url": [f"http://x/{i}" for i in range(5)]}) \
            .to_parquet(f"{src}/part-0.parquet", index=False)
        q = stream_domain_counts(spark, src, ckpt, out).start()
        q.awaitTermination(120)

        pd.DataFrame({"domain": ["a.test", "c.test"],
                      "url": ["http://x/5", "http://x/6"]}) \
            .to_parquet(f"{src}/part-1.parquet", index=False)
        q = stream_domain_counts(spark, src, ckpt, out).start()
        q.awaitTermination(120)

        # last emitted total per domain across both runs
        got = spark.read.parquet(out)
        latest = {}
        for r in got.collect():
            latest[r["domain"]] = max(latest.get(r["domain"], 0),
                                      r["crawled_total"])
        assert latest == {"a.test": 4, "b.test": 2, "c.test": 1}


class TestSubstringDedup:
    def _run(self, spark, docs, window=3):
        from abot_dotnet_core_spark.functions.dedup import (
            duplicated_span_stats)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        return {r["doc_id"]: r
                for r in duplicated_span_stats(df, window=window).collect()}

    @staticmethod
    def _md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def test_cross_doc_window_removed(self, spark):
        out = self._run(spark, [(1, "a b x y z c"), (2, "q x y z r")])
        r1, r2 = out[1], out[2]
        # "x y z" occurs in both docs -> its 3 tokens are covered in each
        assert (r1["n_tokens"], r1["n_dup_tokens"]) == (6, 3)
        assert r1["kept_md5"] == self._md5("a b c")
        assert (r2["n_tokens"], r2["n_dup_tokens"]) == (5, 3)
        assert r2["kept_md5"] == self._md5("q r")

    def test_self_repeat_within_doc(self, spark):
        # windows [m n m] and [n m n] each occur twice inside the one doc
        r = self._run(spark, [(1, "m n m n m n")])[1]
        assert (r["n_tokens"], r["n_dup_tokens"]) == (6, 6)
        assert r["dup_ratio"] == 1.0
        assert r["kept_md5"] == self._md5("")

    def test_short_and_empty_docs_survive(self, spark):
        out = self._run(spark, [(1, "just two"), (2, "")])
        assert (out[1]["n_dup_tokens"], out[1]["kept_md5"]) == (
            0, self._md5("just two"))
        assert (out[2]["n_tokens"], out[2]["kept_md5"]) == (0, self._md5(""))

    def test_unique_corpus_untouched(self, spark):
        out = self._run(spark, [(1, "a b c d"), (2, "e f g h")])
        assert all(r["n_dup_tokens"] == 0 for r in out.values())


class TestDsirWeights:
    @staticmethod
    def _bucket(tok, n=1024):
        # sample_hash_u32 = md5_number_upper % 2^32 = first 4 md5 bytes LE
        return int.from_bytes(
            hashlib.md5(tok.encode()).digest()[:4], "little") % n

    def test_matches_python_oracle(self, spark):
        from abot_dotnet_core_spark.functions.sampling import dsir_weights
        docs = [(1, "a b", "en"), (2, "a c", "fr"), (3, "", "en"),
                (4, "a a b", "en")]
        df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
        got = {r["doc_id"]: r for r in dsir_weights(
            df, target=F.col("lang") == "en").collect()}

        raw, tgt = {}, {}
        for _, text, lang in docs:
            for tok in text.split():
                b = self._bucket(tok)
                raw[b] = raw.get(b, 0) + 1
                if lang == "en":
                    tgt[b] = tgt.get(b, 0) + 1
        score = {b: (tgt.get(b, 0) + 1) * 1_000_000 // (raw[b] + 1)
                 for b in raw}
        for doc_id, text, _ in docs:
            toks = text.split()
            w = sum(score[self._bucket(t)] for t in toks)
            assert got[doc_id]["dsir_weight_micro"] == w
            assert got[doc_id]["n_tokens"] == len(toks)
            assert got[doc_id]["dsir_avg_micro"] == w // max(len(toks), 1)

    def test_target_docs_rank_higher(self, spark):
        """Docs made of target-heavy tokens outrank raw-only docs."""
        from abot_dotnet_core_spark.functions.sampling import dsir_weights
        rows = ([(i, "alpha beta gamma", "en") for i in range(5)]
                + [(i + 5, "zeta eta theta", "fr") for i in range(5)]
                + [(10, "alpha beta gamma", "fr"), (11, "zeta eta theta", "en")])
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string")
        got = {r["doc_id"]: r["dsir_avg_micro"] for r in dsir_weights(
            df, target=F.col("lang") == "en").collect()}
        assert got[10] > got[5]  # target-like text scores above raw-only


class TestSemDedup:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")

    def test_identical_vectors_drop_higher_id(self, spark):
        from abot_dotnet_core_spark.functions.similarity import semdedup
        # 0/1 identical (cos=1), 2 orthogonal-ish: with 2 clusters the dup
        # pair co-clusters; only the higher id of the pair is dropped
        v = [1.0] + [0.0] * 63
        w = [0.0, 1.0] + [0.0] * 62
        df = self._emb(spark, [v, v, w])
        rows = {r["vec_id"]: r for r in
                semdedup(df, n_clusters=2, threshold=0.95, dim=64).collect()}
        assert rows[0]["kept"] and not rows[1]["kept"] and rows[2]["kept"]
        assert rows[0]["cluster"] == rows[1]["cluster"] != rows[2]["cluster"]

    def test_cross_cluster_dups_not_compared(self, spark):
        from abot_dotnet_core_spark.functions.similarity import semdedup
        # the SemDeDup approximation: near-dups split across clusters are
        # NOT compared — both kept (the recall/cost trade the paper makes)
        a = [1.0] + [0.0] * 63
        b = [0.0, 1.0] + [0.0] * 62
        df = self._emb(spark, [a, b])          # seeds ARE the 2 centroids
        out = semdedup(df, n_clusters=2, threshold=0.0, dim=64).collect()
        assert all(r["kept"] for r in out)

    def test_transitive_chain_keeps_lowest_only(self, spark):
        from abot_dotnet_core_spark.functions.similarity import semdedup
        # three copies in one cluster: 1 and 2 both have a lower-id dup
        v = [0.5] * 64
        w = [-1.0] + [0.0] * 63
        df = self._emb(spark, [v, v, v, w])
        rows = {r["vec_id"]: r["kept"] for r in
                semdedup(df, n_clusters=2, threshold=0.99, dim=64).collect()}
        assert rows == {0: True, 1: False, 2: False, 3: True}


class TestVocabChunksMixture:
    def test_vocab_counts_and_tie_rank(self, spark):
        from abot_dotnet_core_spark.functions.textfns import vocab_topk
        df = spark.createDataFrame(
            [(1, "The cat and the dog"), (2, "a CAT"), (3, "   ")],
            "doc_id long, text string")
        rows = [(r["term"], r["cnt"], r["rank"])
                for r in vocab_topk(df, k=3).orderBy("rank").collect()]
        # tie the/cat at 2 -> 'cat' first alphabetically; then a/and/dog
        assert rows == [("cat", 2, 1), ("the", 2, 2), ("a", 1, 3)]

    def test_chunk_boundaries_and_overlap(self, spark):
        from abot_dotnet_core_spark.functions.textfns import chunk_documents
        text_512 = "x" * 512
        text_513 = "x" * 513
        df = spark.createDataFrame(
            [(1, text_512), (2, text_513), (3, "")],
            "doc_id long, text string")
        out = chunk_documents(df, chunk_size=512, stride=384)
        got = {(r["doc_id"], r["chunk_idx"]): r["chunk_len"]
               for r in out.collect()}
        # L=512 -> one full chunk; L=513 -> second chunk covers [384:513)
        assert got == {(1, 0): 512, (2, 0): 512, (2, 1): 129, (3, 0): 0}

    def test_chunk_digest_matches_overlap_content(self, spark):
        from abot_dotnet_core_spark.functions.textfns import chunk_documents
        import hashlib as h
        text = "".join(chr(97 + i % 26) for i in range(1000))
        df = spark.createDataFrame([(7, text)], "doc_id long, text string")
        rows = {r["chunk_idx"]: r["chunk_md5"]
                for r in chunk_documents(df, chunk_size=512,
                                         stride=384).collect()}
        for i, md in rows.items():
            want = h.md5(text[i * 384:i * 384 + 512].encode()).hexdigest()
            assert md == want
        assert len(rows) == 1 + (1000 - 512 + 383) // 384

    def test_mixture_flattens_toward_tail(self, spark):
        from abot_dotnet_core_spark.functions.sampling import mixture_weights
        df = spark.createDataFrame(
            [(i, "head" if i < 900 else "tail") for i in range(1000)],
            "doc_id long, source string")
        rows = {r["stratum"]: r for r in
                mixture_weights(df, alpha=0.5, budget=1000,
                                stratum_col="source").collect()}
        import math
        z = math.sqrt(0.9) + math.sqrt(0.1)
        assert rows["head"]["n_docs"] == 900
        assert abs(rows["head"]["weight"] - math.sqrt(0.9) / z) < 1e-6
        assert abs(rows["tail"]["weight"] - math.sqrt(0.1) / z) < 1e-6
        # alpha<1 upweights the tail above its raw share
        assert rows["tail"]["weight"] > rows["tail"]["share"]
        assert rows["head"]["target_docs"] + rows["tail"]["target_docs"] \
            in (999, 1000, 1001)


class TestIndexingLM:
    def test_inverted_index_postings_and_counts(self, spark):
        from abot_dotnet_core_spark.functions.textfns import inverted_index
        df = spark.createDataFrame(
            [(5, "cat dog cat"), (2, "Cat fish"), (9, "dog"), (4, "  ")],
            "doc_id long, text string")
        rows = {r["term"]: r for r in inverted_index(df, min_df=1).collect()}
        assert rows["cat"]["doc_freq"] == 2
        assert rows["cat"]["total_tf"] == 3          # 2 in doc5, 1 in doc2
        # posting list digest is over the SORTED ids: "2,5"
        assert rows["cat"]["postings_md5"] == hashlib.md5(b"2,5").hexdigest()
        assert rows["dog"]["doc_freq"] == 2
        assert rows["fish"]["doc_freq"] == 1
        assert set(rows) == {"cat", "dog", "fish"}   # empty doc contributes 0

    def test_inverted_index_min_df_prunes(self, spark):
        from abot_dotnet_core_spark.functions.textfns import inverted_index
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a c")], "doc_id long, text string")
        terms = {r["term"] for r in inverted_index(df, min_df=2).collect()}
        assert terms == {"a"}

    def test_tfidf_rank_and_fixed_point(self, spark):
        from abot_dotnet_core_spark.functions.textfns import tfidf_topk
        # 'rare' appears only in doc1 (df=1), 'common' in both (df=2):
        # doc1 scores rare=2e6/1, common=1e6/2 -> rare ranks first.
        df = spark.createDataFrame(
            [(1, "rare rare common"), (2, "common other")],
            "doc_id long, text string")
        rows = {(r["doc_id"], r["term"]): r
                for r in tfidf_topk(df, k=5).collect()}
        assert rows[(1, "rare")]["score_micro"] == 2_000_000
        assert rows[(1, "rare")]["rank"] == 1
        assert rows[(1, "common")]["score_micro"] == 500_000
        assert rows[(1, "common")]["rank"] == 2
        # k cutoff: only top-1 survives with k=1
        top1 = tfidf_topk(df, k=1)
        assert {(r["doc_id"], r["term"]) for r in top1.collect()} == \
            {(1, "rare"), (2, "other")}  # doc2 tie other/common -> df 1 < 2

    def test_bigram_lm_conditional_probs(self, spark):
        from abot_dotnet_core_spark.functions.textfns import bigram_lm
        # context 'the': the->cat x2, the->dog x1 (across docs) -> 666666/333333
        df = spark.createDataFrame(
            [(1, "the cat the dog"), (2, "the cat"), (3, "solo")],
            "doc_id long, text string")
        rows = {(r["w1"], r["w2"]): r
                for r in bigram_lm(df, min_count=1).collect()}
        assert rows[("the", "cat")]["cnt"] == 2
        assert rows[("the", "cat")]["ctx_cnt"] == 3
        assert rows[("the", "cat")]["p_micro"] == 666_666
        assert rows[("the", "dog")]["p_micro"] == 333_333
        # 'cat the' and 'dog'-terminal: doc ends break bigrams per doc
        assert ("cat", "the") in rows and rows[("cat", "the")]["cnt"] == 1
        assert not any(w1 == "solo" for w1, _ in rows)

    def test_bigram_min_count_prunes(self, spark):
        from abot_dotnet_core_spark.functions.textfns import bigram_lm
        df = spark.createDataFrame(
            [(1, "a b a b c")], "doc_id long, text string")
        rows = {(r["w1"], r["w2"]) for r in bigram_lm(df, min_count=2).collect()}
        assert rows == {("a", "b")}


class TestAnnRecall:
    def _tk(self, spark, rows):
        return spark.createDataFrame(rows, "q_id long, vec_id long")

    def test_recall_arithmetic(self, spark):
        from abot_dotnet_core_spark.functions.similarity import ann_recall
        exact = self._tk(spark, [(1, 10), (1, 11), (1, 12),
                                 (2, 20), (2, 21), (2, 22)])
        approx = self._tk(spark, [(1, 10), (1, 11), (1, 99),
                                  (2, 77), (2, 78), (2, 79)])
        out = {r.q_id: r for r in ann_recall(exact, approx).collect()}
        assert (out[1].exact_k, out[1].hits, out[1].recall_millis) == (3, 2, 666)
        assert (out[2].exact_k, out[2].hits, out[2].recall_millis) == (3, 0, 0)

    def test_lsh_recall_bounded_by_exact(self, spark):
        """Real composition: LSH recall vs brute force is in [0, 1000] and
        identical LSH params to the exact path give recall 1000."""
        from abot_dotnet_core_spark.functions.similarity import (
            ann_recall, brute_force_topk, lsh_topk)
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = (emb.filter(F.col("vec_id") < 3)
             .select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("q_vec")))
        exact = brute_force_topk(emb, q, k=3)
        out = ann_recall(exact, lsh_topk(emb, q, k=3, n_planes=8,
                                         bands=2, dim=64)).collect()
        assert len(out) == 3
        assert all(0 <= r.recall_millis <= 1000 for r in out)
        self_eval = {r.recall_millis for r in
                     ann_recall(exact, exact).collect()}
        assert self_eval == {1000}


class TestGroupQuantiles:
    def test_interpolation_matches_closed_form(self, spark):
        from abot_dotnet_core_spark.functions.textfns import group_quantiles
        from pyspark.sql import Row
        # group a: values 10,20,30,40 -> p25 = 10 + 0.75*(20-10) = 17.5,
        # p50 = 25.0, p75 = 32.5, p95 = 10 + 2.85 steps -> 38.5
        df = spark.createDataFrame(
            [Row(g="a", v=x) for x in (10, 20, 30, 40)]
            + [Row(g="b", v=7)], schema="g string, v long")
        out = {r.g: r for r in group_quantiles(df, "v", "g").collect()}
        assert out["a"].n_rows == 4
        assert (out["a"].p25, out["a"].p50, out["a"].p75, out["a"].p95) \
            == (17.5, 25.0, 32.5, 38.5)
        # single-value group: every quantile is the value
        assert (out["b"].p25, out["b"].p95) == (7.0, 7.0)


class TestScriptProfile:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.textfns import script_profile
        from pyspark.sql import Row
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            schema="doc_id long, text string")
        return {r.doc_id: r for r in script_profile(df).collect()}

    def test_counts_and_dominant(self, spark):
        out = self._run(spark, ["abc прив 位置 42 .,"])
        r = out[0]
        assert (r.n_latin, r.n_cyrillic, r.n_cjk, r.n_digit) == (3, 4, 2, 2)
        assert r.n_chars == 17
        assert r.latin_millis == 176   # floor(3000/17)
        assert r.dominant == "cyrillic"

    def test_tie_prefers_class_order(self, spark):
        # 2 latin vs 2 cyrillic: latin listed first in SCRIPT_CLASSES
        r = self._run(spark, ["ab пр"])[0]
        assert r.n_latin == r.n_cyrillic == 2
        assert r.dominant == "latin"

    def test_empty_and_unclassified(self, spark):
        out = self._run(spark, ["", "!!! ???"])
        assert out[0].dominant == "none"
        assert out[0].n_chars == 0
        assert out[1].dominant == "none"
        assert out[1].latin_millis == 0


class TestContainment:
    def test_quote_high_containment_low_jaccard(self, spark):
        from abot_dotnet_core_spark.functions.dedup import (
            containment_pairs, jaccard_pairs)
        big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
               "lam mu nu xi omicron pi rho sigma tau upsilon")
        quote = "delta epsilon zeta eta theta"   # 5 tokens -> 3 shingles
        df = spark.createDataFrame(
            [Row(doc_id=0, text=big), Row(doc_id=1, text=quote)])
        pairs = spark.createDataFrame([Row(id_a=0, id_b=1)])
        got = containment_pairs(df, pairs).collect()[0]
        # all 3 of the quote's shingles occur in big (18 shingles)
        assert (got["n_inter"], got["n_a"], got["n_b"]) == (3, 18, 3)
        assert got["cont_b_millis"] == 1000   # quote fully inside big
        assert got["cont_a_millis"] == 3 * 1000 // 18
        jac = jaccard_pairs(df, pairs).collect()[0]["jaccard"]
        assert jac < 0.2                      # jaccard misses the quote

    def test_min_millis_filters_either_direction(self, spark):
        from abot_dotnet_core_spark.functions.dedup import containment_pairs
        df = spark.createDataFrame([
            Row(doc_id=0, text="a b c d e f"),
            Row(doc_id=1, text="a b c x y z"),     # 2/4 shingles shared? no:
            Row(doc_id=2, text="p q r s t u"),     # disjoint
        ])
        pairs = spark.createDataFrame(
            [Row(id_a=0, id_b=1), Row(id_a=0, id_b=2)])
        rows = containment_pairs(df, pairs, min_millis=200).collect()
        kept = {(r["id_a"], r["id_b"]): r for r in rows}
        assert (0, 1) in kept and (0, 2) not in kept
        r = kept[(0, 1)]
        # shared shingles: only 'a b c' -> 1 of 4 per side = 250 millis
        assert r["n_inter"] == 1
        assert r["cont_a_millis"] == r["cont_b_millis"] == 250

    def test_no_shingle_doc_dropped(self, spark):
        from abot_dotnet_core_spark.functions.dedup import containment_pairs
        df = spark.createDataFrame([
            Row(doc_id=0, text="a b c d"), Row(doc_id=1, text="xy")])
        pairs = spark.createDataFrame([Row(id_a=0, id_b=1)])
        assert containment_pairs(df, pairs).count() == 0


class TestFunnel:
    def _ev(self, spark, rows):
        from datetime import datetime
        return spark.createDataFrame(
            [Row(user_id=u, event_type=t,
                 ts=datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows])

    def test_strict_order_and_stage_counts(self, spark):
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            funnel_stages)
        ev = self._ev(spark, [
            # u1 completes everything in order
            (1, "signup", 10), (1, "view", 20), (1, "click", 30),
            (1, "purchase", 40),
            # u2: view BEFORE signup doesn't count; no later view
            (2, "view", 5), (2, "signup", 10), (2, "click", 30),
            # u3: no signup at all -> excluded
            (3, "view", 1), (3, "click", 2), (3, "purchase", 3),
            # u4: view at the SAME second as signup is not strictly after
            (4, "signup", 10), (4, "view", 10), (4, "view", 11),
        ])
        got = {r["user"]: r for r in funnel_stages(
            ev, ["signup", "view", "click", "purchase"]).collect()}
        assert set(got) == {1, 2, 4}
        base = got[1]
        assert base["n_stages"] == 4
        assert (base["t_signup"] < base["t_view"] < base["t_click"]
                < base["t_purchase"])
        u2 = got[2]
        # click can't count either: stage order is signup->view->click
        assert u2["n_stages"] == 1
        assert u2["t_view"] is None and u2["t_click"] is None
        u4 = got[4]
        assert u4["n_stages"] == 2
        assert u4["t_view"] - u4["t_signup"] == 1_000_000  # the 11s view

    def test_earliest_valid_not_global_min(self, spark):
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            funnel_stages)
        # two views after signup: the EARLIER one wins
        ev = self._ev(spark, [(1, "signup", 10), (1, "view", 50),
                              (1, "view", 20)])
        r = funnel_stages(ev, ["signup", "view"]).collect()[0]
        assert (r["t_view"] - r["t_signup"]) == 10_000_000


class TestRetention:
    def test_cohorts_and_offsets(self, spark):
        from datetime import datetime
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            retention_cohorts)
        # week boundaries in weeks-since-epoch land: 1970-01-01 was a
        # Thursday, but pure integer weeks don't care about weekday
        def at_week(w, plus_sec=0):
            return datetime.utcfromtimestamp(w * 604800 + plus_sec)
        ev = spark.createDataFrame([
            # u1: weeks 100, 101, 103 (two events in 100 dedup to one)
            Row(user_id=1, ts=at_week(100)),
            Row(user_id=1, ts=at_week(100, 30)),
            Row(user_id=1, ts=at_week(101)),
            Row(user_id=1, ts=at_week(103)),
            # u2: cohort 101, returns week 103
            Row(user_id=2, ts=at_week(101, 5)),
            Row(user_id=2, ts=at_week(103)),
        ])
        got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
               for r in retention_cohorts(ev).collect()}
        assert got == {(100, 0): 1, (100, 1): 1, (100, 3): 1,
                       (101, 0): 1, (101, 2): 1}
