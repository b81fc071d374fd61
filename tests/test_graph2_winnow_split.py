"""HITS, connected components, winnowing fingerprints, dataset split.

Semantics unit tests (hand-computed oracles on tiny graphs, the MOSS
window guarantee, split stability/partition laws) plus plan-shape checks:
all four are pure JVM plans — no Python UDF may appear.
"""

import hashlib

import pytest
from pyspark.sql import Row, functions as F

from abot_dotnet_core_spark.functions.dedup import winnow_fingerprints
from abot_dotnet_core_spark.functions.graph import (
    components_minlabel, hits_mass)
from abot_dotnet_core_spark.functions.sampling import dataset_split
from abot_dotnet_core_spark.plans.inspect import simple_plan


def _py_hits(nodes, edges, iterations=3, scale=10**6):
    """Sequential integer HITS mirroring hits_mass exactly."""
    auth = {n: scale for n in nodes}
    hub = {n: scale for n in nodes}
    for _ in range(iterations):
        ar = {n: 0 for n in nodes}
        for s, d, w in edges:
            ar[d] += w * hub[s]
        tot = max(sum(ar.values()), 1)
        auth = {n: ar[n] * scale // tot for n in nodes}
        hr = {n: 0 for n in nodes}
        for s, d, w in edges:
            hr[s] += w * auth[d]
        tot = max(sum(hr.values()), 1)
        hub = {n: hr[n] * scale // tot for n in nodes}
    return auth, hub


class TestHits:
    def test_matches_sequential_int_oracle(self, spark):
        nodes = ["a", "b", "c", "d"]
        edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 3),
                 ("d", "c", 1), ("c", "a", 1)]
        ndf = spark.createDataFrame([Row(node=n) for n in nodes])
        edf = spark.createDataFrame(
            [Row(src=s, dst=d, w=w) for s, d, w in edges])
        got = {r["node"]: (r["auth_mass"], r["hub_mass"])
               for r in hits_mass(ndf, edf, iterations=3,
                                  weight_col="w").collect()}
        auth, hub = _py_hits(nodes, edges)
        assert got == {n: (auth[n], hub[n]) for n in nodes}

    def test_hub_vs_authority_separation(self, spark):
        # star: h points at 3 sinks -> h is pure hub, sinks pure authorities
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["h", "s1", "s2", "s3"]])
        edf = spark.createDataFrame(
            [Row(src="h", dst=f"s{i}") for i in (1, 2, 3)])
        got = {r["node"]: r for r in hits_mass(ndf, edf).collect()}
        assert got["h"]["auth_mass"] == 0
        assert got["h"]["hub_mass"] > 0
        assert all(got[f"s{i}"]["hub_mass"] == 0 for i in (1, 2, 3))
        assert all(got[f"s{i}"]["auth_mass"] > 0 for i in (1, 2, 3))

    def test_no_python_udf_in_plan(self, spark):
        ndf = spark.createDataFrame([Row(node="a"), Row(node="b")])
        edf = spark.createDataFrame([Row(src="a", dst="b")])
        # plan is built per-iteration over localCheckpoints; check one round
        plan = simple_plan(hits_mass(ndf, edf, iterations=1))
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestComponents:
    def test_two_components_min_label(self, spark):
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["a", "b", "c", "x", "y", "z"]])
        # a-b-c chain; x-y-z chain (directed one way; propagation symmetrizes)
        edf = spark.createDataFrame(
            [Row(src="b", dst="a"), Row(src="b", dst="c"),
             Row(src="z", dst="y"), Row(src="y", dst="x")])
        got = {r["node"]: r["component"]
               for r in components_minlabel(ndf, edf, iterations=4).collect()}
        assert got == {"a": "a", "b": "a", "c": "a",
                       "x": "x", "y": "x", "z": "x"}

    def test_isolated_node_is_own_component(self, spark):
        ndf = spark.createDataFrame([Row(node="solo"), Row(node="p"),
                                     Row(node="q")])
        edf = spark.createDataFrame([Row(src="p", dst="q")])
        got = {r["node"]: r["component"]
               for r in components_minlabel(ndf, edf, iterations=2).collect()}
        assert got["solo"] == "solo"
        assert got["p"] == got["q"] == "p"


def _winnow_py(tokens, k=3, window=8):
    """Sequential winnowing oracle mirroring the Spark arithmetic."""
    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
    out = set()
    n = len(hs)
    if n == 0:
        return out
    for s in range(max(n - window, 0) + 1):
        win = hs[s:s + window]
        m = min(win)
        # rightmost occurrence of the min
        pos = s + max(i for i, h in enumerate(win) if h == m)
        out.add((pos, m))
    return out


class TestWinnow:
    def _run(self, spark, texts, **kw):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        return winnow_fingerprints(df, **kw)

    def test_matches_sequential_oracle(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog again and again",
            "pack my box with five dozen liquor jugs every single day now",
            "short text here",          # fewer grams than one window
            "tiny doc",                 # no k-grams at all
            "",
        ]
        rows = self._run(spark, texts).collect()
        got = {}
        for r in rows:
            got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
        for i, t in enumerate(texts):
            expect = _winnow_py(t.split())
            assert got.get(i, set()) == expect, f"doc {i}"

    def test_shared_run_guarantee(self, spark):
        # MOSS guarantee: a shared token run of >= window + k - 1 tokens
        # (10 here) forces at least one shared fingerprint hash.
        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [f"one two three {shared} four five six",
                 f"seven eight {shared} nine ten eleven twelve"]
        rows = self._run(spark, texts).collect()
        fps = {0: set(), 1: set()}
        for r in rows:
            fps[r["doc_id"]].add(r["fp_hash"])
        assert fps[0] & fps[1], "guaranteed shared fingerprint missing"

    def test_density_bound(self, spark):
        # selections per doc <= window-start count (one fingerprint per
        # window, consecutive windows mostly coincide)
        text = " ".join(f"w{i % 37}x{i % 11}" for i in range(200))
        rows = self._run(spark, [text]).collect()
        n_grams = 200 - 2
        starts = n_grams - 8 + 1
        assert 0 < len(rows) <= starts
        # and well below all-grams (that's the point of winnowing)
        assert len(rows) < n_grams / 2

    def test_no_python_udf_single_shuffle(self, spark):
        df = self._run(spark, ["a b c d e f g h i j k l m n o p"])
        plan = simple_plan(df)
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert plan.count("Exchange") <= 2, plan


class TestDatasetSplit:
    def test_partition_laws(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        out = dataset_split(df).collect()
        assert len(out) == 2000                       # exhaustive
        by = {}
        for r in out:
            by.setdefault(r["split"], []).append(r["doc_id"])
        assert set(by) == {"train", "valid", "test"}
        assert sum(len(v) for v in by.values()) == 2000   # disjoint
        # ~1% each held out; generous tolerance at n=2000
        assert 5 <= len(by["test"]) <= 45
        assert 5 <= len(by["valid"]) <= 45

    def test_stable_and_salt_sensitive(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"]: r["split"] for r in dataset_split(df).collect()}
        b = {r["doc_id"]: r["split"] for r in dataset_split(df).collect()}
        assert a == b                                  # rerun-stable
        c = {r["doc_id"]: r["split"]
             for r in dataset_split(df, salt="v2").collect()}
        assert a != c                                  # salt re-rolls

    def test_matches_python_md5(self, spark):
        df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
        got = {r["doc_id"]: (r["split_bucket"], r["split"])
               for r in dataset_split(df).collect()}
        for i in range(50):
            b = int(hashlib.md5(f"split:{i}".encode())
                    .hexdigest()[:15], 16) % 1000
            s = "test" if b < 10 else ("valid" if b < 20 else "train")
            assert got[i] == (b, s)

    def test_no_python_udf(self, spark):
        df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        plan = simple_plan(dataset_split(df))
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestWinnowPairs:
    def test_planted_pair_found_others_not(self, spark):
        from abot_dotnet_core_spark.functions.dedup import winnow_shared_pairs
        shared = " ".join(f"s{i}" for i in range(20))   # 20-token shared run
        texts = [f"intro words {shared} outro one",
                 f"other beginning {shared} different end",
                 "completely unrelated text about nothing shared at all here",
                 "another fully distinct document with its own words only"]
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
                 for r in winnow_shared_pairs(df).collect()}
        assert (0, 1) in pairs and pairs[(0, 1)] >= 2
        assert all(p == (0, 1) for p in pairs)

    def test_boilerplate_cap_drops_hot_hash(self, spark):
        from abot_dotnet_core_spark.functions.dedup import winnow_shared_pairs
        # 30 docs all sharing one nav-bar run; cap=10 must yield no pairs
        nav = " ".join(f"nav{i}" for i in range(12))
        df = spark.createDataFrame(
            [Row(doc_id=i, text=f"unique{i} prefix {nav} suffix{i} tail")
             for i in range(30)])
        out = winnow_shared_pairs(df, max_bucket=10).collect()
        assert out == []


class TestHll:
    def _occ(self, spark, groups):
        rows = []
        for g, n in groups.items():
            for i in range(n):
                rows.append(Row(source=g, tok=f"{g}-v{i}"))
                rows.append(Row(source=g, tok=f"{g}-v{i}"))  # dup occurrence
        return spark.createDataFrame(rows)

    def test_register_laws_and_exact(self, spark):
        from abot_dotnet_core_spark.functions.sketches import hll_registers
        out = {r["source"]: r for r in hll_registers(
            self._occ(spark, {"a": 300, "b": 40}), "source", "tok").collect()}
        for g, n in (("a", 300), ("b", 40)):
            r = out[g]
            assert r["exact_distinct"] == n
            assert r["n_present"] + r["v_zero"] == 512
            assert 1 <= r["n_present"] <= n      # <= one bucket per distinct
            assert r["sum_scaled"] > 0

    def test_matches_python_mirror(self, spark):
        import hashlib as H
        from abot_dotnet_core_spark.functions.sketches import hll_registers
        occ = self._occ(spark, {"g": 120})
        r = hll_registers(occ, "source", "tok").collect()[0]
        regs = {}
        for i in range(120):
            h = int(H.md5(f"g-v{i}".encode()).hexdigest()[:12], 16)
            b, rem = h >> 39, h & ((1 << 39) - 1)
            rho = min(40 if rem == 0 else 40 - rem.bit_length(), 30)
            regs[b] = max(regs.get(b, 0), rho)
        sum_scaled = (sum(1 << (30 - M) for M in regs.values())
                      + (512 - len(regs)) * (1 << 30))
        alpha = round(0.7213 / (1 + 1.079 / 512) * 10**6)
        est = (alpha * ((512 * 512 * (1 << 30)) // sum_scaled)) // 10**6
        assert (r["n_present"], r["sum_scaled"], r["hll_raw_est"]) == \
            (len(regs), sum_scaled, est)

    def test_estimate_order_of_magnitude(self, spark):
        # raw HLL at n=300, m=512 sits in the biased small-range regime;
        # assert the estimate is within a loose factor, not precision
        from abot_dotnet_core_spark.functions.sketches import hll_registers
        r = {x["source"]: x for x in hll_registers(
            self._occ(spark, {"a": 300}), "source", "tok").collect()}["a"]
        assert 100 <= r["hll_raw_est"] <= 900


class TestTriangles:
    def test_hand_counted(self, spark):
        from abot_dotnet_core_spark.functions.graph import triangle_counts
        # K4 on {a,b,c,d}: 4 triangles, each node in 3; plus pendant e-a
        edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
                 ("b", "d"), ("c", "d"), ("e", "a")]
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(edf).collect()}
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_direction_and_duplicates_ignored(self, spark):
        from abot_dotnet_core_spark.functions.graph import triangle_counts
        # same triangle given with mixed orientations, dups and a self-loop
        edges = [("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"),
                 ("a", "c"), ("a", "a")]
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(edf).collect()}
        assert got == {"a": 1, "b": 1, "c": 1}


class TestKcore:
    def test_peel_chain_keeps_clique(self, spark):
        from abot_dotnet_core_spark.functions.graph import kcore_peel
        # triangle {a,b,c} (2-core) with a tail c-d-e that peels at k=2
        edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["a", "b", "c", "d", "e"]])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: (r["in_kcore"], r["last_degree"])
               for r in kcore_peel(ndf, edf, k=2, iterations=4).collect()}
        assert got == {"a": (True, 2), "b": (True, 2), "c": (True, 2),
                       "d": (False, 0), "e": (False, 0)}

    def test_cascade_needs_multiple_rounds(self, spark):
        from abot_dotnet_core_spark.functions.graph import kcore_peel
        # path a-b-c-d at k=2: ends peel first, then the middle cascades
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["a", "b", "c", "d"]])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        after1 = {r["node"]: r["in_kcore"] for r in
                  kcore_peel(ndf, edf, k=2, iterations=1).collect()}
        assert after1 == {"a": False, "b": True, "c": True, "d": False}
        after3 = {r["node"]: r["in_kcore"] for r in
                  kcore_peel(ndf, edf, k=2, iterations=3).collect()}
        assert after3 == {"a": False, "b": False, "c": False, "d": False}


class TestDedupRecall:
    def test_planted_dups_and_counts(self, spark):
        from abot_dotnet_core_spark.functions.dedup import lsh_recall_eval
        near = "the quick brown fox jumps over the lazy dog again today"
        texts = [near, near + " extra", "totally different words here now",
                 "yet another unrelated document about other things"]
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        r = lsh_recall_eval(df, k=4, bands=2, threshold=0.2).collect()[0]
        assert r["n_truth"] >= 1                  # the planted pair
        assert r["n_hit"] <= r["n_truth"]
        assert r["n_hit"] <= r["n_candidates"] or r["n_candidates"] == 0
        assert 0 <= r["recall_millis"] <= 1000
        # identical-prefix docs share every band -> must be recalled
        assert r["recall_millis"] == 1000


class TestSegmentLangs:
    def test_mix_profile(self, spark):
        from abot_dotnet_core_spark.functions.textfns import (
            STOPWORDS, segment_langs)
        # exclusive stopwords only, so a segment votes unambiguously
        def pure(lang):
            other = {w for l2, ws in STOPWORDS.items() if l2 != lang
                     for w in ws}
            ws = [w for w in STOPWORDS[lang] if w not in other]
            return " ".join((ws * 20)[:20])     # one full 20-token segment
        en, de = pure("en"), pure("de")
        texts = [
            en + " " + de,                 # 1 en seg + 1 de seg
            en,                            # single en segment
            "zz qq ww ee rr",              # undecided
            "",                            # no tokens -> no row
            " ".join([de, de, en]),        # de dominant, en foreign
        ]
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        got = {r["doc_id"]: tuple(r)[1:] for r in segment_langs(df).collect()}
        # doc 0: count tie 1-1 between de and en -> lang asc -> de wins
        assert got[0] == (2, "de", 1, 0, 1)
        assert got[1] == (1, "en", 1, 0, 0)
        assert got[2] == (1, "und", 0, 1, 0)
        assert 3 not in got
        assert got[4] == (3, "de", 2, 0, 1)


class TestRedirectResolve:
    def test_chain_cycle_and_depth(self, spark):
        from abot_dotnet_core_spark.functions.graph import resolve_redirects
        edges = ([("a", "b"), ("b", "c"), ("c", "d")]       # 3-hop chain
                 + [("x", "y"), ("y", "x")]                  # 2-cycle
                 + [("lone", "end")])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["src"]: (r["final_url"], r["hops"], r["resolved"])
               for r in resolve_redirects(edf, doubling_rounds=3).collect()}
        assert got["a"] == ("d", 3, True)
        assert got["b"] == ("d", 2, True)
        assert got["lone"] == ("end", 1, True)
        # cycle members never resolve; final stays inside the cycle
        assert got["x"][2] is False and got["x"][0] in ("x", "y")
        assert got["y"][2] is False

    def test_chain_longer_than_doubling_budget(self, spark):
        from abot_dotnet_core_spark.functions.graph import resolve_redirects
        # 5-hop chain with 1 doubling round (covers <= 2 hops)
        edges = [(f"n{i}", f"n{i+1}") for i in range(5)]
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["src"]: r for r in
               resolve_redirects(edf, doubling_rounds=1).collect()}
        assert got["n0"]["resolved"] is False     # stuck mid-chain
        assert got["n3"]["final_url"] == "n5" and got["n3"]["resolved"]


class TestReviewRegressions:
    def test_redirect_duplicate_src_elects_min(self, spark):
        from abot_dotnet_core_spark.functions.graph import resolve_redirects
        # same src observed redirecting differently across captures
        edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "e")]
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        rows = resolve_redirects(edf, doubling_rounds=3).collect()
        got = {r["src"]: r for r in rows}
        assert len(rows) == 3                      # one row per src
        assert got["a"]["final_url"] == "d"        # min(dst)='b' then ->d

    def test_kcore_last_degree_is_post_peel(self, spark):
        from abot_dotnet_core_spark.functions.graph import kcore_peel
        # path a-b-c-d, k=2, 1 round: ends peel; survivors b,c must report
        # their degree IN THE ALIVE SUBGRAPH (1), not the pre-peel 2
        edges = [("a", "b"), ("b", "c"), ("c", "d")]
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["a", "b", "c", "d"]])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: (r["in_kcore"], r["last_degree"]) for r in
               kcore_peel(ndf, edf, k=2, iterations=1).collect()}
        assert got["b"] == (True, 1) and got["c"] == (True, 1)
        assert got["a"] == (False, 0) and got["d"] == (False, 0)


class TestNepotism:
    def test_same_registrant_cross_host_only(self, spark):
        from abot_dotnet_core_spark.functions.graph import nepotism_rates
        hg = spark.createDataFrame([
            # same registrant, different hosts -> nepotistic
            Row(src_host="a.example.com", dst_host="b.example.com", n_links=3),
            # self-loop -> excluded entirely
            Row(src_host="a.example.com", dst_host="a.example.com", n_links=9),
            # cross-registrant -> counted, not nepotistic
            Row(src_host="a.example.com", dst_host="other.org", n_links=1),
            # multi-part suffix: same co.uk registrant across subdomains
            Row(src_host="x.shop.co.uk", dst_host="y.shop.co.uk", n_links=2),
        ])
        got = {r["registrant"]: r for r in nepotism_rates(hg).collect()}
        e = got["example.com"]
        assert (e["out_links"], e["nepotistic_links"],
                e["nepotism_millis"]) == (4, 3, 750)
        s = got["shop.co.uk"]
        assert (s["out_links"], s["nepotistic_links"],
                s["nepotism_millis"]) == (2, 2, 1000)


class TestTrustrank:
    def _py_trust(self, nodes, edges, seeds, iters=3,
                  total=10**12, damping=85):
        base = total // len(seeds)
        tel = (100 - damping) * base // 100
        od = {}
        for s, d, w in edges:
            od[s] = od.get(s, 0) + w
        mass = {n: (base if n in seeds else 0) for n in nodes}
        for _ in range(iters):
            inc = {n: 0 for n in nodes}
            for s, d, w in edges:
                inc[d] += mass[s] * w // od[s]
            mass = {n: (tel if n in seeds else 0) + damping * inc[n] // 100
                    for n in nodes}
        return mass

    def test_matches_sequential_and_decays_from_seeds(self, spark):
        from abot_dotnet_core_spark.functions.graph import trustrank_mass
        nodes = ["s", "a", "b", "far"]
        edges = [("s", "a", 1), ("a", "b", 1), ("b", "far", 1),
                 ("far", "far", 1)]
        ndf = spark.createDataFrame([Row(node=n) for n in nodes])
        edf = spark.createDataFrame(
            [Row(src=s, dst=d, w=w) for s, d, w in edges])
        sdf = spark.createDataFrame([Row(node="s")])
        got = {r["node"]: r["trust_mass"] for r in
               trustrank_mass(ndf, edf, sdf, iterations=3,
                              weight_col="w").collect()}
        assert got == self._py_trust(nodes, edges, {"s"})
        # trust decays with distance from the seed
        assert got["s"] > 0 and got["a"] > got["b"] > 0

    def test_empty_seed_set_raises(self, spark):
        from abot_dotnet_core_spark.functions.graph import trustrank_mass
        ndf = spark.createDataFrame([Row(node="a")])
        edf = spark.createDataFrame([Row(src="a", dst="a")])
        sdf = spark.createDataFrame([], "node string")
        with pytest.raises(ValueError):
            trustrank_mass(ndf, edf, sdf)


class TestTrussCommunities:
    def test_two_clusters_bridge_drops(self, spark):
        from abot_dotnet_core_spark.functions.graph import truss_communities
        # two triangles joined by one triangle-free bridge: the bridge has
        # zero support and drops, so the clusters stay separate communities
        # (components_minlabel over the raw edges would merge them)
        edges = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
                 ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
                 ("a1", "b1")]
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]])
        got = {r["node"]: r["community"]
               for r in truss_communities(ndf, edf).collect()}
        assert got == {"a1": "a1", "a2": "a1", "a3": "a1",
                       "b1": "b1", "b2": "b1", "b3": "b1"}

    def test_chain_becomes_singletons(self, spark):
        from abot_dotnet_core_spark.functions.graph import truss_communities
        # a path has no triangles at all: every edge drops, every node is
        # its own (singleton) community
        edges = [("p", "q"), ("q", "r")]
        ndf = spark.createDataFrame(
            [Row(node=n) for n in ["p", "q", "r"]])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        got = {r["node"]: r["community"]
               for r in truss_communities(ndf, edf).collect()}
        assert got == {"p": "p", "q": "q", "r": "r"}

    def test_min_support_two(self, spark):
        from abot_dotnet_core_spark.functions.graph import truss_communities
        # K4 minus nothing: every edge is in 2 triangles -> survives
        # min_support=2; a lone appended triangle's edges (support 1) drop
        k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
              ("b", "d"), ("c", "d")]
        tri = [("x", "y"), ("y", "z"), ("x", "z"), ("d", "x")]
        ndf = spark.createDataFrame(
            [Row(node=n) for n in "abcdxyz"])
        edf = spark.createDataFrame(
            [Row(src=s, dst=d) for s, d in k4 + tri])
        got = {r["node"]: r["community"] for r in
               truss_communities(ndf, edf, min_support=2).collect()}
        assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
        assert got["x"] == "x" and got["y"] == "y" and got["z"] == "z"


class TestSpamMass:
    def _py_masses(self, nodes, edges, seeds, iters=3,
                   total=10**12, damping=85):
        od = {}
        for s, d, w in edges:
            od[s] = od.get(s, 0) + w

        def loop(init, tel_of):
            mass = dict(init)
            for _ in range(iters):
                inc = {n: 0 for n in nodes}
                for s, d, w in edges:
                    inc[d] += mass[s] * w // od[s]
                mass = {n: tel_of(n) + damping * inc[n] // 100
                        for n in nodes}
            return mass

        base = total // len(nodes)
        pr = loop({n: base for n in nodes},
                  lambda n: (100 - damping) * base // 100)
        sbase = total // len(seeds)
        stel = (100 - damping) * sbase // 100
        tr = loop({n: (sbase if n in seeds else 0) for n in nodes},
                  lambda n: stel if n in seeds else 0)
        return {n: (pr[n], tr[n], max(pr[n] - tr[n], 0) * 1000 // pr[n])
                for n in nodes}

    def test_matches_sequential_and_orders_spam(self, spark):
        from abot_dotnet_core_spark.functions.graph import spam_mass
        # seed s feeds a; spamfarm f1<->f2 earns rank with no trust inflow
        nodes = ["s", "a", "f1", "f2"]
        edges = [("s", "a", 2), ("a", "s", 1),
                 ("f1", "f2", 5), ("f2", "f1", 5)]
        ndf = spark.createDataFrame([Row(node=n) for n in nodes])
        edf = spark.createDataFrame(
            [Row(src=s, dst=d, w=w) for s, d, w in edges])
        sdf = spark.createDataFrame([Row(node="s")])
        got = {r["node"]: (r["rank_mass"], r["trust_mass"], r["spam_millis"])
               for r in spam_mass(ndf, edf, sdf, iterations=3,
                                  weight_col="w").collect()}
        assert got == self._py_masses(nodes, edges, {"s"})
        # farm hosts carry (near-)total spam mass; the seed is clamped at 0
        assert got["f1"][2] > 990 and got["f2"][2] > 990
        assert got["s"][2] == 0
