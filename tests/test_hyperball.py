"""hyperball: propagated HLL registers == sketch of the exact r-ball.

The key invariant (max is the union's register state) is pinned by a
sequential mirror that BFS-expands the exact ball membership and computes
the registers from the SET — any propagation bug (wrong direction, missed
self-inclusion, dangling leakage) diverges from it.
"""

import hashlib

import pytest
from pyspark.sql import Row

from abot_dotnet_core_spark.functions.graph import hyperball

P = 6
MAX_RHO = 30
M = 1 << P
REM_BITS = 48 - P
ALPHA = round(0.7213 / (1 + 1.079 / M) * 10**6)


def _h48(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _summary(members):
    regs = {}
    for v in members:
        h = _h48(v)
        bucket, rem = h >> REM_BITS, h % (1 << REM_BITS)
        rho = REM_BITS + 1 if rem == 0 else REM_BITS + 1 - rem.bit_length()
        rho = min(rho, MAX_RHO)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    n_present = len(regs)
    sum_scaled = (sum(1 << (MAX_RHO - mm) for mm in regs.values())
                  + (M - n_present) * (1 << MAX_RHO))
    est = (ALPHA * ((M * M * (1 << MAX_RHO)) // sum_scaled)) // 10**6
    return n_present, sum_scaled, est


def _mirror(nodes, edges, radius):
    adj = {}
    ns = set(nodes)
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = {}
    ball = {v: {v} for v in ns}
    for r in range(radius + 1):
        if r > 0:
            ball = {v: ball[v] | set().union(
                        *[ball[w] for w in adj.get(v, ()) if w in ns] or [set()])
                    for v in ns}
        for v in ns:
            out[(v, r)] = _summary(ball[v])
    return out


def _run(spark, nodes, edges, radius):
    ndf = spark.createDataFrame([Row(host=n) for n in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    rows = hyperball(ndf, edf, radius=radius, p=P, max_rho=MAX_RHO).collect()
    return {(r["node"], r["r"]): (r["n_present"], r["sum_scaled"],
                                  r["ball_est"]) for r in rows}


class TestHyperball:
    def test_path_graph_matches_exact_set_sketch(self, spark):
        nodes = ["a", "b", "c", "d", "e"]
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        got = _run(spark, nodes, edges, 3)
        assert got == _mirror(nodes, edges, 3)
        # radius-0 ball is {self}: one register present
        assert all(got[(v, 0)][0] == 1 for v in nodes)

    def test_branching_and_cycle(self, spark):
        nodes = [f"n{i}" for i in range(8)]
        edges = [("n0", "n1"), ("n0", "n2"), ("n1", "n3"), ("n2", "n3"),
                 ("n3", "n0"),                       # cycle back
                 ("n4", "n5"), ("n5", "n4"),         # 2-cycle island
                 ("n6", "n7"), ("n6", "n6")]         # self-loop
        got = _run(spark, nodes, edges, 3)
        assert got == _mirror(nodes, edges, 3)

    def test_dangling_dst_ignored(self, spark):
        nodes = ["a", "b"]
        edges = [("a", "b"), ("a", "ghost"), ("b", "ghost")]
        got = _run(spark, nodes, edges, 2)
        assert got == _mirror(nodes, edges, 2)
        # ghost never enters any ball: a's ball is exactly {a, b}
        assert got[("a", 2)] == _summary({"a", "b"})

    def test_rounds_monotone_nonincreasing_sum(self, spark):
        # growing balls can only raise registers -> sum_scaled decreases
        nodes = [f"m{i}" for i in range(12)]
        edges = [(f"m{i}", f"m{(i * 5 + 1) % 12}") for i in range(12)] + \
                [(f"m{i}", f"m{(i * 7 + 3) % 12}") for i in range(12)]
        got = _run(spark, nodes, edges, 3)
        assert got == _mirror(nodes, edges, 3)
        for v in nodes:
            sums = [got[(v, r)][1] for r in range(4)]
            assert sums == sorted(sums, reverse=True)


class TestNeighborhoodFn:
    def test_monotone_and_saturates(self, spark):
        """N(r) is nondecreasing in r; on a strongly-connected cycle it
        saturates at the all-pairs sketch estimate."""
        from pyspark.sql import functions as F
        nodes = [f"c{i}" for i in range(6)]
        edges = [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)]
        ndf = spark.createDataFrame([Row(host=n) for n in nodes])
        edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
        hb = hyperball(ndf, edf, radius=5, p=P, max_rho=MAX_RHO)
        nf = {r["r"]: r["pairs_est"] for r in
              (hb.groupBy("r")
               .agg(F.sum("ball_est").alias("pairs_est"))).collect()}
        vals = [nf[r] for r in range(6)]
        assert vals == sorted(vals)
        # radius 5 on a 6-cycle reaches everything: N(5) = 6 * est({all})
        assert nf[5] == 6 * _summary(set(nodes))[2]
