"""CDX/SURT URL index: key normalization + range-sorted layout."""

from pyspark.sql import functions as F

from abot_dotnet_core_spark.functions.cdx import surt_key_col, cdx_index


def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", surt_key_col(F.col("url")).alias("k")).collect()
    return {r.url: r.k for r in rows}


class TestSurt:
    def test_normalizations(self, spark):
        got = _surt(spark, [
            "HTTP://WWW.Example.COM:80/Path?b=2&a=1",
            "https://sub.example.com/",
            "http://example.com",
            "http://example.com/p?z=1",
        ])
        assert got["HTTP://WWW.Example.COM:80/Path?b=2&a=1"] == \
            "com,example)/path?a=1&b=2"
        assert got["https://sub.example.com/"] == "com,example,sub)/"
        assert got["http://example.com"] == "com,example)/"
        assert got["http://example.com/p?z=1"] == "com,example)/p?z=1"

    def test_domain_locality(self, spark):
        """All of a registrable domain's captures share a key prefix —
        the property that makes a range scan retrieve them contiguously."""
        got = _surt(spark, ["http://a.example.com/x",
                            "http://b.example.com/y",
                            "http://example.com/z"])
        assert all(k.startswith("com,example") for k in got.values())


class TestIndex:
    def test_sorted_within_partitions_and_ranged(self, spark):
        caps = spark.createDataFrame(
            [(f"http://d{i % 7}.test/p{i}", 1000 + i) for i in range(200)],
            "url string, warc_ts long")
        idx = cdx_index(caps, num_partitions=4)
        parts = (idx.withColumn("pid", F.spark_partition_id())
                 .collect())
        by_pid = {}
        for r in parts:
            by_pid.setdefault(r.pid, []).append((r.surt_key, r.ts))
        # sorted within each partition
        for rows in by_pid.values():
            assert rows == sorted(rows)
        # ranges are disjoint and ordered across partitions
        bounds = sorted((min(v), max(v), pid) for pid, v in by_pid.items())
        for (_, hi, _), (lo, _, _) in zip(bounds, bounds[1:]):
            assert hi <= lo

    def test_extra_locator_cols_pass_through(self, spark):
        caps = spark.createDataFrame(
            [("http://a.test/x", 1, "seg-0.warc.gz", 1234)],
            "url string, warc_ts long, segment string, offset long")
        r = cdx_index(caps, extra_cols=["segment", "offset"]).collect()[0]
        assert (r.segment, r.offset) == ("seg-0.warc.gz", 1234)
        assert r.surt_key == "test,a)/x"


class TestHostGraph:
    def test_edge_weights_and_degrees(self, spark):
        from abot_dotnet_core_spark.functions.graph import (host_graph,
                                                            host_degrees)
        edges = spark.createDataFrame([
            ("http://a.test/1", "http://b.test/x"),
            ("http://a.test/2", "http://b.test/y"),
            ("http://a.test/3", "http://a.test/4"),
            ("http://b.test/1", "http://c.test/"),
            ("http://a.test/5", None),
        ], "src_url string, dst_url string")
        hg = {(r.src_host, r.dst_host): r.n_links
              for r in host_graph(edges).collect()}
        assert hg == {("a.test", "b.test"): 2, ("a.test", "a.test"): 1,
                      ("b.test", "c.test"): 1}
        deg = {r.host: r for r in host_degrees(host_graph(edges)).collect()}
        a = deg["a.test"]
        assert (a.out_hosts, a.out_links, a.in_hosts, a.in_links) == (2, 3, 1, 1)
        assert a.internal_rate_millis == 1000 // 3
        c = deg["c.test"]       # sink-only host still appears
        assert (c.out_hosts, c.out_links, c.in_hosts, c.in_links) == (0, 0, 1, 1)


class TestHostReciprocity:
    def test_reciprocity_classes(self, spark):
        """Fully reciprocated, half, zero, and self-loop-excluded hosts."""
        from abot_dotnet_core_spark.functions.graph import (host_graph,
                                                            host_reciprocity)
        edges = spark.createDataFrame([
            # a <-> b (reciprocated), a -> c (not), c -> c (self loop)
            ("http://a.test/1", "http://b.test/x"),
            ("http://b.test/1", "http://a.test/y"),
            ("http://a.test/2", "http://c.test/"),
            ("http://c.test/1", "http://c.test/2"),
        ], "src_url string, dst_url string")
        out = {r.host: r for r in
               host_reciprocity(host_graph(edges)).collect()}
        a = out["a.test"]
        assert (a.out_hosts, a.reciprocated_hosts,
                a.reciprocity_millis) == (2, 1, 500)
        b = out["b.test"]
        assert (b.out_hosts, b.reciprocated_hosts,
                b.reciprocity_millis) == (1, 1, 1000)
        # c's only non-self out-edge set is empty -> c has no row (no
        # outgoing non-self pairs); self-loops never count
        assert "c.test" not in out

    def test_parallel_links_count_once(self, spark):
        """Reciprocity is over distinct host PAIRS — n_links weight must
        not inflate it."""
        from abot_dotnet_core_spark.functions.graph import (host_graph,
                                                            host_reciprocity)
        edges = spark.createDataFrame(
            [("http://a.test/%d" % i, "http://b.test/x") for i in range(5)]
            + [("http://b.test/1", "http://a.test/")],
            "src_url string, dst_url string")
        out = {r.host: r for r in
               host_reciprocity(host_graph(edges)).collect()}
        assert (out["a.test"].out_hosts,
                out["a.test"].reciprocated_hosts) == (1, 1)
