"""URL-shape features + per-domain crawl-trap signals."""

from pyspark.sql import functions as F

from abot_dotnet_core_spark.functions.urlsignals import (
    url_shape_features, domain_trap_signals)


def _feat(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r for r in url_shape_features(df).collect()}


class TestFeatures:
    def test_depth_params_and_flags(self, spark):
        f = _feat(spark, [
            "http://a.test/a/b/c/p1",
            "http://a.test/2024/03/11/post",
            "http://a.test/x/y/x/p2",
            "http://a.test/item?sid=s9&page=2",
            "http://a.test/",
        ])
        plain = f["http://a.test/a/b/c/p1"]
        assert (plain.path_depth, plain.n_params) == (4, 0)
        assert not (plain.repeated_segment or plain.calendar_path
                    or plain.session_query)

        cal = f["http://a.test/2024/03/11/post"]
        assert cal.calendar_path and not cal.repeated_segment

        rep = f["http://a.test/x/y/x/p2"]
        assert rep.repeated_segment and not rep.calendar_path

        ses = f["http://a.test/item?sid=s9&page=2"]
        assert ses.session_query and ses.n_params == 2
        assert ses.path_depth == 1

        root = f["http://a.test/"]
        assert root.path_depth == 0 and root.n_params == 0

    def test_calendar_year_month_only(self, spark):
        f = _feat(spark, ["http://a.test/2023/07/", "http://a.test/12345/67/"])
        assert f["http://a.test/2023/07/"].calendar_path
        # 5-digit first run is not a year/month pattern match at the
        # segment boundary form we scan for
        assert f["http://a.test/2023/07/"].domain == "a.test"

    def test_session_key_not_substring(self, spark):
        # 'classid=' must NOT match the sid= key (anchored on & or start)
        f = _feat(spark, ["http://a.test/p?classid=4",
                          "http://a.test/p?x=1&jsessionid=abc"])
        assert not f["http://a.test/p?classid=4"].session_query
        assert f["http://a.test/p?x=1&jsessionid=abc"].session_query


class TestSignals:
    def test_rates_exact(self, spark):
        urls = (["http://t.test/x/y/x/p%d" % i for i in range(3)]
                + ["http://t.test/a/p%d" % i for i in range(7)])
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        row = domain_trap_signals(url_shape_features(df)).collect()[0]
        assert row.n_urls == 10
        assert row.repeated_segment_millis == 300
        assert row.calendar_millis == 0 and row.session_millis == 0
        assert row.trap_score_millis == 300
        # depths: 3x4 + 7x2 = 26 -> 2600 millis avg
        assert row.avg_depth_millis == 2600 and row.max_depth == 4


class TestRegisteredDomain:
    def _run(self, spark, urls):
        from abot_dotnet_core_spark.functions.urlsignals import (
            with_registered_domain)
        from pyspark.sql import Row
        df = spark.createDataFrame([Row(url=u) for u in urls],
                                   schema="url string")
        return {r.host: r for r in with_registered_domain(df).collect()}

    def test_etld_plus_one(self, spark):
        out = self._run(spark, [
            "http://a.blogspot.co.uk/x", "http://b.blogspot.co.uk/y",
            "http://deep.sub.site.com.au/", "http://www.example.com/",
            "http://example.de/", "http://localhost/p",
            "http://co.uk/suffix-only-host"])
        assert out["a.blogspot.co.uk"].registered_domain == "blogspot.co.uk"
        assert out["b.blogspot.co.uk"].registered_domain == "blogspot.co.uk"
        assert out["a.blogspot.co.uk"].public_suffix == "co.uk"
        assert out["deep.sub.site.com.au"].registered_domain == "site.com.au"
        assert out["www.example.com"].registered_domain == "example.com"
        assert out["www.example.com"].public_suffix == "com"
        assert out["example.de"].registered_domain == "example.de"
        # single-label host: the host is its own registered domain
        assert out["localhost"].registered_domain == "localhost"
        assert out["localhost"].public_suffix == "localhost"
        # a bare 2-label multi-suffix has no registrant label: the 2-label
        # default applies (n >= 3 guard)
        assert out["co.uk"].registered_domain == "co.uk"
        assert out["co.uk"].public_suffix == "uk"

    def test_ip_hosts_pass_through_whole(self, spark):
        out = self._run(spark, ["http://192.168.0.1/p", "http://10.9.0.1/q"])
        assert out["192.168.0.1"].registered_domain == "192.168.0.1"
        assert out["192.168.0.1"].public_suffix == "192.168.0.1"
        # distinct servers must NOT share a key via their last octets
        assert (out["192.168.0.1"].registered_domain
                != out["10.9.0.1"].registered_domain)

    def test_host_case_normalized(self, spark):
        out = self._run(spark, ["http://A.Blogspot.CO.UK/x"])
        r = out["a.blogspot.co.uk"]
        assert r.registered_domain == "blogspot.co.uk"
        assert r.public_suffix == "co.uk"


class TestUrlParamVariants:
    def test_variant_collapse(self, spark):
        from pyspark.sql import Row
        from abot_dotnet_core_spark.functions.urlsignals import (
            url_param_variants)
        urls = ["http://x/p", "http://x/p?a=1", "http://x/p?a=2&b=3",
                "http://x/p?a=1",              # exact dup variant
                "http://y/q"]
        df = spark.createDataFrame([Row(url=u) for u in urls])
        got = {r["base_url"]: (r["n_variants"], r["param_keys"])
               for r in url_param_variants(df).collect()}
        assert got["http://x/p"] == (3, "a,b")
        assert got["http://y/q"] == (1, "")

    def test_valueless_param_key(self, spark):
        from pyspark.sql import Row
        from abot_dotnet_core_spark.functions.urlsignals import (
            url_param_variants)
        df = spark.createDataFrame([Row(url="http://x/p?flag&z=1")])
        got = url_param_variants(df).collect()[0]
        assert got["param_keys"] == "flag,z"


class TestCaptureStats:
    def test_gap_arithmetic(self, spark):
        from pyspark.sql import Row
        from abot_dotnet_core_spark.operators.recrawl import capture_stats
        rows = [Row(url="u1", ts=t) for t in (100, 160, 400)] + \
               [Row(url="u2", ts=500)]
        got = {r["url"]: r for r in capture_stats(
            spark.createDataFrame(rows)).collect()}
        # u1: gaps 60, 240 -> mean (400-100)//2 = 150, max 240
        assert (got["u1"]["n_captures"], got["u1"]["mean_gap_s"],
                got["u1"]["max_gap_s"]) == (3, 150, 240)
        assert (got["u2"]["n_captures"], got["u2"]["mean_gap_s"],
                got["u2"]["max_gap_s"]) == (1, 0, 0)
        assert (got["u1"]["first_ts"], got["u1"]["last_ts"]) == (100, 400)

    def test_question_mark_inside_query_value(self, spark):
        # RFC 3986 allows '?' inside the query; keys must come from the
        # FIRST '?' (a last-'?' cut would drop 'q' entirely)
        from pyspark.sql import Row
        from abot_dotnet_core_spark.functions.urlsignals import (
            url_param_variants)
        df = spark.createDataFrame([Row(url="http://x/p?q=what?&a=1")])
        got = url_param_variants(df).collect()[0]
        assert got["base_url"] == "http://x/p"
        assert got["param_keys"] == "a,q"
