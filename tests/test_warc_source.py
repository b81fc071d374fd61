"""WARC source: byte-level record parsing, Spark reader, corpus projection.

The fixture records come from the same deterministic synthetic corpus the
engine crawls, so `warc_to_corpus` text can be checked byte-identical
against the kernel extractor (golden_text) — the input_hint invariant.
"""

import datetime
import gzip
import os

import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.sources.warc import (
    iter_warc_records, read_warc, warc_to_corpus, write_warc,
    write_warc_segments)

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _recs(n=20):
    """Deterministic fixture records with varied charsets/statuses."""
    out = []
    for i in range(n):
        body = (f"<html><head><title>p{i}</title></head><body>"
                f"<a href='/child{i}'>c</a> tok{i} common words here"
                f"</body></html>").encode()
        out.append({
            "url": f"http://w{i % 5}.test/page{i}",
            "warc_ts": T0 + datetime.timedelta(seconds=i),
            "status": 200 if i % 4 else 404,
            "content_type": "text/html; charset=utf-8",
            "html": body,
        })
    return out


class TestRecordLevel:
    def test_roundtrip_plain_and_gzip(self, tmp_path):
        recs = _recs(7)
        for name in ("a.warc", "a.warc.gz"):
            p = str(tmp_path / name)
            assert write_warc(recs, p) == 7
            got = list(iter_warc_records(open(p, "rb").read()))
            assert [g["url"] for g in got] == [r["url"] for r in recs]
            assert [g["html"] for g in got] == [r["html"] for r in recs]
            assert [g["status"] for g in got] == [r["status"] for r in recs]
            assert got[0]["warc_ts"] == recs[0]["warc_ts"]
            assert got[0]["content_type"] == "text/html; charset=utf-8"

    def test_gzip_is_one_member_per_record(self, tmp_path):
        p = str(tmp_path / "m.warc.gz")
        write_warc(_recs(3), p)
        data = open(p, "rb").read()
        assert data.count(b"\x1f\x8b\x08") == 3       # 3 gzip members
        # and still one valid concatenated stream
        assert gzip.GzipFile(fileobj=__import__("io").BytesIO(data)) \
            .read().count(b"WARC/1.0") == 3

    def test_deterministic_bytes(self, tmp_path):
        p1, p2 = str(tmp_path / "d1.warc.gz"), str(tmp_path / "d2.warc.gz")
        write_warc(_recs(5), p1)
        write_warc(_recs(5), p2)
        assert open(p1, "rb").read() == open(p2, "rb").read()

    def test_truncated_tail_skipped(self, tmp_path):
        p = str(tmp_path / "t.warc")
        write_warc(_recs(4), p)
        data = open(p, "rb").read()
        got = list(iter_warc_records(data[:len(data) - 40]))  # cut last block
        assert [g["url"] for g in got] == \
            [r["url"] for r in _recs(4)][:3]

    def test_non_response_records_skipped(self, tmp_path):
        p = str(tmp_path / "w.warc")
        write_warc(_recs(2), p)
        info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Type: application/warc-fields\r\n"
                b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
        data = info + open(p, "rb").read()
        assert len(list(iter_warc_records(data))) == 2

    def test_resource_record(self):
        block = b"plain payload"
        raw = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
               b"WARC-Target-URI: http://r.test/f.txt\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Type: text/plain\r\n"
               b"Content-Length: %d\r\n\r\n" % len(block)) + block + b"\r\n\r\n"
        [got] = list(iter_warc_records(raw))
        assert (got["status"], got["html"], got["content_type"]) == \
            (200, block, "text/plain")


class TestSparkReader:
    def test_read_segments(self, spark, tmp_path):
        recs = _recs(40)
        paths = write_warc_segments(recs, str(tmp_path / "seg"),
                                    n_segments=4)
        assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
        df = read_warc(spark, str(tmp_path / "seg"))
        rows = {r["url"]: r for r in df.collect()}
        assert len(rows) == 40
        for rec in recs:
            got = rows[rec["url"]]
            assert bytes(got["html"]) == rec["html"]
            assert got["status"] == rec["status"]
            assert got["warc_ts"] == rec["warc_ts"]
        # the scan is file-granular: binaryFile lists exactly the 4 segments
        # (tiny test files may PACK into fewer partitions via
        # maxPartitionBytes; at real ~1 GB segment sizes it's 1 task/file)
        assert spark.read.format("binaryFile") \
            .load(str(tmp_path / "seg")).count() == 4

    def test_corpus_projection_text_is_byte_identical(self, spark, tmp_path):
        """input_hint invariant: text extracted from WARC == kernel
        golden_text of the same html (same charset cascade the engine
        uses), incl. a non-utf8 header-charset page."""
        from abot_dotnet_core_spark.kernel.extract import golden_text
        recs = _recs(12)
        recs.append({
            "url": "http://w9.test/cp1251",
            "warc_ts": T0,
            "status": 200,
            "content_type": "text/html; charset=windows-1251",
            "html": "<html><body>Привет мир</body></html>".encode("cp1251"),
        })
        write_warc_segments(recs, str(tmp_path / "seg2"), n_segments=2)
        df = warc_to_corpus(spark, str(tmp_path / "seg2"))
        assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
        got = {r["url"]: r for r in df.collect()}
        assert len(got) == 13
        for rec in recs:
            want = golden_text(rec["html"], rec["content_type"])
            assert got[rec["url"]]["text"] == want, rec["url"]
        assert "Привет" in got["http://w9.test/cp1251"]["text"]
        assert all(isinstance(r["lang"], str) for r in got.values())

    def test_engine_crawls_warc_corpus(self, spark, tmp_path):
        """End-to-end: WARC segments -> corpus tables -> CrawlEngine round.
        The archived-crawl replacement for the live-HTTP fetch surface."""
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.crawler import CrawlEngine
        recs = []
        for i in range(6):
            nxt = f"<a href='/p{i + 1}'>n</a>" if i < 5 else ""
            recs.append({
                "url": f"http://site.test/p{i}" if i else "http://site.test/",
                "warc_ts": T0 + datetime.timedelta(seconds=i),
                "status": 200,
                "content_type": "text/html; charset=utf-8",
                "html": f"<html><body>page {i} {nxt}</body></html>".encode(),
            })
        write_warc_segments(recs, str(tmp_path / "seg3"), n_segments=2)
        w = read_warc(spark, str(tmp_path / "seg3"))
        corpus_dir = str(tmp_path / "as_corpus")
        w.select("url", "warc_ts", "html").write.parquet(
            f"{corpus_dir}/corpus.parquet")
        (w.select("url", "status", "content_type",
                  F.length("html").cast("long").alias("content_length"),
                  F.lit(None).cast("string").alias("redirect_to"),
                  F.lit(None).cast("string").alias("x_robots"),
                  F.lit(None).cast("string").alias("retry_after"))
         .write.parquet(f"{corpus_dir}/corpus_meta.parquet"))
        eng = CrawlEngine(
            spark, CrawlConfig(max_pages_to_crawl=0),
            corpus_path=f"{corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "store"))
        eng.seed(["http://site.test/"])
        stats = eng.run(max_rounds=10)
        assert sum(s.fetched for s in stats) == 6   # whole chain crawled


class TestSparkSink:
    def test_write_read_roundtrip(self, spark, tmp_path):
        """Distributed sink: df -> WARC segments -> read_warc recovers every
        record; manifest counts match."""
        recs = _recs(30)
        src = spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["status"], r["content_type"],
              bytearray(r["html"])) for r in recs],
            "url string, warc_ts timestamp, status int,"
            " content_type string, html binary")
        from abot_dotnet_core_spark.sources.warc import (read_warc,
                                                         write_warc_df)
        out = str(tmp_path / "sink")
        manifest = write_warc_df(src.repartition(3, "url"), out).collect()
        assert sum(m["n_records"] for m in manifest) == 30
        assert all(m["n_bytes"] > 0 for m in manifest)
        back = {r["url"]: r for r in read_warc(spark, out).collect()}
        assert len(back) == 30
        for rec in recs:
            got = back[rec["url"]]
            assert bytes(got["html"]) == rec["html"]
            assert got["status"] == rec["status"]
            assert got["warc_ts"] == rec["warc_ts"]

    def test_unicode_url_roundtrip(self, spark, tmp_path):
        import io as _io
        from abot_dotnet_core_spark.sources.warc import (iter_warc_records,
                                                         write_warc)
        rec = {"url": "http://пример.test/страница",
               "warc_ts": T0, "status": 200,
               "content_type": "text/html; charset=utf-8",
               "html": b"<html>ok</html>"}
        p = str(tmp_path / "u.warc.gz")
        write_warc([rec], p)
        [got] = list(iter_warc_records(open(p, "rb").read()))
        assert got["url"] == rec["url"]


class TestRobustness:
    def test_truncated_gzip_keeps_complete_records(self, tmp_path):
        """A .warc.gz cut mid-member yields every record before the cut
        instead of raising (regression: gzip.GzipFile EOFError killed the
        whole segment)."""
        p = str(tmp_path / "t.warc.gz")
        write_warc(_recs(4), p)
        data = open(p, "rb").read()
        got = list(iter_warc_records(data[:len(data) - 25]))
        assert [g["url"] for g in got] == [r["url"] for r in _recs(4)][:3]

    def test_sink_tolerates_null_status_and_ts(self, spark, tmp_path):
        """read_warc legitimately yields NULL status/warc_ts; the inverse
        sink must archive those rows, not crash (status round-trips as 0,
        ts as the epoch)."""
        from abot_dotnet_core_spark.sources.warc import (read_warc,
                                                         write_warc_df)
        src = spark.createDataFrame(
            [("http://n.test/a", None, None, None, bytearray(b"<x>")),
             ("http://n.test/b", T0, 200, "text/html", bytearray(b"<y>"))],
            "url string, warc_ts timestamp, status int,"
            " content_type string, html binary")
        out = str(tmp_path / "nullsink")
        manifest = write_warc_df(src.repartition(1), out).collect()
        assert sum(m["n_records"] for m in manifest) == 2
        back = {r["url"]: r for r in read_warc(spark, out).collect()}
        assert back["http://n.test/a"]["status"] == 0
        assert back["http://n.test/a"]["warc_ts"] == \
            datetime.datetime(1970, 1, 1)
        assert back["http://n.test/b"]["status"] == 200

    def test_orphaned_part_files_invisible_to_reader(self, spark, tmp_path):
        """A .part left by a killed task must never be re-ingested (hidden
        dot-prefix name → skipped by Spark's file listing)."""
        d = tmp_path / "orphan"
        os.makedirs(d)
        write_warc(_recs(3), str(d / "segment-00000.warc.gz"))
        # simulate a dead task's scratch file with duplicate content
        write_warc(_recs(3), str(d / ".segment-00001.warc.gz.part"),
                   compress=True)
        from abot_dotnet_core_spark.sources.warc import read_warc
        assert read_warc(spark, str(d)).count() == 3


class TestWet:
    def test_roundtrip_and_refers_to(self, spark, tmp_path):
        from datetime import datetime
        from abot_dotnet_core_spark.sources.warc import (
            write_wet_df, read_wet, iter_warc_records, _record_id)
        df = spark.createDataFrame(
            [("http://a.test/1", datetime(2026, 1, 2, 3, 4, 5), "héllo wörld"),
             ("http://a.test/2", datetime(2026, 1, 2, 3, 4, 6), ""),
             ("http://b.test/x", None, "plain text body")],
            "url string, warc_ts timestamp, text string")
        man = write_wet_df(df.repartition(2), str(tmp_path / "wet")).collect()
        assert sum(r.n_records for r in man) == 3
        assert all(r.wet_file.endswith(".warc.wet.gz") for r in man)

        back = read_wet(spark, str(tmp_path / "wet") + "/*.warc.wet.gz")
        rows = {r.url: r for r in back.collect()}
        assert rows["http://a.test/1"].text == "héllo wörld"
        assert rows["http://a.test/2"].text == ""
        assert rows["http://b.test/x"].warc_ts == datetime(1970, 1, 1)

        # Refers-To links to the response record id of the same (url, ts)
        import glob
        blob = b"".join(open(p, "rb").read()
                        for p in glob.glob(str(tmp_path / "wet") + "/*.gz"))
        import gzip as _gz, io as _io
        raw = _gz.GzipFile(fileobj=_io.BytesIO(blob)).read()
        assert _record_id("http://a.test/1",
                          "2026-01-02T03:04:05Z").encode() in raw

    def test_conversion_records_invisible_to_warc_reader(self, spark,
                                                         tmp_path):
        """A WET segment yields zero rows through the response/resource
        reader — the two sidecars never cross-contaminate."""
        from datetime import datetime
        from abot_dotnet_core_spark.sources.warc import (
            write_wet_df, read_warc)
        df = spark.createDataFrame(
            [("http://a.test/1", datetime(2026, 1, 1), "t")],
            "url string, warc_ts timestamp, text string")
        write_wet_df(df, str(tmp_path / "wet")).collect()
        got = read_warc(spark, str(tmp_path / "wet") + "/*")
        assert got.count() == 0


class TestWat:
    def test_roundtrip_and_refers_to(self, spark, tmp_path):
        from datetime import datetime
        from abot_dotnet_core_spark.sources.warc import (
            write_wat_df, read_wat, _record_id)
        df = spark.createDataFrame(
            [("http://a.test/1", datetime(2026, 1, 2, 3, 4, 5), 200,
              "text/html", "Pâge One", ["http://a.test/2", "http://b.test/"]),
             ("http://a.test/2", datetime(2026, 1, 2, 3, 4, 6), 404,
              None, None, []),
             ("http://b.test/x", None, None, "text/plain", None, None)],
            "url string, warc_ts timestamp, status int, content_type string,"
            " title string, links array<string>")
        man = write_wat_df(df.repartition(2), str(tmp_path / "wat")).collect()
        assert sum(r.n_records for r in man) == 3
        assert all(r.wat_file.endswith(".warc.wat.gz") for r in man)

        back = {r.url: r for r in
                read_wat(spark,
                         str(tmp_path / "wat") + "/*.warc.wat.gz").collect()}
        assert back["http://a.test/1"].title == "Pâge One"
        assert back["http://a.test/1"].links == ["http://a.test/2",
                                                 "http://b.test/"]
        assert back["http://a.test/1"].status == 200
        assert back["http://a.test/1"].content_type == "text/html"
        assert back["http://a.test/2"].status == 404
        assert back["http://a.test/2"].title is None
        assert back["http://a.test/2"].links == []
        # null status -> 0, the same honest unknown as the WARC HTTP line
        assert back["http://b.test/x"].status == 0
        assert back["http://b.test/x"].links == []
        assert back["http://b.test/x"].warc_ts == datetime(1970, 1, 1)

        import glob
        import gzip as _gz
        import io as _io
        blob = b"".join(open(p, "rb").read()
                        for p in glob.glob(str(tmp_path / "wat") + "/*.gz"))
        raw = _gz.GzipFile(fileobj=_io.BytesIO(blob)).read()
        # Refers-To links to the paired response record id
        assert _record_id("http://a.test/1",
                          "2026-01-02T03:04:05Z").encode() in raw

    def test_foreign_wat_shapes_skip_not_crash(self, spark, tmp_path):
        """A CC-style WAT record with provenance-labelled Links (some
        without 'url'), plus one with unparseable JSON, must yield the
        parseable rows and skip the rest — never fail the task."""
        import gzip as _gz
        import json
        env = {"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {
            "Response-Message": {"Status": 301},
            "HTML-Metadata": {"Links": [
                {"path": "SCRIPT@/src"},          # no url key
                {"path": "A@/href", "url": "http://ok.test/"},
                "not-a-dict"]}}}}}
        recs = []
        for url, payload in [("http://f.test/a",
                              json.dumps(env).encode()),
                             ("http://f.test/bad", b"{ not json")]:
            head = ("WARC/1.0\r\nWARC-Type: metadata\r\n"
                    f"WARC-Target-URI: {url}\r\n"
                    "WARC-Date: 2026-01-01T00:00:00Z\r\n"
                    "Content-Type: application/json\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n").encode()
            recs.append(head + payload + b"\r\n\r\n")
        p = tmp_path / "wat" / "segment-00000.warc.wat.gz"
        p.parent.mkdir()
        p.write_bytes(_gz.compress(b"".join(recs)))
        from abot_dotnet_core_spark.sources.warc import read_wat
        rows = read_wat(spark, str(tmp_path / "wat")).collect()
        assert len(rows) == 1
        assert rows[0].url == "http://f.test/a"
        assert rows[0].status == 301
        assert rows[0].links == ["http://ok.test/"]

    def test_metadata_records_invisible_to_warc_reader(self, spark,
                                                       tmp_path):
        from datetime import datetime
        from abot_dotnet_core_spark.sources.warc import (
            write_wat_df, read_warc)
        df = spark.createDataFrame(
            [("http://a.test/1", datetime(2026, 1, 1), 200, "text/html",
              None, [])],
            "url string, warc_ts timestamp, status int, content_type string,"
            " title string, links array<string>")
        write_wat_df(df, str(tmp_path / "wat")).collect()
        assert read_warc(spark, str(tmp_path / "wat") + "/*").count() == 0


class TestRevisits:
    """WARC revisit records (identical-payload-digest dedup, ISO 28500
    §6.7.2 — Common Crawl's URL-agnostic content dedup)."""

    def _dup_df(self, spark):
        recs = _recs(6)
        shared = b"<html><body>boilerplate shell</body></html>"
        for i in (1, 3, 5):             # three urls share one payload
            recs[i]["html"] = shared
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["status"], r["content_type"],
              r["html"]) for r in recs],
            "url string, warc_ts timestamp, status int, "
            "content_type string, html binary")

    def test_segment_scope_roundtrip(self, spark, tmp_path):
        """dedup_revisits=True: repeats within one segment become revisit
        records; read + resolve rebuilds every page byte-identically."""
        from abot_dotnet_core_spark.sources.warc import (
            read_warc_revisits, resolve_revisits, write_warc_df)
        df = self._dup_df(spark)
        out = str(tmp_path / "warc")
        man = write_warc_df(df.repartition(1), out,
                            dedup_revisits=True).collect()
        assert sum(r.n_records for r in man) == 6
        pages = read_warc(spark, out)
        assert pages.count() == 4       # 4 unique payloads written in full
        rev = read_warc_revisits(spark, out)
        assert rev.count() == 2         # pages 3 and 5 repeat page 1's
        got = {(r.url, bytes(r.html)) for r in
               pages.unionByName(
                   resolve_revisits(pages, rev)).collect()}
        want = {(r.url, bytes(r.html)) for r in df.collect()}
        assert got == want

    def test_revisit_headers_and_digest(self, spark, tmp_path):
        import hashlib
        from abot_dotnet_core_spark.sources.warc import (
            iter_warc_records, read_warc_revisits, write_warc_df)
        df = self._dup_df(spark)
        out = str(tmp_path / "warc")
        write_warc_df(df.repartition(1), out, dedup_revisits=True).collect()
        seg = os.path.join(out, os.listdir(out)[0])
        raw = open(seg, "rb").read()
        revs = list(iter_warc_records(raw, types=("revisit",)))
        assert len(revs) == 2
        shared = b"<html><body>boilerplate shell</body></html>"
        dg = hashlib.sha1(shared).hexdigest()
        for r in revs:
            assert r["payload_digest"] == dg       # sha1: label stripped
            assert r["html"] is None               # no payload block
            assert r["status"] == 200              # http headers preserved
        # all three refer to the earliest record carrying the payload
        rev_df = read_warc_revisits(spark, out)
        refs = {r.refers_to_url for r in rev_df.collect()}
        assert refs == {"http://w1.test/page1"}

    def test_global_mark_revisits_election(self, spark, tmp_path):
        """mark_revisits: corpus-wide earliest-(ts, url) election; marked
        columns are honored by the sink across partitions."""
        from abot_dotnet_core_spark.sources.warc import (
            mark_revisits, read_warc_revisits, resolve_revisits,
            write_warc_df)
        df = self._dup_df(spark)
        marked = mark_revisits(df)
        m = {r.url: (r.is_revisit, r.orig_url) for r in marked.collect()}
        assert m["http://w1.test/page1"] == (False, "http://w1.test/page1")
        assert m["http://w3.test/page3"] == (True, "http://w1.test/page1")
        assert m["http://w0.test/page0"][0] is False
        out = str(tmp_path / "warc")
        # 3 partitions: revisits may land in a different segment than the
        # original — the global pointers must still resolve
        write_warc_df(marked.repartition(3), out).collect()
        pages = read_warc(spark, out)
        rev = read_warc_revisits(spark, out)
        assert pages.count() == 4 and rev.count() == 2
        got = {(r.url, bytes(r.html)) for r in
               pages.unionByName(resolve_revisits(pages, rev)).collect()}
        assert got == {(r.url, bytes(r.html)) for r in df.collect()}


class TestEngineArchive:
    def test_crawl_then_archive_quad(self, spark, tiny_corpus_dir,
                                     tmp_path):
        """CrawlEngine.archive ships WARC(+revisits) + WAT + WET + CDX from
        the crawl store; resolved WARC pages round-trip the crawled subset
        of the corpus byte-identically, the WET text matches the corpus
        text column, and the WAT outlinks match a fresh T1-T4 extraction."""
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.crawler import CrawlEngine
        from abot_dotnet_core_spark.functions.udfs import (
            make_extract_links_udf)
        from abot_dotnet_core_spark.sources.warc import (
            read_warc_revisits, read_wat, read_wet, resolve_revisits)
        eng = CrawlEngine(
            spark, CrawlConfig(),
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "state"))
        eng.seed(["http://d0.test/", "http://d1.test/"])
        eng.run(max_rounds=3)
        out = str(tmp_path / "arc")
        man = eng.archive(out)
        crawled = {r.url for r in eng.store.read_events(spark, "crawled")
                   .select("url").distinct().collect()}
        assert crawled
        n_warc = sum(m["n_records"] for m in man["warc"])
        n_wat = sum(m["n_records"] for m in man["wat"])
        n_wet = sum(m["n_records"] for m in man["wet"])
        assert n_warc == n_wat == n_wet == man["cdx_rows"] == len(crawled)
        # WARC pages + resolved revisits == crawled slice of the corpus
        pages = read_warc(spark, f"{out}/warc")
        rev = read_warc_revisits(spark, f"{out}/warc")
        full = pages.unionByName(resolve_revisits(pages, rev))
        got = {(r.url, bytes(r.html)) for r in full.collect()}
        corpus = spark.read.parquet(f"{tiny_corpus_dir}/corpus.parquet")
        want = {(r.url, bytes(r.html)) for r in corpus.collect()
                if r.url in crawled}
        assert got == want
        # WET text matches the corpus text column
        wet = {(r.url, r.text) for r in
               read_wet(spark, f"{out}/wet").collect()}
        assert wet == {(r.url, r.text) for r in corpus.collect()
                       if r.url in crawled}
        # WAT outlinks == a fresh extraction over the crawled corpus text
        wat = {r.url: (r.status, tuple(r.links)) for r in
               read_wat(spark, f"{out}/wat").collect()}
        links_udf = make_extract_links_udf(CrawlConfig())
        fresh = {r.url: tuple(r.links) for r in corpus.select(
            "url", links_udf(F.col("text"), F.col("url"), F.lit(None),
                             F.lit(None)).alias("links")).collect()
            if r.url in crawled}
        assert set(wat) == crawled
        assert {u: ls for u, (_, ls) in wat.items()} == fresh
        # CDX is the capture index (one row per crawled url here)
        idx = spark.read.parquet(man["cdx_dir"])
        assert {r.url for r in idx.collect()} == crawled
        assert set(idx.columns) == {"surt_key", "ts", "url"}
