"""Registered ``warc`` Python DataSource: batch read, atomic sink,
streaming reader, and parity with the mapInPandas helper surface."""

import json
import os
from datetime import datetime

import pytest

from abot_dotnet_core_spark.sources.warc import read_warc, write_warc_segments
from abot_dotnet_core_spark.sources.warc_datasource import register


def _recs(n=20):
    return [{"url": f"http://x.test/p{i}",
             "warc_ts": datetime(2024, 1, 1, 0, 0, i),
             "status": 200 if i % 3 else 404,
             "content_type": "text/html",
             "html": f"<html>page {i}</html>".encode()}
            for i in range(n)]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcds")
    write_warc_segments(_recs(), str(d / "in"), n_segments=3)
    return d


def _rows(df):
    return sorted((r.url, r.status, r.warc_ts, bytes(r.html))
                  for r in df.collect())


class TestBatchRead:
    def test_matches_helper_surface(self, spark, warc_dir):
        register(spark)
        ds = spark.read.format("warc").load(str(warc_dir / "in"))
        helper = read_warc(spark, str(warc_dir / "in"))
        assert _rows(ds) == _rows(helper)
        assert ds.schema == helper.schema

    def test_one_partition_per_file(self, spark, warc_dir):
        register(spark)
        ds = spark.read.format("warc").load(str(warc_dir / "in"))
        assert ds.rdd.getNumPartitions() == 3

    def test_glob_pruning(self, spark, warc_dir):
        register(spark)
        all_n = spark.read.format("warc").load(str(warc_dir / "in")).count()
        one = spark.read.format("warc") \
            .load(str(warc_dir / "in" / "segment-00001*")).count()
        assert 0 < one < all_n

    def test_filter_then_filterless_same_df(self, spark, warc_dir):
        # regression pin for the Spark scan-caching quirk that forced the
        # removal of pushFilters (see warc_datasource.WarcReader): a
        # filtered query over a DataFrame must not narrow a later
        # filterless query over the SAME DataFrame
        register(spark)
        df = spark.read.format("warc").load(str(warc_dir / "in"))
        full = df.count()
        part = df.filter(df.warc_file == "segment-00001.warc.gz").count()
        assert 0 < part < full
        assert df.count() == full


class TestSink:
    def test_atomic_write_manifest_roundtrip(self, spark, warc_dir, tmp_path):
        register(spark)
        src = spark.read.format("warc").load(str(warc_dir / "in"))
        out = str(tmp_path / "out")
        src.write.format("warc").mode("overwrite").save(out)
        names = sorted(os.listdir(out))
        assert "_SUCCESS" in names and "_MANIFEST.json" in names
        assert not [n for n in names if n.endswith(".part")]
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert sum(m["n_records"] for m in manifest) == 20
        back = spark.read.format("warc").load(out)
        assert _rows(back) == _rows(src)

    def test_overwrite_removes_stale_segments(self, spark, warc_dir,
                                              tmp_path):
        register(spark)
        src = spark.read.format("warc").load(str(warc_dir / "in"))
        out = str(tmp_path / "out2")
        src.write.format("warc").mode("overwrite").save(out)
        # second write from a 1-partition frame: stale multi-segment files
        # from the first write must not survive and double the data
        src.coalesce(1).write.format("warc").mode("overwrite").save(out)
        assert spark.read.format("warc").load(out).count() == 20

    def test_append_accumulates(self, spark, warc_dir, tmp_path):
        # append-mode jobs mint distinct segment names: a second append
        # must not clobber the first's identically-numbered partitions,
        # and the manifest must cover both jobs' files
        register(spark)
        src = spark.read.format("warc").load(str(warc_dir / "in"))
        out = str(tmp_path / "app")
        src.write.format("warc").mode("append").save(out)
        src.write.format("warc").mode("append").save(out)
        assert spark.read.format("warc").load(out).count() == 40
        manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert sum(m["n_records"] for m in manifest) == 40

    def test_zero_task_commit_publishes_empty(self, tmp_path):
        # a job that ran zero write tasks still publishes _SUCCESS + an
        # empty manifest instead of crashing on the missing directory
        from abot_dotnet_core_spark.sources.warc import WARC_SCHEMA
        from abot_dotnet_core_spark.sources.warc_datasource import WarcWriter
        out = str(tmp_path / "fresh")
        WarcWriter(WARC_SCHEMA, {"path": out}, overwrite=True).commit([])
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        assert json.load(open(os.path.join(out, "_MANIFEST.json"))) == []

    def test_unmessaged_attempt_scratch_gc(self, tmp_path):
        # a dead attempt's .part never reaches commit(messages); the
        # token-scoped GC removes it, but another job's scratch survives
        from abot_dotnet_core_spark.sources.warc import WARC_SCHEMA
        from abot_dotnet_core_spark.sources.warc_datasource import WarcWriter
        out = str(tmp_path / "gc")
        os.makedirs(out)
        w = WarcWriter(WARC_SCHEMA, {"path": out}, overwrite=True)
        mine = os.path.join(out, f".segment-{w._token}-00003.warc.gz.17.part")
        other = os.path.join(out, ".segment-deadbeef-00000.warc.gz.1.part")
        for p in (mine, other):
            open(p, "wb").write(b"partial")
        w.commit([])
        assert not os.path.exists(mine)
        assert os.path.exists(other)

    def test_uncompressed_option(self, spark, warc_dir, tmp_path):
        register(spark)
        src = spark.read.format("warc").load(str(warc_dir / "in"))
        out = str(tmp_path / "plain")
        src.write.format("warc").option("compress", "false") \
            .mode("overwrite").save(out)
        segs = [n for n in os.listdir(out) if n.endswith(".warc")]
        assert segs and not [n for n in os.listdir(out)
                             if n.endswith(".warc.gz")]
        assert spark.read.format("warc").load(out).count() == 20


class TestStream:
    def test_incremental_directory_ingest(self, spark, tmp_path):
        register(spark)
        landing = str(tmp_path / "landing")
        os.makedirs(landing)
        write_warc_segments(_recs()[:10], landing, n_segments=2)
        ckpt, outp = str(tmp_path / "ckpt"), str(tmp_path / "sink")

        def drain():
            q = (spark.readStream.format("warc").load(landing)
                 .writeStream.format("parquet")
                 .option("path", outp).option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        drain()
        assert spark.read.parquet(outp).count() == 10
        # a new segment lands (later-sorting name, per the offset contract)
        stage = str(tmp_path / "stage")
        write_warc_segments(_recs()[10:], stage, n_segments=1)
        os.rename(os.path.join(stage, "segment-00000.warc.gz"),
                  os.path.join(landing, "segment-90000.warc.gz"))
        drain()
        df = spark.read.parquet(outp)
        assert df.count() == 20
        assert df.select("url").distinct().count() == 20
