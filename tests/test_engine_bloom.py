"""Engine with the Bloom prefilter on must produce identical results to the
exact-only path (the sidecar is a pre-filter, never a decider)."""

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine

SEED = "http://d0.test/"


def run(spark, corpus_dir, tmp, bloom):
    eng = CrawlEngine(
        spark, CrawlConfig(),
        corpus_path=f"{corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
        store_root=str(tmp / ("b" if bloom else "x") / "state"),
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
