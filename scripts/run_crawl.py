#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Usage (the north_rule shipping mode):

    scripts/package.sh          # builds dist/abot_dotnet_core_spark.zip
    spark-submit \\
        --py-files dist/abot_dotnet_core_spark.zip \\
        scripts/run_crawl.py \\
        --corpus-dir /data/corpus --store /data/crawl_state \\
        --seeds http://d0.test/ http://d1.test/ \\
        --max-rounds 100 --politeness \\
        --config '{"max_pages_to_crawl": 0, "is_respect_robots_dot_text_enabled": true}'

On a cluster, add --master/--num-executors as usual; the engine only sees the
SparkSession. Resume a killed crawl by re-running with the same --store
(--resume): the engine restarts from the last committed snapshot.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus-dir", required=True,
                    help="dir holding corpus.parquet / corpus_meta.parquet / robots.parquet")
    ap.add_argument("--store", required=True, help="state-store root")
    ap.add_argument("--seeds", nargs="+", default=[])
    ap.add_argument("--max-rounds", type=int, default=1000)
    ap.add_argument("--politeness", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--config", default="{}", help="CrawlConfig overrides (JSON)")
    ap.add_argument("--archive", default=None, metavar="DIR",
                    help="after the crawl, ship the crawled pages as the "
                         "Common-Crawl artifact quad (WARC with revisit "
                         "dedup + WAT + WET + CDX) into DIR")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("sparkcrawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from abot_dotnet_core_spark.config import CrawlConfig
    from abot_dotnet_core_spark.crawler import CrawlEngine

    cfg = CrawlConfig(**json.loads(args.config))
    kwargs = dict(
        corpus_path=f"{args.corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{args.corpus_dir}/corpus_meta.parquet",
        store_root=args.store,
        robots_path=f"{args.corpus_dir}/robots.parquet",
    )
    if args.resume:
        eng = CrawlEngine.resume(spark, cfg, **kwargs)
    else:
        eng = CrawlEngine(spark, cfg, **kwargs)
        eng.seed(args.seeds)
    stats = eng.run(max_rounds=args.max_rounds, politeness=args.politeness)
    summary = {
        "rounds": len(stats),
        "fetched": sum(s.fetched for s in stats),
        "links": sum(s.links_extracted for s in stats),
        "deduped": sum(s.deduped for s in stats),
        "admitted": sum(s.admitted for s in stats),
        "crawled_total": eng.crawled_count,
        "last_round": eng.round,
    }
    if args.archive:
        man = eng.archive(args.archive)
        summary["archive"] = {
            "warc_records": sum(m["n_records"] for m in man["warc"]),
            "wat_records": sum(m["n_records"] for m in man["wat"]),
            "wet_records": sum(m["n_records"] for m in man["wet"]),
            "cdx_rows": man["cdx_rows"],
        }
    print(json.dumps(summary))


if __name__ == "__main__":
    sys.exit(main())
