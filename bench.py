#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two benchmark families:

1. Headline analytics queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
   (default /root/testdata/sf0.1): relational core, dedup, similarity,
   text analysis. Per-query wall seconds in "queries".

2. The authoritative BASELINE.json metric: URLs fetched+deduped per second
   per crawl round, on a deterministic synthetic Common-Crawl-style corpus
   (hot-domain skew + dup links per FIXTURES.md F6). Reported as
   "crawl_urls_per_sec" inside "queries" and summarized in "crawl".

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default: all cores)
  BENCH_CRAWL_PAGES    synthetic crawl corpus size (default 120000)
  BENCH_SKIP_CRAWL=1   skip the crawl benchmark (headline queries only)

The N-vs-4N scaling-efficiency evidence (north_rule) is produced by
bench_scaling.py, which runs this crawl benchmark at two parallelism levels
in separate JVMs and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


HEADLINE = [
    "image_decode", "jpeg_decode", "image_resize", "audio_decode",
    "video_decode", "g711_decode", "adpcm_decode", "frame_sample",
    "bpe_encode", "unigram_encode",
    "tpch_q1", "tpch_q3", "running_window", "rollup_agg",
    "exact_dedup", "minhash_signatures", "neardup_pairs",
    "neardup_components", "contamination", "substring_dedup",
    "cosine_topk", "cosine_topk_lsh",
    "stratified_sample", "pack_sequences", "training_mix", "dsir_weights",
    "token_stats", "quality_scores", "lang_id", "fingerprint",
    "length_quantiles", "script_profile",
    "inverted_index", "tfidf_topk", "bigram_lm",
    "gopher_repetition", "line_dedup", "span_dedup", "fix_mojibake",
    "boilerplate_blocks", "main_content", "anchor_text", "sitemap_extract",
    "url_shape", "trap_signals", "registered_domain", "cdx_index", "host_graph", "host_degrees",
    "web_pipeline", "frontier_priority",
    "badwords_filter", "quality_classifier", "perplexity_buckets",
    "gopher_quality", "quality_cascade", "kmv_distinct", "cms_heavy_hitters",
    "semdedup", "vocab_topk", "bpe_merges", "bpe_compression", "chunk_documents", "mixture_weights",
    "url_keep_latest", "recrawl_schedule", "events_asof", "events_interval",
    "events_tumbling", "events_sessions",
    "seen_antijoin", "url_hash64", "frontier_bfs", "pagerank",
    "host_pagerank", "host_hits", "host_components",
    "winnow_fingerprints", "winnow_pairs", "dataset_split", "hll_distinct",
    "phrase_search", "index_merge", "cdx_lookup", "host_triangles", "host_kcore",
    "capture_stats", "url_variants", "dedup_recall", "segment_langs",
    "window_funcs", "cube_agg", "bloom_fpr", "redirect_resolve", "nepotism",
    "trustrank", "host_communities",
    "bm25_search", "readability", "hyperball", "neighborhood_fn",
    "spam_mass", "containment_pairs", "events_funnel", "events_retention",
    "corpus_report", "crawl_budget", "proximity_search",
]


def _best2_spread(vals: list[float], lower_is_better: bool) -> float:
    """Relative disagreement between the BEST TWO samples (not all
    accumulated trials): one early steal-contaminated outlier must not
    keep triggering retrial purchases after later trials converge."""
    if len(vals) < 2:
        return 0.0
    s = sorted(vals, reverse=not lower_is_better)
    best, second = s[0], s[1]
    return abs(second - best) / max(abs(best), 1e-9)


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], dict]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    # JIT warmup: exercise codegen/shuffle/parquet-scan paths once so the
    # first measured query isn't charged the fresh-JVM compile constant
    # (same rationale as warmup_crawl; tpch_q1 was absorbing ~8 s of it)
    from pyspark.sql import functions as F
    spark.range(2_000_000).groupBy((F.col("id") % 97).alias("k")) \
        .count().orderBy("k").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .groupBy("l_returnflag").count().collect()

    def run_one(name: str) -> float:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        assert n >= 0
        return round(time.time() - t0, 3)

    # Steal-proofing: single-shot timings on a shared box showed phantom
    # ~3-8x regressions in code byte-unchanged across rounds (dedup_recall
    # 14.9 s vs 6.4 quiet-box; an hll_distinct first pass measured 5.0 s
    # vs 0.6 s true during one documented steal window). Every query gets
    # best-of-2 with the second pass ROTATED by half the suite, so each
    # query's two samples are ~half a suite apart in wall time and no
    # steal window can cover both (a reversed second pass was tried first
    # and failed exactly at the suite's last entry, whose two samples ran
    # back-to-back: proximity_search measured 2.56/2.81 s in-suite vs
    # 0.73 s isolated). The top-K by cost buy extra trials while their
    # best two samples still disagree >15%. The noise source is competing
    # load, which only ever slows a trial down, so min is the code's time.
    trials = {name: [run_one(name)] for name in HEADLINE}
    half = len(HEADLINE) // 2
    for name in HEADLINE[half:] + HEADLINE[:half]:
        trials[name].append(run_one(name))
    top_k = int(os.environ.get("BENCH_QUERY_RETRY_TOPK", "12"))
    max_t = int(os.environ.get("BENCH_QUERY_MAX_TRIALS", "4"))
    expensive = sorted(HEADLINE, key=lambda n: min(trials[n]),
                       reverse=True)[:top_k]
    retrials = {}
    for name in expensive:
        while (len(trials[name]) < max_t
               and _best2_spread(trials[name], True) > 0.15):
            trials[name].append(run_one(name))
        retrials[name] = {"trials": trials[name],
                          "spread": round(_best2_spread(trials[name], True),
                                          3)}
    out = {n: min(ts) for n, ts in trials.items()}
    return out, retrials


def warmup_crawl(spark, workdir: str) -> None:
    """One small throwaway crawl before timing: the first ~60 s of a fresh
    JVM is JIT-compilation-bound (codegen, shuffle, Arrow paths), which
    would otherwise be charged to the first measured rounds and swamp the
    N-vs-4N comparison with a constant that no real cluster pays at
    steady state."""
    from abot_dotnet_core_spark.config import CrawlConfig
    from abot_dotnet_core_spark.crawler import CrawlEngine
    from abot_dotnet_core_spark.sources.corpus import (
        CorpusSpec, domain_name, generate_spark)
    spec = CorpusSpec(n_pages=20_000, n_domains=50, hot_domain_share=0.3,
                      body_repeat=2, error_rate=0.12, branching=8)
    corpus_dir = os.path.join(workdir, "warmup_corpus")
    if not os.path.exists(os.path.join(corpus_dir, "_GENERATED")):
        # sentinel written last by generate_spark; a killed run leaves a
        # partial dir (possibly with corpus.parquet/_SUCCESS but missing
        # meta/robots/seeds) which must be regenerated wholesale
        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_spark(spark, spec, corpus_dir,
                       partitions=spark.sparkContext.defaultParallelism)
    state_dir = os.path.join(workdir, "warmup_state")
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = CrawlConfig(max_pages_to_crawl=0,
                      is_external_page_crawling_enabled=True,
                      is_external_page_links_crawling_enabled=True,
                      is_respect_robots_dot_text_enabled=True,
                      extract_impl=os.environ.get("BENCH_EXTRACT_IMPL",
                                                  "arrow"))
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{corpus_dir}/corpus.parquet",
                      corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
                      store_root=state_dir,
                      robots_path=f"{corpus_dir}/robots.parquet")
    eng.seed([f"http://{domain_name(i)}/" for i in range(spec.n_domains)])
    eng.run(max_rounds=4)
    shutil.rmtree(state_dir, ignore_errors=True)


def bench_crawl(spark, n_pages: int, workdir: str,
                body_repeat: int = 4, warmup: bool = True,
                politeness: bool = False, max_rounds: int = 30) -> dict:
    """The BASELINE metric: urls (fetched + deduped links) per second,
    measured across full crawl rounds on the skewed synthetic corpus.

    body_repeat sizes the html payload (~650 B per repeat) — scaling evidence
    uses a corpus where the per-round extract/hash/anti-join compute dominates
    the per-round fixed cost, which is the regime the 10^10-URL target lives
    in (tiny rounds are scheduling-overhead-bound on ANY core count)."""
    from abot_dotnet_core_spark.config import CrawlConfig
    from abot_dotnet_core_spark.crawler import CrawlEngine
    from abot_dotnet_core_spark.sources.corpus import (
        CorpusSpec, domain_name, generate_spark)

    if warmup:
        warmup_crawl(spark, workdir)

    spec = CorpusSpec(n_pages=n_pages, n_domains=max(n_pages // 100, 4),
                      hot_domain_share=0.3, body_repeat=body_repeat,
                      error_rate=0.12, branching=8)
    corpus_dir = os.path.join(workdir, f"corpus_{n_pages}_b{body_repeat}")
    if not os.path.exists(os.path.join(corpus_dir, "_GENERATED")):
        # sentinel written last by generate_spark; a killed run leaves a
        # partial dir (possibly with corpus.parquet/_SUCCESS but missing
        # meta/robots/seeds) which must be regenerated wholesale
        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_spark(spark, spec, corpus_dir,
                       partitions=spark.sparkContext.defaultParallelism * 2)

    state_dir = os.path.join(workdir, "state")
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = CrawlConfig(max_pages_to_crawl=0,
                      is_external_page_crawling_enabled=True,
                      is_external_page_links_crawling_enabled=True,
                      is_respect_robots_dot_text_enabled=True,
                      extract_impl=os.environ.get("BENCH_EXTRACT_IMPL",
                                                  "arrow"))
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{corpus_dir}/corpus.parquet",
                      corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
                      store_root=state_dir,
                      robots_path=f"{corpus_dir}/robots.parquet")
    seeds = [f"http://{domain_name(i)}/" for i in range(spec.n_domains)]
    t0 = time.time()
    eng.seed(seeds)
    stats = eng.run(max_rounds=max_rounds, politeness=politeness)
    dt = time.time() - t0
    fetched = sum(s.fetched for s in stats)
    links = sum(s.links_extracted for s in stats)
    deduped = sum(s.deduped for s in stats)
    per_round = [{"round": s.round, "fetched": s.fetched,
                  "links": s.links_extracted, "sec": s.wall_sec,
                  "urls_per_sec": round((s.fetched + s.links_extracted)
                                        / max(s.wall_sec, 1e-9), 1)}
                 for s in stats]
    # steady-state throughput: the heaviest round is the 10^10-scale regime
    # (early rounds are seed ramp-up, a constant that vanishes at scale)
    peak = max(per_round, key=lambda x: x["fetched"] + x["links"])
    return {
        "rounds": len(stats),
        "fetched": fetched,
        "links_extracted": links,
        "links_deduped": deduped,
        "sec": round(dt, 2),
        "urls_per_sec": round((fetched + links) / dt, 1),
        "peak_round": peak,
        "peak_round_urls_per_sec": peak["urls_per_sec"],
        "per_round": per_round,
    }


def bench_crawl_mega(spark, n_pages: int, workdir: str,
                     body_repeat: int = 32, warmup: bool = True,
                     politeness: bool = False, max_rounds: int = 2) -> dict:
    """The 10^10-frontier-style regime the BASELINE metric names: ONE round
    over a frontier holding the whole corpus (steady-state/recrawl shape),
    instead of the multi-round BFS ramp-up from seeds. Fetch + extract +
    link-dedup volume per round is maximal; per-round driver turnaround is
    amortized exactly as it would be on a real cluster where every round is
    heavy. Seeding (distributed normalize/hash/rank of the frontier) is not
    timed — the metric is per-round throughput."""
    import time
    from abot_dotnet_core_spark.config import CrawlConfig
    from abot_dotnet_core_spark.crawler import CrawlEngine
    from abot_dotnet_core_spark.sources.corpus import CorpusSpec, generate_spark

    if warmup:
        warmup_crawl(spark, workdir)
    spec = CorpusSpec(n_pages=n_pages, n_domains=max(n_pages // 100, 4),
                      hot_domain_share=0.3, body_repeat=body_repeat,
                      error_rate=0.12, branching=8)
    corpus_dir = os.path.join(workdir, f"corpus_{n_pages}_b{body_repeat}")
    if not os.path.exists(os.path.join(corpus_dir, "_GENERATED")):
        # sentinel written last by generate_spark; a killed run leaves a
        # partial dir (possibly with corpus.parquet/_SUCCESS but missing
        # meta/robots/seeds) which must be regenerated wholesale
        shutil.rmtree(corpus_dir, ignore_errors=True)
        generate_spark(spark, spec, corpus_dir,
                       partitions=spark.sparkContext.defaultParallelism * 2)
    state_dir = os.path.join(workdir, "state_mega")
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = CrawlConfig(max_pages_to_crawl=0,
                      is_external_page_crawling_enabled=True,
                      is_external_page_links_crawling_enabled=True,
                      is_respect_robots_dot_text_enabled=True,
                      extract_impl=os.environ.get("BENCH_EXTRACT_IMPL",
                                                  "arrow"))
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{corpus_dir}/corpus.parquet",
                      corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
                      store_root=state_dir,
                      robots_path=f"{corpus_dir}/robots.parquet")
    urls = spark.read.parquet(f"{corpus_dir}/corpus_meta.parquet").select("url")
    eng.seed_from_frontier(urls)
    t0 = time.time()
    stats = eng.run(max_rounds=max_rounds, politeness=politeness)
    dt = time.time() - t0
    per_round = [{"round": s.round, "fetched": s.fetched,
                  "links": s.links_extracted, "sec": s.wall_sec,
                  "urls_per_sec": round((s.fetched + s.links_extracted)
                                        / max(s.wall_sec, 1e-9), 1)}
                 for s in stats]
    total_urls = sum(r["fetched"] + r["links"] for r in per_round)
    peak = max(per_round, key=lambda x: x["fetched"] + x["links"])
    return {
        "rounds": len(stats),
        "fetched": sum(s.fetched for s in stats),
        "links_extracted": sum(s.links_extracted for s in stats),
        "links_deduped": sum(s.deduped for s in stats),
        "sec": round(dt, 2),
        "urls_per_sec": round(total_urls / dt, 1),
        "peak_round": peak,
        "peak_round_urls_per_sec": peak["urls_per_sec"],
        "per_round": per_round,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from abot_dotnet_core_spark.session import get_spark
    spark = get_spark("bench", cpus=cpus, shuffle_partitions=max(cpus, 8))

    queries, query_retrials = bench_queries(spark, sf_dir)

    crawl = {}
    if os.environ.get("BENCH_SKIP_CRAWL") != "1":
        n_pages = int(os.environ.get("BENCH_CRAWL_PAGES", "120000"))
        # best-of-N INTERLEAVED trials (default, polite, default, polite,
        # ...) so the reported crawl number reflects code, not shared-box
        # weather: r02->r03 the single-shot driver artifact moved -8.9%
        # while an interleaved local rerun moved -1.8%. The corpus is
        # cached after trial 1 and each trial resets its own state dir;
        # best (not mean) is reported because the noise source is
        # competing load, which only ever slows a trial down.
        trials = max(int(os.environ.get("BENCH_CRAWL_TRIALS", "2")), 1)
        # when the interleaved trials still disagree badly the box is
        # under sustained steal — buy up to MAX_TRIALS extra samples so
        # best-of-N has a chance to land in a quiet window
        max_trials = max(int(os.environ.get("BENCH_CRAWL_MAX_TRIALS",
                                            "4")), trials)

        def spread(rs):
            # best-two spread (not max-vs-min over all trials): one early
            # steal-contaminated sample must not force MAX_TRIALS after
            # later trials converge — best-of-N reporting is unaffected
            return _best2_spread([c["urls_per_sec"] for c in rs], False)

        runs, polite_runs = [], []
        t = 0
        while t < trials or (t < max_trials
                             and max(spread(runs),
                                     spread(polite_runs)) > 0.10):
            runs.append(bench_crawl(spark, n_pages, "/root/repo/.bench",
                                    warmup=(t == 0)))
            # politeness path: budgeted per-domain admission + robots delays
            polite_runs.append(bench_crawl(
                spark, min(n_pages, 60_000), "/root/repo/.bench",
                warmup=False, politeness=True, max_rounds=12))
            t += 1
        best = max(runs, key=lambda c: c["urls_per_sec"])
        polite_best = max(polite_runs, key=lambda c: c["urls_per_sec"])
        queries["crawl_urls_per_sec"] = best["urls_per_sec"]
        queries["crawl_total_sec"] = best["sec"]
        queries["crawl_polite_urls_per_sec"] = polite_best["urls_per_sec"]
        queries["crawl_polite_total_sec"] = polite_best["sec"]
        crawl = {"default": best, "polite": polite_best,
                 "trials": {
                     "default_urls_per_sec": [c["urls_per_sec"]
                                              for c in runs],
                     "polite_urls_per_sec": [c["urls_per_sec"]
                                             for c in polite_runs]}}

    total = round(sum(v for k, v in queries.items()
                      if not k.endswith("_urls_per_sec")), 3)

    # the driver parses ONE stdout JSON line and truncates long output —
    # keep the printed object small (no per-round arrays; full detail goes
    # to .bench/BENCH_DETAIL.json for humans)
    def slim(c: dict) -> dict:
        return {k: v for k, v in c.items() if k not in ("per_round",
                                                        "peak_round")}

    detail_path = "/root/repo/.bench/BENCH_DETAIL.json"
    try:
        os.makedirs(os.path.dirname(detail_path), exist_ok=True)
        with open(detail_path, "w") as f:
            json.dump({"queries": queries, "query_retrials": query_retrials,
                       "crawl": crawl, "cpus": cpus}, f, indent=1)
    except OSError:
        pass
    print(json.dumps({
        "metric": "headline suite wall time (incl. crawl rounds) at "
                  f"local[{cpus}]; crawl throughput in queries.crawl_urls_per_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl": {k: slim(v) for k, v in crawl.items()},
        "query_retrials": query_retrials,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
