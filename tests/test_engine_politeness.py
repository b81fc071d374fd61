"""S3 budgeted politeness admission: per round, a domain with effective delay
d ms gets at most floor(round_length_ms / d) fetches; deferred rows stay
pending and the crawl still converges to the same final page set."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine

ROOT = "http://polite.test/"


def write_corpus(tmp_path, n_children=20):
    """One root fanning out to n_children leaves on the same domain, plus a
    robots file demanding Crawl-delay: 20 (clamped to 5 s by config)."""
    links = "".join(f'<a href="/p{i}"></a>' for i in range(n_children))
    rows = [{"url": ROOT, "html": f"{links}root".encode(), "text": f"{links}root"}]
    for i in range(n_children):
        rows.append({"url": f"{ROOT}p{i}", "html": b"leaf", "text": "leaf"})
    pdf = pd.DataFrame([{
        "url": r["url"], "warc_ts": pd.Timestamp("2024-01-01"),
        "html": r["html"], "text": r["text"], "lang": "en",
        "status": 200, "content_type": "text/html",
        "content_length": len(r["html"]), "redirect_to": None} for r in rows])
    d = tmp_path / "corpus"
    d.mkdir()
    pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
        f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
        allow_truncated_timestamps=True)
    pdf[["url", "status", "content_type", "content_length", "redirect_to"]] \
        .to_parquet(f"{d}/corpus_meta.parquet", index=False)
    robots = pd.DataFrame([{"domain": "polite.test",
                            "robots_txt": "User-agent: *\nCrawl-delay: 20\n"}])
    robots.to_parquet(f"{d}/robots.parquet", index=False)
    return str(d)


def test_politeness_budget_defers_fetches(spark, tmp_path):
    # effective delay = clamp(20 s, MaxRobotsDotTextCrawlDelayInSeconds=5)
    # = 5000 ms; round_length 20_000 ms => budget = 4 fetches/round/domain
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      min_crawl_delay_per_domain_milli_seconds=1000,
                      round_length_ms=20_000)
    d = write_corpus(tmp_path)
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"),
                      robots_path=f"{d}/robots.parquet")
    eng.seed([ROOT])
    stats = eng.run(max_rounds=30, politeness=True)

    # every round fetches at most 4 pages of the domain
    assert all(s.fetched <= 4 for s in stats), [s.fetched for s in stats]
    # 21 pages at 4/round => at least 6 rounds
    assert len(stats) >= 6
    # completeness: every page still crawled exactly once
    rows = eng.store.read_events(spark, "crawled").collect()
    urls = sorted(r["url"] for r in rows)
    assert urls == sorted([ROOT] + [f"{ROOT}p{i}" for i in range(20)])


def test_politeness_unlimited_without_delay(spark, tmp_path):
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      round_length_ms=20_000)
    d = write_corpus(tmp_path)
    # no robots delay, no config min => delay 0 => unlimited budget
    import pandas as pd
    pd.DataFrame([{"domain": "polite.test",
                   "robots_txt": "User-agent: *\nDisallow:\n"}]) \
        .to_parquet(f"{d}/robots.parquet", index=False)
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state"),
                      robots_path=f"{d}/robots.parquet")
    eng.seed([ROOT])
    stats = eng.run(max_rounds=10, politeness=True)
    assert len(stats) == 2  # root, then all 20 children in one round
    assert stats[1].fetched == 20


def test_salted_admission_budget_exact_and_salt_invariant(spark, tmp_path):
    """Hot-domain skew salting (crawler.py: the (domain, salt) ranking
    window): shard budgets floor(B/s) + remainder must sum to EXACTLY the
    domain budget while the backlog lasts, and the crawl outcome must be
    independent of the salt fan-out (salting is a physical-plan choice, not
    a semantic one)."""
    # delay = clamp(20 s, 5 s) = 5000 ms; round 40_000 ms => budget 8/round
    def run(salt, store):
        cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                          min_crawl_delay_per_domain_milli_seconds=1000,
                          round_length_ms=40_000, skew_salt=salt)
        base = tmp_path / f"c{salt}"
        base.mkdir()
        d = write_corpus(base, n_children=40)
        eng = CrawlEngine(spark, cfg,
                          corpus_path=f"{d}/corpus.parquet",
                          corpus_meta_path=f"{d}/corpus_meta.parquet",
                          store_root=str(tmp_path / store),
                          robots_path=f"{d}/robots.parquet")
        eng.seed([ROOT])
        stats = eng.run(max_rounds=30, politeness=True)
        crawled = sorted(r["url"] for r in
                         eng.store.read_events(spark, "crawled").collect())
        return [s.fetched for s in stats], crawled

    fetched8, crawled8 = run(8, "s8")
    fetched1, crawled1 = run(1, "s1")

    # full-budget utilization: while the 40-leaf backlog lasts, the salted
    # shards must admit exactly 8 (no under-admission from shard splits)
    assert fetched8[0] == 1  # seed round
    assert fetched8[1:6] == [8, 8, 8, 8, 8], fetched8
    # salt fan-out never changes per-round counts or the final page set
    assert fetched8 == fetched1
    assert crawled8 == crawled1
    assert len(crawled8) == 41


def test_config_min_delay_applies_without_robots(spark, tmp_path):
    """A domain with NO robots row (robots disabled entirely here) must
    still be paced by min_crawl_delay_per_domain_milli_seconds + 20 ms —
    DomainRateLimiter covers every domain, not just robots-covered ones."""
    d = write_corpus(tmp_path)
    # no robots_path at all; delay = 4980+20 = 5000 ms; W=20 s => budget 4
    cfg = CrawlConfig(min_crawl_delay_per_domain_milli_seconds=4980,
                      round_length_ms=20_000)
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state_norobots"))
    eng.seed([ROOT])
    stats = eng.run(max_rounds=30, politeness=True)
    assert all(s.fetched <= 4 for s in stats), [s.fetched for s in stats]
    assert sum(s.fetched for s in stats) == 21   # converges to full set


def test_slow_domain_paces_instead_of_starving(spark, tmp_path):
    """Effective delay > round window: the old floor(W/delay)=0 budget
    starved the domain forever (empty rounds to max_rounds); now it gets 1
    page every ceil(delay/W) rounds."""
    d = write_corpus(tmp_path, n_children=4)
    # robots Crawl-delay 20 s unclamped (max=0 disables the clamp),
    # W = 10 s => k = 2: one fetch every 2 rounds
    cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True,
                      max_robots_dot_text_crawl_delay_in_seconds=0,
                      round_length_ms=10_000)
    eng = CrawlEngine(spark, cfg,
                      corpus_path=f"{d}/corpus.parquet",
                      corpus_meta_path=f"{d}/corpus_meta.parquet",
                      store_root=str(tmp_path / "state_slow"),
                      robots_path=f"{d}/robots.parquet")
    eng.seed([ROOT])
    stats = eng.run(max_rounds=30, politeness=True)
    assert all(s.fetched <= 1 for s in stats), [s.fetched for s in stats]
    assert sum(s.fetched for s in stats) == 5    # root + 4 leaves, all done
    # paced, not starved: finished well before max_rounds but took >= 2x
    # the page count in rounds (1 fetch per k=2 rounds)
    assert 9 <= len(stats) <= 12, len(stats)
