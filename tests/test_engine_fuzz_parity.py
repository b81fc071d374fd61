"""Randomized engine-vs-simulator parity fuzz.

The hand-picked parity configs in test_engine_parity.py each pin one
reference behavior. This file sweeps the *joint* space: a deterministic
seeded sampler draws a random CorpusSpec (site shape, charset mix, error
wheel, nofollow headers) and a random CrawlConfig (depth / budget /
per-domain / per-page caps, robots + all three nofollow families, retries,
externals, recrawl, forced parsing, redirect limit, page-size cap) and
asserts the Spark engine reproduces the single-threaded reference
simulator exactly — crawl order, statuses, retries, seen set, disallowed
multiset. Interactions the targeted tests can't cover (e.g. a retry that
is also the per-domain cap's marginal admission while MaxLinksPerPage
truncates its parent) fall out of the sweep.

Deterministic: every draw comes from random.Random(case_seed); no
test-order or wall-clock dependence, so failures replay exactly.
"""

import random

import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.kernel.robots import parse_robots
from abot_dotnet_core_spark.kernel.simulator import CrawlSimulator
from abot_dotnet_core_spark.sources.corpus import (
    CorpusSpec, domain_name, robots_txt_for, to_simulator_corpus,
    write_parquet,
)

SEED_URL = "http://d0.test/"


def draw_case(case_seed: int) -> tuple[CorpusSpec, CrawlConfig]:
    rng = random.Random(0xF022 + case_seed)
    spec = CorpusSpec(
        n_pages=rng.randrange(40, 110),
        n_domains=rng.randrange(2, 7),
        branching=rng.randrange(2, 6),
        hot_domain_share=rng.choice([0.0, 0.0, 0.4]),
        dup_link_rate=rng.choice([0.0, 0.3, 0.6]),
        cross_link_rate=rng.choice([0.0, 0.15, 0.4]),
        charset_1251_rate=rng.choice([0.0, 0.1]),
        header_only_1251_rate=rng.choice([0.0, 0.2]),
        x_robots_nofollow_rate=rng.choice([0.0, 0.25]),
        retry_after_rate=rng.choice([0.0, 0.5]),
        error_rate=rng.choice([0.3, 0.7, 1.0]),
        body_repeat=2,
        seed=1000 + case_seed,
    )
    cfg = CrawlConfig(
        max_crawl_depth=rng.choice([2, 3, 5, 100]),
        max_pages_to_crawl=rng.choice([15, 40, 1000]),
        max_pages_to_crawl_per_domain=rng.choice([0, 0, 4, 12]),
        max_links_per_page=rng.choice([0, 0, 3, 8]),
        max_page_size_in_bytes=rng.choice([0, 0, 2500]),
        max_retry_count=rng.choice([0, 1, 2]),
        http_request_max_auto_redirects=rng.choice([1, 3, 7]),
        is_external_page_crawling_enabled=rng.random() < 0.3,
        is_external_page_links_crawling_enabled=rng.random() < 0.3,
        is_respect_robots_dot_text_enabled=rng.random() < 0.5,
        is_ignore_robots_dot_text_if_root_disallowed_enabled=rng.random() < 0.3,
        is_respect_meta_robots_no_follow_enabled=rng.random() < 0.4,
        is_respect_http_x_robots_tag_header_no_follow_enabled=rng.random() < 0.4,
        is_respect_anchor_rel_no_follow_enabled=rng.random() < 0.4,
        is_uri_recrawling_enabled=rng.random() < 0.2,
        is_forced_link_parsing_enabled=rng.random() < 0.2,
        is_respect_url_named_anchor_or_hashbang_enabled=rng.random() < 0.2,
        # drawn LAST (keeps earlier cases' draws stable): threshold 1 forces
        # the range-partitioned cumulative-sum P4 path instead of
        # TakeOrdered+window whenever the budget cut fires
        budget_topk_threshold=rng.choice([1, 4_000_000, 4_000_000]),
        # 0 forces the big-round fetch regime (bloom scan-pushdown +
        # extraction on the corpus scan) for every round
        fetch_broadcast_threshold=rng.choice([0, 200_000]),
        # compact the seen table mid-crawl
        seen_compact_every=rng.choice([2, 8]),
    )
    # appended AFTER the original draws (keeps seeds 0..N stable): S4 config
    # knobs — a config retry delay (with no Retry-After header needed) and a
    # shorter round window change how many rounds a deferral spans and which
    # rows the blocking cut holds back
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        min_retry_delay_in_milliseconds=rng.choice([0, 0, 45_000, 90_000]),
        round_length_ms=rng.choice([60_000, 60_000, 30_000]),
        hyperlink_parser=rng.choice(["hap", "hap", "anglesharp"]))
    return spec, cfg


def engine_kwargs(case_seed: int) -> dict:
    # bloom-prefilter sidecar on for half the cases (orthogonal rng so the
    # CrawlConfig draws stay stable)
    return {"bloom_prefilter": random.Random(0xB100 + case_seed).random() < 0.5}


def draw_delegates(case_seed: int):
    """User-delegate fuzz dimension (VERDICT r02 task 9): half the cases run
    a random delegate drawn from a deterministic family — URL-token vetoes
    on each of the four page/link/download surfaces, plus a combined
    depth-gate + recrawl-veto case. Orthogonal rng (0xDE7E) so the existing
    pinned seeds' CorpusSpec/CrawlConfig draws are untouched; parity holds
    because the SAME CrawlDelegates drives both the engine and the
    simulator oracle."""
    rng = random.Random(0xDE7E + case_seed)
    if rng.random() < 0.5:
        return None
    from abot_dotnet_core_spark.operators.delegates import CrawlDelegates
    tok = f"p{rng.randrange(1, 9)}"
    which = rng.randrange(5)
    if which == 0:
        return CrawlDelegates(
            should_crawl_page=lambda url, depth, is_internal, t=tok:
                ~url.str.contains(t, regex=False))
    if which == 1:
        return CrawlDelegates(
            should_schedule_link=lambda src, dst, t=tok:
                ~dst.str.contains(t, regex=False))
    if which == 2:
        return CrawlDelegates(
            should_crawl_page_links=lambda url, depth, is_internal, t=tok:
                ~url.str.endswith("/" + t))
    if which == 3:
        return CrawlDelegates(
            should_download_page_content=lambda url, status, ct, t=tok:
                ~url.str.endswith("/" + t))
    return CrawlDelegates(
        should_crawl_page=lambda url, depth, is_internal: depth <= 3,
        should_recrawl_page=lambda url, status, rc: rc < 1)


def draw_polite_delegates(case_seed: int):
    """Polite-mode delegate draw: only the URL-token veto families — their
    effect is a pure function of the URL, so the crawled/seen/disallowed
    SETS stay order-invariant and the FIFO simulator remains a valid
    oracle. The depth-gate family is excluded: first-discovery depth
    legitimately differs when admission is deferred."""
    rng = random.Random(0xD0117E + case_seed)
    if rng.random() < 0.5:
        return None
    from abot_dotnet_core_spark.operators.delegates import CrawlDelegates
    tok = f"p{rng.randrange(1, 9)}"
    which = rng.randrange(4)
    if which == 0:
        return CrawlDelegates(
            should_crawl_page=lambda url, depth, is_internal, t=tok:
                ~url.str.contains(t, regex=False))
    if which == 1:
        return CrawlDelegates(
            should_schedule_link=lambda src, dst, t=tok:
                ~dst.str.contains(t, regex=False))
    if which == 2:
        return CrawlDelegates(
            should_crawl_page_links=lambda url, depth, is_internal, t=tok:
                ~url.str.endswith("/" + t))
    return CrawlDelegates(
        should_download_page_content=lambda url, status, ct, t=tok:
            ~url.str.endswith("/" + t))


def simulator_result(spec: CorpusSpec, cfg: CrawlConfig, delegates=None):
    corpus = to_simulator_corpus(spec)
    robots_map = {}
    if cfg.is_respect_robots_dot_text_enabled:
        for i in range(spec.n_domains):
            txt = robots_txt_for(spec, i)
            if txt is not None:
                robots_map[f"http://{domain_name(i)}/"] = parse_robots(txt)
    return CrawlSimulator(corpus, cfg, robots_map,
                          delegates=delegates).crawl(SEED_URL)


def draw_polite_case(case_seed: int) -> tuple[CorpusSpec, CrawlConfig]:
    """Politeness-mode draw: budget caps and per-parent link cuts are OFF
    because they are legitimately order-sensitive (politeness reorders
    admission, which changes which link hits a cap first) — with them off,
    the crawled SET, seen set and disallowed multiset are order-invariant
    and the FIFO simulator remains a valid oracle for all three."""
    rng = random.Random(0xB017E + case_seed)
    spec = CorpusSpec(
        n_pages=rng.randrange(40, 90),
        n_domains=rng.randrange(2, 6),
        branching=rng.randrange(2, 6),
        dup_link_rate=rng.choice([0.0, 0.4]),
        cross_link_rate=rng.choice([0.0, 0.3]),
        header_only_1251_rate=rng.choice([0.0, 0.2]),
        x_robots_nofollow_rate=rng.choice([0.0, 0.25]),
        retry_after_rate=rng.choice([0.0, 0.5]),
        error_rate=rng.choice([0.3, 1.0]),
        body_repeat=2,
        seed=2000 + case_seed,
    )
    cfg = CrawlConfig(
        max_pages_to_crawl=100_000,
        max_retry_count=rng.choice([0, 2]),
        min_crawl_delay_per_domain_milli_seconds=rng.choice([0, 700, 2000]),
        round_length_ms=15_000,
        is_external_page_crawling_enabled=True,
        is_external_page_links_crawling_enabled=True,
        is_respect_robots_dot_text_enabled=rng.random() < 0.6,
        is_respect_meta_robots_no_follow_enabled=rng.random() < 0.4,
        is_respect_http_x_robots_tag_header_no_follow_enabled=rng.random() < 0.4,
        is_respect_anchor_rel_no_follow_enabled=rng.random() < 0.4,
    )
    return spec, cfg


@pytest.mark.parametrize("case_seed", range(14))
def test_fuzz_parity(spark, tmp_path, case_seed):
    spec, cfg = draw_case(case_seed)
    dg = draw_delegates(case_seed)
    d = tmp_path / "corpus"
    write_parquet(spec, str(d), with_edges=False)
    sim = simulator_result(spec, cfg, delegates=dg)

    eng = CrawlEngine(
        spark, cfg,
        corpus_path=f"{d}/corpus.parquet",
        corpus_meta_path=f"{d}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"),
        robots_path=f"{d}/robots.parquet",
        delegates=dg,
        **engine_kwargs(case_seed),
    )
    eng.seed([SEED_URL])
    eng.run(max_rounds=120)

    rows = eng.store.read_events(spark, "crawled").orderBy("crawl_order") \
        .collect()
    got = [(r["url"], r["status"], r["depth"], r["is_retry"],
            r["retry_count"]) for r in rows]
    want = [(c.url, c.status, c.depth, c.is_retry, c.retry_count)
            for c in sim.crawled]
    assert got == want, (
        f"case {case_seed}: crawl order mismatch\n"
        f"spec={spec}\ncfg={cfg}\n got={got[:12]}\nwant={want[:12]}\n"
        f"len got={len(got)} want={len(want)}")

    eng_seen = {r["url_hash"] for r in eng._read_seen().collect()}
    assert eng_seen == sim.seen_hashes(), f"case {case_seed}: seen-set"

    dis = eng.store.read_events(spark, "disallowed").collect()
    got_dis = sorted((r["url"], r["reason"]) for r in dis)
    want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                      if e.stage in ("links", "schedule"))
    assert got_dis == want_dis, f"case {case_seed}: disallowed multiset"


@pytest.mark.parametrize("case_seed", range(6))
def test_fuzz_politeness_invariants(spark, tmp_path, case_seed):
    """Politeness-mode sweep: admission order changes, the crawl's OUTCOME
    must not. Crawled (url, status, is_retry, retry_count) multiset, seen
    set and disallowed multiset all equal the FIFO simulator's (depth is
    excluded: the first-discovery parent can legitimately differ when
    admission is deferred)."""
    spec, cfg = draw_polite_case(case_seed)
    dg = draw_polite_delegates(case_seed)
    d = tmp_path / "corpus"
    write_parquet(spec, str(d), with_edges=False)
    sim = simulator_result(spec, cfg, delegates=dg)

    eng = CrawlEngine(
        spark, cfg,
        corpus_path=f"{d}/corpus.parquet",
        corpus_meta_path=f"{d}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"),
        robots_path=f"{d}/robots.parquet",
        delegates=dg,
    )
    eng.seed([SEED_URL])
    eng.run(max_rounds=300, politeness=True)

    rows = eng.store.read_events(spark, "crawled").collect()
    got = sorted((r["url"], r["status"], r["is_retry"], r["retry_count"])
                 for r in rows)
    want = sorted((c.url, c.status, c.is_retry, c.retry_count)
                  for c in sim.crawled)
    assert got == want, (
        f"case {case_seed}: crawled multiset\nspec={spec}\ncfg={cfg}\n"
        f"only got={sorted(set(got) - set(want))[:8]}\n"
        f"only want={sorted(set(want) - set(got))[:8]}")

    eng_seen = {r["url_hash"] for r in eng._read_seen().collect()}
    assert eng_seen == sim.seen_hashes(), f"case {case_seed}: seen-set"

    dis = eng.store.read_events(spark, "disallowed").collect()
    got_dis = sorted((r["url"], r["reason"]) for r in dis)
    want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                      if e.stage in ("links", "schedule"))
    assert got_dis == want_dis, f"case {case_seed}: disallowed multiset"
