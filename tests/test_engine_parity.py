"""End-to-end parity: the Spark CrawlEngine must reproduce the single-threaded
reference simulator exactly — crawl order, decision outcomes, seen-set and
byte-identical extracted text — on the same corpus + config + seed.
"""

import dataclasses
import hashlib

import pytest

from abot_dotnet_core_spark.config import CrawlConfig
from abot_dotnet_core_spark.crawler import CrawlEngine
from abot_dotnet_core_spark.kernel.robots import parse_robots
from abot_dotnet_core_spark.kernel.simulator import CrawlSimulator, PageRecord
from abot_dotnet_core_spark.sources.corpus import (
    TINY, domain_name, robots_txt_for, to_simulator_corpus,
)

SEED = "http://d0.test/"

# header-declared charset with NO body meta tag: catches any fetch path that
# ignores the header Content-Type charset (WebContentExtractor.cs:59)
HDR_SPEC = dataclasses.replace(TINY, header_only_1251_rate=0.3, seed=77)
# pages carrying X-Robots-Tag: nofollow (HyperLinkParser.cs:128-138)
XROBOTS_SPEC = dataclasses.replace(TINY, x_robots_nofollow_rate=0.3, seed=78)


def simulator_result(cfg):
    corpus = to_simulator_corpus(TINY)
    robots_map = {}
    if cfg.is_respect_robots_dot_text_enabled:
        for i in range(TINY.n_domains):
            txt = robots_txt_for(TINY, i)
            if txt is not None:
                robots_map[f"http://{domain_name(i)}/"] = parse_robots(txt)
    return CrawlSimulator(corpus, cfg, robots_map).crawl(SEED)


def run_engine(spark, cfg, corpus_dir, tmp_path, politeness=False,
               max_rounds=100):
    eng = CrawlEngine(
        spark, cfg,
        corpus_path=f"{corpus_dir}/corpus.parquet",
        corpus_meta_path=f"{corpus_dir}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"),
        robots_path=f"{corpus_dir}/robots.parquet",
    )
    eng.seed([SEED])
    eng.run(max_rounds=max_rounds, politeness=politeness)
    return eng


def engine_crawled(spark, eng):
    df = eng.store.read_events(spark, "crawled").orderBy("crawl_order")
    return df.collect()


def assert_parity(spark, eng, sim, check_text=True):
    rows = engine_crawled(spark, eng)
    got = [(r["url"], r["status"], r["depth"], r["is_retry"], r["retry_count"])
           for r in rows]
    want = [(c.url, c.status, c.depth, c.is_retry, c.retry_count)
            for c in sim.crawled]
    assert got == want, (
        f"crawl order mismatch:\n got[:10]={got[:10]}\nwant[:10]={want[:10]}\n"
        f"len got={len(got)} want={len(want)}")

    # seen set equality (hash-level, CompactCrawledUrlRepository contract)
    eng_seen = {r["url_hash"] for r in eng._read_seen().collect()}
    assert eng_seen == sim.seen_hashes()

    # disallowed events (links + schedule stages), order-insensitive multiset
    dis = eng.store.read_events(spark, "disallowed").collect()
    got_dis = sorted((r["url"], r["reason"]) for r in dis)
    want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                      if e.stage in ("links", "schedule"))
    assert got_dis == want_dis

    if check_text:
        # byte-identical text per url (vs the golden corpus text column)
        corpus = {r["url"]: r["text"] for r in
                  spark.read.parquet(eng.corpus_path)
                  .select("url", "text").collect()}
        for r in rows:
            if r["links_extracted"] > 0 or (r["status"] == 200 and r["url"] in corpus):
                if r["text_md5"] and r["url"] in corpus:
                    want_md5 = hashlib.md5(
                        corpus[r["url"]].encode("utf-8")).hexdigest()
                    if r["status"] == 200:
                        assert r["text_md5"] == want_md5, r["url"]


class TestParityDefaults:
    def test_default_config(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig()
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))


class TestParityRobots:
    def test_robots_enabled(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))


class TestParityRootDisallowOverride:
    """is_ignore_robots_dot_text_if_root_disallowed_enabled
    (PoliteWebCrawler.cs:111-133): a disallowed root — or an all-below-root
    disallow caught by the '/aaaaa' probe — drops robots for the WHOLE site
    (rules and crawl-delay), not just the seed row."""

    ROOT = "http://rd.test/"

    def _write(self, spark, tmp_path, robots_txt):
        import pandas as pd
        from abot_dotnet_core_spark.kernel.simulator import PageRecord

        def link(*hs):
            return "".join(f'<a href="{h}">x</a>' for h in hs)

        pages = {
            self.ROOT: PageRecord(html=link("/a", "/b") + "root"),
            self.ROOT + "a": PageRecord(html=link("/blocked/c") + "pa"),
            self.ROOT + "b": PageRecord(html="pb"),
            self.ROOT + "blocked/c": PageRecord(html="pc"),
        }
        rows = []
        for url, rec in pages.items():
            raw = rec.html.encode()
            rows.append({"url": url, "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": raw, "text": rec.html, "lang": "en",
                         "status": rec.status,
                         "content_type": rec.content_type,
                         "content_length": len(raw), "redirect_to": None})
        pdf = pd.DataFrame(rows)
        d = tmp_path / "rdcorpus"
        d.mkdir(exist_ok=True)
        pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
            f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pdf[["url", "status", "content_type", "content_length",
             "redirect_to"]].to_parquet(f"{d}/corpus_meta.parquet",
                                        index=False)
        pd.DataFrame([{"domain": "rd.test", "robots_txt": robots_txt}]) \
            .to_parquet(f"{d}/robots.parquet", index=False)
        return str(d), pages

    def _run_both(self, spark, tmp_path, robots_txt, cfg, resume_after=None):
        d, pages = self._write(spark, tmp_path, robots_txt)
        sim = CrawlSimulator(pages, cfg,
                             {self.ROOT: parse_robots(robots_txt)}) \
            .crawl(self.ROOT)
        kw = dict(corpus_path=f"{d}/corpus.parquet",
                  corpus_meta_path=f"{d}/corpus_meta.parquet",
                  store_root=str(tmp_path / "rdstate"),
                  robots_path=f"{d}/robots.parquet")
        eng = CrawlEngine(spark, cfg, **kw)
        eng.seed([self.ROOT])
        if resume_after is not None:
            eng.run(max_rounds=resume_after)
            eng = CrawlEngine.resume(spark, cfg, **kw)
        eng.run(max_rounds=20)
        return eng, sim

    def test_root_disallowed_crawls_whole_site(self, spark, tmp_path):
        cfg = CrawlConfig(
            is_respect_robots_dot_text_enabled=True,
            is_ignore_robots_dot_text_if_root_disallowed_enabled=True)
        eng, sim = self._run_both(spark, tmp_path,
                                  "User-agent: *\nDisallow: /\n", cfg)
        assert_parity(spark, eng, sim, check_text=False)
        assert len(sim.crawled) == 4        # override really crawled it all

    def test_probe_all_below_root_disallowed(self, spark, tmp_path):
        # root itself allowed; '/aaaaa' probe hits 'Disallow: /a' -> override
        cfg = CrawlConfig(
            is_respect_robots_dot_text_enabled=True,
            is_ignore_robots_dot_text_if_root_disallowed_enabled=True)
        eng, sim = self._run_both(
            spark, tmp_path,
            "User-agent: *\nDisallow: /a\nDisallow: /b\nDisallow: /blocked\n",
            cfg)
        assert_parity(spark, eng, sim, check_text=False)
        assert len(sim.crawled) == 4

    def test_without_flag_robots_still_applies(self, spark, tmp_path):
        cfg = CrawlConfig(is_respect_robots_dot_text_enabled=True)
        eng, sim = self._run_both(
            spark, tmp_path,
            "User-agent: *\nDisallow: /blocked\n", cfg)
        assert_parity(spark, eng, sim, check_text=False)
        assert len(sim.crawled) == 3        # /blocked/c denied

    def test_override_survives_resume(self, spark, tmp_path):
        cfg = CrawlConfig(
            is_respect_robots_dot_text_enabled=True,
            is_ignore_robots_dot_text_if_root_disallowed_enabled=True)
        eng, sim = self._run_both(spark, tmp_path,
                                  "User-agent: *\nDisallow: /\n", cfg,
                                  resume_after=1)
        assert_parity(spark, eng, sim, check_text=False)
        assert len(sim.crawled) == 4


class TestParityBigRoundPath:
    def test_bloom_scan_pushdown_path(self, spark, tiny_corpus_dir, tmp_path):
        """fetch_broadcast_threshold=0 forces every round through the
        big-round Bloom scan-pushdown fetch (extraction on the corpus scan,
        narrow joins only) — results must be identical to the reference
        simulator, like the broadcast path. Default extract_impl=arrow."""
        cfg = CrawlConfig(fetch_broadcast_threshold=0,
                          is_respect_robots_dot_text_enabled=True)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng,
                      simulator_result(CrawlConfig(
                          is_respect_robots_dot_text_enabled=True)))

    def test_bloom_scan_pushdown_pandas_impl(self, spark, tiny_corpus_dir,
                                             tmp_path):
        """The pandas_udf extraction alternative stays output-identical."""
        cfg = CrawlConfig(fetch_broadcast_threshold=0,
                          extract_impl="pandas")
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(CrawlConfig()))


def run_custom_spec(spark, spec, cfg, tmp_path, seed=SEED):
    """Engine + simulator over a non-default corpus spec; returns (eng, sim)."""
    from abot_dotnet_core_spark.sources.corpus import write_parquet
    d = tmp_path / "corpus_spec"
    write_parquet(spec, str(d))
    eng = CrawlEngine(
        spark, cfg,
        corpus_path=f"{d}/corpus.parquet",
        corpus_meta_path=f"{d}/corpus_meta.parquet",
        store_root=str(tmp_path / "state"),
        robots_path=f"{d}/robots.parquet")
    eng.seed([seed])
    eng.run(max_rounds=100)
    sim = CrawlSimulator(to_simulator_corpus(spec), cfg).crawl(seed)
    return eng, sim


class TestParityHeaderCharset:
    def test_header_only_charset_big_round_path(self, spark, tmp_path):
        """A page whose charset arrives ONLY in the Content-Type header (no
        body meta tag) must decode identically in the big-round Bloom
        scan-pushdown path — i.e. crawl output must not be a function of the
        fetch_broadcast_threshold perf knob."""
        from abot_dotnet_core_spark.sources.corpus import (
            _header_only_1251, generate_rows)
        # the spec really contains header-only-charset pages
        n_hdr = sum(1 for r in generate_rows(HDR_SPEC)
                    if "charset" in r["content_type"]
                    and b"meta charset" not in r["html"])
        assert n_hdr > 0
        cfg = CrawlConfig(fetch_broadcast_threshold=0)   # force big-round path
        eng, sim = run_custom_spec(spark, HDR_SPEC, cfg, tmp_path)
        assert_parity(spark, eng, sim)
        # at least one crawled row actually exercised the header-only decode
        rows = engine_crawled(spark, eng)
        assert any(r["charset"] == "windows-1251" for r in rows)

    def test_header_only_charset_broadcast_path(self, spark, tmp_path):
        cfg = CrawlConfig()                              # broadcast path
        eng, sim = run_custom_spec(spark, HDR_SPEC, cfg, tmp_path)
        assert_parity(spark, eng, sim)

    def test_header_only_charset_bloom_fallback(self, spark, tmp_path):
        """meta_broadcast_threshold=0 forces the pathological regime: the
        header subset routes through the aug-bloom shuffle join — output
        must still be identical."""
        cfg = CrawlConfig(fetch_broadcast_threshold=0,
                          meta_broadcast_threshold=0)
        eng, sim = run_custom_spec(spark, HDR_SPEC, cfg, tmp_path)
        assert_parity(spark, eng, sim)


class TestParityXRobots:
    def test_x_robots_nofollow_both_paths(self, spark, tmp_path):
        """X-Robots-Tag: nofollow response headers must suppress link
        extraction in the engine exactly as in the simulator (T4)."""
        for thresh, sub in ((0, "big"), (200_000, "small")):
            cfg = CrawlConfig(
                fetch_broadcast_threshold=thresh,
                is_respect_http_x_robots_tag_header_no_follow_enabled=True)
            eng, sim = run_custom_spec(spark, XROBOTS_SPEC, cfg,
                                       tmp_path / sub)
            assert_parity(spark, eng, sim)
        # the gate actually fired for some page: a nofollow 200 page with
        # links in its html reports links_extracted == 0
        rows = engine_crawled(spark, eng)
        from abot_dotnet_core_spark.sources.corpus import generate_rows
        nofollow_urls = {r["url"] for r in generate_rows(XROBOTS_SPEC)
                         if r["x_robots"] == "nofollow" and r["status"] == 200}
        crawled_nf = [r for r in rows if r["url"] in nofollow_urls]
        assert crawled_nf and all(r["links_extracted"] == 0
                                  for r in crawled_nf)


class TestParitySeenCompaction:
    def test_compaction_preserves_seen_and_order(self, spark,
                                                 tiny_corpus_dir, tmp_path):
        """seen_compact_every=2 forces several incremental consolidations
        mid-crawl; results must equal the reference simulator exactly and
        the seen union-read must span fewer dirs than rounds."""
        import os
        cfg = CrawlConfig(seen_compact_every=2)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(CrawlConfig()))
        seen_dirs = [d for d in os.listdir(
            os.path.join(eng.store.root, "seen")) if d.startswith("round=")]
        assert len(seen_dirs) < eng.round + 1

    def test_interrupted_swap_repaired_on_resume(self, spark,
                                                 tiny_corpus_dir, tmp_path):
        """Crash-safety: committed seen state must survive a crash at ANY
        point of the compaction swap. Simulate the worst window — sources
        already deleted, staged dir not yet renamed — and resume()."""
        import os
        import shutil
        cfg = CrawlConfig(seen_compact_every=2)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        seen_before = sorted(
            r["url_hash"] for r in eng._read_seen().collect())
        base = os.path.join(eng.store.root, "seen")
        last = eng.store.latest_round()

        # reconstruct a mid-swap crash at the last committed round: move the
        # newest round dirs into a staging dir and delete the sources, as if
        # the process died between rmtree and os.rename
        dirs = sorted((int(d.split("=")[1]) for d in os.listdir(base)
                       if d.startswith("round=")))
        lo, hi = dirs[-2], dirs[-1]
        staging = os.path.join(base, f".compact-{lo}-{hi}")
        (spark.read.parquet(os.path.join(base, f"round={lo}"),
                            os.path.join(base, f"round={hi}"))
         .write.parquet(staging))
        shutil.rmtree(os.path.join(base, f"round={lo}"))
        shutil.rmtree(os.path.join(base, f"round={hi}"))

        eng2 = CrawlEngine.resume(
            spark, CrawlConfig(seen_compact_every=2),
            f"{tiny_corpus_dir}/corpus.parquet",
            f"{tiny_corpus_dir}/corpus_meta.parquet",
            str(tmp_path / "state"),
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        assert not any(d.startswith(".compact-") for d in os.listdir(base))
        seen_after = sorted(
            r["url_hash"] for r in eng2._read_seen().collect())
        assert seen_after == seen_before
        assert eng2.round == last


class TestParityAngleSharp:
    def test_anglesharp_parser_config(self, spark, tiny_corpus_dir, tmp_path):
        """T2: the AngleSharp parser variant rides the same config into the
        engine UDF and the simulator — outputs stay in lockstep."""
        cfg = CrawlConfig(hyperlink_parser="anglesharp")
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))


class TestParityBudgets:
    def test_max_pages(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_pages_to_crawl=11)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))

    def test_max_pages_distributed_cumsum(self, spark, tiny_corpus_dir,
                                           tmp_path):
        """budget_topk_threshold=0 forces P4 onto the two-pass
        range-partitioned running sum (assign_global_cumsum) instead of
        TakeOrdered + single-partition window — results must be identical."""
        cfg = CrawlConfig(max_pages_to_crawl=11, budget_topk_threshold=0)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(
            CrawlConfig(max_pages_to_crawl=11)))

    def test_max_depth(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_crawl_depth=2)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))

    def test_per_domain_cap(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_pages_to_crawl_per_domain=5,
                          is_external_page_crawling_enabled=True)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))

    def test_max_links_per_page(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_links_per_page=2)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))


class TestParityRetries:
    def test_retries(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_retry_count=2)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))

    def test_retries_with_budget(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_retry_count=1, max_pages_to_crawl=15)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))

    def test_retries_budget_distributed_cumsum(self, spark, tiny_corpus_dir,
                                                tmp_path):
        """Retries occupy running-backlog slots (__sub=2 stream rows) on the
        assign_global_cumsum P4 path too."""
        cfg = CrawlConfig(max_retry_count=1, max_pages_to_crawl=15,
                          budget_topk_threshold=0)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(
            CrawlConfig(max_retry_count=1, max_pages_to_crawl=15)))

    def test_retry_occupies_budget_slot(self, spark, tmp_path):
        """Handcrafted boundary: with max_pages=5, the queued retry of /a
        must count against the backlog when /b's links are scheduled — /c
        fits (3 crawled + 1 queued + 1 = 5) but /d must be denied
        (3 + 2 + 1 = 6 > 5). Regression for the enforcement gate skipping
        rounds where eligible_n <= cap < eligible_n + n_retries."""
        import pandas as pd
        from abot_dotnet_core_spark.kernel.simulator import PageRecord

        def link(*hrefs):
            return "".join(f'<a href="{h}">x</a>' for h in hrefs)

        root = "http://q.test/"
        pages = {
            root: PageRecord(html=link("/a", "/b") + "root"),
            root + "a": PageRecord(status=503, html=""),
            root + "b": PageRecord(html=link("/c", "/d") + "page b"),
            root + "c": PageRecord(html="page c"),
            root + "d": PageRecord(html="page d"),
        }
        rows = []
        for url, rec in pages.items():
            raw = rec.html.encode("utf-8")
            rows.append({"url": url, "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": raw, "text": rec.html, "lang": "en",
                         "status": rec.status,
                         "content_type": rec.content_type,
                         "content_length": len(raw),
                         "redirect_to": rec.redirect_to})
        pdf = pd.DataFrame(rows)
        d = tmp_path / "qcorpus"
        d.mkdir()
        pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
            f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pdf[["url", "status", "content_type", "content_length",
             "redirect_to"]].to_parquet(f"{d}/corpus_meta.parquet",
                                        index=False)

        cfg = CrawlConfig(max_retry_count=1, max_pages_to_crawl=5)
        sim = CrawlSimulator(pages, cfg).crawl(root)
        assert any("MaxPagesToCrawl" in e.reason for e in sim.disallowed)

        eng = CrawlEngine(spark, cfg,
                          corpus_path=f"{d}/corpus.parquet",
                          corpus_meta_path=f"{d}/corpus_meta.parquet",
                          store_root=str(tmp_path / "qstate"))
        eng.seed([root])
        eng.run(max_rounds=20)
        assert_parity(spark, eng, sim, check_text=False)

    @staticmethod
    def _write_micro(tmp_path, pages, name):
        import pandas as pd
        rows = []
        for url, rec in pages.items():
            raw = rec.html.encode()
            rows.append({"url": url, "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": raw, "text": rec.html, "lang": "en",
                         "status": rec.status,
                         "content_type": rec.content_type,
                         "content_length": len(raw),
                         "redirect_to": rec.redirect_to})
        pdf = pd.DataFrame(rows)
        d = tmp_path / name
        d.mkdir()
        pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
            f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pdf[["url", "status", "content_type", "content_length",
             "redirect_to"]].to_parquet(f"{d}/corpus_meta.parquet",
                                        index=False)
        return str(d)

    @pytest.mark.parametrize("max_pages", [1, 2])
    def test_links_cut_interacts_with_budget(self, spark, tmp_path,
                                             max_pages):
        """P16 x P4: the reference breaks at the M-th SCHEDULED link —
        budget-denied links don't advance the cut (max_pages=1: ALL of the
        root's links get denial events and are marked known), while an
        admitted M-th link cuts the rest silently (max_pages=2: B and C get
        no events and stay unknown)."""
        from abot_dotnet_core_spark.kernel.simulator import PageRecord
        root = "http://m.test/"
        link = "".join(f'<a href="/{c}">x</a>' for c in "abc")
        pages = {
            root: PageRecord(html=link + "root"),
            root + "a": PageRecord(html="pa"),
            root + "b": PageRecord(html="pb"),
            root + "c": PageRecord(html="pc"),
        }
        cfg = CrawlConfig(max_links_per_page=1,
                          max_pages_to_crawl=max_pages)
        sim = CrawlSimulator(pages, cfg).crawl(root)
        if max_pages == 1:
            assert sorted(e.url for e in sim.disallowed) == \
                [root + c for c in "abc"]      # all three denied, none cut
        else:
            assert len(sim.crawled) == 2 and not sim.disallowed
        d = self._write_micro(tmp_path, pages, "mcorpus")
        eng = CrawlEngine(spark, cfg,
                          corpus_path=f"{d}/corpus.parquet",
                          corpus_meta_path=f"{d}/corpus_meta.parquet",
                          store_root=str(tmp_path / "mstate"))
        eng.seed([root])
        eng.run(max_rounds=10)
        assert_parity(spark, eng, sim, check_text=False)

    @pytest.mark.parametrize("max_pages", [3, 4])
    def test_known_redirect_probe_event(self, spark, tmp_path, max_pages):
        """A redirect child that is already known occupies no budget slot
        but IS probed against the running backlog: at max_pages=3 the
        reference fires a MaxPagesToCrawl denial for it, at max_pages=4 it
        passes silently (AddIfNew no-op) — no spurious event either way."""
        from abot_dotnet_core_spark.kernel.simulator import PageRecord
        root = "http://k.test/"
        pages = {
            root: PageRecord(html='<a href="/a">x</a><a href="/b">x</a>r'),
            root + "a": PageRecord(status=301, redirect_to=root + "b",
                                   html=""),
            root + "b": PageRecord(html="pb"),
        }
        cfg = CrawlConfig(max_pages_to_crawl=max_pages,
                          is_http_request_auto_redirects_enabled=False)
        sim = CrawlSimulator(pages, cfg).crawl(root)
        n_budget_events = sum("MaxPagesToCrawl" in e.reason
                              for e in sim.disallowed)
        assert n_budget_events == (1 if max_pages == 3 else 0)
        d = self._write_micro(tmp_path, pages, "kcorpus")
        eng = CrawlEngine(spark, cfg,
                          corpus_path=f"{d}/corpus.parquet",
                          corpus_meta_path=f"{d}/corpus_meta.parquet",
                          store_root=str(tmp_path / "kstate"))
        eng.seed([root])
        eng.run(max_rounds=10)
        assert_parity(spark, eng, sim, check_text=False)

    @pytest.mark.parametrize("budget", [9, 13, 17, 21])
    def test_retries_at_budget_boundary(self, spark, tiny_corpus_dir,
                                        tmp_path, budget):
        """P4 must charge queued retries against the backlog even when the
        round's eligible links alone fit the remaining cap (the
        eligible_n <= cap < eligible_n + n_retries gate): sweep budgets so
        retries interleave at the boundary."""
        cfg = CrawlConfig(max_retry_count=2, max_pages_to_crawl=budget)
        eng = run_engine(spark, cfg, tiny_corpus_dir,
                         tmp_path / f"b{budget}")
        assert_parity(spark, eng, simulator_result(cfg))


class TestParityExternal:
    def test_external_crawling(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(is_external_page_crawling_enabled=True,
                          is_external_page_links_crawling_enabled=True,
                          max_pages_to_crawl=60)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, simulator_result(cfg))


class TestResume:
    def test_resume_mid_frontier(self, spark, tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig()
        # uninterrupted reference run
        eng_full = run_engine(spark, cfg, tiny_corpus_dir, tmp_path / "full")
        # interrupted: 2 rounds, then a fresh engine resumes from checkpoint
        eng_a = CrawlEngine(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "interrupted" / "state"),
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        eng_a.seed([SEED])
        eng_a.run(max_rounds=2)
        eng_b = CrawlEngine.resume(
            spark, cfg,
            corpus_path=f"{tiny_corpus_dir}/corpus.parquet",
            corpus_meta_path=f"{tiny_corpus_dir}/corpus_meta.parquet",
            store_root=str(tmp_path / "interrupted" / "state"),
            robots_path=f"{tiny_corpus_dir}/robots.parquet")
        eng_b.run(max_rounds=100)

        full = [(r["url"], r["status"], r["depth"], r["crawl_order"])
                for r in engine_crawled(spark, eng_full)]
        resumed = [(r["url"], r["status"], r["depth"], r["crawl_order"])
                   for r in engine_crawled(spark, eng_b)]
        assert full == resumed
        assert ({r["url_hash"] for r in eng_full._read_seen().collect()}
                == {r["url_hash"] for r in eng_b._read_seen().collect()})


class TestParityUriRecrawling:
    """IsUriRecrawlingEnabled (Scheduler.cs:78-87): Scheduler.Add bypasses
    AddIfNew, so directly-added pages (seeds) stay out of the crawled repo
    until AddKnownUri marks them — one link back to the root re-crawls it
    exactly once. With the flag off the seed is test-and-set at Add time and
    the back-link is deduped."""

    ROOT = "http://rc.test/"

    def _write(self, spark, tmp_path):
        import pandas as pd
        from abot_dotnet_core_spark.kernel.simulator import PageRecord

        def link(*hs):
            return "".join(f'<a href="{h}">x</a>' for h in hs)

        pages = {
            self.ROOT: PageRecord(html=link("/a", "/b") + "root"),
            self.ROOT + "a": PageRecord(html=link("/", "/c") + "pa"),
            self.ROOT + "b": PageRecord(html="pb"),
            self.ROOT + "c": PageRecord(html="pc"),
        }
        rows = []
        for url, rec in pages.items():
            raw = rec.html.encode()
            rows.append({"url": url, "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": raw, "text": rec.html, "lang": "en",
                         "status": rec.status,
                         "content_type": rec.content_type,
                         "content_length": len(raw), "redirect_to": None})
        pdf = pd.DataFrame(rows)
        d = tmp_path / "rccorpus"
        d.mkdir(exist_ok=True)
        pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
            f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pdf[["url", "status", "content_type", "content_length",
             "redirect_to"]].to_parquet(f"{d}/corpus_meta.parquet",
                                        index=False)
        return str(d), pages

    def _run_both(self, spark, tmp_path, cfg):
        d, pages = self._write(spark, tmp_path)
        sim = CrawlSimulator(pages, cfg).crawl(self.ROOT)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{d}/corpus.parquet",
            corpus_meta_path=f"{d}/corpus_meta.parquet",
            store_root=str(tmp_path / "rcstate"))
        eng.seed([self.ROOT])
        eng.run(max_rounds=20)
        return eng, sim

    def test_duplicate_seeds_collapse_documented(self, spark, tmp_path):
        """Pins a DOCUMENTED divergence (crawler.py seed loop): the
        reference's Scheduler.Add under allowUriRecrawling bypasses AddIfNew
        so two simultaneous Adds of the same URL would each crawl
        (Scheduler.cs:78-87); this engine's frontier is url-unique within a
        round, so identical seeds in one seed() call collapse even with the
        flag on. The flag's meaningful semantics (back-link re-crawls a
        seed) are covered by test_recrawling_recrawls_linked_seed_once."""
        d, _ = self._write(spark, tmp_path)
        cfg = CrawlConfig(is_uri_recrawling_enabled=True)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{d}/corpus.parquet",
            corpus_meta_path=f"{d}/corpus_meta.parquet",
            store_root=str(tmp_path / "rcdup"))
        eng.seed([self.ROOT, self.ROOT])
        eng.run(max_rounds=20)
        urls = [r["url"] for r in engine_crawled(spark, eng)]
        # depth-0 crawl once (collapsed) + one back-link re-crawl from /a
        assert urls.count(self.ROOT) == 2
        assert len(urls) == len(set((u, i) for i, u in enumerate(urls)))

    def test_recrawling_recrawls_linked_seed_once(self, spark, tmp_path):
        cfg = CrawlConfig(is_uri_recrawling_enabled=True)
        eng, sim = self._run_both(spark, tmp_path, cfg)
        assert_parity(spark, eng, sim, check_text=False)
        urls = [c.url for c in sim.crawled]
        assert urls.count(self.ROOT) == 2          # re-crawled exactly once
        assert len(urls) == 5                      # root, a, b, root@d2, c

    def test_recrawling_off_dedups_seed_backlink(self, spark, tmp_path):
        cfg = CrawlConfig()
        eng, sim = self._run_both(spark, tmp_path, cfg)
        assert_parity(spark, eng, sim, check_text=False)
        urls = [c.url for c in sim.crawled]
        assert urls.count(self.ROOT) == 1
        assert len(urls) == 4


class TestParityForcedLinkParsing:
    """IsForcedLinkParsingEnabled (WebCrawler.cs:688-690): links are parsed
    (ParsedLinks populated, reported on the crawled event) even when
    ShouldCrawlPageLinks denies — but SchedulePageLinks still requires the
    gate, so nothing extra is scheduled or marked known."""

    def _cfg(self, thresh):
        return CrawlConfig(max_crawl_depth=1,
                           is_forced_link_parsing_enabled=True,
                           fetch_broadcast_threshold=thresh)

    def test_forced_parsing_both_paths(self, spark, tiny_corpus_dir,
                                       tmp_path):
        for thresh, sub in ((0, "big"), (200_000, "small")):
            cfg = self._cfg(thresh)
            sim = simulator_result(cfg)
            eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path / sub)
            assert_parity(spark, eng, sim, check_text=False)
            # per-url links_extracted equality, incl. gate-denied pages
            got = [(r["url"], r["links_extracted"])
                   for r in engine_crawled(spark, eng)]
            want = [(c.url, c.links_extracted) for c in sim.crawled]
            assert got == want
            # the flag actually bit: some depth-1 page (links gate denied by
            # max_crawl_depth=1) still reports parsed links
            denied_with_links = [c for c in sim.crawled
                                 if c.depth == 1 and c.links_extracted > 0]
            assert denied_with_links
            # ...but none of its links were scheduled (crawl stops at d1)
            assert all(c.depth <= 1 for c in sim.crawled)

    def test_without_flag_denied_pages_report_zero(self, spark,
                                                   tiny_corpus_dir, tmp_path):
        cfg = CrawlConfig(max_crawl_depth=1)
        sim = simulator_result(cfg)
        eng = run_engine(spark, cfg, tiny_corpus_dir, tmp_path)
        assert_parity(spark, eng, sim, check_text=False)
        assert all(c.links_extracted == 0
                   for c in sim.crawled if c.depth == 1)


class TestBudgetRetryResume:
    """A retry pop frees one MaxPagesToCrawl backlog slot MID-STREAM: the
    reference denies a link when crawled+queue+1 exceeds the cap, but a
    RETRY leaving the queue (popped without entering CrawledCount) lowers
    the backlog, so a link scheduled AFTER that pop can be admitted even
    though an earlier link was denied. Construction: /pe's 4th link is the
    first denial, the 503 retry /b pops right after (its queue position
    sorts between /pe and /pl), then /pl's link /y must be ADMITTED — a
    pure prefix-sum admission (denied links keep inflating the running
    backlog) would deny /y too."""

    ROOT = "http://bt.test/"

    def _pages(self):
        def link(*hs):
            return "".join(f'<a href="{h}">x</a>' for h in hs)
        return {
            self.ROOT: PageRecord(html=link("/c", "/b", "/a") + "root"),
            self.ROOT + "c": PageRecord(html=link("/pe") + "pc"),
            self.ROOT + "b": PageRecord(status=503, html="pb"),
            self.ROOT + "a": PageRecord(html=link("/pl") + "pa"),
            self.ROOT + "pe": PageRecord(
                html=link("/x1", "/x2", "/x3", "/x4") + "pe"),
            self.ROOT + "pl": PageRecord(html=link("/y") + "pl"),
            self.ROOT + "x1": PageRecord(html="x1"),
            self.ROOT + "x2": PageRecord(html="x2"),
            self.ROOT + "x3": PageRecord(html="x3"),
            self.ROOT + "x4": PageRecord(html="x4"),
            self.ROOT + "y": PageRecord(html="y"),
        }

    def _write(self, tmp_path):
        import pandas as pd
        rows = []
        for url, rec in self._pages().items():
            raw = rec.html.encode()
            rows.append({"url": url, "warc_ts": pd.Timestamp("2024-01-01"),
                         "html": raw, "text": rec.html, "lang": "en",
                         "status": rec.status,
                         "content_type": rec.content_type,
                         "content_length": len(raw), "redirect_to": None,
                         "x_robots": None, "retry_after": None})
        pdf = pd.DataFrame(rows)
        d = tmp_path / "btcorpus"
        d.mkdir(exist_ok=True)
        pdf[["url", "warc_ts", "html", "text", "lang"]].to_parquet(
            f"{d}/corpus.parquet", index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True)
        pdf[["url", "status", "content_type", "content_length",
             "redirect_to", "x_robots", "retry_after"]].to_parquet(
            f"{d}/corpus_meta.parquet", index=False)
        return str(d)

    @pytest.mark.parametrize("topk_threshold", [4_000_000, 1])
    def test_slot_freed_by_retry_pop(self, spark, tmp_path, topk_threshold):
        cfg = CrawlConfig(max_pages_to_crawl=10, max_retry_count=1,
                          budget_topk_threshold=topk_threshold)
        sim = CrawlSimulator(self._pages(), cfg).crawl(self.ROOT)
        want = [(c.url, c.status, c.is_retry) for c in sim.crawled]
        # the scenario only means something if the simulator admitted /y
        # after denying /x4
        assert (self.ROOT + "y", 200, False) in want
        assert (self.ROOT + "x4", 200, False) not in want

        d = self._write(tmp_path)
        eng = CrawlEngine(
            spark, cfg,
            corpus_path=f"{d}/corpus.parquet",
            corpus_meta_path=f"{d}/corpus_meta.parquet",
            store_root=str(tmp_path / f"btstate{topk_threshold}"))
        eng.seed([self.ROOT])
        eng.run(max_rounds=30)
        rows = (eng.store.read_events(spark, "crawled")
                .orderBy("crawl_order").collect())
        got = [(r["url"], r["status"], r["is_retry"]) for r in rows]
        assert got == want

        dis = eng.store.read_events(spark, "disallowed").collect()
        got_dis = sorted((r["url"], r["reason"]) for r in dis)
        want_dis = sorted((e.url, e.reason) for e in sim.disallowed
                          if e.stage in ("links", "schedule"))
        assert got_dis == want_dis
