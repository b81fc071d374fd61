"""CrawlEngine — the distributed round-loop (the whole reference WebCrawler
orchestration re-expressed as one DataFrame DAG per crawl round).

Round dataflow (SURVEY.md §3.1):

  frontier ──(politeness budget S3)──► batch ──(⋈ corpus_meta, ⋈ corpus.html
  for downloadable rows only — column pruning keeps the binary out of every
  other stage)──► fetched ──(T5 text UDF, P7-P9 gate, T1-T4 link UDF,
  posexplode)──► links ──(intra-round first-seen dedup + anti-join seen S2/P15,
  internal gate, robots P14 broadcast join, P1-P6 cascade, P5 via per-domain
  event/probe running-count window, P4 via top-k + rank over the canonical
  enqueue stream, P16 per-parent cut)──► admitted ──► next frontier + seen
  appends + crawled/disallowed/lineage/metrics, committed as one snapshot.

Sequential-budget equivalences (proved against the single-thread reference,
see tests/test_engine_parity.py):

* P4 (MaxPagesToCrawl counts scheduler backlog, CrawlDecisionMaker.cs:55-60):
  at the moment link L is considered, CrawledCount + Scheduler.Count =
  C0 + F0 + (elements enqueued so far this round) — the dequeue/crawl
  increments cancel. So admission is a prefix cap over the canonical enqueue
  stream: non-retry element with k admitted non-retries and r retries before
  it is admitted iff C0 + F0 + k + r + 1 <= MaxPagesToCrawl. Implemented as
  orderBy+limit (TakeOrdered, scalable) + row_number on the small survivor
  set — never a global window over the full stream.

* P5 (MaxPagesToCrawlPerDomain, CrawlDecisionMaker.cs:62-70): the count for
  link L's domain g = C0_g + |batch pages of g crawled up to L's parent,
  parent inclusive|. Implemented as an event(+1)/probe(0) union windowed by
  domain — one running sum per domain partition, no as-of join blow-up.

Scale posture: state tables are bucketed by pmod(xxhash64(domain), B); the
seen anti-join keys on the 8-byte url_hash only; robots and seed authorities
are broadcast; the html binary column is joined in only for rows that passed
P10-P12; the politeness window is salted two-pass (cfg.skew_salt): sharded
candidate ranking over the full frontier, then an exact per-domain top-B
over the O(salt*budget)-bounded candidates — budget-exact and
salt-invariant.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F, types as T

from .config import CrawlConfig
from .functions import udfs
from .kernel.decisions import effective_domain_delay_ms
from .operators import decisions as DX
from .operators.ordering import (assign_global_cumsum, assign_global_cumsums,
                                 assign_global_seq)
from .sources.statestore import StateStore

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("url_hash", T.LongType(), False),
    T.StructField("domain", T.StringType(), False),
    T.StructField("scheme", T.StringType(), False),
    T.StructField("parent_url", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), False),
    T.StructField("is_internal", T.BooleanType(), False),
    T.StructField("is_retry", T.BooleanType(), False),
    T.StructField("retry_count", T.IntegerType(), False),
    T.StructField("redirected_from", T.StringType(), True),
    T.StructField("redirect_position", T.IntegerType(), False),
    T.StructField("priority_seq", T.LongType(), False),
    # S4 retry delay: earliest round this row may be fetched (0 = anytime).
    # Virtual clock: round k fetches at time (k-1) * round_length_ms.
    T.StructField("not_before_round", T.IntegerType(), False),
])

SEEN_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType(), False),
])


@dataclass
class RoundStats:
    round: int
    fetched: int = 0
    links_extracted: int = 0
    deduped: int = 0
    robots_denied: int = 0
    depth_pruned: int = 0
    budget_denied: int = 0
    admitted: int = 0
    retries: int = 0
    wall_sec: float = 0.0
    counters: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        corpus_path: str,
        corpus_meta_path: str,
        store_root: str,
        robots_path: str | None = None,
        bloom_prefilter: bool = False,
        delegates=None,
    ) -> None:
        from .operators.delegates import (DELEGATE_ARITY, CrawlDelegates,
                                          as_pandas_udf)
        self.spark = spark
        self.cfg = cfg
        self.store = StateStore(store_root)
        self.corpus_path = corpus_path
        self.corpus_meta_path = corpus_meta_path
        self.robots_path = robots_path
        self.delegates = delegates or CrawlDelegates()
        # user delegates as boolean pandas UDFs (WebCrawler.cs:458-504; each
        # composed AFTER the built-in cascade allowed, :821-822)
        self._dg = {
            name: as_pandas_udf(fn, arity)
            for name, arity in DELEGATE_ARITY.items()
            if (fn := getattr(self.delegates, name)) is not None
        }
        self._extract_page_udf = udfs.make_extract_page_udf(
            cfg, clean_url=self.delegates.clean_url)
        self._robots_allowed_udf = udfs.make_robots_allowed_udf(
            cfg.robots_dot_text_user_agent_string)
        self._robots_df: DataFrame | None = None
        self._robots_count = 0
        self.crawled_count = 0      # CrawlContext.CrawledCount (driver scalar)
        self.event_count = 0        # total ProcessPage events (incl. retries)
        self.round = -1
        self.root_authorities: list[str] = []
        # frontier-seeded crawls: internality comes from a root_domains state
        # table (may be millions of rows) instead of the driver-side list
        self._root_domains_df: DataFrame | None = None
        self.n_root_domains = 0
        # frontier size bookkeeping (saves a count job per round)
        self.pending_total = 0
        self.pending_non_retry = 0
        self.next_seq = 0
        # highest not_before_round in the frontier: deferral admission runs
        # only while this exceeds the upcoming round (zero-cost otherwise)
        self.max_not_before = 0
        self.use_bloom_prefilter = bloom_prefilter
        # incremental Bloom sidecar: driver dict bucket -> (n_keys, blob);
        # blob None = saturated bucket (exact join decides). Built once,
        # merged with each round's seen_new, broadcast for the probe.
        # Above cfg.bloom_broadcast_max_bytes total blob bytes the sidecar
        # leaves the driver for good: _sidecar_bucketed flips on, blobs live
        # only in the bloom_sidecar state table (round=_sidecar_round), and
        # probing goes through the bucket-aligned mapInArrow path.
        self._sidecar: dict | None = None
        self._sidecar_bucketed = False
        self._sidecar_round: int | None = None
        # static-input DataFrames, built once: corpus/corpus_meta/domain_state
        # never change across rounds, but re-calling spark.read.parquet every
        # round re-runs file listing + schema inference as a driver job each
        # time — a pure per-round constant that drags scaling efficiency in
        # frontier-drain rounds (profiled: ~8 tiny jobs/round)
        self._meta_df: DataFrame | None = None
        self._corpus_df: DataFrame | None = None
        self._domain_state_cache: DataFrame | None = None

    # ------------------------------------------------------------------ #
    # setup
    # ------------------------------------------------------------------ #

    def _load_robots(self) -> DataFrame | None:
        """Parse robots.txt rows into flat rules + delay, DISTRIBUTED.

        One row per domain: (domain, rules_flat array<string>, crawl_delay_s),
        parsed once by an Arrow UDF and materialized (localCheckpoint) so no
        round re-parses robots text. A real 100 TB crawl has 10^7-10^8
        domains — the table never rides through the driver; downstream joins
        broadcast it only while it fits (robots_broadcast_threshold), else
        they shuffle on domain like any dimension table."""
        if not self.cfg.is_respect_robots_dot_text_enabled or self.robots_path is None:
            return None
        parse = udfs.make_robots_parse_udf(
            self.cfg.robots_dot_text_user_agent_string)
        df = (self.spark.read.parquet(self.robots_path)
              .filter(F.col("robots_txt").isNotNull())
              .withColumn("__p", parse(F.col("robots_txt")))
              .select("domain",
                      F.col("__p.rules_flat").alias("rules_flat"),
                      F.col("__p.crawl_delay_s").alias("crawl_delay_s"))
              .localCheckpoint(eager=True))
        self._robots_count = df.count()
        if self._robots_count == 0:
            return None
        return df

    def _robots_dim(self, df: DataFrame) -> DataFrame:
        """Broadcast the robots dimension only while it fits."""
        if self._robots_count <= self.cfg.robots_broadcast_threshold:
            return F.broadcast(df)
        return df

    # ---- static-input DataFrames (built once, reused every round) ------ #

    def _meta(self) -> DataFrame:
        if self._meta_df is None:
            meta = self.spark.read.parquet(self.corpus_meta_path)
            # fixtures written before the header columns existed read as NULL
            for hc in ("x_robots", "retry_after"):
                if hc not in meta.columns:
                    meta = meta.withColumn(hc, F.lit(None).cast("string"))
            self._meta_df = meta
        return self._meta_df

    def _corpus(self) -> DataFrame:
        if self._corpus_df is None:
            self._corpus_df = self.spark.read.parquet(self.corpus_path) \
                .select("url", "html")
        return self._corpus_df

    def _domain_state(self) -> DataFrame:
        if self._domain_state_cache is None:
            self._domain_state_cache = self.store.read_table(
                self.spark, "domain_state", 0)
        return self._domain_state_cache

    def seed(self, seed_urls: list[str]) -> None:
        """Round -1: gate + schedule the seeds (WebCrawler.cs:238-240)."""
        from .kernel.urlnorm import authority, normalize_url, scheme_of, url_hash64
        self._robots_df = self._load_robots()

        normalized = [normalize_url(u) for u in seed_urls]
        normalized = [u for u in normalized if u is not None]
        self.root_authorities = sorted({authority(u) for u in normalized})

        # only the SEED domains' rules come to the driver (O(#seeds) rows)
        robots_pd = None
        if self._robots_df is not None:
            robots_pd = (self._robots_df
                         .filter(F.col("domain").isin(self.root_authorities))
                         .toPandas().set_index("domain"))

        rows, seen_rows = [], []
        seq = 0
        from .kernel import decisions as KD
        from .kernel.robots import flat_to_rules, is_url_allowed
        seen_hashes: set[int] = set()
        ignored_robots_domains: set[str] = set()
        for u in normalized:
            if url_hash64(u) in seen_hashes:
                # AddIfNew: duplicate seed dropped. DOCUMENTED DIVERGENCE:
                # the reference's Scheduler.Add with allowUriRecrawling
                # bypasses AddIfNew, so two simultaneous Adds of the SAME
                # URL would each crawl (Scheduler.cs:78-87). This engine's
                # rounds are set-at-a-time — the frontier is url-unique
                # within a round (fetch/extract joins key on url) — so
                # identical seeds passed in ONE seed() call collapse even
                # under the flag. The flag's real semantics (a URL directly
                # re-added across rounds re-crawls; back-links re-crawl
                # seeds) hold and are parity-tested.
                continue
            # PoliteWebCrawler robots-first gate for the root
            if robots_pd is not None and authority(u) in robots_pd.index:
                flat = robots_pd.loc[authority(u), "rules_flat"]
                rules = flat_to_rules(list(flat))
                root = f"{scheme_of(u)}://{authority(u)}/"
                ua = self.cfg.robots_dot_text_user_agent_string
                allowed = is_url_allowed(rules, root, u, ua)
                if self.cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled:
                    # PoliteWebCrawler.cs:111-133 — a disallowed root (or an
                    # all-below-root disallow, probed with '/aaaaa') drops
                    # robots for the WHOLE site: rules AND crawl-delay stop
                    # applying to every later link of the domain
                    probe = u + ("aaaaa" if u.endswith("/") else "/aaaaa")
                    if not allowed or not is_url_allowed(rules, root, probe,
                                                         ua):
                        ignored_robots_domains.add(authority(u))
                elif not allowed:
                    continue
            d = KD.should_crawl_page(
                cfg=self.cfg, depth=0, scheme=scheme_of(u), domain=authority(u),
                is_internal=True, crawled_count=0, scheduled_count=seq)
            if not d.allow:
                continue
            if self.delegates.should_crawl_page is not None:
                from .operators.delegates import scalar_call
                if not scalar_call(self.delegates.should_crawl_page,
                                   u, 0, True):
                    continue
            rows.append((u, url_hash64(u), authority(u), scheme_of(u), None, 0,
                         True, False, 0, None, 0, seq, 0))
            if not self.cfg.is_uri_recrawling_enabled:
                # Scheduler.Add -> AddIfNew (Scheduler.cs:78-87); recrawling
                # bypasses the crawled repo, so seeds stay out of the seen
                # table and one later link back to a seed re-schedules it
                # once (then the mark-all append makes it known)
                seen_rows.append((url_hash64(u),))
            seen_hashes.add(url_hash64(u))
            seq += 1

        if self.cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled:
            # persist the overridden sites so resume() re-applies the drop
            # (robots reload fresh from parquet on resume)
            self.store.write_table(
                "robots_overridden",
                self.spark.createDataFrame(
                    [(d,) for d in sorted(ignored_robots_domains)],
                    "domain string"), 0)
        if ignored_robots_domains and self._robots_df is not None:
            # drop the overridden sites' rules before domain_state is built:
            # P14 joins and the crawl-delay both derive from _robots_df
            self._robots_df = self._robots_df.filter(
                ~F.col("domain").isin(sorted(ignored_robots_domains)))

        self.pending_total = len(rows)
        self.pending_non_retry = len(rows)
        self.next_seq = seq          # first unassigned priority_seq
        frontier = self.spark.createDataFrame(rows, schema=FRONTIER_SCHEMA)
        seen = self.spark.createDataFrame(seen_rows, schema=SEEN_SCHEMA)
        counts = self.spark.createDataFrame(
            [], "domain string, cnt long")
        self.round = 0
        self.store.write_table("frontier", frontier, 0)
        self.store.write_table("seen", seen, 0)
        self.store.write_table("domain_counts", counts, 0)
        self.store.write_table("domain_state", self._domain_state_df(), 0)
        self.store.commit_round(0, self._counters())

    def seed_from_frontier(self, urls_df: DataFrame) -> None:
        """Round-0 frontier from a prebuilt URL DataFrame (column ``url``) —
        the steady-state/recrawl entry point. Where ``seed()`` gates a
        driver-side handful of roots, this path is fully distributed: a
        10^10-row frontier never touches the driver (normalize/hash/authority
        ride one Arrow pass; the FIFO seq comes from the range-partition
        ranker). Every seeded row is a root of its own crawl: discovered
        links are internal iff their domain is one of the seeded domains,
        carried as a ``root_domains`` state table (never a driver list —
        a 10^10-row frontier can span 10^8 domains). The robots gate applies
        to the seeded rows exactly as ``seed()`` applies it to roots
        (PoliteWebCrawler.cs:64-82), distributed via broadcast join.

        If ``urls_df`` carries a ``priority_millis`` column (e.g. from
        ``operators.prioritize.frontier_priority``), the round-0 fetch
        order is (priority_millis, url) — lower first — instead of plain
        url order; duplicate URLs keep their minimum priority. This is how
        a prioritized frontier actually changes the crawl: priority_seq is
        re-ranked here over the normalized/deduped URL set."""
        from .functions import udfs
        self._robots_df = self._load_robots()

        has_pri = "priority_millis" in urls_df.columns
        fr = (urls_df.select(
                  "url", *(["priority_millis"] if has_pri else []))
              .withColumn("url", udfs.normalize_url_udf(F.col("url")))
              .filter(F.col("url").isNotNull()))
        if has_pri:
            # deterministic dedup: a URL listed twice keeps its best
            # (lowest) priority — dropDuplicates would pick one arbitrarily
            fr = (fr.groupBy("url")
                  .agg(F.min("priority_millis").alias("priority_millis")))
        else:
            fr = fr.dropDuplicates(["url"])
        fr = (fr
              .withColumn("url_hash", udfs.url_hash64_udf(F.col("url")))
              .withColumn("domain", udfs.authority_udf(F.col("url")))
              .withColumn("scheme", udfs.scheme_udf(F.col("url")))
              .withColumn("parent_url", F.lit(None).cast("string"))
              .withColumn("depth", F.lit(0))
              .withColumn("is_internal", F.lit(True))
              .withColumn("is_retry", F.lit(False))
              .withColumn("retry_count", F.lit(0))
              .withColumn("redirected_from", F.lit(None).cast("string"))
              .withColumn("redirect_position", F.lit(0))
              .withColumn("not_before_round", F.lit(0)))
        # robots-first gate for seeded roots (mirrors seed(); with the
        # root-disallow override enabled, disallowed roots are kept — the
        # PoliteWebCrawler.cs:111-133 semantics)
        if (self._robots_df is not None
                and not self.cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled):
            fr = fr.join(
                self._robots_dim(self._robots_df.select("domain", "rules_flat")),
                "domain", "left")
            fr = fr.filter(
                F.col("rules_flat").isNull()
                | self._robots_allowed_udf(F.col("url"), F.col("rules_flat"))
            ).drop("rules_flat")
        fr = assign_global_seq(
            fr, ["priority_millis", "url"] if has_pri else ["url"],
            "priority_seq")
        fr = fr.select(*[f.name for f in FRONTIER_SCHEMA.fields]) \
               .localCheckpoint(eager=True)
        n = fr.count()

        self.root_authorities = []  # root_domains table carries internality
        root_domains = fr.select("domain").distinct().localCheckpoint(eager=True)
        self.n_root_domains = root_domains.count()
        self._root_domains_df = root_domains
        if (self._robots_df is not None
                and self.cfg.is_ignore_robots_dot_text_if_root_disallowed_enabled):
            # distributed root-disallow override (PoliteWebCrawler.cs:111-133)
            # at domain granularity: every seeded domain whose root (or the
            # '/aaaaa' all-below-root probe — http scheme assumed for the
            # domain-level probe) is disallowed drops its robots entirely
            dim = (self._robots_df.select("domain", "rules_flat")
                   .join(root_domains, "domain", "left_semi"))
            root_u = F.concat(F.lit("http://"), F.col("domain"), F.lit("/"))
            probe_u = F.concat(F.lit("http://"), F.col("domain"),
                               F.lit("/aaaaa"))
            bad = (dim.filter(
                ~self._robots_allowed_udf(root_u, F.col("rules_flat"))
                | ~self._robots_allowed_udf(probe_u, F.col("rules_flat")))
                .select("domain").localCheckpoint(eager=True))
            self.store.write_table("robots_overridden", bad, 0)
            self._robots_df = self._robots_df.join(bad, "domain",
                                                   "left_anti")
        self.pending_total = n
        self.pending_non_retry = n
        self.next_seq = n
        self.crawled_count = 0
        self.event_count = 0
        self.round = 0
        buckets = max(1, min(self.cfg.state_buckets, n // 20_000 + 1))
        self.store.write_table(
            "frontier",
            fr.repartition(buckets,
                           F.pmod(F.xxhash64("domain"),
                                  F.lit(self.cfg.state_buckets))), 0)
        self.store.write_table(
            "seen",
            # recrawling bypasses AddIfNew at Scheduler.Add (Scheduler.cs:78):
            # seeded rows stay unknown until a page links to them
            fr.select("url_hash").limit(0)
            if self.cfg.is_uri_recrawling_enabled else fr.select("url_hash"),
            0)
        self.store.write_table("root_domains", root_domains, 0)
        self.store.write_table(
            "domain_counts", self.spark.createDataFrame([], "domain string, cnt long"), 0)
        self.store.write_table("domain_state", self._domain_state_df(), 0)
        self.store.commit_round(0, self._counters())

    def _domain_state_df(self) -> DataFrame:
        """Per-domain effective politeness delay (S3) from config + robots,
        computed as a pure column expression (JVM-side — the robots table
        never rides through the driver). Mirrors the kernel's
        effective_domain_delay_ms exactly (PoliteWebCrawler.cs:85-97 +
        DomainRateLimiter.cs:46-47); pinned by a cross-check test."""
        if self._robots_df is None:
            return self.spark.createDataFrame([], "domain string, delay_ms long")
        cfg = self.cfg
        min_ms = cfg.min_crawl_delay_per_domain_milli_seconds
        default_ms = min_ms + 20 if min_ms > 0 else 0
        max_s = cfg.max_robots_dot_text_crawl_delay_in_seconds
        s = F.col("crawl_delay_s")
        robots_ms = F.when(F.lit(max_s > 0) & (s > max_s),
                           F.lit(max_s * 1000)).otherwise(s * 1000)
        delay = F.when((s > 0) & (s * 1000 > min_ms),
                       F.greatest(robots_ms, F.lit(default_ms))) \
                 .otherwise(F.lit(default_ms))
        return self._robots_df.select(
            "domain", delay.cast("long").alias("delay_ms"))

    def _counters(self) -> dict:
        return {
            "crawled_count": self.crawled_count,
            "event_count": self.event_count,
            "root_authorities": self.root_authorities,
            "pending_total": self.pending_total,
            "pending_non_retry": self.pending_non_retry,
            "next_seq": self.next_seq,
            "n_root_domains": self.n_root_domains,
            "max_not_before": self.max_not_before,
            # authoritative sidecar mode for resume: derived from EXACT blob
            # byte lengths at merge time, so restarts never re-decide the
            # broadcast-vs-bucketed gate from parquet footer sizes (which
            # include encoding overhead and can flip the mode near the
            # ceiling)
            "sidecar_bucketed": self._sidecar_bucketed,
        }

    @classmethod
    def resume(cls, spark: SparkSession, cfg: CrawlConfig, corpus_path: str,
               corpus_meta_path: str, store_root: str,
               robots_path: str | None = None,
               bloom_prefilter: bool = False,
               delegates=None) -> "CrawlEngine":
        """Rebuild engine state from the latest committed snapshot.

        ``bloom_prefilter`` and ``delegates`` are constructor passthroughs —
        delegates are code, not state, so the caller must re-supply the same
        ones the original crawl ran with (same contract as the reference's
        ShouldCrawlPage delegates, which are not serialized either). The
        persisted sidecar is only loaded when ``bloom_prefilter`` is set; it
        was merged through the last committed round, so it is exact for a
        crawl that ran with the flag on throughout. Toggling the flag ON for
        a store whose earlier rounds ran without it is unsupported (the
        sidecar would be missing those rounds' hashes)."""
        eng = cls(spark, cfg, corpus_path, corpus_meta_path, store_root,
                  robots_path, bloom_prefilter=bloom_prefilter,
                  delegates=delegates)
        last = eng.store.latest_round()
        if last is None:
            raise ValueError("nothing to resume — no committed rounds")
        manifest = eng.store.read_manifest(last)
        eng.round = last
        counters = manifest["counters"]
        eng.crawled_count = counters["crawled_count"]
        eng.event_count = counters["event_count"]
        eng.root_authorities = counters["root_authorities"]
        eng.pending_total = counters["pending_total"]
        eng.pending_non_retry = counters["pending_non_retry"]
        next_seq = counters.get("next_seq")
        if next_seq is None:
            # checkpoint from before next_seq existed: recompute the
            # high-water mark from the persisted frontier
            fr = eng.store.read_table(spark, "frontier", last)
            row = fr.agg(F.max("priority_seq").alias("m")).collect()[0]
            next_seq = (row["m"] if row["m"] is not None else -1) + 1
        eng.next_seq = next_seq
        eng.n_root_domains = counters.get("n_root_domains", 0)
        eng.max_not_before = counters.get("max_not_before", 0)
        import os
        rd_path = os.path.join(store_root, "root_domains", "round=0")
        if os.path.isdir(rd_path):
            eng._root_domains_df = spark.read.parquet(rd_path)
        sc_path = os.path.join(store_root, "bloom_sidecar", f"round={last}")
        if os.path.isdir(sc_path):
            # mode gate: the manifest records the EXACT decision made at
            # merge time (same metric as the build/merge gates), so resume
            # never flips broadcast-vs-bucketed near the ceiling. Fallback
            # for pre-counter checkpoints: parquet FOOTER metadata only —
            # a sidecar past the broadcast ceiling must not be materialized
            # on the driver just to decide it shouldn't be.
            bucketed = counters.get("sidecar_bucketed")
            if bucketed is None:
                import glob

                import pyarrow.parquet as pq
                blob_bytes = 0
                for fpath in glob.glob(os.path.join(sc_path, "*.parquet")):
                    md = pq.ParquetFile(fpath).metadata
                    for rg in range(md.num_row_groups):
                        for c in range(md.num_columns):
                            col = md.row_group(rg).column(c)
                            if col.path_in_schema == "blob":
                                blob_bytes += col.total_uncompressed_size
                bucketed = blob_bytes > cfg.bloom_broadcast_max_bytes
            if bucketed:
                eng._sidecar_bucketed = True
                eng._sidecar_round = last
            else:
                import pandas as pd
                pdf = pd.read_parquet(sc_path)
                eng._sidecar = {
                    int(row["bucket"]): (int(row["n_keys"]),
                                         bytes(row["blob"])
                                         if row["blob"] is not None else None)
                    for _, row in pdf.iterrows()}
                eng._sidecar_round = last
        eng._robots_df = eng._load_robots()
        ov_path = os.path.join(store_root, "robots_overridden", "round=0")
        if eng._robots_df is not None and os.path.isdir(ov_path):
            # re-apply the root-disallow override recorded at seed time
            eng._robots_df = eng._robots_df.join(
                spark.read.parquet(ov_path).select("domain"),
                "domain", "left_anti")
        eng._repair_seen_compaction(last)
        eng.store.drop_uncommitted()
        return eng

    # ------------------------------------------------------------------ #
    # the round job
    # ------------------------------------------------------------------ #

    def run(self, max_rounds: int = 1000, politeness: bool = False,
            clock=None) -> list[RoundStats]:
        """Round loop. S6 stop surface: exits on empty frontier, max_rounds,
        or CrawlTimeoutSeconds (WebCrawler.cs:231-234, 653-661) — the
        timeout stops SCHEDULING further rounds; the in-flight round
        finishes and commits, so (unlike the reference, which clears its
        scheduler) the crawl remains resumable from the last snapshot.
        ``clock`` is injectable for tests."""
        import time
        clock = clock or time.time
        t_start = clock()
        timeout = self.cfg.crawl_timeout_seconds
        stats = []
        for _ in range(max_rounds):
            if self.pending_total <= 0:
                break
            if timeout > 0 and clock() - t_start >= timeout:
                break
            t0 = time.time()
            st = self._crawl_round(politeness=politeness)
            st.wall_sec = round(time.time() - t0, 3)
            stats.append(st)
        return stats

    def archive(self, outdir: str, compress: bool = True,
                dedup_revisits: bool = True) -> dict:
        """Ship the crawl as the Common-Crawl artifact quad: WARC
        response(+revisit) segments, WAT metadata (outlinks + title JSON),
        WET text conversions, and a CDX/SURT index over the captures —
        one call after (or between) ``run()``s.

        Pages = the crawled event urls semi-joined back onto the corpus
        (so only fetched pages ship), with status/content_type from
        corpus_meta. Each sink re-reads from the parquet source with its
        own column pruning — WET scans only (url, ts, text), CDX only
        (url, ts); the html binary is read exactly once, by the WARC
        writer, and never shuffles (``dedup_revisits`` dedups within each
        segment writer; run :func:`sources.warc.mark_revisits` upstream
        for corpus-global election). CDX rows carry the capture keys
        (surt_key, ts, url); per-record byte offsets would need the
        writer to thread them back — documented gap vs Common Crawl's
        locator columns. The WAT sink re-extracts outlinks from the
        decoded text with the engine's own T1-T4 Arrow UDF (links are not
        persisted per page by the crawl — by design, only the admitted
        frontier is) and regex-captures the title; that second text scan
        is WAT's honest cost here.

        Returns {"warc": manifest rows, "wat": manifest rows,
        "wet": manifest rows, "cdx_rows": n, "cdx_dir": path}.
        """
        import os

        from .functions.cdx import cdx_index
        from .functions.udfs import make_extract_links_udf
        from .sources.warc import write_warc_df, write_wat_df, write_wet_df

        crawled = (self.store.read_events(self.spark, "crawled")
                   .select("url").dropDuplicates())
        corpus = (self.spark.read.parquet(self.corpus_path)
                  .join(crawled, "url", "left_semi"))
        meta = self.spark.read.parquet(self.corpus_meta_path)
        if "x_robots" not in meta.columns:
            meta = meta.withColumn("x_robots", F.lit(None).cast("string"))
        meta = meta.select("url", "status", "content_type", "x_robots")
        pages = (corpus.join(meta, "url", "left")
                 .select("url", "warc_ts",
                         F.coalesce(F.col("status"), F.lit(200))
                          .alias("status"),
                         "content_type", "x_robots", "html", "text"))
        warc_man = [r.asDict() for r in write_warc_df(
            pages.select("url", "warc_ts", "status", "content_type",
                         "html"),
            os.path.join(outdir, "warc"), compress=compress,
            dedup_revisits=dedup_revisits).collect()]
        wet_man = [r.asDict() for r in write_wet_df(
            pages.select("url", "warc_ts", "text"),
            os.path.join(outdir, "wet"), compress=compress).collect()]
        links_udf = make_extract_links_udf(self.cfg)
        wat_src = pages.select(
            "url", "warc_ts", "status", "content_type",
            F.nullif(F.regexp_extract(
                F.col("text"), r"(?is)<title[^>]*>(.*?)</title>", 1),
                F.lit("")).alias("title"),
            links_udf(F.col("text"), F.col("url"), F.lit(None),
                      F.col("x_robots")).alias("links"))
        wat_man = [r.asDict() for r in write_wat_df(
            wat_src, os.path.join(outdir, "wat"),
            compress=compress).collect()]
        cdx_dir = os.path.join(outdir, "cdx")
        idx = cdx_index(pages.select("url", "warc_ts"))
        idx.write.mode("overwrite").parquet(cdx_dir)
        n_cdx = self.spark.read.parquet(cdx_dir).count()
        return {"warc": warc_man, "wat": wat_man, "wet": wet_man,
                "cdx_rows": n_cdx, "cdx_dir": cdx_dir}

    def _read_seen(self) -> DataFrame:
        import os
        base = os.path.join(self.store.root, "seen")
        paths = [os.path.join(base, d) for d in sorted(os.listdir(base))
                 if d.startswith("round=")
                 and int(d.split("=")[1]) <= self.round]
        return self.spark.read.parquet(*paths)

    def _crawl_round(self, politeness: bool = False) -> RoundStats:
        import os as _os
        import time as _time
        _prof = _os.environ.get("SPARK_GRAFT_PROFILE") == "1"
        _t = [_time.time()]

        def _mark(label: str) -> None:
            if _prof:
                now = _time.time()
                print(f"PROF round={self.round + 1} {label}: "
                      f"{now - _t[0]:.2f}s", flush=True)
                _t[0] = now

        spark, cfg = self.spark, self.cfg
        r = self.round
        st = RoundStats(round=r + 1)
        # intermediate localCheckpoints registered here are unpersisted at
        # round end with the named ones — otherwise their blocks outlive the
        # round and accumulate in the block manager (the final rebinding of
        # a name releases only the LAST checkpoint)
        self._round_ckpts: list[DataFrame] = []

        frontier = self.store.read_table(spark, "frontier", r)
        if "not_before_round" not in frontier.columns:
            # checkpoint from before the S4 retry-delay column existed
            frontier = frontier.withColumn("not_before_round", F.lit(0))
        seen = self._read_seen()
        domain_counts = self.store.read_table(spark, "domain_counts", r)

        # ---- S4 retry-delay admission (WaitMinimumRetryDelayAsync,
        # WebCrawler.cs:1030-1057, round-granular): rows not yet eligible
        # stay pending. Zero-cost unless something is actually deferred.
        defer_active = self.max_not_before > r + 1
        deferred = None
        if defer_active:
            blocked = frontier.filter(F.col("not_before_round") > r + 1)
            # The wait happens on the POPPED HEAD (WaitMinimumRetryDelayAsync
            # blocks the single-threaded pop loop, WebCrawler.cs:1030-1057):
            # nothing queued behind the earliest still-waiting row can crawl
            # before it does. Admit only the strict prefix; everything from
            # the blocker on stays pending with its priority_seq — rounds
            # where the blocker is the queue head are legitimately empty
            # (the reference spends that time sleeping).
            head = blocked.agg(
                F.min(F.struct("priority_seq", "not_before_round"))
                 .alias("h")).collect()[0]["h"]
            if head is not None:
                cut = head["priority_seq"]
                deferred = frontier.filter(F.col("priority_seq") >= cut)
                frontier = frontier.filter(F.col("priority_seq") < cut)

        # ---- S3 politeness: budgeted per-domain admission ------------------
        # Hot-domain skew, two-pass exact: the HEAVY ranking (full frontier)
        # runs within (domain, pmod(xxhash64(url), S)) shards so a domain
        # holding 30% of the frontier never serializes one partition; each
        # shard forwards only its own top-B as candidates (the global
        # top-B per domain is necessarily within its shard's top-B), then an
        # exact per-domain window over the <= S*B candidate rows picks the B
        # oldest in priority order — byte-equal to the reference's
        # single-thread admission (WebCrawler.cs rate limiter) and invariant
        # to the salt fan-out. B is bounded by round_length_ms over the
        # 20 ms politeness fudge floor, so the second window's per-domain
        # partition is O(S*B) rows, never frontier-sized.
        if politeness:
            state = self._domain_state()
            s = max(cfg.skew_salt, 1)
            # clamp like _retry_rows: w_ms=0 would make both divisions below
            # NULL (non-ANSI /0) and zero every budget forever
            w_ms = max(cfg.round_length_ms, 1)
            min_ms = cfg.min_crawl_delay_per_domain_milli_seconds
            # domains with no robots row (or robots disabled) still get the
            # config minimum + 20 ms fudge — DomainRateLimiter paces EVERY
            # domain, not just robots-covered ones (DomainRateLimiter.cs:46)
            default_ms = min_ms + 20 if min_ms > 0 else 0
            fr = frontier.join(
                F.broadcast(state.select("domain", "delay_ms")),
                "domain", "left")
            delay = F.coalesce(F.col("delay_ms"), F.lit(default_ms))
            # delay > round window: floor(W/delay) = 0 would starve the
            # domain forever (empty rounds to max_rounds); instead admit 1
            # page every ceil(delay/W) rounds — the same average rate the
            # reference's rate limiter enforces — phase-spread by domain
            # hash so slow domains don't all wake on the same round
            k = F.floor((delay + w_ms - 1) / F.lit(w_ms))
            slow_slot = (F.pmod(F.lit(r + 1), k)
                         == F.pmod(F.xxhash64("domain"), k))
            fr = fr.withColumn(
                "budget",
                F.when(delay <= 0, F.lit(None).cast("long"))
                 .when(delay <= w_ms, F.floor(F.lit(w_ms) / delay))
                 .otherwise(F.when(slow_slot, F.lit(1))
                             .otherwise(F.lit(0)).cast("long"))
            ).drop("delay_ms")
            unlimited = fr.filter(F.col("budget").isNull()).drop("budget")
            limited = fr.filter(F.col("budget").isNotNull())
            w_shard = W.partitionBy("domain", "__salt").orderBy("priority_seq")
            limited = (limited
                       .withColumn("__salt", F.pmod(F.xxhash64("url"),
                                                    F.lit(s)))
                       .withColumn("__rk", F.row_number().over(w_shard)))
            cand = limited.filter(F.col("__rk") <= F.col("budget"))
            far = limited.filter(F.col("__rk") > F.col("budget"))
            w_dom = W.partitionBy("domain").orderBy("priority_seq")
            cand = cand.withColumn("__rk2", F.row_number().over(w_dom))
            drop_cols = ("__rk", "__rk2", "__salt", "budget")
            batch = (cand.filter(F.col("__rk2") <= F.col("budget"))
                     .drop(*drop_cols)
                     .unionByName(unlimited))
            pending = (cand.filter(F.col("__rk2") > F.col("budget"))
                       .drop(*drop_cols)
                       .unionByName(far.drop(*drop_cols)))
        else:
            batch = frontier
            pending = None
        if deferred is not None:
            pending = deferred if pending is None \
                else pending.unionByName(deferred)

        # stabilize the batch (it feeds many branches); with politeness and
        # deferral both off the batch IS the frontier parquet snapshot —
        # already stable, no materialization job needed
        if politeness or defer_active:
            batch = batch.localCheckpoint(eager=True)
        _mark("batch_ckpt")
        f0 = self.pending_total
        if politeness or defer_active:
            row = batch.agg(
                F.count("*").alias("n"),
                F.sum((~F.col("is_retry")).cast("long")).alias("nr")).collect()[0]
            batch_n = row["n"]
            non_retry_n = row["nr"] or 0
        else:
            # batch == frontier; sizes carried from the previous round's
            # commit (no count jobs)
            batch_n = self.pending_total
            non_retry_n = self.pending_non_retry
        st.fetched = batch_n
        # batch ∪ pending ∪ deferred exactly partition the frontier, whose
        # totals are already on the driver — the left-behind counts are
        # arithmetic, not a Spark job (the old count job re-ran the salted
        # politeness windows, the round's heaviest shuffle, a second time)
        self._pending_left = (max(self.pending_total - batch_n, 0),
                              max(self.pending_non_retry - non_retry_n, 0))

        # P4 backlog corrections: one -1 row per retry POPPED THIS ROUND
        # (AddPageToContext never counts a popped retry into CrawledCount,
        # WebCrawler.cs:918-928) — once the enqueue stream passes its queue
        # position it leaves the running backlog. Derived from the BATCH,
        # not the frontier: a retry still waiting (S4 deferral, politeness
        # pending) has not been popped, so its slot stays occupied and its
        # correction must not enter this round's stream.
        n_frontier_retries = max(batch_n - non_retry_n, 0)
        frontier_retry_seqs = (
            batch.filter(F.col("is_retry")).select("priority_seq")
            if n_frontier_retries > 0 else None)

        c0 = self.crawled_count
        self.crawled_count += non_retry_n    # AddPageToContext (batch form)

        # canonical FIFO order: priority_seq is strictly increasing across
        # rounds, so it IS the crawl order (no densification job needed)
        batch = batch.withColumn("crawl_order", F.col("priority_seq"))
        self.event_count += batch_n

        # ---- fetch: join corpus_meta (small cols), then html selectively --
        # The corpus is the 100-TB side: it must NEVER shuffle. The fetch
        # queue (bounded per round by the politeness budget) broadcasts INTO
        # the corpus scan as a semi-join reducer — corpus rows stream through
        # a broadcast hash probe and only the per-round hits survive; the
        # left-outer join then runs over two batch-sized inputs. On Iceberg
        # the same shape becomes storage-partition-join / DPP on the url
        # bucket; the fallback below is the plain shuffle join for rounds too
        # large to broadcast even as a url-only projection.
        # Threshold: the broadcast semi-join wins only while the driver-side
        # collect+hash of the queue stays trivial; past it the queue is
        # pushed into the corpus scan as an O(m)-byte Bloom filter instead
        # (build_url_bloom) and extraction runs ON the scan — the html never
        # shuffles at any queue size (the big-round path below).
        meta = self._meta()
        # gate on the ADMITTED batch size, not the whole frontier: a large
        # frontier with a tiny politeness-budgeted batch must still take the
        # broadcast path (and the Bloom must be sized by what it filters)
        small_round = batch_n <= cfg.fetch_broadcast_threshold
        if small_round:
            meta_hit = meta.join(F.broadcast(batch.select("url")), "url", "inner")
            fetched = batch.join(F.broadcast(meta_hit), "url", "left")
        else:
            fetched = batch.join(meta, "url", "left")
        # retry pages increment retry_count at processing time
        fetched = fetched.withColumn(
            "retry_count",
            F.when(F.col("is_retry"), F.col("retry_count") + 1)
             .otherwise(F.col("retry_count")))

        fetched = fetched.withColumn("download_reason", DX.should_download_reason(cfg))
        if "should_download_page_content" in self._dg:
            from .operators.delegates import REASON_CUSTOM
            ok = self._dg["should_download_page_content"](
                F.col("url"), F.col("status"), F.col("content_type"))
            fetched = fetched.withColumn(
                "download_reason",
                F.coalesce(F.col("download_reason"),
                           F.when(~ok, F.lit(REASON_CUSTOM))))
        if not small_round:
            # the narrow batch ⋈ meta join feeds three consumers below (the
            # fetch bloom build, the header-meta bloom build, the final
            # left join) — materialize it once instead of re-shuffling thrice
            fetched = fetched.localCheckpoint(eager=True)
            self._round_ckpts.append(fetched)

        # P8/P9 are row-local and known pre-UDF; P7 (blank text) is checked
        # inside the fused UDF right after decoding — one Arrow pass total
        want_links = ((F.col("is_internal")
                       | F.lit(cfg.is_external_page_links_crawling_enabled))
                      & (F.col("depth") < cfg.max_crawl_depth))
        # IsForcedLinkParsingEnabled (WebCrawler.cs:688-690): links are
        # PARSED (reported on the crawled event) even when the links gate
        # denies — but never scheduled (SchedulePageLinks still requires
        # shouldCrawlPageLinks; the explode below filters on links_reason)
        parse_links = want_links | F.lit(cfg.is_forced_link_parsing_enabled)
        corpus = self._corpus()
        dl = fetched.filter(F.col("download_reason").isNull())
        links_t = ("array<struct<url:string,hash:bigint,"
                   "domain:string,scheme:string>>")
        if small_round:
            # html never shuffles: queue-url broadcast prunes the scan, then
            # the outer join shuffles only the per-round hit set
            corpus = corpus.join(F.broadcast(dl.select("url")), "url", "inner")
            downloadable = (dl
                            .join(corpus, "url", "left")
                            .withColumn("__pg", self._extract_page_udf(
                                F.col("html"), F.col("content_type"), F.col("url"),
                                parse_links, F.col("x_robots")))
                            .withColumn("charset", F.col("__pg.charset"))
                            .withColumn("text_md5", F.col("__pg.text_md5"))
                            .withColumn("text_blank", F.col("__pg.text_blank"))
                            .withColumn("parsed_links", F.col("__pg.links"))
                            .drop("__pg", "html"))
        else:
            # big-round path: extraction runs in the corpus SCAN stage (a
            # pure map — scales linearly with cores), gated by an O(m)-byte
            # Bloom of the fetch queue; only narrow derived columns
            # (digest/blank/link structs) ever enter a shuffle.
            #
            # Header metadata that can change extraction output — a
            # charset-bearing Content-Type (WebContentExtractor.cs:59: the
            # header CharSet beats the body sniff) or an X-Robots-Tag header
            # (HyperLinkParser.cs:128-138) — must reach the UDF here too, or
            # the crawl output becomes a function of the perf knob
            # fetch_broadcast_threshold. A charset-less content type
            # ('text/html') derives exactly like NULL (no 'charset=' for
            # charset_from_header to find), so only the header-meta SUBSET
            # needs shipping: a second O(m)-byte Bloom routes the scan —
            # rows outside it stay a pure zero-exchange map; rows inside it
            # (the subset + its Bloom false positives) take a shuffled left
            # join bounded by the subset size. An FP simply finds no match
            # and extracts with NULL headers — identical output, no count
            # or broadcast-size probe job needed.
            from .operators.seenfilter import (build_hash_bloom,
                                               make_hash_bloom_member_udf)
            m, k, bits = build_hash_bloom(
                dl.select(F.xxhash64("url").alias("__h")), "__h",
                capacity=max(batch_n, 1024))
            member = make_hash_bloom_member_udf(spark, m, k, bits)
            aug = (dl.filter(F.col("content_type").rlike("(?i)charset\\s*=")
                             | F.col("x_robots").isNotNull())
                   .select("url", F.col("content_type").alias("__ct"),
                           F.col("x_robots").alias("__xr")))
            n_aug = aug.count()   # narrow scan over the checkpointed join
            scan = corpus.filter(member(F.xxhash64("url")))
            if n_aug == 0:
                scan = (scan
                        .withColumn("__ct", F.lit(None).cast("string"))
                        .withColumn("__xr", F.lit(None).cast("string")))
            elif n_aug <= cfg.meta_broadcast_threshold:
                # BroadcastHashJoin: the header subset probes INTO the scan —
                # still zero Exchange between the FileScan and the UDF
                scan = scan.join(F.broadcast(aug), "url", "left")
            else:
                # pathological charset-heavy round: a second O(m)-byte Bloom
                # routes ONLY the header-subset rows (plus its FPs, which
                # just find no match and extract with NULL headers) through
                # a shuffled join; everything else stays a pure map
                am, ak, abits = build_hash_bloom(
                    aug.select(F.xxhash64("url").alias("__h")), "__h",
                    capacity=max(n_aug, 1024))
                aug_member = make_hash_bloom_member_udf(spark, am, ak, abits)
                plain = (scan.filter(~aug_member(F.xxhash64("url")))
                         .withColumn("__ct", F.lit(None).cast("string"))
                         .withColumn("__xr", F.lit(None).cast("string")))
                scan = (scan.filter(aug_member(F.xxhash64("url")))
                        .join(aug, "url", "left")
                        .unionByName(plain))
            if cfg.extract_impl == "arrow":
                # mapInArrow rides the same scan stage (no Exchange) and
                # skips the pandas layer on both sides of the UDF
                from .functions.arrow_extract import extract_pages_arrow
                if "__ct" not in scan.columns:
                    scan = (scan
                            .withColumn("__ct", F.lit(None).cast("string"))
                            .withColumn("__xr", F.lit(None).cast("string")))
                ext = extract_pages_arrow(
                    scan, cfg, clean_url=self.delegates.clean_url) \
                    .withColumnRenamed("links", "__links")
            else:
                ext = (scan
                       .withColumn("__pg", self._extract_page_udf(
                           F.col("html"), F.col("__ct"),
                           F.col("url"), F.lit(True),
                           F.col("__xr")))
                       .select("url",
                               F.col("__pg.charset").alias("charset"),
                               F.col("__pg.text_md5").alias("text_md5"),
                               F.col("__pg.text_blank").alias("text_blank"),
                               F.col("__pg.links").alias("__links")))
            downloadable = (dl.join(ext, "url", "left")
                            .withColumn("text_blank",
                                        F.coalesce(F.col("text_blank"),
                                                   F.lit(True)))
                            .withColumn(
                                "parsed_links",
                                F.when(parse_links & ~F.col("text_blank"),
                                       F.col("__links"))
                                 .otherwise(F.array().cast(links_t)))
                            .withColumn("parsed_links",
                                        F.coalesce(F.col("parsed_links"),
                                                   F.array().cast(links_t)))
                            .drop("__links"))
        rest = (fetched.filter(F.col("download_reason").isNotNull())
                .withColumn("charset", F.lit(None).cast("string"))
                .withColumn("text_md5", F.lit(None).cast("string"))
                .withColumn("text_blank", F.lit(True))
                .withColumn("parsed_links", F.array().cast(links_t)))
        fetched = downloadable.unionByName(rest)

        # ---- P7-P9 links gate (golden reason strings) ----------------------
        fetched = fetched.withColumn(
            "links_reason",
            DX.should_crawl_page_links_reason(cfg, text_blank=F.col("text_blank")))
        if "should_crawl_page_links" in self._dg:
            from .operators.delegates import REASON_CUSTOM
            ok = self._dg["should_crawl_page_links"](
                F.col("url"), F.col("depth"), F.col("is_internal"))
            fetched = (fetched.withColumn(
                "links_reason",
                F.coalesce(F.col("links_reason"),
                           F.when(~ok, F.lit(REASON_CUSTOM))))
                # a custom links denial suppresses the page's links entirely
                # (unless forced parsing keeps them on the event; the
                # links_reason filter below still blocks scheduling)
                .withColumn("parsed_links",
                            F.when(F.col("links_reason").isNotNull()
                                   & ~F.lit(cfg.is_forced_link_parsing_enabled),
                                   F.array().cast(links_t))
                            .otherwise(F.col("parsed_links"))))
        fetched = fetched.localCheckpoint(eager=True)
        _mark("fetch_extract_ckpt")

        # ---- root-redirect rebinding (ValidateRootUriForRedirection,
        # WebCrawler.cs:676-678, 1063-1073): a redirected ROOT rebinds the
        # crawl's root authority, changing IsInternal for every later URL
        # (original authority stays internal too — IsInternalUri checks
        # RootUri OR OriginalRootUri). Driver-side: roots are O(#seeds).
        # Applies in manual-redirect mode (the corpus-join fetch model has
        # no auto-redirect following). Runs before _schedule_links so the
        # redirect child itself is classified under the NEW root.
        if (not cfg.is_http_request_auto_redirects_enabled
                and self.root_authorities):
            rd_roots = (fetched.filter(
                (F.col("depth") == 0) & F.col("parent_url").isNull()
                & F.col("redirected_from").isNull()
                & F.col("redirect_to").isNotNull())
                .select("redirect_to").collect())
            if rd_roots:
                from .kernel.urlnorm import authority, normalize_url
                new_auths = set()
                for row in rd_roots:
                    t = normalize_url(row["redirect_to"])
                    if t is not None:
                        new_auths.add(authority(t))
                if new_auths - set(self.root_authorities):
                    self.root_authorities = sorted(
                        set(self.root_authorities) | new_auths)

        links = (fetched
                 # SchedulePageLinks runs only when shouldCrawlPageLinks
                 # allowed (WebCrawler.cs:695-696) — forced-parsed links are
                 # reported but never scheduled or marked known
                 .filter(F.col("links_reason").isNull())
                 .select("url", "crawl_order", "priority_seq", "depth", "domain",
                         F.posexplode_outer("parsed_links").alias("link_pos", "__link"))
                 .filter(F.col("__link").isNotNull())
                 .withColumn("dst_url", F.col("__link.url"))
                 .withColumn("dst_hash", F.col("__link.hash"))
                 .withColumn("dst_domain", F.col("__link.domain"))
                 .withColumn("dst_scheme", F.col("__link.scheme"))
                 .drop("__link"))

        # manual redirect children (ProcessRedirect, WebCrawler.cs:722-749):
        # scheduled BEFORE the page's links (sub=0), same depth, position+1
        redirect_children = None
        if not cfg.is_http_request_auto_redirects_enabled:
            rd = fetched.filter(F.col("redirect_to").isNotNull())
            rd = (rd.withColumn("dst_url",
                                udfs.normalize_url_udf(F.col("redirect_to")))
                  .filter(F.col("dst_url").isNotNull()))
            redirect_children = rd.select(
                F.col("parent_url"),                       # parent kept as-is
                F.col("crawl_order"),
                F.col("priority_seq").alias("parent_seq"),
                (F.col("depth") - 1).alias("parent_depth"),
                F.col("domain").alias("parent_domain"),
                F.lit(-1).alias("link_pos"),
                F.col("dst_url"),
                F.lit(0).alias("sub"),
                F.col("url").alias("r_redirected_from"),
                (F.col("redirect_position") + 1).alias("r_redirect_position"),
                F.col("depth").alias("r_depth"))

        # ---- P13 retries: computed ONCE per round (previously counted in
        # both the budget stream and the output writer — one job saved)
        retries = self._retry_rows(fetched, r + 1)
        if cfg.max_retry_count < 1:
            n_retries, retries_max_nb = 0, 0
        else:
            rrow = retries.agg(
                F.count("*").alias("n"),
                F.max("not_before_round").alias("m")).collect()[0]
            n_retries, retries_max_nb = rrow["n"] or 0, rrow["m"] or 0
        self.max_not_before = max(self.max_not_before, retries_max_nb)

        # ---- scheduling stream --------------------------------------------
        links_flagged = self._schedule_links(links, batch, fetched, seen,
                                             domain_counts, c0, f0, st,
                                             retries, n_retries,
                                             redirect_children,
                                             frontier_retry_seqs,
                                             n_frontier_retries)
        _mark("schedule_links_ckpt")

        # ---- outputs -------------------------------------------------------
        self._write_round_outputs(fetched, links_flagged, batch, pending,
                                  seen, domain_counts, st, retries, n_retries,
                                  _mark)
        # release this round's checkpoint blocks — otherwise they accumulate
        # in the block manager across rounds and late rounds pay GC/eviction
        for df in (batch, fetched, links_flagged,
                   *getattr(self, "_round_ckpts", ())):
            try:
                df.unpersist()
            except Exception:
                pass
        self._round_ckpts = []
        return st

    # ------------------------------------------------------------------ #
    # link scheduling (the S2/P14/P1-P6/P15-P17 pipeline)
    # ------------------------------------------------------------------ #

    def _schedule_links(self, links: DataFrame, batch: DataFrame,
                        fetched: DataFrame, seen: DataFrame,
                        domain_counts: DataFrame, c0: int, f0: int,
                        st: RoundStats, retries: DataFrame, n_retries: int,
                        redirect_children: DataFrame | None = None,
                        frontier_retry_seqs: DataFrame | None = None,
                        n_frontier_retries: int = 0) -> DataFrame:
        spark, cfg = self.spark, self.cfg

        links = (links
                 .withColumnRenamed("url", "parent_url")
                 .withColumnRenamed("depth", "parent_depth")
                 .withColumnRenamed("domain", "parent_domain")
                 .withColumnRenamed("priority_seq", "parent_seq")
                 .withColumn("sub", F.lit(1))
                 .withColumn("r_redirected_from", F.lit(None).cast("string"))
                 .withColumn("r_redirect_position", F.lit(None).cast("int"))
                 .withColumn("r_depth", F.lit(None).cast("int")))
        if redirect_children is not None:
            # redirect children are a tiny set — the T6/T7 UDFs run per-row
            # here; mainstream links carry hash/domain/scheme from the fused
            # extraction pass already
            redirect_children = (redirect_children
                .withColumn("dst_hash", udfs.url_hash64_udf(F.col("dst_url")))
                .withColumn("dst_domain", udfs.authority_udf(F.col("dst_url")))
                .withColumn("dst_scheme", udfs.scheme_udf(F.col("dst_url"))))
            links = links.unionByName(redirect_children)

        # P15 intra-round first-seen occurrence (later dups silently skipped);
        # redirect children (sub=0) precede the same page's links
        w_first = W.partitionBy("dst_hash").orderBy("parent_seq", "sub", "link_pos")
        links = links.withColumn("__occ", F.row_number().over(w_first))

        # P15 known gate: anti-join semantics via a left join flag (we still
        # need the row for the lineage counters)
        # the seen table is distinct by construction (seed dedup + per-round
        # appends are anti-joined before write) — no dedup shuffle needed
        seen_d = seen.select(F.col("url_hash").alias("dst_hash")) \
                     .withColumn("__known", F.lit(True))
        if self.use_bloom_prefilter:
            # T8 sidecar: candidates the Bloom filter clears as definitely-new
            # skip the exact seen join entirely — only maybe-seen rows shuffle
            # into the anti-join (exactness preserved: no false negatives).
            # The sidecar is INCREMENTAL: built from the seen set once (seed
            # or resume without a persisted sidecar), then merged with each
            # round's seen_new — never rebuilt from the full seen table.
            from .operators.seenfilter import (bloom_prefilter,
                                               bloom_prefilter_bucketed,
                                               build_bloom_sidecar)
            if self._sidecar is None and not self._sidecar_bucketed:
                built = build_bloom_sidecar(
                    seen, buckets=cfg.state_buckets).localCheckpoint(eager=True)
                size = built.agg(
                    F.sum(F.length("blob")).alias("s")).collect()[0]["s"] or 0
                if size > cfg.bloom_broadcast_max_bytes:
                    # too big for driver/broadcast: the blobs go straight to
                    # the bucketed state table; probing is bucket-aligned
                    self.store.write_table("bloom_sidecar", built,
                                           self.round + 1)
                    self._sidecar_bucketed = True
                    self._sidecar_round = self.round + 1
                else:
                    self._sidecar = {
                        int(r["bucket"]): (int(r["n_keys"]),
                                           bytes(r["blob"])
                                           if r["blob"] is not None else None)
                        for r in built.collect()}
            if self._sidecar_bucketed:
                import os as _os
                links = bloom_prefilter_bucketed(
                    links, _os.path.join(self.store.root, "bloom_sidecar",
                                         f"round={self._sidecar_round}"),
                    hash_col="dst_hash", buckets=cfg.state_buckets)
            else:
                links = bloom_prefilter(
                    links,
                    {b: blob for b, (_n, blob) in self._sidecar.items()},
                    spark=spark, hash_col="dst_hash",
                    buckets=cfg.state_buckets)
            maybe = (links.filter(F.col("maybe_seen"))
                     .join(seen_d, "dst_hash", "left"))
            fresh = (links.filter(~F.col("maybe_seen"))
                     .withColumn("__known", F.lit(None).cast("boolean")))
            links = maybe.unionByName(fresh).drop("maybe_seen")
        else:
            links = links.join(seen_d, "dst_hash", "left")
        links = (links
                 .withColumn("is_known",
                             (F.col("__occ") > 1) | F.col("__known").isNotNull())
                 .drop("__known", "__occ"))

        # processed = passes the known gate (eligible for events/enqueue;
        # redirect children are always decision-checked). Computed HERE so
        # downstream per-row Python (the robots UDF) can skip known rows —
        # P16 narrows it further below.
        links = links.withColumn(
            "processed", (F.col("sub") == 0) | ~F.col("is_known"))

        # child construction (redirect children keep the page's depth and
        # carry redirected_from/position — WebCrawler.cs:730-736)
        roots = self.root_authorities
        if "is_internal_uri" in self._dg:
            # user IsInternalUri delegate replaces the authority-equality
            # primitive (WebCrawler.cs:129-131, 458-462)
            internal_col = self._dg["is_internal_uri"](F.col("dst_url"))
        elif roots:
            internal_col = F.col("dst_domain").isin(roots)
        elif self._root_domains_df is not None:
            # frontier-seeded crawl: internality = membership in the seeded
            # domain set (a join against the root_domains state table, never
            # a driver list — the set can be 10^8 rows; broadcast only while
            # it fits, else let it shuffle on dst_domain)
            rd = self._root_domains_df.select(
                F.col("domain").alias("dst_domain")) \
                .withColumn("__root", F.lit(True))
            if self.n_root_domains <= 2_000_000:
                rd = F.broadcast(rd)
            links = links.join(rd, "dst_domain", "left")
            internal_col = F.col("__root").isNotNull()
        else:
            internal_col = F.lit(False)
        links = (links
                 .withColumn("depth", F.col("parent_depth") + 1)
                 .withColumn("is_internal", internal_col))
        if "__root" in links.columns:
            links = links.drop("__root")
        links = (links
                 .withColumn("is_retry", F.lit(False))
                 .withColumn("retry_count", F.lit(0))
                 .withColumn("redirected_from", F.col("r_redirected_from"))
                 .withColumn("redirect_position",
                             F.coalesce(F.col("r_redirect_position"), F.lit(0)))
                 .drop("r_redirected_from", "r_redirect_position", "r_depth"))

        # internal gate (silent — WebCrawler.cs:975)
        internal_ok = F.col("is_internal") | F.lit(cfg.is_external_page_crawling_enabled)
        links = links.withColumn("internal_gate", internal_ok)

        # robots P14 (dimension join on the link's own domain; broadcast
        # while the robots table fits, shuffle join past the threshold).
        # The rules column is MASKED to NULL for rows whose decision is never
        # read (already-known duplicates, external-gated rows) — the Arrow
        # UDF takes its None fast path for them, so the per-row Python cost
        # tracks the NEW-link count, not the raw extracted-link count (in a
        # steady recrawl round most links are known).
        if self._robots_df is not None:
            links = links.join(
                self._robots_dim(self._robots_df.select(
                    F.col("domain").alias("dst_domain"), "rules_flat")),
                "dst_domain", "left")
            need = F.col("processed") & F.col("internal_gate")
            masked = F.when(need, F.col("rules_flat"))
            links = links.withColumn(
                "robots_denied",
                need & F.col("rules_flat").isNotNull()
                & ~self._robots_allowed_udf(F.col("dst_url"), masked))
            links = links.drop("rules_flat")
        else:
            links = links.withColumn("robots_denied", F.lit(False))

        # ---- P5 per-domain budget (event/probe running count) -------------
        if cfg.max_pages_to_crawl_per_domain > 0:
            events = batch.select(
                F.col("domain").alias("dst_domain"),
                F.col("priority_seq").alias("__ord"),
                F.lit(0).alias("__probe"),
                F.when(F.col("is_retry"), F.lit(0)).otherwise(F.lit(1)).alias("__inc"),
                F.lit(None).cast("long").alias("dst_hash"),
                F.lit(None).cast("long").alias("__pseq"),
                F.lit(None).cast("int").alias("__lpos"))
            probes = links.select(
                "dst_domain",
                F.col("parent_seq").alias("__ord"),
                F.lit(1).alias("__probe"),
                F.lit(0).alias("__inc"),
                "dst_hash",
                F.col("parent_seq").alias("__pseq"),
                F.col("link_pos").alias("__lpos"))
            w_cum = (W.partitionBy("dst_domain").orderBy("__ord", "__probe")
                     .rowsBetween(W.unboundedPreceding, W.currentRow))
            cum = (events.unionByName(probes)
                   .withColumn("__cum", F.sum("__inc").over(w_cum))
                   .filter(F.col("__probe") == 1)
                   .select("dst_domain", "dst_hash",
                           F.col("__pseq").alias("parent_seq"),
                           F.col("__lpos").alias("link_pos"), "__cum"))
            cum = cum.join(
                domain_counts.select(F.col("domain").alias("dst_domain"),
                                     F.col("cnt").alias("__c0d")),
                "dst_domain", "left").fillna({"__c0d": 0})
            cum = cum.withColumn(
                "domain_budget_denied",
                ((F.col("__cum") + F.col("__c0d")) > 0)
                & ((F.col("__cum") + F.col("__c0d"))
                   >= cfg.max_pages_to_crawl_per_domain)) \
                .select("dst_hash", "parent_seq", "link_pos", "domain_budget_denied")
            links = links.join(cum, ["dst_hash", "parent_seq", "link_pos"], "left") \
                         .fillna({"domain_budget_denied": False})
        else:
            links = links.withColumn("domain_budget_denied", F.lit(False))

        # ---- pre-budget cascade (P1,P2,P3,P5,P6 + robots) ------------------
        # the cascade's column contract: domain/scheme refer to the candidate
        links = (links.withColumn("scheme", F.col("dst_scheme"))
                 .withColumn("domain", F.col("dst_domain")))
        links = links.withColumn(
            "pre_reason",
            DX.should_crawl_page_reason(
                cfg, budget_denied=None,
                domain_budget_denied=F.col("domain_budget_denied"),
                robots_denied=F.col("robots_denied")))
        # the cascade PREFIX strictly before P4 (robots, redirect limit,
        # depth, scheme): rows clean here reach the reference's
        # MaxPagesToCrawl check even when P5 / the custom delegate deny
        # them later — they must probe the budget stream so a binding P4
        # wins the reason (CrawlDecisionMaker evaluates P4 before P5;
        # custom runs only after the whole built-in cascade allows)
        links = links.withColumn(
            "pre_p4_reason",
            DX.should_crawl_page_reason(
                cfg, budget_denied=None, domain_budget_denied=None,
                robots_denied=F.col("robots_denied")))
        if "should_crawl_page" in self._dg:
            # custom ShouldCrawlPage: runs only where built-ins allowed,
            # fires the disallowed event with the custom reason
            from .operators.delegates import REASON_CUSTOM
            ok = self._dg["should_crawl_page"](
                F.col("dst_url"), F.col("depth"), F.col("is_internal"))
            links = links.withColumn(
                "pre_reason",
                F.coalesce(F.col("pre_reason"),
                           F.when(~ok, F.lit(REASON_CUSTOM))))
        if "should_schedule_link" in self._dg:
            # ShouldScheduleLinkDecisionMaker (WebCrawler.cs:943-946): gates
            # page links only (not redirect children), SILENTLY — no events,
            # no enqueue, but the link is still marked known (:969)
            links = links.withColumn(
                "__sched_ok",
                F.when(F.col("sub") == 1,
                       self._dg["should_schedule_link"](
                           F.col("parent_url"), F.col("dst_url")))
                .otherwise(F.lit(True)))
        else:
            links = links.withColumn("__sched_ok", F.lit(True))

        # (processed was computed before the robots join; redirect children
        # (sub=0) are always decision-checked — their known gate applies at
        # enqueue time only, Scheduler.Add/AddIfNew, WebCrawler.cs:745.
        # The P16 cut below narrows it.)

        # a known redirect child is decision-checked (events can fire) but
        # never enqueued and consumes no budget slot (Add/AddIfNew no-ops)
        enqueueable = (F.col("sub") == 1) | ~F.col("is_known")
        links = links.withColumn(
            "eligible",
            F.col("processed") & F.col("internal_gate") & F.col("__sched_ok")
            & F.col("pre_reason").isNull())
        # clean through the pre-P4 cascade prefix: these rows are evaluated
        # against MaxPagesToCrawl in the reference regardless of how P5 or
        # the custom delegate rule afterwards (eligible ⊆ reaches_p4)
        reaches_p4 = (F.col("processed") & F.col("internal_gate")
                      & F.col("__sched_ok")
                      & F.col("pre_p4_reason").isNull())

        # ---- P16 rank among eligible links (cut applied AFTER P4) ----------
        # The reference breaks the per-parent loop at the M-th SCHEDULED
        # link (WebCrawler.cs:935-971): a budget-denied link increments
        # nothing (it still gets its event and is marked known), so the cut
        # position depends on P4 admission — the two are computed jointly:
        # only a parent's first M eligible links can ever consume budget,
        # and the cut lands after M of them were actually admitted.
        mlp = cfg.max_links_per_page
        is_link = F.col("sub") == 1
        if mlp != 0:
            w_epar = (W.partitionBy("parent_seq").orderBy("sub", "link_pos")
                      .rowsBetween(W.unboundedPreceding, W.currentRow))
            links = links.withColumn(
                "__e_rank",
                F.sum((F.col("eligible") & is_link).cast("int")).over(w_epar))
            consumes = (F.col("eligible") & enqueueable
                        & (~is_link | (F.col("__e_rank") <= mlp)))
        else:
            consumes = F.col("eligible") & enqueueable
        links = links.withColumn("__consumes", consumes)
        # non-consuming rows that still face the reference's P4 check at
        # their position: known redirect children (Scheduler.AddIfNew no-op,
        # WebCrawler.cs:745), P5-denied links and custom-delegate-denied
        # links (P4 is evaluated before either; if it binds, ITS reason
        # wins). Probes test one hypothetical slot, occupy none.
        probe = reaches_p4 & ~F.col("__consumes")

        # ---- P4 global budget over the canonical enqueue stream ------------
        # stream = consuming redirect children (sub=0) ∪ first-M-per-parent
        # eligible links (sub=1) ∪ probes ∪ retries (sub=2) ∪ frontier-retry
        # corrections (sub=-1), ordered (parent_seq, sub, link_pos)
        links = links.withColumn("__adm", F.lit(True))
        if cfg.max_pages_to_crawl > 0:
            # materialize once: the count agg below, the topk stream branch,
            # and the final checkpoint would each re-run the whole links
            # lineage (dedup window, seen anti-join, robots UDF, P5 windows)
            links = links.localCheckpoint(eager=True)
            self._round_ckpts.append(links)
            cap = cfg.max_pages_to_crawl - c0 - f0
            cnt = links.agg(
                F.sum(F.col("__consumes").cast("int")).alias("c"),
                F.sum(probe.cast("int")).alias("p")).collect()[0]
            consume_n, probe_n = (cnt["c"] or 0), (cnt["p"] or 0)
            # retries occupy stream slots in the backlog count; a probe can
            # only be denied once consume_n + n_retries reaches the cap
            r_f = n_frontier_retries
            if consume_n + n_retries + (1 if probe_n else 0) > max(cap, 0):
                if cap + r_f < 1:
                    # even with every frontier-retry pop applied, the
                    # minimum running backlog (1 - r_f) exceeds the cap
                    links = links.withColumn("__adm", F.lit(False))
                elif r_f == 0:
                    # no frontier retries: denials are FINAL (the backlog
                    # never shrinks mid-stream), so the inclusive prefix sum
                    # is the exact admission predicate
                    stream = (links.filter(F.col("__consumes") | probe)
                              .select("dst_hash", "parent_seq", "link_pos",
                                      F.col("sub").alias("__sub"),
                                      F.col("__consumes").cast("int")
                                      .alias("__inc"))
                              .unionByName(retries.select(
                                  F.col("url_hash").alias("dst_hash"),
                                  F.col("priority_seq").alias("parent_seq"),
                                  F.lit(0).alias("link_pos"),
                                  F.lit(2).alias("__sub"),
                                  F.lit(1).alias("__inc"))))
                    survivors = cap + n_retries + probe_n
                    if survivors <= cfg.budget_topk_threshold:
                        # TakeOrdered bounds the survivor set to cap +
                        # retries + probes, so the single-partition window
                        # below is over at most the remaining BUDGET, not
                        # the stream
                        topk = (stream
                                .orderBy("parent_seq", "__sub", "link_pos")
                                .limit(survivors))
                        w_stream = W.orderBy("parent_seq", "__sub",
                                             "link_pos") \
                            .rowsBetween(W.unboundedPreceding, W.currentRow)
                        topk = topk.withColumn(
                            "__cum", F.sum("__inc").over(w_stream))
                    else:
                        # huge remaining budget (~10^9): a single-partition
                        # window over the survivor set would serialize one
                        # task — compute the running backlog with the
                        # two-pass range-partitioned cumulative sum instead
                        # (rows past the cap fail the __adm predicate, so no
                        # pre-limit is needed)
                        topk = assign_global_cumsum(
                            stream, ["parent_seq", "__sub", "link_pos"],
                            "__inc", "__cum",
                            register_ckpt=self._round_ckpts)
                    # consuming row (inc 1, __cum counts itself) admitted iff
                    # c0+f0+__cum <= max — the c0+f0+k+r+1 invariant; a probe
                    # (inc 0) tests one hypothetical slot at its position:
                    # c0+f0+__cum+1 <= max (crawled + queue + 1, the
                    # simulator's exact check)
                    admitted_mark = (topk.filter(F.col("__sub") != 2)
                                     .withColumn(
                                         "__adm",
                                         (F.lit(c0 + f0) + F.col("__cum")
                                          + (1 - F.col("__inc")))
                                         <= cfg.max_pages_to_crawl)
                                     .select("dst_hash", "parent_seq",
                                             "link_pos", "__adm"))
                    links = (links.drop("__adm")
                             .join(admitted_mark,
                                   ["dst_hash", "parent_seq", "link_pos"],
                                   "left")
                             .withColumn("__adm", F.coalesce(
                                 F.col("__adm"), F.lit(False))))
                else:
                    links = self._budget_admit_with_retry_pops(
                        links, probe, retries, frontier_retry_seqs, cap,
                        stream_n=consume_n + probe_n + n_retries + r_f)

        # ---- P16 cut: everything after the parent's M-th scheduled link ----
        # (the reference's loop `break` — later links of that parent get no
        # events and are NOT marked known)
        if mlp != 0:
            w_before = (W.partitionBy("parent_seq").orderBy("sub", "link_pos")
                        .rowsBetween(W.unboundedPreceding, -1))
            sched = (F.col("__adm") & F.col("__consumes")
                     & is_link).cast("int")
            cut = is_link & (F.coalesce(F.sum(sched).over(w_before),
                                        F.lit(0)) >= mlp)
            links = (links.withColumn("processed",
                                      F.col("processed") & ~cut)
                     .withColumn("eligible", F.col("eligible") & ~cut)
                     .drop("__e_rank"))
        links = (links
                 .withColumn("budget_denied",
                             F.col("eligible") & ~F.col("__adm"))
                 # P4 fires for every row that reached it and failed its
                 # probe/consume test — including rows P5 or the custom
                 # delegate would also deny (reaches_p4 re-evaluates against
                 # post-cut `processed`, so P16-cut rows stay silent)
                 .withColumn("p4_denied", reaches_p4 & ~F.col("__adm"))
                 .drop("__adm", "__consumes"))

        # reason precedence = the reference cascade order: pre-P4 checks
        # (robots/redirect/depth/scheme), then MaxPagesToCrawl, then the
        # rest (P5 per-domain, custom delegate) — CrawlDecisionMaker returns
        # at the FIRST failing check
        links = links.withColumn(
            "reason",
            F.when(~F.col("processed") | ~F.col("internal_gate")
                   | ~F.col("__sched_ok"), F.lit(None))
             .when(F.col("pre_p4_reason").isNotNull(), F.col("pre_p4_reason"))
             .when(F.col("p4_denied"),
                   F.lit(f"MaxPagesToCrawl limit of [{cfg.max_pages_to_crawl}] has been reached"))
             .when(F.col("pre_reason").isNotNull(), F.col("pre_reason"))
             .otherwise(F.lit(None)))
        links = links.withColumn(
            "admitted",
            F.col("eligible") & ~F.col("budget_denied") & enqueueable)
        return links.localCheckpoint(eager=True)

    def _budget_admit_with_retry_pops(self, links: DataFrame, probe,
                                      retries: DataFrame,
                                      frontier_retry_seqs: DataFrame,
                                      cap: int, stream_n: int) -> DataFrame:
        """Exact P4 admission when the frontier holds RETRY rows.

        A retry pop frees a backlog slot mid-stream (the reference pops it
        from the queue without adding to CrawledCount, WebCrawler.cs:918-928)
        so admission can RESUME after earlier denials — a prefix sum over
        the stream (which keeps denied links' +1s) under-admits there. The
        exact sequential recurrence decomposes by SEGMENTS between
        non-link stream rows (retries entering, retry pops): within a
        segment the backlog changes only by admissions, so each segment has
        a closed-form quota

            quota_s = clamp(cap + pops_before_s - retries_before_s
                            - admitted_before_s, 0, links_in_s)

        and a link is admitted iff its within-segment rank <= quota. The
        three prefix counts come from one ranged shuffle
        (assign_global_cumsums), segment aggregates are O(#segments) on the
        driver, and the quota map broadcast-joins back — fully distributed,
        no TakeOrdered limit (a pre-limit is UNSAFE here: a slot freed by a
        late pop can admit a link arbitrarily deep in the stream).
        """
        spark = self.spark
        stream = (links.filter(F.col("__consumes") | probe)
                  .select("dst_hash", "parent_seq", "link_pos",
                          F.col("sub").alias("__sub"),
                          F.col("__consumes").cast("int").alias("__inc"))
                  .unionByName(retries.select(
                      F.col("url_hash").alias("dst_hash"),
                      F.col("priority_seq").alias("parent_seq"),
                      F.lit(0).alias("link_pos"),
                      F.lit(2).alias("__sub"),
                      F.lit(1).alias("__inc")))
                  .unionByName(frontier_retry_seqs.select(
                      F.lit(None).cast("long").alias("dst_hash"),
                      F.col("priority_seq").alias("parent_seq"),
                      F.lit(0).alias("link_pos"),
                      F.lit(-1).alias("__sub"),
                      F.lit(-1).alias("__inc"))))
        # marker names must not collide case-insensitively with the prefix
        # output columns (Spark's resolver is case-insensitive by default).
        # A consuming LINK is sub 0/1 with inc 1 — retries (sub 2) also
        # carry inc 1 but enter the backlog unconditionally via Rs, so
        # counting them here would double-charge the quota
        is_link = F.col("__sub").isin(0, 1) & (F.col("__inc") == 1)
        stream = (stream
                  .withColumn("__lm", is_link.cast("int"))
                  .withColumn("__rm", (F.col("__sub") == 2).cast("int"))
                  .withColumn("__xm", (F.col("__sub") == -1).cast("int")))
        prefixes = [("__lm", "__C"), ("__rm", "__R"), ("__xm", "__X")]
        # small streams: one single-partition window; big: ranged two-pass
        # (budget_topk_threshold caps the single-task path here too)
        if stream_n <= min(65_536, self.cfg.budget_topk_threshold):
            w = W.orderBy("parent_seq", "__sub", "link_pos") \
                 .rowsBetween(W.unboundedPreceding, W.currentRow)
            for ic, oc in prefixes:
                stream = stream.withColumn(oc, F.sum(ic).over(w))
            stream = stream.localCheckpoint(eager=True)
            self._round_ckpts.append(stream)
        else:
            stream = assign_global_cumsums(
                stream, ["parent_seq", "__sub", "link_pos"], prefixes,
                register_ckpt=self._round_ckpts)
        # a row's segment = #boundary rows at-or-before it; boundary rows
        # count themselves, so every link in a segment shares the boundary's
        # (R, X) prefix values
        stream = stream.withColumn("__seg", F.col("__R") + F.col("__X"))
        seg_rows = (stream.groupBy("__seg")
                    .agg(F.sum("__lm").alias("L"),
                         F.max("__R").alias("R"),
                         F.max("__X").alias("X"))
                    .collect())
        admitted_sofar, link_offset = 0, 0
        params = []
        for row in sorted(seg_rows, key=lambda r: r["__seg"]):
            n_links = row["L"] or 0
            quota = max(0, min(n_links,
                               cap + (row["X"] or 0) - (row["R"] or 0)
                               - admitted_sofar))
            params.append((int(row["__seg"]), admitted_sofar, link_offset,
                           quota, int(row["R"] or 0), int(row["X"] or 0)))
            admitted_sofar += quota
            link_offset += n_links
        params_df = F.broadcast(spark.createDataFrame(
            params, "__seg long, __A long, __off long, __quota long, "
                    "__Rs long, __Xs long"))
        marked = stream.filter(F.col("__sub").isin(0, 1)) \
                       .join(params_df, "__seg")
        rank = F.col("__C") - F.col("__off")
        admitted_before = F.col("__A") + F.least(rank, F.col("__quota"))
        marked = marked.withColumn(
            "__adm",
            F.when(F.col("__inc") == 1, rank <= F.col("__quota"))
             # probe: one hypothetical slot at its position —
             # crawled + queue + 1 <= max, with queue = admitted-so-far
             # + retries - pops
             .otherwise(admitted_before + F.col("__Rs") - F.col("__Xs")
                        + 1 <= cap))
        admitted_mark = marked.select("dst_hash", "parent_seq", "link_pos",
                                      "__adm")
        return (links.drop("__adm")
                .join(admitted_mark,
                      ["dst_hash", "parent_seq", "link_pos"], "left")
                .withColumn("__adm", F.coalesce(F.col("__adm"),
                                                F.lit(False))))

    def _retry_rows(self, fetched: DataFrame, fetch_round: int) -> DataFrame:
        """P13 — pages re-enqueued with is_retry=true (WebCrawler.cs:702-706).
        Statically empty when MaxRetryCount < 1 (no job needed to know).

        S4 retry delay (WebCrawler.cs:1030-1057 + Retry-After parse
        :848-868): the earliest admissible round under the virtual clock is
        fetch_round + ceil(max(Retry-After*1000, MinRetryDelayMs) / W).
        The engine takes Retry-After's numeric (seconds) form; a date-form
        header needs a wall clock the virtual-round model doesn't have and
        falls back to the config minimum (kernel parse_retry_after handles
        both forms for the per-row oracle)."""
        cfg = self.cfg
        base = fetched
        if cfg.max_retry_count < 1:
            base = fetched.filter(F.lit(False))
        recrawl_reason = DX.should_recrawl_reason(cfg)
        w = max(cfg.round_length_ms, 1)
        if "retry_after" in fetched.columns:
            ra_ms = F.col("retry_after").try_cast("double") * 1000.0
        else:
            ra_ms = F.lit(None).cast("double")
        delay_ms = F.coalesce(
            ra_ms, F.lit(float(cfg.min_retry_delay_in_milliseconds)))
        not_before = (F.lit(fetch_round)
                      + F.greatest(F.ceil(delay_ms / w), F.lit(1))
                      .cast("int"))
        base = base.withColumn("__rc", recrawl_reason) \
                   .filter(F.col("__rc").isNull())
        if "should_recrawl_page" in self._dg:
            # custom ShouldRecrawlPage: composed after the built-in allowed
            base = base.filter(self._dg["should_recrawl_page"](
                F.col("url"), F.col("status"), F.col("retry_count")))
        return (base
                .select("url", "url_hash", "domain", "scheme", "parent_url",
                        "depth", "is_internal", "retry_count",
                        "redirected_from", "redirect_position", "priority_seq",
                        not_before.alias("not_before_round"))
                .withColumn("is_retry", F.lit(True)))

    # ------------------------------------------------------------------ #
    # round outputs
    # ------------------------------------------------------------------ #

    def _write_round_outputs(self, fetched: DataFrame, links: DataFrame,
                             batch: DataFrame, pending: DataFrame | None,
                             seen: DataFrame, domain_counts: DataFrame,
                             st: RoundStats, retries: DataFrame,
                             n_retries: int,
                             _mark=lambda label: None) -> None:
        spark, cfg = self.spark, self.cfg
        r = self.round + 1

        # -- lineage (A4) first: one pass over the checkpointed links gives
        # both the per-partition lineage rows and (summed driver-side) the
        # round metrics — no separate aggregate job
        lineage = (links.groupBy(F.spark_partition_id().alias("partition_id"))
                   .agg(F.count("*").alias("links_seen"),
                        F.sum(F.col("is_known").cast("int")).alias("deduped"),
                        F.sum((F.col("processed") & F.col("robots_denied"))
                              .cast("int")).alias("robots_denied"),
                        F.sum((F.col("reason") == "Crawl depth is above max")
                              .cast("int")).alias("depth_pruned"),
                        F.sum(F.col("budget_denied").cast("int")).alias("budget_denied"),
                        F.sum(F.col("admitted").cast("int")).alias("admitted")))
        lineage_rows = [row.asDict() for row in lineage.collect()]
        _mark("lineage_agg")

        def _s(col):
            return sum((row[col] or 0) for row in lineage_rows)

        st.links_extracted = _s("links_seen")
        st.deduped = _s("deduped")
        st.robots_denied = _s("robots_denied")
        st.depth_pruned = _s("depth_pruned")
        st.budget_denied = _s("budget_denied")
        st.admitted = _s("admitted")

        def _width(n_rows: int, per: int = 50_000) -> int:
            """Output-file width proportional to row count — per-round fixed
            cost must not scale with configured parallelism on tiny tables."""
            return max(1, min(spark.sparkContext.defaultParallelism,
                              n_rows // per + 1))

        # -- crawled events ------------------------------------------------
        crawled = fetched.select(
            "url", "crawl_order", "status", "depth",
            F.col("parent_url"), "is_retry", "retry_count", "charset",
            F.coalesce(F.col("text_md5"),
                       F.md5(F.lit(""))).alias("text_md5"),
            F.size("parsed_links").alias("links_extracted"),
            F.lit(r).alias("round"))

        # -- disallowed events ----------------------------------------------
        dis_links = (links.filter(F.col("processed") & F.col("internal_gate")
                                  & F.col("reason").isNotNull())
                     .select(F.col("dst_url").alias("url"), "reason",
                             F.lit("schedule").alias("stage"), F.lit(r).alias("round")))
        dis_pages = (fetched.filter(F.col("links_reason").isNotNull())
                     .select("url", F.col("links_reason").alias("reason"),
                             F.lit("links").alias("stage"), F.lit(r).alias("round")))
        disallowed = dis_links.unionByName(dis_pages)

        # -- seen appends: every processed link + admitted children ----------
        seen_new = (links.filter(((F.col("sub") == 1) & F.col("processed"))
                                 | ((F.col("sub") == 0) & F.col("admitted")))
                    .select(F.col("dst_hash").alias("url_hash"))
                    .distinct()
                    .join(seen.select("url_hash"), "url_hash", "left_anti"))

        # -- next frontier ----------------------------------------------------
        admitted = (links.filter(F.col("admitted"))
                    .select(F.col("dst_url").alias("url"),
                            F.col("dst_hash").alias("url_hash"),
                            F.col("dst_domain").alias("domain"),
                            "scheme", F.col("parent_url"),
                            "depth", "is_internal", "is_retry", "retry_count",
                            "redirected_from", "redirect_position",
                            F.lit(0).alias("not_before_round"),
                            "parent_seq", F.col("sub").alias("__sub"),
                            F.col("link_pos").alias("__pos")))
        retries = retries.withColumn("__sub", F.lit(2)) \
            .withColumn("__pos", F.lit(0)) \
            .withColumnRenamed("priority_seq", "parent_seq")
        stream = admitted.unionByName(
            retries.select(*[c for c in admitted.columns]))
        # continue the global priority_seq sequence: the driver carries the
        # high-water mark (next_seq), so children always sort after EVERY
        # existing frontier row — including politeness-deferred rows whose
        # seq exceeds this batch's max — and no per-round max() job runs
        prev_max = self.next_seq - 1
        stream_n = st.admitted + n_retries
        if stream_n <= 65_536:
            # small-stream fast path: one single-partition window beats the
            # three-job range-partition densification
            w_seq = W.orderBy("parent_seq", "__sub", "__pos")
            stream = stream.withColumn(
                "priority_seq",
                F.row_number().over(w_seq).cast("long") + prev_max)
        else:
            stream = assign_global_seq(stream, ["parent_seq", "__sub", "__pos"],
                                       "priority_seq", start=prev_max + 1)
        self.next_seq = prev_max + 1 + stream_n
        new_frontier = stream.drop("parent_seq", "__sub", "__pos")
        if pending is not None:
            new_frontier = new_frontier.unionByName(
                pending.select(*new_frontier.columns))
        # adaptive bucket count: tiny frontiers get 1 file; big ones keep the
        # full domain-hash bucketing (per-round fixed cost must not scale
        # with the configured bucket width)
        n_next = st.admitted + n_retries
        buckets = max(1, min(cfg.state_buckets, n_next // 20_000 + 1))
        new_frontier = new_frontier.repartition(
            buckets, F.pmod(F.xxhash64("domain"), F.lit(cfg.state_buckets)))

        # -- domain counts (A2) ----------------------------------------------
        batch_counts = (batch.filter(~F.col("is_retry"))
                        .groupBy("domain").agg(F.count("*").alias("cnt")))
        merged = (domain_counts.unionByName(batch_counts)
                  .groupBy("domain").agg(F.sum("cnt").alias("cnt")))

        # -- run the five independent output jobs concurrently: each is a
        # small action over the already-checkpointed links/fetched, and the
        # Spark scheduler interleaves their stages, so round turnaround pays
        # max() of the writes instead of their sum (plus better slot
        # utilization — none of these fills the cluster on its own)
        from concurrent.futures import ThreadPoolExecutor
        jobs = {
            "crawled": lambda: self.store.write_table(
                "crawled", crawled.coalesce(_width(st.fetched)), r),
            "disallowed": lambda: self.store.write_table(
                "disallowed", disallowed.coalesce(_width(st.links_extracted)), r),
            "seen": lambda: self.store.write_table(
                "seen", seen_new.coalesce(_width(st.links_extracted, 200_000)), r),
            "frontier": lambda: self.store.write_table(
                "frontier", new_frontier, r),
            "domain_counts": lambda: self.store.write_table(
                "domain_counts", merged.coalesce(buckets), r),
        }
        with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
            futures = [pool.submit(fn) for fn in jobs.values()]
            for f in futures:
                f.result()
        n_pending_left, n_pending_left_nonretry = (
            self._pending_left if pending is not None else (0, 0))
        _mark("write_outputs")

        # -- incremental Bloom sidecar merge: fold THIS round's new hashes
        # (read back from the just-written seen partition — no recompute)
        # into the per-bucket blobs; cost is O(new keys + B blobs) per
        # round, never a full-seen rebuild. Blobs persist driver-side for
        # resume (write_pandas, no Spark job).
        if self.use_bloom_prefilter and self._sidecar_bucketed:
            # bucketed mode: merge entirely on the cluster — read the previous
            # sidecar table, fold new hashes, write the new round's table.
            # No blob ever reaches the driver. localCheckpoint breaks lineage
            # to the input files before the (possibly same-path) overwrite.
            from .operators.seenfilter import merge_bloom_sidecar
            import os as _os
            old = spark.read.parquet(_os.path.join(
                self.store.root, "bloom_sidecar",
                f"round={self._sidecar_round}"))
            merged = merge_bloom_sidecar(
                old, self.store.read_table(spark, "seen", r),
                buckets=cfg.state_buckets).localCheckpoint(eager=True)
            self.store.write_table("bloom_sidecar", merged, r)
            self._sidecar_round = r
            _mark("sidecar_merge")
        elif self.use_bloom_prefilter and self._sidecar is not None:
            from .operators.seenfilter import (BLOOM_SCHEMA,
                                               merge_bloom_sidecar,
                                               sidecar_blob_bytes)
            old = spark.createDataFrame(
                [(b, n, blob) for b, (n, blob) in self._sidecar.items()],
                BLOOM_SCHEMA)
            merged = merge_bloom_sidecar(
                old, self.store.read_table(spark, "seen", r),
                buckets=cfg.state_buckets)
            self._sidecar = {
                int(x["bucket"]): (int(x["n_keys"]),
                                   bytes(x["blob"])
                                   if x["blob"] is not None else None)
                for x in merged.collect()}
            import pandas as pd
            self.store.write_pandas("bloom_sidecar", pd.DataFrame(
                [{"bucket": b, "n_keys": n, "blob": blob}
                 for b, (n, blob) in self._sidecar.items()]), r)
            self._sidecar_round = r
            if sidecar_blob_bytes(self._sidecar) > \
                    cfg.bloom_broadcast_max_bytes:
                # grown past the broadcast ceiling: the table just written is
                # authoritative from here on; free the driver copy
                self._sidecar = None
                self._sidecar_bucketed = True
            _mark("sidecar_merge")

        # -- lineage + metrics: tiny, written driver-side (no Spark jobs) ----
        st.retries = n_retries
        import pandas as pd
        for row in lineage_rows:
            row["round"] = r
        self.store.write_pandas(
            "lineage",
            pd.DataFrame(lineage_rows, columns=[
                "partition_id", "links_seen", "deduped", "robots_denied",
                "depth_pruned", "budget_denied", "admitted", "round"]), r)
        self.store.write_pandas("metrics", pd.DataFrame([{
            "round": r, "fetched": st.fetched, "links": st.links_extracted,
            "deduped": st.deduped, "robots_denied": st.robots_denied,
            "budget_denied": st.budget_denied, "admitted": st.admitted,
            "crawled_total": self.crawled_count}]), r)

        # frontier size for the next round, without a count job
        self.pending_total = st.admitted + n_retries + n_pending_left
        self.pending_non_retry = st.admitted + n_pending_left_nonretry

        self.round = r
        self._maybe_compact_seen(r)
        self.store.commit_round(r, self._counters())
        self._finalize_seen_compaction()
        st.counters = self._counters()

    def _maybe_compact_seen(self, r: int) -> None:
        """Consolidate the last ``seen_compact_every`` per-round seen appends
        into one directory. BOUNDED incremental merge: earlier consolidated
        chunks are never re-read or rewritten, so per-compaction cost is
        O(those rounds' appends) regardless of total seen size — at 10^10
        rows a full-table rewrite would be a recurring full-table job.
        The union-read stays O(rounds / interval) directories; Iceberg would
        do the same as snapshot compaction. No distinct() needed: per-round
        appends are anti-joined before write, so the dirs are disjoint.

        Crash safety: this only STAGES the merged dir (a dot-dir that
        ``_read_seen`` ignores); committed source dirs are deleted AFTER
        ``commit_round`` in ``_finalize_seen_compaction``, and a swap
        interrupted mid-way is completed idempotently by
        ``_repair_seen_compaction`` on resume — so no window exists in
        which committed seen state lives only in an uncommitted dir
        (Iceberg gets the same guarantee from snapshot-pointer commits)."""
        every = max(self.cfg.seen_compact_every, 0)
        if every == 0 or r % every != 0 or r == 0:
            return
        import os
        import shutil
        base = os.path.join(self.store.root, "seen")
        recent = [d for d in os.listdir(base)
                  if d.startswith("round=")
                  and r - every < int(d.split("=")[1]) <= r]
        if len(recent) <= 1:
            return
        lo = min(int(d.split("=")[1]) for d in recent)
        staging = os.path.join(base, f".compact-{lo}-{r}")
        shutil.rmtree(staging, ignore_errors=True)
        paths = [os.path.join(base, d) for d in sorted(recent)]
        merged = self.spark.read.parquet(*paths)
        (merged.coalesce(max(1, merged.rdd.getNumPartitions() // len(recent)))
         .write.mode("overwrite").parquet(staging))
        self._compact_staged = (base, staging, lo, r)

    def _finalize_seen_compaction(self) -> None:
        staged = getattr(self, "_compact_staged", None)
        if staged is None:
            return
        self._compact_staged = None
        _swap_compacted_seen(*staged)

    def _repair_seen_compaction(self, last: int) -> None:
        """Finish (or discard) a compaction swap interrupted by a crash: a
        staged dir for a committed round is swapped in (idempotent — the
        staging dir holds the full union, so partially-deleted sources are
        fine); one for an uncommitted round is discarded (its committed
        sources are still intact and the round replays)."""
        import os
        import shutil
        base = os.path.join(self.store.root, "seen")
        if not os.path.isdir(base):
            return
        for d in os.listdir(base):
            if not d.startswith(".compact-"):
                continue
            lo, hi = (int(x) for x in d[len(".compact-"):].split("-"))
            staging = os.path.join(base, d)
            if hi <= last:
                _swap_compacted_seen(base, staging, lo, hi)
            else:
                shutil.rmtree(staging, ignore_errors=True)


def _swap_compacted_seen(base: str, staging: str, lo: int, hi: int) -> None:
    """Replace seen round dirs lo..hi with the staged merged dir (renamed to
    round=hi). Idempotent: staging holds the full union of the sources, so
    re-running after a crash at any point converges to the same layout."""
    import os
    import shutil
    for k in range(lo, hi + 1):
        shutil.rmtree(os.path.join(base, f"round={k}"), ignore_errors=True)
    os.rename(staging, os.path.join(base, f"round={hi}"))
