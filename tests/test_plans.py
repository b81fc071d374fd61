"""Scale-plan assertions: pushdown, pruning, broadcast, no cartesian."""

import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.plans import inspect as P
from abot_dotnet_core_spark.plans.inspect import formatted_plan, simple_plan

SF = "/root/testdata/sf0.01"


class TestPushdownAndPruning:
    def test_filter_pushed_to_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
        P.assert_pushed_filter(df, "l_quantity")

    def test_column_pruned(self, spark):
        # 2-column projection must not read the wide comment-ish columns
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        df = li.select("l_orderkey", "l_quantity")
        P.assert_read_schema_excludes(df, "l_extendedprice")

    def test_html_binary_never_read_in_admission(self, spark, tiny_corpus_dir):
        # the engine's admission path reads corpus_meta only; when it touches
        # the corpus it must project url+html, not text/lang
        corpus = spark.read.parquet(f"{tiny_corpus_dir}/corpus.parquet")
        admission_side = corpus.select("url")
        P.assert_read_schema_excludes(admission_side, "html")
        P.assert_read_schema_excludes(admission_side, "text")


class TestJoins:
    def test_broadcast_dim_join(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        nation = spark.read.parquet(f"{SF}/nation.parquet")
        supplier = spark.read.parquet(f"{SF}/supplier.parquet")
        df = (li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
              .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
              .groupBy("n_name").count())
        P.assert_broadcast_join(df)
        P.assert_no_cartesian(df)

    def test_seen_antijoin_shape(self, spark):
        import __spark_entry__ as e
        df = e.q_seen_antijoin(spark, SF)
        plan = P.simple_plan(df)
        assert "LeftAnti" in plan, plan

    def test_hash_aggregate_in_relational_core(self, spark):
        # partial (map-side) + final aggregation must both be hash-based
        import __spark_entry__ as e
        plan = P.simple_plan(e.q_tpch_q1(spark, SF))
        assert "HashAggregate" in plan, plan


class TestBigRoundFetchPlan:
    def test_extract_runs_on_scan_no_exchange(self, spark, tiny_corpus_dir):
        """The big-round fetch property: Bloom queue filter + extraction UDF
        execute IN the corpus scan stage — the plan fragment from FileScan to
        the Arrow UDF eval must contain no Exchange (html never shuffles)."""
        from pyspark.sql import functions as F
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.functions.udfs import make_extract_page_udf
        from abot_dotnet_core_spark.operators.seenfilter import (
            build_hash_bloom, make_hash_bloom_member_udf)
        from abot_dotnet_core_spark.plans.inspect import simple_plan

        corpus = (spark.read.parquet(f"{tiny_corpus_dir}/corpus.parquet")
                  .select("url", "html"))
        m, k, bits = build_hash_bloom(
            corpus.limit(10).select(F.xxhash64("url").alias("h")), "h",
            capacity=1024)
        member = make_hash_bloom_member_udf(spark, m, k, bits)
        udf = make_extract_page_udf(CrawlConfig())
        ext = (corpus.filter(member(F.xxhash64("url")))
               .withColumn("__pg", udf(
                   F.col("html"), F.lit(None).cast("string"), F.col("url"),
                   F.lit(True), F.lit(None).cast("string")))
               .select("url", F.col("__pg.text_md5").alias("text_md5")))
        plan = simple_plan(ext)
        assert "Exchange" not in plan, plan
        assert "ArrowEvalPython" in plan or "EvalPython" in plan, plan
        assert "FileScan" in plan or "Scan parquet" in plan, plan

    def test_arrow_extract_runs_on_scan_no_exchange(self, spark,
                                                    tiny_corpus_dir):
        """Same property for the mapInArrow implementation (the default
        big-round extraction): Bloom filter + extraction in the scan stage,
        zero Exchange."""
        from pyspark.sql import functions as F
        from abot_dotnet_core_spark.config import CrawlConfig
        from abot_dotnet_core_spark.functions.arrow_extract import \
            extract_pages_arrow
        from abot_dotnet_core_spark.operators.seenfilter import (
            build_hash_bloom, make_hash_bloom_member_udf)
        from abot_dotnet_core_spark.plans.inspect import simple_plan

        corpus = (spark.read.parquet(f"{tiny_corpus_dir}/corpus.parquet")
                  .select("url", "html"))
        m, k, bits = build_hash_bloom(
            corpus.limit(10).select(F.xxhash64("url").alias("h")), "h",
            capacity=1024)
        member = make_hash_bloom_member_udf(spark, m, k, bits)
        ext = extract_pages_arrow(
            corpus.filter(member(F.xxhash64("url"))), CrawlConfig())
        plan = simple_plan(ext)
        assert "Exchange" not in plan, plan
        assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
        assert "FileScan" in plan or "Scan parquet" in plan, plan


class TestDedupFamilyPlans:
    """Scale posture of the dedup pipeline, pinned at plan level."""

    def test_minhash_single_shuffle_all_jvm(self, spark):
        """Signatures: explode -> md5 lanes -> partial agg; exactly ONE
        Exchange (the groupBy) and zero Python in the plan."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_minhash_signatures(spark, SF))
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan and "MapInArrow" not in plan, plan

    def test_jaccard_shingles_only_for_candidate_docs(self, spark):
        """The exact-verify stage must semi-join docs down to candidate ids
        BEFORE shingling, so shuffled volume tracks |candidates| not
        |corpus| (LeftSemi below the Generate in the plan)."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_neardup_pairs(spark, SF))
        assert "LeftSemi" in plan, plan
        assert "Python" not in plan, plan

    def test_substring_dedup_text_never_shuffles(self, spark):
        """Window-hash counting shuffles 8-byte keys; the only operators
        that see the full text/token arrays are scan-side projections.
        Pinned: every Exchange in the plan carries narrow columns only."""
        import __spark_entry__ as e
        df = e.q_substring_dedup(spark, SF)
        fplan = formatted_plan(df)
        import re
        for m in re.finditer(r"Exchange (hashpartitioning|SinglePartition)"
                             r"[^\n]*", fplan):
            assert "toks" not in m.group(0) and "text" not in m.group(0), \
                m.group(0)
        assert "Python" not in simple_plan(df), fplan[:500]


class TestNewPipelinePlans:
    def test_semdedup_cluster_join_no_cartesian_no_python(self, spark):
        """SemDeDup's pair stage must be an equi-join on the cluster id
        (bucket-mates shuffle, nothing else) — never a cartesian product —
        and all vector math stays JVM-side."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_semdedup(spark, SF))
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
        assert "Python" not in plan and "MapInArrow" not in plan, plan

    def test_chunk_documents_zero_shuffle(self, spark):
        """Chunking is pure row expansion — sequence/posexplode/substring on
        the scan, no Exchange anywhere."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_chunk_documents(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Generate" in plan, plan
        assert "Python" not in plan, plan

    def test_span_dedup_agg_not_window_no_python(self, spark):
        """C4 span dedup: first-occurrence is a struct-min AGGREGATION per
        span hash (combine-reduced; a boilerplate span shared by 10^9 docs
        is one agg group), never a rank-the-group sort window; all JVM."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_span_dedup(spark, SF))
        assert "Window" not in plan, plan
        assert "Python" not in plan, plan
        assert "Aggregate" in plan, plan

    def test_fix_mojibake_zero_shuffle(self, spark):
        """Mojibake repair is one narrow codegen map — no Exchange, no
        Python, at any corpus size."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_fix_mojibake(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan

    def test_badwords_and_classifier_zero_shuffle(self, spark):
        """Both page gates are row-local HOFs over the doc's own tokens —
        no Exchange, no Python, at any corpus size."""
        import __spark_entry__ as e
        for q in (e.q_badwords_filter, e.q_quality_classifier):
            plan = simple_plan(q(spark, SF))
            assert "Exchange" not in plan, plan
            assert "Python" not in plan, plan

    def test_vocab_topk_partial_agg_takeordered(self, spark):
        """Vocabulary: ONE shuffle (the term groupBy, map-side combined) and
        a TakeOrdered top-k — no global sort of the vocabulary."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_vocab_topk(spark, SF))
        assert "TakeOrdered" in plan, plan
        assert "partial_count" in plan or "partial" in plan.lower(), plan

    def test_anchor_text_agg_no_window_partial_agg(self, spark):
        """Anchor aggregation: dominant anchor is a struct-min AGGREGATION
        (map-side combined per (target, anchor)) — no Window, no per-target
        sort; Python appears only in the extraction UDF, never after the
        explode."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_anchor_text(spark, SF))
        assert "Window" not in plan, plan
        assert "partial_min" in plan or "partial" in plan.lower(), plan

    def test_sitemap_entries_python_only_at_scan(self, spark):
        """Sitemap parse: the XML-body UDF runs before the explode; entry
        structs are all that shuffle (bodies projected away)."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_sitemap_extract(spark, SF))
        assert "Generate" in plan, plan          # posexplode of entries
        # no aggregation/shuffle at all in the explode pipeline
        assert "Exchange" not in plan, plan

    def test_boilerplate_single_udf_eval_window_per_page(self, spark):
        """Segmentation UDF runs ONCE per page (posexplode_outer avoids the
        implicit size>0 filter that duplicates Python eval); context pass is
        windows partitioned by url (page-bounded groups)."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_boilerplate_blocks(spark, SF))
        assert plan.count("ArrowEvalPython") == 1, plan
        assert "windowspecdefinition(url" in plan, plan

    def test_anchor_single_udf_eval(self, spark):
        """Mentions: one UDF eval (posexplode_outer). Aggregate: the
        (t,a,s) combine is checkpointed, so the final plan re-parses ZERO
        html even though two aggregates branch from the mentions."""
        import __spark_entry__ as e
        from abot_dotnet_core_spark.functions.anchors import anchor_mentions
        docs = spark.range(3).select(
            F.concat(F.lit('<a href="/x">t</a>')).alias("html"),
            F.concat(F.lit("http://s.test/p"), "id").alias("url"))
        mplan = simple_plan(anchor_mentions(docs))
        assert mplan.count("ArrowEvalPython") == 1, mplan
        plan = simple_plan(e.q_anchor_text(spark, SF))
        assert plan.count("ArrowEvalPython") == 0, plan

    def test_url_signals_zero_python_one_agg(self, spark):
        """Trap signals: features are row-local codegen (no Exchange, no
        Python); the domain profile is exactly one hash aggregation."""
        import __spark_entry__ as e
        fplan = simple_plan(e.q_url_shape(spark, SF))
        assert "Exchange" not in fplan and "Python" not in fplan, fplan
        splan = simple_plan(e.q_trap_signals(spark, SF))
        assert "Python" not in splan, splan
        assert splan.count("Exchange") == 1, splan


class TestRound2AdditionPlans:
    def test_soft404_zero_shuffle_no_python(self, spark):
        """Soft-404 scoring is one narrow codegen map (contains/length) —
        no Exchange, no Python, at any corpus size."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_soft404(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan

    def test_snapshot_diff_single_join_no_python(self, spark):
        """Snapshot delta is exactly one full-outer equi-join on the key —
        no cartesian, no window, no Python."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_snapshot_diff(spark, SF))
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
            + plan.count("BroadcastHashJoin") == 1, plan
        assert "FullOuter" in plan, plan
        assert "Cartesian" not in plan and "Python" not in plan, plan

    def test_host_reciprocity_pair_dim_only_no_cartesian(self, spark):
        """Reciprocity works entirely on the combine-reduced host-pair dim:
        equi-joins only (transpose semi-join + final left join), partial
        aggs, no cartesian, no Python, no window."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_host_reciprocity(spark, SF))
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
        assert "Python" not in plan and "Window" not in plan, plan
        assert "LeftSemi" in plan, plan

    def test_ann_recall_semi_join_on_topk_dims(self, spark):
        """ann_recall never touches the corpus after the top-k stages: the
        recall math is a semi-join + two hash aggs over k-row-per-query
        tables; no cartesian beyond the documented brute-force scorer."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_ann_recall(spark, SF))
        assert "LeftSemi" in plan, plan
        assert "HashAggregate" in plan, plan

    def test_gopher_quality_zero_shuffle_no_python(self, spark):
        """Every Gopher §A1.2 signal is a row-local HOF — one narrow
        codegen map, no Exchange, no Python, at any corpus size."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_gopher_quality(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan

    def test_kmv_distinct_dedup_agg_then_bounded_window(self, spark):
        """KMV: the (group, hash) dedupe is a hash aggregation with
        map-side combine (shuffle volume = distinct pairs, not
        occurrences), the top-k keep a PARTITIONED window (never a
        single-partition global sort); no Python anywhere."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_kmv_distinct(spark, SF))
        assert "Python" not in plan, plan
        assert "HashAggregate" in plan, plan
        # partitioned window: its exchange is hashpartitioning, not
        # SinglePartition
        assert "Window" in plan, plan
        assert "SinglePartition" not in plan, plan

    def test_cms_sketch_broadcast_no_cartesian_no_python(self, spark):
        """CMS: the d*w-cell sketch broadcasts into the candidate
        estimation join (it is KB-sized by construction); no cartesian,
        no Python; the final top-k is a TakeOrdered, so the only window
        runs over the k survivors."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_cms_heavy_hitters(spark, SF))
        assert "BroadcastHashJoin" in plan, plan
        assert "Cartesian" not in plan, plan
        assert "Python" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan

    def test_bpe_pair_counts_partial_agg_no_python(self, spark):
        """BPE's per-iteration pair count: explode + hash agg with
        map-side combine over the vocab table; the merge-application fold
        is pure codegen (no Python, no window)."""
        from abot_dotnet_core_spark.functions.bpe import (_pair_counts,
                                                          word_symbols)
        import __spark_entry__ as e
        docs = e._docs(spark, SF)
        words = (docs.select(F.explode(F.split(F.lower("text"), "\\s+"))
                             .alias("word"))
                 .groupBy("word").agg(F.count("*").alias("cnt")))
        plan = simple_plan(_pair_counts(word_symbols(words)))
        assert "Python" not in plan, plan
        assert "Window" not in plan, plan
        assert plan.count("HashAggregate") >= 2, plan  # partial + final

    def test_quality_cascade_one_agg_one_join_no_python(self, spark):
        """The composed cascade: all gate signals ride codegen projections
        (no Python, no window); dedup adds exactly one aggregate + one
        equi-join back, no cartesian."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_quality_cascade(spark, SF))
        assert "Python" not in plan, plan
        assert "Window" not in plan, plan
        assert "Cartesian" not in plan, plan
        joins = (plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
                 + plan.count("BroadcastHashJoin"))
        assert joins == 1, plan

    def test_registered_domain_zero_shuffle_no_python(self, spark):
        """eTLD+1 extraction is one narrow codegen map."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_registered_domain(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan

    def test_shuffle_shards_range_rank_no_single_partition_window(self, spark):
        """shuffle_shards ranks via the two-pass range sequencer (its range
        exchange is pinned behind the sequencer's localCheckpoint, so the
        visible plan is the Arrow offset pass) — what must NOT appear is any
        Window (the old key%n design ranked with a per-shard window; a naive
        global rank would be an empty-partition Window)."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_shuffle_shards(spark, SF))
        assert "Window" not in plan, plan
        assert "MapInArrow" in plan, plan


class TestRound2cAdditionPlans:
    def test_readability_zero_shuffle_no_python(self, spark):
        """Three regexp counts + arithmetic: one narrow codegen map —
        no Exchange, no Python, at any corpus size."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_readability(spark, SF))
        assert "Exchange" not in plan, plan
        assert "Python" not in plan, plan

    def test_bm25_takeordered_no_python(self, spark):
        """BM25: query-term filter before the tf hash-agg, the corpus
        stats scalar broadcasts, the top-k is a TakeOrdered (no global
        sort) and the rank window runs over the <= k survivors only."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_bm25_search(spark, SF))
        assert "Python" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_hyperball_agg_state_no_python(self, spark):
        """HyperBall: per-round state is checkpointed (plan shows scans of
        materialized RDDs, not a re-derivation cascade), summaries are
        hash aggs; no Python, no cartesian."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_hyperball(spark, SF))
        assert "Python" not in plan, plan
        assert "HashAggregate" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_spam_mass_node_join_no_python(self, spark):
        """Spam mass: the two checkpointed rank tables meet in ONE
        node-keyed equi-join; no Python, no cartesian."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_spam_mass(spark, SF))
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
            + plan.count("BroadcastHashJoin") == 1, plan


class TestRound2dAdditionPlans:
    def test_containment_reuses_jaccard_shape(self, spark):
        """Containment: candidate-only shingling (semi-join before the
        explode), long-key intersection joins, no cartesian, no Python."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_containment_pairs(spark, SF))
        assert "LeftSemi" in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "Python" not in plan, plan

    def test_funnel_no_per_stage_join_cascade(self, spark):
        """Funnel: ONE collect-agg + pivot over (user, stage) — the stage
        fold is row-local, so no join at all and no raw-stream window."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_events_funnel(spark, SF))
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
            + plan.count("BroadcastHashJoin") == 0, plan
        assert "Window" not in plan, plan

    def test_retention_two_aggs_one_join(self, spark):
        """Retention: (user, week) dedup agg + per-user min + one user-keyed
        join + final agg; no window, no Python."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_events_retention(spark, SF))
        assert "Python" not in plan, plan
        assert "Window" not in plan, plan
        assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
            + plan.count("BroadcastHashJoin") == 1, plan

    def test_corpus_report_no_python_no_cartesian(self, spark):
        """Datasheet report: row-local lang argmax + two hash-aggs + one
        group-keyed join; no UDF, no cartesian."""
        import __spark_entry__ as e
        plan = simple_plan(e.q_corpus_report(spark, SF))
        assert "Python" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "HashAggregate" in plan, plan
