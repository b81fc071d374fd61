"""Unit tests for distributed BPE training: the Sennrich et al. (2016)
reference example, greedy non-overlapping merge semantics, deterministic
tiebreaks, and early stop when the vocab runs out of pairs."""

from pyspark.sql import Row


def _words(spark, counts):
    return spark.createDataFrame(
        [Row(word=w, cnt=c) for w, c in counts.items()],
        schema="word string, cnt long")


class TestBpeTrain:
    def test_sennrich_example(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        words = _words(spark, {"low": 5, "lower": 2,
                               "newest": 6, "widest": 3})
        out = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_train(words, n_merges=5)
               .orderBy("rank").collect()]
        # ranks 1-3: the es/est/est</w> chain at count 9 (ties broken by
        # pair asc), then the low/lower stem at 7
        assert out == [(1, "e", "s", 9),
                       (2, "es", "t", 9),
                       (3, "est", "</w>", 9),
                       (4, "l", "o", 7),
                       (5, "lo", "w", 7)]

    def test_greedy_nonoverlap(self, spark):
        from abot_dotnet_core_spark.functions.bpe import (bpe_segment,
                                                          bpe_train)
        words = _words(spark, {"aaaa": 1})
        out = bpe_train(words, n_merges=1).collect()
        assert (out[0].left_sym, out[0].right_sym,
                out[0].pair_count) == ("a", "a", 3)
        seg = bpe_segment(words, [("a", "a")]).collect()[0]
        assert seg.syms == ["aa", "aa", "</w>"]  # NOT [aa, a, a...] overlap

    def test_early_stop_when_pairs_exhausted(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        out = bpe_train(_words(spark, {"a": 1}), n_merges=5).collect()
        assert len(out) == 1
        assert (out[0].left_sym, out[0].right_sym) == ("a", "</w>")

    def test_chained_merges_segment(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_segment
        seg = bpe_segment(_words(spark, {"lowest": 1}),
                          [("e", "s"), ("es", "t"), ("est", "</w>"),
                           ("l", "o"), ("lo", "w")]).collect()[0]
        assert seg.syms == ["low", "est</w>"]


def _naive_apply(word, merges):
    """Trusted reference: the codegen chain's semantics verbatim — every
    merge applied in rank order as one greedy leftmost pass."""
    from abot_dotnet_core_spark.functions.bpe import (END_MARK,
                                                      _merge_pass_py)
    syms = list(word) + [END_MARK]
    for left, right in merges:
        syms = _merge_pass_py(syms, left, right)
    return syms


def _train_py(counts, n_merges):
    """Mini pure-Python BPE trainer (same tiebreak as bpe_train: count
    desc, then pair lexicographic asc) to mint realistic merge lists."""
    from abot_dotnet_core_spark.functions.bpe import (END_MARK,
                                                      _merge_pass_py)
    vocab = [(tuple(w) + (END_MARK,), c) for w, c in counts.items()]
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in vocab:
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = [(tuple(_merge_pass_py(list(s), *best)), c)
                 for s, c in vocab]
    return merges


class TestBpeArrowPath:
    """The >BPE_ARROW_THRESHOLD mapInPandas path: identical semantics to
    the chained-fold codegen projection, one Python eval in the plan."""

    def test_sequential_order_not_min_rank(self):
        # rank-2 merge (a,b) creates the pair of the ALREADY-PASSED rank-1
        # merge (ab,c); sequential semantics leave it unmerged (GPT-2-style
        # min-rank-present iteration would merge it -- that is NOT the
        # codegen chain's semantics).
        from abot_dotnet_core_spark.functions.bpe import (_apply_merges_py,
                                                          _merge_ranks)
        merges = [("ab", "c"), ("a", "b")]
        got = _apply_merges_py(list("abc") + ["</w>"], merges,
                               _merge_ranks(merges))
        assert got == ["ab", "c", "</w>"]
        assert got == _naive_apply("abc", merges)

    def test_duplicate_pair_ranks(self):
        # the same pair listed twice DOES re-apply at its second rank if
        # intermediate merges recreated it
        from abot_dotnet_core_spark.functions.bpe import (_apply_merges_py,
                                                          _merge_ranks)
        merges = [("b", "c"), ("a", "bc"), ("b", "c")]
        for word in ("abcbc", "bcbc", "abc", "bcb"):
            assert _apply_merges_py(list(word) + ["</w>"], merges,
                                    _merge_ranks(merges)) \
                == _naive_apply(word, merges), word

    def test_skip_scan_matches_naive_randomized(self):
        import random
        from abot_dotnet_core_spark.functions.bpe import (_apply_merges_py,
                                                          _merge_ranks)
        rng = random.Random(11)
        for trial in range(200):
            alpha = "abcd"
            pool = list(alpha)
            merges = []
            for _ in range(rng.randint(1, 25)):
                l, r = rng.choice(pool), rng.choice(pool)
                merges.append((l, r))
                pool.append(l + r)
            ranks = _merge_ranks(merges)
            word = "".join(rng.choice(alpha)
                           for _ in range(rng.randint(1, 12)))
            assert _apply_merges_py(list(word) + ["</w>"], merges, ranks) \
                == _naive_apply(word, merges), (word, merges)

    def test_parity_codegen_vs_arrow(self, spark):
        counts = {w: i + 1 for i, w in enumerate(
            ["low", "lower", "newest", "widest", "lowest", "news",
             "widow", "wide", "stone", "tone", "stones", "widows"])}
        merges = _train_py(counts, 8)  # <= threshold: codegen viable
        from abot_dotnet_core_spark.functions.bpe import (bpe_encode_words,
                                                          bpe_segment)
        df = _words(spark, counts)
        for fn, key in ((bpe_segment, lambda r: (r.cnt, tuple(r.syms))),
                        (bpe_encode_words,
                         lambda r: (r.word, r.cnt, r.n_tokens, r.encoded))):
            a = sorted(map(key, fn(df, merges, arrow=False).collect()))
            b = sorted(map(key, fn(df, merges, arrow=True).collect()))
            assert a == b

    def test_arrow_at_1500_merges_matches_naive(self, spark):
        """The production regime the codegen chain cannot reach: a learned
        ~1.5k-rule merge list applied via the Arrow path, checked word by
        word against the naive in-order reference."""
        import random
        rng = random.Random(3)
        counts = {}
        for _ in range(400):
            w = "".join(rng.choice("abcdefghijkl")
                        for _ in range(rng.randint(4, 14)))
            counts[w] = rng.randint(1, 50)
        merges = _train_py(counts, 1500)
        assert len(merges) >= 1000, len(merges)
        from abot_dotnet_core_spark.functions.bpe import bpe_encode_words
        df = _words(spark, counts)
        out = {r.word: (r.n_tokens, r.encoded)
               for r in bpe_encode_words(df, merges).collect()}
        assert len(out) == len(counts)
        n_tokens_total = 0
        for w in counts:
            want = _naive_apply(w, merges)
            assert out[w] == (len(want), " ".join(want)), w
            n_tokens_total += len(want)
        # the merge list genuinely compresses (most words collapse)
        raw = sum(len(w) + 1 for w in counts)
        assert n_tokens_total < raw / 2

    def test_arrow_plan_single_python_eval(self, spark):
        from abot_dotnet_core_spark.functions.bpe import (BPE_ARROW_THRESHOLD,
                                                          bpe_encode_words,
                                                          bpe_segment)
        from abot_dotnet_core_spark.plans.inspect import simple_plan
        df = _words(spark, {"lowest": 1, "newest": 2})
        merges = [(chr(97 + i), chr(98 + i))
                  for i in range(BPE_ARROW_THRESHOLD + 5)]
        for fn in (bpe_segment, bpe_encode_words):
            plan = simple_plan(fn(df, merges))
            assert plan.count("MapInPandas") == 1, plan
            assert "aggregate(" not in plan, plan  # no chained HOF layers
            assert "Exchange" not in plan, plan    # still row-local
        # below threshold stays pure codegen
        plan = simple_plan(bpe_segment(df, merges[:3]))
        assert "MapInPandas" not in plan and "Python" not in plan, plan


class TestLocalTrainGate:
    """Driver-local training fast path (BPE_LOCAL_TRAIN_THRESHOLD)."""

    def test_local_vs_distributed_parity_with_ties(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        # heavy tie pressure: many equal-count pairs force the
        # count-desc/left-asc/right-asc tiebreak on both paths
        words = _words(spark, {"abab": 3, "baba": 3, "abba": 3,
                               "cc": 7, "ccc": 1, "dcd": 2, "xyzzy": 4})
        key = lambda r: (r.rank, r.left_sym, r.right_sym, r.pair_count)
        a = sorted(map(key, bpe_train(words, n_merges=8,
                                      local=True).collect()))
        b = sorted(map(key, bpe_train(words, n_merges=8,
                                      local=False).collect()))
        assert a == b and len(a) == 8

    def test_auto_gate_small_vocab_runs_local(self, spark):
        from abot_dotnet_core_spark.functions import bpe as B
        words = _words(spark, {"low": 5, "newest": 6})
        calls = []
        orig = B._train_local
        try:
            B._train_local = lambda v, n: calls.append(len(v)) or orig(v, n)
            out = B.bpe_train(words, n_merges=2).collect()
        finally:
            B._train_local = orig
        assert calls == [2] and len(out) == 2

    def test_sennrich_example_local(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        words = _words(spark, {"low": 5, "lower": 2,
                               "newest": 6, "widest": 3})
        out = [(r.rank, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_train(words, n_merges=5, local=True)
               .orderBy("rank").collect()]
        assert out == [(1, "e", "s", 9),
                       (2, "es", "t", 9),
                       (3, "est", "</w>", 9),
                       (4, "l", "o", 7),
                       (5, "lo", "w", 7)]

    def test_early_stop_when_pairs_exhausted(self, spark):
        from abot_dotnet_core_spark.functions.bpe import bpe_train
        out = bpe_train(_words(spark, {"a": 1}), n_merges=5,
                        local=True).collect()
        # only pair is (a, </w>); after merging it nothing remains
        assert len(out) == 1
