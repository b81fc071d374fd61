"""Unigram-LM Viterbi segmentation (functions/unigram.py): codegen-fold
vs Arrow-path vs sequential-Python parity, tie-break order, filtering,
and plan shape (zero Python / zero shuffle in the codegen path)."""

import random

import pytest
from pyspark.sql import functions as F

from abot_dotnet_core_spark.functions.unigram import (
    MAX_WORD_LEN, UNIGRAM_ARROW_THRESHOLD, UNIGRAM_VOCAB,
    viterbi_segment_words)


def ref_segment(w, vocab):
    """Sequential reference: identical (score, n, path) lexicographic
    objective as both engine paths."""
    scores = dict(vocab)
    max_tok = max(len(t) for t in scores)
    dp = [None] * (len(w) + 1)
    dp[0] = (0, 0, "")
    for i in range(1, len(w) + 1):
        best = None
        for ln in range(1, min(max_tok, i) + 1):
            prev = dp[i - ln]
            if prev is None:
                continue
            m = scores.get(w[i - ln:i])
            if m is None:
                continue
            cand = (prev[0] + m, prev[1] + 1, prev[2] + w[i - ln:i] + ".")
            if best is None or cand < best:
                best = cand
        dp[i] = best
    r = dp[len(w)]
    return (w, r[2][:-1], r[1], r[0]) if r else None


def run(spark, words, vocab=None, arrow=None):
    df = spark.createDataFrame([(w,) for w in words], "word string")
    out = viterbi_segment_words(df, vocab=vocab, arrow=arrow)
    return sorted((r["word"], r["pieces"], r["n_pieces"], r["score_milli"])
                  for r in out.collect())


class TestParity:
    def test_default_vocab_words(self, spark):
        words = ["table", "customer", "window", "stream", "query", "a",
                 "zzzz", "spark", "agg", "xqjvz"]
        exp = sorted(ref_segment(w, UNIGRAM_VOCAB) for w in words)
        assert run(spark, words) == exp
        assert run(spark, words, arrow=True) == exp

    def test_random_words_both_paths(self, spark):
        rng = random.Random(42)
        words = list({"".join(rng.choice("abcdelmnorstuw")
                              for _ in range(rng.randint(1, MAX_WORD_LEN)))
                      for _ in range(120)})
        exp = sorted(ref_segment(w, UNIGRAM_VOCAB) for w in words)
        assert run(spark, words) == exp
        assert run(spark, words, arrow=True) == exp

    def test_random_vocab(self, spark):
        rng = random.Random(7)
        vocab = [(c, 5000) for c in "abcdef"]
        seen = {t for t, _ in vocab}
        for _ in range(40):
            t = "".join(rng.choice("abcdef")
                        for _ in range(rng.randint(2, 4)))
            if t not in seen:
                seen.add(t)
                vocab.append((t, rng.randint(3000, 9000)))
        words = list({"".join(rng.choice("abcdef")
                              for _ in range(rng.randint(1, 12)))
                      for _ in range(80)})
        exp = sorted(ref_segment(w, vocab) for w in words)
        assert run(spark, words, vocab=vocab) == exp
        assert run(spark, words, vocab=vocab, arrow=True) == exp


class TestSemantics:
    def test_score_beats_piece_count(self, spark):
        # "abab": one 4-gram at 9000 loses to two cheap 2-grams at 4000
        vocab = [("a", 5000), ("b", 5000), ("ab", 2000), ("abab", 9000)]
        [(_, pieces, n, score)] = run(spark, ["abab"], vocab=vocab)
        assert (pieces, n, score) == ("ab.ab", 2, 4000)

    def test_tie_prefers_fewer_pieces(self, spark):
        # both segmentations cost 10000; the single piece wins
        vocab = [("a", 5000), ("aa", 10000)]
        [(_, pieces, n, score)] = run(spark, ["aa"], vocab=vocab)
        assert (pieces, n, score) == ("aa", 1, 10000)

    def test_tie_prefers_lexicographic_path(self, spark):
        # score and piece count tie: "a.bc" < "ab.c"
        vocab = [("a", 5000), ("b", 5000), ("c", 5000),
                 ("ab", 4000), ("bc", 4000)]
        [(_, pieces, n, score)] = run(spark, ["abc"], vocab=vocab)
        assert (pieces, n, score) == ("a.bc", 2, 9000)
        assert run(spark, ["abc"], vocab=vocab, arrow=True)[0][1] == "a.bc"

    def test_filters_nonmatching_words(self, spark):
        out = run(spark, ["ok", "Nope", "has space", "x" * 13, ""])
        assert [r[0] for r in out] == ["ok"]

    def test_unreachable_word_null_row_arrow(self, spark):
        # vocab without 'z': codegen yields NULL struct fields, Arrow
        # yields NULL columns — both keep the row
        vocab = [("a", 5000)]
        for arrow in (False, True):
            out = run(spark, ["az"], vocab=vocab, arrow=arrow)
            assert out == [("az", None, None, None)]


class TestPlanAndRouting:
    def test_codegen_plan_no_python_no_exchange(self, spark):
        df = spark.createDataFrame([("table",)], "word string")
        plan = viterbi_segment_words(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Python" not in plan
        assert "Exchange" not in plan

    def test_large_vocab_routes_to_arrow(self, spark):
        alpha = "abcdefghijklmnopqrstuvwxyz"
        vocab = [(c, 5000) for c in alpha]
        i = 0
        while len(vocab) <= UNIGRAM_ARROW_THRESHOLD:
            a, b = divmod(i, 26)
            vocab.append((alpha[a % 26] + alpha[b] + alpha[(a // 26) % 26],
                          6000 + i))
            i += 1
        assert len(dict(vocab)) == len(vocab)  # distinct tokens
        df = spark.createDataFrame([("table",)], "word string")
        plan = viterbi_segment_words(df, vocab=vocab)._jdf \
            .queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan

    def test_default_vocab_stays_codegen(self, spark):
        assert len(UNIGRAM_VOCAB) <= UNIGRAM_ARROW_THRESHOLD


class TestRefit:
    def test_refit_matches_sequential_mirror(self, spark):
        from abot_dotnet_core_spark.functions.unigram import unigram_refit
        rng = random.Random(3)
        words = list({"".join(rng.choice("abcdelmnorstuw")
                              for _ in range(rng.randint(1, 12)))
                      for _ in range(60)})
        counts = {w: rng.randint(1, 9) for w in words}
        df = spark.createDataFrame(list(counts.items()),
                                   "word string, cnt long")
        got = [(r["piece"], r["piece_count"], r["new_score_milli"])
               for r in unigram_refit(df).collect()]
        # sequential mirror
        pc: dict[str, int] = {}
        for w, c in counts.items():
            seg = ref_segment(w, UNIGRAM_VOCAB)
            for p in seg[1].split("."):
                pc[p] = pc.get(p, 0) + c
        total = sum(pc.values())
        exp = sorted(((p, c, total * 1000 // c) for p, c in pc.items()),
                     key=lambda r: (-r[1], r[0]))
        assert got == exp

    def test_refit_ordering_deterministic(self, spark):
        from abot_dotnet_core_spark.functions.unigram import unigram_refit
        df = spark.createDataFrame(
            [("ab", 3), ("ba", 3)], "word string, cnt long")
        vocab = [("a", 5000), ("b", 5000)]
        rows = [(r["piece"], r["piece_count"], r["new_score_milli"])
                for r in unigram_refit(df, vocab=vocab).collect()]
        # 'a' and 'b' tie on count 6 -> piece asc breaks the tie
        assert rows == [("a", 6, 2000), ("b", 6, 2000)]


class TestLongTokens:
    def test_vocab_with_six_char_pieces(self, spark):
        # window generalizes past 4: a 6-char piece must win end-to-end
        vocab = [(c, 5000) for c in "abcdef"] + [("abcdef", 9000)]
        words = ["abcdef", "abcdefab", "fedcba"]
        exp = sorted(ref_segment(w, vocab) for w in words)
        assert run(spark, words, vocab=vocab) == exp
        assert run(spark, words, vocab=vocab, arrow=True) == exp
        assert run(spark, ["abcdef"], vocab=vocab)[0][1] == "abcdef"

    def test_singles_only_vocab(self, spark):
        vocab = [(c, 5000) for c in "ab"]
        assert run(spark, ["abba"], vocab=vocab) == \
            [("abba", "a.b.b.a", 4, 20000)]


def ref_wordpiece(w, vocab):
    scores = dict(vocab)
    max_tok = max(len(t) for t in scores)
    i, n, path = 0, 0, []
    while i < len(w):
        for ln in range(min(max_tok, len(w) - i), 0, -1):
            if w[i:i + ln] in scores:
                path.append(w[i:i + ln])
                n += 1
                i += ln
                break
        else:
            return (w, None, None)
    return (w, ".".join(path), n)


class TestWordpiece:
    def test_greedy_differs_from_viterbi(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        df = spark.createDataFrame([("table",)], "word string")
        [r] = wordpiece_encode(df).collect()
        assert r["pieces"] == "tabl.e"      # Viterbi gives ta.ble
        [v] = viterbi_segment_words(df).collect()
        assert v["pieces"] == "ta.ble"

    def test_stuck_word_yields_null(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        vocab = [("ab", 1), ("a", 1), ("bc", 1)]
        for arrow in (False, True):
            df = spark.createDataFrame([("abc",)], "word string")
            [r] = wordpiece_encode(df, vocab=vocab, arrow=arrow).collect()
            assert (r["pieces"], r["n_pieces"]) == (None, None)

    def test_random_parity_both_paths(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        rng = random.Random(11)
        vocab = [(c, 1) for c in "abcd"] + \
            [("ab", 1), ("bcd", 1), ("abcd", 1), ("dd", 1), ("ddda", 1)]
        # drop 'c' singles so greedy can actually get stuck
        vocab = [(t, s) for t, s in vocab if t != "c"]
        words = list({"".join(rng.choice("abcd")
                              for _ in range(rng.randint(1, 12)))
                      for _ in range(100)})
        exp = sorted(ref_wordpiece(w, vocab) for w in words)
        for arrow in (False, True):
            df = spark.createDataFrame([(w,) for w in words], "word string")
            got = sorted((r["word"], r["pieces"], r["n_pieces"])
                         for r in wordpiece_encode(
                             df, vocab=vocab, arrow=arrow).collect())
            assert got == exp, arrow

    def test_codegen_plan_clean(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        df = spark.createDataFrame([("table",)], "word string")
        plan = wordpiece_encode(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan


class TestTrain:
    def test_train_matches_sequential_mirror(self, spark):
        from abot_dotnet_core_spark.functions.unigram import unigram_train
        rng = random.Random(5)
        words = list({"".join(rng.choice("abcdmrst")
                              for _ in range(rng.randint(1, 10)))
                      for _ in range(50)})
        counts = {w: rng.randint(1, 8) for w in words}
        df = spark.createDataFrame(list(counts.items()),
                                   "word string, cnt long")
        got = [(r["piece"], r["piece_count"], r["score_milli"])
               for r in unigram_train(df, n_iters=2, top_n=30).collect()]

        # ---- sequential mirror of the whole loop ----
        chars = sorted({c for w in words for c in w})
        sub_cnt: dict[str, int] = {}
        for w, c in counts.items():
            for ln in (2, 3, 4):
                for s in range(len(w) - ln + 1):
                    t = w[s:s + ln]
                    sub_cnt[t] = sub_cnt.get(t, 0) + c
        ranked = sorted(sub_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
        vocab = [(ch, 5000) for ch in chars] + \
            [(t, 2000 * len(t) + rank)
             for rank, (t, _) in enumerate(ranked, start=1)]
        for _ in range(2):
            pc: dict[str, int] = {}
            for w, c in counts.items():
                seg = ref_segment(w, vocab)
                if seg is None or seg[1] is None:
                    continue
                for p in seg[1].split("."):
                    pc[p] = pc.get(p, 0) + c
            total = sum(pc.values())
            scores = {p: total * 1000 // c for p, c in pc.items()}
            penalty = max(scores.values()) + 1000
            vocab = sorted(scores.items()) + \
                [(ch, penalty) for ch in chars if ch not in scores]
        exp = sorted(((p, pc[p], scores[p]) for p in pc),
                     key=lambda r: (-r[1], r[0]))
        assert got == exp

    def test_train_empty_input_returns_empty_vocab(self, spark):
        # ADVICE r5: zero [a-z]{1,12} words must yield an empty vocab
        # DataFrame, not a ValueError from max() on an empty sequence
        from abot_dotnet_core_spark.functions.unigram import unigram_train
        for rows in ([], [("HTTP-404!", 3), ("1234", 1),
                          ("waylongerthantwelvechars", 2)]):
            df = spark.createDataFrame(rows, "word string, cnt long")
            out = unigram_train(df, n_iters=2, top_n=5)
            assert out.count() == 0
            assert [f.name for f in out.schema.fields] == \
                ["piece", "piece_count", "score_milli"]

    def test_train_keeps_all_words_segmentable(self, spark):
        from abot_dotnet_core_spark.functions.unigram import (
            unigram_train, viterbi_segment_words)
        df = spark.createDataFrame(
            [("qqqq", 1), ("qx", 1)], "word string, cnt long")
        out = unigram_train(df, n_iters=2, top_n=5).collect()
        vocab = [(r["piece"], r["score_milli"]) for r in out]
        # chars 'q'/'x' survive (possibly at penalty) -> both words segment
        seg = viterbi_segment_words(df, vocab=vocab).collect()
        assert all(r["pieces"] is not None for r in seg)


class TestWordpieceContinuation:
    def test_bert_style_continuation(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        vocab = [("un", 1), ("runnable", 1), ("r", 1)]
        cont = [("runnable", 1), ("able", 1), ("nable", 1)]
        df = spark.createDataFrame([("unrunnable",)], "word string")
        for arrow in (False, True):
            [r] = wordpiece_encode(df, vocab=vocab, cont_vocab=cont,
                                   arrow=arrow).collect()
            assert (r["pieces"], r["n_pieces"]) == ("un.##runnable", 2), \
                arrow

    def test_initial_only_piece_not_matched_mid_word(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        # 'ab' is initial-only; at position 3 only cont pieces match, and
        # cont has no piece for 'ab' -> stuck -> NULL
        vocab = [("ab", 1)]
        cont = [("cd", 1)]
        df = spark.createDataFrame([("abab",), ("abcd",)], "word string")
        for arrow in (False, True):
            rows = {r["word"]: (r["pieces"], r["n_pieces"])
                    for r in wordpiece_encode(
                        df, vocab=vocab, cont_vocab=cont,
                        arrow=arrow).collect()}
            assert rows["abab"] == (None, None), arrow
            assert rows["abcd"] == ("ab.##cd", 2), arrow

    def test_random_parity_with_mirror(self, spark):
        from abot_dotnet_core_spark.functions.unigram import wordpiece_encode
        rng = random.Random(17)
        init_v = [(c, 1) for c in "abc"] + [("ab", 1), ("abc", 1)]
        cont_v = [(c, 1) for c in "bc"] + [("bc", 1), ("cb", 1), ("aa", 1)]

        def mirror(w):
            iv, cv = dict(init_v), dict(cont_v)
            i, n, path = 0, 0, []
            while i < len(w):
                tbl = iv if i == 0 else cv
                pfx = "" if i == 0 else "##"
                for ln in range(min(4, len(w) - i), 0, -1):
                    if w[i:i + ln] in tbl:
                        path.append(pfx + w[i:i + ln])
                        n += 1
                        i += ln
                        break
                else:
                    return (w, None, None)
            return (w, ".".join(path), n)

        words = list({"".join(rng.choice("abc")
                              for _ in range(rng.randint(1, 12)))
                      for _ in range(80)})
        exp = sorted(mirror(w) for w in words)
        for arrow in (False, True):
            df = spark.createDataFrame([(w,) for w in words], "word string")
            got = sorted((r["word"], r["pieces"], r["n_pieces"])
                         for r in wordpiece_encode(
                             df, vocab=init_v, cont_vocab=cont_v,
                             arrow=arrow).collect())
            assert got == exp, arrow
