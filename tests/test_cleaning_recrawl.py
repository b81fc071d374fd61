"""Unit tests for corpus-cleaning (Gopher repetition, PII scrub, line dedup)
and recrawl-history operators (keep_latest, asof_join, sliding windows) —
edge cases the entry-oracle mirror can't exercise (empty docs, tie-breaks,
no-match as-of probes, fully-deduplicated documents)."""

import datetime

import pytest
from pyspark.sql import Row, functions as F


class TestRepetition:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import with_repetition
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        return {r["doc_id"]: r for r in with_repetition(df).collect()}

    def test_all_duplicate_tokens(self, spark):
        out = self._run(spark, ["spam spam spam spam"])
        r = out[0]
        assert r["n_words"] == 4
        assert r["dup_word_frac"] == 0.75
        # 3 bigrams, all 'spam spam' -> dup frac 2/3, top frac 1.0
        assert r["dup_2gram_frac"] == pytest.approx(0.666667)
        assert r["top_2gram_frac"] == 1.0
        assert not r["repetition_keep"]

    def test_all_distinct_tokens(self, spark):
        r = self._run(spark, ["a b c d e f"])[0]
        assert r["dup_word_frac"] == 0.0
        assert r["dup_2gram_frac"] == 0.0
        # 5 bigrams all distinct -> top gram covers 1/5 = 0.2 > threshold
        assert r["top_2gram_frac"] == 0.2
        assert not r["repetition_keep"]

    def test_single_token_and_empty(self, spark):
        out = self._run(spark, ["word", "   "])
        assert out[0]["n_words"] == 1
        assert out[0]["dup_2gram_frac"] == 0.0  # no bigrams -> coalesced 0
        assert out[0]["top_2gram_frac"] == 0.0
        assert out[1]["n_words"] == 0
        assert out[1]["dup_word_frac"] == 0.0


class TestPiiScrub:
    def test_redaction_and_counts(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import with_pii_scrub
        df = spark.createDataFrame([Row(
            doc_id=0,
            text="mail a.b+x@foo.example and c@bar.io or call"
                 " +1-303-555-0007 / 020-7946-0958 now")])
        r = with_pii_scrub(df).collect()[0]
        assert r["n_emails"] == 2
        assert r["n_phones"] == 2
        assert r["clean_text"] == ("mail <EMAIL> and <EMAIL> or call"
                                   " <PHONE> / <PHONE> now")

    def test_email_digits_not_rematched_as_phone(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import with_pii_scrub
        df = spark.createDataFrame(
            [Row(doc_id=0, text="user12345678@host.example only")])
        r = with_pii_scrub(df).collect()[0]
        assert (r["n_emails"], r["n_phones"]) == (1, 0)
        assert r["clean_text"] == "<EMAIL> only"


class TestLineDedup:
    def _run(self, spark, docs):
        from abot_dotnet_core_spark.functions.cleaning import line_dedup
        df = spark.createDataFrame(
            [Row(doc_id=i, lines=ls) for i, ls in enumerate(docs)])
        return {r["doc_id"]: r for r in line_dedup(df).collect()}

    def test_keep_first_occurrence_global(self, spark):
        out = self._run(spark, [["alpha", "boiler", "beta"],
                                ["boiler", "gamma"],
                                ["boiler"]])
        assert out[0]["clean_text"] == "alpha\nboiler\nbeta"
        assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 3)
        assert out[1]["clean_text"] == "gamma"
        assert (out[1]["n_lines"], out[1]["n_kept"]) == (2, 1)
        # doc 2 is entirely duplicates: survives with empty text
        assert out[2]["clean_text"] == ""
        assert (out[2]["n_lines"], out[2]["n_kept"]) == (1, 0)

    def test_intra_doc_duplicates_and_order(self, spark):
        out = self._run(spark, [["x", "y", "x", "z", "y", "w"]])
        assert out[0]["clean_text"] == "x\ny\nz\nw"
        assert out[0]["n_kept"] == 4


class TestC4Filters:
    def _run(self, spark, docs):
        from abot_dotnet_core_spark.functions.cleaning import c4_filters
        df = spark.createDataFrame(
            [Row(doc_id=i, lines=ls) for i, ls in enumerate(docs)],
            schema="doc_id long, lines array<string>")
        return {r["doc_id"]: r for r in c4_filters(df).collect()}

    GOOD = "one two three four five words here."

    def test_line_predicates(self, spark):
        out = self._run(spark, [[
            self.GOOD,                       # kept
            "no terminal punctuation here at all",   # dropped (a)
            "four words only here.",         # dropped (b) <5 words
            "enable JavaScript for the best experience.",  # dropped (c)
            'quoted line with five whole words."',   # kept (end-quote)
            "does it have five words?",      # kept (?)
        ]])[0]
        assert out["n_lines"] == 6
        assert out["n_kept"] == 3
        # exactly C4_MIN_LINES kept, no poison phrases -> page survives
        assert out["keep"]

    def test_doc_gates(self, spark):
        base = [self.GOOD, self.GOOD + " more.", self.GOOD + " again."]
        out = self._run(spark, [
            base,                                     # clean: keep
            base + ["Lorem Ipsum dolor sit amet now."],  # lorem -> drop
            base + ["code sample { inside } with many words."],  # brace
            base[:2],                                 # only 2 kept -> drop
            base + ["fragment with closing brace } only here."],  # } alone
        ])
        assert out[0]["keep"]
        assert not out[1]["keep"] and out[1]["n_kept"] == 4
        assert not out[2]["keep"]
        assert not out[3]["keep"] and out[3]["n_kept"] == 2
        # a page with only '}' (no '{') is still a code page per the gate
        assert not out[4]["keep"]

    def test_empty_doc(self, spark):
        out = self._run(spark, [[]])[0]
        assert (out["n_lines"], out["n_kept"], out["keep"]) == (0, 0, False)
        # md5('') — empty docs digest the empty string, never NULL
        assert out["clean_md5"] == "d41d8cd98f00b204e9800998ecf8427e"


class TestGopherQuality:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import gopher_quality
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            schema="doc_id long, text string")
        return {r["doc_id"]: r for r in gopher_quality(df).collect()}

    def test_clean_doc_keeps(self, spark):
        sent = "the quick brown foxes jumped over many lazy dogs today and "
        r = self._run(spark, [(sent * 6).strip()])[0]
        assert r["n_words"] == 66
        # 48 chars per 11-word sentence -> 288*1000 // 66
        assert r["mean_word_len_millis"] == 4363
        assert r["alpha_word_millis"] == 1000
        assert r["stopword_hits"] == 12  # 'the' + 'and' per repeat
        assert r["gopher_keep"]

    def test_too_few_words(self, spark):
        r = self._run(spark, ["the cat and the hat sat on the mat today"])[0]
        assert r["n_words"] == 10
        assert not r["gopher_keep"]

    def test_numeric_words_fail_alpha_gate(self, spark):
        r = self._run(spark, [("100 200 300 400 " * 15).strip()])[0]
        assert r["n_words"] == 60
        assert r["alpha_word_millis"] == 0
        assert not r["gopher_keep"]

    def test_bullet_and_ellipsis_line_ratios(self, spark):
        text = "• one\n- two\nplain line\nends here..."
        r = self._run(spark, [text])[0]
        assert r["bullet_line_millis"] == 500   # 2 of 4 lines
        assert r["ellipsis_line_millis"] == 250  # 1 of 4 lines

    def test_symbol_ratio(self, spark):
        # '#'x2 + '…'x1 + one literal '...' = 4 symbols over 6 words
        r = self._run(spark, ["tag ## word … end ..."])[0]
        assert r["symbol_ratio_millis"] == 666

    def test_short_mean_word_length(self, spark):
        r = self._run(spark, [("aa " * 50).strip()])[0]
        assert r["n_words"] == 50
        assert r["mean_word_len_millis"] == 2000
        assert not r["gopher_keep"]

    def test_empty_doc_total(self, spark):
        r = self._run(spark, [""])[0]
        assert r["n_words"] == 0
        assert r["mean_word_len_millis"] == 0
        assert not r["gopher_keep"]


class TestQualityCascade:
    GOOD = ("the quick brown foxes jumped over many lazy dogs today and "
            * 6).strip()

    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import quality_cascade
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in texts],
            schema="doc_id long, text string")
        return {r.doc_id: r for r in quality_cascade(df).collect()}

    def test_first_failing_gate_wins(self, spark):
        out = self._run(spark, [
            (0, self.GOOD),                                     # kept
            (1, self.GOOD + " привет мир слово здесь" * 60),    # script
            (2, "too few words here to pass the gate now"),     # gopher
            (3, self.GOOD + " page not found and 404 not found"),  # soft404
        ])
        assert out[0].reason is None and out[0].kept
        # script outranks gopher: the cyrillic run also breaks the alpha
        # gate, but routing fires first
        assert out[1].reason == "script" and not out[1].kept
        assert out[2].reason == "gopher"
        assert out[3].reason == "soft404"

    def test_empty_and_null_text(self, spark):
        out = self._run(spark, [(0, ""), (1, "   "), (2, None)])
        for i in range(3):
            assert out[i].reason == "empty"
            assert not out[i].kept

    def test_duplicate_keeps_lowest_id(self, spark):
        out = self._run(spark, [(5, self.GOOD), (7, self.GOOD),
                                (9, self.GOOD)])
        assert out[5].reason is None and out[5].kept
        assert out[7].reason == "duplicate" and not out[7].kept
        assert out[9].reason == "duplicate"
        assert out[5].fingerprint == out[7].fingerprint

    def test_failing_docs_never_claim_first_occurrence(self, spark):
        # both docs fail the gopher gate; neither enters the dedup stage,
        # so both carry their gate reason (not 'duplicate')
        short = "the cat and the hat sat on the mat now"
        out = self._run(spark, [(1, short), (2, short)])
        assert out[1].reason == "gopher"
        assert out[2].reason == "gopher"


class TestSpanDedup:
    def _run(self, spark, docs, span=3):
        from abot_dotnet_core_spark.functions.cleaning import span_dedup
        df = spark.createDataFrame(
            [Row(doc_id=i, lines=ls) for i, ls in enumerate(docs)],
            schema="doc_id long, lines array<string>")
        return {r["doc_id"]: r for r in span_dedup(df, span=span).collect()}

    MD5_EMPTY = "d41d8cd98f00b204e9800998ecf8427e"

    def test_exact_duplicate_doc_fully_removed(self, spark):
        # doc 1 repeats doc 0's only span -> all three lines drop
        lines = ["alpha one.", "beta two.", "gamma three."]
        out = self._run(spark, [lines, list(lines)])
        assert out[0]["n_kept"] == 3          # first occurrence kept
        assert out[1]["n_kept"] == 0
        assert out[1]["clean_md5"] == self.MD5_EMPTY

    def test_short_doc_has_no_span(self, spark):
        # two lines < span=3: no span exists, everything is kept even
        # though the same two lines appear inside a longer duplicate doc
        out = self._run(spark, [["a.", "b."], ["a.", "b.", "a.", "b."]])
        assert out[0]["n_kept"] == 2
        assert out[1]["n_kept"] == 4          # its spans are all unique

    def test_overlapping_spans_drop_union_of_lines(self, spark):
        # doc 1 = boilerplate block of doc 0 + one fresh line; spans
        # (0,1,2) and (1,2,3) both duplicate nothing — only the exact
        # 3-line window that recurs is removed, fresh tail survives
        out = self._run(spark, [
            ["x.", "y.", "z.", "tail zero."],
            ["x.", "y.", "z.", "fresh one."],
        ])
        # doc1 span (x,y,z) duplicates doc0's first span -> lines 0-2 drop
        assert out[0]["n_kept"] == 4
        assert out[1]["n_kept"] == 1

    def test_first_occurrence_is_lexicographic_min(self, spark):
        # the same span at doc0 pos1 and doc1 pos0: (0,1) < (1,0) wins
        out = self._run(spark, [
            ["lead.", "s1.", "s2.", "s3."],
            ["s1.", "s2.", "s3.", "other."],
        ])
        assert out[0]["n_kept"] == 4
        assert out[1]["n_kept"] == 1

    def test_within_doc_repeat_collapses(self, spark):
        # one doc repeating its own 3-line block back-to-back: the second
        # occurrence's non-overlapping lines drop
        block = ["r1.", "r2.", "r3."]
        out = self._run(spark, [block + block])
        assert out[0]["n_lines"] == 6
        assert out[0]["n_kept"] == 3

    def test_empty_doc(self, spark):
        out = self._run(spark, [[]])
        assert (out[0]["n_lines"], out[0]["n_kept"]) == (0, 0)
        assert out[0]["clean_md5"] == self.MD5_EMPTY


class TestFixMojibake:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import fix_mojibake
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            schema="doc_id long, text string")
        return {r["doc_id"]: r for r in fix_mojibake(df).collect()}

    def _moji(self, ch):
        out = []
        for b in ch.encode("utf-8"):
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))
        return "".join(out)

    def test_roundtrip_all_map_entries(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import MOJIBAKE_MAP
        # corrupting each target with the cp1252 transform and fixing it
        # restores the original (nbsp maps to plain space by design)
        targets = [g for _, g in MOJIBAKE_MAP]
        corrupted = " ".join(self._moji(t) if t != " " else self._moji(
            " ") for t in targets)
        r = self._run(spark, [corrupted])[0]
        assert r["fixed_text"] == " ".join(targets)
        assert r["n_fixed"] == len(targets)

    def test_clean_text_untouched(self, spark):
        r = self._run(spark, ["plain ascii text, nothing to fix."])[0]
        assert r["fixed_text"] == "plain ascii text, nothing to fix."
        assert r["n_fixed"] == 0

    def test_counts_multiple_occurrences(self, spark):
        bad = self._moji("é")
        r = self._run(spark, [f"caf{bad} and r{bad}sum{bad}"])[0]
        assert r["fixed_text"] == "café and résumé"
        assert r["n_fixed"] == 3

    def test_empty_string(self, spark):
        r = self._run(spark, [""])[0]
        assert r["fixed_text"] == ""
        assert r["n_fixed"] == 0


class TestBadwordsFilter:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import badwords_filter
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            schema="doc_id long, text string")
        return {r["doc_id"]: r for r in badwords_filter(df).collect()}

    def test_occurrences_counted_not_distinct(self, spark):
        out = self._run(spark, ["slow road slow dup here",
                                "clean text only words",
                                ""])
        assert out[0]["n_bad"] == 3 and not out[0]["keep"]
        assert out[1]["n_bad"] == 0 and out[1]["keep"]
        assert out[2]["n_words"] == 0 and out[2]["keep"]

    def test_substring_is_not_a_hit(self, spark):
        # token-level match: 'slower'/'dedup' must NOT trip 'slow'/'dup'
        r = self._run(spark, ["slower dedup duplicates"])[0]
        assert r["n_bad"] == 0 and r["keep"]


class TestQualityClassifier:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.cleaning import (
            quality_classifier)
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
            schema="doc_id long, text string")
        return {r["doc_id"]: r for r in quality_classifier(df).collect()}

    @staticmethod
    def _weight_milli(tok):
        import hashlib
        from abot_dotnet_core_spark.functions.cleaning import (
            QC_BUCKETS, QC_WEIGHT_MOD, QC_WEIGHT_MULT)
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % QC_BUCKETS
        return (b * QC_WEIGHT_MULT) % QC_WEIGHT_MOD - 1000

    def test_score_matches_reference_arithmetic(self, spark):
        toks = ["alpha", "beta", "gamma"]
        r = self._run(spark, [" ".join(toks)])[0]
        want = round(sum(self._weight_milli(t) for t in toks) / 3000.0, 6)
        assert r["quality_score"] == pytest.approx(want, abs=1e-9)
        assert r["keep"] == (want > 0)

    def test_empty_doc_scores_zero_and_drops(self, spark):
        r = self._run(spark, ["   "])[0]
        assert (r["n_words"], r["quality_score"], r["keep"]) == (0, 0.0,
                                                                 False)

    def test_repeated_token_shifts_score(self, spark):
        # score is occurrence-weighted: doubling a token moves the mean
        one = self._run(spark, ["alpha beta"])[0]["quality_score"]
        two = self._run(spark, ["alpha alpha beta"])[0]["quality_score"]
        wa, wb = self._weight_milli("alpha"), self._weight_milli("beta")
        assert one == pytest.approx((wa + wb) / 2000.0, abs=1e-6)
        assert two == pytest.approx((2 * wa + wb) / 3000.0, abs=1e-6)


class TestPerplexityBuckets:
    def test_buckets_and_scores(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import (
            perplexity_buckets)
        # 'common' dominates the unigram LM -> docs of rare tokens score
        # higher NLL and land in 'tail'
        df = spark.createDataFrame(
            [Row(doc_id=0, text="common common common common"),
             Row(doc_id=1, text="common common rare1"),
             Row(doc_id=2, text="rare2 rare3 rare4")])
        out = {r["doc_id"]: r for r in perplexity_buckets(df).collect()}
        assert out[0]["nll"] < out[1]["nll"] < out[2]["nll"]
        assert out[0]["bucket"] == "head"
        assert out[2]["bucket"] == "tail"
        # every doc gets exactly one bucket row
        assert len(out) == 3

    def test_single_doc_is_head(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import (
            perplexity_buckets)
        df = spark.createDataFrame([Row(doc_id=0, text="a b")])
        r = perplexity_buckets(df).collect()[0]
        assert r["bucket"] == "head"  # its own nll == both thresholds


class TestDomainStats:
    def test_blocklist_and_top_lang(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import domain_stats
        docs = spark.createDataFrame([
            Row(doc_id=0, source="good.example", lang="en", n_chars=10),
            Row(doc_id=1, source="good.example", lang="en", n_chars=20),
            Row(doc_id=2, source="good.example", lang="de", n_chars=5),
            Row(doc_id=3, source="bad.example", lang="fr", n_chars=7),
        ])
        blocked = spark.createDataFrame([Row(domain="bad.example")])
        out = {r["source"]: r
               for r in domain_stats(docs, blocked).collect()}
        g = out["good.example"]
        assert (g["n_docs"], g["n_chars"], g["n_langs"]) == (3, 35, 2)
        assert g["top_lang"] == "en" and g["keep"]
        assert not out["bad.example"]["keep"]

    def test_top_lang_tiebreak(self, spark):
        from abot_dotnet_core_spark.functions.cleaning import domain_stats
        docs = spark.createDataFrame([
            Row(doc_id=0, source="s", lang="de", n_chars=1),
            Row(doc_id=1, source="s", lang="en", n_chars=1),
        ])
        blocked = spark.createDataFrame([Row(domain="none")])
        out = domain_stats(docs, blocked).collect()[0]
        assert out["top_lang"] == "en"  # equal counts -> max lang code


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestKeepLatest:
    def test_latest_and_tiebreak(self, spark):
        from abot_dotnet_core_spark.operators.recrawl import keep_latest
        rows = [
            Row(url="u1", warc_ts=_ts("2026-01-01T00:00:00"), rev=0),
            Row(url="u1", warc_ts=_ts("2026-01-02T00:00:00"), rev=1),
            Row(url="u2", warc_ts=_ts("2026-01-03T00:00:00"), rev=0),
            Row(url="u2", warc_ts=_ts("2026-01-03T00:00:00"), rev=1),
        ]
        df = spark.createDataFrame(rows)
        got = {r["url"]: r["rev"]
               for r in keep_latest(df, ["url"], "warc_ts",
                                    tiebreak_cols=["rev"]).collect()}
        assert got == {"u1": 1, "u2": 1}  # u2: equal ts -> higher rev wins


class TestAsofJoin:
    def _dfs(self, spark):
        probe = spark.createDataFrame([
            Row(event_id=1, user_id=1, ts=_ts("2026-01-01T10:00:00")),
            Row(event_id=2, user_id=1, ts=_ts("2026-01-01T12:00:00")),
            Row(event_id=3, user_id=2, ts=_ts("2026-01-01T09:00:00")),
        ])
        build = spark.createDataFrame([
            Row(user_id=1, ts=_ts("2026-01-01T09:30:00"), value=5.0),
            Row(user_id=1, ts=_ts("2026-01-01T12:00:00"), value=7.0),
            Row(user_id=2, ts=_ts("2026-01-01T11:00:00"), value=9.0),
        ])
        return probe, build

    def test_semantics(self, spark):
        from abot_dotnet_core_spark.operators.recrawl import asof_join
        probe, build = self._dfs(spark)
        out = {r["event_id"]: (r["asof_ts"], r["asof_value"])
               for r in asof_join(probe, build, ["user_id"], "ts", "ts",
                                  ["value"]).collect()}
        assert len(out) == 3  # left join: every probe row survives
        assert out[1] == (_ts("2026-01-01T09:30:00"), 5.0)
        # equal timestamp: build row at 12:00 IS visible (>= semantics)
        assert out[2] == (_ts("2026-01-01T12:00:00"), 7.0)
        # user 2's only purchase is AFTER the probe -> NULLs
        assert out[3] == (None, None)


class TestStreamUrlDedup:
    def test_dedup_across_restarts(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark keeps one row per url across two
        availableNow runs sharing a checkpoint (streaming seen-filter)."""
        import os
        import pandas as pd
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            stream_url_dedup)
        src = str(tmp_path / "feed")
        os.makedirs(src)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

        pd.DataFrame({
            "url": ["http://a.test/", "http://b.test/", "http://a.test/"],
            "ts": [t0, t0, t0 + datetime.timedelta(minutes=1)],
        }).to_parquet(f"{src}/part-0.parquet", index=False,
              coerce_timestamps="us",
              allow_truncated_timestamps=True)
        q = stream_url_dedup(spark, src, ckpt, out).start()
        q.awaitTermination(120)

        # second run: b re-discovered (must be dropped), c is new
        pd.DataFrame({
            "url": ["http://b.test/", "http://c.test/"],
            "ts": [t0 + datetime.timedelta(minutes=5)] * 2,
        }).to_parquet(f"{src}/part-1.parquet", index=False,
              coerce_timestamps="us",
              allow_truncated_timestamps=True)
        q = stream_url_dedup(spark, src, ckpt, out).start()
        q.awaitTermination(120)

        got = sorted(r["url"] for r in spark.read.parquet(out).collect())
        assert got == ["http://a.test/", "http://b.test/", "http://c.test/"]


class TestSlidingCounts:
    def test_each_event_in_two_windows(self, spark):
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            sliding_counts)
        ev = spark.createDataFrame([
            Row(event_id=1, ts=_ts("2026-01-01T10:15:00"),
                event_type="click", value=1.0)])
        rows = sorted((r["window_start"], r["n_events"])
                      for r in sliding_counts(ev, window="2 hours",
                                              slide="1 hour").collect())
        assert rows == [(_ts("2026-01-01T09:00:00"), 1),
                        (_ts("2026-01-01T10:00:00"), 1)]

    def test_streaming_form_runs(self, spark, tmp_path):
        """sliding_counts over a real availableNow stream equals batch."""
        import os
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            sliding_counts)
        src = str(tmp_path / "feed")
        os.makedirs(src)
        ev = spark.createDataFrame([
            Row(event_id=i, ts=_ts(f"2026-01-01T0{h}:30:00"),
                event_type="click", value=1.0)
            for i, h in enumerate([1, 1, 2, 3])])
        stage = str(tmp_path / "stage")
        ev.coalesce(1).write.parquet(stage)
        import glob
        import shutil
        for i, p in enumerate(glob.glob(f"{stage}/part-*.parquet")):
            shutil.copy(p, f"{src}/part-{i}.parquet")
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = str(tmp_path / "out")
        q = (sliding_counts(stream, window="2 hours", slide="1 hour",
                            watermark="0 seconds")
             .writeStream.outputMode("append")
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .format("parquet").option("path", out).start())
        q.awaitTermination(120)
        got = {(r["window_start"], r["n_events"])
               for r in spark.read.parquet(out).collect()}
        want = {(r["window_start"], r["n_events"])
                for r in sliding_counts(spark.read.parquet(src),
                                        window="2 hours",
                                        slide="1 hour").collect()}
        assert got <= want and len(got) >= 1


class TestIntervalJoin:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [Row(event_id=i, ts=ts, user_id=u, event_type=et)
             for i, (ts, u, et) in enumerate(rows)])

    def test_boundary_semantics(self, spark):
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            interval_join)
        t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)

        def m(minutes):
            return t0 + datetime.timedelta(minutes=minutes)

        ev = self._ev(spark, [
            (m(0), 1, "view"),     # 0: exactly lookback before click -> in
            (m(55), 1, "view"),    # 1: inside window -> in
            (m(60), 1, "view"),    # 2: equal ts -> in
            (m(61), 1, "view"),    # 3: after the click -> out
            (m(59), 2, "view"),    # 4: other user -> out
            (m(60), 1, "click"),   # 5
        ])
        got = sorted(
            (r["view_id"], r["click_id"], r["gap_sec"])
            for r in interval_join(
                ev.where(F.col("event_type") == "view"),
                ev.where(F.col("event_type") == "click"),
                lookback="1 hour").collect())
        assert got == [(0, 5, 3600), (1, 5, 300), (2, 5, 0)]

    def test_streaming_equals_batch(self, spark, tmp_path):
        """stream_interval_join (availableNow, watermarked both sides)
        emits exactly the batch join's pairs."""
        import os
        import pandas as pd
        from abot_dotnet_core_spark.streaming.metrics_stream import (
            interval_join, stream_interval_join)
        src = str(tmp_path / "feed")
        os.makedirs(src)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)
        rows = []
        for i in range(40):
            rows.append((i, t0 + datetime.timedelta(minutes=7 * i),
                         i % 3, "view" if i % 2 == 0 else "click", 1.0, ""))
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                    "event_type", "value", "props"]) \
            .to_parquet(f"{src}/part-0.parquet", index=False,
                        coerce_timestamps="us",
                        allow_truncated_timestamps=True)
        q = stream_interval_join(spark, src, ckpt, out,
                                 lookback="30 minutes").start()
        q.awaitTermination(120)

        ev = spark.read.parquet(src)
        want = sorted(
            (r["view_id"], r["click_id"], r["gap_sec"])
            for r in interval_join(
                ev.where(F.col("event_type") == "view"),
                ev.where(F.col("event_type") == "click"),
                lookback="30 minutes").collect())
        got = sorted((r["view_id"], r["click_id"], r["gap_sec"])
                     for r in spark.read.parquet(out).collect())
        assert want and got == want


class TestRecrawlSchedule:
    def _run(self, spark, rows, now, **kw):
        from abot_dotnet_core_spark.operators.recrawl import recrawl_schedule
        df = spark.createDataFrame(
            [Row(url=u, warc_ts=datetime.datetime.utcfromtimestamp(e),
                 fingerprint=fp) for u, e, fp in rows])
        return {r["url"]: r
                for r in recrawl_schedule(df, now_epoch=now, **kw).collect()}

    def test_interval_and_priority(self, spark):
        day = 86400
        t0 = 1767225600
        rows = [
            # a: changes every snapshot -> interval = span/2 = 1 day
            ("a", t0, "f1"), ("a", t0 + day, "f2"), ("a", t0 + 2 * day, "f3"),
            # b: two snapshots, same fp -> no change -> max interval
            ("b", t0, "g1"), ("b", t0 + day, "g1"),
            # c: single snapshot -> max interval
            ("c", t0, "h1"),
        ]
        now = t0 + 4 * day
        out = self._run(spark, rows, now)
        a = out["a"]
        assert (a["n_snaps"], a["n_changes"], a["interval_s"]) == (3, 2, day)
        assert a["next_fetch_epoch"] == t0 + 3 * day
        assert a["priority_micro"] == 2 * 10**6 and a["due"]
        assert out["b"]["interval_s"] == 30 * day and not out["b"]["due"]
        assert out["c"]["n_changes"] == 0
        assert out["c"]["interval_s"] == 30 * day

    def test_clamps(self, spark):
        t0 = 1767225600
        # changes 10 s apart -> raw interval 10 s -> clamped up to min
        rows = [("fast", t0, "x1"), ("fast", t0 + 10, "x2"),
                ("fast", t0 + 20, "x3")]
        out = self._run(spark, rows, t0 + 100, min_interval_s=3600)
        assert out["fast"]["interval_s"] == 3600
        assert not out["fast"]["due"]
        # one change over 100 days -> clamped down to max
        day = 86400
        rows = [("slow", t0, "y1"), ("slow", t0 + 100 * day, "y2")]
        out = self._run(spark, rows, t0 + 131 * day, max_interval_s=30 * day)
        assert out["slow"]["interval_s"] == 30 * day
        assert out["slow"]["due"]   # age 31 d > 30 d

    def test_equal_timestamp_ties_deterministic(self, spark):
        """Equal-ts snapshots order by fingerprint (deterministic lag), so
        n_changes cannot depend on partition layout."""
        t0 = 1767225600
        rows = [("t", t0, "b"), ("t", t0, "a"), ("t", t0 + 100, "a")]
        # sorted: (t0,a),(t0,b),(t0+100,a) -> a->b, b->a = 2 changes
        out = self._run(spark, rows, t0 + 200)
        assert out["t"]["n_changes"] == 2


class TestSnapshotDiff:
    def _run(self, spark, old, new):
        from abot_dotnet_core_spark.operators.recrawl import snapshot_diff
        schema = "url string, fingerprint string"
        return {r.url: (r.change, r.old_fp, r.new_fp) for r in snapshot_diff(
            spark.createDataFrame(old, schema),
            spark.createDataFrame(new, schema)).collect()}

    def test_all_four_classes(self, spark):
        out = self._run(
            spark,
            [("u1", "f1"), ("u2", "f2"), ("u3", "f3")],
            [("u2", "f2"), ("u3", "f3x"), ("u4", "f4")])
        assert out == {
            "u1": ("removed", "f1", None),
            "u2": ("unchanged", "f2", "f2"),
            "u3": ("changed", "f3", "f3x"),
            "u4": ("added", None, "f4"),
        }

    def test_empty_sides(self, spark):
        assert self._run(spark, [], [("u", "f")]) == {"u": ("added", None, "f")}
        assert self._run(spark, [("u", "f")], []) == {
            "u": ("removed", "f", None)}


class TestSoft404:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.textfns import soft404_signals
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        return {r.doc_id: r for r in soft404_signals(df).collect()}

    def test_score_ladder(self, spark):
        long_pad = "word " * 200  # > 400 chars
        out = self._run(spark, [
            long_pad + "all fine here",                     # 0: nothing
            "short page",                                   # 1: short only
            long_pad + "Page Not Found",                    # 2: 1 hit, long
            "404 Not Found",                                # 3: 1 hit + short
            long_pad + "page not found and does not exist",  # 4: 2 hits
        ])
        assert (out[0].soft404_score_millis, out[0].is_soft404) == (0, False)
        assert (out[1].soft404_score_millis, out[1].is_soft404) == (200, False)
        assert (out[2].soft404_score_millis, out[2].is_soft404) == (400, False)
        assert (out[3].soft404_score_millis, out[3].is_soft404) == (600, True)
        assert (out[4].soft404_score_millis, out[4].is_soft404) == (800, True)

    def test_score_caps_at_1000(self, spark):
        t = ("page not found 404 not found does not exist "
             "no longer available page cannot be found")
        out = self._run(spark, [t])
        assert out[0].phrase_hits == 5
        assert (out[0].soft404_score_millis, out[0].is_soft404) == (1000, True)
