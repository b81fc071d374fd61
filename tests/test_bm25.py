"""bm25_topk: integer fixed-point BM25-shaped ranked retrieval.

Pinned against a sequential Python mirror of the exact micro-unit
formulas (same div order), plus edge cases: empty docs excluded from N
and avgdl, absent query terms contribute nothing, score ties break by
doc_id, k caps the output.
"""

import pytest
from pyspark.sql import Row

from abot_dotnet_core_spark.functions.textfns import bm25_topk

K1 = 1_200_000
B = 750_000
M = 1_000_000


def _mirror(texts, query, k=10):
    """Sequential mirror of bm25_topk's integer arithmetic."""
    docs = {i: t.strip().lower().split() for i, t in enumerate(texts)
            if t.strip()}
    n = len(docs)
    total = sum(len(t) for t in docs.values())
    qt = [w.lower() for w in query]
    tf = {}
    for d, toks in docs.items():
        for w in qt:
            c = toks.count(w)
            if c:
                tf[(d, w)] = c
    df = {w: sum(1 for (d2, w2) in tf if w2 == w) for w in qt}
    per_doc = {}
    for (d, w), c in tf.items():
        dl = len(docs[d])
        dl_norm = dl * M * n // total
        kk = K1 * ((M - B) + B * dl_norm // M) // M
        tf_part = c * (K1 + M) * M // (c * M + kk)
        idf = (2 * (n - df[w]) + 1) * M // (2 * df[w] + 1)
        contrib = (idf // 1000) * (tf_part // 1000)
        hits, score = per_doc.get(d, (0, 0))
        per_doc[d] = (hits + 1, score + contrib)
    ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return [(d, h, s, i + 1) for i, (d, (h, s)) in enumerate(ranked)]


def _run(spark, texts, query, k=10):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = bm25_topk(df, query, k=k).collect()
    return [(r["doc_id"], r["n_hits"], r["score_micro"], r["rank"])
            for r in rows]


class TestBm25:
    def test_matches_sequential_mirror(self, spark):
        texts = [
            "the cat sat on the mat",
            "cat cat cat cat cat cat cat cat",       # tf saturation
            "cat",                                   # short doc boost
            "dog dog dog bird " * 20,                # long doc, no query term
            "a cat and a dog walked past the mat",
            "",                                      # excluded entirely
            "mat mat cat dog",
        ]
        q = ["cat", "mat"]
        assert _run(spark, texts, q) == _mirror(texts, q)

    def test_short_doc_outranks_long_at_equal_tf(self, spark):
        texts = ["cat " + "x " * 50, "cat", "y y y y y y"]
        got = _run(spark, texts, ["cat"])
        assert [d for d, *_ in got] == [1, 0]
        assert got[0][2] > got[1][2]

    def test_tf_saturates(self, spark):
        # doubling tf must not double the score (k1 saturation)
        texts = ["cat cat filler filler", "cat cat cat cat filler filler",
                 "z z z z"]
        got = {d: s for d, _, s, _ in _run(spark, texts, ["cat"])}
        assert got[1] > got[0]
        assert got[1] < 2 * got[0]

    def test_absent_term_and_case(self, spark):
        texts = ["alpha beta", "beta gamma"]
        got = _run(spark, texts, ["ALPHA", "zzz_missing"])
        assert [(d, h) for d, h, *_ in got] == [(0, 1)]
        assert got == _mirror(texts, ["alpha", "zzz_missing"])

    def test_tie_breaks_by_doc_id_and_k_caps(self, spark):
        texts = ["same same", "same same", "same same", "same same"]
        got = _run(spark, texts, ["same"], k=3)
        assert [d for d, *_ in got] == [0, 1, 2]
        assert len({s for _, _, s, _ in got}) == 1
        assert [r for *_, r in got] == [1, 2, 3]


class TestReadability:
    def _run(self, spark, texts):
        from abot_dotnet_core_spark.functions.textfns import readability
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
        return {r["doc_id"]: r for r in readability(df).collect()}

    def test_counts_and_formulas(self, spark):
        got = self._run(spark, [
            "The cat sat. The dog ran!",     # 6 words, 2 sentences
            "",                              # all-zero, floors kick in
            "aaa?!?... bbb. ccc",            # one [.!?]+ run per cluster
        ])
        r = got[0]
        assert (r["n_words"], r["n_sentences"]) == (6, 2)
        syl = r["n_syllables"]
        assert syl == 6  # e,a,a,e,o,a vowel groups
        assert r["fre_millis"] == (206835 - (1015 * 6) // 2
                                   - (84600 * syl) // 6)
        assert r["fkg_millis"] == ((390 * 6) // 2
                                   + (11800 * syl) // 6 - 15590)
        z = got[1]
        assert (z["n_words"], z["n_sentences"], z["n_syllables"]) == (0, 0, 0)
        assert z["fre_millis"] == 206835  # floors make both terms 0
        assert got[2]["n_sentences"] == 2

    def test_complex_text_scores_lower(self, spark):
        simple = "The cat sat on the mat. It was fun. We ran."
        dense = ("Notwithstanding institutional considerations, "
                 "implementation of infrastructural reorganization "
                 "necessitates comprehensive optimization.")
        got = self._run(spark, [simple, dense])
        assert got[0]["fre_millis"] > got[1]["fre_millis"]
        assert got[0]["fkg_millis"] < got[1]["fkg_millis"]


class TestCorpusReport:
    def test_volumes_langs_and_dominance(self, spark):
        from abot_dotnet_core_spark.functions.textfns import corpus_report
        df = spark.createDataFrame([
            Row(doc_id=0, source="a", text="the cat and the dog"),   # en
            Row(doc_id=1, source="a", text="el perro es un gato"),   # es
            Row(doc_id=2, source="a", text="the mat is on it"),      # en
            Row(doc_id=3, source="b", text=""),                      # empty/und
            Row(doc_id=4, source="b", text="zz qq ww"),              # und
        ])
        got = {r["source"]: r for r in corpus_report(df).collect()}
        a = got["a"]
        assert (a["n_docs"], a["total_tokens"], a["n_empty"]) == (3, 15, 0)
        assert a["total_chars"] == len("the cat and the dog") + \
            len("el perro es un gato") + len("the mat is on it")
        assert (a["n_langs"], a["dom_lang"], a["dom_docs"]) == (2, "en", 2)
        b = got["b"]
        assert (b["n_docs"], b["n_empty"], b["dom_lang"]) == (2, 1, "und")
        assert b["total_tokens"] == 3  # empty doc counts 0 tokens

    def test_dominance_tie_breaks_lang_asc(self, spark):
        from abot_dotnet_core_spark.functions.textfns import corpus_report
        df = spark.createDataFrame([
            Row(doc_id=0, source="s", text="the cat and the dog"),   # en
            Row(doc_id=1, source="s", text="el perro es un gato"),   # es
        ])
        r = corpus_report(df).collect()[0]
        assert (r["n_langs"], r["dom_lang"], r["dom_docs"]) == (2, "en", 1)
