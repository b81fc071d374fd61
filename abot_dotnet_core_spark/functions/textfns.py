"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (split/regexp/aggregate) so
they stay inside whole-stage codegen; nothing here uses per-row Python. Each
operator has a matching ANSI-SQL oracle in __spark_entry__.oracle_sql().

Operators:
  token_count        whitespace tokens + BPE-ish subword regex tokens
  quality_score      length / punctuation-ratio / stopword-ratio features
  lang_id            stopword-profile n-gram heuristic language guess
  fingerprint        rolling/normalized document fingerprint (md5)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# a small multilingual stopword profile (deterministic, shared with the SQL
# oracle as inline VALUES)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
}

# BPE-ish pre-tokenizer: word pieces OR single non-alnum non-space marks
SUBTOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
PUNCT_RE = "[^.,;:!?]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (not [''])."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")) \
            .otherwise(F.split(t, "\\s+"))


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (df
            .withColumn("n_tokens", F.size(tokens_col(t)))
            .withColumn("n_subtokens", F.size(F.regexp_extract_all(
                t, F.lit(SUBTOKEN_RE), 0)))
            .withColumn("n_chars_seen", F.length(t)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punct/stopword-ratio quality features + a composite score.

    The score formula is arbitrary but frozen (shared with the SQL oracle):
    higher = cleaner prose. Ratios are rounded to 6 dp so Spark and the
    oracle hash identically."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n_tok = F.size(toks)
    punct = F.length(F.regexp_replace(t, PUNCT_RE, ""))
    stop_list = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_list, F.lower(x))))
    punct_ratio = F.round(punct / F.greatest(F.length(t), F.lit(1)), 6)
    stop_ratio = F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6)
    mean_tok_len = F.round(F.length(t) / F.greatest(n_tok, F.lit(1)), 6)
    score = F.round(
        stop_ratio * 2.0
        - F.when(punct_ratio > 0.2, punct_ratio).otherwise(F.lit(0.0))
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 12), F.lit(0.5))
           .otherwise(F.lit(0.0)), 6)
    return (df.withColumn("n_tokens", n_tok)
              .withColumn("punct_ratio", punct_ratio)
              .withColumn("stopword_ratio", stop_ratio)
              .withColumn("mean_token_len", mean_tok_len)
              .withColumn("quality_score", score))


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword-profile hit count (ties -> lang
    code order). A heuristic n-gram/stopword language id — set-based: one
    pass, no UDF."""
    toks = F.transform(tokens_col(F.col(text_col)), lambda x: F.lower(x))
    scores = []
    for lang in sorted(STOPWORDS):
        sl = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(F.size(F.filter(toks, lambda x: F.array_contains(sl, x)))
                      .alias("hits"),
                     F.lit(lang).alias("lang")))
    # argmax: sort desc by (hits, lang-reversed) — deterministic tiebreak
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return (df.withColumn("lang_pred",
                          F.when(best["hits"] > 0, best["lang"])
                           .otherwise(F.lit("und")))
              .withColumn("lang_hits", best["hits"]))


def fingerprint_col(text: Column) -> Column:
    """THE exact-dedup key: md5 over whitespace-normalized lowercased
    text. Shared by with_fingerprint, dedup.exact_dedup, and
    cleaning.quality_cascade so the three can never silently diverge."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), "\\s+", " "))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercased text
    (the exact-dedup key), plus a 64-bit numeric form for compact storage."""
    fp = fingerprint_col(F.col(text_col))
    return (df.withColumn("fingerprint", fp)
              .withColumn("fingerprint64",
                          F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")))


def vocab_topk(df: DataFrame, k: int = 100,
               text_col: str = "text") -> DataFrame:
    """Corpus-level vocabulary: lowercase whitespace tokens counted across
    every document, top-``k`` by frequency (ties broken by term asc) with a
    dense 1-based rank. The first step of tokenizer/BPE training over a
    crawl corpus.

    Scale posture: explode + hash-agg with map-side partial aggregation (the
    classic word-count shape — combiners shrink the shuffle to the distinct
    vocabulary per partition), then a TakeOrdered top-k; no global sort of
    the vocabulary. The final rank window runs over k rows only."""
    from pyspark.sql import Window as W
    toks = (df.select(F.explode(tokens_col(F.lower(F.col(text_col))))
                      .alias("term"))
            .groupBy("term").agg(F.count("*").alias("cnt")))
    top = toks.orderBy(F.col("cnt").desc(), "term").limit(k)
    w = W.orderBy(F.col("cnt").desc(), "term")
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def chunk_documents(df: DataFrame, chunk_size: int = 512, stride: int = 384,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size character windows with overlap
    (``stride`` < ``chunk_size`` overlaps adjacent chunks) — the standard
    long-document -> training-example transform. A document of length L
    yields 1 + ceil(max(L - chunk_size, 0) / stride) chunks (every char is
    covered; the last chunk may be short); empty docs yield one empty chunk
    so no document silently vanishes.

    Returns (id, chunk_idx, chunk_len, chunk_md5) — the digest, not the
    chunk text, so the output stays narrow for verification pipelines.

    Scale posture: pure JVM row expansion (sequence + posexplode +
    substring), no shuffle at all — chunking pipelines into whatever
    follows. Expansion factor is bounded by L/stride; substring on a
    one-pass projection never copies the document more than once per
    chunk."""
    # NULL text counts as empty: it still yields the one empty chunk the
    # docstring promises (a null length would null the sequence and the
    # posexplode would silently drop the document)
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chunks = (F.lit(1) + F.ceil(
        F.greatest(F.length(t) - chunk_size, F.lit(0)) / stride)).cast("int")
    chunked = (df.select(
        F.col(id_col),
        t.alias("__t"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1))
         .alias("chunk_idx", "__start")))
    chunk = F.substring(F.col("__t"), F.col("__start") * stride + 1,
                        chunk_size)
    return (chunked.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5")))


def inverted_index(df: DataFrame, min_df: int = 1,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted index over lowercase whitespace tokens: one row per term
    with document frequency, total term frequency, and an md5 digest of the
    sorted posting list (the digest, not the list, keeps verification output
    narrow; the posting list itself is the intermediate `collect_list`).

    Scale posture: explode -> (term, doc) hash-agg with map-side combine
    (shuffle volume = distinct (term, doc) pairs, not token occurrences),
    then one more hash-agg keyed by term. The posting-list collect is the
    inherent cost of an inverted index; hot stopword terms produce large
    single-key lists, which is why real deployments segment postings —
    `min_df` here plus a downstream segment writer would shard them. No
    windows, no sort except the per-term array sort (row-local)."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.explode(tokens_col(F.lower(F.col(text_col))))
                       .alias("term"))
            .groupBy("term", "doc_id").agg(F.count("*").alias("tf")))
    idx = (toks.groupBy("term")
           .agg(F.count("*").alias("doc_freq"),
                F.sum("tf").alias("total_tf"),
                F.md5(F.concat_ws(",", F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda d: d.cast("string")))).alias("postings_md5")))
    if min_df > 1:
        idx = idx.where(F.col("doc_freq") >= min_df)
    return idx.select("term", "doc_freq", "total_tf", "postings_md5")


def tfidf_topk(df: DataFrame, k: int = 5,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document top-``k`` terms by an integer fixed-point tf/df score
    (score_micro = tf * 1e6 // df) — tf-idf-shaped keyword extraction that
    stays bit-exact across Spark partial-agg order and the DuckDB oracle
    (no float log). Ranking ties break by tf desc then term asc.

    Scale posture: two hash-aggs (tf per (doc, term), df per term) joined on
    term — both sides share the term partitioning so the join reuses the
    agg shuffle; then a per-doc row_number window whose partition size is
    bounded by the document's distinct-term count (document length), never
    by corpus size."""
    from pyspark.sql import Window as W
    toks = df.select(F.col(id_col).alias("doc_id"),
                     F.explode(tokens_col(F.lower(F.col(text_col))))
                      .alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = (toks.groupBy("term")
             .agg(F.count_distinct("doc_id").alias("df")))
    scored = (tf.join(dfreq, "term")
              .withColumn("score_micro",
                          # integer `div`, not floor(double /): a double
                          # quotient loses exactness past 2^53 and can
                          # diverge from the oracle's BIGINT //
                          F.expr("tf * CAST(1000000 AS BIGINT) div df")))
    w = W.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("tf").desc(), F.col("term"))
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("doc_id", "term", "tf", "df", "score_micro", "rank"))


def bigram_lm(df: DataFrame, min_count: int = 2,
              text_col: str = "text") -> DataFrame:
    """Bigram language-model counts (KenLM-prep shape): conditional
    probability of each bigram in integer fixed-point, p_micro =
    count(w1,w2) * 1e6 // count(w1-as-context). The context count is the
    number of bigram occurrences starting with w1 (so probabilities per
    context sum to ~1e6 exactly); bigrams below ``min_count`` are pruned,
    the usual LM count cutoff.

    Scale posture: bigrams are built row-locally by zipping the token array
    against its shifted self (arrays_zip of two slices — NOT a positional
    HOF closing over the tokenizer, which Spark would re-evaluate per
    element; see BENCH/BASELINE.md round-2 log), then two hash-aggs with
    map-side combine. The context count is a second agg over the already
    aggregated bigram table (|distinct bigrams| rows, not token volume),
    joined back on w1."""
    toks = tokens_col(F.lower(F.col(text_col)))
    bg = (df
          .withColumn("__t", toks)
          .select(F.explode(F.arrays_zip(
              F.slice(F.col("__t"), 1,
                      F.greatest(F.size("__t") - 1, F.lit(0))).alias("w1"),
              F.slice(F.col("__t"), 2,
                      F.greatest(F.size("__t") - 1, F.lit(0))).alias("w2")))
              .alias("p"))
          .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")))
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    ctx = cnt.groupBy("w1").agg(F.sum("cnt").alias("ctx_cnt"))
    return (cnt.join(ctx, "w1")
            .where(F.col("cnt") >= min_count)
            .withColumn("p_micro",
                        # integer `div` keeps bit-exactness vs the oracle's
                        # BIGINT // even when cnt*1e6 exceeds 2^53
                        F.expr("cnt * CAST(1000000 AS BIGINT) div ctx_cnt"))
            .select("w1", "w2", "cnt", "ctx_cnt", "p_micro"))


# soft-404 phrase list — deterministic, shared with the SQL oracle as
# inline contains() calls; lowercase-matched
SOFT404_PHRASES = [
    "page not found",
    "404 not found",
    "does not exist",
    "no longer available",
    "page cannot be found",
]
SOFT404_SHORT_CHARS = 400


def soft404_cols(t, short_chars: int = SOFT404_SHORT_CHARS) -> dict:
    """phrase_hits / is_short / soft404_score_millis / is_soft404 as a
    name->Column dict — shared by :func:`soft404_signals` and the
    quality-cascade composition."""
    low = F.lower(t)
    hits = None
    for p in SOFT404_PHRASES:
        h = low.contains(p).cast("int")
        hits = h if hits is None else hits + h
    is_short = F.length(t) < short_chars
    score = F.least(F.lit(1000),
                    hits * 400 + is_short.cast("int") * 200)
    return {"phrase_hits": hits, "is_short": is_short,
            "soft404_score_millis": score, "is_soft404": score >= 600}


def soft404_signals(df: DataFrame, text_col: str = "text",
                    short_chars: int = SOFT404_SHORT_CHARS) -> DataFrame:
    """Soft-404 detection: pages that return HTTP 200 but carry an error
    body — a crawl corpus keeps them unless filtered, and they poison both
    dedup (near-identical error shells cluster) and training data. Signals:
    count of error phrases in the lowercased text (``phrase_hits``) and a
    short-body flag (< ``short_chars`` chars). Score in exact thousandths:
    400/hit + 200 if short, capped at 1000; ``is_soft404`` at >= 600 —
    i.e. one phrase alone is suspicion, phrase+short or two phrases is a
    verdict. Pure row-local codegen expressions (contains/length), zero
    shuffle at any corpus size; same arithmetic in the DuckDB oracle.

    Returns (id/other cols untouched) + phrase_hits, is_short,
    soft404_score_millis, is_soft404.
    """
    out = df
    for name, c in soft404_cols(F.col(text_col), short_chars).items():
        out = out.withColumn(name, c)
    return out


# --- exact group quantiles ---------------------------------------------------

def group_quantiles(df: DataFrame, value_col: str, group_col: str,
                    probs: tuple = (0.25, 0.5, 0.75, 0.95)) -> DataFrame:
    """Exact per-group interpolated quantiles of a numeric column — the
    corpus length-distribution report (sequence-length planning, outlier
    cutoffs). ``F.percentile`` is Spark's EXACT sort-based aggregate and
    interpolates identically to SQL ``quantile_cont`` (rank p*(n-1),
    linear between neighbors), so the oracle matches bit-for-bit.

    Scale posture: one hash aggregation; the percentile state holds each
    group's values, so this is for bounded groups (per-language corpus
    stats: thousands of groups, the biggest holding a corpus share that
    one executor can sort). For 10^9-row single groups switch to
    ``approx_percentile`` — same call shape, sketch-backed.

    Returns (group_col, n_rows, p<25> p<50> ... columns).
    """
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n_rows"),
        F.percentile(value_col, F.lit(list(probs))).alias("q"))
    return agg.select(
        group_col, "n_rows",
        *[F.col("q")[i].alias(f"p{round(p * 100)}")
          for i, p in enumerate(probs)])


# --- unicode script profile --------------------------------------------------

# (name, codepoint-range character class) — literal BMP ranges so the same
# pattern string compiles identically under Java regex and RE2
SCRIPT_CLASSES = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("cjk", "[一-鿿]"),
    ("digit", "[0-9]"),
]


def script_count_cols(t) -> dict:
    """name -> character-count Column per script class (length minus
    replaced; row-local codegen regex)."""
    n = F.length(t).cast("long")
    return {name: (n - F.length(F.regexp_replace(t, pat, ""))).cast("long")
            for name, pat in SCRIPT_CLASSES}


def script_dominant_col(t):
    """Dominant script Column: first class (in SCRIPT_CLASSES order)
    holding the max count; 'none' when no class matches any character."""
    counts = script_count_cols(t)
    dominant = F.lit("none")
    # built in reverse so the earliest class's .when is evaluated first
    for name, _ in reversed(SCRIPT_CLASSES):
        others = [counts[o] for o, _ in SCRIPT_CLASSES if o != name]
        cond = (counts[name] > 0)
        for o in others:
            cond = cond & (counts[name] >= o)
        dominant = F.when(cond, F.lit(name)).otherwise(dominant)
    return dominant


def script_profile(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document unicode-script character distribution: counts and
    exact-thousandths shares of Latin / Cyrillic / CJK / digit characters,
    plus the dominant script (ties broken by SCRIPT_CLASSES order, 'none'
    for empty text). The script-mix gate every multilingual corpus
    pipeline needs (mixed-script spam, wrong-language routing, mojibake
    residue all show up here first).

    Each count is length-minus-replaced — row-local codegen regex, zero
    shuffle at any corpus size; character classes are literal codepoint
    ranges, so Java regex and RE2 (the DuckDB oracle) agree exactly.

    Returns (id_col, n_chars, n_<class>, <class>_millis ..., dominant).
    """
    t = F.col(text_col)
    n = F.length(t).cast("long")
    n1 = F.greatest(n, F.lit(1))
    cols = [F.col(id_col), n.alias("n_chars")]
    for name, c in script_count_cols(t).items():
        cols.append(c.alias(f"n_{name}"))
        cols.append(F.floor(c * 1000 / n1).cast("long")
                    .alias(f"{name}_millis"))
    return df.select(*cols, script_dominant_col(t).alias("dominant"))


def phrase_search(df: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact phrase lookup via positional equi-joins — the positional
    inverted-index probe: term i's postings are (doc, pos - i), and a
    phrase occurrence is one (doc, start) surviving the intersection of
    all terms' shifted postings. Returns (doc_id, n_matches, first_pos).

    Scale posture: each per-term postings set is a FILTER over the token
    table (predicate pushdown against a materialized (term, doc, pos)
    index would skip the tokenize entirely); the intersections are
    equi-joins on (doc, start) — at index scale, join rarest term first
    so every later join probes a shrinking set (AQE's size-based reorder
    does this for materialized postings; the phrase-order joins here are
    already bounded by the first term's match count). No windows, no
    arrays carried across rows.
    """
    terms = phrase.lower().split()
    if not terms:
        raise ValueError("empty phrase")
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(tokens_col(F.lower(F.col(text_col))))
                      .alias("pos", "term")))
    out = None
    for i, t in enumerate(terms):
        p = (toks.filter(F.col("term") == t)
             .select("doc_id", (F.col("pos") - i).alias("start")))
        out = p if out is None else out.join(p, ["doc_id", "start"])
    return (out.groupBy("doc_id")
            .agg(F.count("*").alias("n_matches"),
                 F.min("start").cast("int").alias("first_pos")))


def index_merge(base: DataFrame, delta: DataFrame,
                tombstones: DataFrame, id_col: str = "doc_id",
                term_col: str = "term") -> DataFrame:
    """Inverted-index segment merge: base ∪ delta posting pairs minus
    tombstoned documents → per-term merged postings. The LSM-style
    maintenance step every incremental index needs (new crawl round =
    delta segment; recrawled/dropped pages = tombstones).

    Inputs are exploded posting-pair tables (term, doc_id) — the form a
    segment writer materializes; the output carries doc_freq and the
    sorted-postings md5 digest, the same narrow verification convention
    as inverted_index.

    Scale posture: union → one distinct hash-agg on (term, doc) (map-side
    combine; shuffle volume = distinct pairs), one broadcast-able
    anti-join against tombstones (deleted docs are typically a tiny
    fraction of a segment), one per-term agg. Merging N segments is the
    same plan with an N-way union — no pairwise merge cascade.
    """
    pairs = (base.select(F.col(term_col).alias("term"),
                         F.col(id_col).alias("doc_id"))
             .union(delta.select(F.col(term_col).alias("term"),
                                 F.col(id_col).alias("doc_id")))
             .distinct())
    live = pairs.join(tombstones.select(F.col(id_col).alias("doc_id")),
                      "doc_id", "left_anti")
    return (live.groupBy("term")
            .agg(F.count("*").alias("doc_freq"),
                 F.md5(F.concat_ws(",", F.transform(
                     F.sort_array(F.collect_list("doc_id")),
                     lambda d: d.cast("string")))).alias("postings_md5")))


def segment_langs(df: DataFrame, seg_tokens: int = 20,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Mixed-language (code-switch) detection: split each document into
    fixed ``seg_tokens``-token segments, language-id each segment with the
    same stopword-argmax rule as :func:`with_lang_id`, and profile the mix
    per document — the CCNet move of scoring language at paragraph
    granularity instead of document granularity, which catches boilerplate
    wrappers around foreign content and bilingual pages that a whole-doc
    vote averages away.

    Returns (id, n_segments, dom_lang, n_dom, n_und, n_foreign):
    dominant segment language (ties -> count desc, lang asc), segments
    agreeing with it, undecided segments (no stopword hits), and segments
    confidently voting for ANOTHER language — n_foreign > 0 is the
    mixed-document flag.

    Scale posture: entirely aggregation-shaped — tokens explode once with
    positions, segment id = pos DIV seg_tokens, per-(doc, segment) lang
    hits are conditional sums (map-side combine collapses token volume),
    the per-segment argmax is a row-local sort of a #langs-length struct
    array, and the doc profile is one more hash-agg. No token array is
    ever carried beside a generator (see winnow_fingerprints for why),
    no window functions, no UDF.
    """
    toks = tokens_col(F.lower(F.col(text_col)))
    tokrows = (df.select(F.col(id_col).alias("doc_id"),
                         F.posexplode(toks).alias("pos", "tok"))
               .withColumn("seg", F.expr(f"pos DIV {seg_tokens}")))
    hit_aggs = []
    for lang in sorted(STOPWORDS):
        sl = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hit_aggs.append(F.sum(F.array_contains(sl, F.col("tok"))
                              .cast("int")).alias(f"__h_{lang}"))
    segs = tokrows.groupBy("doc_id", "seg").agg(*hit_aggs)
    scores = F.array(*[
        F.struct(F.col(f"__h_{lang}").alias("hits"),
                 F.lit(lang).alias("lang")) for lang in sorted(STOPWORDS)])
    best = F.sort_array(scores, asc=False)[0]
    seg_pred = segs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
        .alias("seg_lang"))
    counts = (seg_pred.groupBy("doc_id", "seg_lang")
              .agg(F.count("*").alias("n")))
    # dominant = argmax over DECIDED langs (count desc, lang asc — min_by
    # on (-n, lang); rows failing the != 'und' guard carry a NULL ordering
    # struct, which min_by skips); docs with only und segments fall back
    # to dom_lang = 'und' via the coalesce below
    prof = (counts.groupBy("doc_id")
            .agg(F.sum("n").alias("n_segments"),
                 F.min_by(F.when(F.col("seg_lang") != "und",
                                 F.col("seg_lang")),
                          F.when(F.col("seg_lang") != "und",
                                 F.struct((-F.col("n")).alias("nn"),
                                          F.col("seg_lang").alias("l"))))
                 .alias("__dom_decided"),
                 F.sum(F.when(F.col("seg_lang") == "und", F.col("n"))
                       .otherwise(0)).alias("n_und")))
    n_dom_src = (counts.select(F.col("doc_id").alias("d2"),
                               "seg_lang", F.col("n").alias("n2")))
    # join on the DECIDED dominant only: an all-und document has a NULL
    # __dom_decided, never matches, and correctly reports n_dom = 0,
    # n_foreign = 0 (its segments are all counted in n_und)
    return (prof.join(n_dom_src,
                      (prof.doc_id == n_dom_src.d2)
                      & (n_dom_src.seg_lang == F.col("__dom_decided")),
                      "left")
            .select(F.col("doc_id").alias(id_col),
                    "n_segments",
                    F.coalesce(F.col("__dom_decided"), F.lit("und"))
                    .alias("dom_lang"),
                    F.coalesce(F.col("n2"), F.lit(0)).alias("n_dom"),
                    "n_und",
                    (F.col("n_segments")
                     - F.coalesce(F.col("n2"), F.lit(0))
                     - F.col("n_und")).alias("n_foreign")))


def bm25_topk(df: DataFrame, query_terms: list, k: int = 10,
              k1_micro: int = 1_200_000, b_micro: int = 750_000,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """BM25-shaped ranked retrieval for a bag-of-terms query: top-``k``
    documents by an integer fixed-point score that keeps BM25's two moves
    — per-term tf saturation (k1) and document-length normalization (b) —
    while replacing the float-log idf with the log-free odds form
    ``(N - df + 0.5) / (df + 0.5)`` (the Robertson–Spärck-Jones weight
    before the log), the same no-float-log convention as
    :func:`tfidf_topk`, so the score is bit-exact across Spark partial-agg
    order and the DuckDB oracle.

    All arithmetic is BIGINT micro units (1e6 = 1.0)::

        dl_norm = dl * 1e6 * N div total_len            # dl / avgdl
        K       = k1 * ((1e6 - b) + b * dl_norm div 1e6) div 1e6
        tf_part = tf * (k1 + 1e6) * 1e6 div (tf * 1e6 + K)
        idf     = (2*(N - df) + 1) * 1e6 div (2*df + 1)
        score   = sum over query terms of (idf div 1000) * (tf_part div 1000)

    The contrib product drops each factor to milli precision BEFORE
    multiplying: idf is micro units and already carries a factor N for a
    rare (df=1) term — the naive ``idf * tf_part div 1e6`` product is
    ~1.5e12*N and silently wraps int64 (non-ANSI Spark) at corpus
    N ~ 7e6 docs, i.e. the overflow grows with CORPUS size, not the
    candidate set. In milli units the product caps at ~1.5e6*N — ceiling
    N ~ 6e12 docs, comfortably past the 1e8-doc posture. Cost: the last
    3 decimal digits of each factor (score stays micro-unit scaled).
    Remaining bound: ``dl*1e6*N`` caps N ~ 1e8 at 1e4-token docs —
    beyond that precompute avgdl once and use ``dl*1e6 div avgdl``.

    Output: (doc_id, n_hits, score_micro, rank) — docs matching >= 1 query
    term, ranked by score desc then doc_id asc.

    Scale posture: tf is filtered to the query's terms BEFORE the hash-agg
    (postings of |q| terms, not the corpus vocabulary); dl is one full
    hash-agg (the index-build cost, amortized across queries in a real
    deployment); N/total_len is a broadcast scalar; the final top-k is
    orderBy+limit (TakeOrdered — no global sort materializes) and the rank
    window runs over the <= k survivors only, the same capped-survivor
    pattern as the P4 budget. Everything is JVM codegen; no UDF.
    """
    from pyspark.sql import Window as W
    M = F.lit(1_000_000).cast("long")
    base = df.where(F.trim(F.col(text_col)) != "")
    toks = base.select(F.col(id_col).alias("doc_id"),
                       F.explode(tokens_col(F.lower(F.col(text_col))))
                        .alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("total_len"))
    qt = [t.lower() for t in query_terms]
    tf = (toks.where(F.col("term").isin(qt))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(dfreq, "term")
              .join(dl, "doc_id")
              .join(F.broadcast(stats))
              .withColumn("dl_norm", F.expr(
                  "dl * CAST(1000000 AS BIGINT) * n_docs div total_len"))
              .withColumn("kk", (F.lit(k1_micro).cast("long")
                                 * ((M - F.lit(b_micro))
                                    + F.expr(f"CAST({b_micro} AS BIGINT)"
                                             " * dl_norm div 1000000")))
                          .cast("long"))
              .withColumn("kk", F.expr("kk div 1000000"))
              .withColumn("tf_part", F.expr(
                  f"tf * CAST({k1_micro + 1_000_000} AS BIGINT) * 1000000 "
                  "div (tf * CAST(1000000 AS BIGINT) + kk)"))
              .withColumn("idf", F.expr(
                  "(2 * (n_docs - df) + 1) * CAST(1000000 AS BIGINT) "
                  "div (2 * df + 1)"))
              .withColumn("contrib", F.expr(
                  "(idf div 1000) * (tf_part div 1000)")))
    per_doc = (scored.groupBy("doc_id")
               .agg(F.count("*").alias("n_hits"),
                    F.sum("contrib").alias("score_micro")))
    top = (per_doc
           .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
           .limit(k))
    w = W.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("doc_id",
                    F.col("n_hits").cast("int").alias("n_hits"),
                    F.col("score_micro").cast("long").alias("score_micro"),
                    "rank"))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade in integer fixed point
    (milli-units) — the classic prose-complexity features next to the
    Gopher gates in a cleaning cascade (very low ease flags legalese /
    keyword stuffing; negative-grade flags token soup).

    Counting rules (frozen, shared with the SQL oracle):
      words      = whitespace tokens
      sentences  = runs of [.!?]+ (floored at 1)
      syllables  = runs of [aeiouy]+ in the lowercased text (the standard
                   vowel-group approximation, deliberately unsmoothed)

    fre_millis  = 206835 - (1015 * words) div max(sentences,1)
                         - (84600 * syllables) div max(words,1)
    fkg_millis  = (390 * words) div max(sentences,1)
                + (11800 * syllables) div max(words,1) - 15590

    Every division has positive operands, so Spark's truncating DIV and
    the oracle's floor division agree; the final values may be negative
    only through subtraction. Scale posture: three regexp counts + pure
    arithmetic, all row-local whole-stage codegen — no shuffle, no UDF.
    """
    t = F.col(text_col)
    words = F.size(tokens_col(t)).cast("long")
    sentences = F.regexp_count(t, F.lit("[.!?]+")).cast("long")
    syllables = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    return (df.select(F.col(id_col),
                      words.alias("n_words"),
                      sentences.alias("n_sentences"),
                      syllables.alias("n_syllables"))
            .withColumn("fre_millis", F.expr(
                "206835 - (1015 * n_words) DIV greatest(n_sentences, 1L)"
                " - (84600 * n_syllables) DIV greatest(n_words, 1L)"))
            .withColumn("fkg_millis", F.expr(
                "(390 * n_words) DIV greatest(n_sentences, 1L)"
                " + (11800 * n_syllables) DIV greatest(n_words, 1L)"
                " - 15590")))


def corpus_report(df: DataFrame, group_col: str = "source",
                  text_col: str = "text") -> DataFrame:
    """Per-source corpus datasheet (Gebru et al.'s "datasheets for
    datasets", the summary table a training-mix decision starts from):
    document / token / char volume, empty-doc count, language spread and
    the dominant language with its share, per grouping column.

    Returns (group, n_docs, total_tokens, total_chars, n_empty, n_langs,
    dom_lang, dom_docs). Dominant = most docs (ties -> lang asc);
    n_langs counts distinct predicted languages ('und' included).

    Scale posture: one row-local pass for lang-id + token counts (the
    stopword argmax is a sorted struct array, no UDF), one
    (group, lang) hash-agg, one group hash-agg, a row-local argmax over
    the <= #langs-row array per group, one broadcast-able join. Shuffle
    volume = groups x langs."""
    base = (with_lang_id(df, text_col=text_col)
            .select(F.col(group_col).alias("grp"),
                    F.col("lang_pred"),
                    F.size(tokens_col(F.col(text_col))).alias("__nt"),
                    F.length(F.coalesce(F.col(text_col), F.lit("")))
                     .alias("__nc"),
                    (F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "")
                    .cast("int").alias("__empty")))
    per_lang = (base.groupBy("grp", "lang_pred")
                .agg(F.count("*").alias("n")))
    dom = (per_lang.groupBy("grp")
           .agg(F.count("*").cast("int").alias("n_langs"),
                F.min_by(F.struct(F.col("lang_pred").alias("dom_lang"),
                                  F.col("n").alias("dom_docs")),
                         F.struct((-F.col("n")).alias("nn"),
                                  F.col("lang_pred").alias("l")))
                 .alias("__d")))
    stats = (base.groupBy("grp")
             .agg(F.count("*").cast("long").alias("n_docs"),
                  F.sum("__nt").cast("long").alias("total_tokens"),
                  F.sum("__nc").cast("long").alias("total_chars"),
                  F.sum("__empty").cast("long").alias("n_empty")))
    return (stats.join(dom, "grp")
            .select(F.col("grp").alias(group_col),
                    "n_docs", "total_tokens", "total_chars", "n_empty",
                    "n_langs",
                    F.col("__d.dom_lang").alias("dom_lang"),
                    F.col("__d.dom_docs").cast("long").alias("dom_docs")))


def proximity_search(df: DataFrame, terms: list, window: int = 8,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Proximity (sloppy-phrase) lookup: documents where ALL query terms
    co-occur within a ``window``-token span, in any order — the
    positional-index companion to :func:`phrase_search` for "near each
    other" queries (entity + attribute mentions, quote attribution).
    Terms must be distinct (each match binds one position per term; a
    duplicated term would just re-bind the same position).

    A match is a tuple of one position per term with
    max(pos) - min(pos) + 1 <= window. Returns (doc_id, n_matches,
    min_span, first_pos): match-tuple count, the tightest span, and the
    earliest window start.

    Scale posture: per-term postings are filters over the token table
    (same pushdown note as phrase_search); the k-way intersection joins
    carry the |pos_i - pos_0| < window bound IN the join condition, so
    the tuple set stays near-linear for natural text (per-doc tf
    products only inside the window, not across the document).
    Pathological single-token-repeated docs blow up combinatorially —
    the same caveat as any positional slop query; cap tf upstream if the
    corpus has them. No windows, no arrays across rows."""
    qt = [t.lower() for t in terms]
    if len(qt) < 2:
        raise ValueError("proximity_search needs >= 2 terms")
    if len(set(qt)) != len(qt):
        raise ValueError("proximity_search terms must be distinct")
    if window < len(qt):
        raise ValueError("window smaller than the term count can't match")
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(tokens_col(F.lower(F.col(text_col))))
                      .alias("pos", "term")))
    out = (toks.filter(F.col("term") == qt[0])
           .select("doc_id", F.col("pos").alias("p0")))
    for i, t in enumerate(qt[1:], start=1):
        p = (toks.filter(F.col("term") == t)
             .select(F.col("doc_id").alias("__d"),
                     F.col("pos").alias(f"p{i}")))
        cond = ((out.doc_id == p.__d)
                & (p[f"p{i}"] - out.p0 < window)
                & (out.p0 - p[f"p{i}"] < window))
        out = out.join(p, cond).drop("__d")
    ps = [F.col(f"p{i}") for i in range(len(qt))]
    span = F.greatest(*ps) - F.least(*ps) + 1
    return (out.withColumn("__span", span)
            .filter(F.col("__span") <= window)
            .withColumn("__start", F.least(*ps))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_matches"),
                 F.min("__span").cast("int").alias("min_span"),
                 F.min("__start").cast("int").alias("first_pos")))
