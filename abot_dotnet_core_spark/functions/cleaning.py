"""Corpus-cleaning operators for training-data pipelines.

Beyond-reference family (SURVEY.md §2 "pipeline operators"): the standard
web-text cleaning passes a 100 TB pretraining pipeline runs after crawling —
Gopher-style repetition filters, PII redaction, and CCNet-style line-level
dedup. Everything is JVM-side built-ins (split / higher-order array fns /
regexp / window / partial agg); no Python UDFs anywhere.

Operators:
  with_repetition     Gopher repetition signals (duplicate-word fraction,
                      duplicate-2-gram fraction, most-frequent-2-gram
                      coverage) + a frozen keep/drop flag
  gopher_quality      Gopher quality gate (word-count bounds, mean word
                      length, symbol/bullet/ellipsis ratios, alpha-word
                      ratio, stopword hits) — all row-local, zero shuffle
  with_pii_scrub      email/phone redaction + per-doc redaction counts
  line_dedup          corpus-global keep-first line dedup with document
                      reassembly (CCNet paragraph dedup shape)
  span_dedup          C4 three-sentence-span dedup (keep the global first
                      occurrence of every repeated span, drop the rest)
  fix_mojibake        ftfy-style repair of UTF-8-read-as-Latin-1 digraphs
                      (curly quotes, dashes, accented letters) + fix count
  badwords_filter     C4 banned-wordlist page gate (drop any page whose
                      token stream hits the list) + per-doc hit count
  quality_classifier  hashing-trick linear quality scorer (fastText /
                      GPT-3-classifier shape: hashed token features x
                      frozen weights, mean-pooled) — row-local, no model
                      file needed
  perplexity_buckets  CCNet head/middle/tail LM-score bucketing (unigram
                      NLL stand-in for KenLM; real percentile machinery)
  domain_stats        per-domain reputation aggregate + broadcast
                      blocklist gate (UT1-style domain filtering)

Scale posture (100 TB):
  - with_repetition's only shuffle is the (doc_id, gram) partial-count agg —
    map-side combine collapses each doc's grams before the exchange, and the
    per-doc join back is on the same key layout.
  - with_pii_scrub is a pure narrow map (regexp in whole-stage codegen).
  - line_dedup shuffles lines once on line_hash (the dedup key) and once on
    doc_id (reassembly); the window over line_hash is per-duplicate-group
    sized, never per-partition-global. A hot boilerplate line ("subscribe
    now") creates a big hash group — its window only ranks rows to find the
    global-first occurrence, which AQE skew-split handles; for extreme cases
    pre-aggregate min(doc_id, pos) per hash instead (same result, pure agg —
    that is the variant implemented here for exactly that reason).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from abot_dotnet_core_spark.functions.textfns import tokens_col

# Frozen repetition thresholds (Gopher-shaped, calibrated so both outcomes
# occur on the synthetic corpus; shared with the SQL oracle).
DUP_WORD_MAX = 0.6
DUP_2GRAM_MAX = 0.05
TOP_2GRAM_MAX = 0.06

# C4 heuristic-cleaning constants (Raffel et al. 2020 §2.2), shared with the
# SQL oracle. Terminal punctuation is the paper's list (period, exclamation,
# question mark, end-quote).
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_LINES = 3
C4_TERMINAL_RE = '[.!?"]$'

# PII patterns — deliberately restricted to syntax RE2 (DuckDB) and java.util
# .regex (Spark) interpret identically: no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9-]{6,}[0-9]"


def _bigrams(toks: Column) -> Column:
    """Adjacent-token 2-grams; <2 tokens -> empty array.

    Zip of two shifted slices, NOT ``transform(sequence, i ->
    element_at(toks, i))`` — interpreted higher-order functions re-evaluate
    the ``toks`` expression per element, which turns a derived token array
    into O(tokens^2) tokenizer work."""
    n = F.size(toks)
    m = F.greatest(n - 1, F.lit(0))
    grams = F.transform(
        F.arrays_zip(F.slice(toks, 1, m), F.slice(toks, 2, m)),
        lambda s: F.concat_ws(" ", s["0"], s["1"]))
    return F.when(n >= 2, grams).otherwise(F.array().cast("array<string>"))


def with_repetition(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 §A1.1 repetition removal,
    re-expressed set-at-a-time): per-document duplicate-word fraction,
    duplicate-2-gram fraction, and the coverage of the most frequent 2-gram,
    plus a frozen keep flag.

    Word-level stats stay row-local (array_distinct — no shuffle); 2-gram
    stats go through one (doc_id, gram) partial-count aggregation so the
    most-frequent-gram count is an honest distributed mode, then join back
    on doc_id. Ratios round to 6 dp to hash identically with the oracle."""
    t = F.col(text_col)
    toks = tokens_col(t)
    n = F.size(toks)
    ndist = F.size(F.array_distinct(toks))
    base = (df.withColumn("n_words", n)
              .withColumn("dup_word_frac",
                          F.round((n - ndist) / F.greatest(n, F.lit(1)), 6))
              .withColumn("__toks", toks))

    gram_rows = base.select(id_col, F.explode(_bigrams(F.col("__toks")))
                            .alias("gram"))
    gstats = (gram_rows.groupBy(id_col, "gram").count()
              .groupBy(id_col)
              .agg(F.sum("count").alias("__n2"),
                   F.count("*").alias("__d2"),
                   F.max("count").alias("__maxc")))

    out = (base.join(gstats, id_col, "left")
           .withColumn("dup_2gram_frac",
                       F.coalesce(F.round((F.col("__n2") - F.col("__d2"))
                                          / F.col("__n2"), 6), F.lit(0.0)))
           .withColumn("top_2gram_frac",
                       F.coalesce(F.round(F.col("__maxc") / F.col("__n2"), 6),
                                  F.lit(0.0)))
           .withColumn("repetition_keep",
                       (F.col("dup_word_frac") <= DUP_WORD_MAX)
                       & (F.col("dup_2gram_frac") <= DUP_2GRAM_MAX)
                       & (F.col("top_2gram_frac") <= TOP_2GRAM_MAX)))
    return out.drop("__toks", "__n2", "__d2", "__maxc")


def c4_filters(df: DataFrame, lines_col: str = "lines",
               id_col: str = "doc_id") -> DataFrame:
    """C4 heuristic cleaning (Raffel et al. 2020 §2.2), set-at-a-time.

    Line level — keep a line iff it (a) ends in terminal punctuation,
    (b) has >= ``C4_MIN_WORDS_PER_LINE`` words, (c) does not mention
    "javascript" (case-insensitive). Document level — drop the page iff it
    contains "lorem ipsum" (case-insensitive), contains a curly brace
    (either ``{`` or ``}`` — a truncated fragment with only the closing
    brace is still code), or
    keeps fewer than ``C4_MIN_LINES`` lines (the paper's >=3-sentences
    gate at line granularity).

    Every predicate is row-local (``filter``/``exists`` higher-order array
    functions over the doc's own lines) — the whole operator is one narrow
    map in whole-stage codegen, ZERO shuffle at any corpus size; the 100 TB
    plan is scan -> project. Output: (id_col, n_lines, n_kept, keep,
    clean_md5) where clean_md5 digests the surviving lines joined by \\n
    (full text stays on the executors).
    """
    lines = F.col(lines_col)
    keep_line = lambda x: (  # noqa: E731 — inline HOF predicate
        x.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(x), "\\s+")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(x).contains("javascript"))
    kept = F.filter(lines, keep_line)
    joined = F.lower(F.array_join(lines, "\n"))
    doc_bad = (joined.contains("lorem ipsum")
               | joined.contains("{") | joined.contains("}"))
    n_kept = F.size(kept)
    return (df.select(
        id_col,
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept"),
        (~doc_bad & (n_kept >= C4_MIN_LINES)).alias("keep"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5")))


def span_dedup(df: DataFrame, lines_col: str = "lines",
               id_col: str = "doc_id", span: int = 3) -> DataFrame:
    """C4 three-sentence-span dedup (Raffel et al. 2020 §2.2: "we discarded
    all but one of any three-sentence span occurring more than once in the
    data set"), at line granularity, set-at-a-time.

    Semantics (frozen, shared with the SQL oracle): a span is ``span``
    consecutive lines of one document; the global first occurrence of a
    span value is the lexicographic minimum (doc_id, span_pos); every line
    covered by at least one NON-first occurrence of a repeated span is
    dropped; documents shorter than ``span`` lines carry no span and keep
    everything. Output is (id_col, n_lines, n_kept, clean_md5) where
    clean_md5 digests the surviving lines joined by \\n in original order
    (full text stays on the executors, like :func:`c4_filters`).

    Scale posture (100 TB): spans are built row-locally (zip of shifted
    slices — see :func:`_bigrams` for why not transform/sequence), hashed
    to md5 strings, and first-occurrence is a struct-min AGGREGATION per
    span hash — a boilerplate span shared by 10^9 pages is one
    combine-reduced group, never a giant sort window. Shuffles: the span
    agg, the occurrence join back on span hash, the drop-set anti-join on
    (doc, pos), and the doc reassembly — all key-partitioned, nothing
    corpus-global on the driver."""
    lines = F.col(lines_col)
    n = F.size(lines)
    m = F.greatest(n - (span - 1), F.lit(0))
    parts = [F.slice(lines, 1 + i, m) for i in range(span)]
    spans = F.transform(
        F.arrays_zip(*parts),
        lambda s: F.md5(F.concat_ws("\n", *[s[str(i)] for i in range(span)])))
    base = df.select(id_col, F.col(lines_col), n.alias("n_lines"),
                     F.when(n >= span, spans)
                      .otherwise(F.array().cast("array<string>"))
                      .alias("__spans"))
    occ = base.select(id_col,
                      F.posexplode("__spans").alias("spos", "span_hash"))
    first = (occ.groupBy("span_hash")
             .agg(F.min(F.struct(id_col, "spos")).alias("fk"),
                  F.count("*").alias("n_occ")))
    dups = (occ.join(first, "span_hash")
            .where((F.col("n_occ") > 1)
                   & ~((F.col(id_col) == F.col(f"fk.{id_col}"))
                       & (F.col("spos") == F.col("fk.spos")))))
    drop_pos = (dups.select(
        id_col, F.explode(F.sequence(
            F.col("spos"), F.col("spos") + (span - 1))).alias("pos"))
        .distinct())
    pos_rows = base.select(id_col, "n_lines",
                           F.posexplode(lines_col).alias("pos", "line"))
    kept = pos_rows.join(drop_pos, [id_col, "pos"], "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count("*").alias("n_kept"),
                    F.md5(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]), "\n")).alias("clean_md5")))
    all_docs = base.select(id_col, "n_lines")
    return (all_docs.join(rebuilt, id_col, "left")
            .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
            .withColumn("clean_md5",
                        F.coalesce("clean_md5", F.md5(F.lit(""))))
            .select(id_col, "n_lines", "n_kept", "clean_md5"))


# Mojibake repair table (ftfy-style, Speer 2019): the most common
# UTF-8-bytes-read-as-Latin-1/cp1252 digraphs seen in web text. Longer
# patterns first — each entry is applied to the OUTPUT of the previous one,
# so an earlier longer match can't be re-broken by a later shorter one.
# Shared verbatim with the SQL oracle builder in __spark_entry__.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("\u00e2\u20ac\u2122", "\u2019"),  # right single quote
    ("\u00e2\u20ac\u02dc", "\u2018"),  # left single quote
    ("\u00e2\u20ac\u0153", "\u201c"),  # left double quote
    ("\u00e2\u20ac\u009d", "\u201d"),  # right double quote
    ("\u00e2\u20ac\u201c", "\u2013"),  # en dash
    ("\u00e2\u20ac\u201d", "\u2014"),  # em dash
    ("\u00e2\u20ac\u00a6", "\u2026"),  # ellipsis
    ("\u00c3\u00a9", "\u00e9"),  # e-acute
    ("\u00c3\u00a8", "\u00e8"),  # e-grave
    ("\u00c3\u00a1", "\u00e1"),  # a-acute
    ("\u00c3\u00b3", "\u00f3"),  # o-acute
    ("\u00c3\u00b1", "\u00f1"),  # n-tilde
    ("\u00c3\u00bc", "\u00fc"),  # u-umlaut
    ("\u00c3\u00b6", "\u00f6"),  # o-umlaut
    ("\u00c3\u00a4", "\u00e4"),  # a-umlaut
    ("\u00c3\u00a7", "\u00e7"),  # c-cedilla
    ("\u00c2\u00ab", "\u00ab"),  # laquo
    ("\u00c2\u00bb", "\u00bb"),  # raquo
    ("\u00c2\u00a0", "\u0020"),  # nbsp->space
]


def fix_mojibake(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ftfy-style mojibake repair (the cleaning pass OpenWebText2/The Pile
    run before dedup): undo the classic UTF-8-bytes-decoded-as-Latin-1
    digraphs via a frozen, ordered literal-replacement chain.

    Each pattern is counted on the text AS LEFT BY the previous replacement
    (length arithmetic — no regex), then replaced; ``n_fixed`` is the total
    number of digraphs repaired. Pure narrow map: the whole chain is one
    nested expression in whole-stage codegen, ZERO shuffle at any corpus
    size. Emits ``fixed_text`` + ``n_fixed``."""
    t = F.col(text_col)
    n_fixed = F.lit(0).cast("long")
    for bad, good in MOJIBAKE_MAP:
        n_fixed = n_fixed + ((F.length(t) - F.length(
            F.replace(t, F.lit(bad), F.lit("")))) / len(bad)).cast("long")
        t = F.replace(t, F.lit(bad), F.lit(good))
    return (df.withColumn("fixed_text", t)
              .withColumn("n_fixed", n_fixed))


# Frozen stand-in banned-word list (the real C4 run uses the public "List
# of Dirty, Naughty, Obscene..." — ~400 entries; same mechanism, same scale
# posture, any list size broadcasts as a literal or a broadcast join).
# Chosen so both outcomes occur on the synthetic corpus.
C4_BADWORDS = ["slow", "dup"]

# quality_classifier frozen parameters (shared with the SQL oracle):
# feature-hash buckets and the deterministic weight ramp standing in for
# trained coefficients (Knuth multiplicative constant, zero-mean range).
QC_BUCKETS = 64
QC_WEIGHT_MULT = 2654435761  # 2^32 / phi, Knuth multiplicative hashing
QC_WEIGHT_MOD = 2001         # weights in {-1000..1000} / 1000


def badwords_filter(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """C4 banned-wordlist page gate (Raffel et al. 2020 §2.2: "removed any
    page that contained any word on the 'List of Dirty, Naughty, Obscene or
    Otherwise Bad Words'"), with a frozen stand-in list (``C4_BADWORDS``).

    Counts token OCCURRENCES (not distinct hits) via a row-local
    higher-order filter over the doc's own tokens — one narrow codegen map,
    ZERO shuffle at any corpus size. A real 400-word list is still a
    literal IN over a token; for 10^5+-entry lists switch to a broadcast
    semi-join on exploded tokens (same result, one broadcast)."""
    toks = tokens_col(F.col(text_col))
    n_bad = F.size(F.filter(toks, lambda x: x.isin(C4_BADWORDS)))
    return (df.select(id_col,
                      F.size(toks).alias("n_words"),
                      n_bad.alias("n_bad"),
                      (n_bad == 0).alias("keep")))


def quality_classifier(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Hashing-trick linear quality classifier (the GPT-3 / CCNet / LLaMA
    pipeline step: score every page with a cheap linear model, keep
    high-quality pages). The sandbox has no trained fastText model, so the
    coefficients are a frozen deterministic ramp over hash buckets — the
    distributed scoring machinery (feature hashing, per-token weight
    lookup, mean pooling, threshold gate) is the real thing and is exactly
    what a trained-weight swap-in would run.

    Per token: bucket = first-8-hex-digits(md5(token)) mod ``QC_BUCKETS``;
    weight = ((bucket * ``QC_WEIGHT_MULT``) mod ``QC_WEIGHT_MOD`` - 1000)
    / 1000. Document score = mean token weight (6 dp), keep = score > 0;
    empty docs score 0 and drop. Entirely row-local (aggregate over the
    doc's own token array) — ZERO shuffle at any corpus size; a trained
    10^6-bucket table would instead broadcast-join exploded tokens."""
    toks = tokens_col(F.col(text_col))

    def weight_milli(x):
        # integer milli-weights: exact in both engines, one float division
        # at the end (float accumulation order would be engine-dependent)
        b = F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") \
            % QC_BUCKETS
        return (b * QC_WEIGHT_MULT) % QC_WEIGHT_MOD - 1000

    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, x: acc + weight_milli(x))
    score = (F.when(n > 0, F.round(total / (n * 1000.0), 6))
              .otherwise(F.lit(0.0)))
    return (df.select(id_col,
                      n.alias("n_words"),
                      score.alias("quality_score"),
                      (score > 0).alias("keep")))


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails then phone numbers (order matters: email local parts
    contain digits that the phone pattern must not re-match), emitting
    ``clean_text`` plus per-document redaction counts. Pure narrow map —
    regexp_replace/regexp_count run inside whole-stage codegen."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    no_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(no_email, F.lit(PHONE_RE))
    clean = F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
    return (df.withColumn("n_emails", n_emails)
              .withColumn("n_phones", n_phones)
              .withColumn("clean_text", clean))


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet-style LM-score bucketing (Wenzek et al. 2019 §3.2: score each
    document with a language-model perplexity, split the corpus into
    head/middle/tail at the 1/3 and 2/3 percentiles). The sandbox has no KenLM,
    so the frozen stand-in LM is the corpus's own unigram distribution —
    score = mean negative log-likelihood of the document's tokens; the
    bucketing machinery (global score distribution -> discrete percentile
    thresholds -> assignment) is the real thing.

    Shape at 100 TB: token counts are one partial-count agg; the count table
    is vocabulary-sized, so the score join broadcasts; the two thresholds
    are a 2-value aggregate cross-joined back. No row ever carries more
    than its own tokens."""
    toks = (df.select(id_col, F.explode(tokens_col(F.col(text_col)))
                      .alias("tok")))
    cnt = toks.groupBy("tok").count()
    total = cnt.agg(F.sum("count").alias("total"))
    probs = (F.broadcast(cnt.crossJoin(total))
             .withColumn("logp", F.ln(F.col("count") / F.col("total")))
             .select("tok", "logp"))
    nll = (toks.join(probs, "tok")
           .groupBy(id_col)
           .agg(F.round(F.avg(-F.col("logp")), 6).alias("nll")))
    th = nll.agg(
        F.expr("percentile_disc(0.33) WITHIN GROUP (ORDER BY nll)")
         .alias("t1"),
        F.expr("percentile_disc(0.66) WITHIN GROUP (ORDER BY nll)")
         .alias("t2"))
    return (nll.crossJoin(F.broadcast(th))
            .withColumn("bucket",
                        F.when(F.col("nll") <= F.col("t1"), "head")
                         .when(F.col("nll") <= F.col("t2"), "middle")
                         .otherwise("tail"))
            .select(id_col, "nll", "bucket"))


def domain_stats(df: DataFrame, blocked: DataFrame,
                 domain_col: str = "source") -> DataFrame:
    """Domain-reputation gate (UT1-blocklist-style corpus filtering): per
    domain, aggregate document count / size / dominant language, then mark
    domains on the blocklist. ``blocked`` is a 1-column DataFrame of
    blocked domain names — broadcast into the aggregate (blocklists are
    ~10^6 rows; never shuffle the corpus for them). Dominant-language ties
    break on language code order via max(struct(cnt, lang))."""
    per_lang = (df.groupBy(domain_col, "lang")
                .agg(F.count("*").alias("c"),
                     F.sum("n_chars").alias("chars")))
    agg = (per_lang.groupBy(domain_col)
           .agg(F.sum("c").alias("n_docs"),
                F.sum("chars").alias("n_chars"),
                F.count("*").alias("n_langs"),
                F.max(F.struct(F.col("c"), F.col("lang")))["lang"]
                 .alias("top_lang")))
    b = F.broadcast(blocked.select(F.col(blocked.columns[0])
                                   .alias(domain_col))
                    .withColumn("__blocked", F.lit(True)))
    return (agg.join(b, domain_col, "left")
            .withColumn("keep", F.col("__blocked").isNull())
            .drop("__blocked"))


def line_dedup(df: DataFrame, lines_col: str = "lines",
               id_col: str = "doc_id") -> DataFrame:
    """CCNet-style corpus-global line dedup (Wenzek et al. 2019 §3.1: drop
    every duplicate line, keep the first occurrence), then reassemble each
    document from its surviving lines in original order.

    ``df`` carries ``(id_col, lines: array<string>)``. The first occurrence
    of a line is the minimum (doc_id, pos) over the whole corpus — computed
    as a struct min-aggregation per line hash (NOT a row_number window, so a
    boilerplate line shared by 10^9 docs is a single combine-reduced agg
    group, not a giant sort partition; and no packed-bigint key, so there is
    no line-count-per-doc limit or overflow). Two shuffles total: one on
    the line hash, one on doc_id for reassembly.

    Output: (id_col, n_lines, n_kept, clean_text) — docs whose every line
    was a duplicate still appear, with n_kept=0 and clean_text=''."""
    lines = (df.select(id_col, F.size(lines_col).alias("n_lines"),
                       F.posexplode(lines_col).alias("pos", "line"))
             .withColumn("line_hash", F.xxhash64("line")))
    # global first occurrence per line: lexicographic struct min
    first = (lines.groupBy("line_hash")
             .agg(F.min(F.struct(id_col, "pos")).alias("first_key")))
    kept = (lines.join(first, "line_hash")
            .where((F.col(id_col) == F.col(f"first_key.{id_col}"))
                   & (F.col("pos") == F.col("first_key.pos"))))
    rebuilt = (kept.groupBy(id_col)
               .agg(F.count("*").alias("n_kept"),
                    F.first("n_lines").alias("n_lines"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]), "\n").alias("clean_text")))
    # docs fully deduplicated away re-enter with empty text
    all_docs = df.select(id_col, F.size(lines_col).alias("n_lines"))
    return (all_docs.join(rebuilt.drop("n_lines"), id_col, "left")
            .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)))
            .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
            .select(id_col, "n_lines", "n_kept", "clean_text"))


# Gopher quality-filter constants (Rae et al. 2021 §A1.2), shared with the
# SQL oracle. Ratios are exact integer thousandths; the stopword list is
# the paper's own eight words.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_MILLIS = 3_000
GOPHER_MAX_MEAN_WORD_LEN_MILLIS = 10_000
GOPHER_MAX_SYMBOL_RATIO_MILLIS = 100          # '#' or '…' per word > 0.1
GOPHER_MAX_BULLET_LINE_MILLIS = 900           # > 90% lines start bulleted
GOPHER_MAX_ELLIPSIS_LINE_MILLIS = 300         # > 30% lines end with …/...
GOPHER_MIN_ALPHA_WORD_MILLIS = 800            # < 80% words with a letter
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_signal_cols(t, min_words: int = GOPHER_MIN_WORDS,
                       max_words: int = GOPHER_MAX_WORDS) -> dict:
    """The §A1.2 signal expressions over a text Column, as a name->Column
    dict ending in ``gopher_keep`` — shared by :func:`gopher_quality` and
    the :func:`quality_cascade` composition so the gate is defined once."""
    toks = tokens_col(t)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1)).cast("long")
    lines = F.split(t, "\n")
    nl = F.greatest(F.size(lines), F.lit(1)).cast("long")

    # floor(x*1000/y) via float is exact while x*1000 < 2^53 — true for any
    # per-document quantity here; DuckDB mirrors with bigint //
    def millis(x, denom):
        return F.floor(x.cast("long") * 1000 / denom).cast("long")

    word_chars = F.aggregate(toks, F.lit(0).cast("long"),
                             lambda acc, w: acc + F.length(w))
    mean_len = millis(word_chars, n1)

    # '#' and '…' per char + literal '...' occurrences (non-overlapping,
    # same semantics as DuckDB replace)
    n_symbols = (F.length(t) - F.length(F.translate(t, "#…", ""))
                 + (F.length(t) - F.length(F.replace(t, F.lit("..."),
                                                     F.lit(""))))
                 / F.lit(3))
    symbol_ratio = millis(n_symbols, n1)

    bullet = F.size(F.filter(
        lines, lambda x: F.trim(x).rlike("^[•*-] ")))
    bullet_ratio = millis(bullet, nl)
    ellipsis = F.size(F.filter(
        lines, lambda x: F.rtrim(x).rlike("(…|\\.\\.\\.)$")))
    ellipsis_ratio = millis(ellipsis, nl)

    alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    alpha_ratio = millis(alpha, n1)

    low_toks = F.transform(toks, F.lower)
    stop_hits = F.size(F.filter(
        low_toks, lambda w: w.isin(*GOPHER_STOPWORDS)))

    keep = ((n >= min_words) & (n <= max_words)
            & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN_MILLIS)
            & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN_MILLIS)
            & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO_MILLIS)
            & (bullet_ratio <= GOPHER_MAX_BULLET_LINE_MILLIS)
            & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_LINE_MILLIS)
            & (alpha_ratio >= GOPHER_MIN_ALPHA_WORD_MILLIS)
            & (stop_hits >= GOPHER_MIN_STOPWORD_HITS))
    return {
        "n_words": n,
        "mean_word_len_millis": mean_len,
        "symbol_ratio_millis": symbol_ratio,
        "bullet_line_millis": bullet_ratio,
        "ellipsis_line_millis": ellipsis_ratio,
        "alpha_word_millis": alpha_ratio,
        "stopword_hits": stop_hits,
        "gopher_keep": keep,
    }


def gopher_quality(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = GOPHER_MIN_WORDS,
                   max_words: int = GOPHER_MAX_WORDS) -> DataFrame:
    """Gopher quality filters (Rae et al. 2021 §A1.2), set-at-a-time and
    integer-exact: word-count bounds, mean word length in [3, 10] chars,
    symbol-to-word ratio ('#'/ellipsis) <= 0.1, < 90% of lines starting
    with a bullet, <= 30% of lines ending in an ellipsis, >= 80% of words
    containing a letter, and >= 2 hits from the paper's eight stopwords.

    Every signal is a row-local higher-order array function over the
    document's own words/lines — ONE narrow codegen map, zero shuffle at
    any corpus size (the complement of ``with_repetition``, whose 2-gram
    mode needs an aggregation). All ratios are int64 floor thousandths, so
    the DuckDB oracle matches bit-for-bit.

    Returns (id_col, n_words, mean_word_len_millis, symbol_ratio_millis,
    bullet_line_millis, ellipsis_line_millis, alpha_word_millis,
    stopword_hits, gopher_keep).
    """
    sig = gopher_signal_cols(F.col(text_col), min_words, max_words)
    return df.select(
        id_col, *[c.alias(name) for name, c in sig.items()])


# --- composed document-quality cascade ---------------------------------------

CASCADE_GATES = ("empty", "script", "gopher", "soft404", "duplicate")


def quality_cascade(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The document-side decision cascade: script routing -> Gopher
    quality -> soft-404 -> exact dedup, composed as ONE declarative plan
    with golden reason strings — the corpus-cleaning mirror of the crawl
    engine's P1-P17 URL cascade (same first-failing-gate semantics, same
    frozen reason vocabulary ``CASCADE_GATES``).

    Order follows real pipelines (CCNet/RefinedWeb): language/script
    routing first, then quality, then error shells, and dedup last so a
    rejected page can never crowd out its kept duplicate.

    Plan shape: every gate signal rides one narrow codegen projection
    (all three families are row-local expression dicts — gopher_signal_
    cols, script_dominant_col, soft404_cols); dedup adds one
    fingerprint hash-agg over the SURVIVORS of the row-local gates plus
    one equi-join back (AQE broadcasts the first-occurrence dim when
    small). The corpus text never shuffles.

    Returns (id_col, fingerprint, reason, kept): reason is NULL for kept
    documents, else the first failing gate name ('empty' for blank or
    null text — all-boilerplate pages after main-content extraction
    land here, not in a misleading 'script'); 'duplicate' marks every
    survivor whose fingerprint was first claimed by a lower id.
    """
    from .textfns import fingerprint_col, script_dominant_col, soft404_cols

    t = F.col(text_col)
    pre = (F.when(F.trim(F.coalesce(t, F.lit(""))) == "", "empty")
           .when(script_dominant_col(t) != "latin", "script")
           .when(~gopher_signal_cols(t)["gopher_keep"], "gopher")
           .when(soft404_cols(t)["is_soft404"], "soft404"))
    base = df.select(F.col(id_col), fingerprint_col(t).alias("fingerprint"),
                     pre.alias("pre_reason"))
    # materialize the 3-column gate projection once: it feeds BOTH sides
    # of the dedup join, and the gate expressions (4 script regex counts,
    # the Gopher HOF set, 5 phrase scans, the md5) are the operator's
    # dominant cost — recomputing them per join side would double it
    base = base.localCheckpoint(eager=True)
    first = (base.filter(F.col("pre_reason").isNull())
             .groupBy("fingerprint")
             .agg(F.min(id_col).alias("first_id")))
    reason = F.coalesce(
        F.col("pre_reason"),
        F.when(F.col(id_col) != F.col("first_id"), "duplicate"))
    return (base.join(first, "fingerprint", "left")
            .select(id_col, "fingerprint", reason.alias("reason"),
                    reason.isNull().alias("kept")))
