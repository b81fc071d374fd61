"""Unigram-LM subword segmentation (SentencePiece-style Viterbi decode).

``viterbi_segment_words`` assigns each word its best segmentation under a
unigram vocabulary with integer milli(-log-prob) scores — the inference
step of Kudo 2018's unigram tokenizer (arXiv:1804.10959), completing the
tokenizer surface next to bpe.py's trainer/encoder. The reference crawler
carries page text opaquely (Abot/src/Abot, CrawledPage.cs) — this serves
the LLM-data-pipeline operator family, not crawl parity.

Objective: minimize total score, ties broken by fewer pieces, then by the
lexicographically smallest piece string — a total deterministic order, so
the result is bit-exactly reproducible by the DuckDB oracle's unrolled DP.

Spark-first shape: the whole Viterbi DP runs as ONE ``F.aggregate`` fold
over the word's character positions, carrying a sliding window of DP
states sized to the vocab's longest piece (score, n, path structs;
``array_min`` gives the field-ordered minimum, skipping impossible
candidates) — a single
higher-order-function expression, O(max word length) codegen size, zero
Python, zero shuffle beyond the word-table ``distinct``. Like bpe.py, it
runs over the DISTINCT-words table, so a 100 TB corpus collapses to its
vocabulary before any per-word work; segmentations join back to documents
by word and the corpus text is never re-shuffled. Above
UNIGRAM_ARROW_THRESHOLD vocab entries the literal score maps would bloat
the expression tree (a production tokenizer ships ~32k pieces), so the
vocab broadcasts into one Arrow-batched mapInPandas pass instead — the
BPE_ARROW_THRESHOLD / IVF_ARROW_THRESHOLD gate pattern, parity-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Fixed demonstration vocabulary: 26 single characters (every [a-z] word
# is always segmentable) plus 2/3/4-gram pieces with deterministic integer
# milli scores. Scores are LITERALS shared verbatim with the SQL oracle.
UNIGRAM_VOCAB: list[tuple[str, int]] = [
    ("a", 5000), ("b", 5000), ("c", 5000), ("d", 5000), ("e", 5000),
    ("f", 5000), ("g", 5000), ("h", 5000), ("i", 5000), ("j", 5000),
    ("k", 5000), ("l", 5000), ("m", 5000), ("n", 5000), ("o", 5000),
    ("p", 5000), ("q", 5000), ("r", 5000), ("s", 5000), ("t", 5000),
    ("u", 5000), ("v", 5000), ("w", 5000), ("x", 5000), ("y", 5000),
    ("z", 5000), ("ag", 4300), ("al", 4307), ("am", 4314), ("an", 4321),
    ("ar", 4328), ("as", 4335), ("at", 4342), ("bi", 4349), ("bl", 4356),
    ("ch", 4363), ("co", 4370), ("cu", 4377), ("da", 4384), ("do", 4391),
    ("ea", 4398), ("er", 4405), ("ey", 4412), ("fa", 4419), ("fi", 4426),
    ("ge", 4433), ("gg", 4440), ("gr", 4447), ("ha", 4454), ("he", 4461),
    ("ig", 4468), ("il", 4475), ("in", 4482), ("jo", 4489), ("ke", 4496),
    ("le", 4503), ("li", 4510), ("lo", 4517), ("lu", 4524), ("me", 4531),
    ("mn", 4538), ("nd", 4545), ("ne", 4552), ("oi", 4559), ("ol", 4566),
    ("om", 4573), ("or", 4580), ("ou", 4587), ("ow", 4594), ("pa", 4601),
    ("qu", 4608), ("re", 4615), ("rk", 4622), ("ro", 4629), ("rt", 4636),
    ("ry", 4643), ("sc", 4650), ("sm", 4657), ("so", 4664), ("st", 4671),
    ("ta", 4678), ("tc", 4685), ("th", 4692), ("to", 4699), ("tr", 4306),
    ("ue", 4313), ("um", 4320), ("up", 4327), ("us", 4334), ("va", 4341),
    ("ve", 4348), ("wi", 4355), ("agg", 5600), ("all", 5611), ("ark", 5622),
    ("ash", 5633), ("ata", 5644), ("bat", 5655), ("big", 5666), ("ble", 5677),
    ("can", 5688), ("col", 5699), ("cus", 5710), ("dat", 5721), ("der", 5732),
    ("dow", 5743), ("eam", 5754), ("ery", 5765), ("fas", 5776), ("fil", 5787),
    ("gro", 5798), ("has", 5809), ("ine", 5820), ("joi", 5831), ("key", 5842),
    ("lin", 5853), ("low", 5864), ("lue", 5875), ("mer", 5886), ("ord", 5897),
    ("ort", 5908), ("oup", 5919), ("que", 5930), ("row", 5941), ("sca", 5952),
    ("slo", 5963), ("sma", 5974), ("sor", 5985), ("spa", 5996), ("str", 6007),
    ("tab", 6018), ("tch", 6029), ("ter", 6040), ("the", 6051), ("tom", 6062),
    ("tor", 6073), ("umn", 6084), ("val", 6095), ("vec", 6106), ("win", 6117),
    ("able", 6500), ("alue", 6513), ("atch", 6526), ("batc", 6539), ("colu", 6552),
    ("ctor", 6565), ("cust", 6578), ("data", 6591), ("erge", 6604), ("fast", 6617),
    ("filt", 6630), ("grou", 6643), ("hash", 6656), ("join", 6669), ("line", 6682),
    ("lter", 6695), ("lumn", 6708), ("mall", 6721), ("merg", 6734), ("ndow", 6747),
    ("omer", 6760), ("orde", 6773), ("park", 6786), ("quer", 6799), ("rder", 6812),
    ("ream", 6825), ("roup", 6838), ("scan", 6851), ("slow", 6864), ("smal", 6877),
    ("sort", 6890), ("spar", 6903), ("stre", 6916), ("tabl", 6929), ("uery", 6942),
    ("valu", 6955), ("vect", 6968), ("wind", 6981),
]

MAX_WORD_LEN = 12

# Above this many vocab entries the per-length literal score maps stop
# being a sane expression tree; ship the vocab as a broadcast dict into
# one Arrow pass instead (same gate pattern as BPE_ARROW_THRESHOLD).
UNIGRAM_ARROW_THRESHOLD = 512


def _by_len(vocab):
    out: dict[int, dict[str, int]] = {}
    for tok, milli in vocab:
        out.setdefault(len(tok), {})[tok] = milli
    return out


def _viterbi_codegen(words: DataFrame, vocab) -> DataFrame:
    """One F.aggregate fold per word: acc is a W-struct sliding window
    [dp[i-W], ..., dp[i-1->i]] over positions 1..len(word), W = the
    vocab's longest piece; each step takes the array_min of the <=W
    shift-reduce candidates."""
    by_len = _by_len(vocab)
    max_tok = max(by_len)                            # window size W
    maps = {
        ln: F.create_map(*[F.lit(x) for tok, m in sorted(d.items())
                           for x in (tok, m)])
        for ln, d in by_len.items()}

    null_dp = F.lit(None).cast("struct<score:int,n:int,path:string>")
    zero_dp = F.struct(F.lit(0).alias("score"), F.lit(0).alias("n"),
                       F.lit("").alias("path"))
    word = F.col("word")

    def step(acc, i):
        cands = []
        for ln in range(1, max_tok + 1):
            if ln not in by_len:
                continue
            # dp[i - ln] sits at 1-based slot W+1-ln of the window
            prev = F.element_at(acc, max_tok + 1 - ln)
            tok = word.substr(i - F.lit(ln - 1), F.lit(ln))
            milli = F.element_at(maps[ln], tok)
            cands.append(F.when(
                prev.isNotNull() & milli.isNotNull() & (i >= ln),
                F.struct(
                    (prev["score"] + milli).alias("score"),
                    (prev["n"] + 1).alias("n"),
                    F.concat(prev["path"], tok, F.lit(".")).alias("path"))))
        new_dp = F.array_min(F.array(*cands))
        shifted = [F.element_at(acc, k) for k in range(2, max_tok + 1)]
        return F.array(*shifted, new_dp)

    best = F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(*([null_dp] * (max_tok - 1)), zero_dp),
        step,
        lambda acc: F.element_at(acc, max_tok))

    dp = F.col("__dp")
    return (words.withColumn("__dp", best)
            .select(
                "word",
                F.expr("substr(__dp.path, 1, length(__dp.path) - 1)")
                .alias("pieces"),
                dp["n"].cast("int").alias("n_pieces"),
                dp["score"].cast("long").alias("score_milli")))


def _viterbi_arrow(words: DataFrame, vocab) -> DataFrame:
    """Arrow path: broadcast {piece: milli}, per-word Python DP. Input is
    the |distinct words| table, never the corpus, so the Python boundary
    cost is bounded by vocabulary size (the BPE _segment_arrow argument)."""
    import pandas as pd

    bc = words.sparkSession.sparkContext.broadcast(dict(vocab))

    def gen(batches):
        scores = bc.value
        max_tok = max(len(t) for t in scores)

        def seg(w):
            # dp[i] = (score, n, path) — identical (score, n, path)
            # lexicographic objective as the codegen fold
            dp = [None] * (len(w) + 1)
            dp[0] = (0, 0, "")
            for i in range(1, len(w) + 1):
                best = None
                for ln in range(1, min(max_tok, i) + 1):
                    prev = dp[i - ln]
                    if prev is None:
                        continue
                    tok = w[i - ln:i]
                    m = scores.get(tok)
                    if m is None:
                        continue
                    cand = (prev[0] + m, prev[1] + 1,
                            prev[2] + tok + ".")
                    if best is None or cand < best:
                        best = cand
                dp[i] = best
            return dp[len(w)]

        for pdf in batches:
            res = [seg(w) for w in pdf["word"]]
            yield pd.DataFrame({
                "word": pdf["word"],
                "pieces": [r[2][:-1] if r else None for r in res],
                "n_pieces": [r[1] if r else None for r in res],
                "score_milli": [r[0] if r else None for r in res]})

    return words.mapInPandas(
        gen, schema="word string, pieces string, n_pieces int, "
                    "score_milli long")


def viterbi_segment_words(words: DataFrame, vocab=None,
                          word_col: str = "word",
                          arrow: bool | None = None) -> DataFrame:
    """Best unigram segmentation per word: (word, pieces, n_pieces,
    score_milli), pieces dot-joined. Words must match [a-z]{1,12} (rows
    that don't are filtered, mirroring the oracle's word rule). Vocabs at
    or under UNIGRAM_ARROW_THRESHOLD entries run the codegen fold; larger
    vocabs broadcast into one Arrow pass — identical output, parity-pinned."""
    if vocab is None:
        vocab = UNIGRAM_VOCAB
    src = words.select(F.col(word_col).alias("word")) \
        .filter(F.col("word").rlike("^[a-z]{1,%d}$" % MAX_WORD_LEN))
    use_arrow = (len(vocab) > UNIGRAM_ARROW_THRESHOLD) if arrow is None \
        else arrow
    if use_arrow:
        return _viterbi_arrow(src, vocab)
    return _viterbi_codegen(src, vocab)


def unigram_refit(words: DataFrame, vocab=None, word_col: str = "word",
                  count_col: str = "cnt",
                  arrow: bool | None = None) -> DataFrame:
    """One hard-EM re-estimation pass (the M-step of Kudo 2018's unigram
    training under Viterbi counts): segment every word type, count each
    piece along the best segmentations weighted by word frequency, and
    re-score pieces by integer inverse frequency,

        new_score_milli(p) = (total_piece_count * 1000) // piece_count(p)

    — an integer-exact surrogate for -log(p(piece)) chosen so the DuckDB
    oracle reproduces it bit-exactly (floating-point log would not be).
    Returns (piece, piece_count, new_score_milli), observed pieces only.

    Scale shape: Viterbi runs over the |distinct words| table (codegen
    fold or Arrow per the vocab-size gate), piece counts are one hash
    aggregation (map-side combinable, shuffle volume = |pieces|), and the
    corpus itself never re-shuffles — word counts arrive pre-aggregated,
    exactly like bpe_train's input."""
    counts = words.select(F.col(word_col).alias("word"),
                          F.col(count_col).cast("long").alias("cnt"))
    seg = viterbi_segment_words(counts, vocab=vocab, arrow=arrow)
    pieces = (seg.join(counts, "word")
              .filter(F.col("pieces").isNotNull())
              .select(F.explode(F.split("pieces", "\\.")).alias("piece"),
                      "cnt")
              .groupBy("piece").agg(F.sum("cnt").alias("piece_count")))
    total = pieces.agg(F.sum("piece_count").alias("__total"))
    return (pieces.crossJoin(total)     # 1-row scalar attach
            .select("piece", "piece_count",
                    # div = exact int64 division, matching the oracle's //
                    F.expr("div(__total * 1000, piece_count)")
                    .alias("new_score_milli"))
            .orderBy(F.desc("piece_count"), "piece"))


def wordpiece_encode(words: DataFrame, vocab=None, cont_vocab=None,
                     word_col: str = "word",
                     arrow: bool | None = None) -> DataFrame:
    """Greedy longest-match-first segmentation (WordPiece / MaxMatch,
    Wu et al. 2016 — BERT's tokenizer), the third classic subword
    algorithm next to BPE and unigram Viterbi: at each position consume
    the LONGEST vocab piece; a word with no match at some position is
    unsegmentable and yields NULL pieces (WordPiece's whole-word [UNK]).
    Returns (word, pieces, n_pieces); same (score-free) vocab surface as
    viterbi_segment_words. Greedy differs from Viterbi observably: with
    pieces {ab, a, bc}, greedy segments 'abc' as ab.<stuck> -> NULL while
    Viterbi finds a.bc.

    ``cont_vocab`` enables BERT's continuation convention: non-initial
    positions match ``cont_vocab`` (bare strings; rendered with the
    standard ``##`` prefix in ``pieces``) while position 1 matches
    ``vocab`` — e.g. vocab={un, runnable}, cont_vocab={runnable, able}
    segments 'unrunnable' as un.##runnable. Omitted -> one vocab for all
    positions, no prefix.

    Same execution shape as the Viterbi fold: ONE F.aggregate per word
    over character positions carrying (consumed, n, path) — pure
    whole-stage codegen, zero Python, zero shuffle — with the identical
    UNIGRAM_ARROW_THRESHOLD Arrow gate for production-size vocabs."""
    if vocab is None:
        vocab = UNIGRAM_VOCAB
    src = words.select(F.col(word_col).alias("word")) \
        .filter(F.col("word").rlike("^[a-z]{1,%d}$" % MAX_WORD_LEN))
    n_vocab = len(vocab) + (len(cont_vocab) if cont_vocab else 0)
    use_arrow = (n_vocab > UNIGRAM_ARROW_THRESHOLD) if arrow is None \
        else arrow
    if use_arrow:
        return _wordpiece_arrow(src, vocab, cont_vocab)
    return _wordpiece_codegen(src, vocab, cont_vocab)


def _wordpiece_codegen(words: DataFrame, vocab, cont_vocab=None
                       ) -> DataFrame:
    by_len = _by_len(vocab)
    cont_by_len = _by_len(cont_vocab) if cont_vocab else by_len
    prefix = "##" if cont_vocab else ""
    max_tok = max(max(by_len), max(cont_by_len))

    def mk_maps(d):
        return {ln: F.create_map(*[F.lit(x) for tok, m in sorted(e.items())
                                   for x in (tok, m)])
                for ln, e in d.items()}

    maps = mk_maps(by_len)
    cont_maps = mk_maps(cont_by_len)
    word = F.col("word")
    zero = F.struct(F.lit(0).alias("done"), F.lit(0).alias("n"),
                    F.lit("").alias("path"))

    def step(acc, i):
        is_init = acc["done"] == 0
        cands = []
        for ln in range(max_tok, 0, -1):             # longest first
            if ln not in by_len and ln not in cont_by_len:
                continue
            tok = word.substr(i, F.lit(ln))
            null_m = F.lit(None).cast("int")
            hit = F.when(
                is_init,
                F.element_at(maps[ln], tok) if ln in by_len else null_m) \
                .otherwise(F.element_at(cont_maps[ln], tok)
                           if ln in cont_by_len else null_m)
            out_tok = F.when(is_init, tok) \
                .otherwise(F.concat(F.lit(prefix), tok))
            cands.append(F.when(
                (F.length(word) - i + 1 >= ln) & hit.isNotNull(),
                F.struct((acc["done"] + ln).alias("done"),
                         (acc["n"] + 1).alias("n"),
                         F.concat(acc["path"], out_tok, F.lit("."))
                         .alias("path"))))
        # -1 marks "stuck at i": no piece matches, word is unsegmentable
        stuck = F.struct(F.lit(-1).alias("done"), acc["n"].alias("n"),
                         acc["path"].alias("path"))
        return F.when(acc["done"] + 1 == i,
                      F.coalesce(*cands, stuck)).otherwise(acc)

    fin = F.aggregate(F.sequence(F.lit(1), F.length(word)), zero, step)
    done = F.col("__g")["done"]
    return (words.withColumn("__g", fin)
            .select(
                "word",
                F.when(done == F.length(word),
                       F.expr("substr(__g.path, 1, length(__g.path) - 1)"))
                .alias("pieces"),
                F.when(done == F.length(word), F.col("__g")["n"])
                .cast("int").alias("n_pieces")))


def _wordpiece_arrow(words: DataFrame, vocab, cont_vocab=None) -> DataFrame:
    import pandas as pd

    bc = words.sparkSession.sparkContext.broadcast(
        (dict(vocab), dict(cont_vocab) if cont_vocab else None))

    def gen(batches):
        scores, cont = bc.value
        cont_scores = cont if cont is not None else scores
        prefix = "##" if cont is not None else ""
        max_tok = max(max(len(t) for t in scores),
                      max(len(t) for t in cont_scores))

        def seg(w):
            i, n, path = 0, 0, []
            while i < len(w):
                tbl = scores if i == 0 else cont_scores
                pfx = "" if i == 0 else prefix
                for ln in range(min(max_tok, len(w) - i), 0, -1):
                    if w[i:i + ln] in tbl:
                        path.append(pfx + w[i:i + ln])
                        n += 1
                        i += ln
                        break
                else:
                    return None
            return (".".join(path), n)

        for pdf in batches:
            res = [seg(w) for w in pdf["word"]]
            yield pd.DataFrame({
                "word": pdf["word"],
                "pieces": [r[0] if r else None for r in res],
                "n_pieces": [r[1] if r else None for r in res]})

    return words.mapInPandas(
        gen, schema="word string, pieces string, n_pieces int")


def unigram_train(words: DataFrame, n_iters: int = 2, top_n: int = 150,
                  word_col: str = "word", count_col: str = "cnt",
                  arrow: bool | None = None) -> DataFrame:
    """Train a unigram vocabulary from a word-frequency table — the full
    (hard-EM) loop around viterbi_segment_words/unigram_refit, the same
    driver-loop structure as bpe_train:

      seed:  every character of the corpus at milli 5000, plus the
             ``top_n`` weighted 2-4-char substrings (count desc, token
             asc), seeded score 2000*len(token) + rank — longer and more
             frequent pieces start cheaper;
      iter:  Viterbi-segment all word types under the current scores,
             count pieces along best segmentations weighted by word
             frequency, re-score by exact integer inverse frequency
             (total*1000 div count); pieces that no best segmentation
             uses drop out (unigram pruning), except characters, which
             are retained at (max re-score + 1000) so every word stays
             segmentable.

    Returns the last iteration's (piece, piece_count, score_milli),
    count desc / piece asc. Integer arithmetic end-to-end, so the DuckDB
    oracle unrolls the whole loop bit-exactly. Like bpe_train, only
    vocab-sized tables ever reach the driver (one collect per iteration
    of at most |seed vocab| rows); the corpus collapses to its
    word-frequency table before training starts and never re-shuffles."""
    spark = words.sparkSession
    counts = (words.select(F.col(word_col).alias("word"),
                           F.col(count_col).cast("long").alias("cnt"))
              .filter(F.col("word").rlike("^[a-z]{1,%d}$" % MAX_WORD_LEN))
              .localCheckpoint(eager=True))
    try:
        # seed vocabulary
        chars = [r["token"] for r in counts.select(
            F.explode(F.split("word", "(?!$)")).alias("token"))
            .distinct().collect()]
        if not chars:
            # zero trainable [a-z]{1,MAX_WORD_LEN} words: an empty vocab,
            # not a ValueError from max() on an empty sequence below
            return spark.createDataFrame(
                [], "piece string, piece_count long, score_milli long")
        subs = None
        for ln in (2, 3, 4):
            part = counts.select(
                F.explode(F.when(
                    F.length("word") >= ln,
                    F.expr(f"transform(sequence(1, length(word) - {ln} + 1),"
                           f" s -> substr(word, s, {ln}))"))
                    .otherwise(F.array().cast("array<string>")))
                .alias("token"), "cnt")
            subs = part if subs is None else subs.unionAll(part)
        # global top-N via TakeOrdered (distributed), NOT a row_number
        # window over an unpartitioned sort — rank assigned on the
        # driver over the already-ordered top_n rows
        ranked = (subs.groupBy("token").agg(F.sum("cnt").alias("scnt"))
                  .orderBy(F.desc("scnt"), "token").limit(top_n).collect())
        vocab = [(c, 5000) for c in sorted(chars)]
        vocab += [(r["token"], 2000 * len(r["token"]) + rank)
                  for rank, r in enumerate(ranked, start=1)]

        for _ in range(n_iters):
            seg = viterbi_segment_words(counts, vocab=vocab, arrow=arrow)
            refit = (seg.join(counts, "word")
                     .filter(F.col("pieces").isNotNull())
                     .select(F.explode(F.split("pieces", "\\."))
                             .alias("piece"), "cnt")
                     .groupBy("piece").agg(F.sum("cnt").alias("piece_count"))
                     .collect())
            pc = {r["piece"]: int(r["piece_count"]) for r in refit}
            if not pc:
                # a refit iteration that counts zero pieces (all
                # segmentations null) cannot re-score — empty vocab out
                return spark.createDataFrame(
                    [], "piece string, piece_count long, score_milli long")
            total = sum(pc.values())
            scores = {p: total * 1000 // c for p, c in pc.items()}
            penalty = max(scores.values()) + 1000
            vocab = sorted(scores.items())
            vocab += [(c, penalty) for c in sorted(chars) if c not in scores]
    finally:
        counts.unpersist()
    rows = sorted(((p, pc[p], scores[p]) for p in pc),
                  key=lambda r: (-r[1], r[0]))
    return spark.createDataFrame(
        rows, "piece string, piece_count long, score_milli long")
