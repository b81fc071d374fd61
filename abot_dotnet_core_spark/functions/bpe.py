"""Distributed BPE tokenizer training (Sennrich et al. 2016).

``bpe_train`` learns the first N merge rules from a (word, count)
frequency table — the classic byte-pair-encoding loop re-expressed as an
iterative Spark job, the same driver-loop structure as PageRank
(graph.py): each iteration is

  1. pair counts: one hash aggregation over the vocab's adjacent symbol
     pairs, weighted by word frequency — map-side combinable, shuffle
     volume = |distinct pairs|, never |corpus|;
  2. argmax: a TakeOrdered-1 (deterministic tiebreak count desc, then
     pair lexicographic) collected to the driver — the merge rule is the
     only thing that ever leaves the cluster;
  3. merge application: a row-local array fold (``F.aggregate``) over
     each word's symbol sequence — greedy leftmost non-overlapping, the
     reference BPE semantics — pure whole-stage codegen, zero shuffle;
  4. ``localCheckpoint`` to truncate lineage so the plan stays flat
     across iterations.

BPE trains on the word-frequency table (|vocab| rows, not corpus rows),
which is why the loop is cheap at any corpus size: a 100 TB corpus
collapses to a ~10^7-row vocab in one word-count pass before training
starts. Production tokenizers run ~50k merges and update pair counts
incrementally instead of recounting; the recount-per-merge form here is
the semantics-defining reference shape, exact for any N.

Vocabs at or under BPE_LOCAL_TRAIN_THRESHOLD rows skip the per-merge
Spark jobs entirely: the symbol table collects to the driver once and an
exact Python mirror of the loop trains there (parity-pinned) — the
sequential argmax dependency makes each distributed merge cost a full
job's scheduler constant, which dominates at small vocab sizes.
"""

from __future__ import annotations

from bisect import bisect_right

from pyspark.sql import DataFrame, functions as F

END_MARK = "</w>"

# Above this many merge rules, bpe_segment/bpe_encode_words switch from the
# chained-F.aggregate codegen projection to one Arrow-batched mapInPandas
# pass that applies the (broadcast) merge list per word in Python. The
# codegen chain generates one higher-order-function layer PER merge — fine
# for a handful, but Catalyst analysis/janino compile cost grows
# superlinearly in chain depth and a real tokenizer's ~32k merges is
# infeasible as a single expression tree. The Python path's cost is bounded
# by |vocab| rows (the corpus never reaches it), and per word it only
# touches merges whose pair actually occurs, so it is O(|word| * merges
# applied), not O(|merges|). Same gate pattern as similarity.py's
# IVF_ARROW_THRESHOLD.
BPE_ARROW_THRESHOLD = 8


def word_symbols(words: DataFrame, word_col: str = "word",
                 count_col: str = "cnt") -> DataFrame:
    """(cnt, syms): each word split into single characters plus the
    end-of-word marker — BPE's iteration-0 state."""
    return words.select(
        F.col(count_col).cast("long").alias("cnt"),
        F.concat(F.split(F.col(word_col), "(?!$)"),
                 F.array(F.lit(END_MARK))).alias("syms"))


def _apply_merge(syms, left: str, right: str):
    """Greedy leftmost non-overlapping merge of the (left, right) pair,
    as a row-local fold: walking the sequence once, merging when the
    accumulator's tail is ``left`` and the current symbol is ``right``.
    After a merge the tail becomes left+right, which cannot re-match
    ``left`` — exactly the non-overlap rule ('a a a a' -> 'aa aa')."""
    merged = left + right
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == left)
            & (x == right),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged))))
        .otherwise(F.concat(acc, F.array(x))))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    return (vocab.select("cnt", F.explode(F.expr(
        "zip_with(slice(syms, 1, size(syms)-1),"
        "         slice(syms, 2, size(syms)-1),"
        "         (l, r) -> struct(l AS left_sym, r AS right_sym))"))
        .alias("p"))
        .groupBy(F.col("p.left_sym").alias("left_sym"),
                 F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("cnt").alias("pair_count")))


# Below this many vocab rows, training runs on the driver: the sequential
# merge loop costs one Spark job (~0.5 s of scheduler constant) per merge
# in the distributed form, and a <=64k-row vocab fits trivially in driver
# memory. The local trainer is an exact mirror (same pair iteration, same
# count-desc/left-asc/right-asc tiebreak, same greedy merge pass), pinned
# by parity tests. Same gate pattern as similarity.py's
# IVF_ARROW_THRESHOLD / this module's BPE_ARROW_THRESHOLD.
BPE_LOCAL_TRAIN_THRESHOLD = 65536


def _train_local(vocab: list[tuple[int, list[str]]],
                 n_merges: int) -> list[tuple[int, str, str, int]]:
    """Driver-local BPE training — exact mirror of the distributed loop."""
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for cnt, syms in vocab:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        (l, r), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        vocab = [(cnt, _merge_pass_py(syms, l, r)) for cnt, syms in vocab]
    return merges


def bpe_train(words: DataFrame, n_merges: int = 10,
              word_col: str = "word", count_col: str = "cnt",
              local: bool | None = None) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a word-frequency
    table. Returns (rank, left_sym, right_sym, pair_count), rank 1-based
    in learned order. Stops early if the vocab runs out of pairs.
    ``local=None`` auto-routes: vocabs at or under
    BPE_LOCAL_TRAIN_THRESHOLD rows collect to the driver and train in
    Python (bit-identical merges, no per-merge Spark job); larger vocabs
    run the distributed loop."""
    spark = words.sparkSession
    schema = "rank int, left_sym string, right_sym string, pair_count long"
    symdf = word_symbols(words, word_col, count_col)
    if local is None:
        # probe via limit(T+1) so the check never scans past the threshold
        local = (symdf.limit(BPE_LOCAL_TRAIN_THRESHOLD + 1).count()
                 <= BPE_LOCAL_TRAIN_THRESHOLD)
    if local:
        rows = [(int(r["cnt"]), list(r["syms"])) for r in symdf.collect()]
        return spark.createDataFrame(_train_local(rows, n_merges), schema)
    vocab = symdf.localCheckpoint(eager=True)
    merges = []
    try:
        for rank in range(1, n_merges + 1):
            best = (_pair_counts(vocab)
                    .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
                    .first())
            if best is None:
                break
            l, r = best["left_sym"], best["right_sym"]
            merges.append((rank, l, r, int(best["pair_count"])))
            old = vocab
            vocab = vocab.select(
                "cnt", _apply_merge(F.col("syms"), l, r).alias("syms")) \
                .localCheckpoint(eager=True)
            old.unpersist()
    finally:
        vocab.unpersist()
    return spark.createDataFrame(merges, schema)


def _merge_pass_py(syms: list[str], left: str, right: str) -> list[str]:
    """One greedy leftmost non-overlapping merge pass — the exact Python
    mirror of _apply_merge's fold (tail == left and current == right merge
    into left+right, which cannot re-match left)."""
    merged = left + right
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = merged
        else:
            out.append(x)
    return out


def _apply_merges_py(syms: list[str], merges: list[tuple[str, str]],
                     ranks: dict[tuple[str, str], list[int]]) -> list[str]:
    """Apply an ordered merge list to one word, skipping absent pairs.

    Sequential rank-order application (the codegen chain's semantics) is
    equivalent to: repeatedly apply the lowest-rank pass whose pair is
    currently present AND whose rank is greater than the last applied
    rank. (Skipped passes are identities, and a pass can only create
    pairs considered at strictly later ranks — a lower-rank pair created
    afterwards stays unmerged, exactly like the chain.) This makes the
    cost O(|word| * passes applied) instead of O(|merges|) per word."""
    prev = 0
    while True:
        best = None
        for pair in zip(syms, syms[1:]):
            rs = ranks.get(pair)
            if rs is None:
                continue
            i = bisect_right(rs, prev)
            if i < len(rs) and (best is None or rs[i] < best):
                best = rs[i]
        if best is None:
            return syms
        left, right = merges[best - 1]
        syms = _merge_pass_py(syms, left, right)
        prev = best


def _merge_ranks(merges: list[tuple[str, str]]
                 ) -> dict[tuple[str, str], list[int]]:
    ranks: dict[tuple[str, str], list[int]] = {}
    for i, (left, right) in enumerate(merges, start=1):
        ranks.setdefault((left, right), []).append(i)
    return ranks


def _segment_arrow(words: DataFrame, merges: list[tuple[str, str]],
                   word_col: str, count_col: str,
                   encode: bool) -> DataFrame:
    """Arrow path: ONE mapInPandas pass applying the broadcast merge list
    per word in Python. Input is the |vocab|-row word table, never the
    corpus, so the Python boundary cost is bounded by vocab size."""
    import pandas as pd

    bc = words.sparkSession.sparkContext.broadcast(list(merges))
    src = words.select(F.col(word_col).alias("word"),
                       F.col(count_col).cast("long").alias("cnt"))

    def gen(batches):
        mg = bc.value
        ranks = _merge_ranks(mg)
        for pdf in batches:
            syms_out = [
                _apply_merges_py(list(w) + [END_MARK], mg, ranks)
                for w in pdf["word"]]
            if encode:
                yield pd.DataFrame({
                    "word": pdf["word"], "cnt": pdf["cnt"],
                    "n_tokens": [len(s) for s in syms_out],
                    "encoded": [" ".join(s) for s in syms_out]})
            else:
                yield pd.DataFrame({"cnt": pdf["cnt"], "syms": syms_out})

    if encode:
        return src.mapInPandas(
            gen, schema="word string, cnt long, n_tokens int, encoded string")
    return src.mapInPandas(gen, schema="cnt long, syms array<string>")


def _use_arrow(merges: list[tuple[str, str]], arrow: bool | None) -> bool:
    return (len(merges) > BPE_ARROW_THRESHOLD) if arrow is None else arrow


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]],
                word_col: str = "word", count_col: str = "cnt",
                arrow: bool | None = None) -> DataFrame:
    """Apply an ordered merge list to a word table: (cnt, syms) after all
    merges — the tokenizer's encode step for whole words. Up to
    BPE_ARROW_THRESHOLD merges each merge is one row-local fold and the
    chain is a single codegen projection; above it (or with arrow=True)
    the whole list is applied in one Arrow-batched Python pass over the
    vocab table — identical output, pinned by tests."""
    if _use_arrow(merges, arrow):
        return _segment_arrow(words, merges, word_col, count_col,
                              encode=False)
    out = word_symbols(words, word_col, count_col)
    syms = F.col("syms")
    for left, right in merges:
        syms = _apply_merge(syms, left, right)
    return out.select("cnt", syms.alias("syms"))


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]],
                     word_col: str = "word", count_col: str = "cnt",
                     arrow: bool | None = None) -> DataFrame:
    """The user-facing encode step: apply an ordered merge list to each
    word and return (word, cnt, n_tokens, encoded) — ``encoded`` is the
    space-joined subword sequence (with the </w> marker), ``n_tokens`` the
    token count this tokenizer assigns the word. Small merge lists run as
    row-local codegen folds (one projection, zero shuffle, zero Python);
    above BPE_ARROW_THRESHOLD the ordered list ships as a broadcast into
    one mapInPandas pass (a ~32k-merge production vocab cannot be a single
    expression tree). Either way: at 100 TB the corpus first collapses to
    its word-frequency table, this runs over the |vocab| rows, and token
    counts join back to documents by word — the corpus text itself is
    never re-shuffled."""
    if _use_arrow(merges, arrow):
        return _segment_arrow(words, merges, word_col, count_col,
                              encode=True)
    out = words.select(F.col(word_col).alias("word"),
                       F.col(count_col).cast("long").alias("cnt"),
                       F.concat(F.split(F.col(word_col), "(?!$)"),
                                F.array(F.lit(END_MARK))).alias("syms"))
    syms = F.col("syms")
    for left, right in merges:
        syms = _apply_merge(syms, left, right)
    return (out.withColumn("__enc", syms)   # fold once, project twice
            .select("word", "cnt",
                    F.size("__enc").cast("int").alias("n_tokens"),
                    F.array_join("__enc", " ").alias("encoded")))
