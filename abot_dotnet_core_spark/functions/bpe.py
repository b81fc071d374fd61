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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END_MARK = "</w>"


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


def bpe_train(words: DataFrame, n_merges: int = 10,
              word_col: str = "word", count_col: str = "cnt") -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a word-frequency
    table. Returns (rank, left_sym, right_sym, pair_count), rank 1-based
    in learned order. Stops early if the vocab runs out of pairs."""
    spark = words.sparkSession
    vocab = word_symbols(words, word_col, count_col) \
        .localCheckpoint(eager=True)
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
    return spark.createDataFrame(
        merges,
        "rank int, left_sym string, right_sym string, pair_count long")


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]],
                word_col: str = "word",
                count_col: str = "cnt") -> DataFrame:
    """Apply an ordered merge list to a word table: (cnt, syms) after all
    merges — the tokenizer's encode step for whole words. Each merge is
    one row-local fold; the chain is a single codegen projection."""
    out = word_symbols(words, word_col, count_col)
    syms = F.col("syms")
    for left, right in merges:
        syms = _apply_merge(syms, left, right)
    return out.select("cnt", syms.alias("syms"))


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]],
                     word_col: str = "word",
                     count_col: str = "cnt") -> DataFrame:
    """The user-facing encode step: apply an ordered merge list to each
    word and return (word, cnt, n_tokens, encoded) — ``encoded`` is the
    space-joined subword sequence (with the </w> marker), ``n_tokens`` the
    token count this tokenizer assigns the word. Same row-local merge
    folds as bpe_segment (one codegen projection, zero shuffle, zero
    Python); at 100 TB the corpus first collapses to its word-frequency
    table, this runs over the |vocab| rows, and token counts join back to
    documents by word — the corpus text itself is never re-shuffled."""
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
