"""Deduplication operators for web-scale corpora.

Four families, each a composition of built-in DataFrame ops (shuffle-aware,
no UDFs in the relational path):

  exact_dedup      hash-groupBy on the normalized-text fingerprint
  minhash          k-permutation MinHash signatures over token shingles —
                   4 lanes per md5 (the digest's LE uint32 words, matching
                   DuckDB's md5_number_upper/_lower, which keeps the oracle
                   bit-exact); integer-min per lane is a valid random
                   permutation proxy
  lsh_candidates   banding: group signature bands into buckets, join within
                   buckets -> candidate pairs (the at-scale path: avoids the
                   O(n^2) cross join; only bucket-mates shuffle together)
  jaccard_pairs    exact n-gram Jaccard verification on candidate pairs via
                   an exploded shingle equi-join (set-based, skew-tolerant)
  simhash          64-bit SimHash over tokens (vectorized pandas UDF — the
                   64-way bit fold is numpy work, not relational work)
  components       connected components over candidate pairs (alternating
                   large-star/small-star — the O(log^2 n)-round MapReduce CC
                   algorithm) -> per-doc cluster id for keep-one dedup
  contamination    train/test decontamination: corpus-vs-benchmark n-gram
                   overlap via a broadcast shingle join (corpus side never
                   shuffles)

Scale notes: shingling explodes ~|tokens| rows per doc; the minhash groupBy
is a partial-aggregating shuffle on (doc_id). LSH bucket join shuffles on
(band, bucket) — hot buckets (boilerplate) are the skew risk; cap bucket
size with a count filter before the self-join (boilerplate_cap).

Materialization: multi-referenced narrow intermediates (LSH buckets,
candidate pairs, the CC edge set) are pinned with eager
``localCheckpoint`` — re-deriving them would re-run the md5-heavy
signature pipeline per reference. Two costs to know about: construction
becomes eager (building the DataFrame runs a job even if never collected),
and localCheckpoint blocks live only on executors — on a preemptible /
dynamic-allocation cluster swap these call sites for ``checkpoint()`` to
reliable storage (same call shape, slower, survives executor loss).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from .textfns import tokens_col


def shingles_col(text, n: int = 3):
    """Token n-gram shingles as an array column (JVM-side).

    Built by zipping n shifted slices of the token array and joining each
    zipped struct — the lambda touches ONLY its own element. The obvious
    ``transform(sequence(...), i -> element_at(toks, i+j))`` form embeds
    the tokenizer inside the lambda body, and interpreted higher-order
    functions re-evaluate it PER ELEMENT (an O(tokens * n) regexp-split
    blow-up measured at ~5x the cost of the whole minhash pass)."""
    toks = tokens_col(text)
    m = F.size(toks) - (n - 1)          # shingle count when positive
    parts = [F.slice(toks, j + 1, F.greatest(m, F.lit(0)))
             for j in range(n)]
    return F.when(m <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.arrays_zip(*parts),
                    lambda s: F.concat_ws(" ", *[s[str(j)]
                                                 for j in range(n)])))


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per normalized-text hash."""
    from .textfns import fingerprint_col
    return (df.withColumn("fingerprint", fingerprint_col(F.col(text_col)))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_dups")))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 8,
                       shingle_n: int = 3) -> DataFrame:
    """(id, minhash_0..minhash_{k-1}) — u32 lane mins of per-shingle md5.

    One md5 evaluation yields FOUR signature lanes: the digest's four
    little-endian uint32 words (the classic one-hash-many-lanes MinHash —
    k independent md5('i|'||s) passes would cost k times the hashing for
    no extra recall). Lane i uses word i%4 of digest group i//4, where
    group 0 hashes the bare shingle and group g>0 hashes 'g|'||shingle.
    The LE-word split is exactly DuckDB's md5_number_upper/_lower words,
    so the SQL oracle is bit-exact.

    Plan shape: explode shingles -> one md5 -> groupBy(id) min per lane.
    The min agg is partial (map-side combine), so only n_docs x k longs
    ever shuffle, and the whole pipeline stays inside whole-stage codegen
    (a row-local array_min/transform variant was measured SLOWER — Spark
    runs higher-order functions interpreted, outside codegen). No dedup
    pass: min over the multiset equals min over the set. Docs with no
    shingles (< shingle_n tokens) are dropped, matching the set-based
    definition (empty set has no min)."""
    # no pre-filter needed: shingles_col yields [] below shingle_n tokens
    # and a non-outer explode emits no rows for it (an explicit size filter
    # would re-run the tokenizer over every document)
    ex = df.select(id_col,
                   F.explode(shingles_col(F.col(text_col), shingle_n))
                   .alias("shingle"))

    def lane(g, j):
        # j-th LE uint32 word of the group-g hex digest = byte-swapped hex
        # chars [8j+1, 8j+8]
        h = F.md5(F.col("shingle")) if g == 0 else \
            F.md5(F.concat(F.lit(f"{g}|"), F.col("shingle")))
        o = 8 * j
        le = F.concat(F.substring(h, o + 7, 2), F.substring(h, o + 5, 2),
                      F.substring(h, o + 3, 2), F.substring(h, o + 1, 2))
        return F.conv(le, 16, 10).cast("long")

    return ex.groupBy(id_col).agg(
        *[F.min(lane(i // 4, i % 4)).alias(f"mh_{i}") for i in range(k)])


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        k: int = 8, bands: int = 4,
                        boilerplate_cap: int = 1000) -> DataFrame:
    """Banding: docs sharing any band bucket become a candidate pair (a<b)."""
    rows_per_band = k // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.md5(F.concat_ws("|", *cols)).alias("bucket")))
    buckets = (sigs.select(id_col, F.explode(F.array(*band_cols)).alias("bb"))
               .select(id_col, F.col("bb.band").alias("band"),
                       F.col("bb.bucket").alias("bucket"))
               # materialize ONCE (narrow: n_docs x bands rows): the bucket
               # table is referenced three times below (sizes, self-join a/b)
               # and the signature computation under it is md5-heavy
               .localCheckpoint(eager=True))
    # skew guard: drop boilerplate buckets that would quadratically explode
    sizes = buckets.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    buckets = (buckets.join(sizes, ["band", "bucket"])
               .filter(F.col("n") <= boilerplate_cap).drop("n"))
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  threshold: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard for given (id_a, id_b) pairs, set-based:
    |A∩B| via exploded-shingle equi-join, |A∪B| = |A|+|B|-|A∩B|."""
    # join on the 8-byte xxhash of the shingle, not the string — the
    # intersection shuffle moves longs instead of ~20-byte strings
    # (collision probability ~ n^2/2^64, immaterial at corpus scale)
    pairs = pairs.localCheckpoint(eager=True)  # small; referenced 3x below
    # only docs that appear in a candidate pair need their shingle sets:
    # semi-join BEFORE the explode/dedup shuffle, so the shuffled volume
    # tracks |candidate docs|, not |corpus| (AQE broadcasts the id set when
    # it fits; at billions of candidates it falls back to a shuffled semi —
    # still strictly cheaper than shingling the whole corpus)
    pair_ids = (pairs.select(F.col("id_a").alias(id_col))
                .union(pairs.select(F.col("id_b").alias(id_col)))
                .distinct())
    ex = (df.join(pair_ids, id_col, "left_semi")
          .select(id_col, F.explode(shingles_col(F.col(text_col), shingle_n))
                  .alias("shingle"))
          .select(id_col, F.xxhash64("shingle").alias("sh_h"))
          .dropDuplicates([id_col, "sh_h"]))
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (pairs
             .join(ex.select(F.col(id_col).alias("id_a"),
                             F.col("sh_h")), "id_a")
             .join(ex.select(F.col(id_col).alias("id_b"),
                             F.col("sh_h")), ["id_b", "sh_h"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    out = (pairs.join(inter, ["id_a", "id_b"], "left").fillna({"n_inter": 0})
           .join(sizes.select(F.col(id_col).alias("id_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
           .join(sizes.select(F.col(id_col).alias("id_b"),
                              F.col("n_sh").alias("n_b")), "id_b")
           .withColumn("jaccard", F.round(
               F.col("n_inter")
               / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6)))
    return out.filter(F.col("jaccard") >= threshold) \
              .select("id_a", "id_b", "n_inter", "jaccard")


# --- SimHash (numpy-vectorized pandas UDF) ----------------------------------

@pandas_udf(T.LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens; token bits from the first 8 md5
    bytes little-endian — exactly DuckDB's ``md5_number_upper``, which keeps
    the SQL oracle bit-exact. Vectorized per Arrow batch; bit fold in numpy."""
    import hashlib
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        hashes = np.fromiter(
            (int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
             for tok in toks), dtype=np.uint64, count=len(toks))
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
        # signed arithmetic — uint64 would wrap for negative vote totals
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)  # ±1 majority
        sim = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            sim |= np.uint64(1) << np.uint64(j)
        out[i] = np.int64(sim)
    return pd.Series(out)


def keep_best_representative(labels: DataFrame, scored: DataFrame,
                             id_col: str = "doc_id",
                             score_col: str = "quality_score") -> DataFrame:
    """Pick each cluster's representative by score (ties -> min id).

    ``labels``: (id, comp_id, cluster_size) from neardup_components;
    ``scored``: (id, score). The window partitions on comp_id — cluster-
    sized partitions, never corpus-sized (a boilerplate mega-cluster is the
    skew case; its size is already bounded upstream by the LSH
    boilerplate_cap)."""
    j = labels.join(scored.select(id_col, score_col), id_col)
    w = W.partitionBy("comp_id").orderBy(F.col(score_col).desc(),
                                         F.col(id_col))
    return (j.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("comp_id", F.col(id_col).alias("keep_id"),
                    F.col(score_col).alias("best_score"), "cluster_size"))


def contamination_pairs(docs: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id", bench_id: str = "bench_id",
                        text_col: str = "text", shingle_n: int = 3,
                        min_overlap: int = 1) -> DataFrame:
    """Train/test decontamination scan: which corpus docs share token
    n-grams with a benchmark set, and how much of each benchmark doc they
    cover.

    The benchmark side is tiny relative to a 100 TB corpus, so its exploded
    shingles are BROADCAST — the corpus-side shingle stream never shuffles
    (map-side hash join), and the only shuffle is the (doc, bench) overlap
    count, already reduced to matching rows. Per-document shingle dedup is
    row-local (``array_distinct`` before the explode — equivalent to a
    dropDuplicates on (doc, shingle) but with no exchange). Shingles join
    on their 8-byte xxhash64 (longs, not strings). Output: (doc_id,
    bench_id, n_overlap, bench_coverage) for pairs with >= min_overlap
    shared shingles.
    """
    ex_d = (docs.select(id_col,
                        F.explode(F.array_distinct(
                            shingles_col(F.col(text_col), shingle_n)))
                        .alias("shingle"))
            .select(id_col, F.xxhash64("shingle").alias("sh_h")))
    ex_b = (bench.select(F.col(bench_id),
                         F.explode(F.array_distinct(
                             shingles_col(F.col(text_col), shingle_n)))
                         .alias("shingle"))
            .select(bench_id, F.xxhash64("shingle").alias("sh_h")))
    sizes_b = ex_b.groupBy(bench_id).agg(F.count("*").alias("n_sh_b"))
    overlap = (ex_d.join(F.broadcast(ex_b), "sh_h")
               .groupBy(id_col, bench_id)
               .agg(F.count("*").alias("n_overlap"))
               .filter(F.col("n_overlap") >= min_overlap))
    return (overlap.join(F.broadcast(sizes_b), bench_id)
            .withColumn("bench_coverage",
                        F.round(F.col("n_overlap") / F.col("n_sh_b"), 6))
            .select(id_col, bench_id, "n_overlap", "bench_coverage"))


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 30) -> DataFrame:
    """(node, comp) for every node appearing in ``pairs``; comp = the minimum
    node id of its connected component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — each round is a groupBy(min) plus
    a join, so a component is never materialized inside one task and the
    round count is O(log^2 n), not O(diameter). Lineage is truncated per
    round (localCheckpoint) so the plan does not grow with iterations;
    convergence is detected with a (count, hash-sum) fingerprint — one small
    agg job per round.
    """
    e = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()
         # materialize ONCE: the input is typically an expensive candidate
         # pipeline (MinHash -> LSH -> Jaccard verify); without this the
         # first round's several jobs (sym/mins/fp) each recompute it
         .localCheckpoint(eager=True))
    prev_fp = None
    for _ in range(max_iter):
        # large-star: attach each strictly-larger neighbor of u to
        # m = min(N(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", "u").alias("m")))
        large = (sym.join(mins, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct())
        # small-star: direct edges large->small, then attach every smaller
        # neighbor of u (and u itself) to min(N<=(u))
        dirset = (large.select(F.greatest("u", "v").alias("u"),
                               F.least("u", "v").alias("v"))
                  .distinct())
        mins2 = dirset.groupBy("u").agg(F.min("v").alias("m"))
        e = (dirset.join(mins2, "u")
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .union(mins2.select(F.col("u"), F.col("m").alias("v")))
             .filter(F.col("u") != F.col("v"))
             .distinct()
             .localCheckpoint(eager=True))
        # decimal sum: exact and overflow-free under ANSI mode
        fp = e.agg(F.count("*").alias("n"),
                   F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
                   .alias("h")).collect()[0]
        fp = (fp["n"], fp["h"])
        if fp == prev_fp or fp[0] == 0:
            break
        prev_fp = fp
    # at the fixpoint e is a disjoint union of stars (node -> component min)
    members = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    roots = (e.select(F.col("v").alias("node")).distinct()
             .withColumn("comp", F.col("node")))
    return members.union(roots)


def neardup_components(docs: DataFrame, pairs: DataFrame,
                       id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for near-dup dedup: every doc mapped to the min
    doc-id of its connected component under ``pairs`` (docs without a pair
    are their own singleton cluster), plus the cluster size. Downstream
    keep-one-per-cluster dedup is ``filter(doc_id == comp_id)``."""
    cc = connected_components(pairs)
    labels = (docs.select(id_col)
              .join(cc.withColumnRenamed("node", id_col), id_col, "left")
              .select(id_col,
                      F.coalesce("comp", F.col(id_col)).alias("comp_id")))
    sizes = labels.groupBy("comp_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "comp_id").select(id_col, "comp_id",
                                                "cluster_size")


def duplicated_span_stats(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          window: int = 8) -> DataFrame:
    """Exact duplicated-substring dedup at fixed token-window granularity.

    The fixed-W rolling-window reformulation of exact substring dedup
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a W-token window is *duplicated* when its text occurs >= 2
    times anywhere in the corpus (across or within documents); every token
    covered by a duplicated window is removed. The paper's suffix array is
    inherently sequential — the rolling window is the shuffle-friendly
    equivalent (explode W-grams -> partial-agg count -> join back ->
    positional coverage), entirely JVM built-ins.

    Per doc: token count, duplicated-token count/ratio, and the md5 of the
    surviving text (`kept_md5`) so the output stays narrow no matter how
    wide the documents are.

    Scale posture: the W-gram stream is |tokens| rows (not |tokens|*W — the
    window text is hashed inside the projection, never materialized as W
    copies). It shuffles twice on an 8-byte key: once for the global count
    (map-side combine collapses each partition to its distinct windows) and
    once to join the duplicated-hash set back (AQE broadcasts that set when
    small, the common case). Coverage marking and text reassembly are
    row-local array ops — the corpus text itself never shuffles. The
    60-bit md5-prefix key is the oracle-portable stand-in for xxhash64;
    collision odds at 10^12 windows are ~1e-13 per pair and a collision
    only ever *over*-removes one window.
    """
    h64 = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    toks = tokens_col(F.col(text_col))
    base = (df.select(id_col, toks.alias("toks"))
            .withColumn("n_tokens", F.size("toks")))
    # windows via shingles_col (zip of shifted slices) with the hash applied
    # AFTER the explode: an `i -> h64(slice(toks, i+1, W))` lambda would
    # re-evaluate the tokenizer per element (interpreted HOF), an
    # O(tokens * W) regexp blow-up
    wins = (df.select(id_col, F.posexplode(
                shingles_col(F.col(text_col), window)).alias("pos", "w"))
            .select(id_col, "pos", h64(F.col("w")).alias("h")))
    dup = (wins.groupBy("h").agg(F.count("*").alias("c"))
           .filter(F.col("c") > 1).select("h"))
    covered = (wins.join(dup, "h")
               .select(id_col, F.explode(F.sequence(
                   F.col("pos"), F.col("pos") + window - 1)).alias("tpos"))
               .distinct())
    cov_arr = covered.groupBy(id_col).agg(
        F.collect_list("tpos").alias("cov"))
    joined = (base.join(cov_arr, id_col, "left")
              .withColumn("cov", F.coalesce(
                  "cov", F.array().cast("array<int>"))))
    kept_toks = F.transform(
        F.filter(F.transform("toks",
                             lambda x, i: F.struct(x.alias("t"),
                                                   i.alias("i"))),
                 lambda s: ~F.array_contains(F.col("cov"), s["i"])),
        lambda s: s["t"])
    n_dup = F.size("cov")
    return (joined
            .withColumn("n_dup_tokens", n_dup.cast("long"))
            .withColumn("dup_ratio", F.round(
                n_dup / F.greatest(F.col("n_tokens"), F.lit(1)), 6))
            .withColumn("kept_md5", F.md5(F.concat_ws(" ", kept_toks)))
            .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                    "n_dup_tokens", "dup_ratio", "kept_md5"))


def simhash_hamming_pairs(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash with pigeonhole banding: the 64 bits split
    into ``max_hamming + 1`` disjoint blocks, so any pair within Hamming
    distance ``max_hamming`` agrees EXACTLY on at least one block (pigeonhole)
    — blocked candidate generation is recall-complete and the output equals
    the O(n^2) scan. Candidates join on (block_idx, block_value); verify with
    bit_count(xor). All JVM-side after the signature UDF."""
    sh = df.select(id_col, simhash64_udf(F.col(text_col)).alias("simhash"))
    return hamming_pairs_from_sigs(sh, id_col=id_col, max_hamming=max_hamming)


def hamming_pairs_from_sigs(sh: DataFrame, id_col: str = "doc_id",
                            max_hamming: int = 3) -> DataFrame:
    """Pigeonhole-blocked Hamming pairs over an (id, simhash:long) DataFrame.
    Exact (recall-complete) for distance <= max_hamming; see
    simhash_hamming_pairs."""
    n_blocks = max_hamming + 1
    w = 64 // n_blocks
    blocks = []
    for i in range(n_blocks):
        start = i * w
        if i == n_blocks - 1:
            # last block: the shift already discards all lower bits
            val = F.shiftrightunsigned(F.col("simhash"), start)
        else:
            val = F.shiftrightunsigned(F.col("simhash"), start) \
                   .bitwiseAND(F.lit((1 << w) - 1))
        blocks.append(F.struct(F.lit(i).alias("blk"), val.alias("val")))
    bl = (sh.select(id_col, "simhash",
                    F.explode(F.array(*blocks)).alias("b"))
          .select(id_col, "simhash", F.col("b.blk").alias("blk"),
                  F.col("b.val").alias("val")))
    a = bl.select(F.col(id_col).alias("id_a"),
                  F.col("simhash").alias("sh_a"), "blk", "val")
    b = bl.select(F.col(id_col).alias("id_b"),
                  F.col("simhash").alias("sh_b"), "blk", "val")
    return (a.join(b, ["blk", "val"]).filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", F.bit_count(
                F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming").distinct())


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        window: int = 8) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS scheme): (id, fp_pos, fp_hash) — the selected k-gram
    hashes that any two documents sharing a token run of length
    >= window + k - 1 are GUARANTEED to have in common.

    Per document: hash every token k-gram (40-bit md5 prefix), slide a
    ``window``-gram window, keep the minimum hash per window with the
    RIGHTMOST position breaking ties (the paper's rule — it maximizes
    window overlap so consecutive windows usually re-select the same gram),
    then emit the distinct selections. Density ~= 2/(window+1) grams.

    All JVM-side: the argmin-with-rightmost-tiebreak is one ``min`` over a
    single encoded bigint ``hash * 2^20 + (2^20-1 - pos)`` (so smaller hash
    wins, larger pos wins ties), evaluated with a rows-window — one shuffle
    on id, no UDF, no self-join. Positions must fit 20 bits: documents are
    expected to be chunked below 2^20 grams first (grams past that are
    dropped, documented here). Documents shorter than one full window
    degrade to a single min over their grams (standard boundary rule).

    At 100 TB the output is the dedup join key: ~2/(w+1) of gram volume,
    grouped/bucketed by fp_hash for the shared-fingerprint pair join.
    """
    grams = shingles_col(F.col(text_col), n=k)
    # do NOT also project size(grams) here: a sibling column of a
    # posexplode is evaluated in the post-Generate Project, where
    # projection collapse re-inlines the whole shingles expression PER
    # EXPLODED ROW — O(tokens^2) per doc, measured 10x the whole pass at
    # sf0.1. Window-start validity is derived below from a count over the
    # SAME window frame instead (no extra column, no extra shuffle).
    base = (df.select(F.col(id_col), F.posexplode(grams).alias("pos", "gram"))
            .filter(F.col("pos") < (1 << 20)))
    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    enc = h40 * F.lit(1 << 20) + (F.lit((1 << 20) - 1) - F.col("pos"))
    win = (W.partitionBy(id_col).orderBy("pos")
           .rowsBetween(0, window - 1))
    # a valid window START has a full frame ahead (count == window), plus
    # pos 0 for documents shorter than one window (single-min boundary
    # rule); min is over the projected __enc column, not the inline md5
    # expression (a rows-frame re-evaluates its input per frame element)
    sel = (base.withColumn("__enc", enc).drop("gram")
           .withColumn("__m", F.min("__enc").over(win))
           .withColumn("__n", F.count("*").over(win)))
    return (sel.filter((F.col("__n") == window) | (F.col("pos") == 0))
            .select(F.col(id_col),
                    (F.lit((1 << 20) - 1) - F.col("__m") % F.lit(1 << 20))
                    .cast("int").alias("fp_pos"),
                    F.expr(f"__m DIV {1 << 20}").cast("long")
                    .alias("fp_hash"))
            .distinct())


def winnow_shared_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        window: int = 8, min_shared: int = 2,
                        max_bucket: int = 50) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints — the
    MOSS match step: any pair sharing a token run >= window + k - 1 is
    guaranteed to appear (with at least one shared selected hash).

    Returns (id_a, id_b, n_shared) for pairs sharing >= ``min_shared``
    distinct fingerprint hashes, id_a < id_b.

    Scale shape mirrors lsh_candidate_pairs: fingerprints collapse to
    distinct (id, hash), hashes selected by more than ``max_bucket``
    documents are dropped BEFORE the self-join (boilerplate guard — a
    nav-bar gram selected by 10^6 pages would otherwise explode the
    bucket join quadratically; standard practice, documented cap), then
    one equi-join on fp_hash + one pair count. No text ever re-shuffles.
    """
    fps = (winnow_fingerprints(df, id_col=id_col, text_col=text_col,
                               k=k, window=window)
           .select(F.col(id_col).alias("id"), "fp_hash").distinct())
    hot = (fps.groupBy("fp_hash").agg(F.count("*").alias("nd"))
           .filter(F.col("nd") > max_bucket))
    cold = fps.join(hot, "fp_hash", "left_anti")
    a = cold.select(F.col("id").alias("id_a"), "fp_hash")
    b = cold.select(F.col("id").alias("id_b"), "fp_hash")
    return (a.join(b, "fp_hash").filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b").agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared))


def lsh_recall_eval(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 4, bands: int = 2,
                    shingle_n: int = 3, threshold: float = 0.2,
                    boilerplate_cap: int = 1000) -> DataFrame:
    """Recall evaluation of the MinHash-LSH banding config against exact
    Jaccard ground truth — one row: (n_truth, n_candidates, n_hit,
    recall_millis). The dedup counterpart of the ANN recall@k evaluator:
    run it on a sample before freezing (k, bands) for a corpus-scale pass.

    Ground truth needs no O(n^2) cross join: a pair with Jaccard > 0
    shares >= 1 shingle, so all-pairs truth is the shingle equi-join
    (sa ⋈ sb on shingle, id_a < id_b) + the same round-6 Jaccard filter
    the verify step uses. That join IS the hot-shingle-skew-exposed step —
    on an eval SAMPLE it is bounded; never run it corpus-wide (that is
    what the banding being evaluated here is for).
    """
    sigs = minhash_signatures(df, id_col=id_col, text_col=text_col,
                              k=k, shingle_n=shingle_n)
    # the cap is part of the evaluated config: an eval that silently
    # dropped hot buckets while production ran uncapped would report a
    # recall the real pass does not exhibit — surface it and pass it down
    cand = lsh_candidate_pairs(sigs, id_col=id_col, k=k, bands=bands,
                               boilerplate_cap=boilerplate_cap)
    sh = (df.select(id_col,
                    F.explode(shingles_col(F.col(text_col), shingle_n))
                    .alias("shingle"))
          .select(id_col, F.xxhash64("shingle").alias("sh_h"))
          .dropDuplicates([id_col, "sh_h"]))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    allp = (sh.select(F.col(id_col).alias("id_a"), "sh_h")
            .join(sh.select(F.col(id_col).alias("id_b"), "sh_h"),
                  "sh_h")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    truth = (allp
             .join(sizes.select(F.col(id_col).alias("id_a"),
                                F.col("n_sh").alias("n_a")), "id_a")
             .join(sizes.select(F.col(id_col).alias("id_b"),
                                F.col("n_sh").alias("n_b")), "id_b")
             .filter(F.round(
                 F.col("n_inter")
                 / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6)
                 >= threshold)
             .select("id_a", "id_b")
             .localCheckpoint(eager=True))
    hit = truth.join(cand, ["id_a", "id_b"], "left_semi")
    t = truth.agg(F.count("*").alias("n_truth"))
    c = cand.agg(F.count("*").alias("n_candidates"))
    h = hit.agg(F.count("*").alias("n_hit"))
    return (t.crossJoin(c).crossJoin(h)
            .withColumn("recall_millis", F.expr(
                "cast((n_hit * 1000) DIV greatest(n_truth, 1L) as int)")))


def containment_pairs(df: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      shingle_n: int = 3,
                      min_millis: int = 0) -> DataFrame:
    """Exact n-gram containment (Broder 1997) for given (id_a, id_b)
    candidate pairs: cont(A in B) = |S(A) ∩ S(B)| / |S(A)| — the
    ASYMMETRIC companion to :func:`jaccard_pairs` that catches quotes,
    syndicated excerpts, and page-inside-template copies, where the
    smaller document is nearly contained in the larger one but Jaccard
    stays low because the union is dominated by the big side.

    Returns (id_a, id_b, n_inter, n_a, n_b, cont_a_millis, cont_b_millis)
    in exact integer thousandths (n_inter * 1000 div n_side — no float,
    hash-stable vs any oracle); rows kept when EITHER direction reaches
    ``min_millis``. Pairs where a side has no shingles (< shingle_n
    tokens) are dropped — containment of an empty set is undefined, and
    the LSH candidate generators never emit such docs anyway.

    Plan shape: identical to jaccard_pairs (same semi-join -> explode ->
    xxhash64 dedup -> pair equi-join), so the same scale notes apply:
    shuffled volume tracks candidate docs, the intersection moves longs.
    """
    pairs = pairs.localCheckpoint(eager=True)
    pair_ids = (pairs.select(F.col("id_a").alias(id_col))
                .union(pairs.select(F.col("id_b").alias(id_col)))
                .distinct())
    ex = (df.join(pair_ids, id_col, "left_semi")
          .select(id_col, F.explode(shingles_col(F.col(text_col), shingle_n))
                  .alias("shingle"))
          .select(id_col, F.xxhash64("shingle").alias("sh_h"))
          .dropDuplicates([id_col, "sh_h"]))
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    inter = (pairs
             .join(ex.select(F.col(id_col).alias("id_a"),
                             F.col("sh_h")), "id_a")
             .join(ex.select(F.col(id_col).alias("id_b"),
                             F.col("sh_h")), ["id_b", "sh_h"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter")))
    out = (pairs.join(inter, ["id_a", "id_b"], "left")
           .fillna({"n_inter": 0})
           .join(sizes.select(F.col(id_col).alias("id_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
           .join(sizes.select(F.col(id_col).alias("id_b"),
                              F.col("n_sh").alias("n_b")), "id_b")
           .withColumn("cont_a_millis",
                       F.expr("(n_inter * 1000) DIV n_a"))
           .withColumn("cont_b_millis",
                       F.expr("(n_inter * 1000) DIV n_b")))
    return (out.filter((F.col("cont_a_millis") >= min_millis)
                       | (F.col("cont_b_millis") >= min_millis))
            .select("id_a", "id_b",
                    F.col("n_inter").cast("long").alias("n_inter"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("cont_a_millis").cast("long").alias("cont_a_millis"),
                    F.col("cont_b_millis").cast("long").alias("cont_b_millis")))
