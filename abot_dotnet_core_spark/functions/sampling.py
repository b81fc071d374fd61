"""Deterministic sampling + sequence-packing operators for training-data
pipelines.

Both are pure JVM-side column expressions (whole-stage codegen, no UDFs,
no shuffle for sampling) with exact ANSI-SQL oracles:

  stratified_sample  keep a per-stratum fraction of rows, decided by an
                     integer threshold on a 32-bit md5 hash of (salt|id) —
                     deterministic across runs/engines, embarrassingly
                     parallel (a filter: no shuffle, survives predicate
                     pushdown), and resample-stable: raising a stratum's
                     fraction only ADDS rows (nested samples), the property
                     you want when re-cutting a 100 TB training mix.
  pack_sequences     assign docs to fixed token-budget shards by cumulative
                     token count within a group (prefix-sum window) — the
                     sharding step before tokenize-and-concat packing. Per-
                     group windows shuffle on the group key only; a global
                     packing at 100 TB would reuse the range-partition
                     two-pass prefix sum in operators/ordering.py.
  dsir_weights       DSIR-style importance weights (Xie et al. 2023, "Data
                     Selection for Language Models via Importance
                     Resampling"): hashed unigram bucket counts for a
                     target slice vs the raw corpus, per-document weight =
                     sum over its tokens of the target/raw bucket ratio —
                     in integer fixed-point so distributed partial-agg
                     order can't perturb the result (bit-exact oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .textfns import tokens_col

_U32 = 1 << 32


def sample_hash_u32(key: Column) -> Column:
    """Uniform 32-bit hash: the little-endian uint32 of the first 4 md5
    bytes — equals DuckDB's ``md5_number_upper(key) % 2^32`` (DuckDB reads
    the first 8 digest bytes little-endian), so the SQL oracle is
    bit-exact. Built from hex-pair swaps + conv, all JVM-side."""
    h = F.md5(key)
    le = F.concat(F.substring(h, 7, 2), F.substring(h, 5, 2),
                  F.substring(h, 3, 2), F.substring(h, 1, 2))
    return F.conv(le, 16, 10).cast("long")


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = "s1") -> DataFrame:
    """Keep each row iff hash32(salt|id) < floor(fraction[stratum] * 2^32).

    Integer-threshold comparison (no float boundary ambiguity); rows keep
    their full schema. Strata missing from ``fractions`` use
    ``default_fraction``."""
    u = sample_hash_u32(F.concat(F.lit(f"{salt}|"),
                                 F.col(id_col).cast("string")))
    thr = F.lit(int(default_fraction * _U32))
    expr = F.col(strata_col)
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(expr == stratum, F.lit(int(frac * _U32))).otherwise(thr)
    return df.filter(u < thr)


def pack_sequences(df: DataFrame, budget: int, id_col: str = "doc_id",
                   group_col: str = "source",
                   text_col: str = "text") -> DataFrame:
    """Shard docs into fixed token-budget bins by prefix token count.

    Within each group (ordered by id), a doc whose preceding cumulative
    token count is P lands in ``shard_id = floor(P / budget)`` at offset
    ``P % budget`` — the deterministic sharding step before concat-and-split
    sequence packing (docs may straddle a boundary; the tokenizer stage
    splits them, which is why the offset is emitted)."""
    w = (W.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(W.unboundedPreceding, -1))
    out = (df.withColumn("n_tokens", F.size(tokens_col(F.col(text_col))))
           .withColumn("__prec",
                       F.coalesce(F.sum("n_tokens").over(w), F.lit(0))))
    return (out.withColumn("shard_id", F.floor(F.col("__prec") / budget))
            .withColumn("shard_offset", F.col("__prec") % budget)
            .select(id_col, group_col, "n_tokens", "shard_id",
                    "shard_offset"))


def shuffle_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                   salt: str = "shuf1") -> DataFrame:
    """Deterministic global shuffle + shard assignment — the final
    "shuffle then shard" step before writing training data.

    Training loaders want the corpus in a pseudo-random global order split
    into n_shards files. The md5-u32 of (salt|id) IS the permutation key;
    its dense global rank (two-pass range-partition sequencer — one range
    shuffle over just (id, key), never a single-partition sort) is striped
    round-robin: ``shard_id = rank % n_shards``, ``shard_pos = rank //
    n_shards``. Reading shards round-robin (shard0[0], shard1[0], ...,
    shard0[1], ...) replays the EXACT global hash order — a loader can
    resume mid-epoch at any global position — and shard sizes are balanced
    to ±1 row. Scale posture: only (id, key) ever shuffles; the rank pass
    is the same O(rows) range-partition used for the FIFO frontier.
    Deterministic across runs, engines, and input partitionings;
    re-salting gives an independent epoch permutation.

    Returns (id, shard_id, shard_pos, shuffle_key).
    """
    from ..operators.ordering import assign_global_seq

    u = sample_hash_u32(F.concat(F.lit(f"{salt}|"),
                                 F.col(id_col).cast("string")))
    keyed = df.select(F.col(id_col), u.alias("shuffle_key"))
    ranked = assign_global_seq(keyed, ["shuffle_key", id_col], "__rank")
    return (ranked
            .withColumn("shard_id", (F.col("__rank") % n_shards).cast("int"))
            .withColumn("shard_pos",
                        F.expr(f"__rank div {n_shards}L"))
            .select(id_col, "shard_id", "shard_pos", "shuffle_key"))


def dsir_weights(df: DataFrame, target: Column, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 1024) -> DataFrame:
    """Hashed-n-gram importance weights for data selection (DSIR-style).

    Xie et al. 2023 ("Data Selection for Language Models via Importance
    Resampling") score each raw document by the likelihood ratio of a
    target distribution vs the raw distribution over hashed n-gram
    features. This is the unigram variant in integer fixed-point:

      bucket(tok)  = md5-u32(tok) % n_buckets       (engine-portable hash)
      score[b]     = (tgt_count[b] + 1) * 10^6 div (raw_count[b] + 1)
      weight(doc)  = sum over token occurrences of score[bucket(tok)]

    ``score`` is the add-one-smoothed target/raw count ratio in millionths;
    the paper's global normalization constant (raw_total/target_total) is
    dropped — it scales every document identically, so ranking and
    resampling are unchanged — which keeps every intermediate inside int64
    and the arithmetic associative: Spark's partial-agg order cannot
    perturb the result, so a sequential SQL oracle matches bit-for-bit
    (same trick as the fixed-point PageRank).

    Plan shape: one explode of the token stream, one partial-agg shuffle to
    the <= n_buckets dimension, a broadcast join of that dimension back
    onto the stream, one per-doc sum. The corpus text never shuffles.
    ``target`` is a boolean Column over ``df``'s rows selecting the target
    slice (e.g. ``F.col("lang") == "en"``).
    """
    tok = (df.withColumn("__is_tgt", target.cast("int"))
           .select(id_col, "__is_tgt",
                   F.explode(tokens_col(F.col(text_col))).alias("tok"))
           .select(id_col, "__is_tgt",
                   (sample_hash_u32(F.col("tok")) % n_buckets)
                   .alias("bucket")))
    dim = (tok.groupBy("bucket")
           .agg(F.count("*").alias("raw_c"),
                F.sum("__is_tgt").alias("tgt_c"))
           .select("bucket",
                   F.expr("(tgt_c + 1) * 1000000 div (raw_c + 1)")
                   .alias("score_micro")))
    per_doc = (tok.join(F.broadcast(dim), "bucket")
               .groupBy(id_col)
               .agg(F.count("*").alias("n_tokens"),
                    F.sum("score_micro").alias("dsir_weight_micro")))
    return (df.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("dsir_weight_micro", F.lit(0))
                    .alias("dsir_weight_micro"))
            .withColumn("dsir_avg_micro", F.expr(
                "dsir_weight_micro div greatest(n_tokens, 1)")))


def mixture_weights(df: DataFrame, alpha: float = 0.5, budget: int = 1000,
                    stratum_col: str = "source") -> DataFrame:
    """Temperature-flattened mixture weights (the multilingual-LM sampling
    rule, e.g. Conneau & Lample 2019: q_i ∝ p_i^alpha): compute each
    stratum's share p_i of the corpus, flatten with exponent ``alpha`` < 1
    (upweights tails, downweights heads), renormalize, and size a
    ``budget``-document training mix. round() everywhere so any engine
    reproduces the numbers bit-for-bit.

    Returns (stratum, n_docs, share, weight, target_docs).

    Scale posture: one hash-agg over the corpus (map-side combine; the
    result is #strata rows) plus arithmetic over that tiny aggregate — the
    heavy input is touched exactly once."""
    counts = (df.groupBy(F.col(stratum_col).alias("stratum"))
              .agg(F.count("*").alias("n_docs"))
              # materialize the #strata-row aggregate ONCE: total, z, and
              # the returned frame all derive from it, and without this the
              # two driver reductions plus the final evaluation would each
              # rescan the full corpus
              .localCheckpoint(eager=True))
    total = counts.agg(F.sum("n_docs")).collect()[0][0] or 1
    flat = F.pow(F.col("n_docs") / F.lit(float(total)), F.lit(alpha))
    counts = counts.withColumn("__flat", flat)
    z = counts.agg(F.sum("__flat")).collect()[0][0] or 1.0
    return (counts
            .withColumn("share", F.round(F.col("n_docs") / F.lit(float(total)), 6))
            .withColumn("weight", F.round(F.col("__flat") / F.lit(float(z)), 6))
            .withColumn("target_docs",
                        F.round(F.col("__flat") / F.lit(float(z)) * budget)
                        .cast("long"))
            .select("stratum", "n_docs", "share", "weight", "target_docs"))


def dataset_split(df: DataFrame, id_col: str = "doc_id",
                  salt: str = "split", valid_permille: int = 10,
                  test_permille: int = 10) -> DataFrame:
    """Deterministic held-out splits: adds (split_bucket, split) where
    split ∈ {train, valid, test} is a pure function of md5(salt ":" id) —
    the assignment every training pipeline needs to be STABLE across reruns,
    incremental ingests, and engines (no sampling RNG, no state).

    Bucket = first 15 md5 hex chars parsed base-16, mod 1000; the lowest
    ``test_permille`` buckets are test, the next ``valid_permille`` valid,
    the rest train. Changing the salt re-rolls the split; adding documents
    never moves an existing one. Row-local codegen (md5 + conv) — embarrassingly
    parallel at any scale, and the same arithmetic runs in ANSI SQL for the
    oracle.
    """
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    bucket = (h % 1000).cast("int")
    split = (F.when(bucket < test_permille, F.lit("test"))
             .when(bucket < test_permille + valid_permille, F.lit("valid"))
             .otherwise(F.lit("train")))
    return (df.withColumn("split_bucket", bucket)
              .withColumn("split", split))
