"""Deterministic streaming sketches (distinct-count, heavy hitters).

Production Spark would reach for ``approx_count_distinct`` (HLL++) and
``count_min_sketch`` — but their binary sketch states are engine-private,
so nothing an external oracle can verify. These are the same algorithms
re-expressed over an md5-derived integer hash that any SQL engine can
recompute bit-for-bit, keeping the DuckDB correctness gate exact while
preserving the scale posture that makes sketches worth using:

kmv_distinct    K-minimum-values distinct estimator (Bar-Yossef et al.
                2002): per group keep the k smallest 48-bit hashes; with
                n >= k distinct values the k-th smallest m estimates
                n ~= (k-1) * 2^48 / m (+-1/sqrt(k)); below k the tracked
                set IS the exact answer. All integer floor arithmetic.
cms_heavy_hitters
                Count-min sketch (Cormode & Muthukrishnan 2005): d rows x
                w buckets of int64 counters — a FIXED d*w-cell state that
                partial aggregation combines map-side no matter how many
                billions of occurrences stream through — then min-over-rows
                estimation for candidate keys and a deterministic top-k.
                CMS never undercounts; the demo output carries the exact
                count next to the estimate so the one-sided error is
                visible.

Hash: first 12 md5 hex chars parsed base-16 (48 bits), the same
oracle-portable construction as dedup.py — (k-1)*2^48 and d*w counter
sums stay far inside int64, and the DuckDB side rebuilds the identical
integer with a hex-digit fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

KMV_HASH_SPACE = 1 << 48  # 12 hex chars


def h48(col) -> F.Column:
    """48-bit md5-prefix hash (big-endian hex parse, oracle-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns (group_col, n_tracked, kth_hash, est_distinct):
    ``n_tracked`` < k means the group had fewer than k distinct hashes and
    ``est_distinct`` is exact; otherwise est = (k-1) * 2^48 DIV kth_hash.

    Plan: dedupe (group, hash) — ONE hash aggregation with map-side
    combine, so shuffle volume is distinct pairs, not occurrences — then a
    per-group row_number window keeps only the k smallest (state the
    window sorts is already the deduped pair set). At 10^8-row groups the
    window sort dominates; a real deployment swaps the window for an
    applyInPandas heap keeping k values per group, identical output.
    """
    space = KMV_HASH_SPACE
    # null values are ignored (h48(null) is null, and Spark windows sort
    # NULLS FIRST while SQL oracles default NULLS LAST — dropping them
    # keeps the exact-below-k guarantee engine-independent)
    pairs = (df.select(F.col(group_col).alias("grp"),
                       h48(F.col(value_col)).alias("h"))
             .filter(F.col("h").isNotNull())
             .distinct())
    w = Window.partitionBy("grp").orderBy("h")
    kept = (pairs.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= k))
    agg = kept.groupBy("grp").agg(F.count("*").alias("n_tracked"),
                                  F.max("h").alias("kth_hash"))
    est = (F.when(F.col("n_tracked") < k, F.col("n_tracked").cast("long"))
           .otherwise(F.expr(
               f"{(k - 1) * space}L DIV greatest(kth_hash, 1L)")))
    return agg.select(F.col("grp").alias(group_col), "n_tracked",
                      "kth_hash", est.alias("est_distinct"))


def cms_heavy_hitters(occurrences: DataFrame, key_col: str,
                      depth: int = 3, width: int = 1024,
                      topk: int = 20) -> DataFrame:
    """Top-k heavy hitters of ``key_col`` occurrences via a count-min
    sketch, with the exact count alongside to expose the sketch's
    one-sided (never-under) error.

    Returns (rank, key_col, cms_count, exact_count) — rank 1..topk ordered
    by (cms_count desc, key asc), deterministic across engines.

    Plan: the sketch is ``depth`` groupBy(row, bucket) counts over the
    occurrence stream — a fixed depth*width-cell state (3072 cells at the
    defaults) that partial aggregation collapses map-side, the whole point
    of CMS at 100 TB. Estimation joins the candidate keys' buckets against
    the sketch (broadcast: the sketch is KB-sized by construction) and
    takes the min over rows; the final top-k is a TakeOrdered, no global
    sort. Candidates here are the distinct keys; a streaming deployment
    would track candidates with space-saving instead — the sketch side is
    unchanged.
    """
    key = F.col(key_col)
    # one md5 per (row-of-sketch, occurrence): salt the key with the row id
    cells = occurrences.select(
        key.alias("k"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     (h48(F.concat(F.lit(f"cms{i}|"), key)) % width)
                     .alias("bucket"))
            for i in range(depth)])).alias("rb"))
    sketch = (cells.groupBy(F.col("rb.row").alias("row"),
                            F.col("rb.bucket").alias("bucket"))
              .agg(F.count("*").alias("cell")))
    exact = occurrences.groupBy(key.alias("k")) \
                       .agg(F.count("*").alias("exact_count"))
    cand = exact.select(
        "k", "exact_count",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     (h48(F.concat(F.lit(f"cms{i}|"), F.col("k"))) % width)
                     .alias("bucket"))
            for i in range(depth)])).alias("rb"))
    est = (cand.select("k", "exact_count", F.col("rb.row").alias("row"),
                       F.col("rb.bucket").alias("bucket"))
           .join(F.broadcast(sketch), ["row", "bucket"])
           .groupBy("k", "exact_count")
           .agg(F.min("cell").alias("cms_count")))
    # TakeOrdered top-k first; the rank window then runs over k rows only
    top = est.orderBy(F.col("cms_count").desc(), "k").limit(topk)
    w = Window.orderBy(F.col("cms_count").desc(), F.col("k"))
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("rank", F.col("k").alias(key_col),
                    "cms_count", "exact_count"))


def hll_registers(df: DataFrame, group_col: str, value_col: str,
                  p: int = 9, max_rho: int = 30) -> DataFrame:
    """Per-group HyperLogLog (Flajolet et al. 2007) over the 48-bit hash,
    entirely in integer fixed-point so the register state AND the raw
    estimate are bit-exact across engines.

    Register index = top ``p`` hash bits; rho = leading-zero rank of the
    remaining ``48-p`` bits (clamped at ``max_rho``, which bounds every
    2^(max_rho - M_j) term so the scaled harmonic sum stays in int64:
    sum <= 2^(p + max_rho) = 2^39 at the defaults). Raw estimate
    alpha_m * m^2 / sum(2^-M_j) is evaluated as
    (alpha_micros * ((m*m << max_rho) DIV sum_scaled)) DIV 10^6 — floor
    arithmetic only. The standard small/large-range bias corrections are
    O(1) driver-side arithmetic on (v_zero, raw_est) and intentionally NOT
    baked in: the frozen integer spec is the sketch; correction policy is
    a caller choice (v_zero ships in the output so linear counting
    m*ln(m/V) is one expression away).

    Returns (group_col, n_present, v_zero, sum_scaled, hll_raw_est,
    exact_distinct) — exact alongside, same demo convention as
    cms_heavy_hitters.

    Plan: one groupBy(group, bucket) max — a fixed <= m-row state per
    group that partial aggregation collapses map-side regardless of
    occurrence volume (THE reason HLL beats exact countDistinct at
    100 TB: no (group, value) dedup shuffle) — then an m-row-per-group
    agg. The exact column is the expensive dedup path, present only to
    expose the sketch error.
    """
    m = 1 << p
    rem_bits = 48 - p
    alpha_micros = round(0.7213 / (1 + 1.079 / m) * 10**6)
    h = h48(F.col(value_col))
    bucket = F.expr(f"h DIV {1 << rem_bits}")
    rem = F.expr(f"h % {1 << rem_bits}")
    base = (df.select(F.col(group_col).alias("grp"), h.alias("h"))
            .filter(F.col("h").isNotNull())
            .select("grp", bucket.alias("bucket"), rem.alias("rem")))
    bl = F.length(F.conv(F.col("rem"), 10, 2))
    rho = (F.when(F.col("rem") == 0, F.lit(rem_bits + 1))
           .otherwise(F.lit(rem_bits + 1) - bl))
    regs = (base.withColumn("rho", F.least(rho, F.lit(max_rho)).cast("int"))
            .groupBy("grp", "bucket").agg(F.max("rho").alias("M")))
    # 2^(max_rho - M) as an exact integer shift (no float pow)
    summary = (regs.withColumn(
                    "term", F.expr(f"shiftleft(1L, {max_rho} - M)"))
               .groupBy("grp")
               .agg(F.count("*").alias("n_present"),
                    F.sum("term").alias("sum_present")))
    exact = (df.select(F.col(group_col).alias("grp"), F.col(value_col))
             .groupBy("grp")
             .agg(F.countDistinct(value_col).alias("exact_distinct")))
    out = (summary
           .withColumn("v_zero", (F.lit(m) - F.col("n_present")).cast("int"))
           .withColumn("sum_scaled",
                       F.col("sum_present")
                       + F.col("v_zero").cast("long")
                       * F.lit(1 << max_rho).cast("long"))
           .withColumn("hll_raw_est", F.expr(
               f"({alpha_micros}L * (({m}L * {m}L * {1 << max_rho}L)"
               f" DIV sum_scaled)) DIV 1000000"))
           .join(exact, "grp"))
    return out.select(F.col("grp").alias(group_col),
                      F.col("n_present").cast("int").alias("n_present"),
                      "v_zero", "sum_scaled", "hll_raw_est",
                      "exact_distinct")
