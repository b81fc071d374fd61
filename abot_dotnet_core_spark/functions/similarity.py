"""Similarity search over embedding columns (array<float>).

  brute_force_topk   exact cosine top-k: broadcast the (small) query set
                     against the corpus — one pass, no shuffle until the
                     final per-query top-k window
  lsh_topk           random-hyperplane LSH bucketing: deterministic planes
                     derived from md5 (reproducible on any engine), candidates
                     = same signature prefix, then exact cosine on candidates
                     — the at-scale path (bucket join instead of cross join)

All vector math is JVM-side (`F.zip_with` + `F.aggregate` left fold over
double-cast arrays — deterministic summation order, which keeps the DuckDB
oracle value-hash exact after round(,6)).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a, b):
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


# brute_force_topk broadcasts the query set against every corpus row; past
# this many queries the broadcast (and the |corpus| x |queries| score
# volume) stops being a plan — the guard fails fast with a pointer to the
# bucketed paths instead of letting the broadcast OOM an executor.
BRUTE_FORCE_MAX_QUERIES = 10_000


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec",
                     max_queries: int = BRUTE_FORCE_MAX_QUERIES) -> DataFrame:
    """Exact cosine top-k per query. ``queries`` must be broadcast-small:
    more than ``max_queries`` rows raises ValueError — use ``lsh_topk`` or
    ``ivf_topk`` (bucketed candidate generation) for large query sets."""
    from pyspark.sql import Window as W
    if max_queries is not None:
        # probe via limit(n+1) so the check never scans past the threshold
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"brute_force_topk: query set has > {max_queries} rows; "
                "the broadcast cross-join is only for small query sets — "
                "use lsh_topk or ivf_topk (or raise max_queries explicitly)")
    joined = corpus.crossJoin(F.broadcast(queries))
    joined = joined.filter(F.col(id_col) != F.col(q_id_col))
    scored = joined.withColumn(
        "cosine", F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 6))
    w = W.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col, "cosine"))


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bytes — no RNG
    state, identical on driver/executors/oracles."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(0, dim, 16):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()
            vals.extend(b - 127.5 for b in h)
        v = np.array(vals[:dim], dtype=np.float64)
        v /= np.linalg.norm(v)
        planes.append([float(x) for x in v])
    return planes


def lsh_signature_col(vec_col, planes: list[list[float]]):
    """Bit-string signature: sign(v · plane_p) per plane (JVM-side)."""
    vd = F.transform(vec_col, lambda x: x.cast("double"))
    bits = []
    for plane in planes:
        lits = F.array(*[F.lit(x) for x in plane])
        bits.append(F.when(_dot(vd, lits) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def banded_signatures(df: DataFrame, vec_col: str,
                      planes: list[list[float]], bands: int) -> DataFrame:
    """Explode each row into one (band, sig) bucket row per band."""
    n_planes = len(planes)
    per_band = max(n_planes // bands, 1)
    band_cols = []
    for b in range(bands):
        sub = planes[b * per_band: (b + 1) * per_band]
        band_cols.append(F.struct(
            F.lit(b).alias("band"),
            lsh_signature_col(F.col(vec_col), sub).alias("sig")))
    return (df.withColumn("bb", F.explode(F.array(*band_cols)))
            .withColumn("band", F.col("bb.band"))
            .withColumn("sig", F.col("bb.sig")).drop("bb"))


def embedding_neardup_pairs(corpus: DataFrame, threshold: float = 0.9,
                            n_planes: int = 8, bands: int = 2, dim: int = 64,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate detection (the dedup-family variant of
    LSH search): candidate pairs share a band sub-signature, then the exact
    cosine gate keeps pairs >= threshold. At scale this is a self equi-join
    on (band, sig) — bucket-mates shuffle, nothing else.

    Sizing: the oracle-friendly defaults (8 planes / 2 bands = 4-bit band
    signatures) give only 16 buckets per band — O(n^2/16) candidates at
    corpus scale. Real runs should use >= 32 planes / 4 bands (>= 256
    buckets per band); recall stays high for threshold >= 0.9 because a
    near-dup pair agrees on most hyperplane signs."""
    planes = hyperplanes(dim, n_planes)
    c = banded_signatures(corpus, vec_col, planes, bands)
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                 "band", "sig")
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
                 "band", "sig")
    cand = (a.join(b, ["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "vec_a", "id_b", "vec_b")
            .dropDuplicates(["id_a", "id_b"]))
    scored = cand.withColumn(
        "cosine", F.round(cosine_col(F.col("vec_a"), F.col("vec_b")), 6))
    return (scored.filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def ivf_fit_centroids(corpus: DataFrame, n_centroids: int,
                      lloyd_iters: int = 1, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic IVF coarse quantizer: seed centroids are the
    ``n_centroids`` lowest-id corpus vectors, refined by ``lloyd_iters``
    spherical-k-means steps (assign by max cosine, recenter by per-dimension
    mean). Everything is reproducible on any engine: no RNG, assignment
    tie-breaks on the rounded cosine then lowest centroid id, and recentered
    coordinates are rounded to 6 decimals so an independent SQL engine
    computes bit-identical centroids. Empty clusters keep their previous
    centroid.

    The centroid table is tiny (n_centroids x dim) by construction — it is
    collected to the driver and re-broadcast as literals, which keeps every
    per-row operation JVM-side (whole-stage codegen, no Python). At 100 TB
    the fit runs over a sample; assignment cost is one O(n_centroids * dim)
    expression per row, no row blowup and no shuffle."""
    rows = (corpus.select(id_col, vec_col).orderBy(id_col)
            .limit(n_centroids).collect())
    cents = [[float(x) for x in r[vec_col]] for r in rows]
    for _ in range(lloyd_iters):
        assigned = ivf_assign(corpus, cents, vec_col)
        means = (assigned.groupBy("cluster")
                 .agg(*[F.round(F.avg(F.col(vec_col)[i].cast("double")), 6)
                        .alias(f"c{i}") for i in range(dim)])
                 .collect())
        new = list(cents)
        for r in means:
            new[r["cluster"]] = [float(r[f"c{i}"]) for i in range(dim)]
        cents = new
    return cents


# Above this many centroids the literal/codegen assignment path is replaced
# by one Arrow-batched numpy matmul: n_centroids * dim literal expressions
# per row stop being a plan, they become a compile bomb (the SemDeDup paper's
# ~1e5 clusters would mean 1e5 expressions x 64 literals each).
IVF_ARROW_THRESHOLD = 256


def _ivf_assign_arrow(df: DataFrame, cents: list[list[float]],
                      vec_col: str, out_col: str) -> DataFrame:
    """Scale path for nearest-centroid assignment: the centroid matrix is a
    proper Spark broadcast (NOT closure-pickled into every task binary) and
    each Arrow batch does ONE float64 matmul + row-norm divide + argmax.
    Semantics mirror the literal path exactly: cosine rounded to 6 decimals
    first, then argmax with first-index (= lowest centroid id) tie-break.

    Cost per row is the same O(n_centroids * dim) flops as the literal path,
    but amortized over a BLAS matmul per Arrow batch instead of 1e5 codegen
    expressions — the only viable shape at the ~1e5-cluster scale SemDeDup
    (Abbas et al. 2023) itself uses. One Python eval node in the plan
    (pinned by tests/test_similarity_scale.py), everything else stays JVM."""
    sc = df.sparkSession.sparkContext
    cmat = np.asarray(cents, dtype=np.float64)
    bc = sc.broadcast(cmat)

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:                      # np.stack raises on empty
            return pd.Series([], dtype=np.int32)
        cm = bc.value
        cn = np.linalg.norm(cm, axis=1)
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        vn = np.linalg.norm(mat, axis=1)
        cos = (mat @ cm.T) / (vn[:, None] * cn[None, :])
        return pd.Series(np.argmax(_round_half_up6(cos), axis=1)
                         .astype(np.int32))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def _round_half_up6(x: np.ndarray) -> np.ndarray:
    """Match Spark's F.round (BigDecimal HALF_UP: ties away from zero) at 6
    decimals — np.round's banker's rounding can flip an argmax/nprobe
    tie-break against the JVM literal path when a cosine lands exactly on a
    5e-7 boundary."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def ivf_assign(df: DataFrame, cents: list[list[float]],
               vec_col: str, out_col: str = "cluster") -> DataFrame:
    """Nearest-centroid assignment. Small centroid sets (< IVF_ARROW_THRESHOLD)
    stay JVM-side: an array of rounded cosines to each centroid, argmax with
    first-index (= lowest centroid id) tie-break — whole-stage codegen,
    bit-exact vs the SQL oracles. Above the threshold the identical-semantics
    Arrow/numpy path takes over (see _ivf_assign_arrow): broadcast centroid
    matrix + one vectorized matmul-argmax per batch, because 1e5 codegen
    expressions is not a plan Catalyst can compile."""
    if len(cents) >= IVF_ARROW_THRESHOLD:
        return _ivf_assign_arrow(df, cents, vec_col, out_col)
    cos_arr = F.array(*[
        F.round(cosine_col(F.col(vec_col),
                           F.array(*[F.lit(x) for x in c])), 6)
        for c in cents])
    return (df.withColumn("__cos", cos_arr)
            .withColumn(out_col,
                        (F.array_position(F.col("__cos"),
                                          F.array_max("__cos")) - 1)
                        .cast("int"))
            .drop("__cos"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_centroids: int = 8, nprobe: int = 2, lloyd_iters: int = 1,
             dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """IVF approximate top-k: partition the corpus into ``n_centroids``
    inverted lists via the deterministic coarse quantizer, then each query
    probes only its ``nprobe`` nearest lists and runs exact cosine top-k on
    the candidates. The at-scale path next to LSH banding: candidate
    generation is an equi-join on the cluster id, so only probed-list
    members shuffle — ~nprobe/n_centroids of the corpus per query — and the
    inverted file (cluster column) is computed once and reusable across
    query batches."""
    from pyspark.sql import Window as W
    cents = ivf_fit_centroids(corpus, n_centroids, lloyd_iters, dim,
                              id_col, vec_col)
    inv = ivf_assign(corpus, cents, vec_col)
    if n_centroids >= IVF_ARROW_THRESHOLD:
        # same compile-bomb avoidance as ivf_assign: one Arrow matmul per
        # batch emits the nprobe nearest cluster ids directly (rounded-cosine
        # desc, cluster-id-asc tie-break — identical to the window below)
        bc = queries.sparkSession.sparkContext.broadcast(
            np.asarray(cents, dtype=np.float64))

        @pandas_udf("array<int>")
        def _probe(v: pd.Series) -> pd.Series:
            if len(v) == 0:                  # np.stack raises on empty
                return pd.Series([], dtype=object)
            cm = bc.value
            cn = np.linalg.norm(cm, axis=1)
            mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
            vn = np.linalg.norm(mat, axis=1)
            cos = _round_half_up6(
                (mat @ cm.T) / (vn[:, None] * cn[None, :]))
            # lexsort: primary -cosine desc, secondary cluster id asc
            order = np.argsort(-cos, axis=1, kind="stable")
            return pd.Series([row[:nprobe].astype(np.int32).tolist()
                              for row in order])

        qprobe = (queries
                  .select(q_id_col, q_vec_col,
                          F.explode(_probe(F.col(q_vec_col))).alias("cluster")))
    else:
        qcos = F.array(*[
            F.round(cosine_col(F.col(q_vec_col),
                               F.array(*[F.lit(x) for x in c])), 6)
            for c in cents])
        wq = W.partitionBy(q_id_col).orderBy(F.col("__qc").desc(),
                                             F.col("cluster"))
        qprobe = (queries
                  .select(q_id_col, q_vec_col,
                          F.posexplode(qcos).alias("cluster", "__qc"))
                  .withColumn("__pr", F.row_number().over(wq))
                  .filter(F.col("__pr") <= nprobe)
                  .select(q_id_col, q_vec_col, "cluster"))
    cand = (inv.join(F.broadcast(qprobe), "cluster")
            .filter(F.col(id_col) != F.col(q_id_col)))
    scored = cand.withColumn(
        "cosine", F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 6))
    w = W.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col, "cosine"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, bands: int = 4, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k with banded OR-amplification: the planes are split
    into ``bands`` groups; a corpus vector is a candidate if it matches the
    query's sub-signature in ANY band. The scale path: the cross join becomes
    an equi-join on (band, sub_signature) — only bucket-mates shuffle."""
    from pyspark.sql import Window as W
    planes = hyperplanes(dim, n_planes)
    c = banded_signatures(corpus, vec_col, planes, bands)
    q = banded_signatures(queries, q_vec_col, planes, bands)
    cand = (c.join(F.broadcast(q), ["band", "sig"])
            .filter(F.col(id_col) != F.col(q_id_col))
            .select(id_col, vec_col, q_id_col, q_vec_col)
            .dropDuplicates([id_col, q_id_col]))
    scored = cand.withColumn(
        "cosine", F.round(cosine_col(F.col(vec_col), F.col(q_vec_col)), 6))
    w = W.partitionBy(q_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col, "cosine"))


def _cap_clusters(assigned: DataFrame, max_cluster_size: int,
                  id_col: str, vec_col: str,
                  semantic_max_subseeds: int = 64) -> DataFrame:
    """Bound the pair-join group sizes: re-split every cluster above
    ``max_cluster_size`` into a ``sub`` level, in two deterministic passes.

    1. SEMANTIC split — for each oversized cluster needing
       k_c = ceil(size/max) <= ``semantic_max_subseeds`` sub-seeds, the k_c
       lowest-id members become sub-seeds and every member assigns to its
       max-cosine sub-seed (one equi-join on cluster + a struct-max agg;
       cost sum(size_c * k_c), no driver loop, no codegen blowup). This is
       the hierarchical-k-means move the SemDeDup paper implies; exact
       duplicates land on the same sub-seed because assignment is a pure
       function of the vector. The k_c cap matters: WITHOUT it a
       degenerate mega-cluster (size >> max * kcap) would need size/max
       sub-seeds and the seed join would cost size^2/max — quadratic in
       exactly the skew case this function exists to kill. Such clusters
       skip straight to pass 2 (cost O(size), semantic locality traded
       for survival).
    2. HASH fallback — k-means does not promise balance, so any
       (cluster, sub) still above the cap is chunked by a hash of the
       VECTOR FINGERPRINT (rounded coordinate string) mod ceil(size/max) —
       chunks are ~max in expectation (hash-uniform), which is what bounds
       the pair join; identical vectors share the fingerprint, so exact
       duplicates are never separated, and near-duplicate pairs split
       across chunks are the documented recall cost of the bound.

    Returns ``assigned`` plus a ``sub`` column (0 for small clusters);
    pair comparison then groups on (cluster, sub)."""
    from pyspark.sql import Window as W

    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("__n"))
    withn = assigned.join(F.broadcast(sizes), "cluster")
    small = (withn.filter(F.col("__n") <= max_cluster_size)
             .select(id_col, "cluster", vec_col, F.lit(0).alias("sub")))
    sem_limit = max_cluster_size * semantic_max_subseeds
    # degenerate mega-clusters: no semantic pass (see docstring), sub=0
    # rows flow into the hash fallback which chunks them in O(size)
    huge = (withn.filter(F.col("__n") > sem_limit)
            .select(id_col, "cluster", vec_col, F.lit(0).alias("sub")))
    big = withn.filter((F.col("__n") > max_cluster_size)
                       & (F.col("__n") <= sem_limit))

    w = W.partitionBy("cluster").orderBy(id_col)
    seeds = (big.withColumn("__rk", F.row_number().over(w))
             .filter(F.col("__rk") <= F.ceil(F.col("__n")
                                             / max_cluster_size))
             .select("cluster", (F.col("__rk") - 1).alias("__seed_sub"),
                     F.col(vec_col).alias("__seed_vec")))
    scored = (big.join(seeds, "cluster")
              .withColumn("__cos", F.round(
                  cosine_col(F.col(vec_col), F.col("__seed_vec")), 6))
              .groupBy(id_col)
              .agg(F.max(F.struct(F.col("__cos"),
                                  (-F.col("__seed_sub")).alias("__ns"),
                                  F.col("cluster"),
                                  F.col(vec_col).alias("__v"))).alias("m"))
              .select(id_col, F.col("m.cluster").alias("cluster"),
                      F.col("m.__v").alias(vec_col),
                      (-F.col("m.__ns")).cast("int").alias("sub")))

    # hash fallback on still-oversized (cluster, sub) groups: fingerprint =
    # xxhash64 of the rounded coordinate string (identical vectors -> same
    # chunk, so exact dups are never split)
    fp = F.xxhash64(F.array_join(
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double"), 6).cast("string")),
        ","))
    scored = scored.unionByName(huge)
    sub_sizes = scored.groupBy("cluster", "sub").agg(
        F.count("*").alias("__sn"))
    # disjoint renumbering: untouched groups take sub*4096, chunked ones
    # sub*4096 + 1 + chunk — no cross-group collision for < 4095 chunks
    capped = (scored.join(F.broadcast(sub_sizes), ["cluster", "sub"])
              .withColumn("__chunks",
                          F.ceil(F.col("__sn") / max_cluster_size))
              .withColumn("sub",
                          F.when(F.col("__sn") <= max_cluster_size,
                                 F.col("sub") * 4096)
                          .otherwise(F.col("sub") * 4096
                                     + 1 + F.pmod(fp, F.col("__chunks"))
                                     .cast("int")))
              .select(id_col, "cluster", vec_col, "sub"))
    return small.unionByName(capped)


def semdedup(corpus: DataFrame, n_clusters: int = 8, threshold: float = 0.95,
             lloyd_iters: int = 1, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_cluster_size: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): semantic dedup over
    an embedding column — k-means-cluster the corpus, compare vectors
    pairwise WITHIN each cluster only, and drop every vector whose cosine to
    a lower-id cluster-mate is >= ``threshold`` (one survivor per duplicate
    pair; lowest id wins, matching the keep-first convention of the other
    dedup operators).

    Returns (id, cluster, kept) for every input row.

    Scale posture: this is the published recipe precisely BECAUSE it avoids
    the O(n^2) all-pairs cosine — clustering first makes the pair stage
    O(sum |c_i|^2). At 100 TB, n_clusters grows with the corpus so cluster
    sizes stay bounded (the paper uses ~100k clusters for 5B embeddings);
    the pair stage is then a self equi-join on the cluster id in which only
    cluster-mates shuffle, and the centroid fit (ivf_fit_centroids) runs
    over a sample. All vector math is JVM-side (zip_with/aggregate), no
    Python in the hot path (Arrow path above IVF_ARROW_THRESHOLD
    centroids). Hot-cluster skew is the known failure mode at scale:
    ``max_cluster_size`` bounds every pair-join group via
    :func:`_cap_clusters` (semantic sub-seed re-split, then a
    vector-fingerprint hash chunking fallback whose chunks are
    ~max_cluster_size in expectation — hash-uniform, so the pair join is
    O(n * max) not O(hot_cluster^2); exact duplicates are never separated
    because identical vectors share the fingerprint; near-dup pairs split
    across chunks are the documented recall cost of the bound). None
    (default) keeps the paper's one-level behavior and the oracle's
    exact semantics.
    """
    cents = ivf_fit_centroids(corpus, n_clusters, lloyd_iters, dim,
                              id_col, vec_col)
    # materialize the assignment once: it feeds BOTH sides of the self-join
    # and the final left join, and the per-row n_clusters x dim quantization
    # is the dominant cost — without this the plan re-derives it three times
    assigned = (ivf_assign(corpus.select(id_col, vec_col), cents, vec_col)
                .localCheckpoint(eager=True))
    group = ["cluster"]
    if max_cluster_size is not None:
        assigned = _cap_clusters(assigned, max_cluster_size,
                                 id_col, vec_col).localCheckpoint(eager=True)
        group = ["cluster", "sub"]
    a = assigned.select(F.col(id_col).alias("id_a"), *group,
                        F.col(vec_col).alias("vec_a"))
    b = assigned.select(F.col(id_col).alias("id_b"), *group,
                        F.col(vec_col).alias("vec_b"))
    dropped = (a.join(b, group)
               .filter(F.col("id_a") < F.col("id_b"))
               .withColumn("cosine",
                           F.round(cosine_col(F.col("vec_a"),
                                              F.col("vec_b")), 6))
               .filter(F.col("cosine") >= threshold)
               .select(F.col("id_b").alias(id_col))
               .distinct())
    return (assigned
            .join(dropped.withColumn("__dropped", F.lit(True)),
                  id_col, "left")
            .select(id_col, "cluster",
                    F.col("__dropped").isNull().alias("kept")))


def ann_recall(exact: DataFrame, approx: DataFrame,
               q_col: str = "q_id", id_col: str = "vec_id") -> DataFrame:
    """Recall@k of an approximate top-k result set against the exact one —
    the evaluation loop that tunes LSH/IVF parameters (planes, bands,
    probes) before a 100 TB run: recall too low -> add planes/probes,
    recall 1000 with huge candidate sets -> back off.

    Inputs are two (q_col, id_col, ...) top-k tables (``brute_force_topk``
    / ``lsh_topk`` / ``ivf_topk`` output shape); k is implied by the exact
    side's row count per query, so truncated approximate results score
    against the full exact k. Plan shape: one left-semi equi-join on
    (query, id) + two partial aggs over top-k-sized groups — both sides
    are k rows per query, orders of magnitude below the corpus; integer
    thousandths keep it engine-exact.

    Returns (q_col, exact_k, hits, recall_millis).
    """
    e = exact.select(q_col, id_col)
    a = approx.select(q_col, id_col)
    base = e.groupBy(q_col).agg(F.count("*").alias("exact_k"))
    hit = (e.join(a, [q_col, id_col], "left_semi")
           .groupBy(q_col).agg(F.count("*").alias("hits")))
    return (base.join(hit, q_col, "left")
            .select(q_col, "exact_k",
                    F.coalesce("hits", F.lit(0)).alias("hits"),
                    F.expr("cast((coalesce(hits, 0) * 1000) "
                           "div exact_k as int)").alias("recall_millis")))
