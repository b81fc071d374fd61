"""Link-graph analytics over the crawl output.

pagerank_mass — PageRank in deterministic integer fixed-point: node masses
are bigints, every division is floor division, so the result is bit-exact
across engines and independent of summation order (no floating-point
round-off to diverge between Spark's partial aggregates and a sequential
oracle). Per iteration: one join of edges against ranks + one groupBy(dst)
sum — the canonical Spark PageRank shape; lineage is truncated per
iteration so the plan stays flat. Dangling mass is simply not redistributed
(a documented, deterministic variant); teleport mass is the exact integer
(100-damping_pct)% of the uniform base.

At 100 TB scale the edges table dominates: pre-partition/bucket it by src
so the per-iteration join co-locates without reshuffling edges, and
broadcast the (src, outdeg) dimension when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_mass(nodes: DataFrame, edges: DataFrame,
                  iterations: int = 5, total_mass: int = 10**12,
                  damping_pct: int = 85,
                  weight_col: str | None = None) -> DataFrame:
    """(node, rank_mass) after ``iterations`` rounds.

    ``nodes``: one column of node ids. ``edges``: (src, dst), multigraph —
    parallel edges each carry their own floor(mass/outdeg) contribution.
    With ``weight_col`` (e.g. the host graph's n_links), an edge carries
    floor(mass * w / weighted_outdeg) instead — still pure int64 floor
    arithmetic (requires mass * w < 2^63: at the default 10^12 total mass
    that allows per-edge weights up to ~9*10^6; rescale heavier weights).
    """
    node_col = nodes.columns[0]
    n = nodes.count()
    base = total_mass // n
    teleport = (100 - damping_pct) * base // 100
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    edges = edges.select("src", "dst", w.alias("__w"))
    outdeg = edges.groupBy("src").agg(F.sum("__w").alias("od"))
    ranks = (nodes.select(F.col(node_col).alias("node"))
             .withColumn("mass", F.lit(base).cast("long")))
    for _ in range(iterations):
        contrib = (edges.join(ranks, edges.src == ranks.node)
                   .join(outdeg, "src")
                   .select(F.col("dst"),
                           F.expr("(mass * __w) DIV od").alias("c")))
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (nodes.select(F.col(node_col).alias("node"))
                 .join(incoming, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         F.expr(f"{teleport}L + ({damping_pct}L *"
                                f" coalesce(m, 0L)) DIV 100").alias("mass"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.col("mass").alias("rank_mass"))


def host_graph(edges: DataFrame, src_col: str = "src_url",
               dst_col: str = "dst_url") -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links) from a page-level
    edge list — the reduction every web-graph analysis starts from
    (domain ranking, spam neighborhoods, crawl frontier budgeting).

    One hash aggregation; page URLs collapse to host pairs BEFORE the
    shuffle (parse_url is row-local codegen), so shuffle volume is the
    distinct host-pair count, not the edge count — at Common-Crawl scale
    that is 10^9 edges in, 10^7-ish pairs out of the map side."""
    return (edges.select(
        F.parse_url(F.col(src_col), F.lit("HOST")).alias("src_host"),
        F.parse_url(F.col(dst_col), F.lit("HOST")).alias("dst_host"))
        .filter(F.col("src_host").isNotNull()
                & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links")))


def host_degrees(hg: DataFrame) -> DataFrame:
    """Per-host degree profile from the host graph: distinct out/in
    neighbor hosts, total out/in links, and the internal-link rate
    (self-loops = same-host links) in exact thousandths. Two aggs over the
    (already combine-reduced) host-pair table, full-outer-joined so
    sink-only and source-only hosts both appear."""
    out = (hg.groupBy(F.col("src_host").alias("host"))
           .agg(F.countDistinct("dst_host").alias("out_hosts"),
                F.sum("n_links").alias("out_links"),
                F.sum(F.when(F.col("src_host") == F.col("dst_host"),
                             F.col("n_links")).otherwise(0))
                 .alias("internal_links")))
    inn = (hg.groupBy(F.col("dst_host").alias("host"))
           .agg(F.countDistinct("src_host").alias("in_hosts"),
                F.sum("n_links").alias("in_links")))
    return (out.join(inn, "host", "full_outer")
            .select("host",
                    F.coalesce("out_hosts", F.lit(0)).alias("out_hosts"),
                    F.coalesce("out_links", F.lit(0)).alias("out_links"),
                    F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
                    F.coalesce("in_links", F.lit(0)).alias("in_links"),
                    F.expr("cast((coalesce(internal_links, 0) * 1000) div "
                           "greatest(coalesce(out_links, 0), 1) as int)")
                     .alias("internal_rate_millis")))


def host_reciprocity(hg: DataFrame) -> DataFrame:
    """Per-host link reciprocity from the host graph: the share of a host's
    distinct out-neighbor hosts that link back. Link-farm rings reciprocate
    near 100%; organic hosts (news -> sources, blogs -> docs) mostly don't —
    the classic TrustRank-era spam-neighborhood signal, and an input to
    crawl-budget allocation alongside the trap score.

    Self-loops are excluded (same-host navigation is not reciprocity).
    Plan shape: the host-pair table (already combine-reduced, ~10^7 rows at
    Common-Crawl scale) left-semi-joins its own transpose on the swapped
    key — one equi-join + one agg over the pair dim; the page-level edge
    list is never touched again. Integer thousandths keep it bit-exact.

    Returns (host, out_hosts, reciprocated_hosts, reciprocity_millis).
    """
    pairs = (hg.filter(F.col("src_host") != F.col("dst_host"))
             .select("src_host", "dst_host"))
    back = pairs.select(F.col("dst_host").alias("src_host"),
                        F.col("src_host").alias("dst_host"))
    recip = (pairs.join(back, ["src_host", "dst_host"], "left_semi")
             .groupBy(F.col("src_host").alias("host"))
             .agg(F.count("*").alias("reciprocated_hosts")))
    out = (pairs.groupBy(F.col("src_host").alias("host"))
           .agg(F.count("*").alias("out_hosts")))
    return (out.join(recip, "host", "left")
            .select("host", "out_hosts",
                    F.coalesce("reciprocated_hosts", F.lit(0))
                     .alias("reciprocated_hosts"),
                    F.expr("cast((coalesce(reciprocated_hosts, 0) * 1000) "
                           "div greatest(out_hosts, 1) as int)")
                     .alias("reciprocity_millis")))
