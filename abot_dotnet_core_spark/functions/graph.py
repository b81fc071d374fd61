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
                  damping_pct: int = 85) -> DataFrame:
    """(node, rank_mass) after ``iterations`` rounds.

    ``nodes``: one column of node ids. ``edges``: (src, dst), multigraph —
    parallel edges each carry their own floor(mass/outdeg) contribution.
    """
    node_col = nodes.columns[0]
    n = nodes.count()
    base = total_mass // n
    teleport = (100 - damping_pct) * base // 100
    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ranks = (nodes.select(F.col(node_col).alias("node"))
             .withColumn("mass", F.lit(base).cast("long")))
    for _ in range(iterations):
        contrib = (edges.join(ranks, edges.src == ranks.node)
                   .join(outdeg, "src")
                   .select(F.col("dst"), F.expr("mass DIV od").alias("c")))
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (nodes.select(F.col(node_col).alias("node"))
                 .join(incoming, F.col("node") == F.col("dst"), "left")
                 .select("node",
                         F.expr(f"{teleport}L + ({damping_pct}L *"
                                f" coalesce(m, 0L)) DIV 100").alias("mass"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.col("mass").alias("rank_mass"))
