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


def hits_mass(nodes: DataFrame, edges: DataFrame,
              iterations: int = 3, scale: int = 10**6,
              weight_col: str | None = None) -> DataFrame:
    """HITS hubs & authorities (Kleinberg) in deterministic integer
    fixed-point: (node, auth_mass, hub_mass) after ``iterations`` rounds.

    Per round: auth_raw = A^T · hub, hub_raw = A · auth, each L1-normalized
    to ``scale`` total mass with floor division — bigint throughout, so
    Spark's partial-aggregate order and a sequential SQL oracle agree
    bit-for-bit (same trick as :func:`pagerank_mass`). Complements PageRank
    for web-spam analysis: link farms pump hub scores without gaining
    authority, so the hub/auth *ratio* is the classic farm signal.

    Plan shape per iteration: two edge⋈rank joins + two groupBy sums + two
    scalar-normalize crossJoins (the scalar side is a 1-row broadcast).
    At 100 TB, bucket ``edges`` by src (and a dst-keyed copy by dst) so both
    per-iteration joins co-locate; lineage is truncated per round.

    Overflow bound: normalize multiplies raw sums by ``scale`` before the
    floor-div, so requires sum(w)·scale² < 2^63 — at the default 10^6 scale
    that allows ~9·10^6 total edge weight; shrink ``scale`` (or move to
    decimal) beyond that.
    """
    node_col = nodes.columns[0]
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    edges = edges.select("src", "dst", w.alias("__w"))
    ranks = (nodes.select(F.col(node_col).alias("node"))
             .withColumn("auth", F.lit(scale).cast("long"))
             .withColumn("hub", F.lit(scale).cast("long")))

    def _norm(df: DataFrame, col: str) -> DataFrame:
        tot = df.agg(F.sum(col).alias("__tot"))
        return (df.crossJoin(F.broadcast(tot))
                .withColumn(col, F.expr(
                    f"({col} * {scale}L) DIV greatest(__tot, 1L)"))
                .drop("__tot"))

    for _ in range(iterations):
        a_raw = (edges.join(ranks.select("node", "hub"),
                            edges.src == F.col("node"))
                 .groupBy("dst").agg(F.sum(F.expr("__w * hub")).alias("ar")))
        ranks = (ranks.drop("auth")
                 .join(a_raw, ranks.node == a_raw.dst, "left")
                 .select("node", "hub",
                         F.coalesce("ar", F.lit(0)).alias("auth")))
        ranks = _norm(ranks, "auth")
        h_raw = (edges.join(ranks.select("node", "auth"),
                            edges.dst == F.col("node"))
                 .groupBy("src").agg(F.sum(F.expr("__w * auth")).alias("hr")))
        ranks = (ranks.drop("hub")
                 .join(h_raw, ranks.node == h_raw.src, "left")
                 .select("node", "auth",
                         F.coalesce("hr", F.lit(0)).alias("hub")))
        ranks = _norm(ranks, "hub").localCheckpoint(eager=True)
    return ranks.select("node", F.col("auth").alias("auth_mass"),
                        F.col("hub").alias("hub_mass"))


def components_minlabel(nodes: DataFrame, edges: DataFrame,
                        iterations: int = 6) -> DataFrame:
    """Connected components by min-label propagation: (node, component)
    where component is the smallest node id reachable within ``iterations``
    hops (binary string order — deterministic in Spark and ANSI SQL alike).

    Exact once ``iterations`` >= the diameter of the widest component;
    fixed-round by design so a sequential oracle can replay it CTE-by-CTE
    (and so the Spark plan has a static depth — no driver-side convergence
    loop over a 10^9-edge graph). For web host graphs the giant component's
    effective diameter is small (~6-8), which is why the default is 6;
    callers clustering deeper structures pass more rounds.

    Per round: one symmetrized-edge ⋈ labels + one min-agg + one left join
    back to nodes — the label frontier never materializes more than
    O(nodes) rows. At 100 TB bucket edges by src; lineage truncated per
    round. The classic use here: collapse mirror clusters found by
    near-dup/host analysis into canonical groups.
    """
    node_col = nodes.columns[0]
    sym = (edges.select("src", "dst")
           .union(edges.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"))))
    labels = (nodes.select(F.col(node_col).alias("node"))
              .withColumn("component", F.col("node")))
    for _ in range(iterations):
        nbr = (sym.join(labels, sym.src == labels.node)
               .groupBy("dst").agg(F.min("component").alias("nc")))
        labels = (labels.join(nbr, labels.node == nbr.dst, "left")
                  .select("node",
                          F.least("component", F.coalesce("nc", F.col("component")))
                           .alias("component"))
                  .localCheckpoint(eager=True))
    return labels


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle participation over an undirected simple
    graph: (node, n_triangles). Triangles are the local-cohesion signal
    (link farms and tight mirror rings are triangle-dense; organic
    hub-and-spoke link graphs are triangle-sparse).

    Input edges are taken as undirected: both orientations are
    canonicalized to (lo, hi), deduped, self-loops dropped. The count is
    the classic two-join plan — wedges (a<b<c) from edge⋈edge on the
    middle node, closed against the edge set — so every triangle is
    enumerated exactly once in its sorted orientation.

    Scale posture: the wedge join is the O(sum deg^2) step; production
    deployments order each edge by degree first (so wedges pivot on the
    LOWER-degree endpoint, the standard compact-forward cut) — that halves
    the skew but changes no output; at host-graph scale (10^7 nodes) the
    canonical-edge table broadcast is usually viable for the closing join.
    Per-node counts come from exploding each triangle's three corners into
    one hash-agg.
    """
    lo = F.least(F.col("src"), F.col("dst"))
    hi = F.greatest(F.col("src"), F.col("dst"))
    e = (edges.select(lo.alias("a"), hi.alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    x = e.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
    y = e.select(F.col("a").alias("wb"), F.col("b").alias("wc"))
    wedges = x.join(y, "wb")                      # wa < wb < wc by const.
    z = e.select(F.col("a").alias("wa"), F.col("b").alias("wc"))
    tris = wedges.join(z, ["wa", "wc"])
    corners = tris.select(F.explode(F.array("wa", "wb", "wc")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("n_triangles"))


def kcore_peel(nodes: DataFrame, edges: DataFrame, k: int = 3,
               iterations: int = 5) -> DataFrame:
    """Fixed-round k-core peeling: (node, in_kcore, last_degree) after
    ``iterations`` rounds of dropping nodes with alive-degree < k.

    Exact k-core once ``iterations`` reaches the peel depth; fixed-round
    by design (same rationale as components_minlabel: static plan depth,
    CTE-replayable oracle). The k-core is the crawl-frontier's
    "dense web" — spam clusters and heavily-interlinked boilerplate sites
    survive high k; long-tail content peels out early, which makes
    (in_kcore, last_degree) a cheap prioritization feature.

    Per round: one degree agg over alive canonical edges + one semi-join
    filter; edges shrink monotonically so later rounds cost less.
    ``last_degree`` is the node's degree in the final alive subgraph
    (0 for peeled nodes).
    """
    node_col = nodes.columns[0]
    lo = F.least(F.col("src"), F.col("dst"))
    hi = F.greatest(F.col("src"), F.col("dst"))
    e = (edges.select(lo.alias("a"), hi.alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    alive = nodes.select(F.col(node_col).alias("node"))

    def _alive_deg(al):
        ea = (e.join(al.select(F.col("node").alias("a")), "a", "left_semi")
              .join(al.select(F.col("node").alias("b")), "b", "left_semi"))
        return (ea.select(F.col("a").alias("node"))
                .union(ea.select(F.col("b").alias("node")))
                .groupBy("node").agg(F.count("*").alias("d")))

    for _ in range(iterations):
        deg = _alive_deg(alive)
        alive = (alive.join(deg, "node", "left")
                 .filter(F.coalesce(F.col("d"), F.lit(0)) >= k)
                 .select("node").localCheckpoint(eager=True))
    # last_degree is measured on the FINAL alive subgraph (one more agg
    # after the loop) — the last in-loop deg predates the last peel and
    # would overcount every survivor adjacent to a peel victim
    final_deg = alive.join(_alive_deg(alive), "node", "left")
    surv = final_deg.select(
        "node", F.lit(True).alias("in_kcore"),
        F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("last_degree"))
    out = (nodes.select(F.col(node_col).alias("node"))
           .join(surv, "node", "left")
           .select("node",
                   F.coalesce("in_kcore", F.lit(False)).alias("in_kcore"),
                   F.coalesce("last_degree", F.lit(0)).alias("last_degree")))
    return out


def resolve_redirects(edges: DataFrame,
                      doubling_rounds: int = 4) -> DataFrame:
    """Collapse redirect chains to their final target by pointer doubling:
    (src, final_url, hops, resolved). Each round composes the mapping with
    itself (f := f∘f), so ``doubling_rounds`` rounds resolve chains up to
    2^rounds hops — 4 rounds cover the 16-hop chains no sane crawler
    follows anyway (the reference caps redirects far lower, P1).

    resolved=false marks rows whose final target is still itself a
    redirect source after all rounds: a longer-than-2^r chain or a
    redirect CYCLE (a→b→a never terminates; its hops column doubles each
    round — a cheap cycle signature).

    The canonical-URL election step for archive dedup (CDX revisit
    records point at redirect targets) and for collapsing www/https
    variants before seen-set insertion. Plan: one self-equi-join per
    round on the (shrinking-entropy) mapping table — O(log chain) rounds,
    never O(chain) — the same doubling trick list-ranking uses; lineage
    truncated per round.

    The mapping must be FUNCTIONAL (one dst per src) or the self-joins
    fan out multiplicatively; capture logs routinely observe the same URL
    redirecting differently across crawls, so a min(dst) election runs
    first (deterministic; callers with timestamps should pre-elect the
    latest capture with recrawl.keep_latest instead).
    """
    m = (edges.groupBy("src").agg(F.min("dst").alias("dst"))
         .withColumn("hops", F.lit(1).cast("long")))
    for _ in range(doubling_rounds):
        nxt = m.select(F.col("src").alias("src2"),
                       F.col("dst").alias("dst2"),
                       F.col("hops").alias("h2"))
        m = (m.join(nxt, m.dst == nxt.src2, "left")
             .select("src",
                     F.coalesce("dst2", "dst").alias("dst"),
                     (F.col("hops") + F.coalesce(F.col("h2"), F.lit(0)))
                     .alias("hops"))
             .localCheckpoint(eager=True))
    srcs = edges.select(F.col("src").alias("dst")).distinct() \
                .withColumn("__still_src", F.lit(True))
    return (m.join(srcs, "dst", "left")
            .select("src", F.col("dst").alias("final_url"), "hops",
                    F.col("__still_src").isNull().alias("resolved")))


def nepotism_rates(hg: DataFrame) -> DataFrame:
    """Per-registrant nepotistic-link profile from the host graph:
    (registrant, out_links, nepotistic_links, nepotism_millis) where a
    link is nepotistic when source and destination hosts share an eTLD+1
    registrant but are DIFFERENT hosts — the classic same-owner
    link-farm signal (Davison's 'nepotistic links'), complementary to
    host_reciprocity (rings across owners) and trap/triangle density.

    Same-host self-loops are excluded (site navigation is not nepotism);
    cross-host same-registrant links (blog1.example.com ->
    blog2.example.com, example.com -> shop.example.com) are what link
    farms manufacture. One row-local eTLD+1 projection on each side of
    the (already combine-reduced) host-pair table + one hash-agg; exact
    integer thousandths.
    """
    from .urlsignals import registered_domain_cols
    src_rd = registered_domain_cols(F.lower(F.col("src_host")))[
        "registered_domain"]
    dst_rd = registered_domain_cols(F.lower(F.col("dst_host")))[
        "registered_domain"]
    # self-loop exclusion must be case-insensitive like the registrant
    # comparison: hosts arrive as-crawled, and 'example.com' ->
    # 'Example.COM' is same-host navigation, not nepotism
    pairs = (hg.filter(F.lower(F.col("src_host"))
                       != F.lower(F.col("dst_host")))
             .select(src_rd.alias("registrant"), dst_rd.alias("dst_rd"),
                     F.col("n_links")))
    return (pairs.groupBy("registrant")
            .agg(F.sum("n_links").alias("out_links"),
                 F.sum(F.when(F.col("registrant") == F.col("dst_rd"),
                              F.col("n_links")).otherwise(0))
                 .alias("nepotistic_links"))
            .withColumn("nepotism_millis", F.expr(
                "cast((nepotistic_links * 1000) DIV greatest(out_links, 1L)"
                " as int)")))


def trustrank_mass(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
                   iterations: int = 5, total_mass: int = 10**12,
                   damping_pct: int = 85,
                   weight_col: str | None = None) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen 2004): PageRank whose
    teleport mass returns ONLY to a hand-vetted seed set, so trust decays
    with link distance from the seeds — the canonical spam-demotion
    companion to PageRank (a host with high rank_mass but near-zero
    trust_mass earns its rank from outside the trusted web: the classic
    spam candidate, and a crawl-frontier down-weight).

    Same deterministic integer fixed-point discipline as
    :func:`pagerank_mass` (bigint masses, floor division, per-round
    localCheckpoint): ranks start as total_mass split over the seeds;
    each round every node receives damping% of weighted in-link mass and
    seeds additionally receive the (100-damping)% teleport share. Plan
    shape per round is identical to pagerank_mass — one edges⋈ranks join
    + one groupBy(dst) sum + one nodes-left-join — so the same bucketing
    advice applies at 10^10 edges.

    Returns (node, trust_mass). Seeds not present in ``nodes`` are
    ignored (inner-join semantics via the nodes frame driving output).
    """
    node_col = nodes.columns[0]
    seed_col = seeds.columns[0]
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("TrustRank needs a non-empty seed set")
    base = total_mass // n_seeds
    teleport = (100 - damping_pct) * base // 100
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1)
    edges = edges.select("src", "dst", w.alias("__w"))
    outdeg = edges.groupBy("src").agg(F.sum("__w").alias("od"))
    seed_tel = (seeds.select(F.col(seed_col).alias("node")).distinct()
                .withColumn("tel", F.lit(teleport).cast("long"))
                .localCheckpoint(eager=True))
    ranks = (nodes.select(F.col(node_col).alias("node"))
             .join(seed_tel.select("node"), "node", "left_semi")
             .withColumn("mass", F.lit(base).cast("long"))
             .union(nodes.select(F.col(node_col).alias("node"))
                    .join(seed_tel.select("node"), "node", "left_anti")
                    .withColumn("mass", F.lit(0).cast("long"))))
    for _ in range(iterations):
        contrib = (edges.join(ranks, edges.src == ranks.node)
                   .join(outdeg, "src")
                   .select(F.col("dst"),
                           F.expr("(mass * __w) DIV od").alias("c")))
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (nodes.select(F.col(node_col).alias("node"))
                 .join(incoming, F.col("node") == F.col("dst"), "left")
                 .join(seed_tel, "node", "left")
                 .select("node", F.expr(
                     f"coalesce(tel, 0L) + ({damping_pct}L *"
                     f" coalesce(m, 0L)) DIV 100").alias("mass"))
                 .localCheckpoint(eager=True))
    return ranks.select("node", F.col("mass").alias("trust_mass"))


def truss_communities(nodes: DataFrame, edges: DataFrame,
                      min_support: int = 1,
                      cc_iterations: int = 6) -> DataFrame:
    """Community detection by triangle support (k-truss style): keep only
    edges that participate in >= ``min_support`` triangles, then run
    min-label components over the surviving subgraph — (node, community).

    Dense clusters are triangle-rich, so their edges survive; bridges and
    chains are triangle-free and drop, which splits a connected component
    along its sparse cuts — the community granularity crawl-budget
    grouping and spam-neighborhood analysis want, where plain components
    would merge everything reachable. Fully deterministic (unlike
    synchronous label propagation, whose deterministic tie-breaks either
    stall at the initial labeling or degenerate to min-label propagation —
    the reason this op is truss-based).

    Plan: the triangle enumeration join (see :func:`triangle_counts`),
    each triangle exploded onto its 3 edges, one support agg, one
    semi-join filter, then the fixed-round component loop. Nodes whose
    every edge dropped become singleton communities.
    """
    lo = F.least(F.col("src"), F.col("dst"))
    hi = F.greatest(F.col("src"), F.col("dst"))
    e = (edges.select(lo.alias("a"), hi.alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))
    x = e.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
    y = e.select(F.col("a").alias("wb"), F.col("b").alias("wc"))
    wedges = x.join(y, "wb")
    z = e.select(F.col("a").alias("wa"), F.col("b").alias("wc"))
    tris = wedges.join(z, ["wa", "wc"])
    tri_edges = tris.select(F.explode(F.array(
        F.struct(F.col("wa").alias("a"), F.col("wb").alias("b")),
        F.struct(F.col("wb").alias("a"), F.col("wc").alias("b")),
        F.struct(F.col("wa").alias("a"), F.col("wc").alias("b"))))
        .alias("e")).select("e.a", "e.b")
    support = tri_edges.groupBy("a", "b").agg(F.count("*").alias("sup"))
    kept = (e.join(support.filter(F.col("sup") >= min_support),
                   ["a", "b"], "left_semi")
            .select(F.col("a").alias("src"), F.col("b").alias("dst")))
    return (components_minlabel(nodes, kept, iterations=cc_iterations)
            .withColumnRenamed("component", "community"))


def hyperball(nodes: DataFrame, edges: DataFrame, radius: int = 3,
              p: int = 6, max_rho: int = 30) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): per-node r-neighborhood-size
    estimates for r = 0..``radius`` by propagating HyperLogLog registers
    along the link graph — the distance-distribution / effective-diameter
    primitive for web graphs, where exact per-node BFS is O(n*m).

    Each node starts with the registers of {itself}; one round replaces a
    node's registers with the bucket-wise max over itself and its
    out-neighbors' registers, which is EXACTLY the HLL state of the union
    of their balls (max is associative, commutative, idempotent) — so
    after r rounds a node holds the sketch of every node reachable within
    r hops. Register arithmetic is the frozen integer spec of
    sketches.py:hll_registers (48-bit md5 hash, top-``p`` bucket bits,
    clamped rho, floor-div raw estimate), so the propagated state is
    bit-identical to the sketch an oracle computes from the exact
    membership set.

    Returns (node, r, n_present, sum_scaled, ball_est, ball_est_lc), one
    row per node per radius. Neighbors outside ``nodes`` are dangling and
    contribute nothing (their registers never exist).

    Scale posture: per round ONE equi-join (edges against the register
    table on dst) + ONE groupBy(node, bucket) max with map-side combine —
    state is <= m rows per node (m = 2^p, 64 at the default) no matter how
    big the ball gets, the whole point vs exact frontier expansion whose
    state is the ball itself. Lineage is truncated per round like
    pagerank_mass. Estimates for every r ship at the end as a union of
    per-round summaries (each summary aggregates the checkpointed state —
    no recomputation).

    Estimator caveat: ``ball_est`` is the RAW HLL estimator (the frozen
    sketches.py spec — no small-range correction), which is WILDLY biased
    when a ball is much smaller than m = 2^p: a radius-0 singleton at
    p = 6 estimates ~45, not 1. ``ball_est_lc`` applies the standard HLL
    small-range rule: linear counting ``round(m * ln(m / (m - n_present)))``
    whenever ``n_present < m`` AND the raw estimate is <= 2.5m, else the
    raw estimate — directly usable for effective-diameter read-offs
    (anything summing estimates, e.g. neighborhood_fn's pairs_est_lc,
    should sum THIS column, not the raw one). The LC values for each
    possible n_present sit >= 9e-5 away from an integer-rounding boundary
    at p=6, so the column stays engine-exact despite the ln()."""
    m = 1 << p
    rem_bits = 48 - p
    alpha_micros = round(0.7213 / (1 + 1.079 / m) * 10**6)
    node_col = nodes.columns[0]

    from .sketches import h48
    bl = F.length(F.conv(F.col("rem"), 10, 2))
    rho = (F.when(F.col("rem") == 0, F.lit(rem_bits + 1))
           .otherwise(F.lit(rem_bits + 1) - bl))
    regs = (nodes.select(F.col(node_col).alias("node"),
                         h48(F.col(node_col)).alias("h"))
            .filter(F.col("h").isNotNull())
            .select("node",
                    F.expr(f"h DIV {1 << rem_bits}").alias("bucket"),
                    F.expr(f"h % {1 << rem_bits}").alias("rem"))
            .withColumn("M", F.least(rho, F.lit(max_rho)).cast("int"))
            .select("node", "bucket", "M")
            .localCheckpoint(eager=True))

    def summary(rg: DataFrame, r: int) -> DataFrame:
        s = (rg.withColumn("term", F.expr(f"shiftleft(1L, {max_rho} - M)"))
             .groupBy("node")
             .agg(F.count("*").alias("n_present"),
                  F.sum("term").alias("sum_present")))
        return (s.withColumn(
                    "sum_scaled",
                    F.col("sum_present")
                    + (F.lit(m) - F.col("n_present")).cast("long")
                    * F.lit(1 << max_rho).cast("long"))
                .select("node", F.lit(r).cast("int").alias("r"),
                        F.col("n_present").cast("int").alias("n_present"),
                        "sum_scaled",
                        F.expr(f"({alpha_micros}L * (({m}L * {m}L *"
                               f" {1 << max_rho}L) DIV sum_scaled))"
                               " DIV 1000000").alias("ball_est"))
                .withColumn(
                    "ball_est_lc",
                    F.when((F.col("n_present") < m)
                           & (F.col("ball_est") * 2 <= 5 * m),
                           F.round(F.lit(float(m))
                                   * F.log(F.lit(float(m))
                                           / (F.lit(m) - F.col("n_present"))
                                           .cast("double")), 0)
                           .cast("long"))
                    .otherwise(F.col("ball_est"))))

    e = edges.select("src", "dst").distinct()
    outs = [summary(regs, 0)]
    for r in range(1, radius + 1):
        prop = (e.join(regs, e.dst == regs.node)
                .select(F.col("src").alias("node"), "bucket", "M"))
        regs = (regs.unionByName(prop)
                .groupBy("node", "bucket").agg(F.max("M").alias("M"))
                .localCheckpoint(eager=True))
        outs.append(summary(regs, r))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def spam_mass(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
              iterations: int = 5, total_mass: int = 10**12,
              damping_pct: int = 85,
              weight_col: str | None = None) -> DataFrame:
    """Spam mass (Gyöngyi, Berkhin, Garcia-Molina, Pedersen 2006): the
    share of a node's PageRank that does NOT flow from the trusted core —
    the quantified version of the "high rank + low trust" candidate rule
    the trustrank docstring names. Runs :func:`pagerank_mass` and
    :func:`trustrank_mass` over the same graph (same iterations / damping
    / weights / total mass) and reports per node::

        spam_millis = (rank_mass - trust_mass) * 1000 div rank_mass

    clamped below at 0 (seed-adjacent nodes can hold more trust than
    rank; negative mass just means "trusted", and clamping keeps every
    division non-negative so Spark's truncating DIV and an oracle's floor
    division agree). rank_mass >= teleport > 0 for every node, so the
    division is total. ~1000 = rank earned entirely outside the trusted
    web: demote or down-crawl.

    Returns (node, rank_mass, trust_mass, spam_millis). Plan: the two
    fixed-point loops share the edges/outdeg shape (bucket edges by src
    once, both reuse it); the final join is node-keyed, no new shuffle
    beyond the loops' own."""
    pr = pagerank_mass(nodes, edges, iterations=iterations,
                       total_mass=total_mass, damping_pct=damping_pct,
                       weight_col=weight_col)
    tr = trustrank_mass(nodes, edges, seeds, iterations=iterations,
                        total_mass=total_mass, damping_pct=damping_pct,
                        weight_col=weight_col)
    return (pr.join(tr, "node")
            .select("node", "rank_mass", "trust_mass",
                    F.expr("(greatest(rank_mass - trust_mass, 0L) * 1000)"
                           " DIV rank_mass").alias("spam_millis")))
