"""Frontier prioritization — trap-aware, depth-aware fetch ordering.

The reference's scheduler is strictly FIFO (Scheduler.cs wraps a queue);
at 10^10-URL scale a frontier needs *policy*: fetch shallow pages before
deep ones and starve probable crawl traps (functions/urlsignals.py) so
budget lands on productive domains. This operator composes those signals
into a deterministic total order WITHOUT touching the engine's
reference-parity FIFO path — it is a frontier-to-frontier transformation a
steady-state recrawl loop applies between rounds: hand
``frontier_priority``'s (url, priority_millis) columns to
``CrawlEngine.seed_from_frontier``, which ranks round-0 fetch order by
(priority_millis, url) — the priority genuinely reorders the crawl.
``prioritized_order`` additionally materializes the dense global rank for
consumers outside the engine (exports, audits).

Determinism/scale contract:
- priority is integer arithmetic (millis), so any SQL engine reproduces it
  bit-for-bit;
- the domain-signal join is a plain equi-join on domain (broadcast when
  the dim is small, shuffle otherwise — Catalyst/AQE decides; the signal
  table is one row per domain, orders of magnitude below the frontier);
- the global order comes from the two-pass range-partition ranker
  (operators/ordering.py) — never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ordering import assign_global_seq


def frontier_priority(frontier: DataFrame,
                      domain_signals: DataFrame | None = None,
                      *, depth_weight_millis: int = 1000,
                      trap_weight_pct: int = 100) -> DataFrame:
    """Add ``priority_millis`` (lower = fetched sooner): depth pushes a URL
    back one full unit per level, a domain's trap score (0..3000 millis,
    functions/urlsignals.domain_trap_signals) pushes its whole backlog back
    proportionally. Frontier must carry (url, domain, depth)."""
    f = frontier
    if domain_signals is not None:
        f = f.join(domain_signals.select("domain", "trap_score_millis"),
                   "domain", "left")
        pri = F.expr(f"depth * {depth_weight_millis}L "
                     f"+ (coalesce(trap_score_millis, 0) * "
                     f"{trap_weight_pct}L) div 100")
    else:
        pri = F.expr(f"depth * {depth_weight_millis}L")
    return f.withColumn("priority_millis", pri)


def prioritized_order(frontier_with_priority: DataFrame,
                      out_col: str = "priority_seq") -> DataFrame:
    """Dense global rank by (priority_millis, url) — url as the unique
    tiebreaker the ranker requires. Range-partition two-pass; no
    single-partition sort at any frontier size."""
    return assign_global_seq(frontier_with_priority,
                             ["priority_millis", "url"], out_col)


def budget_apportion(weights: DataFrame, budget: int,
                     key_col: str = "host",
                     weight_col: str = "weight") -> DataFrame:
    """Exact largest-remainder apportionment (Hamilton's method) of an
    integer crawl budget across hosts proportional to a weight column —
    the per-round "how many fetch slots does each host get" allocation a
    trust/rank-driven crawl scheduler runs. Hamilton's method minimizes
    total |alloc - exact_share| among integer allocations summing to the
    budget, and every step here is integer-exact, so the result is unique
    and engine-portable (ties in the remainder rank break by key asc).

        base_i = budget * w_i div W      rem_i = (budget * w_i) mod W
        leftover R = budget - sum(base)  (0 <= R < #hosts)
        +1 to the R largest remainders (ties -> key asc)

    Requires sum(w) > 0 and w >= 0 (raises otherwise); budget * max(w)
    must stay in int64 (10^4 budget x 10^12 rank mass = 10^16, fine).

    Returns (key, weight, base_alloc, plus_one, alloc), sum(alloc) ==
    budget exactly. Scale posture: one scalar agg, row-local arithmetic,
    and the remainder rank via the two-pass range-partitioned global
    sequencer (assign_global_seq) — never a single-partition window, so
    the allocation runs at 10^8-host scale."""
    w = weights.select(F.col(key_col).alias("key"),
                       F.col(weight_col).cast("long").alias("w"))
    # pin the weights ONCE: the plan below evaluates them three times (W/mn
    # agg, base_sum agg, final ranked output) — without this a
    # nondeterministic upstream could make the collected W diverge from the
    # recomputed base_alloc and break sum(alloc) == budget, and an expensive
    # upstream (q_crawl_budget's 5-round trustrank) would re-run per pass
    # (same convention as containment_pairs / the graph loops)
    w = w.localCheckpoint(eager=True)
    tot = w.agg(F.sum("w").alias("W"),
                F.min("w").alias("mn")).collect()[0]
    W, mn = tot["W"] or 0, tot["mn"]
    if W <= 0 or (mn is not None and mn < 0):
        raise ValueError("budget_apportion needs non-negative weights "
                         "with a positive sum")
    alloc = (w.withColumn("base_alloc", F.expr(f"({budget}L * w) DIV {W}L"))
             .withColumn("rem", F.expr(f"({budget}L * w) % {W}L"))
             .withColumn("neg_rem", -F.col("rem")))
    base_sum = alloc.agg(F.sum("base_alloc")).collect()[0][0]
    leftover = budget - base_sum
    ranked = assign_global_seq(alloc, ["neg_rem", "key"], "__rk")
    return (ranked
            .withColumn("plus_one", (F.col("__rk") < leftover).cast("int"))
            .select(F.col("key").alias(key_col),
                    F.col("w").alias(weight_col),
                    "base_alloc", "plus_one",
                    (F.col("base_alloc") + F.col("plus_one"))
                    .cast("long").alias("alloc")))
