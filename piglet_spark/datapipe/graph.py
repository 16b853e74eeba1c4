"""Graph centrality over relational edge lists: fixed-iteration
PageRank.

Why this lives in a training-data engine: link-graph centrality is a
standard corpus-quality prior — Common Crawl curation ranks hosts by
centrality (harmonic/PageRank over the domain graph) to pick what to
keep, and citation/interaction graphs serve the same role for
code/paper corpora. The operator is generic: any (src, dst[, weight])
DataFrame.

Reference parity note: the reference engine (dbis-ilm/piglet) has no
graph operators; its nearest shape is the iterative-script idiom
(MATERIALIZE between runs). Here the iteration is a driver loop that
BUILDS the plan — k is small and fixed, rows never iterate through
Python.

Scale shape: each iteration is one join edge⋈rank on the source key +
one partial-aggregated sum on the destination key — the classic
two-shuffle PageRank step. Ranks checkpoint per iteration (bounded:
one row per node), so the lineage never grows; edges are re-scanned
per step, which at 100 TB is the known cost of iterative PageRank on
a non-caching engine — `edges.persist()` upstream is the standard
mitigation and the operator leaves that choice to the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             persist_edges: "bool | None" = None) -> DataFrame:
    """Fixed-``iters`` PageRank on a directed edge list (duplicate
    edges act as weight — the natural semantics when edges come from
    an interaction log). Returns ``(node, pagerank)`` for every node
    appearing as source or destination.

    Semantics (the textbook formulation, uniform teleport):
    ``pr_0 = 1/N``;
    ``pr_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} pr_t(u)/outdeg(u)
    + dangling_t/N)`` where ``dangling_t`` is the rank mass of
    nodes with no outgoing edge (redistributed uniformly, so total
    mass stays 1 — checked in pytest).

    Determinism/oracle story: ranks round to 12 decimals after every
    iteration, so each step's input is a short exact decimal and the
    per-node incoming sum (a float aggregation whose fold order
    Spark does not fix) sits ~1e-16 relative away from any rounding
    boundary; the final output rounds to 9. The whole iteration
    unrolls into generated SQL CTE layers (one per step — the MMR
    precedent), giving an iterative graph algorithm a full value-hash
    DuckDB oracle.

    Each iteration: one src-keyed join + one dst-keyed
    partial-aggregated sum + a 1-row dangling aggregate; the rank
    relation (one row per node) localCheckpoints per step so the
    driver loop never replays earlier iterations. At ``iters > 2``
    the edge list and out-degree table persist (MEMORY_AND_DISK)
    for the loop's duration — every iteration re-scans both, so a
    3+-iteration run otherwise pays the edge scan ``iters`` times
    (r09, VERDICT item; unpersisted before return — safe because
    the final rank is an eager checkpoint)."""
    iters = int(iters)
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    d = float(damping)
    if not 0.0 < d < 1.0:
        raise ValueError(f"pagerank: damping must be in (0,1), got {d}")
    e = edges.select(F.col(src_col).alias("_s"),
                     F.col(dst_col).alias("_t"))
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # r10 restructure (same values, fewer exchanges and jobs/iter):
    # the out-degree rides ON the rank relation — node discovery
    # left-joins outdeg once, so each iteration needs neither the
    # per-step outdeg join nor the dangling ANTI-join (dangling mass
    # is now a filter over the already-materialized rank: _deg IS
    # NULL exactly on the anti-join's rows). Non-eager checkpoint +
    # count materializes node discovery in ONE job.
    nodes = (e.select(F.col("_s").alias("node"))
             .unionByName(e.select(F.col("_t").alias("node")))
             .distinct()
             .join(outdeg.withColumnRenamed("_s", "node"),
                   on="node", how="left")
             .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node").withColumn("pagerank", F.lit(0.0))
    persisted = []
    if persist_edges if persist_edges is not None else iters > 2:
        # pre-partitioned on the per-iteration join key, so the
        # cached edge list is shuffled ONCE here instead of once per
        # iteration (the rank side still exchanges — one row/node)
        e = e.repartition("_s").persist()
        persisted = [e]
    # contribution fraction per edge: pr(u)/outdeg(u) sums over
    # DUPLICATE edges too (each parallel edge carries 1/deg of u)
    base = 1.0 / float(n_nodes)
    # F.round (HALF_UP) rather than python round (half-to-even) so
    # the initial rank mirrors the SQL oracle's round() exactly
    rank = nodes.withColumn("_pr", F.round(F.lit(base), 12))
    teleport = (1.0 - d) * base
    for it in range(iters):
        ranked_out = e.join(
            rank.filter(F.col("_deg").isNotNull())
                .select(F.col("node").alias("_s"), "_pr", "_deg"),
            on="_s")
        contrib = (ranked_out
                   .groupBy(F.col("_t").alias("node"))
                   .agg(F.sum(F.col("_pr") / F.col("_deg"))
                        .alias("_in")))
        # dangling mass: rank held by nodes with no outgoing edge —
        # a filter over the checkpointed rank (rows identical to the
        # previous anti-join against outdeg), no join
        dang = (rank.filter(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("_pr"), F.lit(0.0))
                     .alias("_dm")))
        # intermediate iterations checkpoint NON-eagerly: the RDD is
        # marked (lineage truncates, and both consumers of rank in
        # iteration t+1 — the contribution join and the dangling
        # filter — share ONE computation), but no job runs until
        # the LAST iteration's eager checkpoint materializes the
        # whole loop in a single action (was one eager job per
        # iteration, each paying full job-scheduling latency).
        # The last one stays eager so the persisted edge table is
        # still cached while the loop computes and can be
        # unpersisted safely below.
        last = it == iters - 1
        rank = (nodes.join(contrib, on="node", how="left")
                .crossJoin(F.broadcast(dang))
                .select("node", "_deg",
                        F.round(F.lit(teleport)
                                + F.lit(d)
                                * (F.coalesce(F.col("_in"), F.lit(0.0))
                                   + F.col("_dm") * F.lit(base)),
                                12).alias("_pr"))
                .localCheckpoint(eager=last))
    for p in persisted:  # final rank is an eager checkpoint
        p.unpersist()
    return rank.select("node", F.round("_pr", 9).alias("pagerank"))
