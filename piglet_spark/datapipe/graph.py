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
             persist_edges: "bool | None" = None,
             broadcast_nodes: int = 2_000_000) -> DataFrame:
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
    persisted = []
    if persist_edges if persist_edges is not None else iters > 2:
        # persist BEFORE node discovery (r10): discovery's
        # union+distinct+outdeg join evaluates the edge subtree three
        # times, and the loop once more per iteration — with an
        # upstream join producing the edges (the registry query joins
        # two TPC-H tables) that was 3 full joins before the first
        # iteration ran (measured: the node-discovery count job was
        # ~60% of the query). Pre-partitioned on the per-iteration
        # join key, so the cached edge list is shuffled ONCE here
        # instead of once per iteration (the rank side still
        # exchanges — one row/node), and outdeg's groupBy reuses the
        # cached partitioning outright.
        e = e.repartition("_s").persist()
        persisted = [e]
    # r10 restructure (same values, fewer exchanges and jobs/iter):
    # the out-degree rides ON the rank relation — so each iteration
    # needs neither a per-step outdeg join nor the dangling ANTI-join
    # (dangling mass is a filter over the already-materialized rank:
    # _deg IS NULL exactly on the anti-join's rows).
    # Node discovery fused to ONE pass (r10b): each edge explodes to
    # (src, 1) and (dst, 0) and a single aggregation yields the node
    # set AND its out-degree — nullif(sum, 0) reproduces the former
    # union→distinct→left-join-outdeg nulls exactly (a node summing
    # to 0 is precisely one that never appears as a source). That
    # plan cost two scans of e and three exchanges; this is one scan
    # and one exchange (A/B: discovery 1.4→0.7 s at 600k edges,
    # hash-identical final ranks).
    if e.schema["_s"].dataType == e.schema["_t"].dataType:
        nodes = (e.selectExpr(
                    "explode(array(named_struct('node', _s, 'o', 1L), "
                    "named_struct('node', _t, 'o', 0L))) as x")
                 .groupBy(F.col("x.node").alias("node"))
                 .agg(F.expr("nullif(sum(x.o), 0L)").alias("_deg"))
                 .localCheckpoint(eager=False))
    else:  # mixed src/dst types can't share one exploded array —
        # keep the coercing union plan for that (rare) shape
        outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
        nodes = (e.select(F.col("_s").alias("node"))
                 .unionByName(e.select(F.col("_t").alias("node")))
                 .distinct()
                 .join(outdeg.withColumnRenamed("_s", "node"),
                       on="node", how="left")
                 .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        for p in persisted:
            p.unpersist()
        return nodes.select("node").withColumn("pagerank", F.lit(0.0))
    # contribution fraction per edge: pr(u)/outdeg(u) sums over
    # DUPLICATE edges too (each parallel edge carries 1/deg of u)
    base = 1.0 / float(n_nodes)
    # F.round (HALF_UP) rather than python round (half-to-even) so
    # the initial rank mirrors the SQL oracle's round() exactly
    rank = nodes.withColumn("_pr", F.round(F.lit(base), 12))
    teleport = (1.0 - d) * base
    # broadcast regime (r10b, guide §3.1): n_nodes is an EXACT count
    # already in hand, so the choice is deterministic, not an
    # estimate. Below the threshold the rank relation (~50 B/node →
    # ~100 MB at the 2M default) broadcasts into the contribution
    # join and the update join — the edge list is never reshuffled
    # and the rank exchange disappears, cutting the per-iteration
    # stage chain roughly in half (A/B at 600k edges/2k nodes:
    # 3.7→2.8 s, hash-identical ranks; per-step round(…,12) absorbs
    # the join-order change in the float sums, re-proven by the
    # DuckDB value-hash oracle at two SFs). Graphs beyond the
    # threshold keep the shuffle plan unchanged.
    bcast = 0 < n_nodes <= int(broadcast_nodes)
    for it in range(iters):
        r_out = (rank.filter(F.col("_deg").isNotNull())
                 .select(F.col("node").alias("_s"), "_pr", "_deg"))
        ranked_out = e.join(F.broadcast(r_out) if bcast else r_out,
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
        # update join: in the broadcast regime the checkpointed rank
        # itself is the node source (same node set, carries _deg) and
        # the aggregated contributions broadcast — a map-only update
        # over |nodes| rows. The big-graph path keeps the original
        # nodes⋈contrib shuffle join.
        upd_src = rank.select("node", "_deg") if bcast else nodes
        rank = (upd_src.join(F.broadcast(contrib) if bcast else contrib,
                             on="node", how="left")
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
