"""Link-graph operators for crawl curation: PageRank over a directed
edge list (DataFrame[src, dst]).

Why this lives in a training-data engine: web-curation recipes weight
or threshold documents by host-graph centrality (seed quality lists,
harmonic/PageRank filtering a la CommonCrawl ranking) — so the engine
needs a graph primitive that runs on the same DataFrames as the rest
of the pipeline, not an external graph system.

Execution model (Spark-first, no GraphX/RDDs):
- Each iteration is ONE equi-join ranks><edges on src plus ONE
  groupBy(dst) — both hash-partitioned on the same keys, so with
  ``edges`` pre-partitioned on src the join side of every iteration
  reuses one stable partitioning; only the O(nodes) rank table moves.
- Dangling mass (nodes with no out-edges) is folded in per iteration
  via a broadcast 1-row aggregate — never a driver collect in the
  fixed-iteration path, so the whole plan stays lazy and the oracle
  can replay it.
- The convergent variant materializes each iterate via
  ``localCheckpoint`` (lineage would otherwise grow linearly and
  re-execute the whole chain every action) and stops on an L1 delta.

At 100 TB the edge list dwarfs the rank vector (|E| >> |V|): the edge
side stays put (one repartition, reused every iteration — AQE keeps
the rank side's smaller shuffle), and per-iteration network cost is
O(|V|), which is the known floor for distributed power iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _prepared(edges: DataFrame, src: str, dst: str):
    """Distinct edge list co-partitioned on src, out-degrees, nodes.

    NULL endpoints are dropped: a NULL src would silently vanish in
    the contribution join while still absorbing rank as a node, and a
    NULL dst is not a linkable target — neither is a meaningful graph
    vertex.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .na.drop(subset=["src", "dst"])
        .distinct()
    )
    e = e.repartition("src")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("odeg"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    return e, deg, nodes


def _step(
    e: DataFrame,
    deg: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    n_nodes: float,
    damping: float,
) -> DataFrame:
    """One power-iteration step: ranks[node, rank] -> ranks'."""
    contribs = (
        ranks.join(deg, ranks["node"] == deg["src"])
        .join(e, "src")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") / F.col("odeg")).alias("c"))
    )
    # Dangling nodes hold rank but have no out-edges; their mass is
    # redistributed uniformly. A broadcast 1-row aggregate keeps this
    # inside the plan (no per-iteration driver action).
    dangling = (
        ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
    )
    return (
        nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "node",
            (
                F.lit((1.0 - damping) / n_nodes)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.lit(n_nodes))
            ).alias("rank"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_to: int | None = 8,
) -> DataFrame:
    """Fixed-iteration PageRank -> DataFrame[node, rank].

    The iteration count is part of the result's definition (this is
    the oracle-replayable variant: k chained join+agg rounds are
    expressible as k SQL CTEs — see ORACLE_GRAPH_PAGERANK). Ranks sum
    to 1 at every step (dangling mass is redistributed, not dropped).
    ``round_to`` rounds the final rank so engines that sum float
    contributions in different orders still agree bit-for-bit; pass
    None for raw doubles.
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least 1 iteration")
    e, deg, nodes = _prepared(edges, src, dst)
    n_nodes = float(nodes.count())
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for i in range(iterations):
        ranks = _step(e, deg, nodes, ranks, n_nodes, damping)
        # Unbounded nesting makes Catalyst's analysis cost blow up
        # super-linearly in iteration depth; pin lineage every 8
        # rounds (values unchanged — only the plan is truncated).
        # Small iteration counts stay fully lazy/declarative.
        if (i + 1) % 8 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks


def pagerank_converged(
    edges: DataFrame,
    tol: float = 1e-8,
    max_iterations: int = 50,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> tuple[DataFrame, int]:
    """Power iteration to an L1 fixed point -> (ranks, iterations_run).

    Every iterate is pinned with ``localCheckpoint(eager=True)``:
    without it, iteration k's plan embeds all k-1 predecessors, so the
    per-iteration delta action would re-execute the entire history and
    the lineage would eventually overflow the planner. The checkpoint
    bounds each action to exactly one join+agg round. The L1-delta
    agg is the one driver-visible scalar per iteration — O(1) rows,
    the standard stopping probe for distributed power iteration.
    """
    e, deg, nodes = _prepared(edges, src, dst)
    e = e.localCheckpoint(eager=True)
    deg = deg.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = float(nodes.count())
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).localCheckpoint(
        eager=True
    )
    it = 0
    for it in range(1, max_iterations + 1):
        nxt = _step(e, deg, nodes, ranks, n_nodes, damping).localCheckpoint(
            eager=True
        )
        delta = (
            nxt.join(ranks.withColumnRenamed("rank", "prev"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
            .collect()[0].d
        )
        ranks = nxt
        if delta is not None and delta < tol:
            break
    return ranks, it


def pagerank_personalized(
    edges: DataFrame,
    teleport: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_to: int | None = 8,
) -> DataFrame:
    """Personalized PageRank: the teleport step jumps to ``teleport``'s
    distribution (DataFrame[node, weight], normalized here) instead of
    uniform — rank then measures proximity to the seed set, the form
    crawl curation uses to score hosts against a trusted seed list.

    Dangling mass also re-enters THROUGH the teleport distribution
    (the standard PPR convention: every restart respects the seeds).
    Nodes absent from ``teleport`` get weight 0; iteration starts AT
    the teleport distribution, so a 1-iteration result is already
    seed-relative. Same join/agg shape per iteration as ``pagerank``;
    the teleport column rides the O(|V|) rank table, adding no
    shuffle (it joins on the same node key).
    """
    if iterations < 1:
        raise ValueError("pagerank needs at least 1 iteration")
    e, deg, nodes = _prepared(edges, src, dst)
    w = teleport.select(
        F.col(teleport.columns[0]).alias("node"),
        F.col(teleport.columns[1]).cast("double").alias("w"),
    )
    tele = (
        nodes.join(w, "node", "left")
        .select("node", F.coalesce(F.col("w"), F.lit(0.0)).alias("w"))
    )
    total = tele.agg(F.sum("w")).collect()[0][0]
    if not total or total <= 0:
        raise ValueError(
            "teleport weights must sum to a positive value over the graph's nodes"
        )
    tele = tele.select("node", (F.col("w") / F.lit(float(total))).alias("t"))
    ranks = tele.select("node", F.col("t").alias("rank"))
    for i in range(iterations):
        contribs = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("odeg")).alias("c"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            tele.join(contribs, tele["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") * F.col("t"))
                ).alias("rank"),
            )
        )
        if (i + 1) % 8 == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    if round_to is not None:
        ranks = ranks.select("node", F.round("rank", round_to).alias("rank"))
    return ranks
