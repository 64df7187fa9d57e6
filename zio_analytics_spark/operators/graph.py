"""[EXT] Iterative graph algorithms on DataFrames.

Companion to ``dedup.cluster_duplicates`` (connected components): the other
canonical fixed-point computation, PageRank. Same scale discipline:

- the graph lives as an EDGE LIST DataFrame (src, dst) — never a
  driver-side adjacency structure;
- one iteration = one join + one aggregation (two shuffles on node keys,
  the irreducible cost of message passing);
- lineage is truncated each round with ``localCheckpoint`` — iterative
  self-joins otherwise double the logical plan per round and Catalyst
  re-analysis blows up exponentially (measured in round 3 on connected
  components; same fix here).

Dangling nodes (no out-edges) leak rank mass in the naive formulation; the
standard correction redistributes their total mass uniformly each round —
one extra 1-row aggregate, broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over an edge-list DataFrame for a FIXED number of
    iterations (deterministic — replayable by an oracle; convergence-
    threshold stopping would make the iteration count data-dependent).

    Returns ``(node, rank)`` for every node appearing as src or dst.
    Ranks sum to 1 (dangling mass redistributed uniformly).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()  # one scalar; bounds every uniform term below
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # edge table with out-degree attached, computed once and reused each
    # round (the join against ranks is the only per-iteration work on it)
    ed = e.join(out_deg, "src").localCheckpoint(eager=True)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
