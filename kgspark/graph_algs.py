"""Distributed graph analytics over the triple table.

The reference's graph lives in driver-memory networkx (degree lookups,
neighborhood walks — /root/reference/knowledge_graph_builder.py:595-607,
app.py graph queries); at 10^12-triple scale the equivalents are iterative
DataFrame programs over the edges table:

  pagerank   power iteration with damping + dangling-mass redistribution —
             each round is one join + one aggregation, lineage truncated via
             materialize(); no driver-side collect (the dangling mass rides
             as a 1-row DataFrame through a crossJoin).
  k_hop      bounded BFS from a start node: frontier join per hop, visited
             set accumulated with min-hop semantics.

Both are deterministic fp64 programs with exact SQL twins (the oracles unroll
the same iterations as chained CTEs), rounded at the comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, rank) after `iterations` power-iteration rounds.

    rank_{i+1}(v) = (1-d)/N + d * (sum_{u->v} rank_i(u)/outdeg(u)
                                   + dangling_mass_i / N)

    Dangling nodes (no out-edges) redistribute their mass uniformly — the
    standard correction, without which rank leaks every round."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    nodes = e.select(F.col("s").alias("node")).union(
        e.select(F.col("t").alias("node"))
    ).distinct()
    nodes = materialize(nodes)
    n = nodes.count()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).cast("double").alias("d"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["s"] == ranks["node"])
            .join(deg, "s")
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("d")).alias("contrib"))
        )
        dangling = (
            ranks.join(deg, ranks["node"] == deg["s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = materialize(
            nodes.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
        )
    return ranks


def k_hop(
    edges: DataFrame,
    start,
    k: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """(node, hop): every node reachable from `start` within k hops, with its
    MINIMUM hop distance (BFS level). `start` may be a literal or a 1-row
    DataFrame(start) so callers can compute it without a driver round-trip."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = materialize(e)
    if isinstance(start, DataFrame):
        visited = start.select(
            F.col(start.columns[0]).alias("node"), F.lit(0).alias("hop")
        )
    else:
        spark = edges.sparkSession
        visited = spark.createDataFrame([(start, 0)], "node string, hop int")
    visited = materialize(visited)
    frontier = visited
    for depth in range(1, k + 1):
        # frontier/visited are k-hop-ball-sized — tiny next to the edge
        # table — so both joins broadcast: the edges never shuffle
        nxt = (
            e.join(F.broadcast(frontier), e["s"] == frontier["node"])
            .select(F.col("t").alias("node"), F.lit(depth).alias("hop"))
            .distinct()
            .join(F.broadcast(visited.select("node")), "node", "left_anti")
        )
        nxt = materialize(nxt)
        visited = materialize(visited.unionByName(nxt))
        frontier = nxt
    return visited.select("node", F.col("hop").cast("long").alias("hop"))
