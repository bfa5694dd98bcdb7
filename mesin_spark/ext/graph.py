"""Iterative graph algorithms on DataFrames — the tier next to
dedup_clusters' connected components (ext/dedup.py): same Pregel-style
loop discipline (per-round join+agg, eager localCheckpoint so the
logical plan stays flat across iterations — the lesson dedup_clusters
measured at 8-11s/round of pure planning without it).

The reference has no graph surface; this is charter extension. Spark's
GraphX is JVM/RDD-only and GraphFrames is an external package — the
DataFrame formulation below is the dependency-free shape, and its
per-round cost is two keyed shuffles (contribution groupBy + rank
join), both on the node id, so a 100 TB edge list partitions cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges collapse):
    rank' = (1-d)/N + d·(Σ_in rank/outdeg + dangling_mass/N), the
    standard power iteration with dangling-node redistribution so ranks
    sum to 1 every round. Fixed iteration count keeps runs comparable;
    each round is one groupBy(dst) shuffle + one rank join, inputs
    eagerly localCheckpoint'ed. Returns (node, rank)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "pagerank: edge list is empty (after any upstream filter) — "
            "no graph to rank"
        )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(max_iter):
        contribs = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "inner")
            .select(
                ranks["node"].alias("src"), (F.col("rank") / F.col("outdeg")).alias("c")
            )
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass: rank held by nodes with no out-edges, spread
        # evenly — folded into the plan as a broadcast 1-row aggregate
        # (a per-round driver .collect() here serialized an extra job per
        # iteration; the crossJoin keeps each round a single job)
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.col("_dm") / n + F.coalesce("in_sum", F.lit(0.0)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node in/out degree in one pass over the (deduplicated) edge
    list — the graph profile read before choosing partitioning for an
    iterative run (a power-law hub predicts the same hot-key trouble
    q_key_skew scores for joins)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    outd = e.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("out_deg"))
    ind = e.groupBy(F.col("dst").alias("node")).agg(F.count(F.lit(1)).alias("in_deg"))
    return (
        outd.join(ind, "node", "full")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
