"""Graph operators: PageRank (exact-integer), building on the
connected-components label propagation in operators.dedup.

The reference has no graph surface; these cover the iterative-algorithm
family a corpus pipeline needs (authority scoring for source/domain
weighting, near-dup cluster analysis).

Exact-integer design (ARCHITECTURE.md pitfall 5): ranks are carried in
parts-per-million BIGINTs and every step is integer arithmetic
(``rank DIV outdeg``, ``(15*teleport + 85*incoming) DIV 100``), so a
fixed iteration count produces bit-identical results on any engine and
any partitioning — float PageRank sums differ in the last ulp with
aggregation order, which would make cross-engine verification flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_ppm"]


def pagerank_ppm(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``edges`` (src, dst)
    columns, ranks in exact integer ppm.

    Per iteration: each node sends ``rank_ppm DIV outdeg`` along its
    out-edges; a node's new rank is
    ``((100-d)*teleport + d*incoming) DIV 100``. Every node must have
    at least one out-edge and one in-edge (callers with undirected
    graphs add both directions — dangling-node mass redistribution is a
    caller-side extension).

    Scale shape: per iteration one join (edges ⋈ ranks, shuffles only
    (node, long) pairs) and one dst-keyed aggregation with map-side
    partial sums; lineage is truncated per round with localCheckpoint so
    plans stay flat (same pattern as connected_components). The node
    count is a driver scalar (one count() over the bounded node set) —
    the same driver-loop posture as the k-means operator."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    teleport = 1_000_000 // max(n_nodes, 1)
    keep = 100 - damping_pct
    ranks = nodes.withColumn(
        "rank_ppm", F.lit(teleport).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppm DIV outdeg").alias("c"),
            )
        )
        ranks = (
            contribs.groupBy("node")
            .agg(
                F.expr(
                    f"CAST(({keep} * {teleport} + {damping_pct} * sum(c)) DIV 100 AS BIGINT)"
                ).alias("rank_ppm")
            )
            .localCheckpoint(eager=True)
        )
    return ranks
