"""Graph algorithms over edge DataFrames (north-star extension).

A web-scale corpus pipeline uses link-graph signals as quality priors
(harvest ranking, spam demotion) before expensive per-document stages.
Same execution discipline as `dedup.connected_components`: DataFrame
joins shuffling on node id, `localCheckpoint` lineage truncation every
round (iterative plans otherwise grow exponentially and OOM the
driver during analysis), and scalar-only driver traffic (one aggregate
per iteration for dangling mass + convergence — never the rank table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank with uniform teleport and dangling-node redistribution
    (the standard formulation: parallel edges count as weight, ranks
    sum to 1). Each iteration is one join edges-to-ranks on the source
    node plus one aggregation on the destination — both shuffle on
    node id, so at scale pre-bucketing the edge table by ``src`` makes
    every round shuffle the (small) rank table only.

    Stops early when the L1 rank change drops below ``tol``.

    Output: (node, rank double).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # edge weight = 1/out_degree of the source, fixed across iterations
    w = (
        e.join(out_deg, on="u")
        .select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    has_out = out_deg.select(F.col("u").alias("node"), F.lit(True).alias("__o"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        # rank mass of dangling nodes (no out-edges) teleports uniformly
        dangling = (
            ranks.join(has_out, on="node", how="left")
            .filter(F.col("__o").isNull())
            .agg(F.sum("rank"))
            .collect()[0][0]
            or 0.0
        )
        contrib = (
            w.join(ranks.withColumnRenamed("node", "u"), on="u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("__in"))
        )
        new_ranks = (
            nodes.join(contrib, on="node", how="left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.join(
                ranks.withColumnRenamed("rank", "__old"), on="node"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta < tol:
            break
    return ranks
