"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the exact baseline; IVF (inverted-file)
partitioned search as the scale path: assign vectors to their nearest
centroid once (a narrow broadcast pass), then search only the probed
cells — turning a full O(n*q) scan into O(n/k * q * probes).

All arithmetic is JVM-side: arrays cast to double, dot products via
`zip_with` + `aggregate` (sequential fold, deterministic and
oracle-reproducible). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, computed in
    float64: dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (F.sqrt(_dot(ad, ad)) * F.sqrt(_dot(bd, bd)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Physical shape: broadcast the (small) query set against the corpus —
    a map-side nested loop with no corpus shuffle; the only shuffle is
    the per-query top-k window, partitioned by query id.

    Output: (query_id, neighbor_id, rank, cos_sim r6); self-matches
    excluded; ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "cos_sim")
    )


_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (splitmix64) — plane-matrix PRNG with
    no RNG state to ship and no engine-hash dependence."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def hyperplane_lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH bucket per vector.

    The plane matrix is CONSTANT: components are splitmix64(p*dim+j)
    scaled to [-1, 1), computed once on the driver and embedded as
    array literals, so each row pays exactly num_planes zip_with dot
    products. (The previous formulation derived every component with a
    per-row xxhash64 lambda — 1024 extra hash evaluations per row,
    measured 43 s at sf0.1 through the self-join.) Vectors whose
    cosine is high agree on most plane signs, so bucket equality (all
    ``num_planes`` signs) is a high-precision candidate filter; at
    cluster scale the bucket id doubles as a write-partition key,
    making near-dup search partition-pruned.

    Output: input columns + ``bucket`` (bigint).
    """
    terms = []
    for p in range(num_planes):
        comps = ", ".join(
            repr(_splitmix64(p * dim + j) / float(1 << 63) - 1.0)
            for j in range(dim)
        )
        dot = (
            f"aggregate(zip_with(cast({vec_col} as array<double>), "
            f"array({comps}), (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
        )
        terms.append(f"if({dot} >= 0D, shiftleft(1L, {p}), 0L)")
    return df.withColumn("bucket", F.expr(" | ".join(terms)))


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    num_planes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs at scale: hyperplane-LSH bucket join ->
    exact cosine verification. The equi-join on ``bucket`` replaces the
    all-pairs cross join; recall misses only pairs split by a plane
    (increase recall with fewer planes or multiple tables).

    The bucketed table is persisted: the self-join consumes it twice,
    and without pinning it the whole bucket computation re-runs per
    side."""
    b = hyperplane_lsh_buckets(df, id_col, vec_col, num_planes, dim).select(
        "bucket", F.col(id_col), F.col(vec_col)
    ).persist()
    l, r = b.alias("l"), b.alias("r")
    simv = cosine(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        l.join(
            r,
            on=[
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(simv, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_id: str = "cell",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: the ``nprobe`` nearest centroids by cosine
    for every vector (nprobe=1 for corpus placement; >1 for query-side
    multi-probe, which recovers recall lost at cell boundaries).

    Centroids are broadcast (they are tiny by construction). The
    nprobe=1 corpus-placement path uses a ``min_by`` aggregation —
    partial-aggregatable (map-side combine, no sort), so the n*k
    scored rows never shuffle; only one best-cell row per vector does.
    The nprobe>1 path (query side, small by construction) ranks with a
    row_number window. Both tie-break deterministically on the rounded
    similarity, then the smaller centroid id.

    Output has one row per (vector, probed cell).
    """
    cents = centroids.select(
        F.col(id_col).alias(centroid_id), F.col(vec_col).alias("__centvec")
    )
    scored = vectors.crossJoin(F.broadcast(cents)).withColumn(
        "__csim", F.round(cosine(F.col(vec_col), F.col("__centvec")), 6)
    )
    if nprobe == 1:
        payload = F.struct(
            *[F.col(c) for c in vectors.columns if c != id_col],
            F.col(centroid_id),
        )
        # min of (-csim, cell) == max csim, then min cell — works for
        # any orderable centroid-id type (no negation of the id needed)
        order_key = F.struct((-F.col("__csim")).alias("__ncsim"), F.col(centroid_id))
        best = scored.groupBy(id_col).agg(F.min_by(payload, order_key).alias("__best"))
        return best.select(F.col(id_col), F.col("__best.*"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("__csim").desc(), F.col(centroid_id).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .drop("__rn", "__csim", "__centvec")
    )


def write_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
) -> None:
    """Materialize the IVF index: corpus vectors written as parquet
    partitioned by their cell id. A query then reads only its probed
    cells' files — partition pruning does the candidate selection, so
    search cost is O(cell size), independent of corpus size."""
    assigned = assign_cells(corpus, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
    nprobe: int = 1,
) -> DataFrame:
    """Search a materialized IVF index. The join on ``cell`` against the
    partitioned parquet prunes to the probed cells' files only."""
    index = spark.read.parquet(path)
    query_cells = assign_cells(queries, centroids, id_col, vec_col, nprobe=nprobe)
    q = query_cells.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("__qvec"), F.col("cell")
    )
    scored = (
        index.join(F.broadcast(q), on="cell")
        .filter(F.col(id_col) != F.col(query_id))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, F.col(id_col).alias("neighbor_id"), "rank", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    query_id: str = "query_id",
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: search the query's ``nprobe`` nearest IVF
    cells. Recall < 1.0 near cell boundaries at nprobe=1; each extra
    probe unions one more cell's candidates. At 100 TB the corpus-side
    assignment is done once offline and written partitioned by cell, so
    a query touches only its probed cells' files (partition pruning).
    """
    corpus_cells = assign_cells(corpus, centroids, id_col, vec_col)
    query_cells = assign_cells(queries, centroids, id_col, vec_col, nprobe=nprobe)
    q = query_cells.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("__qvec"), F.col("cell")
    )
    c = corpus_cells.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), F.col("cell")
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col(query_id))
        .withColumn("cos_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "rank", "cos_sim")
    )
