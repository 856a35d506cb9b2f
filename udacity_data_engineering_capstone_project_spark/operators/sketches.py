"""Mergeable distinct-count sketches (scale extension).

`approx_count_distinct` answers one query on one scan. At 100 TB the
question is usually incremental — "distinct users per day, and
all-time, without rescanning the lake" — which needs the SKETCH to be
a first-class value: computed per partition of arriving data, stored
as a binary column, and merged later without touching the raw rows.
Spark ships Apache DataSketches HLL for exactly this
(`hll_sketch_agg` / `hll_union_agg`); these operators wrap the
build-store-merge-estimate lifecycle.

Sketch bytes are an opaque, versioned DataSketches format — treat them
as a binary column in parquet, never parse them.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group —
    the partial to persist alongside each ingested batch/partition.
    ``lg_k`` trades size for accuracy (2^12 registers ~= 1.6% rel
    stderr, ~2 KB). Partial-aggregatable: map-side combine happens
    before the group shuffle.

    Output: (*group_cols, sketch binary).
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    )


def merge_distinct_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str] | None = None,
    estimate_col: str = "n_distinct",
) -> DataFrame:
    """Union stored sketches (optionally re-grouped to a coarser key —
    e.g. day sketches rolled up to month) and estimate the distinct
    count. Only sketch bytes shuffle; the raw data is never rescanned.

    Output: (*group_cols, sketch binary, <estimate_col> long).
    """
    gb = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    merged = gb.agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
    return merged.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col("sketch"))
    )


def freq_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One Count-Min sketch of ``value_col``'s frequencies per group —
    the heavy-hitter partial to persist alongside each ingested batch
    (the frequency twin of `distinct_sketch`). Estimates over-count by
    at most eps * N with the given confidence; size is O(1/eps).
    Partial-aggregatable: map-side combine before the group shuffle.
    All batches must share ``eps/confidence/seed`` or the merge is
    invalid — persist them next to the sketches.

    Output: (*group_cols, sketch binary).
    """
    col = f"CAST(`{value_col}` AS STRING)"
    agg = F.expr(
        f"count_min_sketch({col}, {eps!r}D, {confidence!r}D, {int(seed)})"
    ).alias("sketch")
    return df.groupBy(*group_cols).agg(agg)


def merge_freq_sketches(spark, sketches: DataFrame) -> bytes:
    """Union stored Count-Min sketches into one (e.g. day batches into
    a month): only sketch BYTES leave the executors — one row per
    stored sketch, each a few KB — and the raw data is never
    rescanned. The merge itself runs on the driver via Spark's own
    `CountMinSketch.mergeInPlace`, which is exact for equally-shaped
    sketches; with thousands of batch sketches this is KBs x batches,
    not data-scale work.

    Returns the merged sketch serialized (feed to `estimate_counts`).
    """
    rows = sketches.select("sketch").collect()
    if not rows:
        raise ValueError("no sketches to merge")
    CMS = spark._jvm.org.apache.spark.util.sketch.CountMinSketch
    merged = CMS.readFrom(bytes(rows[0]["sketch"]))
    for r in rows[1:]:
        merged.mergeInPlace(CMS.readFrom(bytes(r["sketch"])))
    return bytes(merged.toByteArray())


def estimate_counts(spark, sketch: bytes, items: Sequence[object]) -> dict:
    """Frequency estimates for ``items`` from a serialized Count-Min
    sketch (values were sketched as strings; items are stringified the
    same way)."""
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch)
    )
    return {it: cms.estimateCount(str(it)) for it in items}


def quantile_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    alpha: float = 0.01,
) -> DataFrame:
    """DDSketch (Masson, Lee & Rim, VLDB 2019) quantile partials: the
    mergeable percentile twin of `distinct_sketch`/`freq_sketch`.

    Values bucket into geometrically-sized bins — bucket
    ``ceil(log_gamma(|x|))`` with ``gamma = (1+alpha)/(1-alpha)`` —
    so any quantile read back from the sketch carries a RELATIVE error
    of at most ``alpha``, at any scale, unlike fixed-width histograms.
    The sketch is just (sign, bucket, count) rows: exact integers,
    partial-aggregatable (map-side combine before the group shuffle),
    and mergeable forever by summing counts — per-day sketches roll up
    to months without rescanning the raw data. Negative values mirror
    into sign=-1 buckets; zeros get the dedicated sign=0 bucket; NULLs
    and NaNs are skipped (a NaN would otherwise land in a null bucket
    and read back as a spurious zero). All batches must share
    ``alpha`` or the merge is invalid — persist it next to the sketch
    rows.

    Output: (*group_cols, sign int, bucket int, count long).
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    v = F.col(value_col).cast("double")
    sign = F.when(v > 0, 1).when(v < 0, -1).otherwise(0)
    bucket = F.when(
        v == 0, F.lit(0)
    ).otherwise(F.ceil(F.log(F.abs(v)) / F.lit(math.log(gamma))).cast("int"))
    return (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*group_cols, sign.alias("sign"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_quantile_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Merge stored DDSketch rows (optionally re-grouped to a coarser
    key — day sketches rolled up to month). Counts are exact integers,
    so the merge is EXACT: sketch(A union B) == merge(sketch(A),
    sketch(B)) row-for-row. Only sketch rows shuffle — O(log-range /
    alpha) buckets per group — never the raw data."""
    cols = list(group_cols or [])
    return sketches.groupBy(*cols, "sign", "bucket").agg(
        F.sum("count").alias("count")
    )


def sketch_quantiles(
    sketch_df: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    alpha: float = 0.01,
) -> DataFrame:
    """Read quantile estimates out of DDSketch rows (same ``alpha`` the
    sketch was built with). Each bucket's representative value is the
    geometric midpoint ``2*gamma^bucket/(gamma+1)`` of its bin, which
    is within ``alpha`` of every value the bin can hold; the answer for
    q is the first bucket whose running count reaches rank
    ``max(1, ceil(q*n))``. One window cumsum over O(buckets) rows per
    group — the raw data is never touched.

    Output: (*group_cols, q double, estimate double), one row per
    (group, q).
    """
    from pyspark.sql import Window

    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0 <= q <= 1:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    gamma = (1.0 + alpha) / (1.0 - alpha)
    cols = list(group_cols)
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * F.lit(2.0 / (gamma + 1.0))
        * F.pow(F.lit(gamma), F.col("bucket"))
    )
    w = Window.partitionBy(*[F.col(c) for c in cols] or [F.lit(1)]).orderBy("est")
    buckets = sketch_df.withColumn("est", est).withColumn(
        "cum", F.sum("count").over(w)
    )
    totals = sketch_df.groupBy(*cols).agg(F.sum("count").alias("n"))
    qs_col = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    targets = totals.select(*cols, "n", qs_col).withColumn(
        "rank", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n")))
    )
    joined = (
        buckets.join(targets, on=cols)
        if cols
        else buckets.crossJoin(targets)
    )
    return (
        joined.filter(F.col("cum") >= F.col("rank"))
        .groupBy(*cols, "q")
        .agg(F.min("est").alias("estimate"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_frac: float,
) -> DataFrame:
    """EXACT heavy hitters — every value occurring in at least
    ``min_frac`` of rows, with its exact count — without ever shuffling
    a full (value, count) group-by of the column.

    Two-pass approximate-then-verify (the classic Misra-Gries
    refinement): pass 1 runs Spark's single-scan `freqItems`
    (a distributed Karp-Schenker-Papadimitriou summary — at most
    ceil(1/min_frac) candidates, SUPERSET guarantee: no false
    negatives, possible false positives); pass 2 exact-counts in ONE
    scan by grouping on candidate-or-null (every non-candidate row
    folds into the single null group, which also yields the exact row
    total), then drops the false positives. The shuffle carries
    <= 1/min_frac + 1 groups — a 100 TB column with a 0.1% threshold
    aggregates at most 1001 groups regardless of distinct cardinality.
    NULLs are never heavy hitters.

    Output: (value <input type>, count bigint, frac double r6),
    descending count, ties by value. ``min_frac`` floor is 1e-4/0.99
    (just above freqItems' own 1e-4 support floor, so the boundary
    headroom below always exists — and 10k exact groups is where the
    bounded-shuffle premise starts to fray anyway).
    """
    if not 1e-4 / 0.99 <= min_frac <= 1:
        raise ValueError(
            f"min_frac must be in [1e-4/0.99, 1], got {min_frac}"
        )
    # candidate list is <= ceil(1/support) scalars — driver-safe.
    # freqItems' superset guarantee covers frequencies STRICTLY greater
    # than the support; a value at exactly min_frac could be absent at
    # support=min_frac yet pass the >= verify filter below. Run the
    # candidate pass at a slightly lower support so the boundary value
    # is guaranteed into the superset; the validation floor keeps this
    # product at or above freqItems' 1e-4 minimum, so the inclusive >=
    # contract holds for every accepted min_frac.
    support = min_frac * 0.99
    cands = [c for c in df.stat.freqItems([col], support=support).first()[0]
             if c is not None]
    schema_t = dict(df.dtypes)[col]
    empty = df.sparkSession.createDataFrame(
        [], f"value {schema_t}, count bigint, frac double"
    )
    if not cands:
        return empty
    if len(cands) <= 64:
        keyed = df.select(
            F.when(F.col(col).isin(cands), F.col(col)).alias("value")
        )
    else:
        # Large candidate lists must NOT become isin literals: each
        # literal is a py4j round trip, and building the expression for
        # ~1,500 candidates measured 0.7-1.3 s of pure DRIVER time per
        # invocation — more than the whole distributed recount. Ship
        # the list as one Arrow batch and broadcast-hash-join instead:
        # same candidate-or-null key (NULL col never equi-matches, a
        # non-candidate joins nothing), O(1) expression construction.
        cdf = df.sparkSession.createDataFrame(
            [(c,) for c in cands], f"__cand {schema_t}"
        )
        keyed = df.join(
            F.broadcast(cdf), on=F.col(col) == F.col("__cand"), how="left"
        ).select(F.col("__cand").alias("value"))
    counts = (
        keyed.groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
        .localCheckpoint(eager=True)  # <= 1/min_frac + 1 rows
    )
    total = counts.agg(F.sum("count")).first()[0]
    if not total:
        return empty
    return (
        counts.filter(F.col("value").isNotNull())
        .filter(F.col("count") >= F.lit(float(total) * min_frac))
        .withColumn("frac", F.round(F.col("count") / F.lit(float(total)), 6))
        .orderBy(F.col("count").desc(), F.col("value").asc())
    )


def estimate_sketch_intersection(
    sketches_a: DataFrame,
    sketches_b: DataFrame,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Estimated distinct-count INTERSECTION of two HLL sketch sets via
    inclusion-exclusion: |A and B| ~= |A| + |B| - |A or B|. HLL only
    supports union natively, so this is the standard (and standardly
    noisy) way to ask "how many users did BOTH days see?" without
    rescanning either day. Relative error compounds — treat small
    intersections of large sets as indicative, not exact (documented
    DataSketches guidance).

    Inputs are `distinct_sketch` outputs (same lg_k). Output:
    (*group_cols, n_a, n_b, n_union, n_intersection long, all
    estimates).
    """
    cols = list(group_cols or [])
    a = merge_distinct_sketches(sketches_a, cols, estimate_col="n_a").drop("sketch")
    b = merge_distinct_sketches(sketches_b, cols, estimate_col="n_b").drop("sketch")
    u = merge_distinct_sketches(
        sketches_a.unionByName(sketches_b), cols, estimate_col="n_union"
    ).drop("sketch")
    # the union frame covers every group either input has — drive the
    # join from it so a group present on only one side reports
    # (n_other=0, n_intersection=0) instead of vanishing
    joined = (
        u.join(a, on=cols, how="left").join(b, on=cols, how="left")
        if cols
        else u.crossJoin(a).crossJoin(b)
    )
    n_a = F.coalesce(F.col("n_a"), F.lit(0))
    n_b = F.coalesce(F.col("n_b"), F.lit(0))
    return joined.select(
        *cols,
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        F.col("n_union"),
        F.greatest(F.lit(0), n_a + n_b - F.col("n_union")).alias(
            "n_intersection"
        ),
    )
