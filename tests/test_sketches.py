"""HLL sketch lifecycle: build per batch, persist as binary, merge
without rescanning — estimates checked against exact distincts."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.operators.sketches import (
    distinct_sketch,
    merge_distinct_sketches,
)


def test_sketch_estimate_close_to_exact(spark):
    df = spark.range(50_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 9973).alias("v")
    )
    est = {
        r["g"]: r["n_distinct"]
        for r in merge_distinct_sketches(
            distinct_sketch(df, ["g"], "v"), ["g"]
        ).collect()
    }
    exact = {
        r["g"]: r["x"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("x")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05, (g, est[g], exact[g])


def test_sketch_merge_equals_whole_and_survives_parquet(spark, tmp_path):
    """Day-1 + day-2 sketches, persisted to parquet and merged later,
    must estimate the same as sketching the union directly — the
    incremental pattern (no raw-data rescan)."""
    day1 = spark.range(0, 30_000).select((F.col("id") % 4).alias("g"), F.col("id").alias("v"))
    day2 = spark.range(20_000, 60_000).select((F.col("id") % 4).alias("g"), F.col("id").alias("v"))

    p = str(tmp_path / "sketches")
    distinct_sketch(day1, ["g"], "v").withColumn("day", F.lit(1)).unionByName(
        distinct_sketch(day2, ["g"], "v").withColumn("day", F.lit(2))
    ).write.mode("overwrite").parquet(p)

    stored = spark.read.parquet(p)
    rolled = {
        r["g"]: r["n_distinct"]
        for r in merge_distinct_sketches(stored, ["g"]).collect()
    }
    direct = {
        r["g"]: r["n_distinct"]
        for r in merge_distinct_sketches(
            distinct_sketch(day1.unionByName(day2), ["g"], "v"), ["g"]
        ).collect()
    }
    assert rolled == direct  # identical sketches -> identical estimates
    # and the estimate tracks the true overlap-aware distinct count
    exact = {
        r["g"]: r["x"]
        for r in day1.unionByName(day2)
        .groupBy("g")
        .agg(F.countDistinct("v").alias("x"))
        .collect()
    }
    for g in exact:
        assert abs(rolled[g] - exact[g]) / exact[g] < 0.05


def test_sketch_global_rollup(spark):
    df = spark.range(10_000).select((F.col("id") % 5).alias("g"), (F.col("id") % 997).alias("v"))
    total = merge_distinct_sketches(distinct_sketch(df, ["g"], "v")).collect()
    assert len(total) == 1
    assert abs(total[0]["n_distinct"] - 997) / 997 < 0.05


def test_cms_build_merge_estimate(spark, tmp_path):
    """Count-Min heavy-hitter sketches: per-day sketches persist as
    binary, merge into a month total without rescanning rows, and the
    merged estimate equals build-over-everything (same shape/seed).
    Over-count is bounded by eps*N."""
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        estimate_counts,
        freq_sketch,
        merge_freq_sketches,
    )

    df = spark.range(20_000).selectExpr(
        "CAST(id % 2 AS INT) AS day",
        # zipf-ish: value 0 is hot (half the rows), tail uniform
        "CASE WHEN id % 2 = 0 THEN 0 ELSE id % 1000 END AS v",
    )
    per_day = freq_sketch(df, ["day"], "v", eps=0.001, confidence=0.99)
    path = str(tmp_path / "cms")
    per_day.write.parquet(path)

    merged = merge_freq_sketches(spark, spark.read.parquet(path))
    est = estimate_counts(spark, merged, [0, 1, 999, 123456])
    true0 = df.filter("v = 0").count()
    assert true0 <= est[0] <= true0 + 0.001 * 20_000  # CMS never undercounts
    assert est[123456] <= 0.001 * 20_000  # absent item stays near zero

    # merged(day sketches) == one sketch over the union
    whole = freq_sketch(df, [], "v", eps=0.001, confidence=0.99)
    whole_b = merge_freq_sketches(spark, whole)
    assert estimate_counts(spark, whole_b, [0, 1, 999]) == {
        k: v for k, v in est.items() if k in (0, 1, 999)
    }


def _exact_rank_quantile(sorted_vals, q):
    """The rank convention sketch_quantiles targets: max(1, ceil(q*n))."""
    import math as _math

    n = len(sorted_vals)
    r = max(1, _math.ceil(q * n))
    return sorted_vals[r - 1]


def test_ddsketch_relative_error_guarantee(spark):
    """DDSketch's contract: every quantile estimate is within alpha
    RELATIVE error of the exact rank value, across 4 decades of scale
    (where a fixed-width histogram would blow the low quantiles)."""
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        quantile_sketch,
        sketch_quantiles,
    )

    rng = np.random.RandomState(7)
    vals = np.exp(rng.normal(loc=2.0, scale=2.0, size=20_000))  # ~0.01..3e3
    rows = [(int(i % 3), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double").repartition(8)

    alpha = 0.01
    qs = [0.01, 0.25, 0.5, 0.75, 0.95, 0.99]
    sk = quantile_sketch(df, ["g"], "v", alpha=alpha)
    got = {
        (r["g"], r["q"]): r["estimate"]
        for r in sketch_quantiles(sk, ["g"], qs, alpha=alpha).collect()
    }
    assert len(got) == 3 * len(qs)
    by_g = {g: sorted(v for gg, v in rows if gg == g) for g in (0, 1, 2)}
    for (g, q), est in got.items():
        exact = _exact_rank_quantile(by_g[g], q)
        assert abs(est - exact) / exact <= alpha * 1.05 + 1e-12, (g, q, est, exact)


def test_ddsketch_merge_exact_and_parquet_roundtrip(spark, tmp_path):
    """Counts are exact integers, so merging day sketches MUST equal
    sketching the union row-for-row (not just approximately) — the
    property that makes indefinite rollup safe."""
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    day1 = spark.range(0, 30_000).selectExpr(
        "CAST(id % 4 AS INT) AS g", "CAST(id AS DOUBLE) / 7.0 + 0.5 AS v"
    )
    day2 = spark.range(30_000, 50_000).selectExpr(
        "CAST(id % 4 AS INT) AS g", "CAST(id AS DOUBLE) / 3.0 + 0.5 AS v"
    )
    p = str(tmp_path / "ddsketch")
    quantile_sketch(day1, ["g"], "v").withColumn("day", F.lit(1)).unionByName(
        quantile_sketch(day2, ["g"], "v").withColumn("day", F.lit(2))
    ).write.mode("overwrite").parquet(p)

    rolled = merge_quantile_sketches(spark.read.parquet(p), ["g"])
    direct = quantile_sketch(day1.unionByName(day2), ["g"], "v")
    key = lambda r: (r["g"], r["sign"], r["bucket"])  # noqa: E731
    assert sorted(map(key, rolled.collect())) == sorted(map(key, direct.collect()))
    assert {
        key(r): r["count"] for r in rolled.collect()
    } == {key(r): r["count"] for r in direct.collect()}


def test_ddsketch_signs_zeros_and_validation(spark):
    """Negative values mirror into sign=-1 buckets with the same
    relative-error bound; zeros are exact; bad parameters raise."""
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        quantile_sketch,
        sketch_quantiles,
    )

    vals = [-100.0, -10.0, -1.0] * 100 + [0.0] * 100 + [1.0, 10.0, 100.0] * 100
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = quantile_sketch(df, [], "v", alpha=0.02)
    got = {
        r["q"]: r["estimate"]
        for r in sketch_quantiles(sk, [], [0.1, 0.5, 0.9], alpha=0.02).collect()
    }
    # median of the symmetric layout is the zero bucket — exactly 0
    assert got[0.5] == 0.0
    exact = sorted(vals)
    for q in (0.1, 0.9):
        e = _exact_rank_quantile(exact, q)
        assert abs(got[q] - e) / abs(e) <= 0.02 * 1.05, (q, got[q], e)

    with _pytest.raises(ValueError, match="alpha"):
        quantile_sketch(df, [], "v", alpha=0.0)
    with _pytest.raises(ValueError, match="qs"):
        sketch_quantiles(sk, [], [])
    with _pytest.raises(ValueError, match="quantiles"):
        sketch_quantiles(sk, [], [1.5])


def test_heavy_hitters_exact_vs_naive(spark):
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        heavy_hitters,
    )

    # 60% a, 25% b, 10% c, 5 singletons, plus nulls that count toward
    # the total but can never be hitters
    vals = ["a"] * 60 + ["b"] * 25 + ["c"] * 10 + [f"x{i}" for i in range(5)]
    rows = [(v,) for v in vals] + [(None,)] * 10  # total 110
    df = spark.createDataFrame(rows, "v string").repartition(7)
    out = {r["value"]: (r["count"], r["frac"])
           for r in heavy_hitters(df, "v", min_frac=0.09).collect()}
    assert out == {
        "a": (60, round(60 / 110, 6)),
        "b": (25, round(25 / 110, 6)),
        "c": (10, round(10 / 110, 6)),  # 10/110 > 0.09
    }
    # tighter threshold drops c
    out2 = {r["value"] for r in heavy_hitters(df, "v", min_frac=0.2).collect()}
    assert out2 == {"a", "b"}


def test_heavy_hitters_exact_boundary_value(spark):
    """A value at EXACTLY min_frac of rows must be reported: freqItems'
    superset guarantee is strictly-greater-than its support, so the
    candidate pass runs at a slightly lower support to cover the
    boundary (ADVICE r4)."""
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        heavy_hitters,
    )

    # 'edge' occurs 10/100 = exactly min_frac under several thresholds
    vals = ["big"] * 70 + ["edge"] * 10 + [f"s{i}" for i in range(20)]
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(5)
    for frac in (0.1, 0.1000000000000001):
        got = {r["value"]: r["count"]
               for r in heavy_hitters(df, "v", min_frac=frac).collect()}
        assert got.get("big") == 70, (frac, got)
        # at exactly the threshold the contract is inclusive (>=)
        if frac <= 0.1:
            assert got.get("edge") == 10, (frac, got)


def test_heavy_hitters_edges(spark):
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        heavy_hitters,
    )
    import pytest as _pytest

    empty = spark.createDataFrame([], "v string")
    assert heavy_hitters(empty, "v", 0.5).count() == 0
    allnull = spark.createDataFrame([(None,)] * 5, "v string")
    assert heavy_hitters(allnull, "v", 0.5).count() == 0
    with _pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(allnull, "v", 0.0)
    with _pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(allnull, "v", 1.5)
    # bigint column type survives
    ints = spark.createDataFrame([(1,)] * 9 + [(2,)], "v bigint")
    got = heavy_hitters(ints, "v", 0.5).collect()
    assert [(r["value"], r["count"]) for r in got] == [(1, 9)]


def test_sketch_intersection_inclusion_exclusion(spark):
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        distinct_sketch,
        estimate_sketch_intersection,
    )

    day1 = spark.range(0, 30_000).selectExpr("CAST(id % 2 AS INT) AS g", "id AS v")
    day2 = spark.range(20_000, 50_000).selectExpr("CAST(id % 2 AS INT) AS g", "id AS v")
    out = {
        r["g"]: r
        for r in estimate_sketch_intersection(
            distinct_sketch(day1, ["g"], "v"),
            distinct_sketch(day2, ["g"], "v"),
            ["g"],
        ).collect()
    }
    for g in (0, 1):
        # true overlap is 5_000 per parity group
        r = out[g]
        assert abs(r["n_intersection"] - 5_000) / 5_000 < 0.15, dict(r.asDict())
        assert r["n_union"] <= r["n_a"] + r["n_b"]
    # global (ungrouped) variant
    total = estimate_sketch_intersection(
        distinct_sketch(day1, [], "v"), distinct_sketch(day2, [], "v")
    ).first()
    assert abs(total["n_intersection"] - 10_000) / 10_000 < 0.1


def test_ddsketch_skips_nan(spark):
    """NaN must be dropped at build time — it would otherwise land in
    a NULL bucket and read back as a spurious zero estimate."""
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        quantile_sketch,
        sketch_quantiles,
    )

    df = spark.createDataFrame(
        [(float("nan"),)] * 50 + [(100.0,)] * 100, "v double"
    )
    sk = quantile_sketch(df, [], "v", alpha=0.02)
    assert sk.agg(F.sum("count")).first()[0] == 100  # NaNs not counted
    got = sketch_quantiles(sk, [], [0.5], alpha=0.02).first()["estimate"]
    assert abs(got - 100.0) / 100.0 <= 0.02 * 1.05


def test_sketch_intersection_one_sided_groups_survive(spark):
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        distinct_sketch,
        estimate_sketch_intersection,
    )

    a = spark.createDataFrame([("x", i) for i in range(100)], "g string, v bigint")
    b = spark.createDataFrame(
        [("x", i) for i in range(50, 150)] + [("y", i) for i in range(30)],
        "g string, v bigint",
    )
    out = {
        r["g"]: r
        for r in estimate_sketch_intersection(
            distinct_sketch(a, ["g"], "v"), distinct_sketch(b, ["g"], "v"), ["g"]
        ).collect()
    }
    # group y exists only on side b: reported with n_a=0, not dropped
    assert set(out) == {"x", "y"}
    assert out["y"]["n_a"] == 0 and out["y"]["n_intersection"] == 0
    assert abs(out["x"]["n_intersection"] - 50) <= 10
