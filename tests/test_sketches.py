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
