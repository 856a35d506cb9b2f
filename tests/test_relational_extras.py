"""Salted join equivalence, range join, materialize checkpoint."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from udacity_data_engineering_capstone_project_spark.operators.relational import (
    range_join,
    salted_join,
)
from udacity_data_engineering_capstone_project_spark.sources.sinks import materialize


def test_salted_join_equals_plain_join(spark):
    # skewed left: 90% of rows share key 0
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, on="k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salts=8).select("k", "lv", "rv")
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))


def test_salted_join_rejects_outer(spark):
    df = spark.range(2).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_range_join_equals_theta_join(spark):
    # deterministic pseudo-random points and intervals over 3 keys
    points = spark.range(500).select(
        (F.col("id") % 3).alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("t"),
        F.col("id").alias("pid"),
    )
    intervals = spark.range(60).select(
        (F.col("id") % 3).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(9_000)).alias("s"),
        F.col("id").alias("iid"),
        (50 + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(900))).alias("span"),
    ).withColumn("e", F.col("s") + F.col("span")).drop("span")

    fast = range_join(
        points, intervals, ["k"], point_col="t", start_col="s", end_col="e",
        bucket_width=500,
    ).select("pid", "iid")
    naive = (
        points.alias("p")
        .join(intervals.alias("i"), on="k")
        .filter((F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e")))
        .select("pid", "iid")
    )
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want and len(got) > 100  # non-vacuous

    # the plan is an equi-join (shuffle/broadcast hash), not a
    # nested-loop theta join
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_materialize_truncates_lineage(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df, str(tmp_path / "ckpt"))
    assert out.count() == 100
    # read-back plan is a plain scan, no upstream lineage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan and "FileScan" in plan
