"""Salted join equivalence + materialize checkpoint."""

from __future__ import annotations

import pyspark.sql.functions as F

from udacity_data_engineering_capstone_project_spark.operators.relational import salted_join
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


def test_materialize_truncates_lineage(spark, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = materialize(df, str(tmp_path / "ckpt"))
    assert out.count() == 100
    # read-back plan is a plain scan, no upstream lineage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan and "FileScan" in plan
