"""Source robustness: malformed CSV handling, bucketed shuffle-free
joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from udacity_data_engineering_capstone_project_spark.sources.readers import read_csv
from udacity_data_engineering_capstone_project_spark.sources.sinks import (
    write_bucketed_table,
)

SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("temp", DoubleType()),
    ]
)


@pytest.fixture()
def bad_csv(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("city,temp\nNYC,20.5\nMIA,not_a_number\nLAX,30.0\n")
    return str(p)


def test_csv_permissive_quarantines_bad_rows(spark, bad_csv):
    df = read_csv(spark, bad_csv, schema=SCHEMA, corrupt_column="_corrupt")
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 1 and bad[0]["temp"] is None
    assert "not_a_number" in bad[0]["_corrupt"]


def test_csv_dropmalformed(spark, bad_csv):
    df = read_csv(spark, bad_csv, schema=SCHEMA, mode="DROPMALFORMED")
    assert {r["city"] for r in df.collect()} == {"NYC", "LAX"}


def test_csv_failfast(spark, bad_csv):
    with pytest.raises(Exception):
        read_csv(spark, bad_csv, schema=SCHEMA, mode="FAILFAST").collect()


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    left = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    write_bucketed_table(left, "bk_left", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed_table(right, "bk_right", ["k"], num_buckets=8, sort_cols=["k"])
    try:
        joined = spark.table("bk_left").join(spark.table("bk_right"), on="k")
        assert joined.count() == 5000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed tables join without a shuffle exchange
        assert "Exchange hashpartitioning" not in plan.split("== Initial Plan ==")[0]
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
