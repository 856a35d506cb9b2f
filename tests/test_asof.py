"""Edge cases for the as-of join composition."""

from __future__ import annotations

import pyspark.sql.functions as F

from udacity_data_engineering_capstone_project_spark.operators.relational import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 200, "l2"), (2, 50, "l3")], ["k", "ts", "lv"]
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (2, 60, 99.0)], ["k", "ts", "rv"]
    )
    out = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(left, right, ["k"], "ts", ["rv"]).collect()
    }
    assert out["l1"] == 10.0  # equal ts counts (>= semantics)
    assert out["l2"] == 15.0  # latest prior, not first
    assert out["l3"] is None  # no prior right row -> null, row preserved


def test_asof_join_forward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "l1"), (1, 200, "l2"), (2, 50, "l3"), (1, 160, "l4")],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (2, 40, 99.0)], ["k", "ts", "rv"]
    )
    out = {
        r["lv"]: r["asof_rv"]
        for r in asof_join(
            left, right, ["k"], "ts", ["rv"], direction="forward"
        ).collect()
    }
    assert out["l1"] == 10.0  # equal ts counts (<= semantics, forward)
    assert out["l4"] is None  # no later right row -> null, row preserved
    assert out["l2"] is None
    assert out["l3"] is None  # right at 40 < 50 is NOT a forward match


def test_asof_right_side_ts_unique_per_user(spark, sf_dir):
    """Data precondition behind the asof_last_click / asof_next_q
    hash grades: with TWO right rows at the same (user_id, ts_us),
    neither the union+window composition nor DuckDB's native ASOF
    defines which one wins — both would pick arbitrarily and the
    parity hash could flake. Pin that the graded events data has no
    such collision on either right side (clicks for backward, errors
    for forward), so a future testdata regeneration that introduces
    one fails HERE with a clear message instead of as a mystery
    hash mismatch (r9 review finding)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_us",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    )
    for etype in ("click", "error"):
        dups = (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", "ts_us")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dups == 0, (
            f"{etype}: {dups} duplicate (user_id, ts_us) rows — the "
            "as-of tie is undefined; add a tiebreak to the graded "
            "queries before regenerating parity hashes"
        )


def test_asof_join_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, "a")], ["k", "ts", "lv"])
    with pytest.raises(ValueError):
        asof_join(left, left, ["k"], "ts", ["lv"], direction="sideways")


def test_asof_join_plan_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts")
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"),
        F.col("id").alias("rv"),
    )
    df = asof_join(left, right, ["k"], "ts", ["rv"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    # union + one window shuffle on the key; no join operator at all
    assert "Join" not in final
    assert final.count("Exchange hashpartitioning") == 1


def test_approx_distinct_error_bound(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.plans.queries import REGISTRY

    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        UNREGISTERED,
    )

    # r7: the graded projection is (exact count, in-bound verdict) —
    # the raw HLL estimate is engine-internal; its accuracy is the
    # verdict's contract (|approx-exact|/exact <= 0.15 = 3x rsd)
    spec = REGISTRY.get("approx_distinct") or UNREGISTERED["approx_distinct"]
    pdf = spec.fn(spark, sf_dir).toPandas()
    assert (pdf.hll_verdict == "in_bound").all()
    assert (pdf.exact_custs > 0).all() and len(pdf) == 5
