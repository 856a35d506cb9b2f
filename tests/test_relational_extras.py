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


def test_resample_time_series_fills_gaps(spark):
    from datetime import datetime

    from udacity_data_engineering_capstone_project_spark.operators.relational import (
        resample_time_series,
    )

    t = lambda s: datetime.fromisoformat(s)
    df = spark.createDataFrame(
        [
            ("u1", t("2024-01-01 00:10:00"), 1.0),
            ("u1", t("2024-01-01 00:50:00"), 2.0),
            # 01:00 and 02:00 silent
            ("u1", t("2024-01-01 03:20:00"), 4.0),
            ("u2", t("2024-01-01 05:00:00"), 9.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = resample_time_series(
        df,
        ["user_id"],
        "ts",
        "1 hour",
        {"n": F.count(F.lit(1)), "total": F.round(F.sum("value"), 2)},
        fill={"n": 0, "total": 0.0},
    )
    rows = {(r["user_id"], r["bucket_start"].hour): (r["n"], r["total"])
            for r in out.collect()}
    # u1 spine: 00..03 inclusive — dense, gaps zero-filled
    assert {(h) for (u, h) in rows if u == "u1"} == {0, 1, 2, 3}
    assert rows[("u1", 0)] == (2, 3.0)
    assert rows[("u1", 1)] == (0, 0.0)
    assert rows[("u1", 2)] == (0, 0.0)
    assert rows[("u1", 3)] == (1, 4.0)
    # u2 active for one bucket: one row only, NOT u1's span
    assert {(h) for (u, h) in rows if u == "u2"} == {5}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resample_time_series(df, ["user_id"], "ts", "2 hours", {"n": F.count(F.lit(1))})


def test_profile_columns_percentile_naming(spark):
    """q=1.0 and fractional quantiles must produce valid, distinct
    column names (the old string-munging yielded 'p1.0' and collapsed
    0.125 with 0.0125); out-of-range quantiles raise."""
    import pytest

    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        profile_columns,
    )

    df = spark.range(100).selectExpr("cast(id as double) AS v")
    prof = profile_columns(df, ["v"], percentiles=(0.125, 0.5, 1.0)).collect()[0]
    assert prof["p12_5"] == 12.375  # exact interpolated 12.5th pctile
    assert prof["p50"] == 49.5 and prof["p100"] == 99.0
    with pytest.raises(ValueError, match="outside"):
        profile_columns(df, ["v"], percentiles=(1.5,)).collect()


def test_profile_columns_approximate_mode(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        profile_columns,
    )
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    li = read_table(spark, sf_dir, "lineitem")
    exact = {r["column_name"]: r for r in profile_columns(
        li, ["l_extendedprice"], percentiles=(0.5, 0.95)).collect()}
    approx = {r["column_name"]: r for r in profile_columns(
        li, ["l_extendedprice"], percentiles=(0.5, 0.95), approximate=True).collect()}
    e, a = exact["l_extendedprice"], approx["l_extendedprice"]
    # GK sketch at accuracy 10k: within 1% relative of the exact value
    for p in ("p50", "p95"):
        assert abs(a[p] - e[p]) / e[p] < 0.01, (p, a[p], e[p])


def test_profile_columns_auto_switches_to_sketch_at_scale(spark, monkeypatch):
    """The default (approximate=None) shares winsorize/numeric_drift's
    optimizer-estimate gate: exact interpolated percentiles below the
    threshold (oracle-comparable), the mergeable approx_percentile
    sketch above it — the exact aggregate buffers every value of every
    profiled column in one aggregation state, a memory wall when the
    pre-ingest quality sweep runs over a 100 TB drop."""
    from udacity_data_engineering_capstone_project_spark.operators import quality as q

    df = spark.range(4_000).selectExpr(
        "CAST(id % 700 AS DOUBLE) AS a", "CAST(id AS DOUBLE) AS b"
    )

    # small input -> exact (bit-identical to approximate=False)
    auto_small = q.profile_columns(df, ["a", "b"], percentiles=(0.5, 0.9)).collect()
    exact = q.profile_columns(
        df, ["a", "b"], percentiles=(0.5, 0.9), approximate=False
    ).collect()
    assert sorted(map(tuple, auto_small)) == sorted(map(tuple, exact))

    # simulated 100x regime: every estimate is over-threshold -> the
    # percentile aggregate must be the mergeable sketch, never the
    # exact value-buffering form
    monkeypatch.setattr(q, "APPROX_DRIFT_MIN_BYTES", 1)
    plan = (
        q.profile_columns(df, ["a", "b"], percentiles=(0.5, 0.9))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "approx_percentile" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")


# ---------------------------------------------------------------------------
# SCD maintenance (operators/scd.py)


def test_merge_upsert_last_writer_wins(spark):
    from udacity_data_engineering_capstone_project_spark.operators.scd import merge_upsert

    cur = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long"
    )
    chg = spark.createDataFrame(
        [(2, "B", 20), (4, "d", 20), (2, "bb", 15)], "k long, v string, ver long"
    )
    out = {r["k"]: (r["v"], r["ver"]) for r in merge_upsert(cur, chg, ["k"], "ver").collect()}
    assert out == {1: ("a", 10), 2: ("B", 20), 3: ("c", 10), 4: ("d", 20)}
    # ties: the change row beats the snapshot row
    tie = spark.createDataFrame([(1, "A", 10)], "k long, v string, ver long")
    out2 = {r["k"]: r["v"] for r in merge_upsert(cur, tie, ["k"], "ver").collect()}
    assert out2[1] == "A"


def test_merge_upsert_idempotent(spark):
    from udacity_data_engineering_capstone_project_spark.operators.scd import merge_upsert

    cur = spark.createDataFrame([(1, "a", 1), (2, "b", 2)], "k long, v string, ver long")
    chg = spark.createDataFrame([(1, "A", 3)], "k long, v string, ver long")
    once = merge_upsert(cur, chg, ["k"], "ver")
    twice = merge_upsert(once, chg, ["k"], "ver")
    assert sorted(once.collect()) == sorted(twice.collect())


def test_scd2_versions_runs_and_validity(spark):
    from udacity_data_engineering_capstone_project_spark.operators.scd import (
        scd2_from_snapshots,
    )

    # key 1: a,a,b,b,a -> three runs; key 2: constant -> one run;
    # key 3: null -> value -> null-safe change detection
    snaps = spark.createDataFrame(
        [
            (1, "a", 1), (1, "a", 2), (1, "b", 3), (1, "b", 4), (1, "a", 5),
            (2, "x", 1), (2, "x", 2),
            (3, None, 1), (3, "y", 2),
        ],
        "k long, attr string, day long",
    )
    rows = scd2_from_snapshots(snaps, ["k"], ["attr"], "day").collect()
    got = {
        (r["k"], r["valid_from"]): (r["attr"], r["valid_to"], r["is_current"])
        for r in rows
    }
    assert got == {
        (1, 1): ("a", 3, False),
        (1, 3): ("b", 5, False),
        (1, 5): ("a", None, True),
        (2, 1): ("x", None, True),
        (3, 1): (None, 2, False),
        (3, 2): ("y", None, True),
    }
    # exactly one current row per key
    cur = [r for r in rows if r["is_current"]]
    assert len(cur) == 3


def test_scd2_single_shuffle_plan(spark):
    """Both windows and the aggregate share the key partitioning — the
    plan must contain exactly one exchange on the business key."""
    from udacity_data_engineering_capstone_project_spark.operators.scd import (
        scd2_from_snapshots,
    )

    snaps = spark.range(100).selectExpr(
        "id % 10 AS k", "CAST(id % 3 AS STRING) AS attr", "id AS day"
    )
    plan = (
        scd2_from_snapshots(snaps, ["k"], ["attr"], "day")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_winsorize_clips_to_exact_quantiles(spark):
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.quality import winsorize

    vals = [float(v) for v in range(1, 101)] + [10_000.0, -10_000.0]  # outliers
    rows = [(i, v, v * 2) for i, v in enumerate(vals)] + [(999, None, None)]
    df = spark.createDataFrame(rows, "id bigint, a double, b double")

    out = winsorize(df, ["a", "b"], lower_q=0.05, upper_q=0.95)
    got = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    # exact interpolated percentiles (numpy 'linear' matches Spark percentile)
    arr = np.array(vals)
    lo, hi = np.percentile(arr, 5), np.percentile(arr, 95)
    assert got[100] == (hi, 2 * hi)  # +outlier clipped to upper cut
    assert got[101] == (lo, 2 * lo)  # -outlier clipped to lower cut
    assert got[50] == (vals[50], vals[50] * 2)  # interior untouched
    assert got[999] == (None, None)  # null passes through

    # single-scan: the bounds aggregation is one job; the clip itself
    # is a projection with no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # suffix mode preserves the original column
    kept = winsorize(df, ["a"], 0.05, 0.95, suffix="_w").filter("id = 100").first()
    assert kept["a"] == 10_000.0 and kept["a_w"] == hi

    # approximate mode stays within sketch tolerance of the exact cuts
    approx = winsorize(df, ["a"], 0.05, 0.95, approximate=True).collect()
    amax = max(r["a"] for r in approx if r["a"] is not None)
    assert abs(amax - hi) / hi < 0.1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower_q"):
        winsorize(df, ["a"], 0.9, 0.1)
    with _pytest.raises(ValueError, match="columns"):
        winsorize(df, [], 0.1, 0.9)


def test_winsorize_exact_bounds_bitwise_match_percentile(spark):
    """The r14 distributed order-statistics exact path must reproduce
    Spark's `percentile` aggregate BIT-FOR-BIT (same q*(n-1) position,
    same (hi-pos)*lo + (pos-lo)*hi interpolation) — the winsorize
    oracle compares clipped values against DuckDB quantile_cont before
    rounding, so any drift here breaks the hash. Exercised on real
    bench data (duplicates, interpolated cuts) plus edge shapes."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        _exact_percentile_bounds,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_extendedprice", "l_quantity"
    )
    frames = {
        "lineitem": (li, ["l_extendedprice", "l_quantity"]),
        "tiny": (
            spark.createDataFrame(
                [(1.0,), (2.0,), (2.0,), (3.5,), (None,)], "x double"
            ),
            ["x"],
        ),
        "allnull": (
            spark.createDataFrame([(None,), (None,)], "x double"),
            ["x"],
        ),
        "single": (spark.createDataFrame([(7.25,)], "x double"), ["x"]),
    }
    for name, (df, cols) in frames.items():
        for qs in [(0.01, 0.99), (0.05, 0.95), (0.0, 1.0), (0.5,)]:
            got = _exact_percentile_bounds(df, cols, qs)
            want_row = df.agg(
                *[
                    F.percentile(
                        F.col(c).cast("double"),
                        F.array(*[F.lit(q) for q in qs]),
                    ).alias(c)
                    for c in cols
                ]
            ).first()
            for c in cols:
                want = want_row[c]
                if want is None:
                    assert got[c] is None, (name, qs, c)
                else:
                    assert got[c] == list(want), (name, qs, c, got[c], want)


def test_winsorize_per_group_cuts(spark):
    import numpy as np

    from udacity_data_engineering_capstone_project_spark.operators.quality import winsorize

    rows = (
        [("a", float(v)) for v in range(1, 101)] + [("a", 10_000.0)]
        + [("b", float(v * 100)) for v in range(1, 101)] + [("b", -10_000.0)]
    )
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id bigint, g string, v double"
    )
    out = winsorize(df, ["v"], 0.05, 0.95, group_cols=["g"])
    got = {r["id"]: r["v"] for r in out.collect()}
    a_vals = np.array([v for g, v in rows if g == "a"])
    b_vals = np.array([v for g, v in rows if g == "b"])
    hi_a = np.percentile(a_vals, 95)
    lo_b = np.percentile(b_vals, 5)
    assert got[100] == hi_a          # group-a outlier clips to a's cut
    assert got[201] == lo_b          # group-b outlier clips to b's cut
    assert got[50] == rows[50][1]    # interiors untouched
    # the cuts genuinely differ per group (global cuts would not)
    assert hi_a < lo_b * 100


def test_schema_drift_report(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import schema_drift

    old = spark.createDataFrame([], "a bigint, b string, c double")
    new = spark.createDataFrame([], "a bigint, b bigint, d string")
    got = {r["column"]: (r["status"], r["old_type"], r["new_type"])
           for r in schema_drift(old, new).collect()}
    assert got == {
        "a": ("unchanged", "bigint", "bigint"),
        "b": ("type_changed", "string", "bigint"),
        "c": ("removed", "double", None),
        "d": ("added", None, "string"),
    }


def test_run_expectations_report_and_fail_fast(spark):
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        QualityError,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (4, None)], "k bigint, v string"
    )
    ok, report = run_expectations(
        df,
        [
            ("row_count", 4),
            ("min_row_count", 10),           # fails
            ("distinct_count", "k", 3),
            ("unique_key", ["k"]),           # fails (k=2 twice)
            ("non_null", ["v"]),             # fails (null v)
            ("schema", [("k", "bigint"), ("v", "string")]),
        ],
    )
    assert ok is False
    got = {r["check"]: (r["passed"], r["detail"]) for r in report.collect()}
    assert got["row_count(4)"][0] is True
    assert got["min_row_count(10)"][0] is False and ">= 10" in got["min_row_count(10)"][1]
    assert got["distinct_count('k', 3)"][0] is True
    assert got["unique_key(['k'])"][0] is False
    assert got["non_null(['v'])"][0] is False
    assert got["schema([('k', 'bigint'), ('v', 'string')])"][0] is True

    # all-green battery
    ok2, rep2 = run_expectations(df, [("row_count", 4), ("min_row_count", 2)])
    assert ok2 is True and rep2.filter("NOT passed").count() == 0

    with _pytest.raises(QualityError):
        run_expectations(df, [("min_row_count", 10)], fail_fast=True)
    with _pytest.raises(ValueError, match="unknown check"):
        run_expectations(df, [("bogus", 1)])


def test_winsorize_grouped_null_key_rows_still_clip(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import winsorize

    rows = [(i, None, float(v)) for i, v in enumerate(range(1, 101))] + [
        (100, None, 10_000.0),
        (200, "g", 5.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, g string, v double")
    out = {r["id"]: r["v"] for r in winsorize(df, ["v"], 0.05, 0.95, group_cols=["g"]).collect()}
    # the NULL group's outlier must clip against the NULL group's cuts
    assert out[100] < 10_000.0
    assert out[200] == 5.0


def test_rolling_zscore_flags_spike_and_gates_history(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        rolling_zscore,
    )

    # series a: mild noise then a spike; series b: constant (zero var)
    rows = [("a", t, 10 + (t % 2)) for t in range(30)] + [("a", 30, 100)]
    rows += [("b", t, 5) for t in range(15)]
    df = spark.createDataFrame(rows, "k string, t int, v int")
    out = {
        (r["k"], r["t"]): r
        for r in rolling_zscore(
            df, ["k"], "t", "v", lookback=24, min_history=8, threshold=3.0
        ).collect()
    }
    spike = out[("a", 30)]
    assert spike["is_anomaly"] is True and spike["z"] > 3.0
    # trailing baseline never includes the current row
    assert spike["trail_mean"] < 11.0
    # fewer than min_history trailing points -> unknown, not normal
    early = out[("a", 3)]
    assert early["z"] is None and early["is_anomaly"] is None
    # zero variance -> unknown (a constant series can't score deviation)
    assert out[("b", 14)]["z"] is None
    # an in-window normal point is not flagged
    normal = out[("a", 20)]
    assert normal["is_anomaly"] is False


def test_key_skew_report_branches_and_topk(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        key_skew_report,
    )

    # hot: 600/1045 = 57% share -> salt; warm: 45 rows = 4.39x the mean
    # group size but only 4.3% share -> watch; cold keys -> ok
    rows = (
        [("hot",)] * 600
        + [("warm",)] * 45
        + [(f"k{i:02d}",) for i in range(100) for _ in range(4)]
    )
    df = spark.createDataFrame(rows, "k string")
    rep = key_skew_report(df, ["k"], top_n=3).collect()
    assert [r["k"] for r in rep] == ["hot", "warm", "k00"]  # ties -> key asc
    by = {r["k"]: r for r in rep}
    assert by["hot"]["suggestion"] == "salt"
    assert by["warm"]["suggestion"] == "watch"
    assert by["k00"]["suggestion"] == "ok"
    assert abs(by["hot"]["share"] - 600 / 1045) < 1e-6
    assert by["warm"]["skew_ratio"] > 4.0


def test_quantile_bins_equal_frequency_and_edges(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        quantile_bins,
    )

    # 100 distinct uniform values -> quartiles split 25/25/25/25
    df = spark.createDataFrame([(i, i * 10) for i in range(100)], "id int, v int")
    out = quantile_bins(df, "v", 4, approximate=False)
    sizes = {
        r["bin"]: r["n"]
        for r in out.groupBy("bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {0: 25, 1: 25, 2: 25, 3: 25}
    # monotone: every value in bin k is <= every value in bin k+1
    rows = sorted((r["bin"], r["v"]) for r in out.collect())
    assert all(
        rows[i][1] <= rows[i + 1][1] for i in range(len(rows) - 1)
        if rows[i][0] == rows[i + 1][0] - 1
    )
    # NULL value -> NULL bin, never bin 0
    with_null = spark.createDataFrame(
        [(1, 5), (2, None), (3, 10)], "id int, v int"
    )
    got = {r["id"]: r["bin"] for r in
           quantile_bins(with_null, "v", 2, approximate=False).collect()}
    assert got[2] is None and got[1] == 0 and got[3] == 1

    # heavy ties collapse bins (mass on the cut): all-equal -> one bin
    ties = spark.createDataFrame([(i, 7) for i in range(40)], "id int, v int")
    bins = {r["bin"] for r in quantile_bins(ties, "v", 4, approximate=False).collect()}
    assert bins == {0}

    # per-group cuts: each group binned against its own distribution
    g = spark.createDataFrame(
        [("a", i) for i in range(20)] + [("b", 1000 + i) for i in range(20)],
        "k string, v int",
    )
    gb = quantile_bins(g, "v", 2, group_cols=["k"], approximate=False)
    per = {
        (r["k"], r["bin"]): r["n"]
        for r in gb.groupBy("k", "bin").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {("a", 0): 10, ("a", 1): 10, ("b", 0): 10, ("b", 1): 10}

    # approximate path: same shape, bins stay in range
    ap = quantile_bins(df, "v", 4, approximate=True)
    assert {r["bin"] for r in ap.collect()} <= {0, 1, 2, 3}


def test_classifier_pr_curve_hand_computed(spark):
    from udacity_data_engineering_capstone_project_spark.operators.textstats import (
        classifier_pr_curve,
    )

    # scores/labels chosen so every confusion cell is hand-checkable:
    # positives at 0.9, 0.6, 0.3; negatives at 0.8, 0.2; NULLs ignored
    rows = [
        (0.9, 1), (0.6, 1), (0.3, 1), (0.8, 0), (0.2, 0),
        (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {
        r["threshold"]: r
        for r in classifier_pr_curve(df, "score", "label", n_thresholds=10).collect()
    }
    assert len(out) == 11
    # t=0.0: everything predicted positive
    r0 = out[0.0]
    assert (r0["tp"], r0["fp"], r0["fn"]) == (3, 2, 0)
    assert r0["precision"] == 0.6 and r0["recall"] == 1.0
    # t=0.5: positives {0.9, 0.6}, negatives {0.8}
    r5 = out[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"]) == (2, 1, 1)
    assert r5["precision"] == round(2 / 3, 6) and r5["recall"] == round(2 / 3, 6)
    assert r5["f1"] == round(2 * 2 / (2 * 2 + 1 + 1), 6)
    # t=0.7: predicted {0.9, 0.8} -> tp=1 fp=1
    r7 = out[0.7]
    assert (r7["tp"], r7["fp"], r7["fn"]) == (1, 1, 2)
    # t=1.0: nothing clears it (scores < 1.0) -> precision undefined
    r10 = out[1.0]
    assert (r10["tp"], r10["fp"]) == (0, 0)
    assert r10["precision"] is None and r10["recall"] == 0.0 and r10["f1"] == 0.0
    # score exactly 1.0 clamps into the top bucket and survives t=1.0
    df2 = spark.createDataFrame([(1.0, 1), (0.0, 0)], "score double, label int")
    top = {
        r["threshold"]: r
        for r in classifier_pr_curve(df2, "score", "label", n_thresholds=4).collect()
    }
    assert top[1.0]["tp"] == 1 and top[1.0]["fp"] == 0
    assert top[0.0]["fp"] == 1


def test_calibration_bins_hand_computed(spark):
    from udacity_data_engineering_capstone_project_spark.operators.textstats import (
        calibration_bins,
    )

    rows = [
        # bucket 0 (scores < 0.5): 1 of 3 positive
        (0.1, 0), (0.2, 0), (0.3, 1),
        # bucket 1 (scores >= 0.5, incl. the 1.0 clamp): 2 of 3 positive
        (0.6, 1), (0.8, 0), (1.0, 1),
        # ignored
        (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r["bin"]: r for r in calibration_bins(df, "score", "label", 2).collect()}
    assert set(out) == {0, 1}
    b0, b1 = out[0], out[1]
    assert (b0["n"], b0["n_pos"], b0["frac_pos"]) == (3, 1, round(1 / 3, 6))
    assert b0["mean_score"] == round((0.1 + 0.2 + 0.3) / 3, 6)
    assert b0["bin_lo"] == 0.0
    assert (b1["n"], b1["n_pos"], b1["frac_pos"]) == (3, 2, round(2 / 3, 6))
    assert b1["mean_score"] == 0.8 and b1["bin_lo"] == 0.5


def test_expect_accepted_values_and_foreign_key(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        QualityError,
        expect_accepted_values,
        expect_foreign_key,
        run_expectations,
    )
    import pytest

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20), (3, "xx", 99), (4, None, 10)],
        "id int, lang string, dim_id int",
    )
    dim = spark.createDataFrame([(10,), (20,)], "dim_key int")

    # accepted_values: 'xx' offends; NULL passes
    with pytest.raises(QualityError, match="xx"):
        expect_accepted_values(df, "lang", ["en", "fr", "de"])
    expect_accepted_values(df.filter("id != 3"), "lang", ["en", "fr"])

    # foreign_key: 99 is an orphan; NULL FK passes
    with pytest.raises(QualityError, match="99"):
        expect_foreign_key(df, "dim_id", dim, "dim_key")
    expect_foreign_key(df.filter("id != 3"), "dim_id", dim, "dim_key")
    with_null_fk = spark.createDataFrame(
        [(1, None)], "id int, dim_id int"
    )
    expect_foreign_key(with_null_fk, "dim_id", dim, "dim_key")

    # both kinds ride the declarative battery
    ok, report = run_expectations(
        df,
        [
            ("accepted_values", "lang", ["en", "fr", "de"]),
            ("foreign_key", "dim_id", dim, "dim_key"),
            ("min_row_count", 1),
        ],
    )
    assert not ok
    got = {r["check"].split("(")[0]: r["passed"] for r in report.collect()}
    assert got == {
        "accepted_values": False,
        "foreign_key": False,
        "min_row_count": True,
    }


def test_diagnose_skew_delegates_to_key_skew_report(spark):
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        diagnose_skew,
    )

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    out = diagnose_skew(df, ["k"], top=2).collect()
    assert [(r["k"], r["n_rows"], r["row_share"]) for r in out] == [
        ("a", 6, 0.6),
        ("b", 3, 0.3),
    ]
