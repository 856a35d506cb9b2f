"""The correctness gate, locally: every registered query vs its DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from udacity_data_engineering_capstone_project_spark.plans.queries import (
    REGISTRY,
    UNREGISTERED,
)
from tests.oracle_utils import compare_frames, run_oracle


def test_gate_catches_dtype_kind_divergence():
    """Regression test for the GATE itself (VERDICT r7 #2): equal VALUES
    with diverging dtype kinds (int64 vs float64 — e.g. an uncast DuckDB
    HUGEINT window sum) must fail locally, because the driver's value
    hash is type-sensitive. Before r8 the gate normalized this away and
    pr_curve_q shipped hash-red."""
    import pandas as pd

    s = pd.DataFrame({"a": pd.Series([1, 2, 3], dtype="int64")})
    o = pd.DataFrame({"a": pd.Series([1.0, 2.0, 3.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare_frames(s, o, "gate_regression")
    # and identical kinds still pass
    compare_frames(s, s.copy(), "gate_regression_ok")

    # declared-type override (r8 review): a DuckDB DATE oracle column
    # arrives as datetime64 locally, but a Spark TIMESTAMP against it
    # must flag — the driver hashes arrow date32 vs timestamp apart
    import datetime as dt

    ts = pd.Timestamp("2020-01-01")
    s_ts = pd.DataFrame({"d": pd.Series([ts, ts])})  # datetime64
    o_date = pd.DataFrame({"d": pd.Series([ts, ts])})
    o_date.attrs["duckdb_types"] = {"d": "DATE"}
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare_frames(s_ts, o_date, "gate_date_vs_timestamp")
    # Spark DATE (object of datetime.date) vs declared DATE: fine
    s_date = pd.DataFrame(
        {"d": pd.Series([dt.date(2020, 1, 1), dt.date(2020, 1, 1)])}
    )
    compare_frames(s_date, o_date, "gate_date_ok")

    # declared HUGEINT (lands float64 locally) vs Spark int64: flags
    o_huge = pd.DataFrame({"a": pd.Series([1.0, 2.0, 3.0])})
    o_huge.attrs["duckdb_types"] = {"a": "HUGEINT"}
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare_frames(s, o_huge, "gate_hugeint")

    # Spark NULLABLE int (float64 + NaN locally, arrow-side integer —
    # driver-green shape) vs declared BIGINT: exempt; without NaN the
    # same float column still flags
    import numpy as np

    o_big = pd.DataFrame({"a": pd.Series([1.0, np.nan, 3.0])})
    s_nullable = pd.DataFrame({"a": pd.Series([1.0, np.nan, 3.0])})
    o_big2 = pd.DataFrame({"a": pd.Series([1, 2, 3], dtype="int64")})
    o_big2_declared = o_big2.copy()
    o_big2_declared.attrs["duckdb_types"] = {"a": "BIGINT"}
    compare_frames(s_nullable, _with_decl(o_big, "BIGINT"), "gate_nullable_int")
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare_frames(
            pd.DataFrame({"a": pd.Series([1.5, 2.0, 3.0])}),
            o_big2_declared,
            "gate_true_float",
        )

    # all-null object column: kind unknowable, values decide (no flag)
    s_null = pd.DataFrame({"d": pd.Series([None, None], dtype="object")})
    compare_frames(s_null, _with_decl(
        pd.DataFrame({"d": pd.Series([pd.NaT, pd.NaT])}), "DATE"
    ), "gate_all_null")


def _with_decl(df, decl):
    df.attrs["duckdb_types"] = {c: decl for c in df.columns}
    return df

ORACLE_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    spark_df = spec.fn(spark, sf_dir).toPandas()
    oracle_df = run_oracle(spec.oracle, sf_dir)
    compare_frames(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs_deterministically(spark, sf_dir, name):
    spec = REGISTRY[name]
    a = spec.fn(spark, sf_dir)
    n1 = a.count()
    n2 = spec.fn(spark, sf_dir).count()
    assert n1 == n2, f"{name}: nondeterministic row count {n1} != {n2}"


# Queries that ceded their registry slot (driver window capped at 50)
# keep full hash parity here so the semantics never regress silently.
# The UNREGISTERED registry carries (fn, oracle) specs exactly like
# REGISTRY; slots rotate between rounds.
@pytest.mark.parametrize(
    "name", sorted(n for n, s in UNREGISTERED.items() if s.oracle)
)
def test_unregistered_query_parity(spark, sf_dir, name):
    spec = UNREGISTERED[name]
    spark_df = spec.fn(spark, sf_dir).toPandas()
    oracle_df = run_oracle(spec.oracle, sf_dir)
    compare_frames(spark_df, oracle_df, name)


@pytest.mark.parametrize(
    "name", sorted(n for n, s in UNREGISTERED.items() if not s.oracle)
)
def test_unregistered_rows_only_query_deterministic(spark, sf_dir, name):
    spec = UNREGISTERED[name]
    assert spec.fn(spark, sf_dir).count() == spec.fn(spark, sf_dir).count()


# Scale-adaptive queries re-check parity at sf0.1 (10x the driver's
# grading scale): parameters derived from corpus size (pq_ann_q's
# rerank pool, quantile cuts, drift dims) can hold at sf0.01 and
# break at sf0.1 — this sweep caught exactly that in r8 (a 6%-of-
# corpus rerank pool missed engine-ADC rank 357 of 2000). Keep the
# list curated: only queries whose behavior ADAPTS to corpus size.
@pytest.mark.parametrize(
    "name",
    [
        "pq_ann_q", "quality_bins_q", "embedding_drift_q", "skew_report_q",
        # exact/approx percentile auto-gate (1 GiB threshold — far above
        # these scales, pinned so a retuned gate can't silently flip
        # the graded exact path to approx)
        "numeric_drift_q", "winsorize_q",
    ],
)
def test_scale_adaptive_query_parity_at_sf01(spark, name):
    spec = REGISTRY.get(name) or UNREGISTERED[name]
    sf = "/root/testdata/sf0.1"
    compare_frames(
        spec.fn(spark, sf).toPandas(), run_oracle(spec.oracle, sf), f"{name}@sf0.1"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))


@pytest.mark.parametrize(
    "name", ["date_parts_agg", "sas_date_decode", "asof_last_click"]
)
def test_time_queries_survive_hostile_session_timezone(spark, sf_dir, name):
    """A driver harness may run the engine under ANY session timezone
    (the verify probe that caught a real ntz-cast bug): time-based
    queries must still hash-match their oracles under Asia/Kolkata
    (UTC+5:30 — a half-hour offset catches instant<->ntz casts that
    whole-hour zones mask)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        # slots rotate between rounds — look in both registries
        spec = REGISTRY.get(name) or UNREGISTERED[name]
        compare_frames(
            spec.fn(spark, sf_dir).toPandas(),
            run_oracle(spec.oracle, sf_dir),
            f"{name}@Asia/Kolkata",
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_resample_survives_hostile_session_timezone(spark, sf_dir):
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        UNREGISTERED,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try:
        spec = REGISTRY.get("resample_q") or UNREGISTERED["resample_q"]
        compare_frames(
            spec.fn(spark, sf_dir).toPandas(),
            run_oracle(spec.oracle, sf_dir),
            "resample_q@Asia/Kolkata",
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
