"""The correctness gate, locally: every registered query vs its DuckDB
oracle at sf0.001 (the driver repeats this at sf0.01)."""

from __future__ import annotations

import pytest

from udacity_data_engineering_capstone_project_spark.plans.queries import REGISTRY
from tests.oracle_utils import compare_frames, run_oracle

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
_UNREGISTERED = {
    "top1_per_group": "TOP1_PER_GROUP_ORACLE",
    "streaming_hourly": "STREAMING_HOURLY_ORACLE",
    "hashed_classifier": "HASHED_CLASSIFIER_ORACLE",
    "weighted_sample": "WEIGHTED_SAMPLE_ORACLE",
    "merge_upsert_q": "MERGE_UPSERT_ORACLE",
    "range_join_q": "RANGE_JOIN_ORACLE",
    "resample_q": "RESAMPLE_ORACLE",
    "category_drift_q": "CATEGORY_DRIFT_ORACLE",
    "numeric_drift_q": "NUMERIC_DRIFT_ORACLE",
}


@pytest.mark.parametrize("name", sorted(_UNREGISTERED))
def test_unregistered_query_parity(spark, sf_dir, name):
    from udacity_data_engineering_capstone_project_spark.plans import queries as q

    spark_df = getattr(q, name)(spark, sf_dir).toPandas()
    oracle_df = run_oracle(getattr(q, _UNREGISTERED[name]), sf_dir)
    compare_frames(spark_df, oracle_df, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
