"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL over the same parquet tables, sort columns by
name + rows by value, and demand (near-bitwise) equality."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from udacity_data_engineering_capstone_project_spark.sources.readers import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _dtype_kind(series: pd.Series) -> str:
    """Coarse dtype kind for driver-faithful comparison. The real driver
    hashes values WITH their arrow types, so an int64 Spark column vs a
    float64 oracle column (e.g. an uncast DuckDB HUGEINT window sum)
    hash-mismatches even when every value is equal — the r7 pr_curve_q
    failure. Kinds, not exact dtypes: int32 vs int64 is fine (the driver
    upcasts), integer vs floating is not."""
    if pd.api.types.is_datetime64_any_dtype(series):
        return "datetime"
    if pd.api.types.is_bool_dtype(series):
        return "bool"
    if pd.api.types.is_integer_dtype(series):
        return "integer"
    if pd.api.types.is_float_dtype(series):
        return "float"
    # Spark DATE columns land in pandas as object dtype holding
    # datetime.date values while DuckDB DATE lands as datetime64[us];
    # the driver hashes both as arrow date — equivalent, not divergent
    # (sas_date_decode/scalar_function_sink/shipping_priority were all
    # driver hash-GREEN in r7 with exactly this local shape).
    import datetime as _dt

    nonnull = series.dropna()
    if len(nonnull) and all(
        isinstance(v, (_dt.date, _dt.datetime)) for v in nonnull.head(100)
    ):
        return "datetime"
    return "object"


def assert_dtype_kinds(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str
) -> None:
    """Fail when any shared column's dtype KIND (integer/float/bool/
    datetime/object) diverges between the Spark result and the oracle
    result. This is what makes the local gate faithful to the driver's
    type-sensitive value hash (VERDICT r7 'What's wrong' #2)."""
    mismatches = []
    for c in sorted(spark_df.columns):
        sk, ok = _dtype_kind(spark_df[c]), _dtype_kind(oracle_df[c])
        if sk != ok:
            mismatches.append(
                f"{c}: spark {spark_df[c].dtype}({sk}) vs "
                f"oracle {oracle_df[c].dtype}({ok})"
            )
    assert not mismatches, (
        f"{name}: dtype-kind divergence (driver would hash-mismatch even "
        f"on equal values — cast the oracle, e.g. CAST(sum(..) AS BIGINT) "
        f"for DuckDB HUGEINT window sums): " + "; ".join(mismatches)
    )


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"oracle={sorted(oracle_df.columns)}"
    )
    assert_dtype_kinds(spark_df, oracle_df, name)
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count spark={len(spark_df)} oracle={len(oracle_df)}"
    )
    s = _normalize(spark_df)
    o = _normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype("float64").to_numpy()
            oa = ov.astype("float64").to_numpy()
            both_nan = np.isnan(sa) & np.isnan(oa)
            eq = (sa == oa) | both_nan
            assert eq.all(), (
                f"{name}.{c}: float mismatch at rows {np.where(~eq)[0][:5]}: "
                f"spark={sa[~eq][:5]} oracle={oa[~eq][:5]}"
            )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            assert eq.all(), (
                f"{name}.{c}: mismatch at rows {np.where(~eq.to_numpy())[0][:5]}: "
                f"spark={sv[~eq][:5].tolist()} oracle={ov[~eq][:5].tolist()}"
            )
