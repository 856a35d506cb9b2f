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
    rel = con.sql(sql)
    df = rel.df()
    # DuckDB's OWN column types ride along for the dtype-kind gate:
    # pandas collapses DATE and TIMESTAMP into datetime64 (and HUGEINT
    # / DECIMAL into float64), but the driver hashes the arrow types —
    # the declared types let the gate distinguish what pandas cannot.
    df.attrs["duckdb_types"] = {
        c: str(t).upper() for c, t in zip(rel.columns, rel.types)
    }
    return df


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


#: DuckDB declared type -> gate kind. Types pandas collapses are
#: mapped to what the DRIVER would hash: HUGEINT/DECIMAL land as
#: float64 in the hash (the pr_curve_q failure class), DATE stays a
#: date (not a timestamp).
_DUCKDB_KINDS = {
    "BOOLEAN": "bool",
    "TINYINT": "integer", "SMALLINT": "integer", "INTEGER": "integer",
    "BIGINT": "integer", "UTINYINT": "integer", "USMALLINT": "integer",
    "UINTEGER": "integer", "UBIGINT": "integer",
    "HUGEINT": "float", "FLOAT": "float", "DOUBLE": "float",
    "DATE": "date",
    "VARCHAR": "object",
}


def _duckdb_kind(decl: str) -> str:
    if decl in _DUCKDB_KINDS:
        return _DUCKDB_KINDS[decl]
    if decl.startswith("DECIMAL"):
        return "float"
    if decl.startswith("TIMESTAMP"):
        return "timestamp"
    return "object"


def _dtype_kind(series: pd.Series) -> str:
    """Coarse dtype kind for driver-faithful comparison. The real driver
    hashes values WITH their arrow types, so an int64 Spark column vs a
    float64 oracle column (e.g. an uncast DuckDB HUGEINT window sum)
    hash-mismatches even when every value is equal — the r7 pr_curve_q
    failure. Kinds, not exact dtypes: int32 vs int64 is fine (the driver
    upcasts), integer vs floating is not."""
    if pd.api.types.is_datetime64_any_dtype(series):
        return "timestamp"
    if pd.api.types.is_bool_dtype(series):
        return "bool"
    if pd.api.types.is_integer_dtype(series):
        return "integer"
    if pd.api.types.is_float_dtype(series):
        return "float"
    # Spark DATE columns land in pandas as object dtype holding
    # datetime.date values (TIMESTAMP lands as datetime64 or object of
    # datetime.datetime); classify by the python value so date-vs-
    # timestamp divergence is visible (review finding r8). An all-null
    # object column is UNKNOWABLE, not 'object' — a false kind there
    # failed value-equal frames (review finding r8).
    import datetime as _dt

    nonnull = series.dropna()
    if len(nonnull) == 0:
        return "unknown"
    head = list(nonnull.head(100))
    if all(isinstance(v, _dt.datetime) for v in head):
        return "timestamp"
    if all(isinstance(v, _dt.date) for v in head):
        return "date"
    return "object"


def assert_dtype_kinds(
    spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str
) -> None:
    """Fail when any shared column's dtype KIND (integer/float/bool/
    datetime/object) diverges between the Spark result and the oracle
    result. This is what makes the local gate faithful to the driver's
    type-sensitive value hash (VERDICT r7 'What's wrong' #2)."""
    decl = oracle_df.attrs.get("duckdb_types", {})
    mismatches = []
    for c in sorted(spark_df.columns):
        sk = _dtype_kind(spark_df[c])
        # the oracle's DECLARED DuckDB type beats its pandas dtype:
        # pandas collapses DATE/TIMESTAMP into datetime64 and
        # HUGEINT/DECIMAL into float64 (review finding r8)
        ok = _duckdb_kind(decl[c]) if c in decl else _dtype_kind(oracle_df[c])
        if "unknown" in (sk, ok):
            continue  # all-null column: kind unknowable, values decide
        if sk == "float" and ok == "integer":
            # Spark nullable INT columns land in pandas as float64 with
            # NaN (a toPandas artifact — arrow-side they stay integer,
            # and these rows are driver hash-GREEN: asof_last_click,
            # scd2_history valid_to, ...). Exempt ONLY when nulls are
            # actually present and every non-null value is integral; a
            # genuinely-float Spark column with no nulls (the pr_curve
            # class, reversed) still flags.
            col = spark_df[c]
            if col.isna().any() and (col.dropna() % 1 == 0).all():
                continue
        if sk != ok:
            mismatches.append(
                f"{c}: spark {spark_df[c].dtype}({sk}) vs "
                f"oracle {decl.get(c, oracle_df[c].dtype)}({ok})"
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
