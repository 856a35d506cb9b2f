"""Data-quality checks (reference: Q1-Q3, SURVEY.md §2.10).

Covers `recordCount`/`checkNumberOfRows` (`etl.py:74-86`) and the
distinct-cardinality check (`etl.py:353-360`), plus the schema assertion
the reference's write-up wished for (Capstone_Project.ipynb cell 44).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QualityError(ValueError):
    """Raised when a data-quality expectation fails (reference raises
    bare ValueError, `etl.py:86`)."""


def expect_row_count(df: DataFrame, expected: int, name: str = "dataframe") -> int:
    actual = df.count()
    if actual != expected:
        raise QualityError(
            f"{name}: expected {expected} rows, found {actual}"
        )
    return actual


def expect_distinct_count(
    df: DataFrame, column: str, expected: int, name: str = "dataframe"
) -> int:
    actual = df.select(F.countDistinct(F.col(column)).alias("n")).collect()[0]["n"]
    if actual != expected:
        raise QualityError(
            f"{name}.{column}: expected {expected} distinct values, found {actual}"
        )
    return actual


def expect_schema(df: DataFrame, expected_fields: Sequence[tuple[str, str]], name: str = "dataframe") -> None:
    """Assert (column, spark-type-simpleString) pairs, order-sensitive."""
    actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if list(expected_fields) != actual:
        raise QualityError(f"{name}: schema mismatch\n expected={list(expected_fields)}\n actual={actual}")


def expect_non_null(df: DataFrame, columns: Sequence[str], name: str = "dataframe") -> None:
    """Assert no nulls in the given columns — one aggregate pass."""
    aggs = [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c) for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {c: row[c] for c in columns if row[c]}
    if bad:
        raise QualityError(f"{name}: null values found: {bad}")
