"""Cleaning operators (reference: P5-P10, SURVEY.md §2.2).

Each wraps a one-expression DataFrame idiom as a named, parameterized,
testable operator. All stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_domain(
    df: DataFrame,
    column: str,
    valid_values: Sequence[str],
    other: str = "other",
    output_column: str | None = None,
) -> DataFrame:
    """Map values outside ``valid_values`` (and nulls) to ``other``.

    Reference semantics (`etl.py:108-109,159-160`):
    `when(~col.isin(valid), other).otherwise(col)` followed by
    `fillna(other)` — nulls fall through the `when` (null condition ->
    otherwise branch) and are caught by the fill.
    """
    out = output_column or column
    c = F.col(column)
    normalized = F.when(~c.isin(list(valid_values)), F.lit(other)).otherwise(c)
    return df.withColumn(out, normalized).fillna(other, subset=[out])


def fill_nulls(df: DataFrame, value, subset: Sequence[str] | None = None) -> DataFrame:
    """Null fill per column subset (reference `etl.py:109-110,160`)."""
    return df.fillna(value, subset=list(subset) if subset else None)


def drop_nulls(df: DataFrame, subset: Sequence[str] | None = None, how: str = "any") -> DataFrame:
    """Drop rows with nulls (reference `etl.py:137` uses bare dropna())."""
    return df.dropna(how=how, subset=list(subset) if subset else None)


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Cast columns by name -> Spark type string (reference casts CSV
    strings to double, `etl.py:135-136,156-157`)."""
    return df.withColumns({name: F.col(name).cast(t) for name, t in casts.items()})
