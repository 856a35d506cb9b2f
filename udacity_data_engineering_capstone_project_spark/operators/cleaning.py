"""Cleaning operators (reference: P5-P10, SURVEY.md §2.2).

Each wraps a one-expression DataFrame idiom as a named, parameterized,
testable operator. All stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def normalize_unicode(
    df: DataFrame,
    column: str,
    form: str = "NFKC",
    strip_control: bool = True,
    collapse_whitespace: bool = False,
    output_column: str | None = None,
) -> DataFrame:
    """Unicode-normalize a text column — the canonicalization step every
    crawl-scale dedup/tokenize stage wants upstream (NFKC folds
    fullwidth forms, ligatures and compatibility glyphs so fingerprints
    and n-grams agree across encoders).

    Spark SQL has no unicode-normalization builtin, so the normalize
    itself is the justified Python case: ONE Arrow-batched pandas UDF
    calling the C-accelerated ``str.normalize`` per batch (never
    per-row Python). Control-char stripping and whitespace collapsing
    are plain regexes and stay JVM-side around it, keeping the Python
    surface minimal. Nulls pass through as nulls.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown unicode normalization form: {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    out = output_column or column
    c: F.Column = _norm(F.col(column))
    if strip_control:
        # C0/C1 controls except \t \n \r, plus zero-width chars and BOM
        c = F.regexp_replace(
            c,
            "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f"
            "\N{ZERO WIDTH SPACE}-\N{ZERO WIDTH JOINER}\N{ZERO WIDTH NO-BREAK SPACE}]",
            "",
        )
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out, c)
