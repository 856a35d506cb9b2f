"""Deterministic sampling & data-mixing operators (north-star extension).

A 100 TB curation pipeline can't use `df.sample()` for anything it needs
to reproduce or audit: RNG sampling changes membership across retries,
partitions and Spark versions. These operators derive membership from a
content hash, so a row's fate is a pure function of its key — stable
across runs, engines (md5 is md5 in DuckDB too) and cluster layouts,
and the sample composes with incremental ingestion (new rows don't
reshuffle old decisions).

No reference counterpart (the reference has no sampling surface); the
semantics follow the standard hash-mod sampling used by web-scale corpus
pipelines.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, digits: int = 4) -> Column:
    """Deterministic sampling bucket: the first `digits` hex chars of
    md5(key as string). Lowercase-hex strings compare lexicographically
    exactly as their numeric value, so `bucket < ' 8000'`-style
    thresholds ARE numeric thresholds — no hex parsing needed, and the
    same expression runs verbatim in any engine with md5().
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, digits)


def _threshold_hex(rate: float, digits: int = 4) -> str:
    """Exclusive upper bound in hex for a keep-rate in [0, 1]."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(round(rate * (16 ** digits))), f"0{digits}x")


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    digits: int = 4,
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose hash bucket falls
    below the rate threshold. Resolution is 16**-digits (default 1/65536).
    Pure filter — pushes down, no shuffle, reproducible anywhere.
    """
    return df.filter(hash_bucket(key_col, digits) < F.lit(_threshold_hex(rate, digits)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    digits: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source mixing
    step of corpus curation ("keep 50% of en, 25% of de, all the rest").

    The per-stratum threshold is a CASE over `stratum_col`; membership
    stays a pure row-local predicate (no shuffle, no RNG, no join).
    """
    thr: Column = F.lit(_threshold_hex(default_rate, digits))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_threshold_hex(rate, digits))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, digits) < thr)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    quota: int,
) -> DataFrame:
    """Per-group quota: keep the top `quota` rows of each group under a
    deterministic ordering (the per-source cap / data-mixing step that
    stops one domain from dominating a training mix).

    One shuffle on the group key; rank + filter. Callers MUST include a
    tiebreaker in `order_cols` or membership is nondeterministic.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
