"""Surrogate-key generation (reference: F8, SURVEY.md §2.3, §4 item 3).

The reference uses `monotonically_increasing_id` everywhere
(`etl.py:114,217,230,240,249,259,269`) — partition-encoded,
non-contiguous, and **non-deterministic across runs/partitionings**,
which makes results impossible to hash-check. We support three modes:

- ``monotonic``: reference parity; zero-shuffle, ids encode partition.
- ``row_number``: contiguous deterministic ids over an explicit order.
  NOTE: a global row_number over one window is a single-partition sort
  — fine for dimension tables (small), wrong for 100 TB facts. For a
  fact-scale deterministic id prefer ``hash``.
- ``hash``: xxhash64 of the natural key — deterministic, shuffle-free,
  scales to any size; collisions ~ birthday bound on 64 bits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    key_name: str,
    mode: str = "hash",
    order_by: Sequence[str] | None = None,
    natural_key: Sequence[str] | None = None,
) -> DataFrame:
    if mode == "monotonic":
        return df.withColumn(key_name, F.monotonically_increasing_id())
    if mode == "row_number":
        cols = list(order_by or df.columns)
        w = Window.orderBy(*[F.col(c) for c in cols])
        return df.withColumn(key_name, F.row_number().over(w).cast("long"))
    if mode == "hash":
        cols = list(natural_key or df.columns)
        return df.withColumn(key_name, F.xxhash64(*[F.col(c) for c in cols]))
    raise ValueError(f"unknown surrogate key mode: {mode!r}")
