"""Shared corpus-replication bijections for the scale probes.

Replication must create REAL growth, not duplicate blowup: each copy
applies a per-copy bijection that preserves similarity structure
WITHIN the copy and destroys it ACROSS copies, so a 10x/100x input
behaves like 10/100 independent crawls of equal dup density (see
scale_probe_dedup.py header for the full rationale).
"""

from __future__ import annotations

import random
import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOWER = string.ascii_lowercase


def doc_copies(df: DataFrame, copies: int, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """`copies` unions of df, each under a per-copy random letter
    permutation (char-shingle sets map bijectively -> within-copy
    Jaccard preserved, cross-copy decorrelated) and a disjoint id
    range."""
    parts = []
    for i in range(copies):
        perm = list(_LOWER)
        random.Random(i).shuffle(perm)
        perm = "".join(perm)
        parts.append(
            df.select(
                (F.col(id_col) + F.lit(i * 10_000_000)).alias(id_col),
                F.translate(
                    F.col(text_col), _LOWER + _LOWER.upper(), perm + perm.upper()
                ).alias(text_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def vec_copies(df: DataFrame, copies: int, dim: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """`copies` unions of df, each under a per-copy random component
    permutation (inner products are permutation-invariant within a
    copy; cross-copy alignment decorrelates)."""
    parts = []
    for i in range(copies):
        perm = list(range(dim))
        random.Random(i).shuffle(perm)
        parts.append(
            df.select(
                (F.col(id_col) + F.lit(i * 10_000_000)).alias(id_col),
                F.array(*[F.col(vec_col)[j] for j in perm]).alias(vec_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
