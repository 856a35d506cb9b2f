"""Text primitives for the training-data pipeline operators.

All JVM-side (higher-order array functions, no Python UDFs): shingling
and tokenization feed dedup/similarity/text-stats and must survive
100 TB corpora — per-row Python would be the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: GPT-2-ish pre-tokenizer approximation: word pieces, numbers, or a
#: single non-space symbol.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(col: Column | str) -> Column:
    """Lowercase + strip all non-alphanumeric chars — canonical form for
    exact-dup fingerprinting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), r"[^a-z0-9]", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def char_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct character k-grams of lowercased text -> array<string>.

    Pure JVM: sequence + transform + array_distinct (no explode needed
    at the call site; callers explode when they want rows).
    """
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    n = F.length(low) - F.lit(k - 1)
    # sequence(1, 0) counts DOWN in Spark — guard short strings to an
    # explicit empty array instead.
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: low.substr(i, F.lit(k))))
