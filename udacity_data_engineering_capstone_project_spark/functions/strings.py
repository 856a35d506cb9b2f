"""String scalar functions (reference: F1-F4, SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference regex for pulling the numeric part out of '29.74N'-style
#: coordinate strings (`etl.py:135-136`). Kept verbatim (note: the `.`
#: is an unescaped any-char in the reference; we keep its semantics in
#: `extract_decimal_reference` and offer a strict variant).
REFERENCE_DECIMAL_PATTERN = r"\d+.\d+"
STRICT_DECIMAL_PATTERN = r"\d+\.\d+"


def extract_decimal(col: Column | str, strict: bool = True) -> Column:
    """Extract a decimal number substring and cast to double
    (reference `etl.py:135-136`)."""
    c = F.col(col) if isinstance(col, str) else col
    pat = STRICT_DECIMAL_PATTERN if strict else REFERENCE_DECIMAL_PATTERN
    return F.regexp_extract(c, pat, 0).cast("double")


def printf_round0(col: Column | str) -> Column:
    """printf('%.0f', x) — the reference's coordinate-coarsening trick
    (`etl.py:135-136,156-157`). The result is a STRING used as a join
    key; kept for byte-parity with the reference. For new code prefer
    a numeric bucket (`spatial_bucket`) — string keys defeat numeric
    join optimizations. Java's %.0f rounds HALF_UP."""
    c = F.col(col) if isinstance(col, str) else col
    return F.format_string("%.0f", c)


def spatial_bucket(col: Column | str) -> Column:
    """Numeric coarsening of a coordinate: floor(abs(x)) as int — the
    Catalyst-friendly replacement for `printf_round0` join keys
    (SURVEY.md §4 item 2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(F.abs(c)).cast("long")


def split_item(col: Column | str, sep: str, index: int) -> Column:
    """split + getItem (reference `etl.py:150-151,156-158`:
    'lon, lat' coordinates on ',', 'US-PA' regions on '-')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep).getItem(index)
