"""Distributed Bloom filter as a block-packed bitmap DataFrame.

Spark's built-in `df.stat.bloomFilter` materializes the whole bit
array on the DRIVER and ships it as one monolithic object — fine at
megabytes, impossible when the membership set is billions of keys
(10^10 keys at 1% FP is an ~11 GiB array). This representation keeps
the filter DISTRIBUTED end to end: the filter is a DataFrame of
(block, mask) rows — 64 bits packed per row — built with one
groupBy + bit_or, stored as plain parquet, merged by bit_or again,
and probed with an equi-join on block. Every step shuffles at most
``num_bits / 64`` rows; no driver-side state, no broadcast of the
whole filter (AQE may still choose broadcast when the filter is
genuinely small — the right call, not a requirement).

Guarantees match a textbook Bloom filter (Bloom 1970): NO false
negatives ever — membership screening checks every one of the k hash
positions — and a false-positive rate of ~(1 - e^{-kn/m})^k, so a
"definitely new" verdict is trustworthy while "maybe seen" needs the
exact check. The intended production shape for incremental dedup at
100 TB: keep a Bloom of every fingerprint ever admitted next to the
full dedup index; each daily batch screens against the Bloom first
(tiny join) and only the surviving "maybe seen" sliver pays the full
index join (`dedup_against_index`).

All k probe hashes are xxhash64(key, seed) — computed JVM-side, no
Python in any path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_num_bits(expected_keys: int, fp_rate: float) -> int:
    """Textbook sizing: m = -n*ln(p)/ln(2)^2, rounded up to a multiple
    of 64 (whole blocks)."""
    if expected_keys <= 0:
        raise ValueError(f"expected_keys must be positive, got {expected_keys}")
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    m = math.ceil(-expected_keys * math.log(fp_rate) / (math.log(2) ** 2))
    return ((m + 63) // 64) * 64


def optimal_num_hashes(num_bits: int, expected_keys: int) -> int:
    """k = (m/n)*ln(2), at least 1."""
    return max(1, round(num_bits / expected_keys * math.log(2)))


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of the k bit positions for a key: pmod(xxhash64(key, i), m).
    NULL keys hash like any other value (xxhash64 of NULL is defined),
    so a NULL inserted once is found later — same contract as a map."""
    return F.array(
        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)]
    )


def _probe_rows(
    df: DataFrame, key_col: str, num_bits: int, num_hashes: int
) -> DataFrame:
    """(key, block, offset) rows — one per (distinct key, hash)."""
    return (
        df.select(key_col)
        .distinct()
        .select(
            F.col(key_col),
            F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__bit"),
        )
        .select(
            key_col,
            (F.col("__bit") / 64).cast("long").alias("block"),
            (F.col("__bit") % 64).cast("int").alias("__off"),
        )
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Build the filter: one explode + one groupBy(block) bit_or.
    At most ``num_bits/64`` output rows regardless of key count —
    write them as parquet next to the data they summarize, together
    with (num_bits, num_hashes): probing with different parameters is
    silently wrong, so persist them like any sketch parameter.

    Output: (block long, mask long).
    """
    if num_bits < 64 or num_bits % 64:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    return (
        _probe_rows(df, key_col, num_bits, num_hashes)
        .groupBy("block")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), __off))").alias("mask")
        )
    )


def merge_blooms(*blooms: DataFrame) -> DataFrame:
    """bit_or same-shaped filters together (e.g. per-day filters rolled
    into the all-time filter). Exact: merge(build(A), build(B)) equals
    build(A union B) row-for-row."""
    if not blooms:
        raise ValueError("no blooms to merge")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("block").agg(F.expr("bit_or(mask)").alias("mask"))


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Annotate each input row with ``maybe_seen``: true iff ALL k of
    the key's bits are set. The probe joins (distinct-key, hash) rows
    against the block rows — the only shuffle is on the uniform block
    key, bounded by min(k * distinct keys, num_bits/64) rows per side.

    ``maybe_seen = false`` is definitive (no false negatives);
    ``true`` is probabilistic (FP rate per the filter's sizing).
    """
    probes = _probe_rows(df, key_col, num_bits, num_hashes)
    # python-side F.shiftright takes only literal shifts; the SQL form
    # accepts a column offset
    hit = (F.expr("shiftright(mask, __off) & 1") == 1).cast("int")
    flags = (
        probes.join(bloom, on="block", how="left")
        .select(key_col, F.coalesce(hit, F.lit(0)).alias("__hit"))
        .groupBy(key_col)
        .agg((F.sum("__hit") == F.lit(num_hashes)).alias("maybe_seen"))
        .withColumnRenamed(key_col, "__bloom_key")
    )
    # null-safe re-attach: a NULL key was hashed and screened like any
    # value, so its verdict must come back too
    return (
        df.join(flags, on=F.col(key_col).eqNullSafe(F.col("__bloom_key")), how="left")
        .drop("__bloom_key")
        .withColumn("maybe_seen", F.coalesce(F.col("maybe_seen"), F.lit(False)))
    )


def bloom_screen_new(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep only the rows whose key is DEFINITELY absent from the
    filter — the cheap pre-screen in front of an exact index join.
    Because Bloom filters have no false negatives, nothing this
    returns can be a duplicate of an inserted key; what it drops is
    'maybe seen' and should go through the exact path if dropping
    novel rows matters (FP-rate fraction of genuinely-new rows)."""
    return (
        bloom_might_contain(df, bloom, key_col, num_bits, num_hashes)
        .filter(~F.col("maybe_seen"))
        .drop("maybe_seen")
    )
