"""Sequence packing (north-star extension: training batch construction).

Packing concatenates short sequences into fixed-size context windows so
a training run wastes no pad tokens. Exact global bin packing is
NP-hard and inherently sequential — the distributed shape is:

1. scatter items into independent buckets by a deterministic hash of
   the item id (buckets ~ parallelism; each bucket packs alone);
2. inside each bucket, greedy first-fit-decreasing over Arrow batches
   (`applyInPandas` — justified Python: a sequential recurrence);
3. pack ids are (bucket, local) pairs, so they are globally unique
   without any cross-bucket coordination.

First-fit-decreasing wastes at most ~22% vs optimal in the worst case
and is near-optimal on natural length distributions; each bucket's
packing is deterministic (sort by length desc, id asc), so the whole
assignment is reproducible run-to-run regardless of cluster layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    buckets: int = 64,
) -> DataFrame:
    """Assign every item to a pack such that each pack's total
    `len_col` <= budget. Items longer than the budget get a singleton
    pack (truncation is the caller's policy, not the packer's).

    Output: (id, pack_id, pack_offset) — pack_id globally unique,
    pack_offset = the item's starting token position inside its pack
    (items within a pack are laid out in assignment order).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_offset", LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([len_col, id_col], ascending=[False, True])
        bucket = int(pdf["__bucket"].iloc[0])
        packs: list[int] = []  # remaining capacity per local pack
        rows = []
        for rid, ln in zip(pdf[id_col], pdf[len_col]):
            ln = int(ln)
            take = min(ln, budget)
            for i, cap in enumerate(packs):
                if cap >= take:
                    rows.append((int(rid), i, budget - cap))
                    packs[i] = cap - take
                    break
            else:
                packs.append(budget - take)
                rows.append((int(rid), len(packs) - 1, 0))
        return pd.DataFrame(
            [
                (rid, bucket * 1_000_000_000 + local, off)
                for rid, local, off in rows
            ],
            columns=[id_col, "pack_id", "pack_offset"],
        )

    with_bucket = df.select(id_col, len_col).withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets))
    )
    return with_bucket.groupBy("__bucket").applyInPandas(_pack, out_schema)
