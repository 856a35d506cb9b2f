"""Sinks (reference: S4, SURVEY.md §2.1).

The reference writes unpartitioned parquet (`etl.py:30-39` — no
`partitionBy` anywhere, flagged in its own write-up as the thing to fix
for 100x scale). Here partitioned + bucketed writes are first-class:
at 100 TB, partition pruning on a date/month column is the difference
between scanning a day and scanning the lake.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    compression: str = "snappy",
) -> None:
    """Write parquet with optional hive-style partitioning."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    writer = df.write.mode(mode).option("header", "true" if header else "false")
    writer.csv(path)


def materialize(df: DataFrame, path: str, format: str = "parquet") -> DataFrame:
    """Checkpoint a DataFrame: write + read back, truncating lineage.

    The reference recomputes lineage on every action (counts during
    read, write, and quality checks each re-trigger the DAG,
    SURVEY.md §3); materializing before multi-action use pays the scan
    once. Prefer this over .persist() when the result must survive the
    session or exceed cluster memory."""
    df.write.mode("overwrite").format(format).save(path)
    return df.sparkSession.read.format(format).load(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    num_files: int | None = None,
) -> None:
    """Cluster data files by ``cluster_cols`` before writing (a
    Z-order-style layout without an engine extension): range-partition
    on the cluster keys, sort within each partition, write one tight
    file per range. Each parquet file then covers a narrow min/max
    band of the cluster columns, so predicate pushdown on them skips
    whole files/row-groups instead of scanning the lake — the
    read-side complement to hive partitioning (use partitioning for
    the coarse column, clustering for the fine ones).

    ``num_files`` pins the range-partition count (otherwise
    shuffle.partitions/AQE decide — size so each file lands near the
    row-group sweet spot, ~128 MB).
    """
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in cluster_cols]
    parted = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    out = parted.sortWithinPartitions(*cluster_cols)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table: co-locates join keys so repeated
    large-large joins on ``bucket_cols`` skip the shuffle entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
