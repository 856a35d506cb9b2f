"""Parquet layout introspection — the planning half of lake
maintenance (`sinks.compact_parquet` is the acting half).

At 100 TB the scan cost of a table is set by its FILE/ROW-GROUP
layout, not its logical size: thousands of KB-scale files pay
per-file open+footer overhead, row groups far under
`spark.sql.files.maxPartitionBytes` read as underfilled tasks, and
row groups far over it split poorly. This module reads ONLY parquet
footers (never data pages) — distributed, one footer per task batch —
and reports the physical layout so compaction/sizing decisions are
measured, not guessed.

Filesystem seam: footer reads go through pyarrow, so local paths work
as-is and object stores work wherever a pyarrow filesystem can be
constructed from the path (s3://, hdfs:// with the pyarrow HDFS
driver). The file LISTING goes through the Hadoop FS API (same as
`compact_parquet`), so listing works anywhere Spark itself can read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_LAYOUT_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("file_bytes", LongType()),
        StructField("row_group", LongType()),
        StructField("n_rows", LongType()),
        StructField("compressed_bytes", LongType()),
        StructField("uncompressed_bytes", LongType()),
        StructField("n_columns", LongType()),
    ]
)


def _list_files(spark: SparkSession, path: str, suffix: str) -> list[tuple[str, int]]:
    """(path, size) for every regular file under ``path`` ending in
    ``suffix``, via the Hadoop FS (recursive; works on any FS Spark
    can read). The listing is driver-side but file-COUNT-sized — a
    table with millions of files lists in seconds and the result is
    immediately parallelized."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    root = fs.makeQualified(p).toString().rstrip("/") + "/"
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath().toString()
        if not fp.endswith(suffix):
            continue
        # skip hidden/uncommitted paths (the Hadoop convention all
        # Spark readers follow): a '_temporary' staging dir mid-write
        # or a '.part-....crc' would otherwise fail the footer read or
        # double-count uncommitted data (r9 self-review)
        rel = fp[len(root):] if fp.startswith(root) else fp
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")):
            continue
        out.append((fp, int(st.getLen())))
    return out


def _pyarrow_path(fp: str) -> str:
    """Translate a Hadoop URI into what pyarrow's filesystem
    resolution accepts: strip the local 'file:' scheme, map the
    Hadoop S3 connector schemes (s3a/s3n) onto pyarrow's 's3'.
    Other schemes pass through — hdfs:// resolves wherever the
    pyarrow HDFS driver is present (the documented seam)."""
    if fp.startswith("file:"):
        return fp[len("file:"):]
    for hadoop_scheme in ("s3a://", "s3n://"):
        if fp.startswith(hadoop_scheme):
            return "s3://" + fp[len(hadoop_scheme):]
    return fp


def parquet_layout(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> DataFrame:
    """One row PER ROW GROUP of every parquet file under ``path``:
    (file, file_bytes, row_group, n_rows, compressed_bytes,
    uncompressed_bytes, n_columns). Footer-only reads (pyarrow
    ParquetFile.metadata), distributed over the executors with one
    Arrow batch of paths per task — the whole job moves kilobytes per
    file regardless of table size."""
    files = _list_files(spark, path, suffix)
    if not files:
        return spark.createDataFrame([], _LAYOUT_SCHEMA)

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for fp, fbytes in zip(pdf["file"], pdf["file_bytes"]):
                md = pq.ParquetFile(_pyarrow_path(fp)).metadata
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    compressed = sum(
                        rg.column(c).total_compressed_size
                        for c in range(rg.num_columns)
                    )
                    rows.append(
                        (
                            fp,
                            int(fbytes),
                            i,
                            rg.num_rows,
                            compressed,
                            rg.total_byte_size,  # uncompressed
                            rg.num_columns,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _LAYOUT_SCHEMA.fields]
            )

    paths = spark.createDataFrame(files, "file string, file_bytes long")
    # one partition per ~64 files: footer reads are ms-scale, so tiny
    # tasks would be scheduler-bound; huge ones straggle
    n_part = max(1, min(len(files) // 64 + 1, spark.sparkContext.defaultParallelism))
    return paths.repartition(n_part).mapInPandas(read_footers, _LAYOUT_SCHEMA)


def parquet_layout_summary(
    layout: DataFrame,
    small_file_bytes: int = 32 * 1024 * 1024,
    target_rg_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Collapse a `parquet_layout` frame into the one-row health
    report a maintenance job alerts on: file/row-group counts and
    sizes, how many files are small-file-problem sized, and the
    compression ratio. ``n_small_files`` > ~half the table is the
    standing signal to run `sinks.compact_parquet` (whose
    target_file_bytes should be ``target_rg_bytes``-aligned)."""
    per_file = layout.groupBy("file", "file_bytes").agg(
        F.count(F.lit(1)).alias("__rgs"),
        F.sum("n_rows").alias("__rows"),
    )
    files = per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("__rows").alias("n_rows"),
        F.sum("__rgs").alias("n_row_groups"),
        F.sum("file_bytes").alias("total_bytes"),
        F.sum(
            (F.col("file_bytes") < small_file_bytes).cast("long")
        ).alias("n_small_files"),
    )
    groups = layout.agg(
        F.avg("uncompressed_bytes").alias("avg_rg_bytes"),
        F.max("uncompressed_bytes").alias("max_rg_bytes"),
        F.sum(
            (F.col("uncompressed_bytes") > target_rg_bytes).cast("long")
        ).alias("n_oversized_row_groups"),
        (
            F.sum("compressed_bytes") / F.sum("uncompressed_bytes")
        ).alias("compression_ratio"),
    )
    return files.crossJoin(groups)
