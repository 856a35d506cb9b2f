"""Sources: parquet / CSV scans (reference: S1-S3, SURVEY.md §2.1).

Covers the reference's `readMultipleParquet` (`etl.py:49-59`) and
`readCsv` (`etl.py:61-72`) but fixes its acknowledged gap: CSV may be
read with a **declared StructType schema** instead of all-strings
(the write-up's "I'd more strictly enforce a schema",
Capstone_Project.ipynb cell 44).

Scale notes: scans stay declarative so Catalyst pushes filters and
prunes columns into the parquet reader; never `.count()` eagerly as the
reference does on every read (`etl.py:58,71` — a full extra pass each).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Tables in the driver testdata star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Read one or many parquet paths into a single DataFrame.

    Multi-path read is an implicit union-by-position of homogeneous parts
    (reference `etl.py:56`: monthly i94 files).
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.parquet(*paths)


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    header: bool = True,
    schema: StructType | None = None,
    infer_schema: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """Read CSV(s); all-string by default (reference parity, `etl.py:67`),
    or with a declared ``StructType`` / inference when asked.

    ``mode``: PERMISSIVE (nulls for malformed fields), DROPMALFORMED,
    or FAILFAST. With a declared schema, pass ``corrupt_column`` to
    capture raw malformed records in a side column instead of losing
    them — at 100 TB you quarantine bad rows, not crash on them.
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.option("header", "true" if header else "false").option(
        "mode", mode
    )
    if schema is not None:
        if corrupt_column is not None:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                list(schema.fields) + [StructField(corrupt_column, StringType())]
            )
            reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(list(paths))


def read_json(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType | None = None,
    multiline: bool = False,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """Read JSON-lines file(s) (or whole-file documents with
    ``multiline=True``).

    A declared schema is strongly preferred at scale: inference runs an
    extra full pass over the input. Same quarantine semantics as
    `read_csv`: with a declared schema and ``corrupt_column``, malformed
    records land in a side column instead of being lost.
    """
    if isinstance(paths, str):
        paths = [paths]
    reader = spark.read.option("mode", mode)
    if multiline:
        reader = reader.option("multiLine", "true")
    if schema is not None:
        if corrupt_column is not None:
            from pyspark.sql.types import StringType, StructField

            schema = StructType(
                list(schema.fields) + [StructField(corrupt_column, StringType())]
            )
            reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
        reader = reader.schema(schema)
    return reader.json(list(paths))


def read_orc(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Read one or many ORC paths into a single DataFrame (columnar
    alternative to parquet; same pushdown/pruning behavior — Spark's
    native ORC reader exposes PushedFilters identically)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.orc(*paths)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (``{sf_dir}/{name}.parquet``)."""
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its nanosecond timestamps.

    Spark 4.1 reads parquet TIMESTAMP(NANOS) natively as timestamp_ntz
    truncated to microseconds — exactly DuckDB's ns->us coercion, so
    oracle comparisons stay bit-exact. Under a session where the
    legacy `nanosAsLong` flag is active the column instead arrives as
    raw int64 nanos; that encoding is normalized here (no session conf
    is mutated — an operator must not side-effect the session).
    Result column ``ts`` is timestamp_ntz either way.
    """
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        # timestampadd on an NTZ literal is pure wall-clock integer
        # arithmetic — session-timezone-independent (an instant->ntz
        # cast would shift by the session tz offset).
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLES, register_views: bool = False
) -> dict[str, DataFrame]:
    """Load testdata tables; optionally register each as a temp view so
    DataFrame and SQL entry points compose (reference mixes both,
    `etl.py:171-217`)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
