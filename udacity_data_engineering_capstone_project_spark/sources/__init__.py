from udacity_data_engineering_capstone_project_spark.sources.readers import (
    TABLES,
    load_tables,
    read_csv,
    read_parquet,
    read_table,
)
from udacity_data_engineering_capstone_project_spark.sources.sinks import (
    write_csv,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_tables",
    "read_csv",
    "read_parquet",
    "read_table",
    "write_csv",
    "write_parquet",
]
