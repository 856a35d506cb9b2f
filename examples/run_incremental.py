"""Daily incremental processing — the reference write-up's wish
(Capstone_Project.ipynb cell 44: "the data should be updated daily ...
append the latest data incrementally") as a runnable workflow:

  day 1: a staging file lands  -> ingest it, build the star schema
  day 2: nothing lands         -> no-op (checkpoint knows)
  day 3: a delta file lands    -> ingest ONLY the delta, rebuild

Ingestion is a checkpointed availableNow stream (exactly the new
files are read; per-batch overwrite output is retry-idempotent);
dims/facts are re-derived over the accumulated staging because a
delta can add dimension values and surrogate keys span the table.

Usage: python examples/run_incremental.py [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row

from udacity_data_engineering_capstone_project_spark import get_spark
from udacity_data_engineering_capstone_project_spark.plans import capstone

DAY1 = [
    Row(cicid=1.0, i94port="NYC", arrdate=20583.0, i94addr="NY", depdate=20590.0,
        i94visa=2.0, biryear=1980.0, gender="M", airline="AA"),
    Row(cicid=2.0, i94port="MIA", arrdate=20584.0, i94addr="FL", depdate=None,
        i94visa=2.0, biryear=1990.0, gender=None, airline="DL"),
]
DAY3 = [
    Row(cicid=3.0, i94port="ORD", arrdate=20585.0, i94addr="IL", depdate=None,
        i94visa=2.0, biryear=1999.0, gender="F", airline="WN"),
]

TEMP = [
    Row(dt="2016-05-09", AverageTemperature="20.5", City="New York",
        Country="United States", Latitude="40.71N", Longitude="74.00W"),
]
AIR = [
    Row(ident="JFK", iso_country="US", iso_region="US-NY",
        coordinates="-74.00, 40.64"),
]


def land(spark, rows, schema, landing: str, name: str, scratch: str) -> None:
    outd = os.path.join(scratch, f"w_{name}")
    spark.createDataFrame(rows, schema=schema).coalesce(1).write.parquet(outd)
    part = next(f for f in os.listdir(outd) if f.endswith(".parquet"))
    shutil.copy(os.path.join(outd, part), os.path.join(landing, name))


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="inc_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing, exist_ok=True)
    ckpt = os.path.join(work, "checkpoint")
    staging = os.path.join(work, "staging")

    spark = get_spark(app_name="incremental-capstone")
    spark.sparkContext.setLogLevel("ERROR")

    st = capstone.build_state_temperature(
        capstone.clean_temperature(spark.createDataFrame(TEMP)),
        capstone.clean_airport_codes(spark.createDataFrame(AIR)),
    )
    schema = spark.createDataFrame(DAY1).schema

    land(spark, DAY1, schema, landing, "day1.parquet", work)
    n, tables = capstone.incremental_capstone_update(spark, landing, ckpt, staging, st)
    print(f"day 1: ingested {n} rows; fact_imm={tables['fact_imm'].count()}")

    n, tables = capstone.incremental_capstone_update(spark, landing, ckpt, staging, st)
    print(f"day 2: ingested {n} rows (no new files -> no-op)")

    land(spark, DAY3, schema, landing, "day3.parquet", work)
    n, tables = capstone.incremental_capstone_update(spark, landing, ckpt, staging, st)
    print(
        f"day 3: ingested {n} rows (delta only); "
        f"fact_imm={tables['fact_imm'].count()}, "
        f"dim_state={tables['dim_state'].count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
