"""r9 scale probe: `relational.salted_join` under a pathological hot
key, against the alternatives a Spark engineer actually has:

1. plain shuffle join with AQE skew-split ON (Spark's default tool);
2. plain shuffle join with AQE skew handling OFF (the straggler);
3. salted_join (explicit round-robin spread).

Construction: 20M left rows, 50% on ONE key; right side is 2M
distinct keys (too big to broadcast, so the join is a genuine
shuffle join — a broadcastable dim has NO skew problem and salting
would only add work, which the first version of this probe measured:
plain-broadcast 0.4 s vs salted 1.9 s). Outputs of all three paths
are asserted EQUAL (count + checksum) — the same contract
`salted_join_q` hash-grades against DuckDB.

The expected story: AQE's skew split handles single-hot-key SMJ skew
(it subdivides the skewed partition by map-output ranges), so
explicit salting is the fallback for the shapes AQE can't touch —
skew-join disabled environments, aggregations after the join that
inherit the skewed partitioning, and stream-stream joins where AQE
does not run. The probe RECORDS which tool wins rather than assuming.

Usage: python tools/scale_probe_salted_join.py
(env: SALT_PROBE_ROWS default 20000000). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(os.environ.get("SALT_PROBE_ROWS", "20000000"))
    n_right = 2_000_000
    salts = 16

    from udacity_data_engineering_capstone_project_spark.operators.relational import (
        salted_join,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(app_name="salted-join-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # force the shuffle-join regime the probe is about: the 2M-row
    # right side must not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    left = spark.range(0, n_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_right - 1)) + 1)
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).alias("payload"),
    ).localCheckpoint(eager=True)
    right = spark.range(0, n_right).select(
        F.col("id").alias("k"),
        (F.col("id") * 31 % 17).alias("dim_val"),
    ).localCheckpoint(eager=True)

    def _checksum(df) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("payload") * F.col("dim_val")).alias("cs"),
        ).collect()[0]
        return row["n"], row["cs"]

    def _timed(build) -> tuple:
        _checksum(build())  # warm (JIT + shuffle files)
        t0 = time.time()
        cs = _checksum(build())
        return cs, round(time.time() - t0, 2)

    results = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    cs_aqe, results["plain_aqe_skew_sec"] = _timed(
        lambda: left.join(right, on="k")
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    cs_noaqe, results["plain_no_skew_split_sec"] = _timed(
        lambda: left.join(right, on="k")
    )
    cs_salt, results["salted_sec"] = _timed(
        lambda: salted_join(left, right, "k", salts=salts)
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    assert cs_aqe == cs_noaqe == cs_salt, (cs_aqe, cs_noaqe, cs_salt)

    spread = (
        left.filter(F.col("k") == 0)
        .withColumn(
            "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salts))
        )
        .groupBy("__salt")
        .count()
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.min("count").alias("min_rows"),
            F.max("count").alias("max_rows"),
        )
        .collect()[0]
    )

    print(
        json.dumps(
            {
                "probe": "salted_join",
                "rows": n_rows,
                "right_rows": n_right,
                "salts": salts,
                **results,
                "joined_rows": cs_salt[0],
                "hot_key_spread": {
                    "buckets": spread["buckets"],
                    "min_rows": spread["min_rows"],
                    "max_rows": spread["max_rows"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
