"""Round-3 scale probe: the round-2 tiers (SCD2, PageRank, z-order
write, HLL sketch merge) at sf0.1 and on 10x-replicated inputs, on the
same host — the linear-scaling evidence BASELINE.md records per round.

Replication shifts the key columns per copy so the 10x input has 10x
the key cardinality (real growth), not 10 exact duplicates of every
row; inputs are materialized to parquet first so each probe measures
the operator over a disk scan, not the replication plan.

Per-iteration PageRank wall is derived from max_iter=2 vs max_iter=6
runs (delta/4 = steady-state round cost, first-run setup amortized
out); shuffle bytes come from the UI REST API when available.

Usage: python tools/scale_probe.py  (env: SPARK_GRAFT_SF_DIR)
Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _shuffle_write_bytes(port: int) -> int | None:
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{port}/api/v1/applications", timeout=5)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=5,
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ui_port = 4055

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.operators.graph import pagerank
    from udacity_data_engineering_capstone_project_spark.operators.scd import (
        scd2_from_snapshots,
    )
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        distinct_sketch,
        merge_distinct_sketches,
    )
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table
    from udacity_data_engineering_capstone_project_spark.sources.sinks import write_zordered

    spark = get_spark(
        app_name="scale-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(ui_port)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_")

    def replicate(df, key_shifts: dict[str, int], copies: int = 10):
        parts = []
        for i in range(copies):
            c = df
            for col, span in key_shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * span))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    results = {}

    # ---- inputs: sf0.1 + materialized 10x replicas ----------------------
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    events = read_table(spark, sf_dir, "events")
    replicate(orders, {"o_custkey": 10_000_000, "o_orderkey": 1_000_000_000}).write.mode(
        "overwrite"
    ).parquet(f"{work}/orders10x")
    replicate(
        lineitem, {"l_partkey": 10_000_000, "l_suppkey": 10_000_000}
    ).write.mode("overwrite").parquet(f"{work}/lineitem10x")
    replicate(events, {"user_id": 10_000_000}).write.mode("overwrite").parquet(
        f"{work}/events10x"
    )
    orders10 = spark.read.parquet(f"{work}/orders10x")
    lineitem10 = spark.read.parquet(f"{work}/lineitem10x")
    events10 = spark.read.parquet(f"{work}/events10x")

    # ---- SCD2 -----------------------------------------------------------
    def scd2(df):
        return scd2_from_snapshots(
            df.select("o_custkey", "o_orderkey", "o_orderstatus", "o_orderpriority"),
            ["o_custkey"],
            ["o_orderstatus", "o_orderpriority"],
            "o_orderkey",
        ).count()

    scd2(orders)  # warm codegen
    results["scd2"] = {
        "sf0.1_s": _timed(lambda: scd2(orders)),
        "rows": orders.count(),
        "x10_s": _timed(lambda: scd2(orders10)),
        "x10_rows": orders10.count(),
    }

    # ---- PageRank -------------------------------------------------------
    def edges_of(df):
        return df.select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )

    def pr(df, iters):
        return pagerank(edges_of(df), max_iter=iters, tol=0.0).count()

    pr(lineitem, 1)  # warm
    sw0 = _shuffle_write_bytes(ui_port)
    t2 = _timed(lambda: pr(lineitem, 2))
    t6 = _timed(lambda: pr(lineitem, 6))
    sw1 = _shuffle_write_bytes(ui_port)
    t2x = _timed(lambda: pr(lineitem10, 2))
    t6x = _timed(lambda: pr(lineitem10, 6))
    sw2 = _shuffle_write_bytes(ui_port)
    results["pagerank"] = {
        "edges": lineitem.count(),
        "per_iter_s": round((t6 - t2) / 4, 3),
        "x10_edges": lineitem10.count(),
        "x10_per_iter_s": round((t6x - t2x) / 4, 3),
        "shuffle_mb_2+6_iters": round((sw1 - sw0) / 1e6, 1) if sw0 is not None else None,
        "x10_shuffle_mb_2+6_iters": round((sw2 - sw1) / 1e6, 1) if sw1 is not None else None,
    }

    # ---- z-order write --------------------------------------------------
    def zw(df, path):
        write_zordered(df, path, ["l_partkey", "l_suppkey"], num_files=8)

    zw(lineitem, f"{work}/z1")  # warm
    results["zorder_write"] = {
        "sf0.1_s": _timed(lambda: zw(lineitem, f"{work}/z2")),
        "x10_s": _timed(lambda: zw(lineitem10, f"{work}/z3")),
    }

    # ---- HLL sketches: build per (event_type, day), merge to event_type -
    def sketch_build(df, path):
        distinct_sketch(
            df.withColumn("day", F.to_date("ts")), ["event_type", "day"], "user_id"
        ).write.mode("overwrite").parquet(path)

    def sketch_merge(path):
        return merge_distinct_sketches(
            spark.read.parquet(path), ["event_type"]
        ).count()

    sketch_build(events, f"{work}/hll1")  # warm
    results["hll"] = {
        "build_sf0.1_s": _timed(lambda: sketch_build(events, f"{work}/hll1")),
        "build_x10_s": _timed(lambda: sketch_build(events10, f"{work}/hll2")),
        "merge_sf0.1_s": _timed(lambda: sketch_merge(f"{work}/hll1")),
        "merge_x10_s": _timed(lambda: sketch_merge(f"{work}/hll2")),
    }

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
