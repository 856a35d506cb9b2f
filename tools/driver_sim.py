"""Local simulation of the driver's correctness gate.

Runs ``__spark_entry__.entry`` as a smoke check, then every registered
``queries()`` entry at sf=0.01 against its ``oracle_sql()`` twin through
the SAME comparison the local test gate uses (``tests/oracle_utils``:
column sort, dtype-KIND gate with DuckDB declared types, near-bitwise
value equality).  Prior rounds re-typed this script ad hoc per session;
it is committed so every future session runs the identical gate.

Usage::

    python tools/driver_sim.py [sf_dir]          # default /root/testdata/sf0.01
    python tools/driver_sim.py --only name1,name2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO_ROOT, os.path.join(_REPO_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="", help="comma-separated query names")
    ap.add_argument(
        "--all",
        action="store_true",
        help="also run the UNREGISTERED registry (the full 100-query "
        "gate the pytest parity file covers, in one command)",
    )
    ap.add_argument(
        "--hostile",
        choices=["config", "tz"],
        default=None,
        help="adversarial session shapes (committed r10; the ad-hoc "
        "r8/r9 probes): 'config' = local[2] x 200 shuffle partitions "
        "x default parallelism 2 (catches layout/parallelism "
        "assumptions — prefer sf0.001 for wall time); 'tz' = session "
        "timezone Asia/Kolkata (catches instant<->ntz cast bugs)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(
            "local[2]" if args.hostile == "config" else "local[32]"
        )
        .config(
            "spark.sql.shuffle.partitions",
            "200" if args.hostile == "config" else "32",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"driver-sim-{args.hostile or 'plain'}")
    )
    if args.hostile == "config":
        builder = builder.config("spark.default.parallelism", "2")
    if args.hostile == "tz":
        builder = builder.config("spark.sql.session.timeZone", "Asia/Kolkata")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_utils import compare_frames, run_oracle

    assert len(e.entry(spark).collect()) > 0, "entry() produced no rows"
    qs, osql = e.queries(), e.oracle_sql()
    if args.all:
        from udacity_data_engineering_capstone_project_spark.plans.queries import (
            UNREGISTERED,
        )

        for name, spec in UNREGISTERED.items():
            qs[name] = spec.fn
            if spec.oracle:
                osql[name] = spec.oracle
    only = {n for n in args.only.split(",") if n}

    green, red, rows_only = 0, [], []
    t0 = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
            if name in osql:
                odf = run_oracle(osql[name], args.sf_dir)
                compare_frames(sdf, odf, name)
            else:
                assert len(sdf) >= 0
                rows_only.append(name)
            green += 1
            print(f"  ok   {name} ({len(sdf)} rows)")
        except Exception as ex:  # noqa: BLE001 — report every red row
            red.append(name)
            msg = str(ex).replace("\n", " ")[:300]
            print(f"  RED  {name}: {msg}")
    n = green + len(red)
    print(
        f"driver-sim: {green}/{n} green in {time.time() - t0:.0f}s"
        f" (rows-only: {rows_only or 'none'}; red: {red or 'none'})"
    )
    spark.stop()
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
