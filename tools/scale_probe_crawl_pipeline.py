"""Round-7 scale probe: the end-to-end crawl curation pipeline
(crawl_pipeline_q — robots screen -> blocklist -> quality cascade ->
exact dedup -> token budget, eager barrier per stage) at sf0.1 and on
10x/100x replicated documents.

What the probe evidences for the 100 TB design review:
- wall grows ~linearly with corpus size (every stage is a projection,
  a broadcast join, or a key-partitioned aggregation/window — no
  stage is quadratic or single-task);
- per-stage survivor counts scale proportionally (the audit output
  itself is 6 rows at any scale);
- the barrier pattern (one eager checkpoint per stage) keeps each
  stage computed exactly once regardless of how many audit branches
  read it.

Replication keeps (lang, n_chars) and applies the per-copy letter
bijection of tools/replicate.py to text (length-preserving, so
n_chars stays truthful). Caveat recorded with the numbers: blocklist
phrases are literal English, so translated copies match fewer of
them — the blocklist stage's relative drop rate falls as scale grows
(stage wall is still dominated by the token prefilter projection,
which is corpus-linear).

Usage: python tools/scale_probe_crawl_pipeline.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_COPIES default "10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_LOWER = string.ascii_lowercase


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies_list = [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.plans.queries import REGISTRY
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    spark = get_spark(app_name="scale-probe-crawl")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_crawl_")
    base = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    def replicated(copies: int):
        parts = []
        for i in range(copies):
            perm = list(_LOWER)
            random.Random(i).shuffle(perm)
            perm = "".join(perm)
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.translate(
                        F.col("text"), _LOWER + _LOWER.upper(),
                        perm + perm.upper(),
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    results: dict[str, dict] = {}
    try:
        for scale in [1] + copies_list:
            sdir = os.path.join(work, f"x{scale}")
            os.makedirs(sdir, exist_ok=True)
            (base if scale == 1 else replicated(scale)).repartition(
                max(32, scale)
            ).write.mode("overwrite").parquet(
                os.path.join(sdir, "documents.parquet")
            )
            # per-stage walls: each next() returns when that stage's
            # barrier has materialized (crawl_pipeline_stages yields
            # AFTER the eager checkpoint), so the generator IS the
            # stage timer — no pipeline duplication in the probe
            from udacity_data_engineering_capstone_project_spark.plans.queries import (
                crawl_pipeline_stages,
            )

            t0 = time.perf_counter()
            stage_walls: dict[str, float] = {}
            stages: dict[str, int] = {}
            prev = t0
            for name, df in crawl_pipeline_stages(spark, sdir):
                now = time.perf_counter()
                stage_walls[name] = round(now - prev, 2)
                # counts read the just-materialized barrier (cheap);
                # intake is unbarriered so its count runs the scan
                stages[name] = df.count()
                prev = time.perf_counter()
            wall = time.perf_counter() - t0
            results[f"x{scale}"] = {
                "wall_sec": round(wall, 2),
                "stage_walls_sec": stage_walls,
                "stages": stages,
            }
            print(f"# x{scale}: {wall:.2f}s {stages} walls={stage_walls}",
                  file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps({"probe": "crawl_pipeline", "sf_dir": sf_dir,
                      "results": results}))


if __name__ == "__main__":
    main()
