"""Round-8 scale probe: the STREAMING crawl-curation twin
(streaming/crawl.py) at sf0.1 and on a 10x letter-bijection replica,
fed as multiple file batches with an availableNow trigger.

What it evidences for the 100 TB design review:
- the composition is stateless projections + one stream-static join
  except the final first-arrival dedup, whose state is 16 bytes/doc
  (md5 fingerprint) — per-batch wall should track batch SIZE, not
  accumulated history;
- survivors equal the batch pipeline's stage-4 content set at x1
  (the pinned equality test re-checked here on real landing files).

Usage: python tools/scale_probe_stream_crawl.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_COPIES default "10"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = int(os.environ.get("SCALE_PROBE_COPIES", "10"))

    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        CRAWL_BLOCKLIST_PHRASES,
        _ROBOTS_TXT,
        crawl_cascade_rules,
        crawl_pipeline_intake,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        stream_crawl_curation,
    )
    from tools.replicate import doc_copies

    spark = get_spark(app_name="stream-crawl-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rules = robots_rules_df(spark, sorted(_ROBOTS_TXT.items()))

    results = {}
    for tier, mult in [("x1", 1), ("x10", copies)]:
        intake = crawl_pipeline_intake(spark, sf_dir)
        if mult > 1:
            # replicate, then re-derive a url per (new) doc id so the
            # robots stage sees the same host/path distribution
            from udacity_data_engineering_capstone_project_spark.plans.queries import (
                _ROBOTS_URL_SQL,
            )
            intake = doc_copies(
                intake.select("doc_id", "text", "lang", "n_chars"), mult
            ).withColumn("url", F.expr(_ROBOTS_URL_SQL.format(T="STRING")))
        n_in = intake.count()
        work = tempfile.mkdtemp(prefix=f"streamcrawl_{tier}_")
        try:
            landing = os.path.join(work, "landing")
            # four arrival batches, split by id residue
            for b in range(4):
                intake.filter(F.col("doc_id") % 4 == b).write.parquet(
                    os.path.join(landing, f"b{b}")
                )
            stream = (
                spark.readStream.schema(intake.schema)
                .option("recursiveFileLookup", "true")
                .option("pathGlobFilter", "*.parquet")
                # one landing batch per micro-batch: per-batch walls
                # measure steady-state batch cost, not one mega-batch
                .option("maxFilesPerTrigger", 32)
                .parquet(landing)
            )
            curated = stream_crawl_curation(
                stream, rules, CRAWL_BLOCKLIST_PHRASES, crawl_cascade_rules()
            )
            name = f"crawl_{tier}"
            t0 = time.perf_counter()
            q = (
                curated.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            batches = []
            for pr in q.recentProgress:
                dur = (pr.durationMs or {}).get("triggerExecution")
                if dur is not None:
                    batches.append(round(dur / 1000.0, 2))
            n_out = spark.table(name).count()
            results[tier] = {
                "docs_in": n_in,
                "survivors": n_out,
                "wall_sec": round(wall, 2),
                "batch_walls_sec": batches,
                "docs_per_sec": round(n_in / wall, 1),
            }
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "stream_crawl", "sf_dir": sf_dir,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
