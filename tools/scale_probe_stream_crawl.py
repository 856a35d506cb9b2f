"""Scale probe (r8 x1/x10; r9 extends to x100): the STREAMING
crawl-curation twin (streaming/crawl.py) at sf0.1 and on 10x/100x
letter-bijection replicas, fed as multiple file batches with an
availableNow trigger.

What it evidences for the 100 TB design review:
- the composition is stateless projections + one stream-static join
  except the final first-arrival dedup, whose state is 16 bytes/doc
  (md5 fingerprint) — per-batch wall should track batch SIZE, not
  accumulated history (batch_walls flat; state_rows reported per
  tier, the r6 scale_probe_streaming evidence format);
- the surviving CONTENT SET equals the batch pipeline's exact_dedup
  stage at every tier — checked distributedly on normalized
  fingerprints (no driver collect), not just counts.

Usage: python tools/scale_probe_stream_crawl.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_MULTS default "1,10,100"). Prints one JSON line.
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
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.functions.text import (
        normalize_text,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        CRAWL_BLOCKLIST_PHRASES,
        _ROBOTS_TXT,
        crawl_cascade_rules,
        crawl_pipeline_intake,
        crawl_pipeline_stage_fns,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        stream_crawl_curation,
    )
    from tools.replicate import doc_copies

    spark = get_spark(app_name="stream-crawl-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rules = robots_rules_df(spark, sorted(_ROBOTS_TXT.items()))
    stage_fns = dict(crawl_pipeline_stage_fns(spark))

    results = {}
    for mult in mults:
        tier = f"x{mult}"
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
            # durable parquet store, not a memory sink: at x100 the
            # survivors are ~124k full documents — keep them executor-
            # side so the probe measures the pipeline, not a driver
            # collect
            store = os.path.join(work, "store")
            t0 = time.perf_counter()
            q = (
                curated.writeStream.format("parquet")
                .option("path", store)
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            batches, peak_state, final_state = [], 0, 0
            for pr in q.recentProgress:  # chronological
                dur = (pr.durationMs or {}).get("triggerExecution")
                if dur is not None:
                    batches.append(round(dur / 1000.0, 2))
                ops = pr.get("stateOperators") or []
                if ops:
                    # this progress event's state = max across its
                    # operators; final = LAST event's value (so a
                    # watermarked run can show state SHRINKING —
                    # r9 self-review: max-folding made final==peak
                    # by construction)
                    rows = max(op.get("numRowsTotal", 0) for op in ops)
                    peak_state = max(peak_state, rows)
                    final_state = rows

            stream_out = spark.read.parquet(store)
            n_out = stream_out.count()

            # batch-pipeline truth on the SAME intake: stages 1-4
            # (robots -> blocklist -> cascade -> exact dedup), then
            # content-set equality on normalized fingerprints — a
            # distributed anti-join both ways, no driver collect
            d = intake
            for stage in ("robots", "blocklist", "quality_cascade",
                          "exact_dedup"):
                d = stage_fns[stage](d)
            bf = d.select(F.md5(normalize_text("text")).alias("fp")).distinct()
            sf_ = stream_out.select(
                F.md5(normalize_text("text")).alias("fp")
            ).distinct()
            missing = bf.join(sf_, "fp", "left_anti").count()
            extra = sf_.join(bf, "fp", "left_anti").count()
            batch_survivors = bf.count()

            results[tier] = {
                "docs_in": n_in,
                "survivors": n_out,
                "batch_survivors": batch_survivors,
                "content_set_equal": missing == 0 and extra == 0,
                "wall_sec": round(wall, 2),
                "batch_walls_sec": batches,
                "peak_state_rows": peak_state,
                "final_state_rows": final_state,
                "docs_per_sec": round(n_in / wall, 1),
            }
            print(f"# {tier}: {results[tier]}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "stream_crawl", "sf_dir": sf_dir,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
