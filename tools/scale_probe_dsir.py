"""Round-6 scale probe: DSIR importance model training, scoring and
Gumbel-top-k selection at sf0.1 and on 10x replicated documents —
evidence that the model stays num_buckets rows at every scale, scoring
is one corpus-linear featurization pass + a broadcast join, and
selection is TakeOrderedAndProject (k rows per partition, never a
full sort).

Replication reuses the per-copy letter-permutation bijection of
`tools/replicate.py` (n-gram structure preserved within a copy,
decorrelated across copies). The TARGET corpus stays FIXED across
scales (the realistic shape: a small exemplar domain vs a growing raw
pool), so only the raw-pool histogram pass grows.

Usage: python tools/scale_probe_dsir.py
(env: SPARK_GRAFT_SF_DIR, SCALE_PROBE_COPIES default "10").
Prints one JSON line.
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
from tools.replicate import doc_copies


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies_list = [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.operators.textstats import (
        importance_resample,
        train_importance_model,
    )
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    spark = get_spark(app_name="scale-probe-dsir")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_dsir_")

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    target = base.filter(F.col("lang") == "en").select("text")
    target.write.mode("overwrite").parquet(os.path.join(work, "target"))
    target = spark.read.parquet(os.path.join(work, "target"))
    nb = 4096
    results: dict[str, dict] = {}
    try:
        for scale in [1] + copies_list:
            path = os.path.join(work, f"docs_x{scale}")
            (base.select("doc_id", "text") if scale == 1
             else doc_copies(base.select("doc_id", "text"), scale)).write.mode(
                "overwrite"
            ).parquet(path)
            raw = spark.read.parquet(path)
            n = raw.count()

            t0 = time.time()
            model = train_importance_model(
                target, raw, "text", num_buckets=nb
            ).localCheckpoint(eager=True)
            t_train = time.time() - t0
            assert model.count() == nb  # model size is scale-invariant

            t0 = time.time()
            picked = importance_resample(
                raw, "doc_id", "text", model, k=1000, num_buckets=nb
            )
            n_picked = picked.count()
            t_select = time.time() - t0

            results[f"x{scale}"] = {
                "rows": n,
                "train_s": round(t_train, 1),
                "score_select_s": round(t_select, 1),
                "picked": n_picked,
            }
            print(f"# x{scale}: {results[f'x{scale}']}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps({"metric": "dsir_scale_probe", "results": results}))


if __name__ == "__main__":
    main()
