"""Round-4 scale probe: hashed-classifier training/scoring AND
stupid-backoff LM train/score at sf0.1 and on 10x replicated
documents — evidence that per-iteration cost is one corpus-linear
pass while driver traffic stays model-sized (classifier) / the model
stays a vocabulary-sized DataFrame (LM).

Replication reuses the per-copy letter-permutation bijection of
`scale_probe_dedup.py` (shingle/ngram structure preserved within a
copy, decorrelated across copies); labels are the deterministic
doc_id % 2, identical across scales. Training runs a FIXED iteration
count, so wall should scale ~linearly with the corpus and the
per-round collect stays exactly num_buckets + 1 rows at every scale.

Usage: python tools/scale_probe_classifier.py
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
        apply_hashed_classifier,
        ngram_lm_logprob,
        train_hashed_classifier,
        train_ngram_lm,
    )
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    spark = get_spark(app_name="scale-probe-classifier")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_clf_")

    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    results: dict[str, dict] = {}
    iterations, nb = 5, 4096
    try:
        for scale in [1] + copies_list:
            path = os.path.join(work, f"docs_x{scale}")
            (base if scale == 1 else doc_copies(base, scale)).write.mode(
                "overwrite"
            ).parquet(path)
            docs = spark.read.parquet(path).withColumn(
                "label", F.col("doc_id") % 2 == 0
            )
            t0 = time.perf_counter()
            wdf, bias = train_hashed_classifier(
                docs, "doc_id", "text", "label",
                num_buckets=nb, iterations=iterations,
            )
            train_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            n = apply_hashed_classifier(
                docs, "doc_id", "text", wdf, bias=bias, num_buckets=nb
            ).count()
            score_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            lm = train_ngram_lm(docs, "text", n=3, min_count=2)
            lm = lm.localCheckpoint(eager=True)
            lm_vocab = lm.count()
            lm_train_s = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            ngram_lm_logprob(docs, "doc_id", "text", lm, n=3).count()
            lm_score_s = round(time.perf_counter() - t0, 3)
            results[f"x{scale}"] = {
                "rows": n,
                "train_s": train_s,
                "train_s_per_iter": round(train_s / iterations, 3),
                "score_s": score_s,
                "lm_train_s": lm_train_s,
                "lm_score_s": lm_score_s,
                "lm_vocab": lm_vocab,
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps({"probe": "hashed_classifier", "iterations": iterations,
                      "num_buckets": nb, "results": results}))


if __name__ == "__main__":
    main()
