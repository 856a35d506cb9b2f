"""r9 scale probe: `operators.fuzzy.fuzzy_pairs` (SymSpell deletion-
neighborhood blocking + thresholded-levenshtein verify) at x1/x10/x100
of the documents-title entity table.

What it evidences for the 100 TB design review:
- candidate volume tracks the TRUE near-pair density (the pigeonhole
  join emits a bounded superset), not n^2 — the replica's letter
  bijection decorrelates copies, so true pairs grow ~linearly while
  the id space grows 100x;
- wall scales with exploded key volume (rows x O(L^k) keys), the
  documented trade of the short-string tier.

Usage: python tools/scale_probe_fuzzy.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_MULTS default "1,10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        deletion_key_hashes,
        fuzzy_pairs,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from tools.replicate import doc_copies

    spark = get_spark(app_name="fuzzy-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    results = {}
    for mult in mults:
        tier = f"x{mult}"
        base = docs if mult == 1 else doc_copies(docs, mult)
        ents = (
            base.select(
                "doc_id",
                F.array_join(
                    F.slice(F.split("text", " "), 1, 3), " "
                ).alias("title"),
            )
            .groupBy("title")
            .agg(F.min("doc_id").alias("eid"))
            .localCheckpoint(eager=True)  # probe the OPERATOR, not the prep
        )
        n_ents = ents.count()
        n_keys = ents.select(
            F.sum(F.size(deletion_key_hashes("title", 2))).alias("k")
        ).collect()[0]["k"]
        fuzzy_pairs(ents, "eid", "title", 2).count()  # warm
        best, pairs = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            pairs = fuzzy_pairs(ents, "eid", "title", 2).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[tier] = {
            "entities": n_ents,
            "variant_keys": n_keys,
            "pairs": pairs,
            "wall_sec": round(best, 2),
            "entities_per_sec": round(n_ents / best, 1),
        }
        print(f"# {tier}: {results[tier]}", file=sys.stderr)
    print(json.dumps({"probe": "fuzzy_pairs", "sf_dir": sf_dir,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
