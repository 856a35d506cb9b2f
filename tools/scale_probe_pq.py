"""Round-4 scale probe: the product-quantization tier at sf0.1 and on
10x/100x replicated embeddings — linear-scaling evidence for
BASELINE.md.

Replication uses the per-copy component-permutation bijection
(tools/replicate.py): cosine structure is preserved within a copy and
decorrelated across copies, so the 100x corpus behaves like 100
independent embedding sets. Inputs are materialized to parquet first
so each probe measures a disk-scan-fed pipeline.

Measured per scale: codebook training wall (fixed m=16, k=32,
iters=3 — training cost is dominated by the assignment scan, so it
should grow ~linearly), encode wall (map-only kernel — strictly
linear), and ADC top-k search wall for 10 queries (scored rows grow
linearly with the corpus).

Usage: python tools/scale_probe_pq.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_COPIES default "10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.replicate import vec_copies


def main() -> None:
    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.operators import similarity as sim

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10,100").split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    work = tempfile.mkdtemp(prefix="pq_probe_")
    spark = get_spark(
        app_name="scale_probe_pq",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.sql.warehouse.dir": os.path.join(work, "wh")},
    )
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    results: dict[str, dict] = {}
    try:
        for mult in [1] + copies:
            path = os.path.join(work, f"x{mult}")
            df = base if mult == 1 else vec_copies(base, mult)
            (
                df.repartition(max(cpus, mult))
                .write.mode("overwrite").parquet(path)
            )
            emb = sim.normalize_embeddings(
                spark.read.parquet(path), "embedding"
            )
            n = emb.count()

            t0 = time.time()
            cb = sim.train_pq_codebooks(
                emb, "vec_id", "embedding", m=16, k=32, iters=3
            )
            cb.count()
            t_train = time.time() - t0

            t0 = time.time()
            codes = sim.pq_encode(emb, cb, "embedding")
            codes.write.mode("overwrite").parquet(
                os.path.join(work, f"codes_x{mult}")
            )
            t_encode = time.time() - t0
            codes_stored = spark.read.parquet(os.path.join(work, f"codes_x{mult}"))

            queries = emb.orderBy("vec_id").limit(10)
            t0 = time.time()
            out = sim.pq_topk(
                codes_stored, queries, cb, "vec_id", "embedding", k=10
            )
            n_out = out.count()
            t_search = time.time() - t0

            results[f"x{mult}"] = {
                "rows": n,
                "train_s": round(t_train, 2),
                "encode_s": round(t_encode, 2),
                "adc_search_s": round(t_search, 2),
                "search_rows": n_out,
            }
            spark.catalog.clearCache()
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "pq", "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
