"""Round-11 scale probe: contamination_screen (cross-corpus embedding
decontamination) at x1/x10/x100 corpus size with a fixed benchmark,
BOTH physical paths per scale.

Claims to price (operators/similarity.py:contamination_screen):
1. matmul (the auto default for a broadcastable benchmark) scales
   ~linearly with corpus rows: one Arrow pass, one BLAS product per
   batch, no joins. This probe is what CAUGHT the original design's
   landmine — skew-inflated CANDIDATE VOLUME: the near-isotropic
   vectors' bucket occupancy skew ALIGNS across the two sides, so
   candidates measured ~10x the uniform estimate (39M pairs at x10)
   and every per-candidate microsecond multiplied into core-hours
   at x100. The replicated-matrix path exists because this probe
   priced it (full attribution trail in BASELINE.md r11).
2. both paths' shuffle write stays MATCH-shaped, not corpus-shaped,
   as the corpus grows 100x (REST API stage accounting);
3. planted-duplicate recall is exactly 1.0 at every scale on both
   paths (matmul is brute force; scaled copies share every plane
   sign on the LSH path — no luck involved).

Corpus: n synthetic 64-dim vectors (deterministic splitmix-style hash
features). Benchmark: 2,000 vectors = 1,000 x2-scaled corpus copies
(every n/1000-th row; MUST all be flagged at cos 1.0) + 1,000
independent vectors (near-orthogonal at dim 64 — mostly silent).

Usage: python tools/scale_probe_contamination.py
Env: SCALE_PROBE_CORPUS (x1 base rows, default 50000),
SCALE_PROBE_SCALES (default "1,10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.similarity import (
    contamination_screen,
)


def _shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    base_n = int(os.environ.get("SCALE_PROBE_CORPUS", "50000"))
    scales = [
        int(x) for x in os.environ.get("SCALE_PROBE_SCALES", "1,10,100").split(",")
    ]
    n_planted, n_noise, dim = 1000, 1000, 64
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .appName("scale-probe-contamination")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def vec_expr(seed: int) -> str:
        # deterministic pseudo-random unit-cube vector per row id:
        # 64 xxhash64 draws mapped to [-1, 1) — cheap, reproducible,
        # near-orthogonal pairs at dim 64 (E[cos] ~ 0, sd ~ 0.125)
        comps = ", ".join(
            f"CAST(xxhash64(id, {seed}, {j}) AS DOUBLE) / 9.223372036854776e18"
            for j in range(dim)
        )
        return f"array({comps})"

    def corpus(n: int):
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.expr(vec_expr(0)).alias("v")
        )

    result: dict = {"base_corpus": base_n, "benchmark_rows": n_planted + n_noise}
    for s in scales:
        n = base_n * s
        corp = corpus(n).persist()
        corp.count()
        stride = n // n_planted
        planted = (
            corp.filter(F.col("vec_id") % stride == 0)
            .limit(n_planted)
            .select(
                (F.col("vec_id") + 1_000_000_000).alias("bench_id"),
                F.expr("transform(v, x -> x * 2.0D)").alias("v"),
            )
        )
        noise = spark.range(n_noise).select(
            (F.col("id") + 2_000_000_000).alias("bench_id"),
            F.expr(vec_expr(1)).alias("v"),
        )
        bench = planted.unionByName(noise).persist()
        n_bench = bench.count()

        entry: dict = {"corpus": n, "bench": n_bench}
        for m in ("matmul", "lsh"):
            out = contamination_screen(
                corp, bench, "vec_id", "v", "bench_id", threshold=0.8, method=m
            )
            out.count()  # warm (JIT + broadcast build)
            w0 = _shuffle_write_bytes(spark)
            t0 = time.time()
            flagged = out.count()
            wall = time.time() - t0
            w1 = _shuffle_write_bytes(spark)
            exact = out.filter(F.col("cos_sim") == 1.0).count()
            entry[m] = {
                "flagged": flagged,
                "planted_found_at_1.0": exact,
                "wall_s": round(wall, 2),
                "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
                # recall gate: every planted copy must surface at 1.0
                "planted_recall_ok": exact >= n_planted,
            }
        result[f"x{s}"] = entry
        print(f"# x{s}: {json.dumps(entry)}", file=sys.stderr)
        corp.unpersist()
        bench.unpersist()

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
