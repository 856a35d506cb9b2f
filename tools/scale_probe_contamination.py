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
    auto_lsh_family,
    contamination_screen,
    hyperplane_lsh_buckets,
)


def _shuffle_write_bytes(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def family_probe() -> None:
    """`--family` mode (r12): measure the threshold-aware
    `auto_lsh_family` recall against the EXACT flag set (the matmul
    path) at low thresholds, where the old fixed 8x8 family missed
    most flags (112/291 at the graded 0.3 band, NOTES.md r11).

    Corpus: random unit vectors. Benchmark: planted vectors built at
    CONTROLLED cosine to a corpus row (c*u + sqrt(1-c^2)*w_perp, c
    uniform in [0.35, 0.99]) plus pure noise rows, so the flag set
    spans the whole band above each threshold instead of clustering
    at 1.0. Recall = flagged-corpus-id overlap with the exact set;
    the boundary bound 1-(1-p^k)^L is the worst case over that set,
    so measured recall should sit ABOVE it. One JSON line."""
    import numpy as np

    rng = np.random.default_rng(20260816)
    dim = 64
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("scale-probe-contamination-family")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build(n_corp: int, n_planted: int, n_noise: int):
        corp = rng.standard_normal((n_corp, dim))
        corp /= np.linalg.norm(corp, axis=1, keepdims=True)
        cos_targets = rng.uniform(0.35, 0.99, n_planted)
        src = rng.choice(n_corp, n_planted, replace=False)
        planted = []
        for j in range(n_planted):
            u = corp[src[j]]
            w = rng.standard_normal(dim)
            w -= (w @ u) * u
            w /= np.linalg.norm(w)
            planted.append(
                cos_targets[j] * u + np.sqrt(1 - cos_targets[j] ** 2) * w
            )
        bench = np.vstack([planted, rng.standard_normal((n_noise, dim))])
        corp_df = spark.createDataFrame(
            [(int(i), [float(x) for x in corp[i]]) for i in range(n_corp)],
            "vec_id bigint, v array<double>",
        ).persist()
        bench_df = spark.createDataFrame(
            [
                (1000000 + j, [float(x) for x in bench[j]])
                for j in range(len(bench))
            ],
            "bench_id bigint, v array<double>",
        ).persist()
        corp_df.count(), bench_df.count()
        return corp_df, bench_df

    # per-threshold sizes: the 0.3 band's auto family runs 32-bucket
    # tables, so candidate volume ~ L*n_corp*n_bench/32 — a smaller
    # dataset keeps the verify stage's Arrow traffic sane while the
    # recall estimate stays ~500-flag tight
    sizes = {0.5: (20000, 1200, 800), 0.3: (6000, 600, 400)}
    result: dict = {
        "sizes": {str(t): list(v) for t, v in sizes.items()}
    }
    for thr in (0.5, 0.3):
        corp_df, bench_df = build(*sizes[thr])
        n_bench_rows = bench_df.count()
        exact = {
            r["vec_id"]
            for r in contamination_screen(
                corp_df, bench_df, "vec_id", "v", "bench_id",
                threshold=thr, method="matmul",
            ).collect()
        }

        def lsh_ids(k=None, l=None):
            return {
                r["vec_id"]
                for r in contamination_screen(
                    corp_df, bench_df, "vec_id", "v", "bench_id",
                    threshold=thr, method="lsh", num_planes=k, num_tables=l,
                ).collect()
            }

        k_auto, l_auto = auto_lsh_family(thr, n_small_side=n_bench_rows)
        import math as _math

        p = 1.0 - _math.acos(thr) / _math.pi
        auto_ids, fixed_ids = lsh_ids(), lsh_ids(8, 8)
        result[f"t{thr}"] = {
            "family_auto": [k_auto, l_auto],
            "boundary_bound": round(1 - (1 - p**k_auto) ** l_auto, 4),
            "exact_flags": len(exact),
            "auto_recall": round(len(auto_ids & exact) / max(len(exact), 1), 4),
            "fixed_8x8_recall": round(
                len(fixed_ids & exact) / max(len(exact), 1), 4
            ),
        }
        print(f"# t{thr}: {json.dumps(result[f't{thr}'])}", file=sys.stderr)
        corp_df.unpersist()
        bench_df.unpersist()
    print(json.dumps(result))
    spark.stop()


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
        # candidate-volume accounting for the r12 skew cap (8x8 family,
        # matching the lsh run below): histogram both sides' buckets,
        # sum the per-cell product with and without the bench-side cap,
        # against the uniform estimate L * n_corp * n_bench / 2^k. The
        # r11 probe measured ~10x inflation here (aligned skew); the
        # cap must bring the joined volume within ~2x of uniform while
        # the planted-recall gate below stays green.
        import math as _math

        k8, l8 = 8, 8
        cap = max(32, _math.ceil(4.0 * n_bench / float(1 << k8)))
        ch = (
            hyperplane_lsh_buckets(corp, "vec_id", "v", k8, dim, num_tables=l8)
            .select(F.explode("buckets").alias("tb"))
            .groupBy("tb")
            .agg(F.count(F.lit(1)).alias("cn"))
        )
        bh = (
            hyperplane_lsh_buckets(bench, "bench_id", "v", k8, dim, num_tables=l8)
            .select(F.explode("buckets").alias("tb"))
            .groupBy("tb")
            .agg(F.count(F.lit(1)).alias("bn"))
        )
        vol = (
            ch.join(bh, "tb")
            .agg(
                F.sum(F.col("cn") * F.col("bn")).alias("uncapped"),
                F.sum(
                    F.when(F.col("bn") <= cap, F.col("cn") * F.col("bn")).otherwise(
                        F.lit(0)
                    )
                ).alias("capped"),
            )
            .first()
        )
        uniform = l8 * n * n_bench / float(1 << k8)
        entry["candidates"] = {
            "uniform_estimate": int(uniform),
            "uncapped": int(vol["uncapped"] or 0),
            "capped": int(vol["capped"] or 0),
            "bench_bucket_cap": cap,
            "capped_vs_uniform": round((vol["capped"] or 0) / uniform, 2),
            "uncapped_vs_uniform": round((vol["uncapped"] or 0) / uniform, 2),
        }
        for m in ("matmul", "lsh"):
            out = contamination_screen(
                corp, bench, "vec_id", "v", "bench_id", threshold=0.8, method=m,
                # pin the r11 8x8 family so capped-vs-uncapped and
                # cross-round comparisons measure the CAP, not the
                # r12 threshold-aware family default
                num_planes=k8, num_tables=l8,
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
    if "--family" in sys.argv:
        family_probe()
    else:
        main()
