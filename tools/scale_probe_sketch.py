"""Round-4 scale probe: the sketch/filter tier — DDSketch quantile
build+merge+read and the block-packed Bloom build+probe — at 1x/10x/
100x synthetic row counts. The claim to verify: build cost grows
linearly with rows while the SKETCH/FILTER itself stays bounded
(DDSketch: O(log-range/alpha) bucket rows per group; Bloom:
num_bits/64 block rows), so merges and probes never rescan raw data.

Inputs are generated with shifted keys per scale (no value reuse
across scales) and materialized to parquet first so each probe
measures a disk-scan-fed operator.

Usage: python tools/scale_probe_sketch.py   (env: SCALE_PROBE_BASE
rows, default 100_000; SCALE_PROBE_COPIES default "10,100").
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.bloom import (
    bloom_might_contain,
    build_bloom,
    optimal_num_bits,
)
from udacity_data_engineering_capstone_project_spark.operators.sketches import (
    merge_quantile_sketches,
    quantile_sketch,
    sketch_quantiles,
)


def main() -> None:
    base = int(os.environ.get("SCALE_PROBE_BASE", "100000"))
    copies = [1] + [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10,100").split(",")
    ]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("scale-probe-sketch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"base_rows": base, "scales": {}}
    tmp = tempfile.mkdtemp(prefix="probe_sketch_")
    for mult in copies:
        n = base * mult
        # lognormal-ish positive values spanning decades, 8 groups;
        # keys shifted per scale so nothing is reused
        src = spark.range(n).selectExpr(
            "CAST(id % 8 AS INT) AS g",
            "exp((pmod(xxhash64(id), 10000) / 10000.0 - 0.5) * 8.0) AS v",
            f"concat('k{mult}-', id) AS key",
        )
        path = f"{tmp}/rows_{mult}"
        src.write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)

        t0 = time.time()
        sk = quantile_sketch(df, ["g"], "v", alpha=0.01)
        sk_rows = sk.count()
        dd_build = time.time() - t0

        t0 = time.time()
        merged = merge_quantile_sketches(sk.unionByName(sk), ["g"])
        qs = sketch_quantiles(merged, ["g"], [0.5, 0.99], alpha=0.01)
        assert qs.count() == 16
        dd_merge_read = time.time() - t0

        m = optimal_num_bits(n, 0.01)
        t0 = time.time()
        bloom = build_bloom(df, "key", m, 7)
        bloom_rows = bloom.count()
        bl_build = time.time() - t0
        bloom = bloom.localCheckpoint(eager=True)

        probe = spark.range(base).selectExpr(
            f"concat('k{mult}-', id) AS key"  # members: must all hit
        )
        t0 = time.time()
        hits = (
            bloom_might_contain(probe, bloom, "key", m, 7)
            .filter("maybe_seen")
            .count()
        )
        bl_probe = time.time() - t0
        assert hits == base, hits

        t0 = time.time()
        from udacity_data_engineering_capstone_project_spark.operators.similarity import (
            train_pca,
        )

        vec = spark.range(n).selectExpr(
            "transform(sequence(0, 15), "
            "j -> CAST(pmod(xxhash64(id, j), 1000) AS DOUBLE) / 1000.0) AS v"
        )
        comps, _mean = train_pca(vec, "v", n_components=4)
        assert len(comps) == 4
        pca_s = time.time() - t0

        out["scales"][str(mult)] = {
            "pca_train_s": round(pca_s, 2),
            "rows": n,
            "ddsketch_build_s": round(dd_build, 2),
            "ddsketch_rows": sk_rows,
            "ddsketch_merge_read_s": round(dd_merge_read, 2),
            "bloom_bits": m,
            "bloom_block_rows": bloom_rows,
            "bloom_build_s": round(bl_build, 2),
            "bloom_probe_100k_s": round(bl_probe, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
