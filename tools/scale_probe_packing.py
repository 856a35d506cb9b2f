"""r9 scale probe: `operators.packing.pack_sequences` at x1/x10/x100
synthetic item volume (200k / 2M / 20M items).

What it evidences for the 100 TB design review:
- the in-bucket first-fit is O(n log n) via the capacity segment tree
  — the single-bucket A/B below shows the textbook scan going
  quadratic while the tree stays near-linear (identical assignment,
  equality test-pinned in tests/test_sampling_and_signals.py);
- bucket count auto-scales with the item count (buckets=None), so
  per-task group memory is bounded by _AUTO_BUCKET_ITEMS at any
  corpus size and the applyInPandas stage parallelizes with the data;
- budget invariant (no pack over budget) and exact-once coverage are
  re-asserted distributed at every tier, not just in unit tests.

Usage: python tools/scale_probe_packing.py
(env: SCALE_PROBE_MULTS default "1,10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_BASE_ITEMS = 200_000
_BUDGET = 2048


def _single_bucket_ab() -> dict:
    """Pure-Python scan-vs-tree wall at growing bucket sizes: the
    algorithmic story without cluster noise. Scan is capped at 20k
    items (its quadratic cost is the point being demonstrated)."""
    import random

    from udacity_data_engineering_capstone_project_spark.operators.packing import (
        _ffd_scan,
        _ffd_tree,
    )

    rng = random.Random(11)
    out = {}
    for n in (2_000, 20_000, 200_000):
        lens = sorted((rng.randrange(1, 500) for _ in range(n)), reverse=True)
        ids = list(range(n))
        t0 = time.time()
        tree_rows = _ffd_tree(ids, lens, _BUDGET)
        tree_s = round(time.time() - t0, 3)
        entry = {"tree_sec": tree_s,
                 "n_packs": len({p for _, p, _ in tree_rows})}
        if n <= 20_000:
            t0 = time.time()
            scan_rows = _ffd_scan(ids, lens, _BUDGET)
            entry["scan_sec"] = round(time.time() - t0, 3)
            assert scan_rows == tree_rows, f"scan/tree divergence at n={n}"
        out[f"n{n}"] = entry
    return out


def main() -> None:
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators.packing import (
        pack_sequences,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    results = {"single_bucket_ab": _single_bucket_ab()}

    spark = get_spark(app_name="packing-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for mult in mults:
        # auto-sizing (buckets=None) persists the (id, len) slice for
        # the plan's lifetime; drop prior tiers' caches so each tier's
        # timing measures a clean store (review finding r10)
        spark.catalog.clearCache()
        n_items = _BASE_ITEMS * mult
        items = spark.range(0, n_items).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(500)) + 1).alias("n_tokens"),
        )
        t0 = time.time()
        packed = pack_sequences(items, "id", "n_tokens", budget=_BUDGET)
        joined = packed.join(items, on="id")
        audit = joined.groupBy("pack_id").agg(
            F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n")
        ).agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.max("tot").alias("max_pack_total"),
            F.sum("tot").alias("token_sum"),
            F.sum("n").alias("item_sum"),
        ).collect()[0]
        wall = round(time.time() - t0, 2)
        assert audit["max_pack_total"] <= _BUDGET, audit
        assert audit["item_sum"] == n_items, audit
        results[f"x{mult}"] = {
            "items": n_items,
            "wall_sec": wall,
            "n_packs": audit["n_packs"],
            "fill_ratio": round(
                audit["token_sum"] / (_BUDGET * audit["n_packs"]), 4
            ),
        }
        print(f"x{mult}: {results[f'x{mult}']}", file=sys.stderr)

    print(json.dumps({"probe": "packing", "budget": _BUDGET, **results}))


if __name__ == "__main__":
    main()
