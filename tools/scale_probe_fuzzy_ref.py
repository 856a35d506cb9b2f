"""r10 scale probe (VERDICT r9 #3): `fuzzy_join_reference` — dirty
corpus matched against a SMALL clean dimension at x1/x10/x100 of the
dirty side, dim held fixed.

What it evidences for the 100 TB design review:
- the dim's exploded deletion neighborhood broadcasts (inflation-
  discounted size gate), so the corpus side NEVER shuffles for the
  candidate join — wall should scale linearly with the dirty rows
  (each pays its own O(L^k) key explode, map-side);
- the only shuffle is the candidate-sized best-match groupBy, bounded
  by match density, not corpus size.

Usage: python tools/scale_probe_fuzzy_ref.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_MULTS default "1,10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        fuzzy_join_reference,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark

    spark = get_spark(app_name="fuzzy-ref-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # clean dim: the distinct first-3-word titles of the BASE corpus
    # (fixed across tiers — the entity-resolution regime: dim is a
    # curated lookup, the dirty side is the firehose).
    dim = (
        docs.select(
            F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("title")
        )
        .distinct()
        .select(
            F.row_number().over(Window.orderBy("title")).cast("bigint")
            .alias("dim_id"),
            "title",
        )
        .localCheckpoint(eager=True)
    )
    n_dim = dim.count()

    base_titles = docs.select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("title"),
    ).localCheckpoint(eager=True)

    def dirty_tier(mult: int):
        """mult unions of the base titles, each under a DIFFERENT typo
        (delete one character at a per-copy position + append a
        per-copy suffix letter = Levenshtein <= 2 from the clean
        title) and a disjoint id range — the match-DENSE regime, so
        every tier exercises the verify + best-match stages at full
        volume, not just the key explode (the letter-bijection
        replicas of tools/replicate.py would decorrelate the copies
        from the FIXED dim and match nothing)."""
        parts = []
        for i in range(mult):
            pos = 2 + (i % 3)
            suf = "xyz"[i % 3]
            parts.append(
                base_titles.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("rec_id"),
                    F.concat(
                        F.expr(
                            f"concat(substring(title, 1, {pos - 1}),"
                            f" substring(title, {pos + 1}, 1000000))"
                        ),
                        F.lit(suf),
                    ).alias("title"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    results = {}
    for mult in mults:
        tier = f"x{mult}"
        dirty = dirty_tier(mult).localCheckpoint(eager=True)
        n_dirty = dirty.count()
        fuzzy_join_reference(
            dirty, "rec_id", "title", dim, "dim_id", "title", max_distance=2
        ).count()  # warm
        best, matched = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            matched = fuzzy_join_reference(
                dirty, "rec_id", "title", dim, "dim_id", "title", max_distance=2
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[tier] = {
            "dirty_rows": n_dirty,
            "dim_rows": n_dim,
            "matched": matched,
            "wall_sec": round(best, 2),
            "rows_per_sec": round(n_dirty / best, 1),
        }
        print(f"# {tier}: {results[tier]}", file=sys.stderr)
    print(json.dumps({"probe": "fuzzy_join_reference", "sf_dir": sf_dir,
                      "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
