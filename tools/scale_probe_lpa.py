"""r10 scale probe: `graph.label_propagation` — the last iterative
heavyweight without its own probe (CC's probe covers component
shapes; LPA differs: a windowed per-node argmax each round, and
synchronous updates can oscillate).

Two shapes at x1/x10/x100:

- cliques: k disjoint 20-cliques. Dense local structure is LPA's
  home turf — every node hears all clique-mates each round, so the
  min label floods a clique in ~2 rounds REGARDLESS of how many
  cliques there are. Claim: rounds constant, wall linear in edges,
  communities == k exactly.
- bipartite: one complete bipartite block (the oscillation
  adversary — synchronous LPA flips sides forever). Claim: the
  max_iter bound holds honestly (rounds == max_iter, no hang), the
  output is still deterministic.

Usage: python tools/scale_probe_lpa.py  (env: SCALE_PROBE_CLIQUES
base clique count, default 50). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.graph import (
    label_propagation,
)

CLIQUE = 20  # nodes per clique; edges per clique = 20*19/2 = 190


def main() -> None:
    base = int(os.environ.get("SCALE_PROBE_CLIQUES", "50"))
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("scale-probe-lpa")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def cliques(k: int):
        # all pairs (i, j), i < j, within each of k cliques of CLIQUE
        # nodes; node id = clique * CLIQUE + member
        return (
            spark.range(k)
            .selectExpr(f"explode(sequence(0, {CLIQUE - 2})) AS i", "id AS c")
            .selectExpr(
                "c", "i", f"explode(sequence(i + 1, {CLIQUE - 1})) AS j"
            )
            .selectExpr(
                f"c * {CLIQUE} + i AS src", f"c * {CLIQUE} + j AS dst"
            )
        )

    out = {}
    for mult in (1, 10, 100):
        k = base * mult
        edges = cliques(k).localCheckpoint(eager=True)
        m = edges.count()
        t0 = time.time()
        labels = label_propagation(edges, max_iter=10)
        n_comm = labels.select("label").distinct().count()
        wall = round(time.time() - t0, 2)
        assert n_comm == k, (mult, n_comm, k)
        out[f"cliques_x{mult}"] = {
            "cliques": k,
            "edges": m,
            "communities": n_comm,
            "wall_s": wall,
        }

    # oscillation adversary: complete bipartite K(200, 200) —
    # synchronous LPA alternates side labels; max_iter must bound it
    # and the result must still be deterministic (run twice, compare).
    half = 200
    bip = (
        spark.range(half)
        .selectExpr("id AS src", f"explode(sequence({half}, {2 * half - 1})) AS dst")
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    l1 = label_propagation(bip, max_iter=6)
    h1 = l1.agg(F.sum(F.hash("node", "label"))).collect()[0][0]
    wall = round(time.time() - t0, 2)
    h2 = (
        label_propagation(bip, max_iter=6)
        .agg(F.sum(F.hash("node", "label")))
        .collect()[0][0]
    )
    assert h1 == h2, "bipartite LPA must be deterministic run-to-run"
    out["bipartite_k200"] = {
        "edges": half * half,
        "wall_s_6_rounds": wall,
        "deterministic": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
