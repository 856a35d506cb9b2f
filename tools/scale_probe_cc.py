"""Round-10 scale probe (VERDICT r9 #4): connected_components —
the most expensive bench row (dedup_clusters, 3.6 s) and the only
heavyweight without its own probe. The open question at 100 TB: how
does the pointer-jumping loop's per-round shuffle volume scale with
the COMPONENT-SIZE DISTRIBUTION, not just the edge count?

Three shapes, each at x1/x10/x100 edges:

- shallow: near-dup regime — millions of size-3 clusters (diameter 2).
  The claim: rounds stay CONSTANT (2-3) as edges grow 100x, so total
  wall is rounds x linear-shuffle = linear.
- chain: adversarial diameter — ONE path of n nodes. The claim:
  pointer jumping converges in O(log2 n) rounds, not O(n) (min-label
  alone would need n rounds; at x100 = 200k-node chain that is the
  difference between ~19 rounds and 200k).
- star_skew: one hub with 30% of all nodes as spokes + shallow rest —
  the skewed-key case (every spoke adopts the hub's label; the
  groupBy(node) key space stays uniform, the SKEW is in the label
  VALUE column, so no single reducer hot key should appear).

Per-round walls come from connected_components(on_round=...) — the
callback reads the convergence monitor's aggregate, zero extra jobs.

Usage: python tools/scale_probe_cc.py  (env: SCALE_PROBE_EDGES base
edge count, default 20000). Prints one JSON line:
{shape: {xN: {edges, rounds, walls_s, total_s, n_components}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.dedup import (
    connected_components,
)


def main() -> None:
    base = int(os.environ.get("SCALE_PROBE_EDGES", "20000"))
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("scale-probe-cc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def shallow(m: int):
        # m edges = ceil(m/2) clusters of <=3 nodes {3k, 3k+1, 3k+2}:
        # edges (3k, 3k+1), (3k, 3k+2) — diameter 2, min-label = 3k
        # (an odd m leaves the last cluster with one edge; the
        # component count is ceil, not floor — review finding r10).
        return (
            spark.range(m)
            .selectExpr(
                "3 * (id DIV 2) AS id_a",
                "3 * (id DIV 2) + 1 + (id % 2) AS id_b",
            ),
            (m + 1) // 2,  # expected components
        )

    def chain(m: int):
        # one path 0-1-2-...-m: worst-case diameter, 1 component.
        return spark.range(m).selectExpr("id AS id_a", "id + 1 AS id_b"), 1

    def star_skew(m: int):
        # 30% of edges into ONE hub (node 0), rest shallow clusters
        # over a disjoint id range.
        hub_m = (3 * m) // 10
        hub = spark.range(hub_m).selectExpr(
            "CAST(0 AS BIGINT) AS id_a", "id + 1 AS id_b"
        )
        rest, rest_c = shallow(m - hub_m)
        rest = rest.selectExpr(
            f"id_a + {hub_m + 10} AS id_a", f"id_b + {hub_m + 10} AS id_b"
        )
        return hub.unionByName(rest), 1 + rest_c

    out = {}
    for shape_name, maker in (
        ("shallow", shallow),
        ("chain", chain),
        ("star_skew", star_skew),
    ):
        out[shape_name] = {}
        for mult in (1, 10, 100):
            m = base * mult
            edges, want_components = maker(m)
            walls: list[float] = []
            t0 = time.time()
            labels = connected_components(
                edges,
                max_iter=40,
                on_round=lambda r, w, s: walls.append(round(w, 2)),
            )
            n_comp = labels.select("component").distinct().count()
            total = round(time.time() - t0, 2)
            assert n_comp == want_components, (
                shape_name, mult, n_comp, want_components
            )
            out[shape_name][f"x{mult}"] = {
                "edges": m,
                "rounds": len(walls),
                "walls_s": walls,
                "total_s": total,
                "n_components": n_comp,
            }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
