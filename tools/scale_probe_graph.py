"""Round-4 scale probe: triangle counting under hub skew. The claim
behind the degree orientation: a hub node (degree ~ n) contributes
ZERO wedges because all its edges orient INTO it, so adding a hub to
a sparse graph must not blow up the wedge join (a naive undirected
3-way join would enumerate C(deg_hub, 2) ~ n^2/2 wedges from the hub
alone).

Usage: python tools/scale_probe_graph.py  (env: SCALE_PROBE_NODES
default 20000, SCALE_PROBE_EDGES default 100000). Prints one JSON
line with wall times for the sparse graph, the same graph + hub, and
a 10x-edges variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.graph import triangle_count


def main() -> None:
    n = int(os.environ.get("SCALE_PROBE_NODES", "20000"))
    m = int(os.environ.get("SCALE_PROBE_EDGES", "100000"))
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("scale-probe-graph")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def sparse(edges: int):
        # deterministic pseudo-random sparse graph
        return spark.range(edges).selectExpr(
            f"pmod(xxhash64(id), {n}) AS src",
            f"pmod(xxhash64(id, 1), {n}) AS dst",
        )

    def run(edges_df):
        t0 = time.time()
        total = edges_df.count(), triangle_count(edges_df).agg(
            F.sum("n_triangles")
        ).first()[0]
        return round(time.time() - t0, 2), total[1]

    out = {}
    base = sparse(m)
    out["sparse_m"] = dict(zip(("wall_s", "tri_sum"), run(base)))

    hub = base.unionByName(
        spark.range(n).selectExpr(f"CAST({n} AS BIGINT) AS src", "id AS dst")
    )
    out["sparse_m_plus_hub"] = dict(zip(("wall_s", "tri_sum"), run(hub)))

    out["sparse_10m"] = dict(zip(("wall_s", "tri_sum"), run(sparse(10 * m))))
    print(json.dumps({"nodes": n, "edges": m, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
