"""Round-11 scale probe (VERDICT r10 #4): PageRank/PPR per-round
shuffle volume AFTER the r10 loop reshape (loop-invariant weight table
pre-partitioned + checkpointed once, alias-preserved ranks side,
driver-action-free unrolled rounds).

The r10 claim to verify: **the only per-round exchange is the
groupBy(v) destination aggregation** — the edge-sized weight table is
exchanged ONCE at setup, never per round. A pre-reshape loop
re-exchanged the edge side every round, so its marginal per-round
shuffle grew O(edges); post-reshape the marginal per-round shuffle is
the destination aggregation's partial-agg output (bounded by
min(edges, nodes x partitions) (node, sum) pairs — node-spine-shaped,
not edge-shaped).

Method: real shuffle bytes from the Spark UI REST API
(/api/v1/applications/{app}/stages), not wall-clock inference. For
each scale the probe runs the SAME fixed-iteration query twice —
max_iter=4 and max_iter=12 — and attributes the DIFFERENCE to the 8
extra rounds: setup (edge checkpoint, weight-table exchange, spine
build) is identical in both runs and cancels, so

    per_round_shuffle = (write_bytes_12 - write_bytes_4) / 8

The pass criterion at each scale: per-round shuffle write stays an
O(min(edges, nodes*partitions)) aggregation payload and grows FAR
slower than the edge table between x1 -> x100 (an edge re-exchange
per round would show marginal bytes ~ the full weight-table exchange,
~16 B/edge/round).

Usage: python tools/scale_probe_pagerank.py
Env: SCALE_PROBE_EDGES (x1 base, default 600000 — the sf0.1
link-graph scale), SCALE_PROBE_SCALES (default "1,10,100"),
SCALE_PROBE_PPR_SCALES (default "1,10,100").
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from udacity_data_engineering_capstone_project_spark.operators.graph import (
    pagerank,
    personalized_pagerank,
)


def _stage_shuffle_bytes(spark) -> tuple[int, int, int]:
    """(sum shuffle write bytes, sum shuffle read bytes, #stages with
    shuffle write) over all COMPLETE stages so far, from the UI REST
    API — the same numbers the Spark UI's stage table shows."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as resp:
        stages = json.load(resp)
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    nw = sum(1 for s in stages if s.get("shuffleWriteBytes", 0) > 0)
    return w, r, nw


def main() -> None:
    base_m = int(os.environ.get("SCALE_PROBE_EDGES", "600000"))
    scales = [int(x) for x in os.environ.get("SCALE_PROBE_SCALES", "1,10,100").split(",")]
    ppr_scales = {
        int(x)
        for x in os.environ.get("SCALE_PROBE_PPR_SCALES", "1,10,100").split(",")
    }
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        # the probe reads its own stage metrics over the UI REST API
        .config("spark.ui.enabled", "true")
        .appName("scale-probe-pagerank")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def web_graph(m: int):
        # deterministic pseudo-random graph, avg out-degree ~10 (web
        # link-graph shape; n = m/10 nodes), plus a guaranteed dangling
        # tail (ids hashed into [n, n + n/10) appear only as dst) so
        # the dangling-mass broadcast path is always exercised
        n = max(m // 10, 10)
        return spark.range(m).selectExpr(
            f"pmod(xxhash64(id), {n}) AS src",
            f"pmod(xxhash64(id, 1), {n + n // 10}) AS dst",
        )

    def measure(fn) -> dict:
        """Run fn at 4 and 12 fixed rounds; attribute the delta to the
        8 marginal rounds."""
        out = {}
        # uncounted warm run: C2 JIT on the loop's generated code
        # otherwise lands inside the FIRST measured run and the
        # 4-round wall reads higher than the 12-round one
        fn(2).agg(F.sum("rank")).collect()
        for rounds in (4, 12):
            w0, r0, n0 = _stage_shuffle_bytes(spark)
            t0 = time.time()
            fn(rounds).agg(F.sum("rank")).collect()
            wall = time.time() - t0
            w1, r1, n1 = _stage_shuffle_bytes(spark)
            out[f"wall_s_{rounds}"] = round(wall, 2)
            out[f"shuffle_write_mb_{rounds}"] = round((w1 - w0) / 1e6, 2)
            out[f"stages_w_shuffle_{rounds}"] = n1 - n0
        out["per_round_wall_s"] = round(
            (out["wall_s_12"] - out["wall_s_4"]) / 8, 3
        )
        out["per_round_shuffle_mb"] = round(
            (out["shuffle_write_mb_12"] - out["shuffle_write_mb_4"]) / 8, 3
        )
        out["per_round_stages_w_shuffle"] = round(
            (out["stages_w_shuffle_12"] - out["stages_w_shuffle_4"]) / 8, 2
        )
        # setup = the one-time cost both runs share: edge checkpoint,
        # out-degree agg, spine build, and the ONE weight-table
        # exchange. A pre-reshape loop would re-pay that weight
        # exchange every round — the comparison column for the claim.
        out["setup_shuffle_mb"] = round(
            out["shuffle_write_mb_4"] - 4 * out["per_round_shuffle_mb"], 2
        )
        return out

    result: dict = {"base_edges": base_m}
    for s in scales:
        m = base_m * s
        e = web_graph(m).persist()
        n_edges = e.count()
        # the weight table is edge-sized and exchanged once at setup;
        # record its one-time exchange size for the comparison column
        # (16 B/edge of (u,v,w) triples is the per-round cost a
        # pre-reshape loop would RE-pay every round)
        entry: dict = {"edges": n_edges}
        entry["pagerank"] = measure(
            lambda rounds: pagerank(e, max_iter=rounds, tol=0.0)
        )
        if s in ppr_scales:
            entry["ppr"] = measure(
                lambda rounds: personalized_pagerank(
                    e, seeds=[1, 2, 3, 5, 8], max_iter=rounds, tol=0.0
                )
            )
        result[f"x{s}"] = entry
        print(f"# x{s}: {json.dumps(entry)}", file=sys.stderr)
        e.unpersist()

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
