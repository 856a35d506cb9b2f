"""r9 probe (r8 VERDICT #5): measure the literal-vs-broadcast
prefilter crossover of `screen_blocked_terms` AT the
`_BLOCKLIST_LITERAL_MAX` boundary, on a 100x-replica corpus.

The r8 fast path (one array-literal `arrays_overlap` prefilter that
keeps the corpus scan in whole-stage codegen) was measured 2.5x
faster than the one-row crossJoin(broadcast) — but on a 4-entry
blocklist. A literal array is linear-scanned per token, so the win
must shrink as the list grows; this probe times BOTH paths at a
ladder of unique-first-token counts spanning the 64 cutover, each
path forced via `_BLOCKLIST_LITERAL_MAX` (10**9 -> always literal,
0 -> always broadcast). Phrases are real corpus words (the prefilter
does real work) padded with distinct synthetic tokens to hit each
ladder rung exactly.

Usage: python tools/scale_probe_blocklist.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_COPIES default 100,
SCALE_PROBE_SIZES default "4,16,32,64,96,128,256").
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = int(os.environ.get("SCALE_PROBE_COPIES", "100"))
    sizes = [
        int(s)
        for s in os.environ.get(
            "SCALE_PROBE_SIZES", "4,16,32,64,96,128,256"
        ).split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators import textstats as ts
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from tools.replicate import doc_copies

    spark = get_spark(app_name="blocklist-boundary-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    work = tempfile.mkdtemp(prefix="blocklist_ab_")
    results = {}
    try:
        # materialize the replica once so every timed run scans the
        # SAME parquet input (not a re-derived union plan)
        rep_path = os.path.join(work, "replica")
        doc_copies(docs, copies).write.parquet(rep_path)
        corpus = spark.read.parquet(rep_path)
        n_docs = corpus.count()

        # real REPLICA words (the letter bijection permutes every
        # copy, so base-corpus words never occur) — deterministic
        # frequency order so every run builds the same lists
        words = [
            r.w
            for r in (
                corpus.select(
                    F.explode(
                        F.array_distinct(
                            F.split(ts.padded_norm_text("text"), " ")
                        )
                    ).alias("w")
                )
                .filter(F.length("w") >= 4)
                .groupBy("w")
                .count()
                .orderBy(F.col("count").desc(), F.col("w"))
                .limit(max(sizes) + 8)
                .collect()
            )
        ]

        default_max = ts._BLOCKLIST_LITERAL_MAX
        for n in sizes:
            # constant downstream work across rungs: the same 4 real
            # single-word phrases match at every n; the other n-4
            # entries carry a REAL corpus first token (the prefilter
            # passes those docs — the realistic regime) but a verify-
            # rejected second token, so only prefilter + verify cost
            # varies with n, never the emitted row count
            phrases = words[:4] + [
                f"{words[4 + i]} zqxmiss{i:04d}" for i in range(n - 4)
            ]
            row = {}
            for path, forced in (("literal", 10**9), ("broadcast", 0)):
                ts._BLOCKLIST_LITERAL_MAX = forced
                try:
                    # steady state: two uncounted warm runs, then best
                    # of 3 (the bench harness convention)
                    for _ in range(2):
                        ts.screen_blocked_terms(
                            corpus, "doc_id", phrases
                        ).count()
                    best, rows = None, 0
                    for _ in range(3):
                        t0 = time.perf_counter()
                        rows = ts.screen_blocked_terms(
                            corpus, "doc_id", phrases
                        ).count()
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                finally:
                    ts._BLOCKLIST_LITERAL_MAX = default_max
                row[path] = round(best, 3)
                # per-path counts: the A/B exists to catch the two
                # prefilter paths DIVERGING, so never let one count
                # overwrite the other (r9 self-review)
                row[f"match_rows_{path}"] = rows
            assert row["match_rows_literal"] == row["match_rows_broadcast"], row
            row["literal_over_broadcast"] = round(
                row["literal"] / row["broadcast"], 3
            )
            results[str(n)] = row
            print(f"# n={n}: {row}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "probe": "blocklist_literal_boundary",
                "sf_dir": sf_dir,
                "copies": copies,
                "docs": n_docs,
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
