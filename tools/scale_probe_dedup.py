"""Round-4 scale probe: the dedup/LSH tier at sf0.1 and on 10x/100x
replicated inputs — the linear-scaling evidence BASELINE.md records.

Replication must create REAL corpus growth, not duplicate blowup: a
100x corpus of verbatim copies would make every document a near-dup of
its 99 siblings and measure a quadratic pair explosion no real corpus
has. Instead each copy applies a per-copy bijection that preserves the
similarity structure WITHIN the copy and destroys it ACROSS copies:

- documents: a per-copy random permutation of the letters (applied to
  both cases; `translate` is one JVM expression). Char-shingle sets
  map bijectively, so every true near-dup pair of the base corpus
  reappears in every copy with the SAME Jaccard, while cross-copy
  shingles are unrelated — the 100x corpus behaves like 100
  independent crawls of equal dup density.
- embeddings: a per-copy random permutation of the vector components.
  Inner products (hence cosine) are permutation-invariant within a
  copy; cross-copy alignment decorrelates.

Inputs are materialized to parquet first so each probe measures the
operator over a disk scan. Shuffle bytes come from the UI REST API.

Usage: python tools/scale_probe_dedup.py  (env: SPARK_GRAFT_SF_DIR,
SCALE_PROBE_COPIES default "10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from tools.replicate import doc_copies, vec_copies


def _shuffle_write_bytes(port: int) -> int | None:
    try:
        apps = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications", timeout=5
            )
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=5,
            )
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies_list = [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10,100").split(",")
    ]
    ui_port = 4056

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.operators import dedup as dd
    from udacity_data_engineering_capstone_project_spark.operators import similarity as sim
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table

    spark = get_spark(
        app_name="scale-probe-dedup",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(ui_port)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_dedup_")

    docs1 = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    vecs1 = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    inputs = {"docs": {1: docs1}, "vecs": {1: vecs1}}
    for c in copies_list:
        dp, vp = f"{work}/docs{c}x", f"{work}/vecs{c}x"
        doc_copies(docs1, c).repartition(32).write.mode("overwrite").parquet(dp)
        vec_copies(vecs1, c).repartition(32).write.mode("overwrite").parquet(vp)
        inputs["docs"][c] = spark.read.parquet(dp)
        inputs["vecs"][c] = spark.read.parquet(vp)

    import math

    def embedding_probe(df, copies):
        # num_planes is left to the operator's auto_num_planes default
        # (8 + log2(n/5000) from one corpus count) — the probe verifies
        # the autosizing holds bucket occupancy (hence per-bucket
        # quadratic join work) constant at 10x/100x without the caller
        # hand-deriving the old log2(growth) rule.
        return sim.lsh_near_dup_pairs(
            df,
            id_col="vec_id",
            vec_col="embedding",
            threshold=0.2,
            dim=64,
            num_tables=8,
        ).count()

    probes = {
        "minhash": lambda df, c: dd.minhash_dedup_pairs(
            df, "doc_id", "text"
        ).count(),
        # r7: the VERIFIED contract (candidates -> estimate screen ->
        # exact hash-set Jaccard). Work beyond the est path is
        # proportional to screened candidates (near-linear under the
        # banding s-curve x the fixed 2-sigma screen) — this probe is
        # the evidence that the exact-verification stage holds that
        # line at 10x/100x.
        "minhash_verified": lambda df, c: dd.minhash_verified_pairs(
            df, "doc_id", "text"
        ).count(),
        # ExactSubstr spans: fingerprint shuffle is linear in corpus
        # tokens by design — this probe is the evidence
        "dup_spans": lambda df, c: dd.duplicated_spans(
            df, "doc_id", "text", min_tokens=12
        ).count(),
        "simhash": lambda df, c: dd.simhash_near_pairs(
            dd.simhash_signatures(df, "doc_id", "text").localCheckpoint(eager=True),
            "doc_id",
            max_hamming=3,
        ).count(),
        "embedding_lsh": embedding_probe,
    }
    only = os.environ.get("SCALE_PROBE_ONLY")

    results = {}
    for name, probe in probes.items():
        if only and name not in only.split(","):
            continue
        kind = "vecs" if name == "embedding_lsh" else "docs"
        base = inputs[kind][1]
        # steady state: warm the generated code paths before timing
        for _ in range(2):
            probe(base, 1)
        entry = {}
        for c in [1] + copies_list:
            df = inputs[kind][c]
            # isolate probes from each other's cache/GC debt
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            sw0 = _shuffle_write_bytes(ui_port)
            wall, pairs = _timed(lambda: probe(df, c))
            sw1 = _shuffle_write_bytes(ui_port)
            entry[f"x{c}"] = {
                "wall_s": wall,
                "pairs": pairs,
                "shuffle_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 is not None and sw1 is not None
                else None,
            }
        results[name] = entry
        print(f"# {name}: {entry}", file=sys.stderr)

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
