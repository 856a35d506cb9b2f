"""r9 scale probe: BPE training + tokenization (textstats.
train_bpe_merges / bpe_tokenize) at x1/x10/x100 document volume.

What it evidences for the 100 TB design review:
- training touches the corpus ONCE (the distinct-(word, count)
  collapse); every merge round then runs on vocabulary-sized data, so
  train wall = one linear corpus pass + ~constant round cost — the
  x100 tier should cost far less than 100x the x1 tier;
- tokenization's Python stage sees only the DISTINCT words (the
  letter-bijection replicas multiply the vocab ~linearly — the worst
  case for the claim; natural corpora saturate); the corpus maps
  through an equi-join, so token volume scales linearly but the UDF
  work scales with vocabulary.

Usage: python tools/scale_probe_bpe.py
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1,
SCALE_PROBE_MULTS default "1,10,100"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_NUM_MERGES = 12
_MAX_TOKEN_LEN = 16


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators.textstats import (
        bpe_tokenize,
        train_bpe_merges,
    )
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from tools.replicate import doc_copies

    spark = get_spark(app_name="bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    results = {}
    for mult in mults:
        base = (docs if mult == 1 else doc_copies(docs, mult)).localCheckpoint(
            eager=True
        )
        n_docs = base.count()
        vocab = base.select(
            F.explode(F.split(F.lower("text"), "\\s+")).alias("w")
        ).filter(F.col("w") != "").distinct().count()

        t0 = time.time()
        merges = train_bpe_merges(
            base, "text", num_merges=_NUM_MERGES, max_token_len=_MAX_TOKEN_LEN
        )
        train_wall = round(time.time() - t0, 2)

        t0 = time.time()
        tok = bpe_tokenize(base, "doc_id", "text", merges)
        agg = tok.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_bpe_tokens").alias("total_tokens"),
        ).collect()[0]
        tok_wall = round(time.time() - t0, 2)
        assert agg["rows"] == n_docs, (agg, n_docs)

        results[f"x{mult}"] = {
            "docs": n_docs,
            "vocab": vocab,
            "n_merges": len(merges),
            "train_sec": train_wall,
            "tokenize_sec": tok_wall,
            "total_tokens": int(agg["total_tokens"]),
        }
        print(f"x{mult}: {results[f'x{mult}']}", file=sys.stderr)

    print(json.dumps({"probe": "bpe", "num_merges": _NUM_MERGES, **results}))


if __name__ == "__main__":
    main()
