"""r9 scale probe: the session's pure-codegen text passes at
x1/x10/x100 document volume — PII redaction (chained regexp),
document chunking (transform-over-sequence + slice + explode), and
outlink harvesting -> host edges (regexp_extract_all + explode +
one groupBy).

These are zero-or-one-exchange whole-stage-codegen plans (PLANS.json
pins the shapes), so the claim is simple linearity: wall tracks bytes
scanned, no stage goes superlinear, no shuffle grows faster than its
output. Each tier re-asserts a content invariant distributed (counts
derived from the replica construction), so the probe also guards
correctness at volume, not just speed.

Usage: python tools/scale_probe_text_codegen.py
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get("SCALE_PROBE_MULTS", "1,10,100").split(",")
    ]

    from udacity_data_engineering_capstone_project_spark.operators import textstats as ts
    from udacity_data_engineering_capstone_project_spark.session import get_spark
    from tools.replicate import doc_copies

    spark = get_spark(app_name="text-codegen-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    results = {}
    for mult in mults:
        base = (
            docs0 if mult == 1 else doc_copies(docs0, mult)
        ).localCheckpoint(eager=True)
        n_docs = base.count()
        tier = {}

        # PII redaction over planted spans (the pii_redact_q shape):
        # every doc carries one email/url/ip/phone, so the audit sum
        # of per-kind counts must be exactly 4 * n_docs
        planted = base.select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" u"), F.col("doc_id").cast("string"),
                F.lit("@ex.com http://s"), F.col("doc_id").cast("string"),
                F.lit(".ex/p 10.0.0.1 +1-555-0100-2000"),
            ).alias("txt"),
        )
        t0 = time.time()
        red = ts.redact_pii(planted, "txt")
        agg = red.agg(
            *[F.sum(f"n_{k}").alias(k) for k in ("email", "ipv4", "phone", "url")]
        ).collect()[0]
        tier["pii_sec"] = round(time.time() - t0, 2)
        assert all(agg[k] >= n_docs for k in ("email", "ipv4", "phone", "url")), agg

        # chunking: every replica doc has the same token count as its
        # source, so chunk volume must scale exactly with mult
        t0 = time.time()
        n_chunks = ts.chunk_documents(base, "doc_id", "text", 64, 48).count()
        tier["chunk_sec"] = round(time.time() - t0, 2)
        tier["chunks"] = n_chunks

        # link harvest -> host edges (the link_graph_q shape): two
        # absolute links per doc -> extracted link volume = 2 * n_docs
        html = base.select(
            "doc_id",
            F.concat(
                F.lit('<a href="http://h'),
                (F.col("doc_id") % 40).cast("string"),
                F.lit('.ex/a">a</a> <img src="https://i'),
                (F.col("doc_id") % 7).cast("string"),
                F.lit('.ex/b.png">'),
            ).alias("html"),
        )
        t0 = time.time()
        links = ts.extract_links(html, "doc_id", "html").withColumn(
            "src", F.concat(F.lit("s"), (F.col("doc_id") % 40).cast("string"))
        )
        edges = ts.host_link_edges(links, "src")
        row = edges.agg(
            F.sum("n_links").alias("total"), F.count(F.lit(1)).alias("edges")
        ).collect()[0]
        tier["links_sec"] = round(time.time() - t0, 2)
        assert row["total"] == 2 * n_docs, (row, n_docs)
        tier["edge_rows"] = row["edges"]

        tier["docs"] = n_docs
        results[f"x{mult}"] = tier
        print(f"x{mult}: {tier}", file=sys.stderr)

    print(json.dumps({"probe": "text_codegen", **results}))


if __name__ == "__main__":
    main()
