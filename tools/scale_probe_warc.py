"""Round-6 scale probe: WARC ingestion (sources/warc.py) at 1x/10x
segment volume. The claims to verify:

1. Write and read wall grow ~linearly with total bytes (the split is a
   map-only stage — no shuffle to go super-linear on).
2. Parallelism is file-granular: with segments >= cores, all cores
   stay busy, so doubling files at fixed bytes/file doubles throughput
   until cores saturate.
3. Read throughput (records/s and MB/s) holds flat across tiers — the
   per-record Python cost is constant.

Each tier writes its own .warc.gz corpus (documents replicated via the
per-copy bijection so payload entropy, and therefore gzip work, is
realistic), then times read_warc -> count and the decode-to-text
bridge. Usage: python tools/scale_probe_warc.py
(env: SCALE_PROBE_COPIES default "10"). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from tools.replicate import doc_copies
from udacity_data_engineering_capstone_project_spark.sources.warc import (
    read_warc,
    warc_documents,
    write_warc,
)


def main() -> None:
    copies = [1] + [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10").split(",")
    ]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("scale-probe-warc")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    out: dict[str, dict] = {}
    for c in copies:
        docs = doc_copies(base, c) if c > 1 else base.select("doc_id", "text")
        docs = docs.withColumn(
            "url",
            F.concat(F.lit("http://h"), (F.col("doc_id") % 97).cast("string"),
                     F.lit(".com/p/"), F.col("doc_id").cast("string")),
        )
        tmp = tempfile.mkdtemp(prefix=f"warc_probe_{c}x_")
        # fixed file count = growing bytes/file, the real-crawl shape
        # (segments are sized ~1 GB; a bigger round means bigger /
        # more-but-core-saturating segments, never thousands of tiny
        # files — a 32*c variant measured file-create overhead, not
        # the codec: 38 s to write 3 200 files of 5 KB)
        n_files = 32
        t0 = time.perf_counter()
        manifest = write_warc(
            docs, tmp, payload_col="text", uri_col="url", num_files=n_files
        )
        w_wall = time.perf_counter() - t0
        total_bytes = sum(m["bytes"] for m in manifest)
        total_recs = sum(m["records"] for m in manifest)

        t0 = time.perf_counter()
        n_read = read_warc(spark, tmp).count()
        r_wall = time.perf_counter() - t0
        assert n_read == total_recs, (n_read, total_recs)

        t0 = time.perf_counter()
        n_chars = (
            warc_documents(spark, tmp)
            .agg(F.sum(F.length("text")))
            .collect()[0][0]
        )
        d_wall = time.perf_counter() - t0

        out[f"{c}x"] = {
            "records": total_recs,
            "files": len(manifest),
            "mb": round(total_bytes / 1e6, 1),
            "write_s": round(w_wall, 2),
            "read_s": round(r_wall, 2),
            "decode_s": round(d_wall, 2),
            "read_krecs_per_s": round(total_recs / r_wall / 1e3, 1),
            "decoded_mchars": round((n_chars or 0) / 1e6, 1),
        }
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"probe": "warc", "tiers": out}))
    spark.stop()


if __name__ == "__main__":
    main()
