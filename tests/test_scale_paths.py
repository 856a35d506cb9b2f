"""Tests for the materialized scale paths: IVF index with partition
pruning, CSV source fidelity."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from udacity_data_engineering_capstone_project_spark.operators.similarity import (
    ivf_topk,
    search_ivf_index,
    write_ivf_index,
)
from udacity_data_engineering_capstone_project_spark.sources.readers import (
    read_csv,
    read_table,
)


def test_ivf_index_roundtrip_matches_inline(spark, sf_dir, tmp_path):
    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0)
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")

    write_ivf_index(emb, centroids, path, "vec_id", "embedding")
    from_index = search_ivf_index(
        spark, path, queries, centroids, "vec_id", "embedding", k=5
    )
    inline = ivf_topk(emb, queries, centroids, "vec_id", "embedding", k=5)
    assert sorted(map(str, from_index.collect())) == sorted(map(str, inline.collect()))

    # the cell join must prune partitions: searching reads fewer files
    # than the full index holds
    searched = from_index
    searched.collect()
    plan = searched._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # partition column participates in the join


def test_csv_all_string_parity_and_declared_schema(spark, tmp_path):
    # Reference behavior (etl.py:67): header read, no inferSchema ->
    # every column string. Engine extension: declared StructType.
    p = tmp_path / "t.csv"
    p.write_text("city,temp\nNYC,20.5\nMIA,25.0\n")
    raw = read_csv(spark, str(p), header=True)
    assert dict(raw.dtypes) == {"city": "string", "temp": "string"}

    schema = StructType(
        [StructField("city", StringType()), StructField("temp", DoubleType())]
    )
    typed = read_csv(spark, str(p), header=True, schema=schema)
    assert dict(typed.dtypes) == {"city": "string", "temp": "double"}
    assert {r["temp"] for r in typed.collect()} == {20.5, 25.0}

    inferred = read_csv(spark, str(p), header=True, infer_schema=True)
    assert dict(inferred.dtypes)["temp"] == "double"


def test_write_clustered_file_ranges_are_tight(spark, sf_dir, tmp_path):
    """Clustered writes must yield files whose cluster-column min/max
    bands are (near-)disjoint — that's what lets parquet predicate
    pushdown skip whole files."""
    import glob

    import pyarrow.parquet as pq

    from udacity_data_engineering_capstone_project_spark.sources.readers import read_table
    from udacity_data_engineering_capstone_project_spark.sources.sinks import write_clustered

    ev = read_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = str(tmp_path / "clustered")
    write_clustered(ev.repartition(8), out, ["user_id"], num_files=4)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1, "expected multiple output files"
    ranges.sort()
    # consecutive files overlap at most at a single boundary key
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"
