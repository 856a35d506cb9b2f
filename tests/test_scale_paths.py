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
