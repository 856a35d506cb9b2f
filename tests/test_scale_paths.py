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
    # centroids=None resolves the quantizer persisted with the index
    from_index = search_ivf_index(
        spark, path, queries, None, "vec_id", "embedding", k=5
    )
    inline = ivf_topk(emb, queries, centroids, "vec_id", "embedding", k=5)
    assert sorted(map(str, from_index.collect())) == sorted(map(str, inline.collect()))

    # the cell join must prune partitions: searching reads fewer files
    # than the full index holds
    searched = from_index
    searched.collect()
    plan = searched._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan  # partition column participates in the join


def test_ivf_index_incremental_add(spark, sf_dir, tmp_path):
    """Appending a batch through the index's own persisted quantizer
    equals rebuilding the index over the union — and only the new
    rows' cells are written (no rescan of existing cells)."""
    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        add_to_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 3)

    path = str(tmp_path / "ivf_inc")
    write_ivf_index(first, centroids, path, "vec_id", "embedding")
    add_to_ivf_index(spark, path, second, "vec_id", "embedding")
    incremental = search_ivf_index(
        spark, path, queries, None, "vec_id", "embedding", k=5
    )

    full_path = str(tmp_path / "ivf_full")
    write_ivf_index(emb, centroids, full_path, "vec_id", "embedding")
    rebuilt = search_ivf_index(
        spark, full_path, queries, None, "vec_id", "embedding", k=5
    )
    assert sorted(map(str, incremental.collect())) == sorted(
        map(str, rebuilt.collect())
    )


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


def test_write_zordered_skips_on_every_dimension(spark, tmp_path):
    """Z-order layout must keep per-file min/max bands narrow on BOTH
    cluster columns (lexicographic clustering only bounds the leading
    one), so a filter on either column alone can skip most files."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.sinks import write_zordered

    n = 1 << 14
    grid = 1 << 7  # 128 x 128 grid, x and y independent
    df = (
        spark.range(n)
        .select(
            (F.col("id") % grid).alias("x"),
            (F.col("id") / grid).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["x", "y"], num_files=16)

    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ix, iy = names.index("x"), names.index("y")
        sx = [md.row_group(i).column(ix).statistics for i in range(md.num_row_groups)]
        sy = [md.row_group(i).column(iy).statistics for i in range(md.num_row_groups)]
        spans.append(
            (
                max(s.max for s in sx) - min(s.min for s in sx),
                max(s.max for s in sy) - min(s.min for s in sy),
            )
        )
    assert len(spans) >= 8, "expected many output files"
    # 16 z-curve segments over a 128x128 grid -> each file covers about a
    # 32x32 block; allow generous slack for range-sampling boundaries but
    # stay far below the full 127-wide domain a lexicographic sort leaves
    # on the trailing column.
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x <= 0.55 * (grid - 1), f"x spans too wide: {spans}"
    assert avg_y <= 0.55 * (grid - 1), f"y spans too wide: {spans}"

    # roundtrip: layout must not change the data
    assert spark.read.parquet(out).count() == n


def test_zorder_key_constant_and_null_columns(spark):
    """Degenerate inputs must not divide by zero or emit nulls: a
    constant column contributes zero bits, null values scale to the
    minimum code."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_capstone_project_spark.sources.sinks import zorder_key

    df = spark.range(100).select(
        F.col("id").alias("a"),
        F.lit(7).alias("b"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("c"),
    )
    keyed = zorder_key(df, ["a", "b", "c"], bits=8)
    assert keyed.filter(F.col("__zorder").isNull()).count() == 0
    assert keyed.count() == 100


def test_ivf_index_int8_storage_and_rerank(spark, sf_dir, tmp_path):
    """quantize=True stores int8 cells (~4x smaller payload), search
    dequantizes transparently, and rerank_with restores exact-cosine
    ordering: reranked top-k must match the full-precision index's
    top-k exactly; quantized-only scores stay within the documented
    per-component error bound."""
    import glob
    import os as _os

    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        add_to_ivf_index,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0)
    queries = emb.filter(F.col("vec_id") < 5)

    full_path = str(tmp_path / "ivf_full")
    q8_path = str(tmp_path / "ivf_q8")
    write_ivf_index(emb, centroids, full_path, "vec_id", "embedding")
    write_ivf_index(emb, centroids, q8_path, "vec_id", "embedding", quantize=True)

    def cells_bytes(p):
        return sum(
            _os.path.getsize(f)
            for f in glob.glob(f"{p}/cells/**/*.parquet", recursive=True)
        )

    # int8 cells must be materially smaller (4x on the vector payload;
    # parquet framing dilutes it, so pin a conservative 2x)
    assert cells_bytes(q8_path) * 2 < cells_bytes(full_path)

    exact = search_ivf_index(
        spark, full_path, queries, None, "vec_id", "embedding", k=5
    ).collect()
    reranked = search_ivf_index(
        spark, q8_path, queries, None, "vec_id", "embedding", k=5,
        rerank_with=emb,
    ).collect()
    # exact-cosine rerank of the int8 shortlist reproduces the
    # full-precision result bit-for-bit (scores are exact again)
    assert sorted(map(str, reranked)) == sorted(map(str, exact))

    # quantized-only search: same neighbors allowed to reorder only
    # within quantization error; scores within the error bound
    q_only = search_ivf_index(
        spark, q8_path, queries, None, "vec_id", "embedding", k=5
    ).collect()
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in q_only:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cos_sim"] - exact_scores[key]) < 0.02

    # incremental adds follow the index's storage format: appending to
    # an int8 index stays int8 and searchable
    add_to_ivf_index(
        spark, q8_path, emb.limit(0), "vec_id", "embedding"
    )  # schema-only append exercises the format detection
    still = search_ivf_index(
        spark, q8_path, queries, None, "vec_id", "embedding", k=5,
        rerank_with=emb,
    ).collect()
    assert sorted(map(str, still)) == sorted(map(str, exact))
