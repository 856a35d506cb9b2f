"""Streaming semantic screen against a persisted IVF index
(`stream_screen_against_ivf` + the delta plumbing it rides on):
verdict correctness, admitted-state growth across batches, the
crash-after-delta-append replay guard, layout rejection, and delta
compaction equivalence."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from udacity_data_engineering_capstone_project_spark.operators.similarity import (
    add_to_ivf_delta,
    compact_ivf_index,
    search_ivf_index,
    stream_screen_against_ivf,
    write_ivf_index,
)


def _centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )


def _base_index(spark, tmp_path, **kw):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.01]), (2, [0.01, 1.0])], "vec_id long, embedding array<double>"
    )
    idx = str(tmp_path / "idx")
    write_ivf_index(corpus, _centroids(spark), idx, "vec_id", "embedding", **kw)
    return idx


def _drop(landing, name, rows):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.float64())
                ),
            }
        ),
        str(landing / name),
    )


def test_stream_screen_grows_state_and_survives_replay(spark, tmp_path):
    idx = _base_index(spark, tmp_path)
    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(
            "vec_id LONG, embedding ARRAY<DOUBLE>"
        ).parquet(str(landing))
        return stream_screen_against_ivf(
            spark, stream, idx, out, ckpt, "vec_id", "embedding", threshold=0.9
        )

    # batch 0: 100 is a near-dup of base id 1; 101 points a genuinely
    # new direction (cos vs id 1 ~ 0.80) and must be admitted
    _drop(landing, "d1.parquet", [(100, [1.0, 0.02]), (101, [0.8, 0.6])])
    assert run() == 1
    v0 = {r["vec_id"]: r for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert v0[100]["is_near_dup"] and v0[100]["neighbor_id"] == 1
    assert v0[100]["cos_sim"] >= 0.999
    assert not v0[101]["is_near_dup"]

    # crash-after-append replay hazard: batch 1's delta lands BEFORE
    # the batch runs (as if the process died between the append and
    # the checkpoint commit). The replayed batch must not screen
    # against its own rows — 200 must match 101 (admitted by batch 0),
    # never itself.
    d2 = [(200, [0.79, 0.61])]
    _drop(landing, "d2.parquet", d2)
    crashed = spark.createDataFrame(d2, "vec_id long, embedding array<double>")
    add_to_ivf_delta(spark, idx, crashed, "vec_id", "embedding", 1)
    assert run() == 1
    v1 = {r["vec_id"]: r for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert v1[200]["is_near_dup"] and v1[200]["neighbor_id"] == 101
    assert v1[200]["cos_sim"] >= 0.999

    # 200 was a dup -> not admitted; its stale crash delta was
    # overwritten by the replay with an empty admit set
    delta = spark.read.parquet(f"{idx}/delta")
    admitted = {r["vec_id"] for r in delta.collect()}
    assert admitted == {101}

    # no new files -> nothing processed
    assert run() == 0

    # compaction: a fresh self-contained index search == delta search
    compacted = str(tmp_path / "idx2")
    compact_ivf_index(spark, idx, compacted)
    q = spark.createDataFrame([(900, [0.8, 0.61])], "vec_id long, embedding array<double>")
    with_delta = search_ivf_index(
        spark, idx, q, None, "vec_id", "embedding", k=2, include_delta=True
    )
    folded = search_ivf_index(spark, compacted, q, None, "vec_id", "embedding", k=2)
    assert sorted(map(tuple, with_delta.collect())) == sorted(
        map(tuple, folded.collect())
    )
    # and the compacted base really contains the admitted row
    assert {r["vec_id"] for r in spark.read.parquet(f"{compacted}/cells").collect()} == {
        1,
        2,
        101,
    }


def test_stream_screen_int8_index(spark, tmp_path):
    """Quantized index: same verdicts (quantization error ~0.4% is far
    inside the margins this geometry leaves)."""
    idx = _base_index(spark, tmp_path, quantize=True)
    landing = tmp_path / "landing"
    landing.mkdir()
    _drop(landing, "d1.parquet", [(100, [1.0, 0.02]), (101, [0.8, 0.6])])
    stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(
        str(landing)
    )
    n = stream_screen_against_ivf(
        spark, stream, idx, str(tmp_path / "v"), str(tmp_path / "c"),
        "vec_id", "embedding", threshold=0.9,
    )
    assert n == 1
    v = {r["vec_id"]: r for r in
         spark.read.parquet(str(tmp_path / "v") + "/batch=0").collect()}
    assert v[100]["is_near_dup"] and not v[101]["is_near_dup"]
    # the admitted delta is stored in the index's own (int8) format
    delta = spark.read.parquet(f"{idx}/delta")
    assert "__q8" in delta.columns


def test_stream_screen_rejects_pq(spark, tmp_path):
    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        train_pq_codebooks,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i % 3), float((i * 7) % 5), 1.0, 0.5]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cb = train_pq_codebooks(corpus, "vec_id", "embedding", m=2, k=2, iters=2)
    idx = str(tmp_path / "pq_idx")
    write_ivf_index(corpus, cents, idx, "vec_id", "embedding", pq_codebooks=cb)
    stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(
        str(tmp_path)
    )
    with pytest.raises(ValueError, match="IVFPQ"):
        stream_screen_against_ivf(
            spark, stream, idx, "x", "y", "vec_id", "embedding"
        )


def test_admit_none_is_pure_audit(spark, tmp_path):
    idx = _base_index(spark, tmp_path)
    landing = tmp_path / "landing"
    landing.mkdir()
    _drop(landing, "d1.parquet", [(101, [0.8, 0.6])])
    stream = spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>").parquet(
        str(landing)
    )
    stream_screen_against_ivf(
        spark, stream, idx, str(tmp_path / "v"), str(tmp_path / "c"),
        "vec_id", "embedding", admit="none",
    )
    import os

    assert not os.path.exists(f"{idx}/delta")
    with pytest.raises(ValueError):
        stream_screen_against_ivf(
            spark, stream, idx, "x", "y", "vec_id", "embedding", admit="all"
        )


def test_stream_screen_all_dup_first_batch(spark, tmp_path):
    """Regression: a first batch that is ENTIRELY near-dups admits zero
    rows, leaving a delta area whose only batch directory has no
    parquet footers. The next batch must still screen (an all-empty
    delta reads as 'no delta', not a schema-inference crash) and must
    be able to admit rows afterwards."""
    idx = _base_index(spark, tmp_path)
    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(
            "vec_id LONG, embedding ARRAY<DOUBLE>"
        ).parquet(str(landing))
        return stream_screen_against_ivf(
            spark, stream, idx, out, ckpt, "vec_id", "embedding", threshold=0.9
        )

    # batch 0: both rows duplicate base ids -> novel set is empty
    _drop(landing, "d1.parquet", [(100, [1.0, 0.02]), (101, [0.01, 1.0])])
    assert run() == 1
    v0 = {r["vec_id"]: r for r in spark.read.parquet(f"{out}/batch=0").collect()}
    assert v0[100]["is_near_dup"] and v0[101]["is_near_dup"]

    # batch 1 screens against base + (empty) delta without crashing,
    # and its novel row is admitted into the previously-empty delta
    _drop(landing, "d2.parquet", [(200, [0.8, 0.6])])
    assert run() == 1
    v1 = {r["vec_id"]: r for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert not v1[200]["is_near_dup"]
    delta = spark.read.parquet(f"{idx}/delta")
    assert {r["vec_id"] for r in delta.collect()} == {200}
