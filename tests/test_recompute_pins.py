"""Recompute pins: the expensive signature-building aggregates must
execute exactly once per operator invocation.

Round 3 shipped a cache-lifecycle refactor of `minhash_dedup_pairs`
(persist -> eager checkpoint of the output -> unpersist-in-finally)
whose persist was never materialized before the fan-out: the single
checkpoint job raced its own cache readers and recomputed the 64-slot
generated aggregate, silently making the benchmark bimodal
(driver-recorded 6.47 s vs 1.37 s the round before) while staying
hash-correct. These tests make that failure mode loud.

Mechanism: the input DataFrame is built from a Python RDD whose
partitions bump an accumulator every time they are COMPUTED. Cached /
checkpointed consumers read stored blocks, so a correctly-materialized
pipeline computes each source partition exactly once per action; a
recompute shows up as an accumulator overshoot. (Python accumulator
updates are delivered on task completion, so values are exact once the
action returns; local mode has no speculative tasks.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from udacity_data_engineering_capstone_project_spark.operators import dedup as dd
from udacity_data_engineering_capstone_project_spark.operators import (
    similarity as sim,
)

N_SLICES = 4


def _counting_docs(spark, acc, n=120):
    """documents-shaped frame whose source partitions count computations."""
    rows = [
        Row(doc_id=i, text=("the quick brown fox jumps %d " % (i % 7)) * 6)
        for i in range(n)
    ]

    def bump(split, it):
        acc.add(1)
        return it

    rdd = spark.sparkContext.parallelize(rows, N_SLICES).mapPartitionsWithIndex(bump)
    # explicit schema: inference would compute a partition just to
    # sample types, polluting the count
    return spark.createDataFrame(rdd, "doc_id long, text string")


def _counting_vecs(spark, acc, n=96, dim=8):
    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j * 3) % 13) / 13.0 for j in range(dim)])
        for i in range(n)
    ]

    def bump(split, it):
        acc.add(1)
        return it

    rdd = spark.sparkContext.parallelize(rows, N_SLICES).mapPartitionsWithIndex(bump)
    return spark.createDataFrame(rdd, "vec_id long, embedding array<double>")


def test_minhash_signature_stage_runs_once(spark):
    acc = spark.sparkContext.accumulator(0)
    df = _counting_docs(spark, acc)
    dd.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5).count()
    # The eager localCheckpoint of the signatures is the ONLY job that
    # may touch the source; buckets + both signature re-joins must read
    # checkpoint blocks. An overshoot means the aggregate recomputed.
    assert acc.value == N_SLICES, (
        f"minhash source partitions computed {acc.value} times, expected "
        f"{N_SLICES}: the signature aggregate was recomputed downstream"
    )


def test_simhash_source_bounded(spark):
    acc = spark.sparkContext.accumulator(0)
    df = _counting_docs(spark, acc)
    sigs = dd.simhash_signatures(df, "doc_id", "text").localCheckpoint(eager=True)
    dd.simhash_near_pairs(sigs, "doc_id", max_hamming=3).count()
    assert acc.value == N_SLICES, (
        f"simhash source computed {acc.value} times, expected {N_SLICES}"
    )


def test_embedding_lsh_source_bounded(spark):
    # lsh_near_dup_pairs checkpoints the banded bucket frame (the
    # expensive BLAS plane-dot pass) and re-joins RAW vectors by id —
    # the raw re-scan is by design (cheap parquet re-read at scale), so
    # the pin is source computations <= 1 (bucket build) + 2 (re-joins).
    acc = spark.sparkContext.accumulator(0)
    df = _counting_vecs(spark, acc)
    sim.lsh_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.5, num_planes=8, dim=8, num_tables=2
    ).count()
    assert acc.value <= 3 * N_SLICES, (
        f"embedding-LSH source computed {acc.value} partition-times, "
        f"expected <= {3 * N_SLICES} (bucket build + two raw re-joins)"
    )


def test_minhash_plan_reads_materialized_signatures(spark):
    """Deterministic structural pin for the round-3 slow mode.

    The source-partition accumulator above cannot see aggregate-level
    recompute (shuffle-exchange reuse serves the SOURCE once while AQE
    still re-runs the 64-slot reduction per broadcast exchange), so pin
    the plan shape instead:

    - the returned frame is LAZY (verify join + threshold filter are in
      its plan — round 3 returned an already-checkpointed output, which
      hid a double-computation inside the invocation), and
    - every signature consumer scans the eagerly-checkpointed blocks
      (`Scan ExistingRDD`); the shingle aggregate (`xxhash64(__h`)
      appears NOWHERE, so no execution path can re-run it.
    """
    df = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta %d " % (i % 3) * 4) for i in range(60)]
    )
    out = dd.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    assert "est_jaccard" in plan, "verify step must stay lazy in the returned frame"
    assert "ExistingRDD" in plan, "signatures must come from checkpointed blocks"
    assert "xxhash64(__h" not in plan, (
        "signature aggregate leaked into the consumer plan — it can be "
        "recomputed per AQE broadcast exchange (round-3 slow mode)"
    )
    assert "InMemoryRelation" not in plan, (
        "persist-based signature sharing reintroduced — it is not "
        "materialized before fan-out and races AQE's parallel exchanges"
    )


def test_minhash_releases_checkpoint_blocks(spark):
    """Memory-release property: after the result frame is dropped the
    operator leaves no session-pinned cache entry (persisted RDDs from
    this invocation are eligible for ContextCleaner release; nothing
    sits in the catalog cache)."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta " * 4) for i in range(50)]
    )
    out = dd.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5)
    out.count()
    jsc = spark.sparkContext._jsc.sc()
    # no user-facing persisted tables pinned by the operator itself
    persisted = {
        rdd_info.name()
        for rdd_info in jsc.getRDDStorageInfo()
        if rdd_info.isCached() and rdd_info.name() is not None
    }
    assert not any("In-memory table" in (n or "") for n in persisted)
