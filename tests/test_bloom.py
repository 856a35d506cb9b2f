"""Distributed block-packed Bloom filter: no false negatives ever,
bounded false positives, exact merge, parquet persistence — the cheap
pre-screen in front of exact incremental-dedup joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.operators.bloom import (
    bloom_might_contain,
    bloom_screen_new,
    build_bloom,
    merge_blooms,
    optimal_num_bits,
    optimal_num_hashes,
)

N_KEYS = 5_000
M = optimal_num_bits(N_KEYS, 0.01)
K = optimal_num_hashes(M, N_KEYS)


def test_sizing_helpers():
    assert M % 64 == 0
    # ~9.6 bits/key at 1% FP, k ~ 7 — the textbook numbers
    assert 9 * N_KEYS <= M <= 11 * N_KEYS
    assert K == 7
    with pytest.raises(ValueError, match="fp_rate"):
        optimal_num_bits(10, 1.5)
    with pytest.raises(ValueError, match="expected_keys"):
        optimal_num_bits(0, 0.01)


def test_no_false_negatives_and_fp_bounded(spark):
    members = spark.range(N_KEYS).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("k")
    )
    bloom = build_bloom(members, "k", M, K)
    assert bloom.count() <= M // 64

    # every inserted key must be flagged maybe_seen — zero exceptions
    flagged = bloom_might_contain(members, bloom, "k", M, K)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0

    # fresh keys: FP fraction within 3x of the designed 1%
    fresh = spark.range(N_KEYS).select(
        F.concat(F.lit("new-"), F.col("id")).alias("k")
    )
    fp = bloom_might_contain(fresh, bloom, "k", M, K).filter("maybe_seen").count()
    assert fp / N_KEYS <= 0.03, fp


def test_screen_new_drops_all_members(spark):
    members = spark.range(1_000).select((F.col("id") * 3).alias("k"))
    bloom = build_bloom(members, "k", optimal_num_bits(1_000, 0.01), 7)
    batch = spark.range(3_000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    out = bloom_screen_new(batch, bloom, "k", optimal_num_bits(1_000, 0.01), 7)
    got = {r["k"] for r in out.collect()}
    assert not any(k % 3 == 0 and k < 3_000 for k in got)  # no member survives
    truly_new = {k for k in range(3_000) if k % 3 != 0}
    assert got <= truly_new
    assert len(got) >= 0.95 * len(truly_new)  # FPs cost at most a sliver
    assert set(out.columns) == {"k", "v"}  # payload intact, flag dropped


def test_merge_equals_build_on_union_and_roundtrip(spark, tmp_path):
    a = spark.range(0, 2_000).select(F.col("id").alias("k"))
    b = spark.range(1_500, 4_000).select(F.col("id").alias("k"))
    m = optimal_num_bits(4_000, 0.01)
    p = str(tmp_path / "bloom")
    build_bloom(a, "k", m, 7).write.parquet(p + "/day1")
    build_bloom(b, "k", m, 7).write.parquet(p + "/day2")
    merged = merge_blooms(
        spark.read.parquet(p + "/day1"), spark.read.parquet(p + "/day2")
    )
    direct = build_bloom(a.unionByName(b), "k", m, 7)
    assert sorted((r["block"], r["mask"]) for r in merged.collect()) == sorted(
        (r["block"], r["mask"]) for r in direct.collect()
    )
    with pytest.raises(ValueError, match="no blooms"):
        merge_blooms()


def test_null_keys_and_validation(spark):
    df = spark.createDataFrame([("x",), (None,)], "k string")
    bloom = build_bloom(df, "k", 640, 3)
    out = {
        r["k"]: r["maybe_seen"]
        for r in bloom_might_contain(df, bloom, "k", 640, 3).collect()
    }
    assert out == {"x": True, None: True}  # NULL behaves like any key
    with pytest.raises(ValueError, match="num_bits"):
        build_bloom(df, "k", 100, 3)
    with pytest.raises(ValueError, match="num_hashes"):
        build_bloom(df, "k", 640, 0)


def test_bloom_prescreen_composes_with_exact_dedup(spark):
    """The production pattern the module docstring promises: a Bloom of
    every admitted fingerprint screens each new batch, and ONLY the
    'maybe seen' sliver pays the exact index join. The composed verdict
    must equal the direct full exact join for every row."""
    from udacity_data_engineering_capstone_project_spark.functions.text import (
        normalize_text,
    )

    corpus = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("corpus document body "), F.col("id")).alias("text"),
    )
    corpus_fp = corpus.select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    m = optimal_num_bits(2_000, 0.01)
    bloom = build_bloom(corpus_fp, "fp", m, 7)

    # batch: 300 exact dups of corpus rows + 300 novel docs
    batch = (
        spark.range(300)
        .select(
            (F.col("id") + 10_000).alias("doc_id"),
            F.concat(F.lit("corpus document body "), F.col("id") * 5).alias("text"),
        )
        .unionByName(
            spark.range(300).select(
                (F.col("id") + 20_000).alias("doc_id"),
                F.concat(F.lit("novel payload "), F.col("id")).alias("text"),
            )
        )
    )
    batch_fp = batch.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("fp"))

    screened = bloom_might_contain(batch_fp, bloom, "fp", m, 7)
    fast_new = screened.filter(~F.col("maybe_seen"))
    slow = screened.filter(F.col("maybe_seen")).drop("maybe_seen")

    # ground truth: the full exact join every batch row would pay
    direct = {
        r["doc_id"]: r["hit"]
        for r in batch_fp.join(
            corpus_fp.select(F.col("fp"), F.lit(True).alias("hit")).distinct(),
            on="fp",
            how="left",
        ).collect()
    }
    # no-false-negative side: every fast-pass row is genuinely novel
    for r in fast_new.collect():
        assert not direct[r["doc_id"]], r
    # the sliver + exact join reproduces the remaining verdicts
    sliver = {
        r["doc_id"]: r["hit"]
        for r in slow.join(
            corpus_fp.select(F.col("fp"), F.lit(True).alias("hit")).distinct(),
            on="fp",
            how="left",
        ).collect()
    }
    composed = {d: bool(h) for d, h in sliver.items()}
    composed.update({r["doc_id"]: False for r in fast_new.collect()})
    assert composed == {d: bool(h) for d, h in direct.items()}
    # and the sliver is actually small: dups + FP-rate of the novels
    assert slow.count() <= 300 + 0.03 * 300
