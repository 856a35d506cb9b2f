"""DSIR-style importance resampling (train_importance_model /
importance_weights / importance_resample): DuckDB oracle parity on the
static testdata, determinism, selection-bias sanity, and degenerate
inputs.

The oracle retrains the model in SQL (same md5-prefix bucket space as
the hashed-classifier oracle) — ln/exp run in the SAME host libm here,
so exact float compare is safe locally; per the cross-libm rule these
stay pytest-pinned, not driver-graded."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare_frames, run_oracle
from udacity_data_engineering_capstone_project_spark.operators.textstats import (
    importance_resample,
    importance_weights,
    train_importance_model,
)

BUCKETS = 4096

# Shared SQL front half: tokenize -> bigrams -> md5-prefix bucket,
# target = lang='en', raw = the whole pool (mirrors the Spark test).
_BUCKET_CTE = f"""
    w AS (
        SELECT doc_id, lang,
               regexp_extract_all(lower(text), '[a-z]+') AS words
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                                     i -> array_to_string(words[i:i+1], ' '))) AS g
        FROM w
    ),
    b AS (
        SELECT doc_id, lang,
               (CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {BUCKETS})
                   AS bucket
        FROM grams
    ),
    t AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
    r AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
    tot AS (
        SELECT (SELECT coalesce(sum(ct), 0) FROM t) AS tt,
               (SELECT coalesce(sum(cr), 0) FROM r) AS tr
    ),
    model AS (
        SELECT gs.bucket,
               ln((coalesce(ct, 0) + 1.0) / (tt + {BUCKETS}.0))
               - ln((coalesce(cr, 0) + 1.0) / (tr + {BUCKETS}.0)) AS log_ratio
        FROM (SELECT unnest(range(0, {BUCKETS})) AS bucket) gs
        LEFT JOIN t USING (bucket)
        LEFT JOIN r USING (bucket), tot
    ),
    tf AS (SELECT doc_id, bucket, count(*)::DOUBLE AS tf FROM b GROUP BY 1, 2),
    s AS (
        SELECT doc_id, sum(tf * log_ratio) AS lw
        FROM tf JOIN model USING (bucket) GROUP BY 1
    )
"""

WEIGHTS_ORACLE = f"""
    WITH {_BUCKET_CTE}
    SELECT d.doc_id, round(coalesce(s.lw, 0.0), 6) AS log_w
    FROM documents d LEFT JOIN s USING (doc_id)
"""

RESAMPLE_ORACLE = f"""
    WITH {_BUCKET_CTE},
    keyed AS (
        SELECT d.doc_id,
               coalesce(s.lw, 0.0)
               - ln(-ln((CAST(('0x' || substr(md5(d.doc_id || ':0'), 1, 13))
                              AS BIGINT) + 0.5) / 4503599627370496.0))
                   AS gumbel_key
        FROM documents d LEFT JOIN s USING (doc_id)
    )
    SELECT doc_id, round(gumbel_key, 6) AS gumbel_key
    FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 50
"""


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _model(spark):
    docs = _docs(spark)
    return train_importance_model(
        docs.filter(F.col("lang") == "en"), docs, "text", num_buckets=BUCKETS
    )


def test_importance_weights_oracle_parity(spark):
    docs = _docs(spark)
    got = (
        importance_weights(docs, "doc_id", "text", _model(spark), BUCKETS)
        .select("doc_id", F.round("log_w", 6).alias("log_w"))
        .toPandas()
    )
    compare_frames(got, run_oracle(WEIGHTS_ORACLE, SF_SMOKE), "importance_weights")


def test_importance_resample_oracle_parity(spark):
    docs = _docs(spark)
    got = (
        importance_resample(docs, "doc_id", "text", _model(spark), k=50, seed=0,
                            num_buckets=BUCKETS)
        .select("doc_id", F.round("gumbel_key", 6).alias("gumbel_key"))
        .toPandas()
    )
    compare_frames(got, run_oracle(RESAMPLE_ORACLE, SF_SMOKE), "importance_resample")


def test_model_shape_and_finiteness(spark):
    m = _model(spark).toPandas()
    assert len(m) == BUCKETS
    assert sorted(m["bucket"]) == list(range(BUCKETS))
    assert m["log_ratio"].notna().all()
    assert (m["log_ratio"].abs() != float("inf")).all()


def test_resample_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark)
    model = _model(spark)
    a = importance_resample(docs, "doc_id", "text", model, k=30, seed=7,
                            num_buckets=BUCKETS)
    b = importance_resample(docs, "doc_id", "text", model, k=30, seed=7,
                            num_buckets=BUCKETS)
    ids_a = [r["doc_id"] for r in a.select("doc_id").collect()]
    ids_b = [r["doc_id"] for r in b.select("doc_id").collect()]
    assert ids_a == ids_b  # pure function of (id, seed): order included
    c = importance_resample(docs, "doc_id", "text", model, k=30, seed=8,
                            num_buckets=BUCKETS)
    ids_c = {r["doc_id"] for r in c.select("doc_id").collect()}
    assert set(ids_a) != ids_c  # fresh draw (2^-30-ish collision odds)


def test_resample_biases_toward_target(spark):
    # 50 target-like docs (repeat a distinctive bigram so log-ratio mass
    # dwarfs the ~N(0, pi^2/6) Gumbel noise) + 50 junk docs; sampling 25
    # should pick target-like docs near-exclusively.
    rows = [(i, "quantum flux " * 40, "t") for i in range(50)] + [
        (i, f"junk{i} filler{i} " * 40, "j") for i in range(50, 100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, kind string")
    model = train_importance_model(
        df.filter(F.col("kind") == "t"), df, "text", num_buckets=256
    )
    picked = importance_resample(
        df, "doc_id", "text", model, k=25, seed=1, num_buckets=256
    ).toPandas()
    assert (picked["kind"] == "t").mean() >= 0.9
    # returned highest-key-first with the key exposed
    assert list(picked["gumbel_key"]) == sorted(picked["gumbel_key"], reverse=True)


def test_short_and_empty_docs_survive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "word")],
        "doc_id long, text string",
    )
    model = train_importance_model(df, df, "text", num_buckets=64)
    w = {r["doc_id"]: r["log_w"] for r in
         importance_weights(df, "doc_id", "text", model, 64).collect()}
    assert set(w) == {1, 2, 3, 4}
    assert w[2] == 0.0 and w[3] == 0.0 and w[4] == 0.0  # no bigrams
    picked = importance_resample(df, "doc_id", "text", model, k=4, seed=0,
                                 num_buckets=64)
    assert picked.count() == 4  # nobody dropped


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_importance_model(df, df, "text", num_buckets=0)
    with pytest.raises(ValueError):
        train_importance_model(df, df, "text", smoothing=0.0)
    model = train_importance_model(df, df, "text", num_buckets=64)
    with pytest.raises(ValueError):
        importance_resample(df, "doc_id", "text", model, k=-1, num_buckets=64)
