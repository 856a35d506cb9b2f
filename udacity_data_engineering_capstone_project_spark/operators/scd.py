"""Slowly-changing-dimension maintenance (warehouse extension).

The reference's star schema rebuilds dimensions from scratch each run
(`etl.py` drops straight from staging to dim tables); its write-up
names "daily incremental processing" as the wish. These operators are
the incremental half a production warehouse runs on top of the
existing `plans/star.py` build:

- `merge_upsert`: last-writer-wins key merge of a changes batch into
  the current dimension snapshot (the MERGE INTO shape, as a union +
  one window — no engine extension needed).
- `scd2_from_snapshots`: collapse a history of periodic snapshots into
  type-2 versioned rows (valid_from / valid_to / is_current), keeping
  one row per *change run* rather than per snapshot.

Both are pure window/aggregate compositions: one shuffle on the
business key, partial-aggregatable, no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """MERGE the ``changes`` batch into ``current``: for each business
    key the row with the highest ``order_col`` wins (changes beat the
    snapshot on ties). Schema of both inputs must match.

    One union + one window over the key — at scale this is a single
    shuffle on the business key; AQE handles skewed keys. For repeated
    daily merges, write the result with `sinks.write_bucketed_table`
    on the key so successive merges skip the shuffle.
    """
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        changes.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    snapshot_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse periodic full snapshots into SCD type-2 history: one
    row per consecutive run of identical attribute values, with
    ``valid_from`` (first snapshot of the run), ``valid_to`` (first
    snapshot of the next run, null while current) and ``is_current``.

    Change detection compares each snapshot's attributes to the
    previous snapshot of the same key (null-safe), a cumulative sum of
    change flags numbers the runs, and one aggregate per (key, run)
    emits the version row. Two windows + one aggregation, all sharing
    the same key partitioning — one shuffle end-to-end.

    ``tiebreak_col`` (optional, ascending) orders rows that share a
    ``snapshot_col`` value — without it equal timestamps make the run
    order nondeterministic (`merge_stream_into_scd2` passes its
    snapshot-vs-change source tag so changes beat the reopened row).
    """
    order_keys = [F.col(snapshot_col).asc()]
    if tiebreak_col is not None:
        order_keys.append(F.col(tiebreak_col).asc())
    order_w = Window.partitionBy(*key_cols).orderBy(*order_keys)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(order_w)
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(order_w) == 1
    runs = snapshots.withColumn(
        "__chg", F.when(first | changed, 1).otherwise(0)
    ).withColumn(
        "__run",
        F.sum("__chg").over(
            order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    versions = runs.groupBy(*key_cols, "__run").agg(
        *[F.first(a).alias(a) for a in attr_cols],
        F.min(snapshot_col).alias("valid_from"),
    )
    # __run in the sort: two runs can share a valid_from when tied
    # snapshot values split a key's history (the tiebreak case), and
    # run numbers are monotone in window order by construction
    next_w = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from").asc(), F.col("__run").asc()
    )
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(next_w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )
