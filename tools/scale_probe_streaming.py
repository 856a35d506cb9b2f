"""Round-6 scale probe: STREAMING STATE at 1x/10x/100x event volume —
the one extension tier BASELINE.md had no 10x/100x evidence for.

What 100 TB means for a stream is not scan throughput but STATE: an
unbounded-state operator (plain dropDuplicates, no-watermark agg) is
the non-starter, because state grows with everything ever seen. The
engine's streaming tier claims watermark-BOUNDED state; this probe
measures it.

Replication model: each copy offsets user_id/event_id into a disjoint
range and keeps the SAME one-month event-time window — a 100x tier
behaves like 100x the user population at equal activity, so keys-in-
horizon (the state driver) grow 100x while the time axis is fixed.
The replicated stream is written as consecutive TIME SLICES (oldest
first) and consumed with maxFilesPerTrigger=1, so the event-time
watermark advances across micro-batches exactly as it does on a live
ingest, and state eviction actually runs.

Probes:
- dedup_wm: `dedup_stream_within_watermark` (1 h horizon) — peak and
  final state rows must track the watermark horizon (events/hour),
  NOT total volume.
- sessionize: `sessionized_counts` (30 min gap, 2 h watermark) — state
  is open sessions in the horizon, not all sessions ever.
- index_dedup: `stream_dedup_against_index` — state here is the
  PERSISTED index (linear by design: it admits every novel doc); the
  honest scale metric is the per-batch wall trend as the index grows,
  plus total wall per tier.

Usage: python tools/scale_probe_streaming.py
(env: SPARK_GRAFT_SF_DIR, SCALE_PROBE_COPIES default "10,100",
SCALE_PROBE_ONLY to pick probes). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def _event_copies(df, copies: int):
    """Disjoint user/event id ranges per copy, identical time window."""
    parts = [
        df.select(
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _write_time_slices(df, path: str, slices: int) -> None:
    """Materialize the stream as `slices` single-file time slices,
    written oldest-first so the file source's mod-time ordering replays
    event time in order (what a landing zone does naturally)."""
    bounds = df.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo) / slices
    for i in range(slices):
        a = lo + span * i
        b = hi if i == slices - 1 else lo + span * (i + 1)
        cond = (F.col("ts") >= F.lit(a)) & (
            (F.col("ts") <= F.lit(b)) if i == slices - 1 else (F.col("ts") < F.lit(b))
        )
        df.filter(cond).coalesce(1).write.mode("append").parquet(path)
        time.sleep(0.05)  # distinct mod-times keep slice order stable


def _run_bounded(stream_df, transform, ckpt: str, output_mode: str = "append"):
    """availableNow run through foreachBatch(count); returns
    (wall_s, state metrics from the query's progress history)."""
    out = transform(stream_df)
    q = (
        out.writeStream.foreachBatch(lambda b, _i: b.count())
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 3)
    peak_state = 0
    final_state = 0
    batches = 0
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if ops:
            rows = ops[0].get("numRowsTotal", 0)
            peak_state = max(peak_state, rows)
            final_state = rows
        if p.get("numInputRows", 0) > 0 or ops:
            batches += 1
    return wall, {
        "peak_state_rows": peak_state,
        "final_state_rows": final_state,
        "batches": batches,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies_list = [
        int(c) for c in os.environ.get("SCALE_PROBE_COPIES", "10,100").split(",")
    ]
    only = os.environ.get("SCALE_PROBE_ONLY")
    slices = 10

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        dedup_stream_within_watermark,
        sessionized_counts,
    )

    spark = get_spark(app_name="scale-probe-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="scale_probe_streaming_")

    ev1 = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            )
            if dict(
                spark.read.parquet(f"{sf_dir}/events.parquet").dtypes
            ).get("ts")
            == "timestamp_ntz"
            else F.col("ts"),
        )
    )
    tiers = {}
    for c in [1] + copies_list:
        path = f"{work}/events_x{c}"
        _write_time_slices(_event_copies(ev1, c), path, slices)
        tiers[c] = path

    results: dict = {}

    def stream_of(c):
        return spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
        ).option("maxFilesPerTrigger", 1).parquet(tiers[c])

    if not only or "dedup_wm" in only.split(","):
        entry = {}
        for c in [1] + copies_list:
            wall, st = _run_bounded(
                stream_of(c),
                lambda s: dedup_stream_within_watermark(
                    s, ["event_id"], watermark="1 hour"
                ),
                f"{work}/ckpt_dedup_x{c}",
            )
            st["wall_s"] = wall
            st["input_rows"] = 100_000 * c  # sf0.1 base
            entry[f"x{c}"] = st
        results["dedup_wm"] = entry
        print(f"# dedup_wm: {entry}", file=sys.stderr)

    if not only or "sessionize" in only.split(","):
        entry = {}
        for c in [1] + copies_list:
            wall, st = _run_bounded(
                stream_of(c),
                lambda s: sessionized_counts(
                    s, gap="30 minutes", watermark="2 hours"
                ),
                f"{work}/ckpt_sess_x{c}",
            )
            st["wall_s"] = wall
            entry[f"x{c}"] = st
        results["sessionize"] = entry
        print(f"# sessionize: {entry}", file=sys.stderr)

    if not only or "index_dedup" in only.split(","):
        import random
        import string

        from udacity_data_engineering_capstone_project_spark.operators.dedup import (
            stream_dedup_against_index,
            write_dedup_index,
        )

        docs1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        entry = {}
        # index tiers: 1 batch, then `max(copies)` batches of the base
        # size, each under its OWN letter-permutation bijection (same
        # replication model as scale_probe_dedup — a batch of all-dups
        # would admit nothing and measure screening only), so the
        # persisted index grows ~base-corpus rows per batch and the
        # per-batch wall shows the screening cost against it.
        lower = string.ascii_lowercase
        n_batches = min(max(copies_list), 10)
        for label, batches in (("x1", 1), (f"x{n_batches}", n_batches)):
            landing = f"{work}/landing_{label}"
            os.makedirs(landing)
            for i in range(batches):
                perm = list(lower)
                random.Random(i).shuffle(perm)
                perm = "".join(perm)
                docs1.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.translate(
                        F.col("text"), lower + lower.upper(), perm + perm.upper()
                    ).alias("text"),
                ).coalesce(1).write.mode("append").parquet(landing)
                time.sleep(0.05)
            idx = f"{work}/idx_{label}"
            write_dedup_index(
                spark.createDataFrame([], "doc_id long, text string"),
                idx,
                "doc_id",
                "text",
            )
            stream = (
                spark.readStream.schema("doc_id LONG, text STRING")
                .option("maxFilesPerTrigger", 1)
                .parquet(landing)
            )
            wall, n = _timed(
                lambda: stream_dedup_against_index(
                    spark,
                    stream,
                    idx,
                    f"{work}/verdicts_{label}",
                    f"{work}/ckpt_idx_{label}",
                    "doc_id",
                    "text",
                )
            )
            idx_rows = spark.read.parquet(f"{idx}/fingerprints").count()
            entry[label] = {
                "wall_s": wall,
                "batches": n,
                "wall_per_batch_s": round(wall / max(n, 1), 3),
                "index_rows": idx_rows,
            }
        results["index_dedup"] = entry
        print(f"# index_dedup: {entry}", file=sys.stderr)

    print(json.dumps(results))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
