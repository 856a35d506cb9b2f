"""Watermark semantics end-to-end: late data beyond the watermark is
dropped from finalized windows (append mode), on a real multi-batch
file stream."""

from __future__ import annotations

import os
import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    # flat single parquet FILES (spark writes directories, which the
    # file-stream source does not recurse into)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    table = pa.table(
        {
            # tz-aware so Spark reads TIMESTAMP (watermarks reject NTZ);
            # test session runs in UTC so rendered times are stable
            "ts": pa.array([r[0] for r in rows], type=pa.timestamp("us", tz="UTC")),
            "event_type": [r[1] for r in rows],
            "value": [r[2] for r in rows],
            "user_id": [r[3] for r in rows],
        }
    )
    pq.write_table(table, path)


def test_watermark_drops_late_events(spark, tmp_path):
    landing = str(tmp_path / "landing")
    t = lambda s: datetime.fromisoformat(s)

    _write_events(
        spark,
        f"{landing}/f1.parquet",
        [
            (t("2024-01-01 10:00:30"), "click", 1.0, 1),
            (t("2024-01-01 10:01:00"), "click", 1.0, 1),
            (t("2024-01-01 10:30:00"), "click", 1.0, 1),
        ],
    )
    time.sleep(1.2)  # distinct modification times for the file source
    _write_events(
        spark,
        f"{landing}/f2.parquet",
        [
            (t("2024-01-01 10:02:00"), "click", 1.0, 1),
            (t("2024-01-01 11:00:00"), "click", 1.0, 1),
        ],
    )

    ckpt = str(tmp_path / "ckpt")
    emitted: list[tuple[str, int]] = []

    def run_once():
        # One bounded incremental run; the watermark persists in the
        # checkpoint between runs (the real incremental-job deployment
        # shape).
        schema = spark.read.parquet(f"{landing}/f1.parquet").schema
        stream = spark.readStream.schema(schema).parquet(landing)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.date_format("w.start", "HH:mm").alias("w_start"), "n_events"
            )
        )

        def collect_batch(batch_df, batch_id):
            emitted.extend(
                (r["w_start"], r["n_events"]) for r in batch_df.collect()
            )

        q = (
            agg.writeStream.foreachBatch(collect_batch)
            .option("checkpointLocation", ckpt)
            .outputMode("append")  # append emits only FINALIZED windows
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # processes f1+f2: watermark ends at 11:00 - 10min = 10:50
    # windows ending <= 10:50 are finalized: 10:00 (3: the 10:02 event
    # was NOT late within a single batch — watermark only advances
    # BETWEEN batches) and 10:30 (1).
    assert dict(emitted) == {"10:00": 3, "10:30": 1}, emitted

    emitted.clear()
    # a genuinely late event arrives in a LATER run: beyond the
    # checkpointed 10:50 watermark -> silently dropped, no re-emission
    _write_events(
        spark,
        f"{landing}/f3.parquet",
        [(t("2024-01-01 10:03:00"), "click", 1.0, 1)],
    )
    run_once()
    assert emitted == [], f"late event must be dropped, got {emitted}"

    emitted.clear()
    # new on-time data still flows: 12:00 event finalizes the 11:00 window
    _write_events(
        spark,
        f"{landing}/f4.parquet",
        [(t("2024-01-01 12:00:00"), "click", 1.0, 1)],
    )
    run_once()
    assert dict(emitted) == {"11:00": 1}, emitted


def test_rocksdb_state_store_backend(spark, tmp_path):
    """The production state backend: session windows over RocksDB state
    must produce exactly the in-memory provider's results (at real
    scale the default HDFS-backed in-memory store OOMs on large keyed
    state; RocksDB spills to local disk)."""
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        sessionized_counts,
    )

    sf_dir = "/root/testdata/sf0.001"
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)

    def run():
        agg = sessionized_counts(
            read_events_stream(spark, sf_dir), gap="30 minutes", watermark="2 hours"
        )
        out = run_stream_to_memory(agg, output_mode="complete")
        return sorted(map(tuple, out.collect()))

    baseline = run()
    assert len(baseline) > 0
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        assert run() == baseline
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_stream_stream_attribution_matches_batch_twin(spark, sf_dir):
    """Watermarked stream-stream join (purchase <- preceding clicks of
    the same user within 30 min): the availableNow replay must produce
    exactly the batch join's pairs, and the plan must be a streaming
    join with state watermarks on both sides."""
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stream_stream_attribution,
    )

    stream = read_events_stream(spark, sf_dir)
    joined = stream_stream_attribution(stream, attribution_window="30 minutes")
    out = run_stream_to_memory(joined, output_mode="append")
    got = {(r["trigger_id"], r["touch_id"]) for r in out.collect()}

    # batch twin over the same table (NTZ read -> same instant
    # normalization the stream reader applies)
    from udacity_data_engineering_capstone_project_spark.sources.readers import read_events

    ev = read_events(spark, sf_dir).withColumn(
        "ts",
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ),
    )
    trig = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("trigger_id"),
        "user_id",
        F.col("ts").alias("trigger_ts"),
    )
    touch = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("touch_user"),
        F.col("ts").alias("touch_ts"),
    )
    batch = trig.join(
        touch,
        on=[
            trig["user_id"] == touch["touch_user"],
            touch["touch_ts"] <= trig["trigger_ts"],
            touch["touch_ts"]
            >= trig["trigger_ts"] - F.expr("INTERVAL 30 minutes"),
        ],
    )
    want = {(r["trigger_id"], r["touch_id"]) for r in batch.collect()}
    assert len(want) > 0, "vacuous: no attributable pairs at this sf"
    assert got == want
    # lag bounds hold on every emitted row
    assert out.filter(
        (F.col("lag_us") < 0) | (F.col("lag_us") > 30 * 60 * 1_000_000)
    ).count() == 0


def test_dedup_within_watermark_bounded_state(spark, tmp_path):
    """The bounded-state contract, both directions: a duplicate inside
    the watermark horizon is dropped across micro-batches; once the
    watermark passes an id's state, a late replay is re-emitted (state
    was evicted — the price of boundedness, documented)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        dedup_stream_within_watermark,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):  # (event_id, epoch_seconds)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "ts": pa.array(
                        [r[1] * 1_000_000 for r in rows],
                        type=pa.timestamp("us"),
                    ),
                }
            ),
            str(landing / name),
        )

    collected = []

    def run():
        stream = spark.readStream.schema("event_id LONG, ts TIMESTAMP").parquet(
            str(landing)
        )
        out = dedup_stream_within_watermark(
            stream, ["event_id"], ts_col="ts", watermark="10 minutes"
        )
        q = (
            out.writeStream.foreachBatch(
                lambda df, _bid: collected.extend(
                    (r["event_id"], r["ts"]) for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t0 = 1_000_000  # arbitrary epoch base
    # batch 1: ids 1,2,3 (+ an in-batch dup of 1)
    drop("d1.parquet", [(1, t0), (2, t0 + 10), (3, t0 + 20), (1, t0 + 30)])
    run()
    assert sorted(e for e, _ in collected) == [1, 2, 3]

    # batch 2: dup of 2 within the 10-min horizon -> dropped; a far
    # later event advances the watermark past every batch-1 id
    drop("d2.parquet", [(2, t0 + 120), (4, t0 + 7_200)])
    run()
    assert sorted(e for e, _ in collected) == [1, 2, 3, 4]

    # batch 3: id 3 replayed AFTER its state expired -> re-emitted
    drop("d3.parquet", [(3, t0 + 7_260)])
    run()
    assert sorted(e for e, _ in collected) == [1, 2, 3, 3, 4]


def test_stream_anomaly_monitor_batch_twin_and_bounded_state(spark, tmp_path):
    """The live intake monitor: additive versioned state, bounded by
    retention; per-batch verdicts equal the batch rolling_zscore over
    the full concatenated history for every touched bucket; a spike
    flags the batch it arrives; replay processes nothing twice."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        rolling_zscore,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        stream_anomaly_monitor,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    state = str(tmp_path / "state")
    out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, pairs):
        ks = [k for k, _ in pairs]
        bs = [b for _, b in pairs]
        pq.write_table(
            pa.table({"k": pa.array(ks), "b": pa.array(bs, type=pa.int64())}),
            str(landing / name),
        )

    def run():
        stream = spark.readStream.schema("k STRING, b LONG").parquet(
            str(landing)
        )
        return stream_anomaly_monitor(
            spark, stream, state, ckpt, ["k"], "b",
            out_path=out, lookback=10, min_history=5, retain_buckets=20,
        )

    # batch 0: buckets 0..29, 4/5/6 events each (deterministic noise —
    # a CONSTANT baseline has zero variance and scores 'insufficient')
    drop("d1.parquet", [("a", b) for b in range(30) for _ in range(4 + b % 3)])
    assert run() == 1
    v0 = spark.read.parquet(f"{state}/v=0")
    assert v0.count() == 20  # retention pruned 30 -> 20 buckets
    assert v0.agg({"b": "min"}).collect()[0][0] == 10

    # batch 1: buckets 30..39 baseline + a 50-event spike at bucket 40
    drop("d2.parquet",
         [("a", b) for b in range(30, 40) for _ in range(4 + b % 3)]
         + [("a", 40)] * 50)
    assert run() == 1
    verd = {r["b"]: r for r in spark.read.parquet(f"{out}/batch=1").collect()}
    assert set(verd) == set(range(30, 41))
    assert verd[40]["verdict"] == "anomaly" and verd[40]["z"] > 3
    assert all(verd[b]["verdict"] == "normal" for b in range(30, 40))

    # batch twin: full-history rolling_zscore agrees on every touched
    # bucket (bucket 30's window reaches into history the new version
    # aged out of storage — scoring pre-prune makes this exact)
    full = spark.createDataFrame(
        [("a", b, 4 + b % 3) for b in range(40)] + [("a", 40, 50)],
        "k string, b long, n long",
    )
    twin = {
        r["b"]: r
        for r in rolling_zscore(
            full, ["k"], "b", "n", lookback=10, min_history=5
        ).collect()
        if r["b"] >= 30
    }
    for b in range(30, 41):
        assert twin[b]["z"] == verd[b]["z"], b
        assert twin[b]["trail_n"] == verd[b]["trail_n"], b

    # state stays bounded and now ends at bucket 40
    v1 = spark.read.parquet(f"{state}/v=1")
    assert v1.count() == 20
    assert v1.agg({"b": "max"}).collect()[0][0] == 40

    # nothing new -> nothing processed
    assert run() == 0

    # retention floor is enforced
    import pytest

    with pytest.raises(ValueError, match="retain_buckets"):
        stream_anomaly_monitor(
            spark,
            spark.readStream.schema("k STRING, b LONG").parquet(str(landing)),
            state, ckpt, ["k"], "b", lookback=10, retain_buckets=10,
        )


def test_stream_crawl_curation_matches_batch(spark, sf_dir, tmp_path):
    """The streaming crawl-curation twin must keep the SAME surviving
    CONTENT set as the batch pipeline's first four stages (robots ->
    blocklist -> cascade -> exact dedup), fed the identical corpus as
    a two-batch file stream. Content fingerprints, not doc ids: the
    batch dedup keeps min-id, streaming keeps first-arrival — content
    survival is the arrival-order-independent contract."""
    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        CRAWL_BLOCKLIST_PHRASES,
        _ROBOTS_TXT,
        crawl_cascade_rules,
        crawl_pipeline_intake,
        crawl_pipeline_stages,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        stream_crawl_curation,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        run_stream_to_memory,
    )

    from udacity_data_engineering_capstone_project_spark.functions.text import (
        normalize_text,
    )

    # batch truth: NORMALIZED fingerprints surviving stage 4
    # (exact_dedup) — normalized because that is the dedup key in both
    # twins; on a corpus with case/punct variants the two twins may
    # keep DIFFERENT raw representatives of the same content class
    stage_dfs = dict(crawl_pipeline_stages(spark, sf_dir))
    want = {
        r["fp"]
        for r in stage_dfs["exact_dedup"]
        .select(F.md5(normalize_text("text")).alias("fp"))
        .collect()
    }

    # land the same intake as TWO parquet batches (split by id parity)
    intake = crawl_pipeline_intake(spark, sf_dir)
    landing = tmp_path / "landing"
    intake.filter(F.col("doc_id") % 2 == 0).write.parquet(
        str(landing / "b0")
    )
    intake.filter(F.col("doc_id") % 2 == 1).write.parquet(
        str(landing / "b1")
    )
    schema = intake.schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(landing))
    )
    curated = stream_crawl_curation(
        stream,
        robots_rules_df(spark, sorted(_ROBOTS_TXT.items())),
        CRAWL_BLOCKLIST_PHRASES,
        crawl_cascade_rules(),
    )
    out = run_stream_to_memory(
        curated.select(F.md5(normalize_text("text")).alias("fp")),
        output_mode="append",
    )
    got = {r["fp"] for r in out.collect()}
    assert got == want


def test_stream_crawl_dedup_merges_normalization_variants(spark, tmp_path):
    """Review regression (r8): the streaming twin's dedup key must be
    the SAME normalize_text canonical form as the batch
    exact_text_dedup — raw-text md5 kept case/punctuation variants the
    batch twin merges. Two variant docs ('Alpha, beta!' vs 'alpha
    beta' word-stretched to pass the cascade) must yield ONE
    survivor."""
    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        crawl_cascade_rules,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        stream_crawl_curation,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        run_stream_to_memory,
    )

    # 40 distinct words: passes every cascade rule (length 100-450,
    # >=30 words, diversity 1.0)
    base = " ".join(f"word{i:02d}" for i in range(40))
    variant = base.replace("word00", "Word00,").replace("word39", "WORD39!")
    distinct = " ".join(f"item{i:02d}" for i in range(40))
    rows = [
        (1, base, "en", len(base), "http://ok.example/a"),
        (2, variant, "en", len(variant), "http://ok.example/b"),
        (3, distinct, "en", len(distinct), "http://ok.example/c"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars int, url string"
    )
    landing = tmp_path / "vland"
    df.write.parquet(str(landing / "b0"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(landing))
    )
    curated = stream_crawl_curation(
        stream,
        robots_rules_df(spark, [("ok.example", "User-agent: *\nAllow: /")]),
        ["never matches anything here"],
        crawl_cascade_rules(),
    )
    out = run_stream_to_memory(curated, output_mode="append")
    got = sorted(r["doc_id"] for r in out.collect())
    # ONE survivor per normalized-content class: docs 1 and 2 merge
    # (which representative wins within a micro-batch is arbitrary —
    # the class contract, not min-id, is what the stream guarantees)
    assert len(got) == 2 and got[0] in (1, 2) and got[1] == 3, got


def test_stream_crawl_dedup_watermark_bounds_state(spark, tmp_path):
    """r9 review fix: ``dedup_watermark=(ts_col, horizon)`` routes the
    fingerprint dedup through dropDuplicatesWithinWatermark — the plan
    carries an event-time watermark (state evicted past the horizon
    instead of growing 16 bytes/doc forever), duplicates within the
    horizon still merge, and the internal __fp key stays dropped."""
    import datetime as _dt

    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        crawl_cascade_rules,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        stream_crawl_curation,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.events import (
        run_stream_to_memory,
    )

    base = " ".join(f"word{i:02d}" for i in range(40))
    variant = base.replace("word00", "Word00,")
    distinct = " ".join(f"item{i:02d}" for i in range(40))
    t0 = _dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, "en", len(base), "http://ok.example/a", t0),
        (2, variant, "en", len(variant), "http://ok.example/b",
         t0 + _dt.timedelta(minutes=5)),
        (3, distinct, "en", len(distinct), "http://ok.example/c",
         t0 + _dt.timedelta(minutes=10)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, n_chars int, "
        "url string, fetched_at timestamp",
    )
    landing = tmp_path / "wmland"
    df.write.parquet(str(landing / "b0"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(landing))
    )
    curated = stream_crawl_curation(
        stream,
        robots_rules_df(spark, [("ok.example", "User-agent: *\nAllow: /")]),
        ["never matches anything here"],
        crawl_cascade_rules(),
        dedup_watermark=("fetched_at", "1 hour"),
    )
    analyzed = curated._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in analyzed, analyzed[:500]
    assert "__fp" not in curated.columns
    out = run_stream_to_memory(curated, output_mode="append")
    got = sorted(r["doc_id"] for r in out.collect())
    assert len(got) == 2 and got[0] in (1, 2) and got[1] == 3, got


def test_stream_store_token_budget_matches_batch(spark, sf_dir, tmp_path):
    """r8 VERDICT #6: the documented stream-filter / batch-mix split
    must EXECUTE end-to-end — stream-curate -> durable parquet store
    (availableNow, checkpointed) -> `token_budget_post_pass` — and
    land exactly the rows of the graded batch pipeline's token_budget
    stage (`crawl_pipeline_q` stages 1-5).

    Representative canonicalization: the stream dedup keeps the FIRST
    arrival of a content class, the batch dedup keeps min doc_id. On
    this corpus every replica is base_id + 1_000_000 with verbatim
    content (crawl_pipeline_intake), and — pinned below as a
    precondition — a replica never outlives its base through the
    per-row filters, so `doc_id % 1_000_000` maps whichever
    representative the stream kept onto the batch's. The url column is
    excluded from the comparison for the same reason (it is derived
    from the pre-canonicalization id)."""
    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        CRAWL_BLOCKLIST_PHRASES,
        _ROBOTS_TXT,
        crawl_cascade_rules,
        crawl_pipeline_intake,
        crawl_pipeline_stages,
    )
    from udacity_data_engineering_capstone_project_spark.streaming.crawl import (
        curate_stream_to_store,
        stream_crawl_curation,
        token_budget_post_pass,
    )

    # graded-batch truth: the five-stage pipeline's budget output
    stage_dfs = dict(crawl_pipeline_stages(spark, sf_dir))
    cmp_cols = ["doc_id", "text", "lang", "n_chars"]
    want = {tuple(r) for r in stage_dfs["token_budget"].select(*cmp_cols).collect()}

    # precondition the canonicalization relies on: every robots
    # survivor with a replica id has its base surviving too (so the
    # batch representative is ALWAYS the base id)
    robots_ids = {r.doc_id for r in stage_dfs["robots"].select("doc_id").collect()}
    assert all(
        (i - 1_000_000) in robots_ids for i in robots_ids if i >= 1_000_000
    )

    # live half: land the intake as two parquet batches, stream-curate,
    # drain into the durable store
    intake = crawl_pipeline_intake(spark, sf_dir)
    landing = tmp_path / "landing"
    intake.filter(F.col("doc_id") % 2 == 0).write.parquet(str(landing / "b0"))
    intake.filter(F.col("doc_id") % 2 == 1).write.parquet(str(landing / "b1"))
    stream = (
        spark.readStream.schema(intake.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(landing))
    )
    curated = stream_crawl_curation(
        stream,
        robots_rules_df(spark, sorted(_ROBOTS_TXT.items())),
        CRAWL_BLOCKLIST_PHRASES,
        crawl_cascade_rules(),
    )
    store = tmp_path / "curated_store"
    curate_stream_to_store(
        curated, str(store), str(tmp_path / "ckpt")
    )

    # batch half: canonicalize representatives, then the SAME budget
    # operator/parameters as the graded stage (lang / n_chars / 2000 /
    # hash(doc_id) order)
    canon = spark.read.parquet(str(store)).withColumn(
        "doc_id", F.col("doc_id") % 1_000_000
    )
    canon_store = tmp_path / "canon_store"
    canon.write.parquet(str(canon_store))
    got_df = token_budget_post_pass(
        spark, str(canon_store), ("lang",), "n_chars", 2000, "doc_id"
    )
    got = {tuple(r) for r in got_df.select(*cmp_cols).collect()}
    assert got == want and len(got) > 0

    # the availableNow checkpoint makes the store incremental: a
    # re-drain with no new landings appends NOTHING
    n_before = spark.read.parquet(str(store)).count()
    curated2 = stream_crawl_curation(
        spark.readStream.schema(intake.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(landing)),
        robots_rules_df(spark, sorted(_ROBOTS_TXT.items())),
        CRAWL_BLOCKLIST_PHRASES,
        crawl_cascade_rules(),
    )
    curate_stream_to_store(curated2, str(store), str(tmp_path / "ckpt"))
    assert spark.read.parquet(str(store)).count() == n_before
