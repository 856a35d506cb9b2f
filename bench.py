"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric", "value" (total sec), "unit",
"queries" (per-query sec), "sf"}. Results are consumed against
BASELINE.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    # reference-parity relational core
    "pricing_summary",
    "star_schema_fact",
    "analyst_top_segments",
    "argmax_ties",
    "top1_per_group",
    # event/time-series
    "asof_last_click",
    # composite pipeline
    "corpus_prep",
    # warehouse incremental tier (round 3)
    "scd2_history",
    # warehouse/curation tier promoted to driver slots in round 4
    "merge_upsert_q",
    "range_join_q",
    "category_drift_q",
    # sub-document exact-substring dedup (round 4)
    "dup_spans_q",
    # training-data extensions (scale paths)
    "dedup_exact",
    "segment_dedup",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "ann_topk",
    "ann_ivf",
    # one-pass text tier (replaces text_stats + token_counts_by_lang)
    "text_profile",
    # curation tier (round 2): repetition filters, decontamination,
    # deterministic sampling, retrieval scoring
    "repetition_signals",
    "contamination_check",
    "corpus_sample",
    "bm25_retrieval",
    # LM perplexity filter (round 4 session 2): trains the stupid-
    # backoff trigram LM on documents AND scores them, per invocation
    "ngram_lm",
    # round 4 session 3 graded additions: Gopher rule battery (one
    # codegen pass) and exact heavy hitters. The bench runs the
    # sf0.1-sized threshold variant (0.05% vs the graded 0.6%): the
    # flat user distribution clears 0.6% only at sf<=0.01, so the
    # graded query benched 0 rows and never timed the verify join
    # (r5 finding). Grading is unchanged — heavy_hitters_q still
    # holds DuckDB hash parity at sf0.01.
    "gopher_quality_q",
    "heavy_hitters_bench",
    # round 4 session 4: crawl-hygiene URL canonicalization (one
    # codegen projection over synthetic URLs) and DDSketch quantile
    # partials (one aggregation)
    "url_canon_q",
    "quantile_sketch_q",
    # round 6: the queries promoted into driver slots this round join
    # the bench — per-source token budget (window + running sum),
    # corpus-version diff (full-outer id join), clustering coefficient
    # (wedge join over the supplier co-occurrence graph), and the
    # closed-form-oracled decay recurrence (applyInPandas scan)
    "token_budget_q",
    "corpus_diff_q",
    "clustering_coeff_q",
    "decay_scores",
    # round 6 continuation: crawl-hygiene additions — RFC 9309 robots
    # screen (broadcast rules + struct-argmax) and the ordered quality
    # filter cascade (one CASE-chain pass + rule-sized audit agg)
    "robots_filter_q",
    "filter_cascade_q",
    # round 7: the end-to-end crawl curation composition (6 stages,
    # eager barriers) and the other rotation promotions — intake
    # anomaly z-scores and the classifier PR sweep
    "crawl_pipeline_q",
    "ingest_anomaly_q",
    "pr_curve_q",
    # bench-only est-screen twin: keeps the r4-r6 minhash baseline
    # series alive after dedup_minhash_lsh's r7 contract change to
    # exact verification (screen regressions show up undiluted here)
    "minhash_screen_bench",
    # round 8: the rotation promotions join the bench so every graded
    # row carries a recorded baseline — hot-key skew report (two
    # grouped profiles), equi-depth length bins (grouped percentile +
    # broadcast cut join), embedding centroid drift (full-outer
    # per-dimension join), HTML->text extraction (codegen regexp
    # chain over 4 wrappings/doc), blocklist phrase screen (literal
    # prefilter + broadcast verify)
    "skew_report_q",
    "quality_bins_q",
    "embedding_drift_q",
    "strip_html_q",
    "blocklist_screen_q",
    # round 9: the rotation promotions join the bench so every graded
    # row carries a recorded baseline — quantile clipping (one agg +
    # pure projection), per-node triangle counts (degree-oriented wedge
    # join), near-dup connected components (LSH pairs + iterative
    # min-label propagation), fastText-style hashed-ngram scorer
    # (explode -> hash -> dot product). The r9-demoted queries
    # (text_profile / repetition_signals / corpus_sample /
    # url_canon_q; audio_features was never benched) stay benched
    # above though their driver slots rotated out; ngram_lm above is
    # now REGISTERED (r9 promotion).
    "winsorize_q",
    "triangle_count_q",
    "dedup_clusters",
    "hashed_classifier",
    # round 9 continuation (second rotation slate): the newly
    # oracle-backed pipeline passes join the bench as they take driver
    # slots — PII scrub (chained regexp codegen projection, zero
    # shuffle), sequence packing (hash-bucket scatter + segment-tree
    # first-fit inside applyInPandas), edit-distance fuzzy matching
    # (SymSpell deletion-neighborhood block join), and BPE
    # train+tokenize (vocab-sized merge rounds + distinct-word
    # tokenize mapped by equi-join). Of the ceded queries,
    # contamination_check / bm25_retrieval / dedup_simhash stay
    # benched above though their driver slots rotated out
    # (tfidf_topk was never a bench row).
    "pii_redact_q",
    "pack_sequences_q",
    "fuzzy_join",
    "bpe_tokenize_q",
    # round 10: the 15 never-driver-graded queries took driver slots
    # (r9 VERDICT #1) and join the bench so every graded row carries a
    # recorded baseline — as-of next event, BPE merge training,
    # calibration bins, sliding-window chunking, k-anonymity audit,
    # semi-supervised label propagation, leakage-safe split, outlink
    # host graph, MMR diversified top-k, personalized PageRank,
    # time-series resample, AQE-skew-split join, shard assignment,
    # temperature-flattened mix, weighted hash sample — plus the new
    # reference-dimension fuzzy join (r9 VERDICT #3). The 15 demoted
    # veterans keep their existing bench rows above.
    "asof_next_q",
    "bpe_train_q",
    "calibration_q",
    "chunk_q",
    "k_anonymity_q",
    "label_prop_q",
    "leakage_split_q",
    "link_graph_q",
    "mmr_q",
    "ppr_q",
    "resample_q",
    "salted_join_q",
    "shards_q",
    "temperature_mix_q",
    "weighted_sample",
    "fuzzy_join_ref_q",
    # round 11: the rotation promotion joins the bench (streaming file
    # source -> watermark -> tumbling hourly window, batch-twin oracle)
    "streaming_hourly",
    # round 11 new surface: LEFT-form reference fuzzy join (unmatched
    # rows survive with a NULL-distance marker) and the cross-corpus
    # embedding decontamination screen, BOTH physical paths — the
    # replicated-matrix matmul default and the LSH join fallback
    "fuzzy_join_ref_left_q",
    "contamination_embedding_q",
    "contamination_embedding_lsh_q",
    # round 13: the rotation promotions join the bench so every graded
    # row carries a recorded baseline — the r2-r4 veterans returning
    # to the driver window (relational/event shapes: grouped avgs,
    # grouping sets, pivot/unpivot, JSON array explode, date parts,
    # coordinate bucket join, HLL error contract, streaming user
    # stats, SymSpell name pairs) plus the auto-LSH-family
    # contamination twin, the one spec that had never held a driver
    # row. top1_per_group already carries a row above.
    "approx_distinct",
    "avg_of_avgs",
    "grouping_sets_sales",
    "local_supplier_volume",
    "shipping_priority",
    "streaming_user_stats",
    "bucket_join",
    "date_parts_agg",
    "events_json_arrays",
    "fuzzy_name_pairs",
    "pivot_unpivot",
    "contamination_embedding_auto_q",
]

# Rows that have swung 1.3-2x between same-code in-class runs every
# round since r8 (r10 VERDICT #3) — the C2-JIT placement lottery: WHICH
# generated method tier lands in the compiled set varies per JVM, and
# these queries' wide generated code (BPE merge rounds, SymSpell
# neighborhood join, 60-bit simhash bands) is the most placement-
# sensitive. For these, the bench repeats the full steady-state
# measurement 3x and records the MEDIAN plus the spread, so a 1.5x
# single-sample swing stops reading as a regression in BASELINE.md.
VOLATILE_QUERIES = {
    "bpe_train_q",
    "bpe_tokenize_q",
    "fuzzy_join",
    "dedup_simhash",
    # r12: the iterative-graph rows joined the class — their walls are
    # (rounds x per-round JIT/scheduling latency), so one unlucky
    # placement multiplies across every round (ppr_q swung 7.3 -> 8.8 s
    # between two same-code idle-host draws this round, dedup_clusters
    # 3.2 -> 3.9)
    "ppr_q",
    "dedup_clusters",
    "label_prop_q",
}


def _host_exclusivity() -> dict:
    """Snapshot host contention at bench start so the artifact is
    self-certifying (r8 VERDICT #3): cross-round comparisons can see
    whether a slow total was engine regression or a shared host.
    loadavg_1m ~ runnable threads (exclusive run: < a few, since the
    bench JVM is still warming); n_java_procs counts OTHER live JVMs
    (an exclusive run reports 0-1: just this session's gateway)."""
    snap: dict = {}
    try:
        la1, la5, la15 = os.getloadavg()
        snap["loadavg_1m"] = round(la1, 2)
        snap["loadavg_5m"] = round(la5, 2)
    except OSError:
        pass
    n_java = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/comm") as fh:
                    if fh.read().strip() == "java":
                        n_java += 1
            except OSError:
                continue
        snap["n_java_procs"] = n_java
    except OSError:
        pass
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # Snapshot BEFORE the bench JVM spins up: loadavg/JVM counts here
    # describe the host we're about to share, not our own footprint.
    host = _host_exclusivity()
    print(f"# host at start: {host}", file=sys.stderr)

    from udacity_data_engineering_capstone_project_spark import get_spark
    from udacity_data_engineering_capstone_project_spark.plans import queries as qmod
    from udacity_data_engineering_capstone_project_spark.plans.queries import (
        REGISTRY,
        UNREGISTERED,
    )

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once so per-query numbers measure the
    # engine, not session bootstrap.
    REGISTRY["pricing_summary"].fn(spark, sf_dir).collect()

    # Host-calibration anchor (r7, VERDICT #2), measured at the START
    # of the run on a freshly warmed JVM — the context whose
    # stability was measured (~3% across fresh JVMs); an end-of-run
    # placement read 0.267 s vs 0.37-0.39 standalone (bench-long
    # JIT/GC state shifts the anchor). A fixed, data-free,
    # pure-codegen job whose wall time depends only on host + JVM
    # speed — recorded IN the artifact so cross-round comparisons can
    # separate engine regressions from host variance (the r5->r6
    # "1.4x slower boot" was provable only from prose before this).
    # 1B xxhash64+sum rows through one whole-stage-codegen pipeline,
    # best of 3 after TWO warm runs — measured stable to ~3% across
    # fresh JVMs (a 200M variant swung 2x with end-of-bench JIT/GC
    # state; the larger fixed workload amortizes it).
    from pyspark.sql import functions as F

    def _calib() -> float:
        t0 = time.perf_counter()
        # % 1024 bounds the sum far under long range — a raw
        # sum(xxhash64) overflows int64 after ~2^33 rows under ANSI
        spark.range(0, 1_000_000_000, 1, 32).select(
            F.sum(F.xxhash64("id") % 1024).alias("h")
        ).collect()
        return time.perf_counter() - t0

    _calib()
    _calib()  # two warm runs: JIT fully lands before timing
    calibration = round(min(_calib() for _ in range(3)), 3)
    print(f"# calibration: {calibration:.3f}s", file=sys.stderr)

    def _measure(fn) -> tuple[float, int]:
        """One steady-state measurement: warm to JIT steady state, then
        best-of-3. Returns (best_sec, rows)."""
        # isolate queries from each other: drop persisted lineages the
        # LSH operators pin (they accumulate across a shared session —
        # measured 4x swings on dedup_minhash_lsh from cache pressure)
        # and flush GC debt
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        # Uncounted warm runs until steady state. The LSH tier's wide
        # generated code (64-slot signature aggregates, higher-order
        # est-jaccard eval) takes ~3 executions before C2 JIT settles:
        # stage CPU profiled at 784 s cold vs 13 s warm with ZERO GC
        # time — pure interpreter-vs-compiled, and WHICH query pays it
        # varies run to run (r3 recorded minhash at 6.5 s; an identical
        # rerun recorded it at 1.3 s with simhash slow instead). A
        # single fixed warm run therefore under-warms whichever query
        # is unlucky. Warm until two consecutive uncounted runs are
        # within 1.3x (max 4), then time: recorded numbers measure the
        # engine's steady state — the regime a long-lived cluster
        # executor actually runs in — not JIT compilation on a
        # 20-second-old JVM.
        prev = None
        for _ in range(4):
            # GC before EVERY run, outside the timer: each invocation
            # leaves broadcast/exchange debris (the benchmark-gram
            # broadcast of contamination_check is the documented case),
            # and a driver GC is what triggers the ContextCleaner to
            # free it executor-side. Without this the debris of the
            # warm runs lands as a major-GC pause INSIDE a timed run —
            # the 0.5 s vs 4.5 s bimodality recorded across bench
            # sessions.
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            # steady = two consecutive runs within 1.3x of EACH OTHER:
            # a run much faster than its predecessor (JIT still landing)
            # must not end the warm-up either
            if prev is not None and dt <= prev * 1.3 and prev <= dt * 1.3:
                break
            prev = dt
        best, rows = None, 0
        # best-of-3 steady state (round 3; was best-of-2): identical
        # invocations occasionally hit a multi-second major-GC pause
        # (measured 0.97 vs 7.15 s on contamination_check) — a third
        # sample cuts the odds of recording a pause as the query time
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, rows

    def _spec_fn(name: str):
        # benched queries may have ceded their registry slot (driver
        # window is capped at 50) while staying benchmark headliners —
        # rotated-out queries keep their registry NAME in UNREGISTERED
        # (function names can differ, e.g. text_profile -> _q suffix);
        # bench-only twins (heavy_hitters_bench) are plain module attrs
        spec = REGISTRY.get(name) or UNREGISTERED.get(name)
        return spec.fn if spec else getattr(qmod, name)

    if "--all-specs" in sys.argv:
        # Tail-coverage mode (r10 VERDICT #6): one steady-state
        # measurement for EVERY spec in REGISTRY ∪ UNREGISTERED —
        # including the 33 specs the headline bench never times — so a
        # perf regression in e.g. sessionize or grouping_sets_sales
        # shows up as a recorded number, not as wall drift inside the
        # pytest parity suite. Run at sf0.01 by default (set
        # SPARK_GRAFT_SF_DIR): this is a drift tripwire, not a
        # headline; one JSON line to a sibling artifact.
        all_timings: dict[str, float] = {}
        for name in list(REGISTRY) + [n for n in UNREGISTERED if n not in REGISTRY]:
            fn = _spec_fn(name)
            best, rows = _measure(fn)
            all_timings[name] = round(best, 3)
            print(f"# {name}: {best:.3f}s ({rows} rows)", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "all_specs_total_wall",
                    "value": round(sum(all_timings.values()), 3),
                    "unit": "sec",
                    "queries": all_timings,
                    "sf": sf,
                    "calibration_sec": calibration,
                    "host_at_start": host,
                }
            )
        )
        spark.stop()
        return

    timings: dict[str, float] = {}
    volatile_detail: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        fn = _spec_fn(name)
        if name in VOLATILE_QUERIES:
            # median-of-3 independent steady-state measurements (r10
            # VERDICT #3): the placement lottery re-rolls every time
            # the generated classes are re-JITed, so three full
            # measurement blocks (each with its own warm-up) sample
            # three placements; the median is robust to one unlucky
            # draw and the recorded spread shows the noise band.
            samples = []
            for _ in range(3):
                b, rows = _measure(fn)
                samples.append(round(b, 3))
            med = sorted(samples)[1]
            timings[name] = med
            volatile_detail[name] = {"median_of": 3, "samples": samples}
            print(
                f"# {name}: {med:.3f}s median of {samples} ({rows} rows)",
                file=sys.stderr,
            )
        else:
            best, rows = _measure(fn)
            timings[name] = round(best, 3)
            print(f"# {name}: {best:.3f}s ({rows} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration_sec": calibration,
                "host_at_start": host,
                "volatile": volatile_detail,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
