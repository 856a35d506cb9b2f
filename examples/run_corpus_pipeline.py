"""End-to-end training-data curation pipeline over the synthetic
corpus — the north-star workflow composed from the engine's operators,
all lazy DataFrame plans until each stage's action:

  documents --(extract_links + host_link_edges + pagerank)--> host ranks
            --(strip_html + normalize_unicode)--> canonical text
            --(text_profile + gopher_quality)--> quality filter
            --(repetition_signals)--> drop boilerplate
            --(ngram_overlap)--> drop benchmark-contaminated docs
            --(redact_pii + remove_duplicated_segments)--> scrub text
            --(exact_text_dedup)--> drop exact copies
            --(minhash LSH + connected components)--> drop near-dups
            --(stratified_hash_sample + cap_per_group)--> mix corpus
            --(hash_split + deterministic_shuffle)--> train split order
            --(DSIR importance resample)--> domain-matched train set
            --(join embeddings, IVF index)--> similarity search
            --(chunk_documents + pack_sequences)--> training windows
            --(write_clustered by lang,source)--> curated corpus files
            --(write_training_shards)--> manifested epoch shards

Usage: python examples/run_corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark import get_spark
from udacity_data_engineering_capstone_project_spark.operators import dedup as dd
from udacity_data_engineering_capstone_project_spark.operators import similarity as sim
from udacity_data_engineering_capstone_project_spark.operators import textstats as ts
from udacity_data_engineering_capstone_project_spark.sources.readers import read_table
from udacity_data_engineering_capstone_project_spark.sources.sinks import (
    write_clustered,
    write_training_shards,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")

    spark = get_spark(app_name="corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    import time

    _t = [time.time()]

    def tick(label: str) -> None:
        now = time.time()
        print(f"[stage] {label}: {now - _t[0]:.1f}s", file=sys.stderr)
        _t[0] = now

    # -1. crawl intake seam: the corpus arrives as .warc.gz segments
    #     (Common Crawl's wire format). Round-trip the raw docs through
    #     a real WARC export + binaryFile/mapInPandas record split so
    #     every later stage runs on crawl-shaped input.
    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        warc_documents,
        write_warc,
    )

    raw = read_table(spark, sf_dir, "documents")
    warc_dir = os.path.join(out_dir, "crawl_warc")
    warc_manifest = write_warc(
        raw.withColumn(
            "url", F.concat(F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
                            F.lit(".com/p/"), F.col("doc_id").cast("string")),
        ),
        warc_dir, payload_col="text", uri_col="url", num_files=4,
    )
    crawled = warc_documents(spark, warc_dir).select(
        F.col("target_uri").alias("url"), "text"
    )
    # re-attach ids + table metadata by the URL key the WARC carried
    docs = raw.drop("text").join(
        crawled.withColumn(
            "doc_id", F.regexp_extract("url", r"/p/(\d+)$", 1).cast("bigint")
        ).drop("url"),
        on="doc_id",
    )
    n_raw = docs.count()
    assert n_raw == sum(m["records"] for m in warc_manifest)
    tick("warc-roundtrip+read")

    # -1b. robots.txt compliance screen: per-host rule frames broadcast
    #      against the URL column; h1.com's crawl policy blocks /p/
    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        filter_robots_disallowed,
        robots_rules_df,
    )

    docs = docs.withColumn(
        "url", F.concat(F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
                        F.lit(".com/p/"), F.col("doc_id").cast("string")),
    )
    rules = robots_rules_df(
        spark, [("h1.com", "User-agent: *\nDisallow: /p/1\nAllow: /p/1*2")]
    )
    docs = filter_robots_disallowed(docs, rules, "url").drop("url")
    n_robots = docs.count()
    tick("robots-screen")

    # -1c. outlink harvest -> host link graph -> PageRank: the crawl
    #      frontier ranking loop. The corpus is plain text, so plant
    #      two doc_id-derived outlinks per doc the way a real page
    #      carries them; src_host re-derives from doc_id (the same
    #      h<doc_id % 3>.com identity the robots stage used), so no
    #      join back to the corpus is needed after extraction.
    from udacity_data_engineering_capstone_project_spark.operators.graph import pagerank

    planted = docs.select(
        "doc_id",
        F.expr(
            "'<a href=\"http://h' || CAST(doc_id * 3 % 5 AS STRING) ||"
            " '.com/x\">x</a> <a href=\"http://h' ||"
            " CAST(doc_id * 7 % 5 AS STRING) || '.com/y\">y</a>'"
        ).alias("html"),
    )
    links = ts.extract_links(planted, "doc_id", "html").withColumn(
        "src_host",
        F.concat(F.lit("h"), (F.col("doc_id") % 3).cast("string"), F.lit(".com")),
    )
    host_edges = ts.host_link_edges(links, "src_host")
    top_hosts = (
        pagerank(host_edges, "src_host", "dst_host", max_iter=8)
        .orderBy(F.col("rank").desc(), "node")
        .limit(3)
        .collect()
    )
    tick("link-graph-rank")

    # 0. canonicalize: HTML -> visible text (no-op whitespace collapse
    #    on plain text) and NFKC unicode normalization, so every
    #    downstream fingerprint/n-gram sees one canonical form
    from udacity_data_engineering_capstone_project_spark.operators.cleaning import normalize_unicode

    docs = normalize_unicode(ts.strip_html(docs, "text"), "text", form="NFKC")
    # Materialize the canonical form ONCE: every downstream stage (a
    # dozen separate actions) would otherwise replay the Arrow-batched
    # normalization against the raw scan each time. At cluster scale
    # this barrier is a persisted table between pipeline phases.
    docs = docs.localCheckpoint(eager=True)

    # 0b. corpus shape report: exact heavy hitters over the source
    #     column (bounded shuffle no matter how many sources exist)
    from udacity_data_engineering_capstone_project_spark.operators.sketches import heavy_hitters

    top_sources = heavy_hitters(docs, "source", min_frac=0.01).limit(3).collect()

    # 0c. length distribution per language via mergeable DDSketch rows
    #     (1% relative error; the same rows roll up across corpus
    #     versions without rescanning)
    from udacity_data_engineering_capstone_project_spark.operators.sketches import (
        quantile_sketch,
        sketch_quantiles,
    )

    len_sketch = quantile_sketch(docs, ["lang"], "n_chars", alpha=0.01)
    len_p50_p95 = {
        (r["lang"], r["q"]): round(r["estimate"], 1)
        for r in sketch_quantiles(len_sketch, ["lang"], [0.5, 0.95]).collect()
    }
    tick("canonicalize+heavy_hitters+length_sketch")

    # 1. quality gate: one codegen pass over every text metric, plus
    #    the Gopher rule battery (stopwords matched to the synthetic
    #    corpus vocabulary)
    profile = ts.text_profile(docs, "doc_id", "text", keep=("lang", "source"))
    quality_ids = profile.filter(F.col("quality_score") >= 0.1).select("doc_id")
    gopher_keep = ts.gopher_quality(
        docs, "doc_id", "text", min_words=10, min_stop_hits=1,
        stopwords=("the", "a"),
    ).filter(F.col("keep")).select("doc_id")
    docs_q = docs.join(quality_ids, on="doc_id").join(gopher_keep, on="doc_id")

    # 1a. ordered filter cascade with per-rule audit: length bounds +
    #     zlib compressibility (template spam compresses < 0.2) in one
    #     CASE-chain pass; the audit row set attributes every rejection
    #     to exactly one rule
    from udacity_data_engineering_capstone_project_spark.operators.quality import (
        apply_filter_cascade,
    )

    with_ratio = ts.compression_ratio(docs_q, "text")
    docs_q, cascade_audit = apply_filter_cascade(
        with_ratio,
        [
            ("too_short", F.length("text") >= 40),
            ("compress_spam", F.col("compress_ratio") >= 0.2),
        ],
    )
    docs_q = docs_q.drop("compress_ratio")
    cascade_counts = {r.rule: r.rows for r in cascade_audit.collect()}
    n_quality = docs_q.count()
    tick("quality_gate+cascade")

    # 1b. boilerplate filter: drop highly repetitive docs, then
    #     decontaminate against the benchmark slice (doc_id % 97 == 0)
    signals = ts.repetition_signals(docs_q, "doc_id", "text")
    keep_rep = signals.filter(
        (F.col("top_word_frac") < 0.5) & (F.col("dup_ngram_frac") < 0.5)
    ).select("doc_id")
    docs_q = docs_q.join(keep_rep, on="doc_id")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    contaminated = ts.ngram_overlap(
        docs_q, benchmark, "doc_id", "text", ngram_n=3
    ).filter(F.col("n_overlap") >= 20).select("doc_id")
    docs_q = docs_q.join(contaminated, on="doc_id", how="left_anti")
    n_clean = docs_q.count()
    tick("repetition+decontam")

    # 1b2. quality-classifier loop: the heuristic profile provides weak
    #      labels, a hashed-ngram logistic model trains on them, and
    #      the trained table is the transferable artifact — future
    #      crawls score with one broadcast join, no heuristics rerun
    labels = profile.select(
        "doc_id", (F.col("quality_score") >= 0.1).alias("label")
    )
    wdf, clf_bias = ts.train_hashed_classifier(
        docs.join(labels, on="doc_id"), "doc_id", "text", "label",
        num_buckets=1024, iterations=8,
    )
    clf_scores = ts.apply_hashed_classifier(
        docs_q, "doc_id", "text", wdf, bias=clf_bias, num_buckets=1024
    )
    n_clf_high = clf_scores.filter(F.col("clf_score") >= 0.5).count()
    tick("hashed_classifier")

    # 1b3. LM perplexity filter (CCNet-style): a stupid-backoff
    #      trigram LM trained on the cleaned slice scores every doc;
    #      out-of-domain text shows up as high perplexity
    lm = ts.train_ngram_lm(docs_q, "text", n=3, min_count=2)
    ppl = ts.ngram_lm_logprob(docs_q, "doc_id", "text", lm, n=3)
    n_ppl_ok = ppl.filter(F.col("perplexity") <= 5000).count()
    tick("ngram_lm")

    # 1c. PII scrub (audit counts ride along), then cross-document
    #     duplicated-segment removal (C4-style boilerplate scrub):
    #     6-word chunks shared by >= 3 docs vanish everywhere
    docs_q = ts.redact_pii(docs_q, "text").drop("text").withColumnRenamed(
        "redacted_text", "text"
    )
    scrubbed = dd.remove_duplicated_segments(
        docs_q, "doc_id", "text", window=6, min_docs=3, keep_text=True
    )
    docs_q = (
        docs_q.drop("text")
        .join(scrubbed.filter(F.col("n_kept") > 0), on="doc_id")
        .withColumnRenamed("cleaned_text", "text")
        .drop("n_segments", "n_kept", "cleaned_hash")
    )
    n_scrub = docs_q.count()
    tick("pii+segment_scrub")
    # phase barrier: the scrubbed text feeds exact dedup, minhash LSH,
    # spans and the mixing tail — checkpoint instead of replaying the
    # scrub chain per action
    docs_q = docs_q.localCheckpoint(eager=True)

    # 2. exact dedup: keep the min-id survivor of each fingerprint
    survivors = dd.exact_text_dedup(docs_q, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    docs_e = docs_q.join(survivors, on="doc_id")
    n_exact = docs_e.count()
    tick("exact_dedup")

    # 3. near-dup removal: MinHash-LSH pairs -> connected components ->
    #    cluster representatives only
    pairs = dd.minhash_dedup_pairs(docs_e, "doc_id", "text", threshold=0.8)
    # keep the BEST duplicate of each cluster, not the first: the
    # heuristic quality score computed in stage 1 picks the survivor
    reps = dd.dedup_representatives(
        docs_e.select("doc_id", "lang", "source").join(
            profile.select("doc_id", "quality_score"), on="doc_id", how="left"
        ),
        pairs,
        "doc_id",
        prefer_col="quality_score",
    )
    keep = reps.filter(F.col("is_representative")).select("doc_id")
    docs_n = docs_e.join(keep, on="doc_id")
    n_near = docs_n.count()
    tick("minhash_near_dedup")
    docs_n = docs_n.localCheckpoint(eager=True)

    # 3b. sub-document exact-substring audit (ExactSubstr): maximal
    #     repeated >=12-token spans that survive whole-document dedup
    #     (licenses, boilerplate passages) — reported, not removed here
    spans = dd.duplicated_spans(docs_n, "doc_id", "text", min_tokens=12)
    n_spans = spans.count()
    tick("duplicated_spans")

    # 4. similarity search over the curated docs' embeddings: build an
    #    IVF index partitioned by cell, query the first 3 vectors
    emb = read_table(spark, sf_dir, "embeddings").join(
        docs_n.select(F.col("doc_id").alias("vec_id")), on="vec_id"
    )
    centroids = sim.train_centroids(
        emb, "vec_id", "embedding", k=8, iters=3
    ).withColumnRenamed("cell", "vec_id")

    # 4a. semantic dedup (SemDeDup): same-meaning vectors collapse
    #     within their k-means cluster before the index is built
    sem_dups = sim.semantic_dedup(
        emb, centroids, "vec_id", "embedding", threshold=0.999
    )
    emb = emb.join(sem_dups.select("vec_id"), on="vec_id", how="left_anti")
    n_sem = sem_dups.count()
    tick("semantic_dedup")
    index_path = os.path.join(out_dir, "ivf_index")
    # IVFPQ layout: 8-byte PQ codes inside the cells, ADC probe
    # scoring, exact-cosine rerank against the source-of-truth table
    pq_cb = sim.train_pq_codebooks(emb, "vec_id", "embedding", m=16, k=16, iters=3)
    sim.write_ivf_index(
        emb, centroids, index_path, "vec_id", "embedding", pq_codebooks=pq_cb
    )
    queries = emb.filter(F.col("vec_id") < 3)
    hits = sim.search_ivf_index(
        spark, index_path, queries, centroids, "vec_id", "embedding",
        k=5, nprobe=2, rerank_with=emb,
    )
    n_hits = hits.count()
    tick("pq_train+ivf_index+search")

    # 4b. deterministic mixing: per-language sampling + per-source cap,
    #     then chunk into 128-token windows and pack into 512-budget
    #     training sequences
    from udacity_data_engineering_capstone_project_spark.operators.packing import pack_sequences
    from udacity_data_engineering_capstone_project_spark.operators.sampling import (
        cap_per_group,
        deterministic_shuffle,
        hash_split,
        stratified_hash_sample,
    )

    mixed = stratified_hash_sample(
        docs_n, "doc_id", "lang", {"en": 0.9, "de": 0.5}, default_rate=0.75
    )
    mixed = cap_per_group(
        mixed, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], quota=50
    )
    # token-budget twin: spend at most 12k chars per source, hash order
    from udacity_data_engineering_capstone_project_spark.operators.sampling import (
        cap_tokens_per_group,
    )

    mixed = cap_tokens_per_group(
        mixed, ["source"], "n_chars", budget=12_000, key_col="doc_id"
    )
    # train/val/test assignment + epoch shuffle: both pure functions of
    # the doc hash, so the export reproduces byte-for-byte on any layout
    mixed = hash_split(mixed, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    train = deterministic_shuffle(
        mixed.filter(F.col("split") == "train"), "doc_id", seed=1
    )
    n_train = train.count()

    # 4b. DSIR: tilt the train mix toward a target domain (here the
    #     corpus's own English slice as the exemplar) — the importance
    #     model is two bucket histograms, scoring is one featurization
    #     pass + a broadcast join, and Gumbel top-k keeps the draw
    #     reproducible on any cluster layout
    target = docs_n.filter(F.col("lang") == "en").select("text")
    imp_model = ts.train_importance_model(
        target, train.select("text"), "text", num_buckets=1024
    )
    train = ts.importance_resample(
        train, "doc_id", "text", imp_model,
        k=max(int(n_train * 0.8), 1), num_buckets=1024,
    )
    n_dsir = train.count()
    tick("dsir-resample")

    # 4c. manifested epoch shards: shard id and within-shard order are
    #     pure hashes of (doc_id, seed) — byte-stable export, and the
    #     manifest is recounted from the committed files
    shard_manifest = write_training_shards(
        train.select("doc_id", "text"),
        os.path.join(out_dir, "shards"),
        "doc_id", num_shards=4, seed=1,
    )
    tick("shard-export")
    chunks = ts.chunk_documents(train, "doc_id", "text", chunk_tokens=128, stride=96)
    chunks = chunks.withColumn(
        "chunk_key", F.col("doc_id") * 10_000 + F.col("chunk_id")
    )
    # explicit buckets: the auto default (buckets=None) derives the
    # scatter width from a count(), which would evaluate the lazy
    # chunks plan twice — pin the historical 64 here instead
    packed = pack_sequences(chunks, "chunk_key", "n_tokens", budget=512, buckets=64)
    n_packs = packed.select("pack_id").distinct().count()
    n_chunks = packed.count()

    # 5. curated corpus, clustered for read-side pruning
    write_clustered(
        docs_n, os.path.join(out_dir, "corpus"), ["lang", "source"], num_files=4
    )

    # 6. persist the dedup index, then screen a simulated next-day
    #    batch against it WITHOUT re-processing the corpus: one exact
    #    copy, one edited near-copy, one novel doc
    idx_path = os.path.join(out_dir, "dedup_index")
    dd.write_dedup_index(docs_n, idx_path, "doc_id", "text")
    sample = docs_n.orderBy("doc_id").limit(1).collect()[0]
    new_batch = spark.createDataFrame(
        [
            (1_000_000, sample["text"]),
            # light edit: stays above the 8x8 LSH banding knee (~0.77
            # jaccard) — heavier edits are a different retrieval regime
            (1_000_001, sample["text"] + " edited tail appended"),
            (1_000_002, "entirely novel content about incremental corpus curation " * 4),
        ],
        ["doc_id", "text"],
    )
    # 6a. Bloom fast path: a filter of every admitted fingerprint
    #     (persistable next to the index) lets definitely-new rows skip
    #     the exact-fingerprint join entirely — only the 'maybe seen'
    #     sliver pays it. No false negatives, so the fast verdict is
    #     safe; here it routes all three rows correctly.
    from udacity_data_engineering_capstone_project_spark.functions.text import normalize_text
    from udacity_data_engineering_capstone_project_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom,
        optimal_num_bits,
    )

    n_bits = optimal_num_bits(max(n_near, 1), fp_rate=0.01)
    fp_bloom = build_bloom(
        docs_n.select(F.md5(normalize_text(F.col("text"))).alias("fp")),
        "fp", n_bits, 7,
    )
    batch_flags = bloom_might_contain(
        new_batch.select(
            "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
        ),
        fp_bloom, "fp", n_bits, 7,
    )
    n_bloom_fast = batch_flags.filter(~F.col("maybe_seen")).count()

    screened = dd.dedup_against_index(
        spark, idx_path, new_batch, "doc_id", "text", threshold=0.6
    )
    screen_summary = {
        r["doc_id"]: ("exact" if r["is_exact_dup"]
                      else "near" if r["dup_of"] is not None else "novel")
        for r in screened.collect()
    }

    print(
        f"raw={n_raw} (warc files={len(warc_manifest)}) "
        f"-> robots={n_robots} -> quality={n_quality} "
        f"(cascade audit={cascade_counts}) -> clean={n_clean} "
        f"(clf-high={n_clf_high}, ppl-ok={n_ppl_ok}) "
        f"-> pii+segment-scrub={n_scrub} -> exact-dedup={n_exact} "
        f"-> near-dedup={n_near}; dup spans={n_spans}; "
        f"semantic dups dropped={n_sem}; ann hits={n_hits}; "
        f"train split={n_train} -> dsir-kept={n_dsir} "
        f"(shards={[m['rows'] for m in shard_manifest]}); "
        f"{n_chunks} chunks in {n_packs} packs; "
        f"day-2 screen={screen_summary} "
        f"(bloom fast-passed {n_bloom_fast}/3); "
        f"top sources={[(r['value'], r['count']) for r in top_sources]}; "
        f"top linked hosts={[(r['node'], round(r['rank'], 4)) for r in top_hosts]}; "
        f"len p50/p95={len_p50_p95}; "
        f"corpus at {out_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
