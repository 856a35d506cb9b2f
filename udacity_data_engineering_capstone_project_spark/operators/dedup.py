"""Deduplication operators (reference: D1-D2, SURVEY.md §2.6, extended
per the 100 TB training-data north star).

Tiers, cheapest first:

1. Exact row/column dedup — `dropDuplicates` (reference `etl.py:111`).
2. Exact content dedup — md5 fingerprint group-by (one shuffle on the
   fingerprint; survivor = min id, deterministic).
3. Near-dup, exact Jaccard within blocks — for modest blocks / oracles.
4. MinHash + LSH — the scale path: signatures in one aggregation pass,
   banding turns O(n^2) pair search into an equi-join on band buckets.
5. SimHash — 64-bit sketch, hamming-ball candidate search via 16-bit
   band equi-joins.
6. Embedding near-dup — cosine over a blocking key.
7. Edit-distance fuzzy matching for SHORT key strings (names, titles,
   labels) — `operators.fuzzy.fuzzy_pairs`: SymSpell deletion-
   neighborhood blocking with exact recall for Levenshtein <= k.
   Complements tiers 3-5, which measure set overlap of long texts.

Everything is built from JVM-side expressions (xxhash64, higher-order
array functions) — no Python in the hot path.
"""

from __future__ import annotations

import time
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.functions.text import (
    char_shingles,
    normalize_text,
    tokens,
)
from udacity_data_engineering_capstone_project_spark.operators.similarity import cosine


def drop_exact_duplicates(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Full-row (or column-subset) exact dedup (reference `etl.py:111`).
    One hash-shuffle on all/subset columns; AQE coalesces output."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def _ensure_parallelism(df: DataFrame, key: str) -> DataFrame:
    """Spread a narrow input across the cluster before a CPU-heavy
    explode/aggregate stage. Small single-split files (a 5 MB parquet)
    otherwise pin the whole stage to one task; at real scale inputs
    arrive already split and this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df


def exact_text_dedup(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """Exact content dedup via md5 fingerprint: one row per distinct
    content, survivor = min(id) (deterministic), with copy count.

    Output: (fingerprint string, keep_id, n_copies).
    """
    content = normalize_text(text_col) if normalized else F.col(text_col)
    return (
        df.select(F.md5(content).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: array<bigint>[num_hashes].

    One explode + one aggregation (single shuffle on id). Each hash
    family member is xxhash64(shingle, seed_i) — independent 64-bit
    hashes, all computed JVM-side in the same pass.
    """
    # One string hash per shingle, then num_hashes independent
    # fixed-width long re-hashes. NOTE: the re-hash must be a real
    # independent hash per slot — a double-hashing family
    # (h1 + i*h2, Kirsch-Mitzenmacher) is NOT valid for MinHash: the
    # same shingle minimizes neighboring slots, correlating signature
    # positions and inflating the Jaccard estimate (measured: 1.6k ->
    # 5.4M false near-dup pairs on the sf0.1 corpus).
    # The per-slot expressions are built as SQL strings (one F.expr =
    # one py4j round-trip each) rather than nested Column calls: with
    # 64 slots the Column-API construction alone cost >1 s of driver
    # time per invocation (measured; execution was 0.35 s) — hundreds
    # of py4j round-trips, all before Spark saw the plan.
    shingle_rows = _ensure_parallelism(df, id_col).select(
        F.col(id_col), F.explode(char_shingles(text_col, shingle_k)).alias("__shingle")
    ).withColumn("__h", F.xxhash64(F.col("__shingle")))
    mins = [
        F.expr(f"min(xxhash64(__h, {i})) AS __h{i}") for i in range(num_hashes)
    ]
    agg = shingle_rows.groupBy(id_col).agg(*mins)
    arr = ", ".join(f"__h{i}" for i in range(num_hashes))
    return agg.select(F.col(id_col), F.expr(f"array({arr}) AS signature"))


def band_buckets(
    sig_df: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(id, band, bucket) rows: each signature hashed per band — the
    join key of LSH candidate generation, and the persisted layout of
    the incremental dedup index."""
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                    F.lit(b),
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(
        F.col(id_col), F.explode(band_entries).alias("bk")
    ).select(id_col, "bk.band", "bk.bucket")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
    distinct: bool = True,
    attach_signatures: bool = True,
) -> DataFrame:
    """Band the signatures and equi-join on (band, band_hash) to produce
    candidate pairs — the O(n^2) -> O(n) step. Returns (id_a < id_b)
    pairs with their signatures for verification; ``distinct=True``
    dedups the multi-band collisions BEFORE the signature re-attach
    (right when verification dominates), ``distinct=False`` leaves the
    banded copies for the caller to dedup AFTER its own cheap filter —
    `minhash_dedup_pairs` does that: est_jaccard is identical for every
    banded copy, so distinct-late aggregates only the surviving rows.

    At cluster scale this is a plain shuffle join on a well-distributed
    key (band hashes are uniform); skew only arises from genuinely
    identical content, which AQE's skew-join splitting handles.
    """
    # Bucket join and pair-dedup carry ONLY ids — signatures (8*num_hashes
    # bytes each) would multiply the shuffle volume; they are re-attached
    # afterwards by id. The re-join deliberately carries NO broadcast
    # hint: the signature table is O(corpus) (one row per document), so
    # forcing it executor-resident OOMs at real scale — AQE picks
    # broadcast-hash on its own whenever the runtime size allows.
    buckets = band_buckets(sig_df, id_col, bands, rows_per_band)

    a = buckets.alias("a")
    b = buckets.alias("b")
    pair_ids = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    if distinct:
        pair_ids = pair_ids.dropDuplicates(["id_a", "id_b"])
    if not attach_signatures:
        return pair_ids
    sa = sig_df.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sig_df.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    return pair_ids.join(sa, "id_a").join(sb, "id_b")


def estimated_jaccard(sig_a: Column, sig_b: Column, num_hashes: int) -> Column:
    """MinHash Jaccard estimate = fraction of agreeing signature slots."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v)
    )
    return agree / F.lit(float(num_hashes))


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs: (id_a, id_b, est_jaccard)
    with est_jaccard >= threshold.

    Band geometry sets the s-curve knee at ~(1/bands)^(rows/num_hashes
    per band): the default 8 bands x 8 rows targets ~0.77 — pairs much
    below threshold rarely collide in any band, keeping the candidate
    set near-linear even when the corpus has a high ambient similarity
    floor. Widen to 16x4 only when hunting for ~0.5-similarity pairs.
    """
    rows_per_band = num_hashes // bands
    # Signatures feed three consumers (band buckets + two re-joins).
    # They are materialized ONCE via an eager localCheckpoint — every
    # consumer then reads the stored blocks, so no job can recompute
    # the 64-slot generated aggregate. (Round 3 used persist + an
    # eager checkpoint of the OUTPUT + unpersist-in-finally: because
    # the cache was never materialized before fan-out, the single
    # checkpoint job raced its three cache readers and recomputed the
    # aggregate, making the query bimodal — driver-recorded 6.47 s vs
    # 1.37 s in round 2. Measured fix at sf0.1: stable 1.6-2.0 s,
    # variance < 1.3x across 5 back-to-back runs.) Blocks are released
    # by the ContextCleaner when the returned frame is dropped — the
    # same lifecycle `hyperplane_lsh_pairs` uses (similarity.py), so no
    # session-pinned cache entry survives.
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    sigs = sigs.localCheckpoint(eager=True)
    # One implementation of the banded join lives in lsh_candidate_pairs
    # (id-only candidate shuffle, no signature broadcast). The pair-dedup
    # runs AFTER the threshold filter (distinct=False): est_jaccard is
    # identical for every banded copy of a pair, so distinct-late is
    # value-equivalent but aggregates ~1.6k surviving rows instead of
    # ~650k candidates (the sf0.1 corpus has a high ambient-similarity
    # floor; measured ~0.3 s).
    pairs = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band, distinct=False)
    est = estimated_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes)
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 8,
    threshold: float = 0.8,
    est_slack: float | None = None,
    verify: str = "expr",
    lazy: bool = False,
) -> DataFrame:
    """MinHash-LSH candidates verified by EXACT shingle Jaccard — the
    standard THREE-phase near-dup pipeline: banded candidate
    generation for O(n) scale, a signature-estimate screen to discard
    the ambient-similarity floor cheaply, exact set similarity for
    the keep decision.

    Output: (id_a, id_b, jaccard) with exact ``jaccard >= threshold``
    rounded to 6 dp — an integer-ratio, so the value is reproducible
    bit-for-bit by any ANSI engine; this is the HASH-CHECKABLE
    contract `minhash_dedup_pairs`' est_jaccard output cannot offer
    (its estimate is a function of the engine's xxhash64 family).
    Precision is exact by construction; recall = LSH candidate recall
    x the estimate screen's pass rate for true pairs, both
    pytest-pinned on the graded corpora (banding recall 1.0; min
    estimate among true pairs 0.92 vs the 0.70 screen cut — a missed
    pair would surface as an oracle mismatch).

    ``est_slack`` (default None = 2 sigma of the estimator,
    ``2 * sqrt(threshold * (1 - threshold) / num_hashes)`` ~ 0.1 at
    J=0.8/64 hashes): the screen keeps candidates with
    ``est_jaccard >= threshold - est_slack``; widen it when hunting
    borderline pairs on corpora without a pinned margin. The screen
    is what makes verification affordable on high-ambient corpora:
    at bench sf0.1 the 8x8 banding emits ~680k candidate copies of
    which ~540k are genuinely ~0.55-similar template pairs — exact-
    verifying all of them cost 16 s; screening to >= 0.7 leaves ~110k.

    Verification compares DISTINCT xxhash64 shingle-hash SETS —
    O(pairs) rows through the join instead of the O(pairs x
    shingles_per_doc) row fan-out of a shingle equi-join. Two
    equal-output kernels (cross-pinned by
    test_minhash_verify_kernels_agree): ``verify="expr"`` (default
    since r14) keeps the whole verify inside the JVM with
    ``array_intersect`` — re-measured this round at 2.28 s vs 2.81 s
    full-query for the Arrow kernel (and 0.38 vs 0.67-0.75 s on a
    materialized verify input): the numpy kernel's per-pair math is
    cheap, but every pair's TWO shingle-hash arrays must cross the
    JVM->Arrow->Python boundary to reach it (guide §4.1 — you cannot
    remove that cost, only avoid it), which at ~300 longs x 2 x 107k
    screened pairs outweighs the hash-set build ``array_intersect``
    pays per row. ``verify="arrow"`` (the r12-r13 default) is kept as
    the cross-pinned twin. Hash-set
    Jaccard == string-set Jaccard absent 64-bit collisions
    (P ~ shingles^2 / 2^64 per pair; the DuckDB oracle recomputes
    from raw text, so a collision would fail the driver hash).

    NOTE: construction is EAGER by default — building the returned
    plan runs the signature and candidate-screen jobs (two
    localCheckpoints). This is load-bearing, not incidental: the
    size-gated broadcast of the screened pair set needs block-manager
    TRUTH at plan time (stats estimates through the banding self-join
    are garbage), and the screen would run exactly once at execution
    anyway. ``lazy=True`` (r9, review finding) is the plan-only escape
    hatch: no job runs at construction — at the cost of the broadcast
    gating (the pair set stays unhinted, so the verify joins rely on
    AQE's runtime broadcast conversion instead of a plan-time hint).
    Use it for plan inspection / lint sweeps; keep the eager default
    for execution.
    """
    if verify not in ("arrow", "expr"):
        raise ValueError(f"verify must be 'arrow' or 'expr', got {verify!r}")
    if est_slack is None:
        est_slack = 2.0 * (threshold * (1.0 - threshold) / num_hashes) ** 0.5
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    if not lazy:
        sigs = sigs.localCheckpoint(eager=True)
    # screen BEFORE the pair-dedup (est is identical for every banded
    # copy — the minhash_dedup_pairs lesson), then dedup survivors
    cand = lsh_candidate_pairs(
        sigs, id_col, bands, rows_per_band, distinct=False
    )
    est = estimated_jaccard(F.col("sig_a"), F.col("sig_b"), num_hashes)
    ids = (
        cand.filter(est >= threshold - est_slack)
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Materialize the screened pair set (skinny: two longs per row,
    # ~110k rows at sf0.1) so maybe_broadcast can gate on the block
    # manager's ACTUAL size (the stats estimate inherited through the
    # explode/self-join is garbage-large), then hint it as the BUILD
    # side of the verify joins. At scale this is what keeps the verify
    # stage from shuffling the corpus-sized shingle-hash ARRAYS: join 1
    # streams `a` in place (broadcast pair set), and `b` is pruned to
    # the pair docs by a broadcast SEMI join before the final
    # pairs-proportional join — the arrays that move are bounded by
    # the candidate count, never the corpus (VERDICT r7 #6).
    if lazy:
        bids = ids  # plan-only: no checkpoint job, no plan-time hint
    else:
        ids = ids.localCheckpoint(eager=True)
        from udacity_data_engineering_capstone_project_spark.operators.relational import (
            maybe_broadcast,
        )

        bids = maybe_broadcast(ids)
    # spread the shingle-array build: it is now the STREAM side of the
    # verify joins (the pair set is the build side), so a single-split
    # local file would otherwise run the whole verify stage on one core
    # (at real scale inputs arrive already split and this is a no-op)
    arr = _ensure_parallelism(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.array_sort(
            F.array_distinct(
                F.transform(
                    char_shingles(text_col, shingle_k),
                    lambda s: F.xxhash64(s),
                )
            )
        ).alias("__h"),
    )
    a = arr.select(F.col(id_col).alias("id_a"), F.col("__h").alias("__ha"))
    b = arr.select(F.col(id_col).alias("id_b"), F.col("__h").alias("__hb"))
    # prune b with a broadcast SEMI join against the same materialized
    # pair frame (semi dedups id_b implicitly; the broadcast exchange
    # is shared with join 1 via ReusedExchange — no extra job)
    b_small = b.join(bids, "id_b", "left_semi")
    joined = bids.join(a, "id_a").join(b_small, "id_b")
    if verify == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _isize(ha, hb):
            import numpy as np
            import pandas as pd

            out = np.empty(len(ha), dtype=np.int64)
            for i, (x, y) in enumerate(zip(ha, hb)):
                out[i] = np.intersect1d(
                    np.asarray(x), np.asarray(y), assume_unique=True
                ).size
            return pd.Series(out)

        inter_col = _isize(F.col("__ha"), F.col("__hb"))
    else:
        inter_col = F.size(F.array_intersect(F.col("__ha"), F.col("__hb")))
    staged = joined.select(
        "id_a",
        "id_b",
        inter_col.alias("__i"),
        F.size("__ha").alias("__na"),
        F.size("__hb").alias("__nb"),
    )
    jac = F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
    return (
        staged.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (block-restricted)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    shingle_k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact character-k-gram Jaccard for pairs sharing a blocking key.

    Shape: explode distinct shingles -> self-equi-join on
    (block, shingle) -> count intersections -> join set sizes.
    Exact but quadratic within a block: use for verification/oracles or
    tight blocks; the scale path is `minhash_dedup_pairs`.

    Output: (id_a, id_b, jaccard) rounded to 6 dp.
    """
    blocks = [F.col(c) for c in block_cols]
    df = _ensure_parallelism(df, id_col)
    sh = df.select(
        *blocks, F.col(id_col), F.explode(char_shingles(text_col, shingle_k)).alias("s")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
            + [
                F.col("a.s") == F.col("b.s"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("inter") / (F.col("sa.n") + F.col("sb.n") - F.col("inter"))
    # sizes is per-document (O(corpus)) — no broadcast hint; see
    # lsh_candidate_pairs.
    return (
        inter.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sum +-1 weighted by
    token-hash bit, sign -> bit. One explode + one aggregation.

    ``portable=False`` (default): xxhash64 token hashes, 64 bits — the
    production path (fastest JVM hash). ``portable=True``: the token
    hash is the first 15 md5 hex digits as a 60-bit integer
    (``conv(substr(md5(t),1,15),16,10)``) — the same portable-hash
    convention as `_ngram_bucket`, reproducible in any ANSI engine
    (DuckDB: ``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``), which is
    what lets `dedup_simhash` carry a full DuckDB oracle (r7);
    requires ``bits <= 60``. Both families give iid-enough bits for
    the SimHash estimate; the portable one costs a string md5 per
    token instead of one xxhash64.

    Output: (id, simhash bigint).
    """
    if portable and bits > 60:
        raise ValueError(
            f"portable simhash carries 60 hash bits (15 md5 hex digits); "
            f"got bits={bits}"
        )
    # sum(bit_i) vs n/2 replaces sum(+-1) > 0 (equivalent: the +-1 sum
    # is 2*ones - n); expressions are SQL strings — see
    # minhash_signatures for why (py4j construction cost with 64
    # per-bit Column trees dwarfed the actual execution).
    hash_expr = (
        "CAST(conv(substr(md5(__t), 1, 15), 16, 10) AS BIGINT)"
        if portable
        else "xxhash64(__t)"
    )
    tok = (
        _ensure_parallelism(df, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .withColumn("__h", F.expr(hash_expr))
    )
    sums = [
        F.expr(f"sum(shiftright(__h, {i}) & 1) AS __c{i}") for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(F.expr("count(*) AS __n"), *sums)
    sig = " | ".join(
        f"if(2 * __c{i} > __n, shiftleft(1L, {i}), 0L)" for i in range(bits)
    )
    return agg.select(F.col(id_col), F.expr(f"({sig}) AS simhash"))


def simhash_near_pairs(
    sig_df: DataFrame, id_col: str, max_hamming: int = 3, chunks: int = 4,
    bits: int = 64,
) -> DataFrame:
    """Pairs whose simhash differs in <= max_hamming bits.

    Pigeonhole banding: split ``bits`` bits into ``chunks`` equal
    chunks; a pair with fewer than ``chunks`` differing bits must
    agree on at least one chunk, so recall is exact for
    max_hamming <= chunks - 1. Join on (chunk_idx, chunk_value)
    equality, verify with bit_count(xor). ``bits`` must match the
    signature width (60 for portable signatures).
    """
    if bits % chunks:
        raise ValueError(f"bits={bits} not divisible by chunks={chunks}")
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("cv"),
            )
            for i in range(chunks)
        ]
    )
    ch = sig_df.select(F.col(id_col), F.col("simhash"), F.explode(chunk_arr).alias("c")).select(
        id_col, "simhash", "c.ci", "c.cv"
    )
    a, b = ch.alias("a"), ch.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.ci") == F.col("b.ci"),
                F.col("a.cv") == F.col("b.cv"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# ---------------------------------------------------------------------------
# Duplicate clusters -> representatives (connected components)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    on_round=None,
) -> DataFrame:
    """Connected components by iterative minimum-label propagation —
    the cluster step that turns pairwise near-dup EDGES into dedup
    GROUPS (a ~ b ~ c must collapse to one representative even when
    (a, c) was never emitted as a pair).

    Each iteration joins every node's current label with its
    neighbors' and keeps the minimum; converges in O(component
    diameter) iterations (near-dup clusters are shallow). DataFrame-
    only: shuffles on node id each round, no driver-side graph.

    Output: (node, component) — component = min node id in the group.

    ``on_round``: optional callback ``(round_idx, wall_seconds,
    label_sum)`` fired after each propagation round — zero extra jobs
    (the label_sum IS the convergence monitor's aggregate); the
    scale probe (tools/scale_probe_cc.py) uses it to price per-round
    shuffle cost against component-shape mixes.
    """
    # Iterative algorithms MUST truncate lineage every round:
    # each pointer-jumping step references the previous labels plan
    # twice, so without truncation the logical-plan tree grows
    # exponentially and OOMs the DRIVER during analysis (measured: a
    # 1g driver died planning iteration ~6 over a 37-edge graph whose
    # upstream was the LSH pipeline). localCheckpoint materializes the
    # rows and replaces the plan with a scan of them. The caller's
    # edge plan itself is NOT checkpointed separately (r14 job-count
    # cut): the canonical projection below references it exactly once,
    # so the sym checkpoint is the single materialization of the
    # upstream pair pipeline.
    edges_mat = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # NOT pre-partitioned (r10 A/B): near-dup pair graphs are TINY
    # relative to the corpus (bounded by dup density), and forcing
    # co-partitioning by the join key regressed dedup_clusters 5.4 ->
    # 8.6 s — it defeats AQE's runtime broadcast of the label table
    # and adds per-round sort stages. The pagerank/PPR weight table
    # (600k+ edges, where the same trick WON 1.3x) records the other
    # side of the crossover; callers clustering web-scale edge sets
    # should repartition the edges by ``v`` before calling.
    # Symmetrize via canonical-form dedup (r14, guide §2.3): dedup the
    # canonical (min, max) orientation — N rows through the distinct
    # shuffle — then union the reversed copy, which is disjoint by
    # construction (u < v vs u > v), so no second dedup over 2N rows.
    # Self-loops keep ONE canonical copy (u = v reverses to itself),
    # exactly what the old symmetric-union dedup kept; they only
    # re-propagate a node's own label, so components are unchanged.
    canon = edges_mat.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).dropDuplicates(["u", "v"])
    sym = (
        canon.unionByName(
            canon.filter(F.col("u") != F.col("v")).select(
                F.col("v").alias("u"), F.col("u").alias("v")
            )
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # Convergence monitor: sum(component) strictly decreases until the
    # fixpoint — one cheap aggregate instead of a change-detect join.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _round in range(max_iter):
        _t0 = time.time() if on_round else 0.0
        # neighbor labels + own label in one pass
        propagated = (
            sym.join(labels, sym["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            # cache barrier: the pointer-jump below references this
            # frame TWICE (as the labels and as the jump table) —
            # without it the join+union+aggregate executes twice per
            # round (r13; exchange reuse only dedups up to the
            # exchange, not the final aggregate)
            .localCheckpoint(eager=False)
        )
        # pointer jumping: also adopt the component's own label —
        # halves chain distances, O(log diameter) instead of O(diameter)
        ptr = propagated.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        # NOT checkpointed (r14 job-count cut): labels is a single join
        # of two reads of the ALREADY-checkpointed `propagated` frame —
        # component-count-sized — so the next round's two references
        # (and the sum aggregate) re-run only that cheap join, not the
        # heavy propagate; lineage stays truncated at `propagated`.
        labels = propagated.join(
            ptr, propagated["component"] == ptr["c_node"], "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("c_comp"), F.col("component"))
            ).alias("component"),
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if on_round:
            on_round(_round, time.time() - _t0, cur_sum)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    prefer_col: str | None = None,
) -> DataFrame:
    """Collapse near-dup pair clusters: every document mapped to its
    cluster representative; documents with no near-dup edge represent
    themselves.

    The representative is the cluster's min id by default (stable,
    cheap — it IS the component label). With ``prefer_col`` (a numeric
    quality score) the representative is instead the cluster member
    with the HIGHEST score, ties to the smallest id — "keep the best
    duplicate, not the first" (what a curation pipeline actually
    wants once quality signals exist). NULL scores lose to any
    non-null score. Costs one extra aggregation + join on the cluster
    key.

    Output: df columns + ``representative`` + ``is_representative``.
    """
    # comp has one row per clustered node — bounded by the corpus, not
    # by anything small, so no broadcast hint (AQE decides at runtime).
    comp = connected_components(pairs)
    joined = df.join(comp.withColumnRenamed("node", id_col), on=id_col, how="left")
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    if prefer_col is None:
        rep = cluster
        return joined.select(
            *[F.col(c) for c in df.columns],
            rep.alias("representative"),
            (rep == F.col(id_col)).alias("is_representative"),
        )
    clustered = joined.withColumn("__cluster", cluster)
    # nulls coalesce to -inf so a scored member always beats them
    score = F.coalesce(F.col(prefer_col).cast("double"), F.lit(float("-inf")))
    best = clustered.groupBy("__cluster").agg(
        F.min_by(F.col(id_col), F.struct(-score, F.col(id_col))).alias(
            "__rep"
        )
    )
    return (
        clustered.join(best, on="__cluster")
        .select(
            *[F.col(c) for c in df.columns],
            F.col("__rep").alias("representative"),
            (F.col("__rep") == F.col(id_col)).alias("is_representative"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding near-dup


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (cluster/label/LSH
    bucket). Exact within block; blocks bound the quadratic term.

    Output: (id_a, id_b, cos_sim) rounded to 6 dp, cos_sim >= threshold.
    """
    from udacity_data_engineering_capstone_project_spark.operators.similarity import (
        _pair_cosine,
        _with_norm,
    )

    slim = _with_norm(
        _ensure_parallelism(
            df.select(
                F.col(block_col).alias("__blk"), F.col(id_col), F.col(vec_col)
            ),
            id_col,
        ),
        vec_col,
        "__n",
    )
    a, b = slim.alias("a"), slim.alias("b")
    sim = _pair_cosine(
        F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"),
        F.col("a.__n"), F.col("b.__n"),
    )
    return (
        a.join(
            b,
            on=[
                F.col("a.__blk") == F.col("b.__blk"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# Incremental dedup: persisted index + new-batch screening


def write_dedup_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 8,
) -> None:
    """Materialize a corpus's dedup state so future batches screen
    against it WITHOUT re-processing the corpus — the production shape:
    you LSH 100 TB once, then each daily drop joins against the stored
    index instead of re-hashing everything.

    Layout under `path` (each state dir is batch-partitioned so
    incremental appends are replay-idempotent — the base build is
    ``batch=-1``, `append_to_dedup_index` owns ``batch=<id>``):
      fingerprints/batch=*/  (id, fingerprint)      — exact-dup lookups
      signatures/batch=*/    (id, signature)        — jaccard verification
      buckets/batch=*/       (id, band, bucket)     — LSH candidate joins
      _meta/                 (num_hashes, shingle_k, bands) — 1-row parquet

    All three are plain parquet: the bucket join key (band, bucket) is
    uniform, so downstream equi-joins shuffle evenly; no driver-side
    state of any kind. The `_meta` row pins the hash parameters AND the
    batched layout flag: screening with different parameters would
    silently produce wrong est_jaccard values / empty candidate sets,
    so `dedup_against_index` validates against it and raises instead.

    Re-seeding an existing path is a FULL replace: any previously
    appended batch partitions are deleted first, so write_dedup_index
    always leaves a clean index (stale appends would report new
    documents as dups of corpus rows that no longer exist).
    """
    rows_per_band = num_hashes // bands
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for sub in ("fingerprints", "signatures", "buckets"):
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)
    spark.createDataFrame(
        [(num_hashes, shingle_k, bands, True)],
        "num_hashes INT, shingle_k INT, bands INT, batched BOOLEAN",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_meta")
    df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{path}/fingerprints/batch=-1")
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).persist()
    try:
        sigs.write.mode("overwrite").parquet(f"{path}/signatures/batch=-1")
        band_buckets(sigs, id_col, bands, rows_per_band).write.mode(
            "overwrite"
        ).parquet(f"{path}/buckets/batch=-1")
    finally:
        sigs.unpersist()


def _read_dedup_index_meta(spark, path: str):
    """{'params': (num_hashes, shingle_k, bands), 'batched': bool} from
    the index's _meta row, or None for pre-_meta layouts. `batched`
    distinguishes the batch-partitioned state layout from older flat
    part files — the two cannot be mixed (parquet partition discovery
    rejects conflicting structures). IO failures propagate (a transient
    error must not silently disable validation)."""
    jvm = spark.sparkContext._jvm
    meta_path = jvm.org.apache.hadoop.fs.Path(f"{path}/_meta")
    fs = meta_path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(meta_path):
        return None
    meta = spark.read.parquet(f"{path}/_meta").collect()
    if not meta:
        return None
    row = meta[0].asDict()
    return {
        "params": (row["num_hashes"], row["shingle_k"], row["bands"]),
        "batched": bool(row.get("batched", False)),
    }


def append_to_dedup_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    batch_id: int,
    sigs: DataFrame | None = None,
) -> None:
    """Grow a persisted dedup index with a screened batch's state —
    the other half of the incremental loop: screen with
    `dedup_against_index`, then append the admitted rows so the NEXT
    batch screens against them too. Hash parameters come from the
    index's own `_meta` (there is nothing to mismatch). Pass the
    screening pass's materialized ``sigs`` (`dedup_against_index(...,
    return_state=True)`) to skip re-hashing the batch — shingling +
    minhash is the dominant per-row cost.

    Idempotent under replay: each batch overwrites its own
    ``batch=<batch_id>`` partition directory in all three state dirs,
    so a crashed-and-replayed batch converges instead of duplicating
    index rows. Requires the batch-partitioned layout (``batched`` in
    `_meta`): appending batch subdirectories next to a legacy index's
    flat part files would corrupt it — parquet partition discovery
    rejects the mixed structure — so that raises up front instead.
    """
    meta = _read_dedup_index_meta(spark, path)
    if meta is None or not meta["batched"]:
        raise ValueError(
            f"dedup index at {path} is not batch-partitioned — rebuild it "
            "with the current write_dedup_index before appending"
        )
    num_hashes, shingle_k, bands = meta["params"]
    rows_per_band = num_hashes // bands
    new_df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{path}/fingerprints/batch={batch_id}")
    if sigs is None:
        sigs = minhash_signatures(new_df, id_col, text_col, num_hashes, shingle_k)
    else:
        sigs = sigs.join(new_df.select(id_col), on=id_col)
    sigs = sigs.persist()
    try:
        sigs.write.mode("overwrite").parquet(f"{path}/signatures/batch={batch_id}")
        band_buckets(sigs, id_col, bands, rows_per_band).write.mode(
            "overwrite"
        ).parquet(f"{path}/buckets/batch={batch_id}")
    finally:
        sigs.unpersist()


def dedup_against_index(
    spark,
    path: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 8,
    threshold: float = 0.8,
    max_batch: int | None = None,
    return_state: bool = False,
):
    """Screen a new batch against a persisted dedup index: every new
    document is annotated with whether the EXISTING corpus already
    contains it exactly or near-exactly.

    Output: (id, is_exact_dup, dup_of, est_jaccard) — dup_of is the
    smallest matching corpus id (deterministic), null when novel;
    est_jaccard is null for exact-only matches. With
    ``return_state=True`` returns ``(verdicts, sigs)`` where sigs is
    the batch's materialized minhash-signature frame — feed it to
    `append_to_dedup_index` so the dominant shingle+hash pass runs
    once per batch, not twice.

    ``max_batch`` (batched indexes only) screens against appended
    partitions with ``batch < max_batch`` — the replay guard: a
    crashed-then-replayed batch must not see its OWN half-appended
    state, or it would flag its rows as dups of themselves.

    Cost model at scale: the new batch (small) is hashed once; joins
    against the index read only the fingerprint/bucket columns, and the
    signature re-join touches only candidate corpus ids — never the
    whole stored corpus. The batch side of every join is the small
    side, so AQE broadcasts it; the index side streams from parquet
    (the ``max_batch`` filter is partition pruning, not a scan).

    Raises ValueError when the index was written with different
    (num_hashes, shingle_k, bands) — a silent mismatch would yield
    wrong est_jaccard values or empty candidate sets. Indexes written
    before `_meta` existed screen unvalidated.
    """
    # Probe _meta existence explicitly (pre-_meta index layouts screen
    # unvalidated) instead of a blanket except: a transient IO/permission
    # failure must propagate, not silently disable parameter validation.
    meta = _read_dedup_index_meta(spark, path)
    if meta is not None and meta["params"] != (num_hashes, shingle_k, bands):
        raise ValueError(
            f"dedup index at {path} was built with (num_hashes, shingle_k, "
            f"bands)={meta['params']}; called with {(num_hashes, shingle_k, bands)}"
        )
    if max_batch is not None and (meta is None or not meta["batched"]):
        raise ValueError(
            f"max_batch requires a batch-partitioned index at {path}"
        )

    def _idx(sub: str) -> DataFrame:
        d = spark.read.parquet(f"{path}/{sub}")
        if max_batch is not None:
            d = d.filter(F.col("batch") < max_batch)
        return d

    rows_per_band = num_hashes // bands
    idx_fp = _idx("fingerprints").withColumnsRenamed(
        {id_col: "old_id", "fingerprint": "old_fp"}
    )
    new_fp = new_df.select(
        F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
    exact = (
        new_fp.join(idx_fp, new_fp["fingerprint"] == idx_fp["old_fp"], "left")
        .groupBy(id_col)
        .agg(F.min("old_id").alias("exact_dup_of"))
    )

    # Eager localCheckpoint (not persist): materialized once, consumed
    # by the bucket build, the verification re-join, and — with
    # return_state — the caller's index append; blocks are released by
    # the ContextCleaner when the frame is dropped.
    new_sigs = minhash_signatures(
        new_df, id_col, text_col, num_hashes, shingle_k
    ).localCheckpoint(eager=True)
    new_buckets = band_buckets(new_sigs, id_col, bands, rows_per_band)
    idx_buckets = _idx("buckets").withColumnsRenamed({id_col: "old_id"})
    cand = (
        new_buckets.join(idx_buckets, on=["band", "bucket"])
        .select(id_col, "old_id")
        .dropDuplicates([id_col, "old_id"])
    )
    idx_sigs = _idx("signatures").withColumnsRenamed(
        {id_col: "old_id", "signature": "old_sig"}
    )
    est = estimated_jaccard(F.col("signature"), F.col("old_sig"), num_hashes)
    near = (
        cand.join(new_sigs, on=id_col)
        .join(idx_sigs, on="old_id")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .groupBy(id_col)
        .agg(
            # best match = highest jaccard, ties -> smallest old id
            F.min_by(
                "old_id", F.struct(-F.col("est_jaccard"), F.col("old_id"))
            ).alias("near_dup_of"),
            F.max("est_jaccard").alias("est_jaccard"),
        )
    )
    out = (
        new_df.select(id_col)
        .join(exact, on=id_col, how="left")
        .join(near, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("exact_dup_of").isNotNull().alias("is_exact_dup"),
            F.coalesce("exact_dup_of", "near_dup_of").alias("dup_of"),
            F.col("est_jaccard"),
        )
        .localCheckpoint(eager=True)
    )
    if return_state:
        return out, new_sigs
    return out


def stream_dedup_against_index(
    spark,
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    admit: str = "novel",
) -> int:
    """Streaming twin of `dedup_against_index` — the continuous-ingest
    curation shape: each micro-batch of documents (1) screens against
    the CURRENT index (exact fingerprint + LSH near-dup), (2) writes
    its verdicts to ``{out_path}/batch=<id>``, and (3) admits rows into
    the index via `append_to_dedup_index`, so the NEXT batch screens
    against everything admitted so far.

    ``admit='novel'`` (default) admits only rows with no exact or near
    match, collapsed to one row per batch-internal fingerprint
    (smallest id — two identical rows arriving in one batch admit
    once); ``'all'`` admits every row (pure audit mode is
    ``dedup_against_index`` itself). Batch-internal NEAR dups (distinct
    fingerprints, jaccard >= threshold) can both be admitted within one
    batch — run `minhash_dedup_pairs` on the batch first if that
    matters; across batches they are caught normally.

    Crash safety mirrors `merge_stream_into_dimension`: the streaming
    checkpoint commits a batch only after foreachBatch returns, both
    the verdict write and the index append overwrite their own
    ``batch=<id>`` partitions, and screening passes ``max_batch`` so a
    batch that crashed AFTER appending its state never screens against
    its own half-committed partition on replay (it would flag its rows
    as dups of themselves and then overwrite the partition empty —
    losing them from the index for good). Requires a batch-partitioned
    index (seed with `write_dedup_index`, possibly on an empty frame).
    Returns the number of batches processed this run.
    """
    if admit not in ("novel", "all"):
        raise ValueError(f"admit must be 'novel' or 'all', got {admit!r}")
    meta = _read_dedup_index_meta(spark, index_path)
    if meta is None or not meta["batched"]:
        raise ValueError(
            f"no batch-partitioned dedup index at {index_path} — seed one "
            "with write_dedup_index"
        )
    num_hashes, shingle_k, bands = meta["params"]
    counter = {"batches": 0}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        verdicts, sigs = dedup_against_index(
            spark, index_path, batch_df, id_col, text_col,
            num_hashes=num_hashes, shingle_k=shingle_k, bands=bands,
            threshold=threshold, max_batch=batch_id, return_state=True,
        )  # both eagerly checkpointed — reuse below reads stored blocks
        verdicts.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")
        if admit == "novel":
            keep = verdicts.filter(
                ~F.col("is_exact_dup") & F.col("dup_of").isNull()
            ).select(id_col)
            admitted = batch_df.join(keep, on=id_col)
            first_per_fp = (
                admitted.select(
                    F.col(id_col),
                    F.md5(normalize_text(F.col(text_col))).alias("__fp"),
                )
                .groupBy("__fp")
                .agg(F.min(id_col).alias(id_col))
                .select(id_col)
            )
            admitted = admitted.join(first_per_fp, on=id_col)
        else:
            admitted = batch_df
        append_to_dedup_index(
            spark, index_path, admitted, id_col, text_col, batch_id, sigs=sigs
        )
        counter["batches"] += 1

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return counter["batches"]


def segment_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    delimiter: str | None = None,
    window: int = 6,
) -> DataFrame:
    """Split documents into ordered segments: one row per segment,
    ``(id, seg_pos, segment)``.

    Two segmenters:

    - ``delimiter`` (a Java regex, e.g. ``"\\n"``): each delimited
      piece is a segment — the C4/CCNet "line" unit for real corpora.
    - else fixed ``window``-word chunks (last chunk may be shorter):
      delimiter-free text still gets a stable, alignment-preserving
      unit for cross-document span dedup.

    ``seg_pos`` is the 1-based offset of the segment's first word
    (window mode) or the 0-based piece index (delimiter mode); either
    way it orders segments within a document deterministically.
    """
    if delimiter is not None:
        return df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), delimiter, -1)).alias(
                "seg_pos", "segment"
            ),
        )
    ws = F.split(F.col(text_col), " ", -1)
    # starts 1, 1+w, ... <= size(ws): every word lands in exactly one
    # segment; size >= 1 always (split of "" is [""]), so the sequence
    # never runs start > stop (Spark sequence counts DOWN in that case).
    starts = F.sequence(F.lit(1), F.greatest(F.size(ws), F.lit(1)), F.lit(window))
    return df.select(
        F.col(id_col),
        F.explode(starts).alias("seg_pos"),
        ws.alias("__ws"),
    ).select(
        id_col,
        "seg_pos",
        F.array_join(F.slice(F.col("__ws"), F.col("seg_pos"), window), " ").alias(
            "segment"
        ),
    )


def remove_duplicated_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    delimiter: str | None = None,
    window: int = 6,
    min_docs: int = 2,
    joiner: str = " ",
    keep_text: bool = False,
) -> DataFrame:
    """Cross-document duplicated-segment removal — the C4/CCNet
    boilerplate-scrub pattern: any segment (line, or ``window``-word
    chunk) appearing in >= ``min_docs`` DISTINCT documents is dropped
    from every document; survivors are reassembled in order.

    Output, one row per input document (docs whose every segment was
    boilerplate still appear, with ``n_kept = 0`` and the hash of the
    empty string): ``(id, n_segments, n_kept, cleaned_hash)`` where
    ``cleaned_hash = md5(kept segments joined by ``joiner``)``;
    ``keep_text=True`` appends the reassembled ``cleaned_text`` itself
    (pipeline use — the hash-only shape is the audit/oracle surface).

    Shape at scale: the segment explode feeds (a) one partial-agg
    count-distinct per segment producing the (small — boilerplate is
    rare by definition) hot set, and (b) an equi-join against that hot
    set, which AQE broadcasts when it fits; one final groupBy(id)
    produces every output column in a single pass. No per-document
    state, no windows, no Python. At 100 TB persist/checkpoint the
    segment frame (or stage it with ``write_dedup_index``-style
    two-phase runs) so the explode isn't computed twice.
    """
    segs = segment_documents(
        _ensure_parallelism(df, id_col),
        id_col,
        text_col,
        delimiter=delimiter,
        window=window,
    )
    hot = (
        segs.groupBy("segment")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("segment", F.lit(True).alias("__hot"))
    )
    flagged = segs.join(hot, on="segment", how="left")
    keep = F.col("__hot").isNull()
    cleaned = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(keep, F.struct(F.col("seg_pos"), F.col("segment")))
                )
            ),
            lambda x: x["segment"],
        ),
        joiner,
    )
    aggs = [
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(keep.cast("int")).cast("long").alias("n_kept"),
        F.md5(cleaned).alias("cleaned_hash"),
    ]
    if keep_text:
        aggs.append(cleaned.alias("cleaned_text"))
    return flagged.groupBy(id_col).agg(*aggs)


# ---------------------------------------------------------------------------
# Exact repeated-substring spans (ExactSubstr-style)

# Rabin-Karp double rolling hash: two independent polynomial hashes
# over 31-bit prime moduli, so every intermediate product stays below
# 2^62 — exact in int64 arithmetic on any engine, no unsigned wraparound
# needed (Spark 4 runs ANSI arithmetic). The (H1, H2) pair packs
# injectively into one BIGINT H1 * M2 + H2 < 2^62; a cross-window
# collision needs BOTH hashes to collide (~2^-62 per pair — for 10M
# windows that is ~1e-5 expected corpus-wide, vs md5's ~0 but at
# min_tokens x the hashing cost).
_RK_M1, _RK_B1 = 2147483647, 1000003
_RK_M2, _RK_B2 = 2147483629, 1000033
_RK_I1 = pow(_RK_B1, _RK_M1 - 2, _RK_M1)  # B1^-1 mod M1
_RK_I2 = pow(_RK_B2, _RK_M2 - 2, _RK_M2)

_RK_POW_CACHE: dict = {}


def _rk_pow_table(base: int, mod: int, size: int):
    """int64 table of base^i mod M for i < size, built by block
    doubling (O(log n) vectorized numpy ops, no per-element Python
    loop) and cached per executor, grown geometrically."""
    t = _RK_POW_CACHE.get((base, mod))
    if t is None or len(t) < size:
        t = np.array([1], dtype=np.int64)
        while len(t) < size:
            mult = int(t[-1]) * base % mod
            t = np.concatenate([t, (t * mult) % mod])
        _RK_POW_CACHE[(base, mod)] = t
    return t


def _rolling_fingerprints_udf(min_tokens: int):
    """Arrow-batched kernel: per-token hashes (array<long>) -> one
    packed Rabin-Karp fingerprint per consecutive ``min_tokens``
    window (array<long>, index i = window starting at token i+1).

    O(tokens) per document: position-weighted terms g_i = h_i * B^i
    mod M, one cumulative sum, one sliding-window difference, one
    inverse-power renormalization (S_p * B^-p) so the same token
    sequence fingerprints identically at any offset in any document.
    All values stay below 2^31 so every product fits int64 exactly.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _fp(tok_hashes: pd.Series) -> pd.Series:
        L = min_tokens
        empty = np.empty(0, dtype=np.int64)
        arrs = [
            empty if v is None else np.asarray(v, dtype=np.int64)
            for v in tok_hashes
        ]
        if not arrs:
            return pd.Series([], dtype=object)
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
        doc_start = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(lens)[:-1]]
        )
        # within-doc token positions, flat across the whole batch —
        # one vectorized pass instead of a Python loop per document
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(doc_start, lens)
        m = np.maximum(lens - L + 1, 0)  # window count per doc
        total_w = int(m.sum())
        if total_w == 0:
            return pd.Series([empty] * len(arrs))
        w_start = np.concatenate(
            [np.zeros(1, dtype=np.int64), np.cumsum(m)[:-1]]
        )
        # within-doc window index j and its flat token index
        wpos = np.arange(total_w, dtype=np.int64) - np.repeat(w_start, m)
        widx = np.repeat(doc_start, m) + wpos
        max_n = int(lens.max())
        packed = None
        for b, binv, mod in (
            (_RK_B1, _RK_I1, _RK_M1),
            (_RK_B2, _RK_I2, _RK_M2),
        ):
            pw = _rk_pow_table(b, mod, max_n)
            ipw = _rk_pow_table(binv, mod, max_n)
            g = (flat % mod) * pw[pos] % mod
            cs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(g)])
            # windows never cross documents (j <= len - L), so the
            # global cumsum difference stays within one doc's terms
            s = (cs[widx + L] - cs[widx]) % mod
            hh = s * ipw[wpos] % mod
            packed = hh if packed is None else packed * _RK_M2 + hh
        return pd.Series(np.split(packed, np.cumsum(m)[:-1]))

    return _fp


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 20,
    rolling: bool = False,
) -> DataFrame:
    """Maximal token spans whose ``min_tokens``-token windows recur
    ANYWHERE in the corpus (other documents or elsewhere in the same
    one) — the exact-substring dedup signal of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"),
    whose ExactSubstr tool removes 50-token repeats that MinHash's
    whole-document granularity misses (licenses, boilerplate
    passages, quotations).

    The paper builds a suffix array on one machine; the Spark-native
    equivalent is a rolling window join: every consecutive
    ``min_tokens``-token window is fingerprinted, window counts
    aggregate globally, and windows occurring more than once mark
    their positions. Overlapping or touching duplicated windows
    (gap <= min_tokens) merge into maximal spans per document via one
    per-doc sort (classic gaps-and-islands).

    Two fingerprint kernels, measured head-to-head at sf0.1 (warm,
    local[32]):

    - default (rolling=False): ``xxhash64(slice(tokens, p, L))`` per
      window, entirely in whole-stage codegen. Nominally O(tokens*L)
      token-hashing, but each hash is native word-at-a-time xxhash —
      it replaced the original ``md5(concat_ws(...))`` (string
      materialization + crypto hash per window; 1.06 s) at 0.87 s
      median, and stays ahead of the Arrow kernel even at L=40
      (0.68 s vs 0.98 s).
    - rolling=True: double Rabin-Karp over per-token xxhash64 values —
      tokens hash once JVM-side, then an Arrow-batched numpy kernel
      rolls all windows in true O(tokens) (position-weighted terms,
      one cumsum, one sliding difference, inverse-power
      renormalization; all mod 31-bit primes so int64 stays exact).
      The asymptotic win is real but the Arrow round trip (8 B/token
      out, 8 B/window back, Python worker hop) costs a flat ~0.3 s at
      sf0.1 that the native path never pays; it only wins for very
      wide windows (L >> 40) over long documents.

    Fingerprints are engine-internal: the DuckDB parity oracle
    fingerprints windows its own way (md5 of the window text) and must
    produce identical SPANS, so a hash collision in either engine is
    caught, not hidden (64-bit window hashes: ~1e-7 expected corpus-
    wide collisions at 10M windows; the rolling pair packs two 31-bit
    hashes, same order).

    Cost at 100 TB: the fingerprint shuffle is linear in corpus
    TOKENS (each token starts one window) — inherent to the problem,
    same asymptotics as the suffix array, but partial-aggregated and
    embarrassingly parallel; the island merge touches only the
    duplicated windows.

    Output: (id, start_token, end_token, n_windows) — 1-based
    inclusive token positions of each maximal duplicated span.
    """
    toks = tokens(F.col(text_col))
    if rolling:
        tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
        fp = _rolling_fingerprints_udf(min_tokens)
        wins = (
            _ensure_parallelism(df, id_col)
            .select(
                F.col(id_col), F.posexplode(fp(tok_hashes)).alias("pos", "g")
            )
            .select(id_col, (F.col("pos") + 1).alias("p"), "g")
        )
    else:
        n = F.size(toks)
        starts = F.when(
            n >= min_tokens, F.sequence(F.lit(1), n - F.lit(min_tokens - 1))
        ).otherwise(F.array().cast("array<int>"))
        wins = (
            _ensure_parallelism(df, id_col)
            .select(
                F.col(id_col),
                F.explode(
                    F.transform(
                        starts,
                        lambda p: F.struct(
                            p.alias("p"),
                            F.xxhash64(F.slice(toks, p, min_tokens)).alias(
                                "g"
                            ),
                        ),
                    )
                ).alias("w"),
            )
            .select(id_col, "w.p", "w.g")
        )
    recurring = (
        wins.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("g")
    )
    dup = wins.join(recurring, "g").select(id_col, "p")

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("p")
    flagged = dup.withColumn(
        "__brk",
        F.when(
            F.lag("p").over(w).isNull()
            | ((F.col("p") - F.lag("p").over(w)) > min_tokens),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "__island",
        F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(id_col, "__island").agg(
        F.min("p").cast("long").alias("start_token"),
        (F.max("p") + F.lit(min_tokens - 1)).cast("long").alias("end_token"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select(id_col, "start_token", "end_token", "n_windows")


def strip_duplicated_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Apply `duplicated_spans` output: remove every token inside a
    duplicated span from each document — the removal step of the
    ExactSubstr pipeline (Lee et al. 2021 cut the duplicated bytes and
    report perplexity unharmed).

    Spans aggregate to one array per document (spans per doc are few —
    bounded by doc length / min_tokens), join back by id (documents
    with no spans pass through untouched via the left join), and the
    token filter is a pure JVM expression: keep token i unless some
    [start, end] span contains it. No Python, no extra shuffle beyond
    the span join; text reconstructs with single spaces (tokenization
    is whitespace-normalizing by design).

    Output: original columns (text replaced by the cleaned text) +
    n_tokens_removed.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_token", "end_token")).alias("__spans")
    )
    toks = tokens(F.col(text_col))
    idx = F.expr(
        "filter(transform(__toks, (t, i) -> struct(t AS t, i + 1 AS p)), "
        "s -> __spans IS NULL OR NOT exists(__spans, "
        "sp -> s.p >= sp.start_token AND s.p <= sp.end_token))"
    )
    return (
        df.join(per_doc, on=id_col, how="left")
        .withColumn("__toks", toks)
        .withColumn("__kept", idx)
        .withColumn(
            "n_tokens_removed",
            (F.size("__toks") - F.size("__kept")).cast("long"),
        )
        .withColumn(
            text_col,
            F.array_join(F.expr("transform(__kept, s -> s.t)"), " "),
        )
        .drop("__spans", "__toks", "__kept")
    )


# ---------------------------------------------------------------------------
# Dedup quality evaluation


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT char-shingle Jaccard pairs with no blocking key — the
    ground truth the approximate tiers (MinHash, SimHash) estimate.
    Delegates to `ngram_jaccard_pairs` with an empty block list: every
    pair sharing >= 1 shingle meets in the join, so this is for
    oracles and sampled evaluation, never the full-corpus path —
    `evaluate_near_dup_pairs` runs it on a hash sample.

    Output: (id_a, id_b, jaccard double r6) with jaccard >= threshold.
    """
    return ngram_jaccard_pairs(
        df, id_col, text_col, block_cols=[], shingle_k=shingle_k,
        threshold=threshold,
    )


def evaluate_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    predicted_pairs: DataFrame,
    threshold: float,
    sample_rate: float = 0.1,
    shingle_k: int = 3,
) -> DataFrame:
    """Precision/recall of an approximate near-dup pair set against
    EXACT shingle Jaccard, measured on a deterministic hash sample of
    the corpus — the production answer to "is 8x8 banding losing real
    duplicates?" without ever computing exact Jaccard at corpus scale.

    Both sides are restricted to pairs whose BOTH endpoints fall in
    the sample (an unbiased estimate of pairwise metrics under
    uniform vertex sampling); ground truth is `exact_jaccard_pairs`
    at the same threshold and shingle size. ``predicted_pairs``
    needs (id_a, id_b) with id_a < id_b — what the minhash/simhash
    tiers emit.

    Output: ONE row (n_sample_docs, n_true_pairs, n_predicted_pairs,
    tp, fp, fn, precision r6, recall r6). Empty ground truth and empty
    predictions are well-defined (metric = 1.0 when its denominator is
    0 — nothing to find, nothing wrong).
    """
    from udacity_data_engineering_capstone_project_spark.operators.sampling import (
        hash_sample,
    )

    sample = hash_sample(df.select(id_col, text_col), id_col, sample_rate)
    sample = sample.localCheckpoint(eager=True)  # reused by truth + both filters
    ids = sample.select(id_col)
    truth = exact_jaccard_pairs(sample, id_col, text_col, threshold, shingle_k)
    ia = ids.select(F.col(id_col).alias("id_a"))
    ib = ids.select(F.col(id_col).alias("id_b"))
    # canonicalize (b, a)-ordered input pairs and drop duplicate rows
    # BEFORE counting: duplicated predictions would deflate precision
    # (tp is set-semantics via intersect, n_predicted was not), and a
    # reversed pair would be silently lost by the id_a < id_b join.
    # NULL-id rows must go first: least/greatest skip NULLs, so a
    # malformed (NULL, 5) input would otherwise canonicalize into a
    # fabricated (5, 5) self-pair that survives the id joins and
    # counts as a false positive.
    pred = (
        predicted_pairs.filter(
            F.col("id_a").isNotNull() & F.col("id_b").isNotNull()
        )
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .join(ia, "id_a")
        .join(ib, "id_b")
    )
    tp_df = truth.select("id_a", "id_b").intersect(pred.select("id_a", "id_b"))
    n_docs = ids.agg(F.count(F.lit(1)).alias("n_sample_docs"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    n_pred = pred.agg(F.count(F.lit(1)).alias("n_predicted_pairs"))
    n_tp = tp_df.agg(F.count(F.lit(1)).alias("tp"))
    return (
        n_docs.crossJoin(n_truth)
        .crossJoin(n_pred)
        .crossJoin(n_tp)
        .select(
            "n_sample_docs",
            "n_true_pairs",
            "n_predicted_pairs",
            "tp",
            (F.col("n_predicted_pairs") - F.col("tp")).alias("fp"),
            (F.col("n_true_pairs") - F.col("tp")).alias("fn"),
            F.round(
                F.when(F.col("n_predicted_pairs") == 0, F.lit(1.0)).otherwise(
                    F.col("tp") / F.col("n_predicted_pairs")
                ),
                6,
            ).alias("precision"),
            F.round(
                F.when(F.col("n_true_pairs") == 0, F.lit(1.0)).otherwise(
                    F.col("tp") / F.col("n_true_pairs")
                ),
                6,
            ).alias("recall"),
        )
    )


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    normalized: bool = True,
) -> DataFrame:
    """Content-level diff between two corpus versions — the dataset-
    versioning question ("what changed between crawl v3 and v4?")
    answered WITHOUT comparing text bodies: both sides reduce to
    (id, md5 fingerprint) and one full-outer join classifies every id
    as ``added`` / ``removed`` / ``changed`` / ``unchanged``.
    ``normalized`` uses the same canonical form as `exact_text_dedup`
    (case/punctuation-insensitive); False diffs raw bytes.

    One shuffle on id; fingerprints are 32 bytes per row regardless of
    document size, so the join cost is row-count-bound, not
    content-bound.

    Output: (id, status string, old_fp, new_fp) — fingerprints kept
    for audit joins (null on the side the id is absent from). Ids are
    assumed unique within each version (the corpus invariant every
    other operator here relies on); duplicate ids would fan out in the
    join like any SQL full-outer.
    """
    content = (
        (lambda c: F.md5(normalize_text(c)))
        if normalized
        else (lambda c: F.md5(c))
    )
    o = old_df.select(
        F.col(id_col), content(F.col(text_col)).alias("old_fp")
    )
    n = new_df.select(
        F.col(id_col).alias("__nid"), content(F.col(text_col)).alias("new_fp")
    )
    joined = o.join(n, o[id_col] == n["__nid"], "full_outer")
    # presence is decided from the join-side IDS — a NULL text body
    # yields a NULL fingerprint, which must read as changed/unchanged,
    # not as a phantom add/remove
    status = (
        F.when(F.col(id_col).isNull(), F.lit("added"))
        .when(F.col("__nid").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.coalesce(F.col(id_col), F.col("__nid")).alias(id_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )
