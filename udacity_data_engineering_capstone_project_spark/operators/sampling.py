"""Deterministic sampling & data-mixing operators (north-star extension).

A 100 TB curation pipeline can't use `df.sample()` for anything it needs
to reproduce or audit: RNG sampling changes membership across retries,
partitions and Spark versions. These operators derive membership from a
content hash, so a row's fate is a pure function of its key — stable
across runs, engines (md5 is md5 in DuckDB too) and cluster layouts,
and the sample composes with incremental ingestion (new rows don't
reshuffle old decisions).

No reference counterpart (the reference has no sampling surface); the
semantics follow the standard hash-mod sampling used by web-scale corpus
pipelines.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, digits: int = 4) -> Column:
    """Deterministic sampling bucket: the first `digits` hex chars of
    md5(key as string). Lowercase-hex strings compare lexicographically
    exactly as their numeric value, so `bucket < ' 8000'`-style
    thresholds ARE numeric thresholds — no hex parsing needed, and the
    same expression runs verbatim in any engine with md5().
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, digits)


def _threshold_hex(rate: float, digits: int = 4) -> str:
    """Exclusive upper bound in hex for a keep-rate in [0, 1].

    A full-keep rate returns "g", which sorts after every hex char —
    NOT the numeral string for 16**digits: "10000" starts with '1' and
    would lexicographically UNDERCUT almost every 4-char bucket,
    silently keeping ~1/16 of rows.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    v = int(round(rate * (16 ** digits)))
    if v >= 16 ** digits:
        return "g"
    return format(v, f"0{digits}x")


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    digits: int = 4,
) -> DataFrame:
    """Uniform deterministic sample: keep rows whose hash bucket falls
    below the rate threshold. Resolution is 16**-digits (default 1/65536).
    Pure filter — pushes down, no shuffle, reproducible anywhere.
    """
    return df.filter(hash_bucket(key_col, digits) < F.lit(_threshold_hex(rate, digits)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    digits: int = 4,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source mixing
    step of corpus curation ("keep 50% of en, 25% of de, all the rest").

    The per-stratum threshold is a CASE over `stratum_col`; membership
    stays a pure row-local predicate (no shuffle, no RNG, no join).
    """
    thr: Column = F.lit(_threshold_hex(default_rate, digits))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_threshold_hex(rate, digits))
        ).otherwise(thr)
    return df.filter(hash_bucket(key_col, digits) < thr)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    quota: int,
) -> DataFrame:
    """Per-group quota: keep the top `quota` rows of each group under a
    deterministic ordering (the per-source cap / data-mixing step that
    stops one domain from dominating a training mix).

    One shuffle on the group key; rank + filter. Callers MUST include a
    tiebreaker in `order_cols` or membership is nondeterministic.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: Mapping[str, float],
    digits: int = 4,
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a `split` column
    whose value is a pure function of md5(key), partitioning the hash
    space into consecutive ranges proportional to `weights` (which must
    sum to ~1). Row-local expression — no shuffle, no RNG; a row keeps
    its split across reruns and incremental ingests, and the same
    ranges reproduce in any engine with md5().
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket(key_col, digits)
    expr: Column | None = None
    acc = 0.0
    # deterministic range order; last split absorbs rounding slack
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = bucket < F.lit(_threshold_hex(acc, digits))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_with_dedup_guard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    digits: int = 4,
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicates must never
    straddle a split boundary (a paraphrase of a held-out document in
    the training set is eval contamination that exact-id splitting
    cannot see). The split key is therefore the document's near-dup
    CLUSTER representative, not the document id: `pairs` (verified
    near-dup edges from the minhash/simhash/fuzzy tier, columns
    id_a/id_b) collapse into components, every member inherits the
    component's min id as `representative` (unpaired docs represent
    themselves), and `hash_split` assigns the split from
    md5(representative) ranges. Same-cluster members share the key, so
    the whole cluster lands in one split BY CONSTRUCTION — no audit
    join needed, though `assert_no_split_straddle` provides one for
    pipelines that ingest splits from elsewhere.

    Scale shape: one connected-components pass over the EDGE set
    (bounded by near-dup density, not corpus size) + a left join back
    to the corpus + a row-local split expression. Nothing new shuffles
    the corpus beyond the representative join.

    Output: df columns + representative + split.
    """
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        dedup_representatives,
    )

    with_rep = dedup_representatives(df, pairs, id_col)
    return hash_split(with_rep, "representative", weights, digits).drop(
        "is_representative"
    )


def assert_no_split_straddle(
    split_df: DataFrame, pairs: DataFrame, id_col: str
) -> int:
    """Audit for externally-provided splits: count near-dup pairs whose
    endpoints landed in different splits (each one is a leakage path).
    Returns the straddle count — 0 for any `split_with_dedup_guard`
    output over the same pair set. Two broadcast-eligible joins of the
    skinny pair set against (id, split); the corpus never re-shuffles.
    """
    slim = split_df.select(F.col(id_col), F.col("split"))
    a = slim.withColumnRenamed(id_col, "id_a").withColumnRenamed("split", "split_a")
    b = slim.withColumnRenamed(id_col, "id_b").withColumnRenamed("split", "split_b")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )


def deterministic_shuffle(df: DataFrame, key_col: str, seed: int = 0) -> DataFrame:
    """Stable pseudo-random global order for training-data export:
    sort by xxhash64(key, seed). Same seed -> same order on any cluster
    layout; a new seed is a fresh epoch-level shuffle. Spark executes
    this as a range-partitioned sort (one exchange) — the standard way
    to decorrelate adjacent documents before sequence packing.
    """
    return df.orderBy(
        F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.col(key_col)
    )


def mix_sources(
    df: DataFrame,
    key_col: str,
    source_col: str,
    target_weights: Mapping[str, float],
    digits: int = 4,
) -> DataFrame:
    """Downsample sources to a target mixture (e.g. web 60% / books 20%
    / code 20%) WITHOUT upsampling: the achievable total is capped by
    the scarcest source, T = min_s(n_s / w_s); each source then keeps
    ~w_s*T rows via its deterministic hash rate. Sources absent from
    `target_weights` are dropped.

    Needs one count-per-source aggregation (#sources rows — a driver
    scalar, not a data collect) to derive the rates; membership itself
    stays a row-local hash predicate, so the mix is reproducible and
    stable under retries.
    """
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = [s for s in target_weights if s not in counts]
    if missing:
        raise ValueError(f"sources absent from data: {missing}")
    t_max = min(counts[s] / w for s, w in target_weights.items() if w > 0)
    rates = {
        s: min(1.0, (w * t_max) / counts[s]) for s, w in target_weights.items()
    }
    return stratified_hash_sample(
        df.filter(F.col(source_col).isin(list(target_weights))),
        key_col,
        source_col,
        rates,
        default_rate=0.0,
        digits=digits,
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    source_col: str,
    temperature: float,
    digits: int = 4,
) -> DataFrame:
    """Temperature-flattened source mixture — the multilingual/
    multi-source sampling rule (Conneau & Lample 2019; also the
    Gopher/PaLM data recipes): target share of source s is
    proportional to n_s^(1/T). T=1 keeps natural proportions (every
    row survives), larger T flattens the mix toward uniform so small
    sources stop drowning; T<1 sharpens instead. Downsampling-only
    like `mix_sources` (which this delegates to): the realized total
    is capped so the scarcest source never upsamples, and membership
    remains a pure hash predicate — reproducible across runs, layouts
    and retries.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["s"] is not None and r["n"] > 0
    }
    if not counts:
        return df.limit(0)
    weights = {s: float(n) ** (1.0 / temperature) for s, n in counts.items()}
    return mix_sources(df, key_col, source_col, weights, digits=digits)


def weighted_hash_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    quota: int,
    strata: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-``quota``
    per stratum, selection probability proportional to ``weight_col``)
    via the Efraimidis-Spirakis order statistic: each row draws
    u = hash-uniform(key) in (0, 1) and ranks by -ln(u)/w ascending.
    No RNG — membership is a pure function of the key, so the sample
    is reproducible across runs, engines, retries and cluster layouts
    (the same property as `hash_sample`, extended to weights: a row
    with twice the weight is twice as likely to make the cut).

    u derives from the first 8 md5 hex digits of the key — portable
    SQL, uniform on [1, 2^32] / (2^32 + 1). Non-positive weights are
    rejected rows (never sampled). One WindowGroupLimit-prunable
    window per stratum; unstratified sampling uses a single global
    top-k (TakeOrderedAndProject — no full sort).

    Output: the sampled input rows, unchanged.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    key = -F.log(u) / F.col(weight_col)
    ranked = df.filter(F.col(weight_col) > 0).withColumn("__es", key)
    if strata:
        w = Window.partitionBy(*strata).orderBy(F.col("__es").asc(), F.col(key_col).asc())
        out = ranked.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= quota
        ).drop("__rn")
    else:
        out = ranked.orderBy(F.col("__es").asc(), F.col(key_col).asc()).limit(quota)
    return out.drop("__es")


def cap_tokens_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    budget: int,
    key_col: str | None = None,
    order_cols: Sequence[Column] | None = None,
) -> DataFrame:
    """Weighted per-group quota: keep rows of each group, in a
    deterministic order, until their cumulative ``weight_col`` reaches
    ``budget`` — the TOKEN-budget twin of `cap_per_group` ("at most
    2B tokens per source/language in the mix"). A row is kept iff it
    STARTS under the budget, so the cap may overshoot by at most one
    document (the standard corpus-mixing convention: never split a
    document, never undershoot by skipping ahead).

    Order defaults to (md5(key), key) — the same hash order the epoch
    shuffle and weighted sampler use, so the kept prefix is an unbiased
    sample of the group, stable across runs/engines/partitionings.
    Pass ``order_cols`` (with a total-order tiebreaker) to spend the
    budget by quality score instead.

    Scale shape (default hash order): a naive per-group running sum is
    ONE window task per group — a 50 TB source would sort on a single
    executor. Because the hash order's leading component is an md5
    prefix, its first two hex chars split every group into 256
    CONTIGUOUS sort ranges, so the running sum decomposes exactly:
    per-(group, range) totals (one partial-aggregated pass, tiny
    result) cumulate into range offsets, and the within-range window
    runs 256-way parallel per group. Identical kept set, identical
    order — a distributed prefix sum, not an approximation. With
    caller-supplied ``order_cols`` no such split is inferable and the
    single per-group window applies (bucket your own leading column
    the same way if the groups are huge). NULL weights count as 0.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    wgt = F.coalesce(F.col(weight_col), F.lit(0))
    gcols = [F.col(c) for c in group_cols]
    if order_cols is not None:
        w = (
            Window.partitionBy(*gcols)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        started_at = F.sum(wgt).over(w) - wgt
        return (
            df.withColumn("__spent", started_at)
            .filter(F.col("__spent") < budget)
            .drop("__spent")
        )
    if key_col is None:
        raise ValueError("pass key_col (for hash order) or order_cols")
    bucket = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    with_b = df.withColumn("__b", bucket)
    totals = with_b.groupBy(*gcols, F.col("__b")).agg(F.sum(wgt).alias("__bt"))
    woff = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("__b").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols],
        F.col("__b").alias("__b2"),
        (F.sum("__bt").over(woff) - F.col("__bt")).alias("__off"),
    )
    cond = [
        F.col(c).eqNullSafe(F.col(f"__g_{c}")) for c in group_cols
    ] + [F.col("__b").eqNullSafe(F.col("__b2"))]
    win = (
        Window.partitionBy(*gcols, F.col("__b"))
        .orderBy(hash_bucket(key_col, 8), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    started_at = F.col("__off") + F.sum(wgt).over(win) - wgt
    return (
        with_b.join(offsets, on=cond, how="left")
        .withColumn("__spent", started_at)
        .filter(F.col("__spent") < budget)
        .drop("__spent", "__b", "__b2", "__off",
              *[f"__g_{c}" for c in group_cols])
    )
