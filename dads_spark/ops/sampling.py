"""Deterministic sampling and dataset-split operators.

Training-data pipelines need samples and splits that are (a) reproducible
across runs/engines/cluster layouts and (b) computable in one scan with no
global sort. Both operators here key on md5 of the row id — a fixed,
engine-portable hash (Spark ``md5`` and DuckDB ``md5`` agree bytewise on
the same UTF-8 input), so every result is oracle-checkable and stable
under repartitioning. No rand()/monotonically_increasing_id anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    n_per_key: int,
) -> DataFrame:
    """Per-key fixed-size sample: the ``n_per_key`` rows with the smallest
    md5(id) per key.

    Equivalent to a seeded uniform sample (md5 scrambles ids uniformly)
    but exactly reproducible anywhere. One shuffle (the per-key window);
    at scale Spark's WindowGroupLimit pushes the top-n below the exchange,
    so the shuffle carries ~n_per_key rows per key, not the full table.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*key_cols).orderBy(h, id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_key)
        .drop("_rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    test_nibbles: int = 1,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment by md5 prefix.

    A row is ``test`` iff the first hex nibble of md5(id) is below
    ``test_nibbles`` — i.e. a test fraction of ``test_nibbles``/16 (1 ->
    6.25%, 4 -> 25%). Valid domain is 1..15: at 16 the hex threshold
    would grow to two digits ('10' + 31 zeros) and the lexicographic
    compare against a 32-char digest silently inverts the split, so the
    bound is enforced. Hex-prefix comparison keeps the predicate a plain
    string compare (identical lexicographic semantics in every engine) —
    no float thresholds, no parsing. Membership is a pure function of the
    id: stable across runs, joins, and resharding, which is what keeps
    eval sets leak-free as the corpus grows.
    """
    if not 1 <= test_nibbles <= 15:
        raise ValueError(
            f"test_nibbles must be in 1..15 (got {test_nibbles}): the "
            "threshold is a single hex digit prefix over a 32-char md5"
        )
    h = F.md5(F.col(id_col).cast("string"))
    threshold = format(test_nibbles, "x") + "0" * 31
    return df.withColumn(
        split_col, F.when(h < threshold, "test").otherwise("train")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fraction: float,
) -> DataFrame:
    """Exact-size stratified sample: ceil(fraction * n_s) rows per stratum,
    chosen as the smallest md5(id) — deterministic, repartition-stable,
    engine-portable (unlike ``sampleBy``, which is seeded-RNG approximate
    and yields binomially-varying stratum sizes).

    One shuffle (the per-stratum window); the stratum count rides the same
    partitioning via a window aggregate, so no second pass or join. The
    window sort is per-stratum, bounded by stratum size — the usual skew
    caveats of any per-key ranking apply, nothing global.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0,1], got {fraction}")
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*strata_cols)
    rn = F.row_number().over(w.orderBy(h, id_col))
    take = F.ceil(F.count(F.lit(1)).over(w) * F.lit(fraction))
    return (
        df.withColumn("_rn", rn)
        .withColumn("_take", take)
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )


def bucket_sample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    k: int = 5,
    tier_seconds: int = 3600,
) -> DataFrame:
    """Deterministic fixed-size sample per (series, tier bucket): the k
    rows with the smallest md5(id) in each bucket — a reservoir whose
    membership is a pure function of the ids, so it is stable across
    reruns, repartitioning, and incremental re-ingestion (re-processing a
    bucket reproduces byte-identical samples, which checkpoint resume and
    cross-engine audits both need).

    One window pass partitioned by (keys, bucket); output is bounded at
    k rows per bucket regardless of raw bucket size — the property that
    makes per-bucket exemplar retention viable at 10^12 rows.

    Output: (keys..., bucket_sec, id, rnk).
    """
    t = F.col(ts_col).cast("timestamp").cast("long")
    bucket = ((t / F.lit(tier_seconds)).cast("long") * tier_seconds).alias(
        "bucket_sec"
    )
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(*key_cols, "bucket_sec").orderBy(h, F.col(id_col))
    return (
        df.select(*key_cols, bucket, F.col(id_col))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def balance_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int],
    id_col: str,
) -> DataFrame:
    """Largest deterministic subsample whose group mix matches integer
    ``weights`` EXACTLY: with m = min over weighted groups of
    (n_g div w_g), every group g contributes exactly m * w_g rows — the
    smallest-md5(id) ones. Groups absent from ``weights`` are dropped; a
    weighted group with fewer than w_g rows empties the output (m = 0).

    This is training-mixture rebalancing (up-weight tail languages /
    down-weight a dominant crawl source) done in pure integer arithmetic:
    real-valued target shares need a floor(C * s_g) whose float boundary
    behavior differs across engines, while integer weights make both the
    water-level m and every quota engine-exact, repartition-stable, and
    reproducible under re-ingestion.

    Scale shape: one narrow count shuffle over group_col (map-side
    partials), the quota table (|groups| rows) broadcast back, and ONE
    per-group ranking window over the corpus — the same single-shuffle
    shape as ``stratified_sample``; nothing global, no driver data moves.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(int(w) <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive integers: {weights}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(weights.items())],
        schema=f"{group_col} string, _w long",
    )
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    # left join FROM the weights side: a weighted group absent from df
    # must floor the water level to 0, not silently vanish from the min
    m = (
        wdf.join(counts, group_col, "left")
        .select(F.expr("coalesce(_n, 0L) div _w").alias("_q"))
        .agg(F.min("_q").alias("_m"))
    )
    quota = wdf.crossJoin(F.broadcast(m)).select(
        group_col, (F.col("_w") * F.col("_m")).alias("_take")
    )
    h = F.md5(F.col(id_col).cast("string"))
    rn = F.row_number().over(
        W.partitionBy(group_col).orderBy(h, F.col(id_col))
    )
    return (
        df.join(F.broadcast(quota), group_col)
        .withColumn("_rn", rn)
        .filter(F.col("_rn") <= F.col("_take"))
        .drop("_rn", "_take")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    cap: int,
    quality_col: str,
) -> DataFrame:
    """Quality-ranked contribution cap: at most ``cap`` rows per group,
    keeping the BEST ``quality_col`` (descending; md5(id) then id break
    ties deterministically) — the per-domain cap every web-corpus
    curation pipeline applies so one gigasite cannot dominate the
    training mix, retaining its highest-quality pages rather than a
    uniform draw (that uniform variant is ``deterministic_sample``).

    One ranking window per group; at 100 TB the window sort is
    per-domain and bounded by domain size — hot domains are exactly the
    rows the cap discards, so the skew pays for itself once and never
    again downstream.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.md5(F.col(id_col).cast("string"))
    rn = F.row_number().over(
        W.partitionBy(*group_cols).orderBy(
            F.col(quality_col).desc(), h, F.col(id_col)
        )
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= cap).drop("_rn")


def weighted_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    weight_col: str,
    n_per_key: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (A-ES /
    Efraimidis-Spirakis): per key, keep the ``n_per_key`` rows with the
    smallest exponential keys -ln(u)/w — inclusion probability tracks the
    weight, heavier rows are exponentially likelier to survive. The
    quality-WEIGHTED curation cut (sample the corpus proportional to a
    quality score) beside deterministic_sample's uniform one.

    u derives from md5(id): the first 13 hex digits as an integer h give
    u = (h+1)/16^13 in (0,1] — both operands below 2^53, so the division
    is the same exact double on any engine, and ln() on identical doubles
    agrees to the last bit in practice (the same surface every green
    logprob lane already stands on). No rand(), no partition-order
    dependence; ties break on id.

    One ranking window per key; at scale Spark pushes the top-n under the
    exchange (WindowGroupLimit), so the shuffle carries ~n rows per key.
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(float(16**13))
    ekey = -F.log(u) / F.col(weight_col).cast("double")
    w = W.partitionBy(*key_cols).orderBy(ekey, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_key)
        .drop("_rn")
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    quality_col: str,
    n_tiers: int = 4,
) -> DataFrame:
    """Deterministic curriculum ordering: rank the corpus into a single
    training sequence that round-robins across quality tiers.

    Curriculum/data-ordering pipelines want (a) quality-aware structure —
    every context window of the stream samples all quality strata, so a
    resumed or truncated run never trains on only the tail — and (b)
    bitwise reproducibility, because the data ORDER is part of the
    training recipe. Tiers come from ntile over (quality desc, md5(id),
    id) — the SQL-standard equal-fill bucketing both engines share — and
    documents are md5-shuffled WITHIN each tier, then interleaved:
    position = (rank_in_tier - 1) * n_tiers + tier. Positions are a
    permutation of 1..N by construction (rank is unique per tier, tier in
    1..n_tiers).

    Shape: two ranking windows over the same rows (one global ntile, one
    per-tier rank). The global sort is the honest cost of any total
    training order; at corpus scale it is a range-partitioned sort-merge,
    and the emitted position column is what lets the writer bucket the
    stream without ever re-sorting downstream.

    Output: (id, tier, pos).
    """
    if n_tiers < 1:
        raise ValueError(f"n_tiers must be >= 1, got {n_tiers}")
    h = F.md5(F.col(id_col).cast("string"))
    tier = F.ntile(n_tiers).over(
        W.orderBy(F.col(quality_col).desc(), h, F.col(id_col))
    )
    tiered = df.select(F.col(id_col), F.col(quality_col), tier.alias("tier"))
    h2 = F.md5(F.concat(F.lit("shuffle:"), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        W.partitionBy("tier").orderBy(h2, F.col(id_col))
    )
    return tiered.select(
        id_col,
        "tier",
        ((rn - 1) * n_tiers + F.col("tier")).cast("long").alias("pos"),
    )


def temporal_split(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    train_pct: int = 80,
    embargo_s: int = 3600,
) -> DataFrame:
    """Time-ordered train/test split with an embargo gap, per series key.

    Random splits leak future information into training whenever rows
    are autocorrelated in time (web snapshots, event streams); the
    standard fix is to cut each series chronologically and additionally
    DROP an embargo window after the cut, so near-boundary test rows
    aren't near-duplicates of the last training rows (the time-axis
    analogue of n-gram decontamination). The cut is exact-integer:
    train = the first (n * train_pct) div 100 rows ordered by (ts, id);
    rows within ``embargo_s`` seconds after the last training timestamp
    are labeled ``embargo`` (callers filter them out); the rest are
    ``test``. Pure window arithmetic — engine-exact, no float quantiles.

    One shuffle (the per-key window); the cut rank and cut timestamp ride
    the same partitioning as window aggregates, so no second pass.

    Output: df columns + ``split`` in {'train','embargo','test'}.
    """
    if not 0 <= train_pct <= 100:
        raise ValueError(f"train_pct must be in 0..100, got {train_pct}")
    w = W.partitionBy(*key_cols)
    order = w.orderBy(F.col(ts_col), F.col(id_col))
    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    rn = F.row_number().over(order)
    ranked = (
        df.withColumn("_rn", rn)
        .withColumn("_n", F.count(F.lit(1)).over(w))
        # true integer division (the packing.py lesson: floor(a/b) on
        # doubles loses exactness past 2^53)
        .withColumn("_cut", F.expr(f"_n * {int(train_pct)} div 100"))
        .withColumn("_ts_l", ts_long)
    )
    cut_ts = F.max(
        F.when(F.col("_rn") <= F.col("_cut"), F.col("_ts_l"))
    ).over(w)
    split = (
        F.when(F.col("_rn") <= F.col("_cut"), F.lit("train"))
        .when(F.col("_ts_l") <= cut_ts + embargo_s, F.lit("embargo"))
        .otherwise(F.lit("test"))
    )
    return ranked.withColumn("split", split).drop(
        "_rn", "_n", "_cut", "_ts_l"
    )


def bucket_log_ratio_q6(
    ct: int, cr: int, tt: int, tr: int, n_buckets: int, alpha: float
) -> int:
    """Laplace-smoothed target/raw log-ratio of one hash bucket, quantized
    to integer micro-nats with CPython's libm — the single place ln() is
    evaluated for the DSIR weights."""
    import math

    x = math.log((ct + alpha) / (tt + alpha * n_buckets)) - math.log(
        (cr + alpha) / (tr + alpha * n_buckets)
    )
    return int(math.floor(x * 1e6 + 0.5))


def dsir_importance(
    docs: DataFrame,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 0.5,
    top_n: int | None = None,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    via Importance Resampling"): score every document by how much more
    likely its hashed-unigram features are under a TARGET distribution
    (rows where ``is_target``) than under the RAW corpus distribution,
    then optionally select the top ``top_n``. The standard way to skew a
    web crawl toward a high-quality / in-domain slice without a trained
    classifier.

    Exactness: tokens hash to ``n_buckets`` via md5 (engine-portable);
    each bucket's Laplace-smoothed log-ratio
    ln((c_t+a)/(T_t+aB)) - ln((c_r+a)/(T_r+aB)) is quantized ONCE to
    integer micro-nats ON THE DRIVER (the counter table is <= n_buckets
    rows — the codebook-collect shape), and per-doc weights are exact
    integer sums of bucket quanta x occurrence counts. Executors never
    evaluate ln(): the distributed plan is pure integer arithmetic, so
    the output is bit-identical under any partitioning AND any engine —
    a quantum whose ln() lands within an ulp of a rounding boundary
    cannot flip between JVM and C libm because only one libm (CPython's)
    is ever consulted.

    Shape: one explode pass feeds BOTH aggregations — per-(doc, bucket)
    occurrence counts (shuffle bounded by doc length) and the
    ``n_buckets``-row target/raw counter table (conditional sums in one
    agg; collected, quantized on the driver, quanta broadcast back).
    Totals are two scalar longs summed from the collected rows. The optional
    selection is a global top-n window here (gate scale); at corpus
    scale you'd take the weight threshold from a quantile sketch and
    filter map-side instead — the weights themselves are the operator.

    Output: (id, n_tokens, lw_q6[, selected]).
    """
    tok = docs.select(
        F.col(id_col),
        is_target.cast("int").alias("_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    ).withColumn(
        "_b",
        F.conv(F.substring(F.md5(F.col("_w")), 1, 13), 16, 10).cast("long")
        % n_buckets,
    )
    per_doc = tok.groupBy(id_col, "_b").agg(F.count(F.lit(1)).alias("_dc"))
    buckets = tok.groupBy("_b").agg(
        F.sum("_t").alias("_ct"), F.count(F.lit(1)).alias("_cr")
    ).collect()
    tt = sum(r["_ct"] for r in buckets)
    tr = sum(r["_cr"] for r in buckets)
    quanta = [
        (r["_b"], bucket_log_ratio_q6(r["_ct"], r["_cr"], tt, tr, n_buckets, alpha))
        for r in buckets
    ]
    spark = docs.sparkSession
    lr_df = spark.createDataFrame(quanta, "_b long, _lr long")
    scored = per_doc.join(F.broadcast(lr_df), "_b")
    out = scored.groupBy(id_col).agg(
        F.sum("_dc").alias("n_tokens"),
        F.sum(F.col("_dc") * F.col("_lr")).alias("lw_q6"),
    )
    if top_n is None:
        return out
    w = W.orderBy(F.col("lw_q6").desc(), id_col)
    return out.withColumn("selected", F.row_number().over(w) <= top_n)


def token_budget_select(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    quality_col: str,
    budget: int,
) -> DataFrame:
    """Quality-first selection under a per-group TOKEN budget — the
    curation step every training-mix recipe ends with: each language
    (or source) gets a token allowance, filled by descending quality
    until the allowance is spent.  ``cap_per_group`` bounds COUNT;
    training mixes are specified in tokens, and document lengths vary by
    100x, so the budget must be a running SUM: keep rows whose cumulative
    token count (in quality-desc order, md5(id) then id breaking ties)
    stays <= budget.  Strict semantics — the first document that would
    overshoot is EXCLUDED, so the output never exceeds the allowance and
    is engine-exact (pure BIGINT cumsum, no float shares).

    One ranking window per group, same single-shuffle shape as
    cap_per_group; the cumsum reuses the ranking window's sort.  At
    100 TB the per-group sort is the curation cost itself and pays once.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), h, F.col(id_col)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_cum", cum)
        .filter(F.col("_cum") <= budget)
        .drop("_cum")
    )


def range_splits(
    df: DataFrame,
    order_cols: list[str],
    n_parts: int,
) -> DataFrame:
    """EXACT equi-depth split points for range partitioning — the
    planning step behind repartitionByRange / range-clustered writes,
    computed deterministically instead of by Spark's reservoir sampling
    (whose boundaries vary run to run and cannot be oracle-pinned).
    Split i (1..n_parts-1) is the row of global rank ceil(i * n / n_parts)
    in ``order_cols`` order: assigning rows to parts by boundary
    comparison yields parts whose sizes differ by at most the tie mass.

    Shape: one ranking pass (a global sort — this runs on the PLANNING
    sample or a dimension, not the full corpus; for a 100 TB table feed
    it a deterministic hash sample and the boundaries converge at
    1/sqrt(sample)) then an n_parts-row filter by exact rank arithmetic:
    rank * n_parts is compared against i * n in pure BIGINT cross-
    multiplication — no division, no floats.

    Output: (split_idx, order value columns...) — n_parts - 1 rows.
    """
    if n_parts < 2:
        raise ValueError(f"n_parts must be >= 2, got {n_parts}")
    w = W.orderBy(*[F.col(c) for c in order_cols])
    ranked = df.select(*order_cols).withColumn(
        "_rk", F.row_number().over(w)
    )
    total = ranked.agg(F.max("_rk").alias("_n"))
    # row _rk is split i iff _rk == ceil(i*n/p) for some i in 1..p-1:
    # i = floor(_rk * p / n) works when _rk is the FIRST rank with
    # _rk * p >= i * n; test both neighbors in exact integer arithmetic
    out = ranked.crossJoin(F.broadcast(total))
    # when n < n_parts several boundaries coincide; the chain keeps the
    # smallest split_idx for a shared rank (documented collapse)
    matches = None
    for i in range(1, n_parts):
        # ceil(i*n/p) = (i*n + p - 1) DIV p
        cond = F.expr(
            f"_rk = (CAST({i} AS BIGINT) * _n + {n_parts - 1})"
            f" DIV {n_parts}"
        )
        m = F.when(cond, F.lit(i))
        matches = m if matches is None else matches.when(cond, F.lit(i))
    return (
        out.withColumn("_si", matches)
        .filter(F.col("_si").isNotNull())
        .select(F.col("_si").cast("long").alias("split_idx"), *order_cols)
    )


def ht_estimate(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    value_col: str,
    rate_denoms: dict[str, int],
    default_denom: int = 8,
) -> DataFrame:
    """Horvitz-Thompson estimation from a DETERMINISTIC Poisson sample:
    per-stratum totals estimated from the cheap md5-thresholded subset
    — "corpus statistics without scanning the corpus", the survey-
    sampling standard with exact reproducibility.

    Inclusion: md5(id) lexicographically below the stratum's hex-prefix
    threshold (the hash_split idiom — a plain string compare, identical
    in every engine). Denominators must divide 16 ({2, 4, 8, 16}), so
    every threshold is one hex nibble + 31 zeros and every inclusion
    probability is an exact unit fraction — which is why the HT total
    ``sum(v * denom)`` stays EXACT integer arithmetic.

    Returns (strata..., denom, n_sampled, ht_total, ht_count); ht_count
    is the value estimator with v = 1. Strata absent from
    ``rate_denoms`` use ``default_denom``.

    Reference analog: none; SURVEY §2.4 sampling suite — the
    ESTIMATION face of deterministic_sample (which only selects).
    """
    def _thr(dnm: int) -> str:
        if 16 % dnm != 0 or dnm < 2:
            raise ValueError("denominators must be in {2, 4, 8, 16}")
        return format(16 // dnm, "x") + "0" * 31

    denom = F.lit(default_denom)
    thr = F.lit(_thr(default_denom))
    for stratum, dnm in sorted(rate_denoms.items()):
        cond = F.col(strata_cols[0]) == stratum
        denom = F.when(cond, F.lit(int(dnm))).otherwise(denom)
        thr = F.when(cond, F.lit(_thr(int(dnm)))).otherwise(thr)
    h = F.md5(F.col(id_col).cast("string"))
    sampled = df.withColumn("_denom", denom).filter(h < thr)
    return (
        sampled.groupBy(*strata_cols, "_denom")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(
                F.col(value_col).cast("long") * F.col("_denom")
            ).alias("ht_total"),
            F.sum(F.col("_denom")).alias("ht_count"),
        )
        .withColumnRenamed("_denom", "denom")
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    n_total: int,
) -> DataFrame:
    """Neyman OPTIMAL stratified-sample allocation: sample size per
    stratum proportional to N_h * sigma_h — the textbook
    minimum-variance design for a fixed budget (survey sampling /
    corpus quality audits: high-variance strata earn more probes than
    proportional allocation gives them).

    Exactness: with exact long moments (N_h, s_h, q_h) the weight
    N_h * sigma_h = sqrt(N_h * q_h - s_h^2) — the n cancels — so the
    weight is ``isqrt(A_h)`` with A_h = N_h*q_h - s_h^2, computed as a
    CORRECTLY-FLOORED integer square root (float sqrt then two integer
    comparison corrections, so a libm ulp can never flip the floor).
    Seats are then dealt by the exact Hamilton largest-remainder rule
    (:func:`dads_spark.ops.apportion.apportion`), which this composes.

    Caller bound: N_h * q_h < 2^63 (integer-valued metrics — token or
    byte counts per doc).

    Output: (stratum, n_rows, a, w, base, extra, alloc) with
    sum(alloc) == n_total exactly. Constant strata (A_h = 0) weigh 0
    and allocate 0 — auditing a constant stratum needs one probe at
    most, which the caller can overlay.

    Scale shape: one keyed aggregate to the stratum relation (map-side
    partials), then apportion's broadcast-total arithmetic on that
    tiny table.
    """
    from .apportion import apportion

    v = F.col(value_col).cast("long")
    m = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_q"),
    )
    a = (F.col("n_rows") * F.col("_q") - F.col("_s") * F.col("_s"))
    c0 = F.floor(F.sqrt(a.cast("double"))).cast("long")
    c1 = F.when((c0 + 1) * (c0 + 1) <= a, c0 + 1).otherwise(c0)
    w = F.when(c1 * c1 > a, c1 - 1).otherwise(c1)
    weighted = m.select(
        stratum_col,
        "n_rows",
        a.alias("a"),
        w.alias("w"),
    )
    out = apportion(weighted, stratum_col, "w", n_total)
    return out.join(
        weighted.select(stratum_col, "n_rows", "a"), stratum_col
    ).select(
        stratum_col, "n_rows", "a", "w", "base", "extra", "alloc"
    )
