"""ANALYZE-style table profiling in one aggregate pass.

Data pipelines gate ingests on column profiles (null explosion, distinct
collapse, truncated strings). This operator computes, for every named
column, (n_rows, n_null, n_distinct, min, max, total_len) in ONE
aggregation over the table — no per-column scans — then unpivots with
``stack`` so the result is one row per column.

Everything emitted is an integer or a string: min/max are taken over the
STRING CAST of the column (callers pick columns whose string form is
engine-canonical — ints/strings always are; avoid raw doubles in
cross-engine comparisons) and lengths are summed, not averaged, so the
whole profile hash-compares exactly. Exact ``count_distinct`` is used —
at tier/dimension scale that is the right tool; at raw-corpus scale swap
``approx_count_distinct`` (the HLL path this repo's distinct cascade
already owns) for the same shape.

Scale shape: one scan; Spark plans multi-column distinct aggregates via
Expand (input replicated once per distinct column) with map-side partial
aggregation — the shuffle carries per-group partials, never the table.
Profiling 10 columns costs one pass at ~10x aggregate width, not 10
passes.

Reference analog: none; spec source BASELINE.json:6 (ingest-quality
monitoring beside the rollup engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["profile_table"]


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_null, n_distinct,
    min_s, max_s, total_len), one row per entry of ``cols``."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(s).alias(f"_min_{c}"),
            F.max(s).alias(f"_max_{c}"),
            F.sum(F.coalesce(F.length(s), F.lit(0))).alias(f"_len_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{c}, _nd_{c}, _min_{c}, _max_{c}, _len_{c}" for c in cols
    )
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_null, n_distinct, min_s, max_s, total_len)",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_s", "max_s", "total_len")


def profile_drift(
    old_df: DataFrame, new_df: DataFrame, cols: list[str]
) -> DataFrame:
    """Per-column profile drift between two versions of a table (e.g. two
    SnapshotStore versions, yesterday's ingest vs today's): joins the two
    one-pass profiles and emits integer deltas plus changed-extrema
    flags — the ingest-gate check "did nulls explode / distincts collapse
    / value ranges move" as data. All integers/strings/booleans, so the
    report hash-compares exactly.

    Two scans total (one per version, each profiling all columns at
    once); the join is |cols| rows — driver-trivial at any table size.
    """
    a = profile_table(old_df, cols)
    b = profile_table(new_df, cols)
    oldp = a.select(
        "column",
        F.col("n_rows").alias("n_rows_old"),
        F.col("n_null").alias("n_null_old"),
        F.col("n_distinct").alias("n_distinct_old"),
        F.col("min_s").alias("min_old"),
        F.col("max_s").alias("max_old"),
        F.col("total_len").alias("total_len_old"),
    )
    newp = b.select(
        "column",
        F.col("n_rows").alias("n_rows_new"),
        F.col("n_null").alias("n_null_new"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_s").alias("min_new"),
        F.col("max_s").alias("max_new"),
        F.col("total_len").alias("total_len_new"),
    )
    return (
        oldp.join(newp, "column")
        .select(
            "column",
            "n_rows_old",
            "n_rows_new",
            (F.col("n_null_new") - F.col("n_null_old")).alias("null_delta"),
            (F.col("n_distinct_new") - F.col("n_distinct_old")).alias(
                "distinct_delta"
            ),
            (F.col("total_len_new") - F.col("total_len_old")).alias("len_delta"),
            (
                ~F.col("min_new").eqNullSafe(F.col("min_old"))
                | ~F.col("max_new").eqNullSafe(F.col("max_old"))
            ).alias("range_changed"),
        )
    )


def data_contract_audit(
    df: DataFrame,
    rules: list[tuple[str, str, str, object]],
) -> DataFrame:
    """Declarative data-contract checks (the Great-Expectations shape a
    production ingest runs before publishing a partition), evaluated in
    ONE pass over the table.

    ``rules`` is a list of (rule_id, column, check, param):

    - ``not_null``  — param ignored; violation = NULL value
    - ``min`` / ``max`` — violation = value < / > param (NULLs don't
      double-count: they belong to not_null)
    - ``in_set``    — param is a list; violation = non-NULL value outside
    - ``rlike``     — param is a regex; violation = non-NULL non-match
    - ``unique``    — violations = count(col) - count(DISTINCT col)

    Every row-level rule becomes one conditional SUM inside a single
    aggregate (map-side partials; the scan is read once regardless of
    rule count); ``unique`` rides the same aggregate as an exact
    count-distinct. The single result row is then exploded back into one
    row per rule: (rule_id, column, check, n_rows, n_violations,
    passed). Exact integers only.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, (rid, col, check, param) in enumerate(rules):
        c = F.col(col)
        if check == "not_null":
            viol = c.isNull()
        elif check == "min":
            viol = c.isNotNull() & (c < F.lit(param))
        elif check == "max":
            viol = c.isNotNull() & (c > F.lit(param))
        elif check == "in_set":
            arr = F.array(*[F.lit(v) for v in param])
            viol = c.isNotNull() & ~F.array_contains(arr, c)
        elif check == "rlike":
            viol = c.isNotNull() & ~c.rlike(param)
        elif check == "unique":
            aggs.append(
                (F.count(c) - F.countDistinct(c)).cast("long").alias(f"_v{i}")
            )
            continue
        else:
            raise ValueError(f"unknown check {check!r}")
        aggs.append(F.sum(viol.cast("long")).cast("long").alias(f"_v{i}"))
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(rid).alias("rule_id"),
            F.lit(col).alias("column"),
            F.lit(check).alias("check"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v{i}").alias("n_violations"),
            (F.col(f"_v{i}") == 0).alias("passed"),
        )
        for i, (rid, col, check, _p) in enumerate(rules)
    ]
    return row.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def shuffle_skew_report(
    df: DataFrame,
    key_cols: list[str],
    n_hex: int = 2,
) -> DataFrame:
    """Pre-flight join/groupBy skew diagnosis: how evenly would rows of
    this table spread if shuffled on ``key_cols``? Rows hash to one of
    16^n_hex buckets by md5 prefix (engine-portable — Spark and DuckDB
    md5 agree bytewise, no numeric hex parsing needed), and each bucket
    reports its load and its single heaviest key. A p99/mean bucket
    ratio far above 1, or max_key_rows ~ n_rows, says "salt this key or
    expect a straggler" BEFORE paying for the real shuffle — the
    planning half of the salted-rollup / hot-bucket machinery.

    Returns (bucket, n_rows, n_keys, max_key_rows) with exact longs;
    bucket is the hex-prefix string.
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    per_key = (
        df.select(F.md5(key).alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    return (
        per_key.groupBy(F.substring("_h", 1, n_hex).alias("bucket"))
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("_n").cast("long").alias("max_key_rows"),
        )
    )


def join_size_estimate(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    n_hex: int = 2,
) -> DataFrame:
    """Pre-flight equi-join output-size statistics — the cost-based-
    optimizer input behind every broadcast/shuffle/salt decision.  For
    an inner equi-join, |A JOIN B| = sum over keys of cntA(k) * cntB(k);
    this computes that sum EXACTLY from the two per-key histograms
    (their own map-side aggregates), grouped by md5-prefix bucket so the
    report also shows WHERE the blowup lives (the same portable bucket
    scheme as shuffle_skew_report — a 16^n_hex-row answer about a
    petabyte join).

    Per bucket: n_keys_both (matching keys), est_rows (exact join
    cardinality), max_key_rows (the worst single key's output — the
    salt-or-broadcast trigger).  All BIGINT; overflow only past 2^63
    output rows, at which point the report IS the answer.

    Reference analog: none; the planning sibling of shuffle_skew_report
    (plan audits pin both as dimension-sized).
    """
    def hist(df: DataFrame) -> DataFrame:
        key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
        return (
            df.select(F.md5(key).alias("_h"))
            .groupBy("_h")
            .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        )

    ha = hist(a).withColumnRenamed("_n", "_na")
    hb = hist(b).withColumnRenamed("_n", "_nb")
    joined = ha.join(hb, "_h")
    return (
        joined.groupBy(F.substring("_h", 1, n_hex).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys_both"),
            F.sum(F.col("_na") * F.col("_nb")).cast("long").alias("est_rows"),
            F.max(F.col("_na") * F.col("_nb")).cast("long").alias(
                "max_key_rows"
            ),
        )
    )


def encoding_advisor(
    df: DataFrame,
    cols: list[str],
    order_col: str,
) -> DataFrame:
    """Columnar-encoding advisor: per column, the exact statistics a
    writer needs to choose parquet encodings — n_rows, distinct count,
    run count in ``order_col`` order (the layout the file will be
    written in; runs are what RLE sees), and average stringified width
    in centichars — plus the standard recommendation: DICT when the
    dictionary would be <=5% of rows, RLE when runs compress >=10x,
    PLAIN otherwise.  This is the ANALYZE step behind the blobstore /
    compaction write paths: choosing encodings from measured stats
    instead of defaults is routinely a 2-5x size delta at tier scale.

    One pass per column (bounded by the column list, map-side partials;
    the run count is a lag window in the declared write order).  All
    exact integers.

    The write-order lag window is a single global sort: like
    ``range_splits`` this is a PLANNING op — run it on the ANALYZE
    sample or one representative file's rows, never the full corpus
    (run counts converge fast; the recommendation only needs ratios).
    """
    out = None
    w = W.orderBy(F.col(order_col))
    for c in cols:
        v = F.col(c).cast("string")
        # NULLs map to a sentinel for RUN counting only (so a NULL run is
        # one run, and lag-null means first-row unambiguously); ndv and
        # width keep SQL NULL semantics
        r = F.coalesce(v, F.lit("\x00"))
        runs = (
            df.select(v.alias("_v"), r.alias("_r"), F.col(order_col))
            .withColumn(
                "_new",
                F.coalesce(
                    (F.lag("_r").over(w) != F.col("_r")), F.lit(True)
                ).cast("long"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("_v").alias("ndv"),
                F.sum("_new").alias("n_runs"),
                F.sum(F.length(F.coalesce(F.col("_v"), F.lit(""))))
                .alias("_len"),
            )
            .select(
                F.lit(c).alias("column"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("ndv").cast("long").alias("ndv"),
                F.col("n_runs").cast("long").alias("n_runs"),
                F.expr("CAST(100 * _len AS BIGINT) DIV n_rows").alias(
                    "avg_len_centichars"
                ),
            )
        )
        out = runs if out is None else out.unionByName(runs)
    return out.withColumn(
        "recommendation",
        F.when(F.expr("ndv * 20 <= n_rows"), "dict")
        .when(F.expr("n_runs * 10 <= n_rows"), "rle")
        .otherwise("plain"),
    )
