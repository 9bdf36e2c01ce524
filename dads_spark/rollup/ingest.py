"""TSDB ingest semantics: out-of-order arrivals, duplicate samples,
last-write-wins compaction.

Real metric pipelines re-deliver: an agent retries a batch, two HA
scrapers race, a backfill replays a day. Every production TSDB
(Prometheus remote-write receivers, InfluxDB, TimescaleDB) therefore
defines ingest as UPSERT-BY-TIMESTAMP — for a given (series, ts) the
sample with the highest ingest version wins (last write wins). This
module implements that contract relationally:

- ``lww_compact``: one hash aggregation per (series, ts) keeping the
  max-(version, value) sample — ``max(struct(...))`` so the winner is
  deterministic even under duplicate versions (struct comparison is
  lexicographic, identical on any engine). One shuffle keyed by
  (series, ts): the same key the tier rollup shuffles on anyway, so at
  100 TB compaction rides the partitioning the write path already has.
- ``out_of_order_stats``: the ingest-health report — per series, how
  many arrivals landed with a timestamp <= the running max already
  ingested (the "out-of-order or duplicate" counter every TSDB
  exports), plus the max backwards jump in seconds. One window pass in
  arrival order; exact longs end-to-end.

Reference analog: none; §2.3 north-rule suite (the ingest front door of
the rollup engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["lww_compact", "out_of_order_stats"]


def lww_compact(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_epoch",
    ver_col: str = "ingest_ver",
    value_col: str = "value",
) -> DataFrame:
    """Collapse re-deliveries: per (series, ts) keep the sample whose
    (version, value) struct is maximal. Returns
    (*key_cols, ts, value, ingest_ver, n_writes) — n_writes is the
    write amplification audit (how many deliveries that point saw)."""
    win = F.max(
        F.struct(F.col(ver_col).alias("v"), F.col(value_col).alias("x"))
    )
    return (
        samples.groupBy(*key_cols, ts_col)
        .agg(
            win.alias("_w"),
            F.count(F.lit(1)).cast("long").alias("n_writes"),
        )
        .select(
            *key_cols,
            ts_col,
            F.col("_w.x").alias(value_col),
            F.col("_w.v").alias(ver_col),
            "n_writes",
        )
    )


def out_of_order_stats(
    samples: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts_epoch",
    arrival_col: str = "ingest_ver",
) -> DataFrame:
    """Per-series ingest health: walk samples in ARRIVAL order
    (``arrival_col``) and count arrivals whose timestamp is <= the
    running max timestamp already seen — the out-of-order/duplicate
    counter — plus the largest backwards jump in seconds and the
    distinct-timestamp vs arrival counts. All exact longs."""
    w = (
        W.partitionBy(*key_cols)
        .orderBy(arrival_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    )
    ts = F.col(ts_col).cast("long")
    prior_max = F.max(ts).over(w)
    flagged = samples.select(
        *key_cols,
        ts.alias("_ts"),
        prior_max.alias("_pm"),
    ).select(
        *key_cols,
        "_ts",
        F.when(F.col("_pm").isNotNull() & (F.col("_ts") <= F.col("_pm")), 1)
        .otherwise(0)
        .alias("_ooo"),
        F.when(
            F.col("_pm").isNotNull() & (F.col("_ts") <= F.col("_pm")),
            F.col("_pm") - F.col("_ts"),
        )
        .otherwise(0)
        .alias("_jump"),
    )
    return flagged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.countDistinct("_ts").cast("long").alias("n_points"),
        F.sum("_ooo").cast("long").alias("n_out_of_order"),
        F.max("_jump").cast("long").alias("max_backwards_s"),
    )


def cdc_apply(
    ops: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change-data-capture stream to reach final state: per key,
    the op with the HIGHEST sequence number wins; a winning delete erases
    the key entirely.  Covers the replication-ingest shape lww_compact
    (upserts only) cannot: upstream deletions must erase, not linger.

    Ordering contract: ``seq_col`` must be a total order per key (a
    replication log LSN); ties would be nondeterministic, so callers with
    coarse timestamps should pass (ts, log_offset) composed into one
    sequence.  One shuffle keyed by the entity; row_number + filter is
    the whole plan — at 100 TB the op stream partitions by key and the
    final state is append-free.

    Output: one row per surviving key, the winning row's columns plus
    ``n_ops`` (write-amplification audit, deletes included).

    Reference analog: none; spec source BASELINE.json:6 (out-of-order
    ingest — the replication/CDC half; lww_compact above handles sample
    re-delivery). Public semantics: Debezium-style envelope collapse.
    """
    w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    n = W.partitionBy(*key_cols)
    return (
        ops.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(n))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def watermark_tuning(
    df: DataFrame,
    key_col: str,
    event_ts_col: str,
    arrival_ts_col: str,
    id_col: str,
    delays_sec: list[int],
) -> DataFrame:
    """Watermark-delay tuning: replay the stream in ARRIVAL order and
    count, per source and candidate delay, how many events a watermark
    of (max event time seen so far) - delay would have dropped — the
    accounting that picks a streaming watermark BEFORE deploying it
    (too small silently drops the late tail; too large holds state).

    Semantics match Structured Streaming's per-source view: an event is
    late iff its event time < (the running max event time over all
    STRICTLY EARLIER arrivals) - delay, evaluated per key (sources track
    their own watermark before the global min; arrival ties break on the
    id column so the replay is a total order).  One keyed window shared
    by every candidate delay — the delays differ only in the final
    comparison, so tuning N candidates costs one pass, not N.

    Output per (key, delay_sec): n_total, n_dropped, dropped_permille —
    exact integers over epoch seconds.
    """
    w = (
        W.partitionBy("key")
        .orderBy(F.col("_ar"), F.col("_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    staged = df.select(
        F.col(key_col).alias("key"),
        F.col(event_ts_col).alias("_ev"),
        F.col(arrival_ts_col).alias("_ar"),
        F.col(id_col).alias("_id"),
    ).withColumn("_wm", F.max("_ev").over(w))
    aggs = []
    for d in delays_sec:
        dropped = (
            F.col("_wm").isNotNull()
            & (F.col("_ev") < F.col("_wm") - F.lit(int(d)))
        ).cast("long")
        aggs.append(F.sum(dropped).alias(f"_d{d}"))
    per_key = staged.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_total"), *aggs
    )
    rows = [
        F.struct(
            F.lit(int(d)).cast("long").alias("delay_sec"),
            F.col(f"_d{d}").cast("long").alias("n_dropped"),
        )
        for d in delays_sec
    ]
    return per_key.select(
        "key", "n_total", F.explode(F.array(*rows)).alias("r")
    ).select(
        "key",
        F.col("r.delay_sec").alias("delay_sec"),
        F.col("n_total").cast("long").alias("n_total"),
        F.col("r.n_dropped").alias("n_dropped"),
        F.expr("CAST(1000 * r.n_dropped AS BIGINT) DIV n_total").alias(
            "dropped_permille"
        ),
    )
