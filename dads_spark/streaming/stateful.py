"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with a window-sum over gap markers
(``__spark_entry__.q_sessionize``); the streaming twin assembles the same
sessions incrementally: per-user state carries the OPEN session (ordinal,
start, last-event time, count, value sum); events with a gap >
``gap_us`` close the previous session; the watermark closes trailing
sessions via event-time timeout. Emitted rows are complete sessions only —
identical (user_id, session_id, n_events, duration_us, value_sum) tuples
to the batch result once every session has closed (pytest-verified by
driving a bounded backlog plus a watermark-advancing sentinel).

State is one tiny tuple per ACTIVE user — the 100 TB shape: state size
tracks concurrently-open sessions, not history, and the watermark bounds
how long an idle user occupies the store.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: emitted rows: exactly the batch sessionize shape
SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, duration_us long, "
    "value_sum double"
)
#: per-user open-session state
STATE_SCHEMA = "next_sid long, start_us long, last_us long, n long, vsum double"


def streaming_sessionize(
    stream: DataFrame,
    gap_us: int = 1_800_000_000,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-user sessionizer; emits one row per CLOSED session."""
    from pyspark.sql import functions as F

    ev = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            user_col,
            ts_col,
            F.unix_micros(F.col(ts_col)).alias("_us"),
            F.col(value_col).alias("_v"),
            F.col("event_id").alias("_eid"),
        )
    )

    def assemble(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            next_sid, start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_id": [next_sid],
                    "n_events": [n],
                    "duration_us": [last_us - start_us],
                    "value_sum": [vsum],
                }
            )
            return
        pdf = pd.concat(list(pdfs)).sort_values(["_us", "_eid"])
        if state.exists:
            next_sid, start_us, last_us, n, vsum = state.get
        else:
            next_sid, start_us, last_us, n, vsum = 0, None, None, 0, 0.0
        out = []
        for us, v in zip(pdf["_us"], pdf["_v"]):
            us, v = int(us), float(v)
            if last_us is not None and us - last_us > gap_us:
                out.append((user, next_sid, n, last_us - start_us, vsum))
                next_sid += 1
                start_us, n, vsum = us, 0, 0.0
            if start_us is None:
                start_us = us
            last_us = us
            n += 1
            vsum += v
        state.update((next_sid, start_us, last_us, n, vsum))
        # close the open session once the watermark passes its gap horizon
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_id", "n_events", "duration_us", "value_sum"
                ],
            )

    return ev.groupBy(user_col).applyInPandasWithState(
        assemble,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_stream(
    spark,
    source_path: str,
    schema,
    gap_us: int = 1_800_000_000,
    watermark: str = "1 hour",
    query_name: str = "sessionize_stream",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a bounded backlog through the stateful sessionizer (memory
    sink, append mode) and return every emitted session row."""
    from .windowed import sized_state_partitions

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    sess = streaming_sessionize(stream, gap_us=gap_us, watermark=watermark)
    with sized_state_partitions(spark, state_partitions):
        q = (
            sess.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


#: emitted rows: exactly the batch scd2_history shape for one attr column
SCD2_SCHEMA = (
    "user_id long, event_type string, valid_from long, valid_to long, "
    "is_current boolean"
)
#: per-entity open state: current attr + when it opened
SCD2_STATE_SCHEMA = "attr string, valid_from long"


def streaming_scd2(
    stream: DataFrame,
    watermark: str = "1 hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
) -> DataFrame:
    """Streaming SCD2 maintenance (the incremental twin of
    ops/scd.py:scd2_history): per entity, state carries the OPEN attr
    interval; an arriving value different from the current state closes
    the interval (emit valid_from/valid_to, is_current=False) and opens
    the next; the event-time timeout flushes the final open interval as
    is_current=True once the watermark passes the entity's horizon.

    State is one (attr, valid_from) pair per LIVE entity — the 100 TB
    shape: the store tracks concurrently-evolving entities, not history
    (history is what gets EMITTED). Cross-batch late data beyond the
    watermark is out of contract, matching the other stateful twins.
    """
    from pyspark.sql import functions as F

    ev = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            key_col,
            ts_col,
            F.unix_micros(F.col(ts_col)).alias("_us"),
            F.col(attr_col).alias("_a"),
            F.col("event_id").alias("_eid"),
        )
    )

    def maintain(key, pdfs, state: GroupState):
        (ent,) = key
        if state.hasTimedOut:
            attr, vfrom = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [ent],
                    "event_type": [attr],
                    "valid_from": [vfrom],
                    "valid_to": [None],
                    "is_current": [True],
                }
            )
            return
        pdf = pd.concat(list(pdfs)).sort_values(["_us", "_eid"])
        if state.exists:
            attr, vfrom = state.get
        else:
            attr, vfrom = None, None
        rows = {"event_type": [], "valid_from": [], "valid_to": []}
        for us, a in zip(pdf["_us"], pdf["_a"]):
            us = int(us)
            if vfrom is None:
                attr, vfrom = a, us
            elif a != attr:
                rows["event_type"].append(attr)
                rows["valid_from"].append(vfrom)
                rows["valid_to"].append(us)
                attr, vfrom = a, us
        state.update((attr, vfrom))
        # timeout once the watermark passes the last seen event time
        state.setTimeoutTimestamp(int(pdf["_us"].max()) // 1000 + 1)
        if rows["event_type"]:
            n = len(rows["event_type"])
            yield pd.DataFrame(
                {
                    "user_id": [ent] * n,
                    "event_type": rows["event_type"],
                    "valid_from": rows["valid_from"],
                    "valid_to": rows["valid_to"],
                    "is_current": [False] * n,
                }
            )

    return ev.groupBy(key_col).applyInPandasWithState(
        maintain,
        SCD2_SCHEMA,
        SCD2_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def run_scd2_stream(
    spark,
    source_path: str,
    schema,
    watermark: str = "1 hour",
    query_name: str = "scd2_stream",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a bounded backlog through the streaming SCD2 maintainer
    (memory sink, append mode) and return every emitted interval row."""
    from .windowed import sized_state_partitions

    stream = spark.readStream.schema(schema).format("parquet").load(source_path)
    hist = streaming_scd2(stream, watermark=watermark)
    with sized_state_partitions(spark, state_partitions):
        q = (
            hist.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


#: emitted rows: one per scored event past the warm-up
ZSCORE_SCHEMA = (
    "event_id long, event_type string, x long, n_prev long, "
    "is_outlier boolean"
)
#: per-key running counters — three exact integers
ZSCORE_STATE_SCHEMA = "n long, s long, q long"


def streaming_zscore(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    x_col: str = "x",
    min_n: int = 30,
    k2: int = 9,
) -> DataFrame:
    """Online per-key z-score anomaly flags with EXACT INTEGER state.

    Each event is scored against the statistics of every PRIOR event of
    its key (prior by event time, ties on event_id): outlier iff
    ``(x - mean)^2 > k^2 * var``, which over integer observations
    rearranges to the all-integer test

        (n*x - s)^2  >  k^2 * (n*q - s^2)        [n = count, s = sum,
                                                  q = sum of squares]

    so the streaming result is bit-identical to the batch window-sum
    formulation — no float recurrence, no cross-engine surface. State is
    three longs per key (Welford without the division); emission is
    per-batch append, so a bounded time-ordered backlog reproduces the
    batch oracle exactly. Events during the warm-up (fewer than
    ``min_n`` priors) are not emitted.

    The 100 TB shape: state size is O(keys), each batch does one
    vectorized cumsum per key — the same cost profile as the stateless
    streaming rollups, plus three integers of state.
    """
    from pyspark.sql import functions as F

    import numpy as np

    ev = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .select(
            F.col(key_col).alias("_k"),
            F.unix_micros(F.col(ts_col)).alias("_us"),
            F.col(x_col).cast("long").alias("_x"),
            F.col("event_id").alias("_eid"),
        )
    )

    def score(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:  # NoTimeout: unreachable, kept for clarity
            state.remove()
            return
        pdf = pd.concat(list(pdfs)).sort_values(["_us", "_eid"])
        n0, s0, q0 = state.get if state.exists else (0, 0, 0)
        x = pdf["_x"].to_numpy(dtype=np.int64)
        cum = np.cumsum(x)
        cum2 = np.cumsum(x * x)
        n_prev = n0 + np.arange(len(x), dtype=np.int64)
        s_prev = s0 + np.concatenate(([0], cum[:-1]))
        q_prev = q0 + np.concatenate(([0], cum2[:-1]))
        lhs = (n_prev * x - s_prev) ** 2
        rhs = k2 * (n_prev * q_prev - s_prev * s_prev)
        keep = n_prev >= min_n
        out = pd.DataFrame(
            {
                "event_id": pdf["_eid"].to_numpy()[keep],
                "event_type": k,
                "x": x[keep],
                "n_prev": n_prev[keep],
                "is_outlier": (lhs > rhs)[keep],
            }
        )
        state.update(
            (int(n0 + len(x)), int(s0 + cum[-1]) if len(x) else s0,
             int(q0 + cum2[-1]) if len(x) else q0)
        )
        if len(out):
            yield out

    return ev.groupBy("_k").applyInPandasWithState(
        score,
        ZSCORE_SCHEMA,
        ZSCORE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_zscore_stream(
    spark,
    source_path: str,
    schema,
    query_name: str = "zscore_stream",
    state_partitions: int | None = 8,
    x_expr: str = "user_id % 997",
) -> DataFrame:
    """Drive a bounded backlog through the stateful z-scorer (memory sink,
    append mode) and return every emitted row."""
    from pyspark.sql import functions as F

    from .windowed import sized_state_partitions

    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_path)
        .withColumn("x", F.expr(x_expr))
    )
    scored = streaming_zscore(stream)
    with sized_state_partitions(spark, state_partitions):
        q = (
            scored.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


CUSUM_SCHEMA = (
    "event_id long, event_type string, sp long, sn long, "
    "alarm_up boolean, alarm_down boolean"
)
# nb/s/q: baseline accumulators; r: isqrt(B*Q - S^2) once established
# (-1 = degenerate constant baseline, emit nothing); cp/cn: running
# prefix sums; mp/mn: running prefix minima clamped at 0
CUSUM_STATE_SCHEMA = (
    "nb long, s long, q long, r long, cp long, mp long, cn long, mn long"
)


def streaming_cusum(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    x_col: str = "x",
    baseline_n: int = 30,
    k_half_units: int = 1,
    h_units: int = 10,
) -> DataFrame:
    """Online two-sided CUSUM drift alarms with EXACT INTEGER state.

    The in-control mean/sigma come from each key's first ``baseline_n``
    events (the batch cusum_changepoints rule); sigma enters ONLY through
    r = isqrt(B*Q - S^2) — exact integer square root, no float anywhere.
    The classic recurrence s_t = max(0, s_{t-1} + z_t - k) is kept
    reset-free and evaluated through the prefix identity

        s_t = P_t - min(0, min_{j<=t} P_j),   P = cumsum(2*d_t -+ r)

    with d_t = B*x_t - S (so z_t = d_t / (B*sigma) and k = 1/2 in the
    same scaled units; alarm when s > h_units * r, h_units=10 == 5 sigma).
    The identity makes the stream bit-identical to a plain SQL window
    (cumsum + running min) — the oracle needs no sequential UDF — while
    the streaming side updates (P, min) per key in O(1) state and one
    vectorized cumsum/minimum.accumulate per batch.

    Emits one row per post-baseline event: (event_id, key, sp, sn,
    alarm_up, alarm_down). Keys with a constant baseline (sigma = 0)
    emit nothing, matching the batch guard.
    """
    import math

    import numpy as np

    from pyspark.sql import functions as F

    ev = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .select(
            F.col(key_col).alias("_k"),
            F.unix_micros(F.col(ts_col)).alias("_us"),
            F.col(x_col).cast("long").alias("_x"),
            F.col("event_id").alias("_eid"),
        )
    )

    def score(key, pdfs, state: GroupState):
        (k,) = key
        pdf = pd.concat(list(pdfs)).sort_values(["_us", "_eid"])
        nb, s, q, r, cp, mp, cn, mn = (
            state.get if state.exists else (0, 0, 0, 0, 0, 0, 0, 0)
        )
        x = pdf["_x"].to_numpy(dtype=np.int64)
        eid = pdf["_eid"].to_numpy(dtype=np.int64)
        i = 0
        # 1) finish the baseline if still warming up
        if nb < baseline_n:
            take = min(baseline_n - nb, len(x))
            bx = x[:take]
            nb += take
            s += int(bx.sum())
            q += int((bx * bx).sum())
            i = take
            if nb == baseline_n:
                sd2 = baseline_n * q - s * s
                r = math.isqrt(sd2) if sd2 > 0 else -1
        out = None
        if nb == baseline_n and r > 0 and i < len(x):
            d2 = 2 * (baseline_n * x[i:] - s)
            a_up = d2 - k_half_units * r
            a_dn = -d2 - k_half_units * r
            p_up = cp + np.cumsum(a_up)
            p_dn = cn + np.cumsum(a_dn)
            m_up = np.minimum.accumulate(np.minimum(p_up, mp))
            m_dn = np.minimum.accumulate(np.minimum(p_dn, mn))
            sp = p_up - np.minimum(m_up, 0)
            sn = p_dn - np.minimum(m_dn, 0)
            out = pd.DataFrame(
                {
                    "event_id": eid[i:],
                    "event_type": k,
                    "sp": sp,
                    "sn": sn,
                    "alarm_up": sp > h_units * r,
                    "alarm_down": sn > h_units * r,
                }
            )
            cp, mp = int(p_up[-1]), int(min(m_up[-1], 0))
            cn, mn = int(p_dn[-1]), int(min(m_dn[-1], 0))
        state.update((nb, s, q, r, cp, mp, cn, mn))
        if out is not None and len(out):
            yield out

    return ev.groupBy("_k").applyInPandasWithState(
        score,
        CUSUM_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_cusum_stream(
    spark,
    source_path: str,
    schema,
    query_name: str = "cusum_stream",
    state_partitions: int | None = 8,
    x_expr: str = "user_id % 997",
) -> DataFrame:
    """Drive a bounded backlog through the stateful CUSUM (memory sink,
    append mode) and return every emitted row."""
    from pyspark.sql import functions as F

    from .windowed import sized_state_partitions

    stream = (
        spark.readStream.schema(schema).format("parquet").load(source_path)
        .withColumn("x", F.expr(x_expr))
    )
    scored = streaming_cusum(stream)
    with sized_state_partitions(spark, state_partitions):
        q = (
            scored.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        q.processAllAvailable()
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
