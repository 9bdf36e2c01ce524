"""Bloom-filter incremental dedup against a prior crawl snapshot.

The 10^12-scale way to ask "have we crawled this content before?"
WITHOUT joining today's crawl against the full historical key set: build
an m-bit Bloom filter over the prior snapshot's content keys, broadcast
it (m bits — kilobytes to megabytes, INDEPENDENT of how many keys it
summarizes), and probe today's rows map-side. False positives are the
accepted price (tunable via m/k); false negatives are impossible, so a
"new" verdict is always safe to trust.

Engineering shape:
- positions use Kirsch-Mitzenmacher double hashing pos_i = (h1 + i*h2)
  mod m with h1/h2 from disjoint md5 slices (h2 forced odd) — pure
  int64 arithmetic, engine-portable, no float anywhere;
- the BUILD aggregates to at most m distinct set-bit positions
  regardless of snapshot size (the collect is bounded by the filter,
  not the data), packed to a numpy bitmap and broadcast;
- the PROBE is an Arrow-batched mapInPandas doing one vectorized
  bitmap gather per batch — no shuffle, composes with the scan;
- the exact verdict (anti-join on the true key) is carried alongside
  as the AUDIT arm so tests and the oracle can classify each row as
  new / seen / false_positive. At production scale you would sample
  this arm, not run it corpus-wide — the bloom verdict is the operator.

Reference analog: none; SURVEY §2.4 training-data-pipeline suite (the
incremental twin of exact dedup, for crawl-over-crawl ingestion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hash_pair(key):
    """(h1, h2) int64 pair from disjoint md5 hex slices; h2 odd so the
    double-hash probe sequence cycles the whole table for power-of-two m.
    All values < 2^54 — exact in int64 on any engine."""
    h1 = F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(key), 14, 13), 16, 10).cast("long") * 2 + 1
    return h1, h2


def _positions(key, m_bits: int, k: int):
    h1, h2 = _hash_pair(key)
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)])


def bloom_dedup(
    new: DataFrame,
    seen: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Classify each row of ``new`` against the Bloom summary of
    ``seen[key_col]``: (id, bloom_hit, exact_seen, status) with status in
    {'new', 'seen', 'false_positive'}. bloom_hit is the broadcast-bitmap
    probe; exact_seen the audit join. bloom_hit is never False when
    exact_seen is True (no false negatives) — asserted in tests."""
    import numpy as np
    import pandas as pd

    spark = new.sparkSession

    set_bits = (
        seen.select(F.explode(_positions(F.col(key_col), m_bits, k)).alias("p"))
        .distinct()
        .collect()
    )
    bitmap = np.zeros(m_bits, dtype=bool)
    bitmap[[r["p"] for r in set_bits]] = True
    bc = spark.sparkContext.broadcast(np.packbits(bitmap))

    probe = new.select(
        F.col(id_col),
        F.col(key_col).alias("_k"),
        _positions(F.col(key_col), m_bits, k).alias("_pos"),
    )

    def test(batches):
        bits = np.unpackbits(bc.value).astype(bool)
        for pdf in batches:
            if len(pdf):
                pos = np.stack(pdf["_pos"].to_numpy())
                hit = bits[pos].all(axis=1)
            else:
                hit = np.zeros(0, dtype=bool)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "_k": pdf["_k"], "bloom_hit": hit}
            )

    probed = probe.mapInPandas(
        test, f"{id_col} long, _k string, bloom_hit boolean"
    )

    # audit arm: exact membership (at corpus scale: sampled, not full)
    exact = (
        seen.select(F.col(key_col).alias("_k"))
        .distinct()
        .withColumn("_seen", F.lit(True))
    )
    return (
        probed.join(exact, "_k", "left")
        .select(
            id_col,
            "bloom_hit",
            F.coalesce("_seen", F.lit(False)).alias("exact_seen"),
        )
        .withColumn(
            "status",
            F.when(F.col("exact_seen"), F.lit("seen"))
            .when(F.col("bloom_hit"), F.lit("false_positive"))
            .otherwise(F.lit("new")),
        )
    )


def bloom_semijoin(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Bloom SEMI-JOIN reduction — the runtime-filter pattern behind
    every modern warehouse join: before shuffling the BIG side for a
    join against a selective small side, probe a broadcast Bloom
    summary of the small side's keys map-side and drop the rows that
    cannot possibly match.  No false negatives, so the reduction is
    SEMANTICS-PRESERVING: the subsequent exact join over the surviving
    rows returns exactly the rows the plain join would — only the
    shuffle volume changes (by 1 - selectivity, minus the FPR).

    Returns ``big`` filtered to rows whose ``key_col`` passes the
    Bloom probe (a superset of the true semi-join, FPR-bounded).
    Callers follow with the exact join; the equivalence is the gate
    (the ``salted_join`` discipline: an optimization must prove it
    changes nothing but the plan).

    Scale shape: the filter is m bits broadcast (independent of the
    small side's row count), the probe is one Arrow-batched
    mapInPandas composed with the scan — ZERO added shuffles; the
    only shuffle left is the exact join over the reduced relation.
    """
    import numpy as np
    import pandas as pd

    spark = big.sparkSession
    set_bits = (
        small.select(
            F.explode(_positions(F.col(key_col), m_bits, k)).alias("p")
        )
        .distinct()
        .collect()
    )
    bitmap = np.zeros(m_bits, dtype=bool)
    bitmap[[r["p"] for r in set_bits]] = True
    bc = spark.sparkContext.broadcast(np.packbits(bitmap))

    cols = big.columns
    probe = big.withColumn(
        "_pos", _positions(F.col(key_col), m_bits, k)
    )
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in big.schema.fields
    )

    def test(batches):
        bits = np.unpackbits(bc.value).astype(bool)
        for pdf in batches:
            if len(pdf):
                pos = np.stack(pdf["_pos"].to_numpy())
                keep = bits[pos].all(axis=1)
                yield pdf.loc[keep, cols]
            else:
                yield pd.DataFrame({c: pdf[c] for c in cols})

    return probe.mapInPandas(test, schema)
