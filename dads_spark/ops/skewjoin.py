"""Skew-salted equi-join: the named cure for hot-key shuffles.

A hash join on a skewed key sends every row of the hot key to ONE
reducer; AQE's skew-join split handles sort-merge spills but not the
logical single-partition ceiling of a straggling key. The classic fix
is SALTING: append a salt in [0, S) to the big side's key, replicate
the small side S times (one copy per salt), and join on (key, salt) —
the hot key's rows now spread across S tasks, at the price of an
S-times copy of the other side (which is why the salted side should be
the SMALLER one, and why S is a knob, not a constant).

The transformation is semantics-preserving for inner/left joins on
equi-keys — the gate pins ``salted_join == plain join`` exactly; the
replication uses ``explode(sequence(0, S-1))``, so no Python, no
nondeterministic rand(): the salt on the big side derives from a
stable row hash, keeping the operator deterministic under retries
(a rand() salt re-rolls on task retry and can DOUBLE rows under
speculative execution — the classic production bug this avoids).

Reference analog: the reference's heterogeneous work distribution
(MasterCommand.java work-load factors) solves the same imbalance for
its actor pools; SURVEY §2.3 partitioning/skew row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on the ``on`` equi-keys with an
    ``n_salt``-way salt: big rows take a deterministic hash salt,
    small rows replicate once per salt value. Supports 'inner' and
    'left' (left = big side preserved). Column sets must be disjoint
    apart from the keys."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    if n_salt <= 0:
        raise ValueError("n_salt must be positive")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)
    ).cast("int")
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [*on, "_salt"], how).drop("_salt")
