"""Deterministic sequence packing: documents -> fixed-size training bins.

LLM pretraining consumes fixed-length context windows, not documents; the
batch step between a curated corpus and a training run is PACKING — assign
each document an (example_id, offset) so concatenated token streams fill
ctx_len-token windows with minimal padding. This is the greedy sequential
packing used at web scale (concatenate in a deterministic order, cut every
ctx_len tokens): a document STARTS at its running-offset and may span a
boundary (the standard cross-document attention-mask case), so bin id =
floor(start_offset / ctx_len).

Spark shape: one window pass per shard — ``sum(tokens) over (partition by
shard order by order_col)`` — entirely in JVM window evaluation, no
Python. The shard key bounds the sort: at 10^12 docs you pack within
(lang, hash-shard) partitions, each a few GB, so the per-shard running
sum never needs a global total order. Output is a pure function of
(shard, order_col) — repartition-invariant and rerun-stable, which is
what makes the packed dataset reproducible across cluster sizes.

Reference analog: none (DADS is an anomaly engine); spec source is the
§2.4 training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    docs: DataFrame,
    shard_cols: list[str],
    order_col: str,
    token_col: str,
    ctx_len: int,
) -> DataFrame:
    """Assign (bin_id, bin_offset) per document within each shard.

    bin_id/bin_offset derive from the exclusive running token sum in
    (shard, order_col) order; ``spans_boundary`` marks documents that
    cross a context-window cut (they contribute to bin_id and at least
    bin_id+1). All integer arithmetic — bit-exact on any engine.
    """
    w = (
        W.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    start = (cum - F.col(token_col)).cast("long")
    staged = docs.select(
        *shard_cols,
        F.col(order_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        start.alias("_tok_start"),
    )
    return staged.select(
        *shard_cols,
        F.col(order_col),
        "n_tokens",
        # integer `DIV`, NOT `/`: long/int promotes to double in Spark
        # and loses exactness past 2^53 cumulative tokens — real at
        # 100 TB-corpus shard offsets
        F.expr(f"_tok_start DIV {int(ctx_len)}").cast("long").alias("bin_id"),
        (F.col("_tok_start") % F.lit(ctx_len)).cast("long").alias("bin_offset"),
        (
            (F.col("_tok_start") % F.lit(ctx_len)) + F.col("n_tokens")
            > F.lit(ctx_len)
        ).alias("spans_boundary"),
    )
