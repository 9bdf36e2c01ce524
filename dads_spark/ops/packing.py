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


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG / long-context document CHUNKING: split each document into
    windows of ``chunk_tokens`` whitespace tokens with ``overlap``
    tokens of context carried between consecutive chunks — the
    retrieval-corpus preparation step between curation and embedding
    (every production RAG pipeline has exactly this operator in front
    of its encoder).

    Fully relational — no Python anywhere: posexplode the token
    stream, map token position p to its covering chunks (chunk k
    covers [k*stride, k*stride + chunk_tokens) with stride =
    chunk_tokens - overlap; a token belongs to 1 or 2 chunks, emitted
    via a tiny sequence+explode on the chunk-id range), then
    reassemble each chunk with an ORDER-PINNED concat. Emits
    (id, chunk_id, n_tokens, first_pos, last_pos, chunk_md5) — the
    md5 pins the exact reassembled text without shipping it.

    Determinism: token order inside a chunk is the explode position —
    ``array_join(transform(array_sort over (pos, token) structs))``
    — engine-independent; boundary arithmetic is integer DIV.

    Scale shape: the explode bounds the shuffle by token count x (1 +
    overlap/stride); chunk assembly is one groupBy(id, chunk) agg.
    Empty/short documents yield a single chunk 0.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("chunk_tokens must exceed overlap")
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("p", "w"),
    )
    # covering chunk ids: k from ceil((p - chunk+1)/stride) clamped at 0
    # to p DIV stride — at most 2 ids for overlap < stride*2
    lo = F.greatest(
        F.lit(0),
        F.expr(
            f"CAST(ceil((p - {chunk_tokens - 1}) / {stride}) AS BIGINT)"
        ),
    )
    hi = F.expr(f"p DIV {stride}")
    assigned = tok.select(
        id_col,
        "p",
        "w",
        F.explode(F.sequence(lo, hi)).alias("chunk_id"),
    ).filter(
        (F.col("p") >= F.col("chunk_id") * stride)
        & (F.col("p") < F.col("chunk_id") * stride + chunk_tokens)
    )
    return (
        assigned.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.min("p").alias("first_pos"),
            F.max("p").alias("last_pos"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "w"))
                        ),
                        lambda s: s["w"],
                    ),
                    " ",
                )
            ).alias("chunk_md5"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "n_tokens",
            F.col("first_pos").cast("long").alias("first_pos"),
            F.col("last_pos").cast("long").alias("last_pos"),
            "chunk_md5",
        )
        # drop trailing stubs fully contained in the previous chunk:
        # chunk k>0 exists iff it reaches at least one NEW token, i.e.
        # past the previous chunk's end (k-1)*stride + chunk_tokens - 1
        .filter(
            (F.col("chunk_id") == 0)
            | (
                F.col("last_pos")
                >= (F.col("chunk_id") - 1) * stride + chunk_tokens
            )
        )
    )
