"""Exact heavy hitters at scale: mergeable Misra-Gries candidates + one
verification pass.

The naive plan — groupBy(item).count() then filter — shuffles one row per
DISTINCT item: at web-corpus scale that is the whole vocabulary (billions
of keys) to find the few thousand items above threshold. This operator
bounds the shuffle by the THRESHOLD instead of the vocabulary:

1. Partial (mapInPandas, batch-local): exact item counts within the Arrow
   batch, compressed to a Misra-Gries summary of k = ceil(2/threshold)
   counters by subtracting the (k+1)-th largest count — a valid MG summary
   with undercount <= n_b/(k+1) for that batch (Misra & Gries 1982;
   mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
   Each batch also emits a NULL-item sentinel carrying its row count, so
   the total n rides the same pass (no separate count() scan).
2. Merge + candidate extraction, ONE action (first scan of the source):
   sum the summaries per item, then take the top k+2 rows by est. The
   NULL sentinel (est = n, >= any item's est) is the top row and yields
   n_total; every true candidate is in the remainder, because an item's
   merged undercount is bounded by sum_b n_b/(k+1) <= n/(k+1) <
   threshold*n/2, so candidates need est >= ceil(threshold*n) - slack >
   threshold*n/2 - 1 and at most ~2/threshold = k items can clear that
   (their ests sum to <= n). TakeOrdered ships k+2 rows to the driver —
   bounded by the threshold, independent of data size.
3. Verify (second scan): exact counts for the candidates only — a
   broadcast semi-join of the corpus against the (<= k)-row candidate
   relation, then the exact HAVING filter. The vocabulary never shuffles.

Exactly two source scans, no caching, no reliance on exchange reuse
(AQE does not dedupe twin subplans over a Python map operator — measured).
Output is EXACT (item, cnt) for every item with cnt >= ceil(threshold*n),
bit-equal to the naive plan — which is what the SQL oracle runs.

Reference analog: none (DADS is a pure time-series engine); this is part
of the training-data-pipeline suite (frequency analysis over web text).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    threshold: float,
) -> DataFrame:
    """Exact (item, cnt) for items occurring in >= threshold of all rows.

    ``items`` is one row per occurrence (pre-exploded). ``threshold`` is a
    fraction in (0, 1); k = ceil(2/threshold) counters per Arrow batch keep
    the merged undercount below threshold*n/2.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    k = int(math.ceil(2.0 / threshold))
    spark = items.sparkSession
    src = items.select(F.col(item_col).alias("item"))

    def partial(it):
        for pdf in it:
            counts = pdf["item"].value_counts()
            if len(counts) > k:
                # MG compression of the exact batch histogram: subtract
                # the (k+1)-th largest count, keep positives
                d = int(counts.iloc[k])
                counts = counts.iloc[:k] - d
                counts = counts[counts > 0]
            out = pd.DataFrame(
                {"item": counts.index, "est": counts.to_numpy(dtype=np.int64)}
            )
            # sentinel: batch row count under the (impossible) NULL item
            out.loc[len(out)] = [None, len(pdf)]
            yield out

    top = (
        src.mapInPandas(partial, "item string, est long")
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
        .orderBy(F.desc("est"), F.asc_nulls_first("item"))
        .limit(k + 2)
        .collect()
    )
    n_total = sum(r["est"] for r in top if r["item"] is None)
    if n_total == 0:
        return spark.createDataFrame([], "item string, cnt long")
    min_count = int(math.ceil(threshold * n_total))
    slack = n_total // (k + 1) + 1
    cand = [
        (r["item"],)
        for r in top
        if r["item"] is not None and r["est"] + slack >= min_count
    ]
    if not cand:
        return spark.createDataFrame([], "item string, cnt long")
    candidates = spark.createDataFrame(cand, "item string")

    return (
        src.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(min_count))
    )
