"""Host-mirror detection via shared content fingerprints.

Mirror sites (CDN clones, scraper re-hosts, www/non-www splits that
escaped canonicalization) are a first-order duplication source in web
corpora: page-level dedup removes the COPIES but leaves both hosts
looking legitimate, skewing per-domain statistics, crawl budgets and
mixture weights.  The standard cure is host-level containment: hosts
whose document-fingerprint sets overlap almost completely are one
logical site.

Semantics per unordered host pair (a < b by name):

    n_shared        = |F_a ∩ F_b|            (exact long)
    n_a, n_b        = |F_a|, |F_b|           (exact longs)
    jaccard_q6      = half-up q6 of n_shared / |F_a ∪ F_b|
    containment_q6  = half-up q6 of n_shared / min(n_a, n_b)

with F_h the DISTINCT fingerprint set of host h.  Both ratios are
integer half-up divisions of exact longs — (2*1e6*shared + den) DIV
(2*den) — so any engine reproduces them bit-for-bit; no float exists
anywhere in the operator.

Scale shape (the minhash_lsh discipline applied to hosts):
- distinct (host, fp) is one keyed shuffle;
- the inverted index groups by fp; a fingerprint carried by k hosts
  emits C(k,2) pairs, so UBIQUITOUS fingerprints (empty pages, shared
  boilerplate checksums) are excluded by ``max_hosts_per_fp`` BEFORE
  the pair join — the cap is part of the operator's contract (a fp on
  more hosts than the cap is boilerplate, not mirror evidence), keeps
  the pair explosion bounded by cap*|fps|, and is applied identically
  in the oracle;
- the pair aggregate keys on (host_a, host_b): mirror candidates are
  rare, the output is tiny.

Reference analog: none; spec source is §2.4 (dedup suite — the host-
granularity sibling of minhash_lsh/dup_clusters) + BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["mirror_hosts"]


def mirror_hosts(
    df: DataFrame,
    host_col: str,
    fp_col: str,
    min_shared: int = 2,
    max_hosts_per_fp: int = 16,
) -> DataFrame:
    """Module docstring semantics.  ``df`` carries one row per
    (document occurrence); duplicates collapse via the internal
    distinct."""
    pairs_in = df.select(
        F.col(host_col).alias("_h"), F.col(fp_col).alias("_fp")
    ).distinct()
    # inverted index with the ubiquity cap: boilerplate fps never join
    fp_hosts = pairs_in.groupBy("_fp").agg(
        F.sort_array(F.collect_list("_h")).alias("_hosts")
    )
    # host sizes derive from the SAME inverted index (uncapped), so the
    # distinct+index subtree is shared across both consumers instead of
    # recomputing the corpus-wide distinct per branch
    sizes = (
        fp_hosts.select(F.explode("_hosts").alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    capped = fp_hosts.filter(
        F.size("_hosts") <= F.lit(int(max_hosts_per_fp))
    )
    pair = (
        capped.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "_hosts",
                            lambda a: F.transform(
                                "_hosts",
                                lambda b: F.struct(
                                    a.alias("host_a"), b.alias("host_b")
                                ),
                            ),
                        )
                    ),
                    lambda s: s.host_a < s.host_b,
                )
            ).alias("_p")
        )
        .select("_p.host_a", "_p.host_b")
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(int(min_shared)))
    )
    with_sizes = (
        pair.join(
            sizes.select(
                F.col("_h").alias("host_a"), F.col("_n").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("_h").alias("host_b"), F.col("_n").alias("n_b")
            ),
            "host_b",
        )
    )
    jac = F.expr(
        "(2 * 1000000 * n_shared + (n_a + n_b - n_shared))"
        " DIV (2 * (n_a + n_b - n_shared))"
    )
    cont = F.expr(
        "(2 * 1000000 * n_shared + least(n_a, n_b))"
        " DIV (2 * least(n_a, n_b))"
    )
    return with_sizes.select(
        "host_a",
        "host_b",
        "n_shared",
        "n_a",
        "n_b",
        jac.cast("long").alias("jaccard_q6"),
        cont.cast("long").alias("containment_q6"),
    )
