"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting.

Quality/token/fingerprint stay JVM-side (built-in expressions inside
whole-stage codegen — no Python in the hot path); language ID is a
vectorized stopword-profile scorer in a pandas UDF (the lists are tiny and
broadcast implicitly with the closure).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "los", "de", "y", "que", "es", "un", "una", "por"],
}


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, n_chars) — whitespace tokens."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        id_col,
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def text_quality(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + a composite score, all JVM-side.

    Features: token count, mean token length, alphabetic-character ratio,
    type/token ratio. score = ttr * alpha_ratio, rounded — crude but
    deterministic and oracle-expressible in ANSI SQL.
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tokens
    return docs.select(
        id_col,
        n_tokens.alias("n_tokens"),
        F.round((n_chars - (n_tokens - 1)) / n_tokens, 4).alias("mean_token_len"),
        F.round(alpha_chars / n_chars, 4).alias("alpha_ratio"),
        F.round(distinct_ratio, 4).alias("type_token_ratio"),
        F.round(distinct_ratio * (alpha_chars / n_chars), 4).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: (id, pred_lang, confidence).

    Scores each language by its stopword hit rate over the doc's tokens;
    argmax wins (tie order = STOPWORDS declaration order), 'other' when
    nothing hits. Fully JVM-side — tokenization, membership counts, and the
    argmax are built-in expressions inside whole-stage codegen; no Python
    in the hot path.
    """
    langs = list(STOPWORDS)
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )

    def _in_set(words):  # one-arg lambda factory (F.filter dispatches on arity)
        arr = F.array(*[F.lit(w) for w in words])
        return lambda x: F.array_contains(arr, x)

    scored = docs.select(
        id_col,
        *[
            (
                F.size(F.filter(toks, _in_set(STOPWORDS[lang])))
                / F.greatest(F.lit(1), F.size(toks))
            ).alias(f"_s_{lang}")
            for lang in langs
        ],
    )
    conf = F.greatest(*[F.col(f"_s_{lang}") for lang in langs])
    pred = F.when(conf <= 0, F.lit("other"))
    for i, lang in enumerate(langs):
        later = [F.col(f"_s_{lang}") >= F.col(f"_s_{other}") for other in langs[i + 1:]]
        cond = later[0] if later else F.lit(True)
        for c in later[1:]:
            cond = cond & c
        pred = pred.when(cond, F.lit(lang))
    return scored.select(
        id_col, pred.alias("pred_lang"), conf.alias("confidence")
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003): Rabin-Karp rolling hash over k-grams of the text bytes, then the
    minimum hash of every w-window of consecutive k-gram hashes (rightmost
    minimum, the paper's robust-winnowing tie rule), distinct per doc.

    Output: one row per (doc, fingerprint) — the standard near-copy
    detection index. Fully vectorized: the rolling hash is computed for a
    whole document with two cumulative products over uint64 (mod 2^64),
    window minima via a strided sliding view.
    """
    base = np.uint64(1_000_003)

    def run(it):
        for pdf in it:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not text:  # NULL/empty rows produce no fingerprints
                    continue
                b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
                n = len(b) - k + 1
                if n < 1:
                    continue
                # h[i] = sum_{j<k} b[i+j] * base^(k-1-j)  (mod 2^64, natural
                # uint64 wraparound) — vectorized via powers + sliding sum
                pw = np.empty(k, dtype=np.uint64)
                pw[0] = 1
                with np.errstate(over="ignore"):  # uint64 wraparound is the hash
                    for j in range(1, k):
                        pw[j] = pw[j - 1] * base
                    win = np.lib.stride_tricks.sliding_window_view(b, k)
                    h = (win * pw[::-1][None, :]).sum(axis=1, dtype=np.uint64)
                if len(h) < w:
                    sel = np.array([int(h.argmin())])
                else:
                    hw = np.lib.stride_tricks.sliding_window_view(h, w)
                    # rightmost minimum per window (robust winnowing)
                    rev_arg = w - 1 - np.argmin(hw[:, ::-1], axis=1)
                    sel = np.unique(rev_arg + np.arange(len(hw)))
                chosen = np.unique(h[sel]).astype(np.int64)
                ids.extend([did] * len(chosen))
                fps.extend(chosen.tolist())
            yield pd.DataFrame({id_col: ids, "fingerprint": fps})

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} long, fingerprint long"
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable 60-bit content fingerprint: (id, fingerprint long).

    First 15 hex chars of sha256(text) parsed base-16 — JVM-side, collision
    probability ~2^-60, reproducible in any engine with sha256.
    """
    return docs.select(
        id_col,
        F.conv(F.substring(F.sha2(F.col(text_col).cast("binary"), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("fingerprint"),
    )


def top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Most distinctive terms per document: per-doc term frequency ranked
    by (tf desc, corpus doc-frequency asc, term asc), top k.

    The classic tf-idf ordering without the idf float: for equal tf a
    rarer term (lower doc_freq) ranks higher. Staying in integers keeps
    the ranking bit-deterministic across engines (ln() differs in the last
    ulp between libm implementations, which can flip ranks at ties).
    Output: (doc_id, term, tf, doc_freq, rank). The corpus doc-frequency
    side is one row per distinct term — broadcast-eligible, so the tf side
    never reshuffles for the join.
    """
    toks = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("doc_freq"))
    w = W.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "doc_freq", "rank")
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals, entirely JVM-side.

    Per document: ``n_ngrams`` (token n-gram occurrences), ``dup_ngram_frac``
    (fraction of occurrences whose n-gram appears more than once in the
    doc), ``top_ngram_frac`` (share of the single most frequent n-gram).
    Heavily repetitive machine-generated text scores high on both; the
    usual filter drops docs above a dup-fraction cut.

    Shape: the n-gram list is built with array higher-order functions
    (``transform`` over a ``sequence``) inside codegen — no Python, no
    self-join; then one explode + two hash aggregations keyed by doc,
    which AQE coalesces and which scale linearly in corpus size. The
    n-gram space never aggregates globally (contrast heavy_hitters): all
    keys are (doc, ngram), so skew is bounded by document length.
    """
    toks = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        docs.select(F.col(id_col), F.explode(grams).alias("ngram"))
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_ngrams"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "_dup"
            ),
            F.max("cnt").alias("_top"),
        )
        .select(
            id_col,
            "n_ngrams",
            # exact IEEE long/long division — engine-portable, unlike
            # round() whose tie semantics differ across engines (the
            # paa_sax lesson)
            (F.col("_dup") / F.col("n_ngrams")).alias("dup_ngram_frac"),
            (F.col("_top") / F.col("n_ngrams")).alias("top_ngram_frac"),
        )
    )


def token_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc unigram Shannon entropy (nats) — a cheap perplexity proxy.

    Low entropy flags repetitive/templated text (the same signal family
    as repetition_stats, at token granularity); near-log(n_tokens)
    entropy means every token distinct. Columns: id, ``n_tokens``,
    ``distinct_tokens``, ``entropy`` = -sum(p_w * ln p_w) over the doc's
    own unigram distribution.

    Shape: explode + two hash aggs keyed by doc — keys bounded by doc
    length, never a global vocabulary aggregate, so skew is bounded and
    the plan is the same linear two-shuffle cascade as repetition_stats.
    ln() summation order is engine-dependent in the last bits; gate
    queries round (6 dp).
    """
    per_word = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.sum(F.col("cnt") * F.log(F.col("cnt"))).alias("_clogc"),
        )
        .select(
            id_col,
            "n_tokens",
            "distinct_tokens",
            # -sum(c/n * ln(c/n)) = ln(n) - sum(c*ln c)/n  (exact algebra,
            # one log per distinct word instead of a division per row)
            (
                F.log(F.col("n_tokens"))
                - F.col("_clogc") / F.col("n_tokens")
            ).alias("entropy"),
        )
    )


def vocab_oov(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary token fraction per doc against the corpus's own
    top-``vocab_size`` unigram vocabulary.

    The tokenizer-coverage question every training pipeline asks: with a
    V-word vocab, what share of each document's tokens fall outside it?
    Vocabulary ranking is deterministic and engine-portable: by (count
    DESC, word ASC) — ties broken lexically, never by partition order.

    Shape: one global word count (explode + hash agg; partial aggregation
    makes the shuffle carry one row per (partition, word)), a top-V cut,
    then a broadcast LEFT join of the V-row vocab onto the per-(doc,word)
    counts — the corpus-side never reshuffles for the vocab lookup. V is
    small by definition (1e4..1e5), far under broadcast thresholds.
    """
    per_word = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = (
        per_word.groupBy("w")
        .agg(F.sum("cnt").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("w").asc())
        .limit(vocab_size)
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        per_word.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("cnt")).otherwise(0)
            ).alias("_oov"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_oov") / F.col("n_tokens")).alias("oov_frac"),
        )
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Posting lists: one row per term with document frequency, total
    term frequency, and the sorted posting list of doc ids.

    The IR-side dual of the document-major layout — what BM25 / boolean
    retrieval reads. Shape: explode + per-(doc,term) agg (bounded keys,
    like the other textstats), then one term-keyed agg building the
    posting array; ``min_df`` prunes the hapax tail (the overwhelming
    majority of terms) before any array materializes. The posting list
    is emitted as a ','-joined STRING — deterministic, engine-portable,
    and driver-hashable; at real scale store the array column
    partitioned/bucketed by term instead (one line to change) — a
    posting list for a stopword-grade term would otherwise hit row
    limits, which is also why stopword filtering upstream is standard.
    """
    per_doc = (
        docs.select(
            F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.sort_array(F.collect_list(F.col(id_col))), ","
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-unigram-LM surprisal per document — the classic cheap
    quality/perplexity filter for training-data pipelines: documents whose
    tokens are improbable under the corpus's OWN unigram distribution are
    disproportionately OCR garbage, lists of codes, or non-language.

    Per distinct token w: neglp_q6(w) = floor(-ln(c_w / T) * 1e6 + 0.5)
    as an integer (c_w = corpus occurrences, T = corpus total). Per doc:
    the exact integer sum of neglp_q6 over token OCCURRENCES plus the
    token count. Quantizing per-token BEFORE summing makes the document
    score an exact integer — independent of summation order, partitioning,
    and engine float-reduction differences (the one remaining cross-engine
    surface is ln() itself on identical doubles, a <=1-ulp concern the
    1e-6 quantum dwarfs).

    Shape: explode -> per-(doc, token) counts (shuffle keyed by doc+token,
    bounded by doc length), a corpus vocab aggregate (shuffle keyed by
    token — the only corpus-wide reduction, one row per distinct token),
    then a token-keyed join of the two count relations; at web scale the
    vocab side is Zipf-headed, so AQE's skew handling or a salt on the
    top-K tokens applies, and the join can equally run against a
    BROADCAST top-K vocab with a rare-token floor.

    Output: (id, n_tokens, sum_neglp_q6, avg_neglp_q6).
    """
    tok = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    doc_tok = tok.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("dc"))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    total = tok.count()  # driver-side scalar: one long, not a collect loop
    neglp = F.expr(f"CAST(floor(-ln(cw / CAST({total} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)")
    scored = doc_tok.join(vocab.withColumn("neglp_q6", neglp), "w")
    return scored.groupBy(id_col).agg(
        F.sum("dc").alias("n_tokens"),
        F.sum(F.col("dc") * F.col("neglp_q6")).alias("sum_neglp_q6"),
        F.expr(
            "CAST(floor(sum(dc * neglp_q6) / CAST(sum(dc) AS DOUBLE) + 0.5) AS BIGINT)"
        ).alias("avg_neglp_q6"),
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-bigram-LM surprisal per document with Laplace smoothing —
    the second rung of the n-gram quality ladder above
    :func:`unigram_logprob`: unigram surprisal scores WHICH words a doc
    uses, bigram surprisal scores whether it uses them in corpus-typical
    ORDER (word salad and shuffled boilerplate pass the unigram filter
    but not this one).

    Per distinct bigram (w1, w2): P(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V)
    where ctx(w1) = bigram occurrences starting with w1 and V = corpus
    distinct-unigram count; neglp_q6 = floor(-ln P * 1e6 + 0.5) as an
    integer. Per doc: exact integer sums over bigram occurrences —
    summation-order/partitioning/engine independent, the same
    quantize-then-sum discipline as unigram_logprob.

    Shape: adjacent pairs are built INSIDE the row with JVM array ops
    (slice + arrays_zip, no Python, no self-join on position), then one
    shuffle keyed by (doc, bigram) for doc counts, one keyed by bigram
    for the corpus LM (partial aggregation on both), and a bigram-keyed
    join — Zipf skew on the hot bigrams is AQE-handled, and at web scale
    the head of the LM can broadcast with a rare-bigram floor exactly
    like the unigram path.

    Output: (id, n_bigrams, sum_neglp_q6, avg_neglp_q6); docs with fewer
    than 2 tokens emit no row (no bigrams — same convention as the
    oracle).
    """
    toks = F.split(F.col(text_col), " ")
    # adjacent pairs via an index lambda, trimmed of the dangling last
    # element with slice(..., 1, size-1); slice length 0 (single-token
    # doc) yields the empty array, so explode emits nothing
    pairs = F.expr(
        # get() (not [i+1]): the dangling last struct is built before
        # slice trims it, and ANSI mode makes out-of-bounds [] a hard
        # error rather than NULL
        f"slice(transform(split({text_col}, ' '), (x, i) -> "
        f"struct(x AS w1, get(split({text_col}, ' '), i + 1) AS w2)), "
        f"1, greatest(size(split({text_col}, ' ')) - 1, 0))"
    )
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        id_col, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    doc_bg = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("dc"))
    lm = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ctx = lm.groupBy("w1").agg(F.sum("cb").alias("ctx"))
    v_total = (
        docs.select(F.explode(toks).alias("w")).select("w").distinct().count()
    )
    neglp = F.expr(
        f"CAST(floor(-ln((cb + 1) / CAST(ctx + {v_total} AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)"
    )
    scored = doc_bg.join(lm.join(ctx, "w1").withColumn("neglp_q6", neglp), ["w1", "w2"])
    return scored.groupBy(id_col).agg(
        F.sum("dc").alias("n_bigrams"),
        F.sum(F.col("dc") * F.col("neglp_q6")).alias("sum_neglp_q6"),
        F.expr(
            "CAST(floor(sum(dc * neglp_q6) / CAST(sum(dc) AS DOUBLE) + 0.5) AS BIGINT)"
        ).alias("avg_neglp_q6"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining over adjacent token
    pairs (Church & Hanks 1990) — the phrase/multi-word-expression detector
    tokenizer and corpus-analysis pipelines run before vocabulary design.

    PMI(x,y) = ln p(x,y) - ln p(x·) - ln p(·y) over the corpus bigram
    distribution, emitted as pmi_q6 = floor(PMI * 1e6 + 0.5) computed in
    the SUM-OF-LOGS form ``ln n_xy + ln T - ln n_x - ln n_y``: every term
    is the ln of an exact BIGINT count (exact in double to 2^53), so the
    expression never forms the n_xy*T product that would overflow BIGINT
    at web scale, and the identical expression runs on any engine.

    Scale shape: ONE corpus-sized explode+count shuffle builds the bigram
    table; both margins (x as left, y as right) are re-aggregations of
    that skinny table, joined back on its own keys — the corpus is
    touched once. min_count prunes the hapax tail before the joins.

    Returns (w1, w2, n_xy, pmi_q6), one row per surviving bigram.
    """
    pairs = F.expr(
        f"slice(transform(split({text_col}, ' '), (x, i) -> "
        f"struct(x AS w1, get(split({text_col}, ' '), i + 1) AS w2)), "
        f"1, greatest(size(split({text_col}, ' ')) - 1, 0))"
    )
    bg = (
        docs.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        # materialize the skinny bigram table so the margins re-aggregate
        # IT rather than re-exploding the corpus (without this the three
        # consumers each rebuild the explode subtree — measured: 3
        # Generate nodes in the plan; audit A41 pins it at 1)
        .localCheckpoint(eager=True)
    )
    total = bg.agg(F.sum("n_xy")).collect()[0][0]  # one scalar sync
    left = bg.groupBy("w1").agg(F.sum("n_xy").alias("n_x"))
    right = bg.groupBy("w2").agg(F.sum("n_xy").alias("n_y"))
    pmi = F.expr(
        f"CAST(floor((ln(CAST(n_xy AS DOUBLE)) + ln(CAST({total} AS DOUBLE)) "
        "- ln(CAST(n_x AS DOUBLE)) - ln(CAST(n_y AS DOUBLE))) * 1e6 + 0.5) "
        "AS BIGINT)"
    )
    return (
        bg.where(F.col("n_xy") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .select("w1", "w2", "n_xy", pmi.alias("pmi_q6"))
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact multi-word phrase matching via positional postings — the
    inverted-index companion query (inverted_index stores the postings;
    this is the consecutive-position join a phrase query runs over them).

    Plan shape: a substring ``contains`` prefilter on the joined phrase
    runs FIRST (a necessary condition for a token-consecutive match, and
    a scan-level filter Catalyst pushes into the reader), so only
    candidate documents are tokenized; then one posexplode + lead()
    window per document checks true token adjacency — one shuffle keyed
    by doc over the candidate set only. Returns (id, n_matches,
    first_pos) for documents with >= 1 occurrence, positions 0-based.
    """
    if len(phrase) < 2:
        raise ValueError("phrase_search needs a multi-word phrase")
    from pyspark.sql import Window as _W

    cand = docs.where(F.col(text_col).contains(" ".join(phrase)))
    t = cand.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    w = _W.partitionBy(id_col).orderBy("pos")
    cond = F.col("w") == phrase[0]
    for k, term in enumerate(phrase[1:], 1):
        t = t.withColumn(f"_w{k}", F.lead("w", k).over(w))
        cond = cond & (F.col(f"_w{k}") == term)
    return (
        t.where(cond)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("pos").alias("first_pos"),
        )
    )


def index_delta_merge(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Incremental inverted-index maintenance across crawls: instead of
    re-indexing the corpus, the prior index's (term, doc, tf) postings
    are patched with the CHANGE SET between two document snapshots —

    - documents present only in ``old_docs``, or whose text changed:
      their old postings are RETRACTED (anti-join on the doc id);
    - documents present only in ``new_docs``, or whose text changed:
      their current postings are ADDED (tokenize only those docs).

    The output then aggregates to the same (term, doc_freq, total_tf,
    postings) shape as :func:`inverted_index` and must equal a
    from-scratch index of ``new_docs`` EXACTLY — the incremental ==
    batch invariant the oracle pins.

    Scale shape: the change set is detected with one full-outer join of
    (id, content fingerprint) — fingerprints, not texts, move through
    the shuffle — and only changed/new documents are re-tokenized: the
    cost is proportional to the DELTA, not the corpus (at Common-Crawl
    grain, a weekly crawl touches a few percent of urls)."""
    fp = F.sha2(F.col(text_col).cast("binary"), 256)
    o = old_docs.select(F.col(id_col), fp.alias("_ofp"))
    n = new_docs.select(F.col(id_col), fp.alias("_nfp"))
    j = o.join(n, id_col, "full_outer")
    retract_ids = j.where(
        F.col("_nfp").isNull() | ~F.col("_ofp").eqNullSafe(F.col("_nfp"))
    ).select(id_col)
    add_ids = j.where(
        F.col("_ofp").isNull() | ~F.col("_ofp").eqNullSafe(F.col("_nfp"))
    ).select(id_col)

    def _pairs(docs):
        return (
            docs.select(
                F.col(id_col),
                F.explode(F.split(F.col(text_col), " ")).alias("term"),
            )
            .groupBy("term", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
        )

    kept = _pairs(old_docs).join(retract_ids, id_col, "left_anti")
    added = _pairs(new_docs.join(add_ids, id_col, "left_semi"))
    merged = kept.unionByName(added)
    return (
        merged.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.array_join(
                F.sort_array(F.collect_list(F.col(id_col))), ","
            ).alias("postings"),
        )
        .where(F.col("doc_freq") >= min_df)
    )


def langid_confusion(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Declared-vs-detected language confusion matrix — the crawl
    metadata audit every multilingual corpus needs (served Content-
    Language headers and <html lang> attributes are wrong often enough
    that detection, not declaration, decides the training split).

    Joins :func:`language_id` back to the declared label and counts per
    (declared, predicted) cell with the per-cell share of the declared
    language in exact per-mille units (n*1000 div row-count — integer).
    Map-side one pass for detection + one skinny aggregate."""
    pred = language_id(docs, text_col, id_col).select(id_col, "pred_lang")
    j = docs.select(id_col, lang_col).join(pred, id_col)
    per_lang = j.groupBy(lang_col).agg(F.count(F.lit(1)).alias("_n_lang"))
    return (
        j.groupBy(lang_col, "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(F.broadcast(per_lang), lang_col)
        .select(
            lang_col,
            "pred_lang",
            "n",
            F.expr("CAST((n * 1000) DIV _n_lang AS BIGINT)").alias(
                "share_permille"
            ),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage estimators per corpus slice: how saturated is
    the vocabulary, and how much unseen mass remains?

    From the term-frequency spectrum (frequency-of-frequencies): N1 =
    hapax legomena, N2 = dis legomena, k = observed vocabulary, N =
    token count. Emits the two standard estimators — Good-Turing unseen
    probability mass ``N1/N`` and the bias-corrected Chao1 richness
    ``k + N1(N1-1)/(2(N2+1))`` (defined even when N2 = 0) — as half-up
    micro-unit quantities over exact integer inputs; a single division
    each, no ln/exp surface.

    Scale shape: tokenization is a map-side explode, then TWO cascaded
    hash aggregations — (group, term) counts, then the per-group
    spectrum summary — both with map-side partials; output is one row
    per group. The guidance-for-crawling use: a slice whose gt_unseen
    stays high keeps yielding new vocabulary and is worth more crawl
    budget.

    Reference analog: none; SURVEY §2.4 curation suite (Gale & Sampson
    1995 Good-Turing; Chao 1984 richness — public methods).
    """
    terms = docs.select(
        *group_cols,
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    )
    counts = terms.groupBy(*group_cols, "_w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = counts.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("_c").alias("n_tokens"),
        F.sum((F.col("_c") == 1).cast("long")).alias("n1_hapax"),
        F.sum((F.col("_c") == 2).cast("long")).alias("n2_dis"),
    )
    n1 = F.col("n1_hapax").cast("double")
    chao1 = F.col("vocab").cast("double") + n1 * (n1 - 1.0) / (
        2.0 * (F.col("n2_dis").cast("double") + 1.0)
    )
    gt = 1e6 * n1 / F.col("n_tokens").cast("double")
    q6 = lambda x: (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast(  # noqa: E731
        "long"
    )
    return agg.select(
        *group_cols,
        "vocab",
        "n_tokens",
        "n1_hapax",
        "n2_dis",
        q6(gt).alias("gt_unseen_q6"),
        q6(1e6 * chao1).alias("chao1_q6"),
    )


def term_dispersion(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 50,
) -> DataFrame:
    """Per-term burstiness and dispersion over per-document counts —
    the Church-Gale separation of topical terms (bursty: rare docs,
    high in-doc counts) from function words (dispersed: everywhere,
    flat counts).

    For each term: df = documents containing it, S = total count, SS =
    sum of squared per-doc counts, over the N-document slice (absent
    docs contribute zero). Emits exact integers plus two micro-unit
    ratios: ``burst_q6`` = S/df (mean count WHEN present; 1.0 = never
    repeats) and ``fano_q6`` = var/mean over all N docs (the index of
    dispersion; 1.0 = Poisson, >1 = bursty), variance the corrected
    two-pass identity (SS - S^2/N)/(N-1) — integer moments, two
    divisions. Output bounded to the ``top_n`` terms by S (ties on
    term) so the result is a report, not a second corpus.

    Scale shape: one (term, doc) aggregation absorbed by map-side
    partials, one per-term aggregation of integer moments, a global
    top-n rank over |vocab| aggregate rows. N travels as a literal-free
    single-row broadcast.
    """
    pairs = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .groupBy("term", "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_term = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("_c").alias("total_count"),
        F.sum(F.col("_c") * F.col("_c")).alias("sum_sq"),
    )
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("_n")
    )
    w = W.orderBy(F.col("total_count").desc(), F.col("term").asc())
    top = (
        per_term.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_n)
        .crossJoin(F.broadcast(n_docs))
    )
    s = F.col("total_count").cast("double")
    ss = F.col("sum_sq").cast("double")
    n = F.col("_n").cast("double")
    mean = s / n
    var = (ss - s * s / n) / (n - 1.0)
    q6 = lambda x: (F.signum(x) * F.floor(F.abs(x) + F.lit(0.5))).cast(  # noqa: E731
        "long"
    )
    return top.select(
        "term",
        "doc_freq",
        "total_count",
        "sum_sq",
        F.col("_n").alias("n_docs"),
        q6(1e6 * s / F.col("doc_freq").cast("double")).alias("burst_q6"),
        F.when(F.col("_n") > 1, q6(1e6 * var / mean)).alias("fano_q6"),
    )


def heaps_growth(
    docs: DataFrame,
    cutoffs: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary growth curve: distinct vocabulary vs tokens
    seen at corpus-prefix checkpoints — is the corpus vocabulary
    saturating, and how fast?

    ``cutoffs`` are inclusive ``id_col`` upper bounds defining the
    prefixes (explicit values, NOT quantiles: ranking the corpus to cut
    it into equal parts would cost a global sort; id-value checkpoints
    keep the whole operator two map-side-partial aggregations). For
    each cutoff: n_docs and n_tokens from one pass over docs, vocab
    from the per-term first-occurrence ids (min over the term stream) —
    all as CONDITIONAL SUMS inside a single aggregate per side (k
    cutoffs = k sum columns, one row), unpivoted to (cutoff, n_docs,
    n_tokens, vocab) at the end. Exact integers; the Heaps exponent
    fit, needing logs, is left to the client.

    Reference analog: none; SURVEY §2.4 curation suite — the growth
    companion to vocab_coverage's point-in-time estimators.
    """
    cuts = sorted(set(int(c) for c in cutoffs))
    did = F.col(id_col)
    toks = F.size(F.split(F.col(text_col), " "))
    doc_aggs = []
    for c in cuts:
        doc_aggs += [
            F.sum((did <= c).cast("long")).alias(f"_d{c}"),
            F.sum(F.when(did <= c, toks).otherwise(0)).alias(f"_t{c}"),
        ]
    docs_row = docs.agg(*doc_aggs)
    first = (
        docs.select(did.alias("_id"),
                    F.explode(F.split(F.col(text_col), " ")).alias("_w"))
        .groupBy("_w")
        .agg(F.min("_id").alias("_first"))
    )
    vocab_row = first.agg(
        *[
            F.sum((F.col("_first") <= c).cast("long")).alias(f"_v{c}")
            for c in cuts
        ]
    )
    stack = ", ".join(
        f"CAST({c} AS BIGINT), _d{c}, _t{c}, _v{c}" for c in cuts
    )
    return (
        docs_row.crossJoin(vocab_row)
        .selectExpr(
            f"stack({len(cuts)}, {stack}) AS "
            "(cutoff, n_docs, n_tokens, vocab)"
        )
    )


def script_mix(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode-script composition per document: Latin / Han / Cyrillic
    / Arabic / digit character counts, the dominant script, and a
    mixed-script flag — the multilingual-curation signal language_id's
    n-gram heuristic cannot give (it names ONE language; this catches
    the mixed-script spam/boilerplate and the wrongly-routed CJK).

    Pure codegen: one ``regexp_count`` per script class (Java
    ``\\p{script=...}`` properties — the oracle uses RE2's spelling of
    the same classes), integer counts, deterministic dominance order
    (count desc, then the fixed script-name order breaks ties).
    Map-only, zero shuffles.
    """
    t = F.col(text_col)
    scripts = [
        ("latin", r"\p{script=Latin}"),
        ("han", r"\p{script=Han}"),
        ("cyrillic", r"\p{script=Cyrillic}"),
        ("arabic", r"\p{script=Arabic}"),
    ]
    counts = {
        name: F.regexp_count(t, F.lit(pat)) for name, pat in scripts
    }
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    # dominant: max count, ties broken by the fixed list order
    dom = F.lit("none")
    best = F.lit(0)
    for name, _ in reversed(scripts):
        c = counts[name]
        dom = F.when(c >= best, F.lit(name)).otherwise(dom)
        best = F.greatest(best, c)
    n_scripts = sum(
        (counts[n] > 0).cast("int") for n, _ in scripts
    )
    return docs.select(
        F.col(id_col),
        *[counts[n].cast("long").alias(f"n_{n}") for n, _ in scripts],
        n_digit.cast("long").alias("n_digit"),
        F.when(best > 0, dom).otherwise(F.lit("none")).alias("dominant"),
        (n_scripts >= 2).alias("mixed"),
    )


def zipf_slope(
    docs: DataFrame, text_col: str = "text", top_v: int = 1000
) -> DataFrame:
    """Zipf-law exponent of the corpus unigram distribution — the OLS
    slope of ln(frequency) on ln(rank) over the top ``top_v`` types.
    Natural text sits near -1; boilerplate-heavy or template-spam
    corpora flatten the head (slope drifts toward 0) and OCR noise
    steepens the tail, so the scalar is a standing corpus-quality gauge
    (Gopher's repetition rules measure the same pathology per-doc; this
    is the corpus-level view).

    Engine-independent arithmetic: ranks and counts are exact integers,
    each regression coordinate is quantized to q3 (x = floor(ln(rank)
    * 1e3 + 0.5), y likewise on the count — ln of an exact BIGINT, the
    pmi_collocations discipline), the five moments are EXACT LONG sums,
    and slope_q6 quantizes num/den where num = n*Sxy - Sx*Sy and den =
    n*Sxx - Sx^2 are exact longs below 2^53 (top_v <= 10k guarantees
    it), so the single float division is correctly rounded on any
    engine.

    Scale shape: one corpus explode+count shuffle (map-side partials),
    a top_v global head on the skinny type table, one 5-long reduce.
    Returns one row (v, n_tokens, num, den, slope_q6).
    """
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    vc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ranked = vc.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.col("c").desc(), F.col("w")))
        .alias("r"),
    ).filter(F.col("r") <= top_v)
    xq = F.floor(F.log(F.col("r").cast("double")) * 1e3 + F.lit(0.5)).cast(
        "long"
    )
    yq = F.floor(F.log(F.col("c").cast("double")) * 1e3 + F.lit(0.5)).cast(
        "long"
    )
    pts = ranked.select(
        F.col("c").alias("_c"), xq.alias("_x"), yq.alias("_y")
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("_c").cast("long").alias("n_tokens"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
    )
    num = F.col("v") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("v") * F.col("sxx") - F.col("sx") * F.col("sx")
    ratio = num.cast("double") / den.cast("double")
    slope_q6 = F.when(
        den > 0,
        F.signum(ratio).cast("long")
        * F.floor(F.abs(ratio) * 1e6 + F.lit(0.5)),
    ).otherwise(F.lit(0))
    return mom.select(
        "v",
        "n_tokens",
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        slope_q6.cast("long").alias("slope_q6"),
    )
