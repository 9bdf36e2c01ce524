"""Web-corpus operators: dedup, text analysis, similarity, multimodal."""

from .crawldiff import (  # noqa: F401
    crawl_churn,
    crawl_delta,
    revisit_schedule,
    survival_risk_table,
    trending_terms,
)
from .dedup import (  # noqa: F401
    dedup_exact,
    dedup_exact_normalized,
    line_dedup_global,
    duplicate_spans,
    cdc_boundaries,
    cdc_chunk_table,
    exact_duplicates,
    jaccard_join,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from .bpe import (  # noqa: F401
    bpe_encode,
    bpe_train,
    word_frequencies,
)
from .embpca import embedding_pca, pca_components  # noqa: F401
from .fuzzyjoin import fuzzy_pairs  # noqa: F401
from .quality import (  # noqa: F401
    blockword_scan,
    c4_clean,
    gopher_rules,
    perplexity_buckets,
    readability_scores,
    semdedup,
    zlib_ratio,
)
from .components import (  # noqa: F401
    connected_components,
    dedup_by_cluster,
)
from .textstats import (  # noqa: F401
    doc_fingerprint,
    index_delta_merge,
    inverted_index,
    langid_confusion,
    bigram_logprob,
    language_id,
    phrase_search,
    pmi_collocations,
    repetition_stats,
    text_quality,
    heaps_growth,
    script_mix,
    term_dispersion,
    token_counts,
    token_entropy,
    vocab_coverage,
    top_terms,
    unigram_logprob,
    vocab_oov,
    winnow_fingerprints,
)
from .linkgraph import (  # noqa: F401
    anchor_terms,
    core_numbers,
    covisitation,
    domain_edges,
    extract_links,
    hits,
    label_propagation,
    link_prediction,
    modularity,
    pagerank,
    triangle_counts,
    trustrank,
)
from .abtest import ab_test_proportions, preference_winrate  # noqa: F401
from .sharding import rendezvous_assign, rendezvous_moves  # noqa: F401
from .calibrate import isotonic_fit, quantile_normalize  # noqa: F401
from .keywords import rake_keywords  # noqa: F401
from .rangejoin import bucketed_interval_join, bucketed_range_join  # noqa: F401
from .concentration import concentration_metrics  # noqa: F401
from .raneval import rank_biased_overlap, ranking_metrics  # noqa: F401
from .skewjoin import salted_join  # noqa: F401
from .bitmapindex import bitmap_combine, bitmap_decode, build_bitmap  # noqa: F401
from .redirects import resolve_chains  # noqa: F401
from .trigram import trigram_postings, trigram_search  # noqa: F401
from .contamination import contamination_report  # noqa: F401
from .scd import asof_dimension_join, scd2_history  # noqa: F401
from .frontier import frontier_schedule  # noqa: F401
from .sampling import (  # noqa: F401
    balance_sample,
    bucket_sample,
    cap_per_group,
    curriculum_order,
    deterministic_sample,
    dsir_importance,
    hash_split,
    ht_estimate,
    temporal_split,
    weighted_sample,
    stratified_sample,
)
from .heavyhitters import heavy_hitters  # noqa: F401
from .htmltext import html_metadata, html_tables, html_to_text  # noqa: F401
from .packing import pack_sequences  # noqa: F401
from .profile import (  # noqa: F401
    data_contract_audit,
    profile_drift,
    profile_table,
    shuffle_skew_report,
)
from .quantize import ann_pq_adc, pq_encode, train_pq_codebooks  # noqa: F401
from .redact import k_anonymity_audit, pii_counts, redact_pii  # noqa: F401
from .robots import parse_robots, robots_annotate, robots_filter  # noqa: F401
from .boilerplate import boilerplate_lines, remove_boilerplate  # noqa: F401
from .mirrors import mirror_hosts  # noqa: F401
from .urltools import (  # noqa: F401
    blocklist_annotate,
    blocklist_filter,
    canonicalize_urls,
    host_suffixes,
    parse_urls,
    path_prefix_rollup,
    registrable_domain,
    url_templates,
)
from .sketch import (  # noqa: F401
    digest,
    digest_quantiles,
    merge_digests,
    quantile_digest,
)
from .similarity import (  # noqa: F401
    ann_ivf,
    ann_lsh,
    kmeans_assign,
    knn_bruteforce,
    rrf_fuse,
)
from .multimodal import (  # noqa: F401
    attach_media_metadata,
    bmp_stats,
    extract_features,
    make_bmp,
    make_png,
    make_wav_pcm,
    png_stats,
    resize_media,
    sample_frames,
    wav_pcm_stats,
)
from .bloom import bloom_dedup, bloom_semijoin  # noqa: F401
from .sitemaps import crawl_coverage, parse_sitemap  # noqa: F401
from .multimodal import sniff_content_type  # noqa: F401
from .cdx import latest_captures, parse_cdxj, surt_key  # noqa: F401
from .apportion import apportion, maxmin_fair  # noqa: F401
from .ratelimit import token_bucket  # noqa: F401
from .httpcache import cache_policy  # noqa: F401
from .weblog import parse_clf  # noqa: F401
from .sampling import token_budget_select  # noqa: F401
from .profile import join_size_estimate  # noqa: F401
from .sampling import range_splits  # noqa: F401
from .linkgraph import link_reciprocity  # noqa: F401
from .quantize import ann_sq8, sq8_encode, sq8_train  # noqa: F401
from .profile import encoding_advisor  # noqa: F401
from .linkgraph import degree_assortativity  # noqa: F401
from .textstats import zipf_slope  # noqa: F401
from .linkgraph import bfs_hops  # noqa: F401
from .quality import hashed_linear_score  # noqa: F401
from .packing import chunk_documents  # noqa: F401
from .sampling import neyman_allocation  # noqa: F401
from .robots import crawl_delays  # noqa: F401
from .sketch import ams_f2  # noqa: F401
