from graphblast_spark.functions.text import (
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_repetition_signals,
    add_token_count,
    top_ngram_char_frac,
)
from graphblast_spark.functions.dedup import (
    duplicate_spans,
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    paragraph_spans,
    simhash64,
    simhash_hamming_clusters,
    simhash_hamming_pairs,
    span_dedup_stats,
    token_window_spans,
)
from graphblast_spark.functions.sampling import (
    hash_split,
    ngram_contamination,
    stratified_sample,
)
from graphblast_spark.functions.similarity import brute_force_topk, ivf_topk
from graphblast_spark.functions.pipeline import clean_corpus, retention_stats
from graphblast_spark.functions.packing import pack_sequences, packing_stats
from graphblast_spark.functions.urls import (
    domain_edges,
    normalize_url,
    url_host,
    url_site,
)

__all__ = [
    "add_fingerprint", "add_lang_id", "add_quality", "add_token_count",
    "add_repetition_signals", "top_ngram_char_frac",
    "exact_duplicate_groups", "lsh_candidate_pairs", "minhash_signature",
    "ngram_jaccard_pairs", "simhash64", "simhash_hamming_pairs", "simhash_hamming_clusters",
    "paragraph_spans", "token_window_spans", "duplicate_spans", "span_dedup_stats",
    "hash_split", "ngram_contamination", "stratified_sample",
    "brute_force_topk", "ivf_topk",
    "normalize_url", "url_host", "url_site", "domain_edges",
    "clean_corpus", "retention_stats",
    "pack_sequences", "packing_stats",
]
