from graphblast_spark.functions.text import (
    add_fingerprint,
    add_lang_id,
    add_quality,
    add_token_count,
)
from graphblast_spark.functions.dedup import (
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash64,
)
from graphblast_spark.functions.similarity import brute_force_topk, ivf_topk

__all__ = [
    "add_fingerprint", "add_lang_id", "add_quality", "add_token_count",
    "exact_duplicate_groups", "lsh_candidate_pairs", "minhash_signature",
    "ngram_jaccard_pairs", "simhash64",
    "brute_force_topk", "ivf_topk",
]
