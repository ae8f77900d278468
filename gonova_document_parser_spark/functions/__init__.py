from .textstats import (
    doc_fingerprint,
    lang_id_expr,
    quality_features,
    token_count_expr,
    tokens_expr,
)
from .dedup import (
    exact_dup_groups,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
)
from .similarity import brute_force_topk, cosine_expr, lsh_bucket_candidates

__all__ = [
    "tokens_expr",
    "token_count_expr",
    "quality_features",
    "lang_id_expr",
    "doc_fingerprint",
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash64",
    "cosine_expr",
    "brute_force_topk",
    "lsh_bucket_candidates",
]
