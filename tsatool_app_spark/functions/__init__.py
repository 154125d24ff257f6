from tsatool_app_spark.functions.text import (
    text_stats,
    lang_id_heuristic,
    quality_score,
    doc_fingerprint,
)
from tsatool_app_spark.functions.dedup import (
    exact_dedup_groups,
    minhash_near_dup_pairs,
    minhash_oversize_buckets,
    simhash_signatures,
    simhash_near_dup_pairs,
    simhash_bucket_audit,
    simhash_pairs_dedup_first,
    ngram_jaccard_pairs,
    near_dup_pairs_dedup_first,
)
from tsatool_app_spark.functions.sampling import (
    deterministic_sample,
    weighted_sample_by_group,
    token_budget_mixture,
)
from tsatool_app_spark.functions.similarity import (
    quantized_dot,
    cosine_similarity_col,
    brute_force_topk,
    lsh_ann_topk,
)

__all__ = [
    "text_stats",
    "lang_id_heuristic",
    "quality_score",
    "doc_fingerprint",
    "exact_dedup_groups",
    "minhash_near_dup_pairs",
    "minhash_oversize_buckets",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "simhash_bucket_audit",
    "simhash_pairs_dedup_first",
    "ngram_jaccard_pairs",
    "near_dup_pairs_dedup_first",
    "deterministic_sample",
    "weighted_sample_by_group",
    "token_budget_mixture",
    "quantized_dot",
    "cosine_similarity_col",
    "brute_force_topk",
    "lsh_ann_topk",
]
