"""LLM-data-pipeline operators: dedup, similarity, graph, text,
multimodal, joins, skew mitigation.  Re-exported here so users reach the
whole plane from one import."""

from linkedin_iceberg_spark.operators.dedup import (
    dedup_embedding,
    dedup_exact,
    minhash_lsh_candidates,
    minhash_lsh_verified,
    simhash_pairs,
)
from linkedin_iceberg_spark.operators.graph import connected_components
from linkedin_iceberg_spark.operators.joins import asof_join
from linkedin_iceberg_spark.operators.sampling import (
    sample_fraction,
    sample_stratified,
)
from linkedin_iceberg_spark.operators.similarity import (
    ann_lsh_candidates,
    dequantize_int8,
    kmeans_fit,
    knn_join,
    quantize_int8,
    cosine_pairs,
    cosine_topk,
    ivf_assign,
    ivf_assign_join,
    ivf_index_table,
    ivf_topk,
    ivf_topk_from_table,
)
from linkedin_iceberg_spark.operators.skew import salted_agg, salted_join
from linkedin_iceberg_spark.operators.text import (
    bpe_pretokenize,
    chunk_documents,
    decontaminate,
    pack_sequences,
    fingerprint,
    lang_id,
    pii_scrub,
    quality_score,
    repetition_signals,
    split_assign,
    token_count,
)

__all__ = [
    "dedup_exact", "dedup_embedding", "minhash_lsh_candidates",
    "minhash_lsh_verified", "simhash_pairs", "connected_components",
    "asof_join", "ann_lsh_candidates", "cosine_pairs", "cosine_topk",
    "ivf_assign", "ivf_assign_join", "ivf_index_table", "ivf_topk",
    "ivf_topk_from_table", "kmeans_fit", "knn_join", "quantize_int8",
    "dequantize_int8", "chunk_documents", "pack_sequences",
    "salted_agg", "salted_join",
    "sample_fraction", "sample_stratified", "bpe_pretokenize",
    "decontaminate", "fingerprint", "lang_id", "pii_scrub",
    "quality_score", "repetition_signals", "split_assign", "token_count",
]
