from astro_vectordb_spark.operators.topk import (
    batch_topk,
    rank_topk_per_query,
    score_against,
    similarity_join,
    topk_search,
)
from astro_vectordb_spark.operators.crud import (
    live,
    point_lookup,
    sync_merge,
    tombstone_delete,
    upsert_latest,
    validate_embeddings,
)
from astro_vectordb_spark.operators.ann import (
    brp_lsh_topk,
    ivf_batch_search,
    ivf_build,
    ivf_build_sampled,
    ivf_cell_stats,
    ivf_search,
    ivf_search_exact,
    rp_build,
)
from astro_vectordb_spark.operators.dedup import (
    dedup_keep_representatives,
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql_safe,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_pairs_sql_safe,
)
from astro_vectordb_spark.operators.text_analysis import (
    doc_fingerprints,
    language_id,
    quality_scores,
    text_stats,
)
from astro_vectordb_spark.operators.classify import knn_classify
from astro_vectordb_spark.operators.quantize import (
    batch_topk_quantized,
    quantize_embeddings,
    topk_search_quantized,
)
from astro_vectordb_spark.operators.sampling import (
    deterministic_sample,
    deterministic_split,
    hash_bucket,
    stratified_sample,
)
from astro_vectordb_spark.operators.events import (
    event_type_rates,
    session_stats,
    sessionize,
    windowed_counts,
)
from astro_vectordb_spark.operators.relational import (
    customer_rank_in_nation,
    order_priority_counts,
    pricing_summary,
    revenue_topn,
)
from astro_vectordb_spark.operators.keyword import (
    bm25_score_all,
    bm25_term_stats,
    bm25_topk,
    bm25_topk_indexed,
)
from astro_vectordb_spark.operators.multivector import (
    chunk_documents,
    maxsim_score_all,
    maxsim_topk,
)
from astro_vectordb_spark.operators.rerank import mmr_rerank, rrf_fuse, score_fusion
from astro_vectordb_spark.operators.topk import filtered_topk
from astro_vectordb_spark.operators.curation import (
    decontaminate,
    gopher_filter,
    pack_documents,
    repetition_stats,
)
from astro_vectordb_spark.operators.pq import (
    PQModel,
    ivf_pq_build,
    ivf_pq_topk,
    pq_encode,
    pq_topk,
    pq_train,
)

__all__ = [
    "batch_topk",
    "bm25_score_all",
    "bm25_topk",
    "chunk_documents",
    "filtered_topk",
    "maxsim_score_all",
    "maxsim_topk",
    "mmr_rerank",
    "rrf_fuse",
    "score_fusion",
    "bm25_term_stats",
    "bm25_topk_indexed",
    "batch_topk_quantized",
    "brp_lsh_topk",
    "customer_rank_in_nation",
    "decontaminate",
    "dedup_keep_representatives",
    "deterministic_sample",
    "deterministic_split",
    "hash_bucket",
    "ivf_pq_build",
    "ivf_pq_topk",
    "doc_fingerprints",
    "embedding_near_dups",
    "event_type_rates",
    "exact_dedup",
    "ivf_batch_search",
    "ivf_build",
    "ivf_build_sampled",
    "ivf_cell_stats",
    "ivf_search",
    "ivf_search_exact",
    "gopher_filter",
    "knn_classify",
    "language_id",
    "live",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_sql_safe",
    "ngram_jaccard_pairs",
    "order_priority_counts",
    "pack_documents",
    "point_lookup",
    "PQModel",
    "pq_encode",
    "pq_topk",
    "pq_train",
    "pricing_summary",
    "quality_scores",
    "quantize_embeddings",
    "rank_topk_per_query",
    "repetition_stats",
    "revenue_topn",
    "rp_build",
    "score_against",
    "session_stats",
    "sessionize",
    "simhash_pairs",
    "simhash_pairs_sql_safe",
    "similarity_join",
    "stratified_sample",
    "sync_merge",
    "text_stats",
    "tombstone_delete",
    "topk_search",
    "topk_search_quantized",
    "upsert_latest",
    "validate_embeddings",
    "windowed_counts",
]
