from astro_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    euclidean_similarity,
    l2_norm,
    similarity,
    threshold_from_strength,
)
from astro_vectordb_spark.functions.embed import embed_text, hash_embedder
from astro_vectordb_spark.functions.text import (
    avg_token_len,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    regex_token_count,
    rolling_hash,
    sorted_token_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
from astro_vectordb_spark.functions.vector_np import (
    make_pair_score_udf,
    make_score_udf,
)

__all__ = [
    "avg_token_len",
    "bpe_ish_token_count",
    "cosine_similarity",
    "dot_product",
    "embed_text",
    "euclidean_distance",
    "euclidean_similarity",
    "fingerprint",
    "hash_embedder",
    "l2_norm",
    "lang_id",
    "make_pair_score_udf",
    "make_score_udf",
    "quality_score",
    "regex_token_count",
    "rolling_hash",
    "similarity",
    "sorted_token_fingerprint",
    "stopword_ratio",
    "threshold_from_strength",
    "token_count",
    "tokens",
    "word_shingles",
]
