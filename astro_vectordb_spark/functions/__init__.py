from astro_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    euclidean_similarity,
    l2_norm,
    similarity,
    threshold_from_strength,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "euclidean_distance",
    "euclidean_similarity",
    "l2_norm",
    "similarity",
    "threshold_from_strength",
]
