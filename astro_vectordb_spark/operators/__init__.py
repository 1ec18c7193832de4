from astro_vectordb_spark.operators.topk import (
    batch_topk,
    score_against,
    similarity_join,
    topk_search,
)
from astro_vectordb_spark.operators.crud import (
    point_lookup,
    sync_merge,
    tombstone_delete,
    upsert_latest,
)

__all__ = [
    "batch_topk",
    "point_lookup",
    "score_against",
    "similarity_join",
    "sync_merge",
    "tombstone_delete",
    "topk_search",
    "upsert_latest",
]
