from astro_vectordb_spark.sources.vault import (
    compact,
    compact_files,
    load_bucketed,
    load_embeddings,
    load_ivf_index,
    open_or_create,
    pq_compact_index,
    pq_remove_from_index,
    rebuild_index,
    save_bucketed,
    save_embeddings,
    save_ivf_index,
)

__all__ = [
    "compact",
    "compact_files",
    "load_bucketed",
    "load_embeddings",
    "load_ivf_index",
    "open_or_create",
    "pq_compact_index",
    "pq_remove_from_index",
    "rebuild_index",
    "save_bucketed",
    "save_embeddings",
    "save_ivf_index",
]
