from astro_vectordb_spark.sources.vault import (
    compact,
    compact_files,
    load_bucketed,
    load_embeddings,
    load_ivf_index,
    open_or_create,
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
    "rebuild_index",
    "save_bucketed",
    "save_embeddings",
    "save_ivf_index",
]
