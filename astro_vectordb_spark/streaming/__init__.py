from astro_vectordb_spark.streaming.upsert import (
    foreach_batch_upsert,
    stream_sync_merge,
)

__all__ = ["foreach_batch_upsert", "stream_sync_merge"]
