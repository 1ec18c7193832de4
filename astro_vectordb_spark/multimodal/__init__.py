from astro_vectordb_spark.multimodal.binary import (
    BLOB_META_SCHEMA,
    attach_blob,
    decode_features,
    frame_sample,
)

__all__ = ["BLOB_META_SCHEMA", "attach_blob", "decode_features", "frame_sample"]
