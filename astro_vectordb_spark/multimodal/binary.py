"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Extended capability (task brief): a 100 TB training pipeline carries
image/audio/video as ``binary`` columns with typed metadata, and runs
decode / feature-extraction as Arrow-batched Pandas stages via
``mapInPandas``.  The image/audio codec libraries are NOT available in
this environment, so the decode kernel is STUBBED (clearly marked
below) behind a deterministic fake — but everything Spark-side is
real and tested: the schema contract, the mapInPandas batch iteration,
the output shapes, and the partitioning story.

Scale notes: blobs never pass through a shuffle here — decode is a
narrow mapInPandas over the scan, and downstream ops consume the small
derived features, not the bytes.  ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for fat rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = (
    "blob BINARY, media_type STRING, n_bytes BIGINT, content_sha STRING"
)

FEATURE_DIM = 16

# Set True to make decode_features raise on real use; the deterministic
# fake below stands in for a codec in this container.
STRICT_STUB = False


def attach_blob(
    df: DataFrame, payload_col: str = "text", media_type: str = "application/text"
) -> DataFrame:
    """Turn a payload column into the blob+metadata column family.

    In production the blob arrives from the source (tar/warc/parquet
    binary column); here we derive it so the downstream plumbing is
    exercised with real bytes.
    """
    blob = F.encode(F.col(payload_col), "utf-8")
    return df.select(
        "*",
        blob.alias("blob"),
        F.lit(media_type).alias("media_type"),
        F.length(blob).cast("long").alias("n_bytes"),
        F.sha2(blob, 256).alias("content_sha"),
    )


def _decode_kernel(blob: bytes) -> list[float]:
    """STUB — stands in for image/audio decode + feature extraction.

    A real deployment replaces this body with e.g. PIL/torchvision
    decode -> embedding.  The fake is deterministic: FEATURE_DIM floats
    derived from the content hash, so tests can assert exact values.
    """
    if STRICT_STUB:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "swap _decode_kernel for a real decoder"
        )
    h = hashlib.sha256(blob or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_features(
    df: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched decode: (id, blob) -> (id, features ARRAY<DOUBLE>).

    mapInPandas keeps the blob out of any shuffle and processes
    Arrow-sized batches; the iterator contract means constant memory
    regardless of partition size.
    """
    out_schema = f"{id_col} long, features array<double>"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _decode_kernel(bytes(b)) for b in pdf[blob_col]
                    ],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(_decode, schema=out_schema)


def resize_blob(
    df: DataFrame,
    target_bytes: int = 256,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Image-resize analogue: downsample each blob to a fixed byte
    budget by striding (deterministic).  In production the kernel body
    is a real resize (PIL/opencv); the Spark contract — fixed-size
    output per row, narrow mapInPandas, no shuffle — is what is tested.
    """
    out_schema = f"{id_col} long, resized binary, orig_bytes bigint"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, sizes = [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row[blob_col])
                stride = max(1, len(blob) // target_bytes)
                ids.append(row[id_col])
                blobs.append(blob[::stride][:target_bytes])
                sizes.append(len(blob))
            yield pd.DataFrame(
                {id_col: ids, "resized": blobs, "orig_bytes": sizes}
            )

    return df.select(id_col, blob_col).mapInPandas(_resize, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    blob_col: str = "blob",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video-frame-sampling analogue: emit every Nth chunk of the blob
    as a "frame" row (id, frame_idx, frame BINARY).  Demonstrates the
    one-to-many mapInPandas shape a real frame sampler uses."""
    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row[blob_col])
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    ids.append(row[id_col])
                    idxs.append(i)
                    frames.append(blob[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(_sample, schema=out_schema)
