"""Multimodal column plumbing: opaque binary blobs + typed metadata.

Extended capability (task brief): a 100 TB training pipeline carries
image/audio/video as ``binary`` columns with typed metadata, and runs
decode / feature-extraction as Arrow-batched Pandas stages via
``mapInPandas``.  The image codec path is REAL when Pillow is
importable (detected once at import, see ``HAS_PIL``); in this
container Pillow is absent, so the deterministic hash fake stands in —
but everything Spark-side is real and tested either way: the schema
contract, the mapInPandas batch iteration, the output shapes, and the
partitioning story.

Scale notes: blobs never pass through a shuffle here — decode is a
narrow mapInPandas over the scan, and downstream ops consume the small
derived features, not the bytes.  ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds batch memory for fat rows.  Kernels
iterate column arrays with ``zip`` — ``pd.DataFrame.iterrows`` builds
a Series per row and is ~10x slower per row of overhead, which matters
once the per-row work is a cheap slice rather than a full decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # codec availability decided once, at import
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - this container has no Pillow
    _PILImage = None
    HAS_PIL = False

BLOB_META_SCHEMA = (
    "blob BINARY, media_type STRING, n_bytes BIGINT, content_sha STRING"
)

FEATURE_DIM = 16

# Set True to make decode_features raise on real use instead of using
# the deterministic fake when no codec applies.
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
    """Fallback feature kernel — stands in for a media codec.

    Deterministic: FEATURE_DIM floats derived from the content hash,
    so tests (and the DuckDB oracle) can assert exact values.
    """
    if STRICT_STUB:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "swap _decode_kernel for a real decoder"
        )
    h = hashlib.sha256(blob or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def _decode_kernel_image(blob: bytes) -> list[float]:
    """REAL image decode path (used when Pillow is importable and the
    row's media type is image/*): decode, grayscale, resize to a 4x4
    thumbnail, emit the FEATURE_DIM pixel intensities in [0, 1].  Same
    schema and determinism contract as the fallback kernel."""
    import io

    img = _PILImage.open(io.BytesIO(blob)).convert("L").resize((4, 4))
    return [px / 255.0 for px in img.getdata()]


def decode_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    media_type_col: str | None = None,
) -> DataFrame:
    """Arrow-batched decode: (id, blob) -> (id, features ARRAY<DOUBLE>).

    mapInPandas keeps the blob out of any shuffle and processes
    Arrow-sized batches; the iterator contract means constant memory
    regardless of partition size.

    With ``media_type_col`` set AND Pillow importable, ``image/*`` rows
    go through the real decode kernel; everything else (and every row
    when Pillow is absent) uses the deterministic fallback, so the
    output schema and the non-image behavior are identical with or
    without the codec installed.
    """
    out_schema = f"{id_col} long, features array<double>"
    use_pil = HAS_PIL and media_type_col is not None
    in_cols = [id_col, blob_col] + ([media_type_col] if use_pil else [])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_pil:
                feats = [
                    _decode_kernel_image(bytes(b))
                    if isinstance(mt, str) and mt.startswith("image/")
                    else _decode_kernel(bytes(b))
                    for b, mt in zip(pdf[blob_col], pdf[media_type_col])
                ]
            else:
                feats = [_decode_kernel(bytes(b)) for b in pdf[blob_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(*in_cols).mapInPandas(_decode, schema=out_schema)


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
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(b)
                stride = max(1, len(blob) // target_bytes)
                ids.append(rid)
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
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                blob = bytes(b)
                for i in range(min(max_frames, max(1, len(blob) // every_n_bytes))):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(blob[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(_sample, schema=out_schema)
