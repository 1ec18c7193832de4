"""Deterministic sampling / splitting for training-data pipelines.

Random `df.sample()` is non-reproducible across runs and engines; the
pipeline-grade alternative is hash-bucket splitting: a row's split is a
pure function of its key, so splits are stable under re-runs, joins,
backfills, and engine changes (and SQL-expressible for the oracle:
DuckDB computes the same md5-prefix bucket).

bucket(id) = int(hex_prefix_8(md5(id))) mod buckets
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1000


def hash_bucket(key: Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key string."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    buckets: int = DEFAULT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Append 'train' / 'val' / 'test' assignment by hash bucket."""
    b = hash_bucket(F.col(id_col), buckets)
    test_cut = int(test_frac * buckets)
    val_cut = test_cut + int(val_frac * buckets)
    split = (
        F.when(b < test_cut, F.lit("test"))
        .when(b < val_cut, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def deterministic_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    frac: float = 0.1,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Stable ~frac sample: keep rows whose bucket < frac*buckets."""
    return df.filter(hash_bucket(F.col(id_col), buckets) < int(frac * buckets))
