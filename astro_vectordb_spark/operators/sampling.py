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
    # round, not truncate: frac=0.35 at 1000 buckets must cut at 350,
    # not 349 (float product 349.99... would silently under-sample and
    # diverge from any oracle that computes the cutoff exactly)
    test_cut = int(round(test_frac * buckets))
    val_cut = test_cut + int(round(val_frac * buckets))
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
    return df.filter(
        hash_bucket(F.col(id_col), buckets) < int(round(frac * buckets))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fracs: dict[object, float],
    default_frac: float = 0.0,
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sample — the training-data rebalancing
    primitive (e.g. keep 100% of a rare language, 5% of a dominant
    one).  A row is kept iff ``bucket(id) < fracs[stratum] * buckets``;
    strata absent from ``fracs`` use ``default_frac`` (0 = drop).

    Same properties as ``deterministic_sample``, per stratum: stable
    under re-runs/backfills/subsetting (a row's fate depends only on
    its own key and stratum), idempotent (re-sampling a sample with the
    same fracs keeps everything), and a single codegen'd predicate on
    the scan — no shuffle, no per-stratum passes, SQL-expressible for
    the oracle.  ``fracs`` sizes the expression (one CASE arm per
    stratum), so it is driver-bounded metadata like every other knob —
    not data."""
    cut = F.lit(int(round(default_frac * buckets)))
    for value, frac in fracs.items():
        cut = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(int(round(frac * buckets))),
        ).otherwise(cut)
    return df.filter(hash_bucket(F.col(id_col), buckets) < cut)
