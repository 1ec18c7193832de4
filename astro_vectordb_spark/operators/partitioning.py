"""Scan-parallelism guard for unsplittable inputs.

A parquet file with a single row group (or one huge gzip, or any
source whose split count is below the cluster's parallelism) scans as
ONE task, so every byte of per-row compute above it — tokenization,
higher-order array folds, Arrow/pandas kernels — serializes on one
core while the rest of the cluster idles.  The optimization guide's
remedy for input skew is "fix at the source if you can; otherwise
repartition immediately after the read" (§2.5); this helper makes
that remedy CONDITIONAL so it is a no-op exactly when the input
already parallelizes (the normal 100 TB layout of many splittable
files):

- scan partitions >= the session's default parallelism -> return the
  frame untouched (no exchange appears in the plan);
- below it -> one deterministic hash repartition on ``id_col`` (a
  unique key spreads evenly, survives task retries deterministically,
  and skips round-robin's sort-before-repartition pass), or a
  round-robin repartition when no id column is given.

The partition-count probe runs no job (plan-to-RDD translation only)
and is memoized per logical path so repeated reads of the same table
decide once per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (path-or-key, parallelism) -> scan partition count.
#
# STATIC-INPUT ASSUMPTION (documented per round-16 ADVICE): the memo
# never invalidates, so it is only correct for tables whose file/row-
# group layout is fixed for the session — the driver-provided testdata
# parquets the entry module keys it on.  A table REWRITTEN in-session
# at the same path would keep the stale count and could mis-decide the
# repartition (a perf-only risk, never correctness: both branches
# compute the same rows).  Callers with mutable tables should pass
# cache_key=None (probe every call) or key on a layout fingerprint.
_SCAN_PARTS_CACHE: dict[tuple[str, int], int] = {}


def scan_partitions(df: DataFrame, cache_key: str | None = None) -> int:
    """Physical partition count of ``df``'s scan (no job runs)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if cache_key is not None:
        hit = _SCAN_PARTS_CACHE.get((cache_key, par))
        if hit is not None:
            return hit
    n = df.rdd.getNumPartitions()
    if cache_key is not None:
        _SCAN_PARTS_CACHE[(cache_key, par)] = n
    return n


def ensure_scan_parallelism(
    df: DataFrame,
    id_col: str | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism IF
    its scan under-parallelizes (see module docstring); no-op — and no
    plan change — otherwise."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if scan_partitions(df, cache_key=cache_key) >= target:
        return df
    if id_col is not None:
        return df.repartition(target, F.col(id_col))
    return df.repartition(target)
