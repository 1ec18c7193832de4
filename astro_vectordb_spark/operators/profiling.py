"""Table profiling: per-column statistics for pipeline data QA.

One pass per table (all columns' aggregates in a single map-side-
combining aggregation — profiling 100 TB costs one scan, not one scan
per column).

Percentile modes:
- ``approx`` (default): ``approx_percentile`` (Greenwald-Khanna sketch)
  with a configurable ``accuracy``; the aggregation buffer is bounded
  by O(accuracy) PER COLUMN regardless of row count — the only shape
  that survives 100 TB.  Rank error is at most 1/accuracy of the rows
  (accuracy=10000 -> within 0.01% of the true rank).
- ``exact``: ``F.percentile`` (interpolated), bit-reproducible by the
  DuckDB oracle's ``quantile_cont`` — but it buffers EVERY value of
  every profiled column in one aggregation buffer, so it is for
  oracle-checked small-sf runs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAT_DECIMALS = 6


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    percentiles: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Long-format profile: one row per column with count / nulls /
    min / max / mean / p50 / p90.

    ``percentiles='approx'`` (default, scale-safe sketch; rank error
    <= rows/accuracy) or ``'exact'`` (full-buffer interpolated — small
    tables / oracle parity only)."""
    if percentiles == "exact":
        def pct(c, p):
            return F.percentile(F.col(c), F.lit(p))
    elif percentiles == "approx":
        def pct(c, p):
            return F.approx_percentile(
                F.col(c).cast("double"), F.lit(p), F.lit(accuracy)
            )
    else:
        raise ValueError(f"percentiles must be 'approx' or 'exact', got {percentiles!r}")
    aggs = []
    for c in cols:
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.col(c)).alias("n"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_null"),
                F.round(F.min(F.col(c)).cast("double"), STAT_DECIMALS).alias("min_v"),
                F.round(F.max(F.col(c)).cast("double"), STAT_DECIMALS).alias("max_v"),
                F.round(F.avg(F.col(c)), STAT_DECIMALS).alias("mean_v"),
                F.round(pct(c, 0.5).cast("double"), STAT_DECIMALS).alias("p50"),
                F.round(pct(c, 0.9).cast("double"), STAT_DECIMALS).alias("p90"),
            ).alias(f"_s_{c}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(F.array(*[F.col(f"_s_{c}") for c in cols])).alias("s")
    )
    return stacked.select("s.*")
