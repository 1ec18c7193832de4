"""Table profiling: per-column statistics for pipeline data QA.

One pass per table (all columns' aggregates in a single map-side-
combining aggregation — profiling 100 TB costs one scan, not one scan
per column).  Exact interpolated percentiles via ``F.percentile`` so
the DuckDB oracle (``quantile_cont``) reproduces values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAT_DECIMALS = 6


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: one row per column with count / nulls /
    min / max / mean / p50 / p90."""
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
                F.round(F.percentile(F.col(c), F.lit(0.5)), STAT_DECIMALS).alias("p50"),
                F.round(F.percentile(F.col(c), F.lit(0.9)), STAT_DECIMALS).alias("p90"),
            ).alias(f"_s_{c}")
        )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(F.array(*[F.col(f"_s_{c}") for c in cols])).alias("s")
    )
    return stacked.select("s.*")
