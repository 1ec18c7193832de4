"""Event-stream operators (tumbling windows, sessionization, rates).

The reference has no streaming surface (SURVEY.md §2.6) — these are
part of the extended large-scale pipeline capability set, written so
the SAME code runs on a batch DataFrame and a Structured Streaming
frame (add ``withWatermark`` upstream for late data; the aggregations
below are watermark-compatible: group keys include the event-time
window).

Scale notes: tumbling-window aggs are one map-side-combining shuffle on
(window, key); sessionization uses a window function partitioned by
user_id — per-user data is tiny, the partition count is |users|, no
skew beyond the busiest user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (default) or sliding (``slide < duration``) window
    event counts + value sums per key.  Sliding windows assign each row
    to duration/slide windows — shuffle volume multiplies accordingly."""
    w = (
        F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    )
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign session ids: a new session starts after a gap of more
    than ``gap_minutes`` of inactivity (classic lag + cumulative-sum).

    Returns input + ``session_id`` (<user_id>#<n>, 0-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col("event_id").asc()
    )
    # unix_timestamp, not cast("long"): works on both TIMESTAMP and
    # TIMESTAMP_NTZ (NTZ forbids the long cast), same epoch seconds
    gap = F.unix_timestamp(F.col(ts_col)) - F.lag(
        F.unix_timestamp(F.col(ts_col))
    ).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess_n = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.lit(1)
    return events.withColumn(
        "session_id",
        F.concat_ws("#", F.col(user_col).cast("string"), sess_n.cast("string")),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-session summary: span, event count, value sum."""
    s = sessionize(events, gap_minutes, ts_col, user_col)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.unix_timestamp(F.col(ts_col)))
                - F.min(F.unix_timestamp(F.col(ts_col)))
            ).alias("span_sec"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def event_type_rates(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Share of each event type over the whole frame (map-side agg +
    one tiny broadcast of the total)."""
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"),
        )
    )
