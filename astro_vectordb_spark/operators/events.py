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

import warnings

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("value",),
    tiebreak_col: str = "event_id",
    tolerance_seconds: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: attach to every left row the LATEST right
    row with the same key and ``right.ts <= left.ts`` (inclusive) —
    the temporal-alignment operator Spark's join family lacks (the
    task brief's canonical example).

    Spark-first shape: tag both sides, union, and run ONE window pass
    per key ordered by (ts, side, tiebreak) with right rows sorting
    before left rows at equal ts — ``last(right_payload, ignorenulls)``
    over the unbounded-preceding frame is then exactly the as-of
    match.  One shuffle on the key, no range explosion, no per-row
    probing; skew bounded by the busiest key (same profile as
    sessionization).  Among several right rows at one (key, ts), the
    greatest ``tiebreak_col`` wins (deterministic).

    ``tolerance_seconds`` voids matches older than the horizon
    (payload columns become NULL), like pandas ``merge_asof``.
    Output: every left row + ``<right_col><suffix>`` columns +
    ``<ts_col><suffix>`` (the matched right timestamp, NULL when no
    match).
    """
    payload = F.struct(
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        payload.alias("__rp"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
          for f in left.schema.fields],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        # raw timestamp subtraction (day-time interval, works on both
        # TIMESTAMP and TIMESTAMP_NTZ) — unix_timestamp truncates to
        # whole seconds, which would let a match up to ~1 s staler
        # than the horizon survive on sub-second data
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull()
                & (
                    F.col(ts_col) - F.col("__m.__ts")
                    <= F.expr(f"INTERVAL '{int(tolerance_seconds)}' SECOND")
                ),
                F.col("__m"),
            ),
        )
    return matched.select(
        *[F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields],
        F.col("__m.__ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("value",),
    tiebreak_col: str = "event_id",
    tolerance_seconds: int | None = None,
    suffix: str = "_r",
    time_buckets: int = 64,
) -> DataFrame:
    """As-of join for SKEWED keys: ``asof_join``'s single per-key
    window is bounded by the busiest key — one Zipf-hot key serializes
    its entire history through one task.  This variant salts the
    window by TIME: rows split into ``time_buckets`` epoch ranges, the
    as-of window runs per (key, bucket) — the hot key's history now
    parallelizes across ``time_buckets`` tasks — and a second, tiny
    window over per-(key, bucket) summaries (|keys| x buckets rows)
    carries the last payload of earlier buckets into buckets whose
    match lies before their own start.  Same output contract and
    semantics as ``asof_join`` (equivalence pinned by randomized
    test); two keyed shuffles instead of one.

    Use when one key dominates; the plain single-window form is
    cheaper when keys are balanced.
    """
    # bucket width from the observed ts range — two tiny aggs
    b1 = left.agg(
        F.min(F.unix_timestamp(ts_col)).alias("mn"),
        F.max(F.unix_timestamp(ts_col)).alias("mx"),
    ).first()
    b2 = right.agg(
        F.min(F.unix_timestamp(ts_col)).alias("mn"),
        F.max(F.unix_timestamp(ts_col)).alias("mx"),
    ).first()
    bounds_lo = [x for x in (b1["mn"], b2["mn"]) if x is not None]
    bounds_hi = [x for x in (b1["mx"], b2["mx"]) if x is not None]
    if not bounds_lo or not bounds_hi:
        # both inputs empty (or all-null timestamps): no bucket width
        # to derive — delegate to the plain form, which returns the
        # same empty/null-matched frame instead of raising
        return asof_join(
            left, right, on=on, ts_col=ts_col, right_cols=right_cols,
            tiebreak_col=tiebreak_col,
            tolerance_seconds=tolerance_seconds, suffix=suffix,
        )
    mn = min(bounds_lo)
    mx = max(bounds_hi)
    bucket_sec = max(1, -(-(mx - mn + 1) // time_buckets))

    def _bkt():
        return F.floor(
            (F.unix_timestamp(F.col(ts_col)) - F.lit(mn)) / F.lit(bucket_sec)
        ).cast("long")

    payload = F.struct(
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        _bkt().alias("__bkt"),
        F.lit(0).alias("__side"),
        F.col(tiebreak_col).cast("long").alias("__tb"),
        payload.alias("__rp"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
          for f in left.schema.fields],
    )
    l = left.select(
        F.col(on),
        F.col(ts_col),
        _bkt().alias("__bkt"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    w = (
        Window.partitionBy(on, "__bkt")
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = (
        r.unionByName(l)
        .withColumn("__m0", F.last("__rp", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    # pass 2: per-(key, bucket) last right payload, then a tiny per-key
    # window over bucket summaries gives each bucket its carry-in
    summ = r.groupBy(on, "__bkt").agg(
        F.max_by("__rp", F.struct(F.col(ts_col), F.col("__tb"))).alias("__rp")
    )
    lbuckets = l.select(on, "__bkt").distinct()
    allb = lbuckets.join(summ, on=[on, "__bkt"], how="full_outer")
    w2 = (
        Window.partitionBy(on)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = allb.withColumn(
        "__carry", F.last("__rp", ignorenulls=True).over(w2)
    ).select(on, "__bkt", "__carry")
    matched = (
        in_bucket.join(carry, on=[on, "__bkt"], how="left")
        .withColumn("__m", F.coalesce("__m0", "__carry"))
    )
    if tolerance_seconds is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m").isNotNull()
                & (
                    F.col(ts_col) - F.col("__m.__ts")
                    <= F.expr(f"INTERVAL '{int(tolerance_seconds)}' SECOND")
                ),
                F.col("__m"),
            ),
        )
    return matched.select(
        *[F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields],
        F.col("__m.__ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str = "user_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    ts_col: str = "ts",
    bucket_minutes: int | None = None,
    replication_cap: int = 256,
) -> DataFrame:
    """Point-in-interval join (the brief's other named custom
    operator): match every point row to the interval rows of the same
    key that contain it (``start <= ts <= end``, inclusive).

    A naive non-equi join compiles to BroadcastNestedLoop — quadratic,
    the 100 TB killer.  Spark-first shape: quantize time into
    ``bucket_minutes`` bins, explode each interval to the bins it
    spans (sequence over bin indexes — intervals cost
    O(duration/bucket)), equi-join points on (key, bin), then apply
    the exact range predicate as a residual filter.  The equi-join
    shuffles on (key, bin) — hash-partitioned, AQE-skew-splittable —
    and the bin width is the cost dial: smaller bins = fewer false
    candidates, more interval replication.

    Output: all interval columns + the matched point's ``ts`` and
    value columns (inner join; unmatched intervals drop).

    ``bucket_minutes=None`` (default) auto-tunes the bin width from
    the interval-duration distribution: one cheap aggregate takes the
    median duration and sets ``bucket = median / 2`` (so a typical
    interval explodes to ~3 bins), floored at 1 minute.  A fixed
    caller knob silently explodes when durations are far from the
    knob — multi-day intervals at the old 60-minute default cost
    O(days*24) replicas each.  ``replication_cap`` bounds the worst
    interval: if the LONGEST duration would exceed the cap at the
    chosen width, the bucket widens to ``max_duration /
    replication_cap`` (wider bins = more false candidates for the
    residual filter, never wrong results) and a warning names the
    culprit numbers.  An explicit ``bucket_minutes`` is respected
    as-is with no extra pass over the intervals.
    """
    dur = F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))
    if bucket_minutes is None:
        stats = intervals.agg(
            F.percentile_approx(dur, 0.5).alias("med"),
            F.max(dur).alias("mx"),
        ).first()
        med = max(int(stats["med"] or 60), 1)
        mx = max(int(stats["mx"] or 60), 1)
        bucket_sec = max(60, med // 2)
        if mx // bucket_sec + 1 > replication_cap:
            bucket_sec = -(-mx // replication_cap)  # ceil
            warnings.warn(
                f"range_join: max interval duration {mx}s would explode to "
                f">{replication_cap} bins at the median-derived bucket; "
                f"widening bucket to {bucket_sec}s",
                stacklevel=2,
            )
    else:
        bucket_sec = bucket_minutes * 60
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start_col) / bucket_sec),
                F.floor(F.unix_timestamp(end_col) / bucket_sec),
            )
        ),
    )
    pb = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(ts_col) / bucket_sec)
    )
    ivl_cols = [c for c in intervals.columns]
    pt_cols = [c for c in points.columns if c not in (on,)]
    joined = ib.alias("i").join(
        pb.alias("p"),
        on=[F.col(f"i.{on}") == F.col(f"p.{on}"),
            F.col("i.__bin") == F.col("p.__bin")],
        how="inner",
    ).filter(
        (F.col(f"p.{ts_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"p.{ts_col}") <= F.col(f"i.{end_col}"))
    )
    return joined.select(
        *[F.col(f"i.{c}").alias(c) for c in ivl_cols],
        *[F.col(f"p.{c}").alias(f"pt_{c}") for c in pt_cols],
    )
