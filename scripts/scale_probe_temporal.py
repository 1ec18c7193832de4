"""Temporal-join skew probe: Zipf-keyed as-of join at 10M rows.

``asof_join``'s single per-key window is bounded by the busiest key:
with a Zipf-hot key holding ~70% of rows, one task sorts ~70% of the
corpus.  ``asof_join_salted`` splits the window by time bucket, so the
hot key parallelizes across ``time_buckets`` tasks and a tiny
per-(key, bucket) summary window stitches the carry-in.

This probe synthesizes deterministic Zipf-keyed event frames
(hot key = 70% of rows, 999 cold keys) and measures, warm:

  - plain vs salted on the skewed 10M-row set (speedup is the point);
  - salted at 2.5M -> 10M rows (4x data; ratio must stay linear-ish);
  - salted skewed vs salted uniform at 10M (skew penalty must be small);
  - equality of plain and salted outputs on a 200k-row slice.

Prints one JSON line; evidence artifact: SCALE_PROBE_TEMPORAL.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from astro_vectordb_spark.session import get_spark

RATIO_CAP = 6.0       # 4x data, +50% headroom
SKEW_PENALTY_CAP = 2.0  # salted skewed may cost at most 2x salted uniform


def timed(fn) -> float:
    fn()
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def synth(spark, n_rows: int, skewed: bool, side: str, path: str):
    """Deterministic event frame: key, ts, value, event_id."""
    base = spark.range(n_rows).select(F.col("id").alias("event_id"))
    h = F.xxhash64("event_id", F.lit(side))
    if skewed:
        key = F.when(F.pmod(h, F.lit(10)) < 7, F.lit(0)).otherwise(
            F.pmod(F.xxhash64("event_id", F.lit(side + "k")), F.lit(999)) + 1
        )
    else:
        key = F.pmod(F.xxhash64("event_id", F.lit(side + "k")), F.lit(1000))
    df = base.select(
        "event_id",
        key.cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.xxhash64("event_id", F.lit(side + "t")), F.lit(30_000_000))
        ).alias("ts"),
        (F.pmod(F.xxhash64("event_id", F.lit(side + "v")), F.lit(10_000))
         / 100.0).alias("value"),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    from astro_vectordb_spark.operators.events import asof_join, asof_join_salted

    spark = get_spark("temporal-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "rows_large": 10_000_000,
        "rows_small": 2_500_000,
        "ratio_cap": RATIO_CAP,
        "skew_penalty_cap": SKEW_PENALTY_CAP,
    }
    failures: list[str] = []

    frames = {}
    for tag, n, skewed in (
        ("skew_large", 10_000_000, True),
        ("skew_small", 2_500_000, True),
        ("uniform_large", 10_000_000, False),
    ):
        nl = int(n * 0.8)
        nr = n - nl
        frames[tag] = (
            synth(spark, nl, skewed, "L", f"/tmp/scale_tmp/{tag}_l"),
            synth(spark, nr, skewed, "R", f"/tmp/scale_tmp/{tag}_r"),
        )

    def run_plain(tag):
        l, r = frames[tag]
        asof_join(l, r).agg(
            F.count(F.lit(1)), F.sum("value_r")
        ).collect()

    def run_salted(tag):
        l, r = frames[tag]
        asof_join_salted(l, r, time_buckets=64).agg(
            F.count(F.lit(1)), F.sum("value_r")
        ).collect()

    t_plain = timed(lambda: run_plain("skew_large"))
    t_salted = timed(lambda: run_salted("skew_large"))
    t_salted_small = timed(lambda: run_salted("skew_small"))
    t_salted_uni = timed(lambda: run_salted("uniform_large"))

    ratio_4x = round(t_salted / max(t_salted_small, 0.01), 2)
    skew_penalty = round(t_salted / max(t_salted_uni, 0.01), 2)
    out["plain_skew_10m_sec"] = t_plain
    out["salted_skew_10m_sec"] = t_salted
    out["salted_skew_2p5m_sec"] = t_salted_small
    out["salted_uniform_10m_sec"] = t_salted_uni
    out["salted_speedup_over_plain"] = round(t_plain / max(t_salted, 0.01), 2)
    out["salted_4x_ratio"] = ratio_4x
    out["salted_skew_penalty"] = skew_penalty
    if ratio_4x > RATIO_CAP:
        failures.append(f"4x ratio {ratio_4x} > {RATIO_CAP}")
    if skew_penalty > SKEW_PENALTY_CAP:
        failures.append(f"skew penalty {skew_penalty} > {SKEW_PENALTY_CAP}")

    # correctness: plain == salted on a 200k-row slice of the skewed set
    l, r = frames["skew_small"]
    ls, rs = l.limit(160_000), r.limit(40_000)
    a = (
        asof_join(ls, rs)
        .selectExpr("sum(hash(event_id, ts_r, value_r)) AS h",
                    "count(*) AS c")
        .first()
    )
    b = (
        asof_join_salted(ls, rs, time_buckets=16)
        .selectExpr("sum(hash(event_id, ts_r, value_r)) AS h",
                    "count(*) AS c")
        .first()
    )
    out["equality_rows"] = int(a["c"])
    eq = (a["h"], a["c"]) == (b["h"], b["c"])
    out["salted_equals_plain"] = bool(eq)
    if not eq:
        failures.append("salted output != plain output on 200k slice")

    out["failures"] = failures
    out["all_ok"] = not failures
    print(json.dumps(out))


if __name__ == "__main__":
    main()
