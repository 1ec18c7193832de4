"""Edge cases: empty inputs, empty results, degenerate parameters.

Reference parity: empty-index short-circuit (hnsw.ts:248-250), empty
vector skip (hnsw.ts:155).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.crud import sync_merge, upsert_latest
from astro_vectordb_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from astro_vectordb_spark.operators.topk import batch_topk, topk_search

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


def test_topk_on_empty_corpus(spark):
    # hnsw.ts:248-250: search on empty index returns []
    out = topk_search(_empty_emb(spark), [1.0, 2.0], k=5, strength=0)
    assert out.count() == 0


def test_batch_topk_on_empty_corpus(spark):
    queries = spark.createDataFrame(
        [(0, [1.0, 2.0])], "query_id long, query_vec array<float>"
    )
    assert batch_topk(_empty_emb(spark), queries, 5).count() == 0


def test_topk_k_larger_than_corpus(spark, embeddings):
    import numpy as np

    small = embeddings.limit(3)
    qv = embeddings.first()["embedding"]
    q = np.array(qv, dtype=np.float64)
    expected = 0
    for r in small.collect():
        v = np.array(r["embedding"], dtype=np.float64)
        if q @ v / (np.linalg.norm(q) * np.linalg.norm(v)) > 0:
            expected += 1
    out = topk_search(small, qv, k=100, strength=0).collect()
    assert len(out) == expected  # k caps, threshold (score>0) filters


def test_upsert_into_empty(spark, embeddings):
    updates = embeddings.limit(5).select("vec_id", "embedding")
    merged = upsert_latest(_empty_emb(spark), updates)
    assert merged.count() == 5


def test_sync_merge_empty_incoming(spark, embeddings):
    base = embeddings.limit(10).select("vec_id", "embedding")
    out = sync_merge(base, _empty_emb(spark))
    assert out.count() == 10  # all kept


def test_dedup_on_empty_docs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty, 0.8).count() == 0
    assert minhash_lsh_pairs(empty, 0.8).count() == 0


def test_jaccard_all_short_docs(spark):
    # every doc shorter than the shingle size -> no pairs, no crash
    df = spark.createDataFrame(
        [(0, "a b"), (1, "c"), (2, "")], "doc_id long, text string"
    )
    assert ngram_jaccard_pairs(df, 0.5, n=3).count() == 0


def test_stream_sync_merge(spark, embeddings, tmp_path):
    """Streaming face of the diff-aware merge applies worker.ts rules
    per micro-batch."""
    import time

    from astro_vectordb_spark.sources.versioned import commit_version, read_current
    from astro_vectordb_spark.streaming.upsert import stream_sync_merge

    target = str(tmp_path / "t")
    commit_version(embeddings.limit(20).select("vec_id", "embedding"), target, 0)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "20").load()
        .select(
            (F.col("value") % 5).alias("vec_id"),
            F.array(F.lit(7.7), F.lit(8.8)).cast("array<float>").alias("embedding"),
        )
    )
    q = stream_sync_merge(stream, target)
    try:
        deadline = time.time() + 30
        while time.time() < deadline and q.lastProgress is None:
            time.sleep(1)
        time.sleep(5)
    finally:
        q.stop()
    cur = read_current(spark, target)
    assert cur.count() == 20  # updates replace, no inserts of new ids
    assert cur.filter(F.size("embedding") == 2).count() == 5


class TestAsofJoin:
    def _frames(self, spark):
        from datetime import datetime

        left = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1, 10, 0, 0), 7, 1.0),
                (2, datetime(2024, 1, 1, 12, 0, 0), 7, 2.0),
                (3, datetime(2024, 1, 1, 9, 0, 0), 8, 3.0),
            ],
            "event_id long, ts timestamp, user_id long, value double",
        )
        right = spark.createDataFrame(
            [
                (101, datetime(2024, 1, 1, 9, 30, 0), 7, 10.0),
                (102, datetime(2024, 1, 1, 11, 0, 0), 7, 20.0),
                (103, datetime(2024, 1, 1, 9, 0, 0), 8, 30.0),
            ],
            "event_id long, ts timestamp, user_id long, value double",
        )
        return left, right

    def test_backward_inclusive(self, spark):
        from astro_vectordb_spark.operators.events import asof_join

        left, right = self._frames(spark)
        out = {
            int(r.event_id): r
            for r in asof_join(left, right).collect()
        }
        assert out[1].value_r == 10.0   # 10:00 -> 9:30 purchase
        assert out[2].value_r == 20.0   # 12:00 -> 11:00 purchase
        assert out[3].value_r == 30.0   # equal ts matches (inclusive)

    def test_no_prior_match_is_null(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import asof_join

        left, right = self._frames(spark)
        early = spark.createDataFrame(
            [(4, datetime(2024, 1, 1, 8, 0, 0), 7, 0.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        row = asof_join(early, right).first()
        assert row.value_r is None and row.ts_r is None

    def test_tolerance_voids_stale_matches(self, spark):
        from astro_vectordb_spark.operators.events import asof_join

        left, right = self._frames(spark)
        out = {
            int(r.event_id): r
            for r in asof_join(
                left, right, tolerance_seconds=45 * 60
            ).collect()
        }
        assert out[1].value_r == 10.0   # 30 min gap: inside horizon
        assert out[2].value_r is None   # 60 min gap: voided
        assert out[3].value_r == 30.0   # 0 gap

    def test_tolerance_subsecond_precision(self, spark):
        # a match 1500 ms stale must be voided by a 1 s horizon —
        # whole-second truncation (unix_timestamp) would floor the gap
        # to 1 s and let it survive
        from datetime import datetime

        from astro_vectordb_spark.operators.events import asof_join

        left = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 10, 0, 1, 500_000), 7, 0.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        right = spark.createDataFrame(
            [(301, datetime(2024, 1, 1, 10, 0, 0), 7, 5.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        voided = asof_join(left, right, tolerance_seconds=1).first()
        assert voided.value_r is None
        kept = asof_join(left, right, tolerance_seconds=2).first()
        assert kept.value_r == 5.0

    def test_equal_ts_ties_take_max_tiebreak(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import asof_join

        ts = datetime(2024, 1, 1, 10, 0, 0)
        left = spark.createDataFrame(
            [(1, ts, 7, 0.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        right = spark.createDataFrame(
            [(201, ts, 7, 1.0), (202, ts, 7, 2.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        row = asof_join(left, right).first()
        assert row.value_r == 2.0  # greatest event_id wins

    def test_single_key_shuffle(self, spark):
        from astro_vectordb_spark.operators.events import asof_join

        left, right = self._frames(spark)
        plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
        # one windowed pass partitioned by the key — no join operator,
        # no range explosion
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
        assert plan.count("Window") >= 1


class TestRangeJoin:
    def test_containment_and_bins(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import range_join

        ivl = spark.createDataFrame(
            [
                (1, 7, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 12, 0)),
                (2, 8, datetime(2024, 1, 1, 10, 0), datetime(2024, 1, 1, 11, 0)),
            ],
            "ivl_id long, user_id long, start_ts timestamp, end_ts timestamp",
        )
        pts = spark.createDataFrame(
            [
                (7, datetime(2024, 1, 1, 11, 30), 1.0),   # inside (spans bins)
                (7, datetime(2024, 1, 1, 12, 0), 2.0),    # boundary inclusive
                (7, datetime(2024, 1, 1, 12, 1), 3.0),    # just outside
                (8, datetime(2024, 1, 1, 11, 30), 4.0),   # wrong interval
                (9, datetime(2024, 1, 1, 10, 30), 5.0),   # wrong key
            ],
            "user_id long, ts timestamp, value double",
        )
        out = range_join(ivl, pts, bucket_minutes=30).collect()
        got = sorted((r.ivl_id, r.pt_value) for r in out)
        assert got == [(1, 1.0), (1, 2.0)]

    def test_no_duplicate_pairs_across_bins(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import range_join

        # interval spanning many bins, point inside: exactly one row
        ivl = spark.createDataFrame(
            [(1, 7, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 2, 0, 0))],
            "ivl_id long, user_id long, start_ts timestamp, end_ts timestamp",
        )
        pts = spark.createDataFrame(
            [(7, datetime(2024, 1, 1, 13, 37), 9.0)],
            "user_id long, ts timestamp, value double",
        )
        out = range_join(ivl, pts, bucket_minutes=15).collect()
        assert len(out) == 1

    def test_auto_bucket_multiday_bounded_explode(self, spark):
        # multi-day intervals at the old fixed 60-min default cost
        # O(days*24) replicas each; the auto width (median duration /
        # 2) bounds every interval to ~3 bins and results are identical
        from datetime import datetime, timedelta

        from astro_vectordb_spark.operators.events import range_join

        base = datetime(2024, 1, 1)
        ivl = spark.createDataFrame(
            [
                (i, 7, base + timedelta(days=i), base + timedelta(days=i + 3))
                for i in range(10)
            ],
            "ivl_id long, user_id long, start_ts timestamp, end_ts timestamp",
        )
        pts = spark.createDataFrame(
            [
                (7, base + timedelta(days=d, hours=h), float(d * 24 + h))
                for d in range(14)
                for h in (6, 18)
            ],
            "user_id long, ts timestamp, value double",
        )
        auto = sorted(
            (r.ivl_id, r.pt_value) for r in range_join(ivl, pts).collect()
        )
        fixed = sorted(
            (r.ivl_id, r.pt_value)
            for r in range_join(ivl, pts, bucket_minutes=60).collect()
        )
        assert auto == fixed and len(auto) > 0
        # the explode factor the auto width produces: 3 d / 1.5 d = 3
        # bins per interval (vs 73 at 60 min)
        med_sec = 3 * 86400
        assert med_sec // (med_sec // 2) + 1 <= 4

    def test_replication_cap_widens_bucket(self, spark):
        # one 100-day outlier among 1-hour intervals: the median-based
        # width (30 min) would explode it into ~4800 bins; the cap
        # widens the bucket and warns, results stay exact
        import warnings as W
        from datetime import datetime, timedelta

        from astro_vectordb_spark.operators.events import range_join

        base = datetime(2024, 1, 1)
        rows = [
            (i, 7, base + timedelta(hours=i), base + timedelta(hours=i + 1))
            for i in range(9)
        ] + [(99, 7, base, base + timedelta(days=100))]
        ivl = spark.createDataFrame(
            rows,
            "ivl_id long, user_id long, start_ts timestamp, end_ts timestamp",
        )
        pts = spark.createDataFrame(
            [(7, base + timedelta(days=50), 1.0),
             (7, base + timedelta(hours=3, minutes=30), 2.0)],
            "user_id long, ts timestamp, value double",
        )
        with W.catch_warnings(record=True) as caught:
            W.simplefilter("always")
            out = range_join(ivl, pts, replication_cap=64)
            got = sorted((r.ivl_id, r.pt_value) for r in out.collect())
        assert any("widening bucket" in str(w.message) for w in caught)
        assert got == [(3, 2.0), (99, 1.0), (99, 2.0)]
        # bin arithmetic: the outlier now explodes to <= cap+1 bins
        mx = 100 * 86400
        bucket = -(-mx // 64)
        assert mx // bucket + 1 <= 65

    def test_no_nested_loop_join(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import range_join

        ivl = spark.createDataFrame(
            [(1, 7, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0))],
            "ivl_id long, user_id long, start_ts timestamp, end_ts timestamp",
        )
        pts = spark.createDataFrame(
            [(7, datetime(2024, 1, 1, 0, 30), 1.0)],
            "user_id long, ts timestamp, value double",
        )
        plan = range_join(ivl, pts)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestAsofRandomizedEquivalence:
    def test_matches_pandas_merge_asof(self, spark):
        import numpy as np
        import pandas as pd

        from astro_vectordb_spark.operators.events import asof_join

        rng = np.random.RandomState(11)
        base = pd.Timestamp("2024-01-01")
        left = pd.DataFrame(
            {
                "event_id": np.arange(200),
                "ts": [
                    base + pd.Timedelta(seconds=int(s))
                    for s in rng.randint(0, 50_000, 200)
                ],
                "user_id": rng.randint(0, 8, 200).astype("int64"),
                "value": rng.rand(200),
            }
        )
        right = pd.DataFrame(
            {
                "event_id": np.arange(1000, 1150),
                "ts": [
                    base + pd.Timedelta(seconds=int(s))
                    for s in rng.randint(0, 50_000, 150)
                ],
                "user_id": rng.randint(0, 8, 150).astype("int64"),
                "value": rng.rand(150),
            }
        )
        # drop (user, ts) duplicates on the right so the tie rule is
        # irrelevant and merge_asof's single-match contract applies
        right = right.drop_duplicates(["user_id", "ts"])
        got = (
            asof_join(
                spark.createDataFrame(left), spark.createDataFrame(right)
            )
            .toPandas()
            .sort_values("event_id", ignore_index=True)
        )
        expect = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts")[["user_id", "ts", "value"]],
            on="ts",
            by="user_id",
            direction="backward",
            suffixes=("", "_r"),
        ).sort_values("event_id", ignore_index=True)
        assert (got["value_r"].fillna(-1).to_numpy()
                == expect["value_r"].fillna(-1).to_numpy()).all()


class TestAsofSalted:
    def _frames(self, spark, seed=17, n_left=400, n_right=300, zipf=True):
        import numpy as np
        import pandas as pd

        rng = np.random.RandomState(seed)
        base = pd.Timestamp("2024-01-01")
        if zipf:
            # ~70% of rows on key 0 — the hot-key regime the salted
            # variant exists for
            lk = np.where(rng.rand(n_left) < 0.7, 0, rng.randint(1, 6, n_left))
            rk = np.where(rng.rand(n_right) < 0.7, 0, rng.randint(1, 6, n_right))
        else:
            lk = rng.randint(0, 6, n_left)
            rk = rng.randint(0, 6, n_right)
        left = pd.DataFrame(
            {
                "event_id": np.arange(n_left),
                "ts": [base + pd.Timedelta(seconds=int(s))
                       for s in rng.randint(0, 90_000, n_left)],
                "user_id": lk.astype("int64"),
                "value": rng.rand(n_left),
            }
        )
        right = pd.DataFrame(
            {
                "event_id": np.arange(10_000, 10_000 + n_right),
                "ts": [base + pd.Timedelta(seconds=int(s))
                       for s in rng.randint(0, 90_000, n_right)],
                "user_id": rk.astype("int64"),
                "value": rng.rand(n_right),
            }
        )
        return spark.createDataFrame(left), spark.createDataFrame(right)

    def _cmp(self, spark, tolerance=None, seed=17):
        from astro_vectordb_spark.operators.events import (
            asof_join,
            asof_join_salted,
        )

        left, right = self._frames(spark, seed=seed)
        plain = (
            asof_join(left, right, tolerance_seconds=tolerance)
            .toPandas().sort_values("event_id", ignore_index=True)
        )
        salted = (
            asof_join_salted(
                left, right, tolerance_seconds=tolerance, time_buckets=16
            )
            .toPandas().sort_values("event_id", ignore_index=True)
        )
        for col in ("value_r", "ts_r"):
            a = plain[col].fillna(-1).to_numpy()
            b = salted[col].fillna(-1).to_numpy()
            assert (a == b).all(), col

    def test_salted_equals_plain_zipf_keys(self, spark):
        self._cmp(spark)

    def test_salted_equals_plain_with_tolerance(self, spark):
        self._cmp(spark, tolerance=3600, seed=23)

    def test_empty_inputs_return_empty_not_raise(self, spark):
        # both sides empty: no timestamp bounds to derive a bucket
        # width from — must match plain asof_join's empty frame, not
        # raise ValueError (min of empty generator)
        from astro_vectordb_spark.operators.events import asof_join_salted

        empty = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, value double"
        )
        out = asof_join_salted(empty, empty, time_buckets=16)
        assert out.count() == 0
        assert "value_r" in out.columns

    def test_empty_right_null_matches(self, spark):
        from datetime import datetime

        from astro_vectordb_spark.operators.events import (
            asof_join,
            asof_join_salted,
        )

        left = spark.createDataFrame(
            [(1, datetime(2024, 1, 1, 10, 0, 0), 7, 1.0)],
            "event_id long, ts timestamp, user_id long, value double",
        )
        empty = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, value double"
        )
        got = asof_join_salted(left, empty, time_buckets=16).first()
        want = asof_join(left, empty).first()
        assert got["value_r"] is None and want["value_r"] is None
        assert got["event_id"] == 1

    def test_hot_key_window_parallelized(self, spark):
        from astro_vectordb_spark.operators.events import asof_join_salted

        left, right = self._frames(spark)
        plan = (
            asof_join_salted(left, right, time_buckets=16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the big window partitions by (key, bucket), never key alone
        assert "__bkt" in plan
