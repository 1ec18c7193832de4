"""Retention/GC — round-12 verdict item 5: the ``_batches`` replay-log
compactor (``vault.gc``) and the offline versioned-table pruner
(``versioned.gc_versions``).

The contract under test: a long ingest+remove churn sequence keeps
metadata bounded, and replays still no-op — for ids the GC kept AND
for ids it collapsed into the horizon row; only genuinely-new ids
apply after compaction.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.sources.vault import (
    _batch_already_committed,
    gc,
    load_rp_index,
    rp_append_to_index,
    rp_remove_from_index,
    save_rp_index,
)
from astro_vectordb_spark.sources.versioned import (
    commit_version,
    current_version,
    gc_versions,
    read_current,
)

DIM = 8
N = 200


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(2)
    X = rng.randn(N, DIM)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _parquet_files(path):
    return [
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]


class TestBatchLogGC:
    def test_churn_bounded_and_replay_safe(self, spark, data, tmp_path):
        path = str(tmp_path / "idx")
        save_rp_index(data.filter(F.col("vec_id") < 50), path)
        # churn: 20 ingest batches + 10 remove batches, two namespaces
        for b in range(20):
            rp_append_to_index(
                spark, path,
                data.filter(F.col("vec_id") == 50 + b), batch_id=b,
            )
        for b in range(10):
            rp_remove_from_index(spark, path, [b], batch_id=b)
        log = os.path.join(path, "_batches")
        files_before = len(_parquet_files(log))
        assert files_before >= 30  # one file per applied batch
        rep = gc(spark, path, keep_last_batches=3)
        assert rep["compacted"] is True
        assert rep["files_after"] == 1
        # per op: 1 horizon + at most keep_last rows
        assert rep["rows_after"] <= 2 * (1 + 3)
        # replay of a PRUNED id: still a no-op (horizon row)
        r = rp_append_to_index(
            spark, path, data.filter(F.col("vec_id") == 55), batch_id=5
        )
        assert r["skipped_replay"] is True
        r = rp_remove_from_index(spark, path, [3], batch_id=3)
        assert r["skipped_replay"] is True
        # replay of a RETAINED id: still a no-op
        r = rp_append_to_index(
            spark, path, data.filter(F.col("vec_id") == 69), batch_id=19
        )
        assert r["skipped_replay"] is True
        # a genuinely NEW id applies
        r = rp_append_to_index(
            spark, path, data.filter(F.col("vec_id") == 150), batch_id=42
        )
        assert r["skipped_replay"] is False and r["appended_rows"] == 1
        _, _, meta = load_rp_index(spark, path)
        assert meta["n_rows"] == 50 + 20 - 10 + 1

    def test_namespaces_independent(self, spark, data, tmp_path):
        path = str(tmp_path / "idx2")
        save_rp_index(data.filter(F.col("vec_id") < 30), path)
        for b in range(8):
            rp_append_to_index(
                spark, path,
                data.filter(F.col("vec_id") == 30 + b), batch_id=b,
            )
        rp_remove_from_index(spark, path, [0], batch_id=2)
        gc(spark, path, keep_last_batches=1)
        # the remove namespace's horizon (2) must not mask append id 5,
        # nor the append horizon mask remove id 1
        assert _batch_already_committed(spark, path, 5, op="rp_append")
        assert _batch_already_committed(spark, path, 2, op="rp_remove")
        assert not _batch_already_committed(spark, path, 9, op="rp_append")
        assert not _batch_already_committed(spark, path, 3, op="rp_remove")

    def test_gc_idempotent_and_horizon_folds(self, spark, data, tmp_path):
        path = str(tmp_path / "idx3")
        save_rp_index(data.filter(F.col("vec_id") < 30), path)
        for b in range(6):
            rp_append_to_index(
                spark, path,
                data.filter(F.col("vec_id") == 30 + b), batch_id=b,
            )
        gc(spark, path, keep_last_batches=2)
        # more churn on top of the compacted log, then GC again: the
        # prior horizon must fold into the new one
        for b in range(6, 10):
            rp_append_to_index(
                spark, path,
                data.filter(F.col("vec_id") == 30 + b), batch_id=b,
            )
        rep = gc(spark, path, keep_last_batches=2)
        assert rep["compacted"] is True
        for b in range(9):
            assert _batch_already_committed(spark, path, b, op="rp_append")
        assert not _batch_already_committed(spark, path, 11, op="rp_append")

    def test_noop_on_missing_log(self, spark, tmp_path):
        rep = gc(spark, str(tmp_path / "nothing"))
        assert rep["compacted"] is False and rep["rows_before"] == 0


class TestVersionGC:
    def test_prunes_old_and_orphans_keeps_current(self, spark, tmp_path):
        path = str(tmp_path / "vt")
        os.makedirs(path)
        df = spark.range(5).select(F.col("id").alias("v"))
        for v in range(6):
            commit_version(df, path, v, keep_versions=100)
        # orphan above the pointer: a crashed writer's never-swapped dir
        df.write.mode("overwrite").parquet(os.path.join(path, "v9"))
        assert current_version(path) == "v5"
        # a YOUNG orphan is kept — it may be a concurrent writer's
        # in-flight commit about to swap in
        rep = gc_versions(path, keep_last_versions=2)
        assert "v9" in rep["kept"]
        # aged out (orphan_min_age_sec=0), it is a crashed-writer leak
        rep = gc_versions(path, keep_last_versions=2, orphan_min_age_sec=0)
        assert "v9" in rep["removed"]
        assert set(rep["kept"]) == {"v4", "v5"}
        assert read_current(spark, path).count() == 5

    def test_noop_on_uncommitted(self, tmp_path):
        rep = gc_versions(str(tmp_path / "empty"))
        assert rep == {"removed": [], "kept": []}


class TestStreamingGC:
    def test_rp_stream_gc_every_bounds_log_files(self, spark, data,
                                                 tmp_path):
        """gc_every compacts the replay log from inside foreachBatch —
        after many micro-batches the log stays at a bounded file
        count and replays remain no-ops."""
        import time

        from astro_vectordb_spark.sources.vault import (
            rp_match_index,
            save_rp_index,
        )
        from astro_vectordb_spark.streaming.upsert import stream_rp_ingest

        path = str(tmp_path / "idx_sgc")
        save_rp_index(data.filter(F.col("vec_id") < 40), path)
        fixed = [float(i) / 10 for i in range(DIM)]
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "20")
            .load()
            .select(
                (F.col("value") + 700_000).alias("vec_id"),
                F.array(*[F.lit(v) for v in fixed]).alias("embedding"),
            )
        )
        q = stream_rp_ingest(
            stream, path, drop_dups=True, threshold=0.999, gc_every=3
        )
        try:
            deadline = time.time() + 45
            while time.time() < deadline:
                time.sleep(3)
                if len(_parquet_files(os.path.join(path, "_batches"))) and (
                    q.lastProgress
                    and q.lastProgress.get("batchId", 0) >= 7
                ):
                    break
        finally:
            q.stop()
        n_files = len(_parquet_files(os.path.join(path, "_batches")))
        # without gc, >= one file per applied batch; with gc_every=3
        # the count stays bounded well below the batch count
        assert 1 <= n_files <= 6
        # the ingested fixed vector is matchable (appends survived gc)
        probe = spark.createDataFrame(
            [(900_000, fixed)], "vec_id long, embedding array<double>"
        )
        assert rp_match_index(
            spark, path, probe, threshold=0.999
        ).limit(1).count() == 1
