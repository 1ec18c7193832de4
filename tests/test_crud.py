"""Tests for CRUD / upsert / sync-merge semantics (SURVEY.md §5.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.crud import (
    live,
    point_lookup,
    sync_merge,
    tombstone_delete,
    upsert_latest,
)


def test_point_lookup(spark, embeddings):
    rows = point_lookup(embeddings, 42).collect()
    assert len(rows) == 1 and rows[0]["vec_id"] == 42
    assert point_lookup(embeddings, -1).count() == 0


def test_tombstone_soft_delete_keeps_rows(spark, embeddings):
    n = embeddings.count()
    marked = tombstone_delete(embeddings, [1, 2, 3])
    assert marked.count() == n  # rows stay (hnsw.ts:212-226)
    assert live(marked).count() == n - 3
    flags = {r["vec_id"]: r["deleted"] for r in marked.filter(F.col("vec_id") < 5).collect()}
    assert flags[1] and flags[2] and flags[3] and not flags[0] and not flags[4]


def test_hard_delete_removes_rows(spark, embeddings):
    n = embeddings.count()
    out = tombstone_delete(embeddings, [1, 2, 3], hard=True)
    assert out.count() == n - 3
    assert out.filter(F.col("vec_id").isin([1, 2, 3])).count() == 0


def test_upsert_keep_latest(spark, embeddings):
    updates = (
        embeddings.filter(F.col("vec_id") % 7 == 0)
        .withColumn("embedding", F.transform("embedding", lambda x: -x))
    )
    merged = upsert_latest(embeddings, updates)
    assert merged.count() == embeddings.count()  # id-stable (hnsw.ts:497-517)
    orig = embeddings.filter(F.col("vec_id") == 7).first()["embedding"]
    new = merged.filter(F.col("vec_id") == 7).first()["embedding"]
    assert new == [-x for x in orig]
    kept = merged.filter(F.col("vec_id") == 8).first()["embedding"]
    assert kept == embeddings.filter(F.col("vec_id") == 8).first()["embedding"]


def test_upsert_inserts_new_ids(spark, embeddings):
    new_rows = embeddings.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    merged = upsert_latest(embeddings, new_rows)
    assert merged.count() == embeddings.count() + 3


def test_sync_merge_all_branches(spark, embeddings):
    """Exercises insert / keep-unchanged / update / skip-empty
    exactly per driver/worker.ts:8-30."""
    changed = F.col("vec_id") % 3 == 0
    empty = changed & (F.col("vec_id") % 5 == 0)
    incoming = (
        embeddings.filter(F.col("vec_id") % 3 != 2)  # %3==2 absent from incoming
        .withColumn(
            "embedding",
            F.when(empty, F.array().cast("array<float>"))
            .when(changed, F.transform("embedding", lambda x: -x))
            .otherwise(F.col("embedding")),
        )
        .select("vec_id", "embedding")
    )
    new = embeddings.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    incoming = incoming.unionByName(new)

    out = sync_merge(embeddings.select("vec_id", "embedding"), incoming, action_col="action")
    acts = {r["vec_id"]: r["action"] for r in out.collect()}

    assert acts[100000] == "insert" and acts[100001] == "insert"
    assert acts[3] == "update"          # %3==0, not %5==0 -> changed
    assert acts[15] == "skip_empty"     # %3==0 and %5==0 -> empty vector
    assert acts[1] == "keep"            # unchanged incoming
    assert acts[2] == "keep"            # absent from incoming
    # row count: all current rows kept + 2 inserts
    assert out.count() == embeddings.count() + 2
    # updated vector really replaced; skipped kept original
    vec3 = out.filter(F.col("vec_id") == 3).first()["embedding"]
    orig3 = embeddings.filter(F.col("vec_id") == 3).first()["embedding"]
    assert vec3 == [-x for x in orig3]
    vec15 = out.filter(F.col("vec_id") == 15).first()["embedding"]
    orig15 = embeddings.filter(F.col("vec_id") == 15).first()["embedding"]
    assert vec15 == orig15
