"""Tests for exact top-K search / batch top-K / similarity join."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.topk import (
    batch_topk,
    similarity_join,
    topk_search,
)


def _query_vec(embeddings, vec_id=0):
    return embeddings.filter(F.col("vec_id") == vec_id).first()["embedding"]


def _numpy_topk(embeddings, qv, k, threshold, metric="cosine"):
    rows = embeddings.select("vec_id", "embedding").collect()
    q = np.array(qv, dtype=np.float64)
    out = []
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        if metric == "cosine":
            s = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        else:
            s = 1.0 / (1.0 + float(np.linalg.norm(q - v)))
        if s > threshold:
            out.append((r["vec_id"], s))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_topk_matches_numpy_oracle(spark, embeddings):
    qv = _query_vec(embeddings)
    got = topk_search(embeddings, qv, k=10, strength=20).collect()
    exp = _numpy_topk(embeddings, qv, 10, 0.2)
    assert [r["vec_id"] for r in got] == [i for i, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert abs(r["score"] - s) < 1e-6


def test_topk_threshold_cap_returns_self_only(spark, embeddings):
    # strength 99 -> cap 0.95; only the query itself (score 1.0) passes
    qv = _query_vec(embeddings, vec_id=3)
    got = topk_search(embeddings, qv, k=10, strength=99).collect()
    assert [r["vec_id"] for r in got] == [3]


def test_topk_respects_tombstones(spark, embeddings):
    from astro_vectordb_spark.operators.crud import tombstone_delete

    qv = _query_vec(embeddings)
    base = topk_search(embeddings, qv, k=5, strength=0).collect()
    top_ids = [r["vec_id"] for r in base]
    deleted = tombstone_delete(embeddings, top_ids[:2])
    got = topk_search(deleted, qv, k=5, strength=0, deleted_col="deleted").collect()
    got_ids = [r["vec_id"] for r in got]
    assert set(got_ids).isdisjoint(top_ids[:2])
    assert got_ids[:3] == top_ids[2:]


def test_topk_euclidean(spark, embeddings):
    qv = _query_vec(embeddings, vec_id=7)
    got = topk_search(embeddings, qv, k=5, strength=0, metric="euclidean").collect()
    exp = _numpy_topk(embeddings, qv, 5, 0.0, metric="euclidean")
    assert [r["vec_id"] for r in got] == [i for i, _ in exp]


def test_batch_topk_matches_per_query(spark, embeddings):
    queries = (
        embeddings.filter(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
    )
    got = batch_topk(embeddings, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        qv = _query_vec(embeddings, qid)
        exp = _numpy_topk(embeddings, qv, 5, 0.0)
        assert [r["vec_id"] for r in rows] == [i for i, _ in exp]


def test_batch_topk_salted_equals_unsalted(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    salted = batch_topk(embeddings, queries, k=7, num_salts=8).collect()
    plain = batch_topk(embeddings, queries, k=7, num_salts=1).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(
        [(r["query_id"], r["rank"], r["vec_id"]) for r in salted]
    ) == sorted([(r["query_id"], r["rank"], r["vec_id"]) for r in plain])


def test_similarity_join_self_pairs(spark, embeddings):
    small = embeddings.filter(F.col("vec_id") < 50)
    pairs = similarity_join(small, threshold=0.1).collect()
    assert all(p["a_id"] < p["b_id"] for p in pairs)
    assert all(p["score"] > 0.1 for p in pairs)
    # spot-check one pair against numpy
    if pairs:
        p = pairs[0]
        qa = _query_vec(embeddings, p["a_id"])
        qb = _query_vec(embeddings, p["b_id"])
        a, b = np.array(qa, np.float64), np.array(qb, np.float64)
        s = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(p["score"] - s) < 1e-6
