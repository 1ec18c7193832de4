"""Property tests for the similarity kernels (SURVEY.md §5.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.functions import vector as V


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def _arr(xs):
    return F.array(*[F.lit(float(x)) for x in xs])


def test_dot_product(spark):
    assert _one(spark, V.dot_product(_arr([1, 2, 3]), _arr([4, 5, 6]))) == 32.0


def test_cosine_self_similarity_is_one(spark, embeddings):
    row = embeddings.select(
        V.cosine_similarity(F.col("embedding"), F.col("embedding")).alias("s")
    ).first()
    assert abs(row["s"] - 1.0) < 1e-12


def test_cosine_symmetry_and_scale_invariance(spark):
    a, b = [1, 2, 3], [-2, 0.5, 7]
    ab = _one(spark, V.cosine_similarity(_arr(a), _arr(b)))
    ba = _one(spark, V.cosine_similarity(_arr(b), _arr(a)))
    a2b = _one(spark, V.cosine_similarity(_arr([2 * x for x in a]), _arr(b)))
    assert abs(ab - ba) < 1e-12
    assert abs(ab - a2b) < 1e-12


def test_cosine_null_returns_minus_one(spark):
    # similarity.ts:17 contract
    null_arr = F.lit(None).cast("array<float>")
    assert _one(spark, V.cosine_similarity(null_arr, _arr([1, 2]))) == -1.0
    assert _one(spark, V.cosine_similarity(_arr([1, 2]), null_arr)) == -1.0


def test_euclidean(spark):
    d = _one(spark, V.euclidean_distance(_arr([0, 0]), _arr([3, 4])))
    assert d == 5.0
    s = _one(spark, V.euclidean_similarity(_arr([0, 0]), _arr([3, 4])))
    assert abs(s - 1.0 / 6.0) < 1e-12


def test_euclidean_similarity_in_unit_interval(spark, embeddings):
    q = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    qcol = F.array(*[F.lit(float(x)) for x in q])
    bad = embeddings.select(
        V.euclidean_similarity(F.col("embedding"), qcol).alias("s")
    ).filter((F.col("s") <= 0) | (F.col("s") > 1.0))
    assert bad.count() == 0


def test_metric_dispatch_rejects_unknown():
    # hnsw.ts:39-49 throws on unknown metric
    with pytest.raises(ValueError):
        V.similarity(F.lit(None), F.lit(None), metric="manhattan")


def test_threshold_cap(spark):
    # driver/driver.ts:296-298: min(0.95, s/100)
    assert _one(spark, V.threshold_from_strength(99)) == 0.95
    assert _one(spark, V.threshold_from_strength(50)) == 0.5
    assert _one(spark, V.threshold_from_strength(0)) == 0.0


def test_math_matches_numpy(spark, embeddings):
    import numpy as np

    rows = embeddings.orderBy("vec_id").limit(2).collect()
    a = np.array(rows[0]["embedding"], dtype=np.float64)
    b = np.array(rows[1]["embedding"], dtype=np.float64)
    expected = float(a @ b / (math.sqrt(a @ a) * math.sqrt(b @ b)))
    got = (
        embeddings.filter(F.col("vec_id") == 0)
        .crossJoin(
            embeddings.filter(F.col("vec_id") == 1).select(
                F.col("embedding").alias("b")
            )
        )
        .select(V.cosine_similarity(F.col("embedding"), F.col("b")).alias("s"))
        .first()["s"]
    )
    assert abs(got - expected) < 1e-9
