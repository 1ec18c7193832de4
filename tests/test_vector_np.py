"""NumPy kernel agrees with the expression kernel (to fp association)."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.functions.vector_np import (
    make_pair_score_udf,
    make_score_udf,
)
from astro_vectordb_spark.operators.topk import topk_search


def test_np_kernel_matches_expr_kernel(spark, embeddings):
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    for metric in ("cosine", "euclidean"):
        a = topk_search(embeddings, qv, 20, strength=0, metric=metric).collect()
        b = topk_search(
            embeddings, qv, 20, strength=0, metric=metric, kernel="numpy"
        ).collect()
        assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
        for ra, rb in zip(a, b):
            assert abs(ra["score"] - rb["score"]) < 1e-9


def test_np_pair_udf(spark, embeddings):
    from astro_vectordb_spark.functions.vector import cosine_similarity

    pairs = (
        embeddings.filter(F.col("vec_id") < 10)
        .select(F.col("embedding").alias("a"))
        .crossJoin(
            embeddings.filter(F.col("vec_id").between(10, 19)).select(
                F.col("embedding").alias("b")
            )
        )
    )
    udf_scores = pairs.select(
        make_pair_score_udf("cosine")(F.col("a"), F.col("b")).alias("s")
    ).collect()
    expr_scores = pairs.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("s")
    ).collect()
    for u, e in zip(udf_scores, expr_scores):
        assert abs(u["s"] - e["s"]) < 1e-9
