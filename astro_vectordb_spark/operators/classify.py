"""kNN classification over the embeddings table.

Composition showcase: batch top-K (O9 generalized) + majority vote.
The ``label`` column of the embeddings fixture plays the class.  At
scale this is the "label propagation from nearest labeled examples"
pattern used to extend small labeled sets over a 100 TB corpus.

Plan: batch_topk's salted ranking -> groupBy (query, label) count ->
window max-count vote.  Vote ties break to the smaller label id
(deterministic, oracle-expressible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.topk import batch_topk


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = True,
) -> DataFrame:
    """Majority label among each query's k nearest corpus vectors.

    Returns (query_id, pred_label, votes).  ``exclude_self`` drops a
    corpus row whose id equals the query id (standard leave-one-out)."""
    topk = batch_topk(
        corpus,
        queries,
        k + (1 if exclude_self else 0),
        metric=metric,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )
    if exclude_self:
        topk = topk.filter(F.col(query_id_col) != F.col(id_col))
        w = Window.partitionBy(query_id_col).orderBy("rank")
        topk = topk.withColumn("_r2", F.row_number().over(w)).filter(
            F.col("_r2") <= k
        )
    labeled = topk.join(
        corpus.select(F.col(id_col), F.col(label_col)), on=id_col
    )
    votes = labeled.groupBy(query_id_col, label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy(query_id_col).orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
        .select(
            query_id_col,
            F.col(label_col).alias("pred_label"),
            "votes",
        )
    )
