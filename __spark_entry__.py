"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (exact top-K cosine search,
reference hnsw.ts:241-299) on sf0.001.  ``queries()`` exposes one entry
per implemented operator from SURVEY.md §2; ``oracle_sql()`` gives the
DuckDB-equivalent SQL.  Numeric contract: all similarity math is a
strict left fold over double-cast elements on BOTH sides (Spark
``F.aggregate`` / DuckDB ``list_reduce``), and output scores are
``round(x, 6)`` — so value hashes match bit-for-bit.

Oracle-checked outputs contain only scalar columns (no arrays) to keep
the hash comparison representation-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_vectordb_spark.functions.vector import cosine_similarity
from astro_vectordb_spark.operators.crud import (
    point_lookup,
    sync_merge,
    tombstone_delete,
    upsert_latest,
)
from astro_vectordb_spark.operators.topk import (
    batch_topk,
    similarity_join,
    topk_search,
)
from astro_vectordb_spark.session import load_table


# --------------------------------------------------------------------------
# helpers

def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _qvec(spark: SparkSession, sf_dir: str, vec_id: int = 0):
    """The user-supplied query vector (reference users pass vectors in;
    driver/driver.ts:290). Point lookup of one row."""
    return (
        _emb(spark, sf_dir).filter(F.col("vec_id") == vec_id).first()["embedding"]
    )


# --------------------------------------------------------------------------
# flagship

def entry(spark: SparkSession) -> DataFrame:
    """Exact top-K cosine search on sf0.001 (O1/O9 brute-force-exact)."""
    sf_dir = "/root/testdata/sf0.001"
    emb = _emb(spark, sf_dir)
    qv = _qvec(spark, sf_dir, 0)
    return topk_search(emb, qv, k=10, strength=20)


# --------------------------------------------------------------------------
# queries

def _q_topk_exact(spark, sf_dir):
    return topk_search(
        _emb(spark, sf_dir), _qvec(spark, sf_dir, 0), k=10, strength=20
    ).select("vec_id", "score")


def _q_topk_euclidean(spark, sf_dir):
    return topk_search(
        _emb(spark, sf_dir), _qvec(spark, sf_dir, 7), k=10, strength=0,
        metric="euclidean",
    ).select("vec_id", "score")


def _q_threshold_cap(spark, sf_dir):
    # strength 99 -> threshold capped at 0.95 (driver/driver.ts:296-298)
    return topk_search(
        _emb(spark, sf_dir), _qvec(spark, sf_dir, 3), k=10, strength=99
    ).select("vec_id", "score")


def _q_point_lookup(spark, sf_dir):
    return point_lookup(_emb(spark, sf_dir), 42).select("vec_id", "label")


def _q_tombstone_delete(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    doomed = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 97 == 0).collect()]
    marked = tombstone_delete(emb, doomed)
    return topk_search(
        marked, _qvec(spark, sf_dir, 0), k=10, strength=0, deleted_col="deleted"
    ).select("vec_id", "score")


def _q_upsert_keep_latest(spark, sf_dir):
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    updates = emb.filter(F.col("vec_id") % 7 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    inserts = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    merged = upsert_latest(emb, updates.unionByName(inserts))
    return merged.select(
        "vec_id", F.element_at("embedding", 1).cast("double").alias("e0")
    )


def _q_sync_merge(spark, sf_dir):
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    changed = F.col("vec_id") % 3 == 0
    empty = changed & (F.col("vec_id") % 5 == 0)
    incoming = (
        emb.filter(F.col("vec_id") % 3 != 2)
        .withColumn(
            "embedding",
            F.when(empty, F.array().cast("array<float>"))
            .when(changed, F.transform("embedding", lambda x: -x))
            .otherwise(F.col("embedding")),
        )
        .unionByName(
            emb.filter(F.col("vec_id") < 2).select(
                (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
            )
        )
    )
    out = sync_merge(emb, incoming, action_col="action")
    return out.select(
        "vec_id", "action", F.element_at("embedding", 1).cast("double").alias("e0")
    )


def _q_null_semantics(spark, sf_dir):
    # cosine(NULL, x) == -1.0 (similarity.ts:17)
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 10)
    masked = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, F.lit(None).cast("array<float>"))
        .otherwise(F.col("embedding")),
    )
    qv = _qvec(spark, sf_dir, 1)
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    return masked.select(
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), qcol), 6).alias("score"),
    )


def _q_batch_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return batch_topk(emb, queries, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


def _q_similarity_join(spark, sf_dir):
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 100)
    return similarity_join(emb, threshold=0.3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "topk_exact": _q_topk_exact,
        "topk_euclidean": _q_topk_euclidean,
        "threshold_cap": _q_threshold_cap,
        "point_lookup": _q_point_lookup,
        "tombstone_delete": _q_tombstone_delete,
        "upsert_keep_latest": _q_upsert_keep_latest,
        "sync_merge": _q_sync_merge,
        "null_semantics": _q_null_semantics,
        "batch_topk": _q_batch_topk,
        "similarity_join": _q_similarity_join,
    }


# --------------------------------------------------------------------------
# DuckDB oracles — same left-fold float64 math as the Spark kernels.

def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


def _cos(a: str, b: str) -> str:
    return f"({_dot(a, b)} / (sqrt({_dot(a, a)}) * sqrt({_dot(b, b)})))"


def _eucdist(a: str, b: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), "
        f"(acc, x) -> acc + x))"
    )


def _topk_oracle(query_vec_id: int, threshold: float, k: int, score_expr: str,
                 extra_where: str = "") -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
scored AS (
  SELECT e.vec_id, {score_expr} AS s
  FROM embeddings e CROSS JOIN q
  {extra_where}
)
SELECT vec_id, round(s, 6) AS score
FROM scored WHERE s > {threshold}
ORDER BY s DESC, vec_id LIMIT {k}
"""


def oracle_sql() -> dict[str, str]:
    cos = _cos("e.embedding", "qv")
    euc = f"(1.0 / (1.0 + {_eucdist('e.embedding', 'qv')}))"
    return {
        "topk_exact": _topk_oracle(0, 0.2, 10, cos),
        "topk_euclidean": _topk_oracle(7, 0.0, 10, euc),
        "threshold_cap": _topk_oracle(3, 0.95, 10, cos),
        "point_lookup": "SELECT vec_id, label FROM embeddings WHERE vec_id = 42",
        "tombstone_delete": _topk_oracle(
            0, 0.0, 10, cos, "WHERE e.vec_id % 97 <> 0"
        ),
        "upsert_keep_latest": """
SELECT vec_id,
       CASE WHEN vec_id % 7 = 0 THEN -embedding[1]::DOUBLE
            ELSE embedding[1]::DOUBLE END AS e0
FROM embeddings
UNION ALL
SELECT vec_id + 100000 AS vec_id, embedding[1]::DOUBLE AS e0
FROM embeddings WHERE vec_id < 3
""",
        "sync_merge": """
SELECT vec_id,
       CASE
         WHEN vec_id % 3 = 2 THEN 'keep'
         WHEN vec_id % 3 = 0 AND vec_id % 5 = 0 THEN 'skip_empty'
         WHEN vec_id % 3 = 0 THEN 'update'
         ELSE 'keep'
       END AS action,
       CASE WHEN vec_id % 3 = 0 AND vec_id % 5 <> 0
            THEN -embedding[1]::DOUBLE
            ELSE embedding[1]::DOUBLE END AS e0
FROM embeddings
UNION ALL
SELECT vec_id + 100000 AS vec_id, 'insert' AS action,
       embedding[1]::DOUBLE AS e0
FROM embeddings WHERE vec_id < 2
""",
        "null_semantics": f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
SELECT e.vec_id,
       CASE WHEN e.vec_id % 2 = 0 THEN -1.0
            ELSE round({cos}, 6) END AS score
FROM embeddings e CROSS JOIN q
WHERE e.vec_id < 10
""",
        "batch_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.query_id, e.vec_id, {cos} AS s
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, s,
         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rank
  FROM scored WHERE s > 0.0
)
SELECT query_id, vec_id, round(s, 6) AS score, rank
FROM ranked WHERE rank <= 5
""",
        "similarity_join": f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round({_cos('a.embedding', 'b.embedding')}, 6) AS score
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 100 AND b.vec_id < 100
  AND {_cos('a.embedding', 'b.embedding')} > 0.3
""",
    }
