"""SQL surface: the engine's operators as plain ``spark.sql`` text.

Every DataFrame operator compiles to the same Catalyst plans as SQL;
this module makes that surface explicit — register the tables, run the
templates.  Useful for SQL-first users and for BI/notebook contexts
where query text is the interface.

The similarity kernel templates use the same strict-left-fold float64
formulation as functions.vector (``aggregate``/``zip_with`` in Spark
SQL syntax), so SQL results are bit-identical to the DataFrame API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register the corpus parquet tables as temp views."""
    from astro_vectordb_spark.session import load_table

    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


COSINE_SQL = """
aggregate(
  zip_with(transform({a}, x -> cast(x as double)),
           transform({b}, x -> cast(x as double)),
           (x, y) -> x * y),
  cast(0.0 as double), (acc, x) -> acc + x)
/ (sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),
        cast(0.0 as double), (acc, x) -> acc + x))
 * sqrt(aggregate(transform({b}, x -> cast(x as double) * cast(x as double)),
        cast(0.0 as double), (acc, x) -> acc + x)))
"""


def topk_sql(query_vector, k: int = 10, threshold: float = 0.2) -> str:
    """Exact top-K cosine search as a SQL string over ``embeddings``."""
    qv = "array(" + ", ".join(f"cast({float(x)} as float)" for x in query_vector) + ")"
    cos = COSINE_SQL.format(a="embedding", b=qv)
    return f"""
SELECT vec_id, round(s, 6) AS score
FROM (SELECT vec_id, {cos} AS s FROM embeddings)
WHERE s > {threshold}
ORDER BY s DESC, vec_id
LIMIT {k}
"""


def run_topk(spark: SparkSession, query_vector, k: int = 10,
             threshold: float = 0.2) -> DataFrame:
    return spark.sql(topk_sql(query_vector, k, threshold))
