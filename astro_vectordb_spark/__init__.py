"""astro_vectordb_spark — a PySpark-native batch vector analytics engine.

A from-scratch re-expression of the capabilities of the reference
``Tej-Sharma/astro-vectordb`` (an in-browser HNSW vector database; see
SURVEY.md) as a Spark DataFrame library:

- vector kernels (cosine / euclidean) as pure Catalyst expressions
  (reference: similarity.ts:1-41),
- exact and approximate top-K similarity search (reference:
  hnsw.ts:241-299 ``searchKNNOptimized``),
- CRUD / upsert / diff-aware merge on the embeddings table (reference:
  driver/driver.ts:115-282, driver/worker.ts:3-44),
- parquet-backed persistence (reference: astrovault.ts),
- plus the large-scale training-data pipeline operators this capability
  set generalizes to: near-duplicate deduplication, similarity join,
  text analysis, multimodal column plumbing.

Design rule: every operator is ``DataFrame -> DataFrame``, declared with
built-in ``pyspark.sql.functions`` so Catalyst/Tungsten optimize and
whole-stage-codegen it.  Python UDFs only where semantics genuinely
require them (Arrow-batched, never per-row).
"""

from astro_vectordb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
