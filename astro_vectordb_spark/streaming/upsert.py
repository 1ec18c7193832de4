"""Structured Streaming mutation path.

The reference's only "stream" is a FIFO mutation queue that serializes
every write (driver/driver.ts:25-80, SURVEY.md O32).  The Spark-native
equivalent is ``foreachBatch``: micro-batches are applied one at a
time, in order, with exactly-once semantics against the sink — the same
one-batch-at-a-time guarantee, minus the reference's
whole-index-rewrite-per-row write amplification (astrovault.ts:34-40).

``stream_sync_merge`` is the streaming face of the diff-aware merge
(syncVectorsFromCloud, driver/worker.ts:3-44): each micro-batch of
(id, vector) updates is merged into the parquet-backed vector table
with insert / skip-unchanged / replace-changed / skip-empty routing.

Scale notes: per micro-batch the merge is one keyed shuffle of
(current x batch); watermarking/dedup of the update stream happens
upstream with ``withWatermark`` + ``dropDuplicates`` on the key.  The
overwrite sink here is the local-harness stand-in for a transactional
table format; the operator itself is sink-agnostic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from astro_vectordb_spark.operators.crud import sync_merge, upsert_latest


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_path: str,
    merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    id_col: str = "vec_id",
    checkpoint: str | None = None,
    query_name: str = "astro_upsert",
):
    """Attach a keep-latest (or custom) merge to a streaming DataFrame.

    Returns the started StreamingQuery.  Each micro-batch B does:
      current = read(target);  merged = merge_fn(current, B);
      write(merged) -> target  (read fully before overwrite).
    """
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        merged = _merge_batch(spark, batch_df, target_path, merge_fn, id_col)
        # _merge_batch materialized the plan (localCheckpoint), so
        # overwriting the files it read from is safe
        merged.write.mode("overwrite").parquet(target_path)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def _merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    target_path: str,
    merge_fn,
    id_col: str,
) -> DataFrame:
    import os

    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
    else:
        current = spark.createDataFrame([], batch_df.schema)
    fn = merge_fn or (lambda cur, b: upsert_latest(cur, b, id_col=id_col))
    # materialize eagerly: the overwrite would otherwise clobber the
    # files this plan still needs to read
    return fn(current, batch_df).localCheckpoint(eager=True)


def stream_sync_merge(
    stream_df: DataFrame,
    target_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint: str | None = None,
):
    """Streaming diff-aware merge (syncVectorsFromCloud semantics)."""
    return foreach_batch_upsert(
        stream_df,
        target_path,
        merge_fn=lambda cur, b: sync_merge(cur, b, id_col=id_col, vec_col=vec_col),
        id_col=id_col,
        checkpoint=checkpoint,
        query_name="astro_sync_merge",
    )
