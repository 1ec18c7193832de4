"""Persisted SemDeDup index faces (round-13; see the module comment
below for the design).  Lives in its own module: the shared lifecycle
implementation is sources/index_lifecycle.py and these faces are thin
parameterizations of it — exactly like the minhash/RP faces in
sources/vault.py, split out so the vault module stays bounded."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_vectordb_spark.sources.vault import _read_maybe_swapped

# ---------------------------------------------------------------------------
# Persisted SemDeDup index — round-12 verdict item "SemDeDup
# steady-state face".  semantic_dedup (operators/dedup.py) is the
# one-shot form: every run re-assigns the WHOLE corpus to centroids and
# re-searches every cell — at 100 TB that is a full-corpus pass per
# policy run.  These faces persist the fitted centroids + per-cell
# assignments once and give the family the same steady-state lifecycle
# as the minhash and RP indexes (one shared implementation:
# sources/index_lifecycle.py): a new batch assigns ONLY ITSELF against
# the stored centroids and joins the compact cell table — per-batch
# cost independent of corpus size.
#
# Data model under ``path``:
#   vecs/        (id, embedding)   — exact-verification side
#   cells/       (id, cell_id)     — partitioned by cell_id: a batch's
#                                    candidate join prunes at file
#                                    level to the cells it touches
#   centroids/   (cell_id, centroid) — the "hash family"
#   _meta        k, metric, id_col, vec_col, dim, n_rows
#
# Assignment runs through the expression similarity kernel (broadcast
# centroid join + map-side max_by argmax, ties by cell_id ascending) —
# bit-identical to the DuckDB fold, so with caller-supplied centroid
# literals the WHOLE lifecycle is oracle-replayable (the driver gate
# rides this face).  Within-cell verification is the exact cosine;
# cross-cell near-dups are out of scope by design (SemDeDup semantics,
# Abbas et al. 2023) — that is the RP index's job.


def _semdedup_family():
    from astro_vectordb_spark.sources.index_lifecycle import SemDeDupFamily

    return SemDeDupFamily()


def save_semdedup_index(
    df: DataFrame,
    path: str,
    centroids: DataFrame | None = None,
    k_cells: int = 64,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """Build + persist the SemDeDup index: fit (or take) the
    centroids, store them, assign the corpus once (the expensive
    pass), store vectors + cell assignments + _meta.

    ``centroids`` (opt-in): a caller-supplied ``(cell_id, centroid)``
    DataFrame replaces the kmeans fit — the bring-your-own-centroids
    face (a prior fit, a taxonomy, fixed literals for the oracle).
    Otherwise centroids fit on a bounded driver-side sample
    (``ann.ivf_build_sampled``'s deterministic NumPy Lloyd's — the
    fit never scales with the corpus)."""
    from astro_vectordb_spark.sources.index_lifecycle import save_index

    spark = df.sparkSession
    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    if centroids is None:
        from astro_vectordb_spark.operators.ann import ivf_build_sampled

        _, centroids = ivf_build_sampled(
            df.select(id_col, vec_col), k_cells=k_cells, metric=metric,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    cents = centroids.select("cell_id", "centroid")
    cents.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    k = spark.read.parquet(os.path.join(path, "centroids")).count()
    params = {"k": int(k), "metric": str(metric), "id_col": str(id_col),
              "vec_col": str(vec_col), "dim": int(dim)}
    save_index(
        df, path, _semdedup_family(), params,
        meta_values=(int(k), str(metric), str(id_col), str(vec_col),
                     int(dim)),
    )


def load_semdedup_index(spark: SparkSession, path: str):
    """-> (vecs df, cells df, centroids df, meta dict)."""
    from astro_vectordb_spark.sources.index_lifecycle import load_index

    vecs, cells, meta = load_index(spark, path, _semdedup_family())
    cents = _read_maybe_swapped(spark, os.path.join(path, "centroids"))
    return vecs, cells, cents, meta


def semdedup_match_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    eps: float = 0.95,
    max_bucket_size: int | None = None,
    telemetry: dict | None = None,
) -> DataFrame:
    """Match a NEW batch of vectors against the persisted SemDeDup
    index: assign the batch to the stored centroids (broadcast join +
    argmax — the batch only; the corpus is never re-assigned), join
    its cell ids against the compact cell table, verify candidates
    with the exact cosine at ``eps``.  Returns
    ``(new_id, hist_id, score)``, score rounded to 6.  Same hot-cell
    cap + telemetry contract as the sibling families (one boilerplate
    mega-cluster = one hot cell_id)."""
    from astro_vectordb_spark.sources.index_lifecycle import match_index

    return match_index(
        spark, path, _semdedup_family(), new_rows, threshold=eps,
        max_bucket_size=max_bucket_size, telemetry=telemetry,
    )


def semdedup_append_to_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
) -> dict:
    """Incremental insert: assign the new vectors against the STORED
    centroids and append their vector + cell files — touched-files-
    only, (op='semdedup_append', batch_id) replay log, the shared
    crash-self-healing cell sync (vectors append before cells; the
    cell append derives from the stored vec-vs-cell id diff)."""
    from astro_vectordb_spark.sources.index_lifecycle import append_to_index

    return append_to_index(
        spark, path, _semdedup_family(), new_rows, batch_id=batch_id,
        dedup_ids=dedup_ids,
    )


def semdedup_remove_from_index(
    spark: SparkSession,
    path: str,
    ids,
    batch_id: int | None = None,
    op: str = "semdedup_remove",
) -> dict:
    """Physical delete — file-granular on both tables, cells first
    (the shared buckets-first crash ordering)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        remove_from_index,
    )

    return remove_from_index(
        spark, path, _semdedup_family(), ids, batch_id=batch_id, op=op
    )


def semdedup_compact_index(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction (shared contract): staged-swap rewrite
    of both tables, cells re-derived from the compacted vectors
    against the stored centroids."""
    from astro_vectordb_spark.sources.index_lifecycle import compact_index

    return compact_index(
        spark, path, _semdedup_family(),
        target_rows_per_file=target_rows_per_file,
        min_file_ratio=min_file_ratio,
    )


def semdedup_index_groups(
    spark: SparkSession,
    path: str,
    eps: float = 0.95,
    keep: str = "min_id",
    max_cluster_rows: int | None = None,
) -> DataFrame:
    """Corpus-wide SemDeDup of the ALREADY-INGESTED corpus from its
    persisted index alone — the corpus is never re-assigned: the
    stored cell table self-joins within cells (a_id < b_id), the
    stored vectors verify with the exact cosine at ``eps``, connected
    components collapse transitive groups, one representative per
    group survives — ``keep='min_id'`` (the deterministic contract the
    sibling sweeps use, oracle-replayable) or ``keep='farthest'``
    (the paper's rule: the member with the LOWEST centroid cosine,
    ties by id ascending).  Singletons keep themselves; members of a
    cell capped out of the pair search (``max_cluster_rows``) keep
    themselves — the guard can only under-dedup.  Returns the KEEP
    set, one ``(id_col)`` row per surviving vector."""
    from astro_vectordb_spark.functions.vector import similarity
    from astro_vectordb_spark.operators.dedup import connected_components
    from astro_vectordb_spark.sources.index_lifecycle import (
        IndexCtx,
        bucket_self_pairs,
        keep_from_pairs,
        verify_pairs,
    )

    if keep not in ("min_id", "farthest"):
        raise ValueError(f"semdedup_index_groups: unknown keep rule {keep!r}")
    fam = _semdedup_family()
    vecs, cells, cents, meta = load_semdedup_index(spark, path)
    ctx = IndexCtx(spark, path, meta)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    cand = bucket_self_pairs(
        cells, fam.bucket_keys, id_col, max_bucket_size=max_cluster_rows,
        unique_assignment=True,
    )
    pairs = verify_pairs(ctx, fam, cand, vecs, eps)
    if keep == "min_id":
        return keep_from_pairs(vecs, pairs, id_col)
    comp = connected_components(pairs)
    # the paper's rule: per group keep the member with the LOWEST
    # centroid cosine (the least-typical exemplar), ties id-ascending
    csim = (
        vecs.join(cells.select(id_col, "cell_id"), id_col)
        .join(F.broadcast(cents.select("cell_id", "centroid")), "cell_id")
        .withColumn(
            "_cs",
            similarity(F.col(vec_col), F.col("centroid"), meta["metric"]),
        )
        .select(F.col(id_col).alias("id"), "_cs")
    )
    from pyspark.sql import Window

    ranked = comp.join(csim, "id").withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("component").orderBy(
                F.col("_cs").asc(), F.col("id").asc()
            )
        ),
    )
    survivors = ranked.filter(F.col("_rk") == 1).select(
        F.col("id").alias(id_col)
    )
    singletons = vecs.select(id_col).distinct().join(
        comp.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    return survivors.unionByName(singletons)


def semdedup_apply_groups(
    spark: SparkSession,
    path: str,
    eps: float = 0.95,
    keep: str = "min_id",
    batch_id: int | None = None,
    max_cluster_rows: int | None = None,
) -> dict:
    """One-call retroactive sweep-APPLY (the shared contract): compute
    the keep set from the index alone, physically remove every loser
    from vectors AND cells (replay-logged under op='semdedup_sweep'),
    report {kept, removed_rows, skipped_replay}.  Fixpoint after."""
    from astro_vectordb_spark.sources.index_lifecycle import apply_groups

    return apply_groups(
        spark, path, _semdedup_family(),
        keep_fn=lambda: semdedup_index_groups(
            spark, path, eps=eps, keep=keep,
            max_cluster_rows=max_cluster_rows,
        ),
        batch_id=batch_id,
    )
