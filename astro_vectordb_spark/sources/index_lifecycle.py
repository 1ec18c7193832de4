"""Shared lifecycle core for persisted near-dup bucket indexes.

Every persisted near-dup index in this package is the same physical
shape under its ``path``:

    <primary>/   (id, <value>)        — the exact-verification side
    <buckets>/   (id, <bucket keys>)  — the blocking side, partitioned
    _meta        one row: hash-family parameters + ``n_rows``
    _batches     (op, batch_id)-namespaced replay log

and the same steady-state lifecycle: save → match a new batch (bucket
the BATCH only, keyed join against the compact bucket table, verify
candidates exactly) → append (replay-logged, crash-self-healing
bucket sync) → remove (file-granular, buckets-first) → retroactive
sweep (bucket self-join → verify → connected components → keep one
representative) → compact (staged-swap rewrite, buckets re-derived
from the primary).  Three families ride it — MinHash text
fingerprints, RP-LSH embedding buckets, and SemDeDup centroid cells —
differing only in three kernels:

    encode(ctx, batch)         raw rows → primary rows
    bucketize(ctx, primary)    primary rows → (id, *bucket_keys)
    pair_score(ctx, a, b)      two primary values → similarity Column

This module is the single implementation of everything else (the
round-12 verdict's "extract the shared index-lifecycle core"): the
per-family faces in :mod:`astro_vectordb_spark.sources.vault` are thin
parameterizations.  Behavioral contracts (replay-log namespacing,
crash-consistency ordering, hot-bucket guards, telemetry, oracle-exact
arithmetic) are documented on the vault faces and verified by the
family test suites; the prose there applies verbatim here.

Reference parity: the reference persists its whole index as one JSON
blob (``toJSON``/``fromJSON``, astrovault.ts:86-116) and has no
incremental maintenance at all — these faces are the 100 TB-shaped
replacement (per-batch cost independent of corpus size), not a port.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class IndexCtx:
    """Per-call context handed to family kernels: the session, the
    index root (for families that lazily load extra artifacts, e.g.
    SemDeDup's centroid table), and the _meta dict (hash-family
    parameters; at save time, the params about to become _meta)."""

    spark: SparkSession
    path: str | None
    meta: dict


class BucketIndexFamily:
    """One persisted-index family: table names, bucket keys, replay-log
    op namespaces, and the three kernels.  Subclasses override the
    kernels; everything else is data."""

    name: str
    primary_table: str
    bucket_table: str
    bucket_keys: tuple[str, ...]
    partition_col: str | None
    append_op: str
    sweep_op: str
    removed_key: str  # report key naming what a remove counts
    score_col: str
    score_is_geq: bool  # filter at >= threshold (est) vs > (cosine)
    round_before_filter: bool  # minhash filters the ROUNDED estimate
    meta_schema: str  # must end with "n_rows long"
    # True when bucketize assigns each id to EXACTLY ONE bucket
    # (SemDeDup's argmax cell): the candidate joins then cannot emit a
    # duplicate (id, id) pair, so the post-join .distinct() — a full
    # shuffle of the pair stream — is skipped as a provable identity.
    # Multi-table families (minhash bands, RP tables) need the dedup.
    unique_assignment: bool = False

    def value_col(self, meta: dict) -> str:
        raise NotImplementedError

    def encode(self, ctx: IndexCtx, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def bucketize(self, ctx: IndexCtx, primary: DataFrame) -> DataFrame:
        raise NotImplementedError

    def pair_score(self, ctx: IndexCtx, a, b):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# generic lifecycle ops.  ``vault`` is imported lazily: it holds the
# shared low-level plumbing (staged swaps, replay log, meta counter)
# and the thin public faces that call back into this module.


def _v():
    from astro_vectordb_spark.sources import vault

    return vault


def load_index(spark: SparkSession, path: str, family: BucketIndexFamily):
    """-> (primary df, buckets df, meta dict)."""
    v = _v()
    meta = v._read_meta(spark, path)
    primary = v._read_maybe_swapped(
        spark, os.path.join(path, family.primary_table)
    )
    buckets = v._read_maybe_swapped(
        spark, os.path.join(path, family.bucket_table)
    )
    return primary, buckets, meta


def save_index(
    df: DataFrame,
    path: str,
    family: BucketIndexFamily,
    params: dict,
    meta_values: tuple,
) -> None:
    """Build + persist: encode the corpus once (the expensive pass),
    derive the bucket table from the WRITTEN primary files, write the
    one-row _meta carrying ``meta_values + (n_rows,)``."""
    spark = df.sparkSession
    ctx = IndexCtx(spark, path, dict(params))
    id_col = params["id_col"]
    pp = os.path.join(path, family.primary_table)
    family.encode(ctx, df).write.mode("overwrite").parquet(pp)
    stored = spark.read.parquet(pp)
    w = family.bucketize(ctx, stored).write.mode("overwrite")
    if family.partition_col:
        w = w.partitionBy(family.partition_col)
    w.parquet(os.path.join(path, family.bucket_table))
    n_rows = stored.select(id_col).distinct().count()
    spark.createDataFrame(
        [tuple(meta_values) + (int(n_rows),)], family.meta_schema
    ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))


def match_index(
    spark: SparkSession,
    path: str,
    family: BucketIndexFamily,
    new_rows: DataFrame,
    threshold: float,
    max_bucket_size: int | None = None,
    telemetry: dict | None = None,
    bucketize=None,
) -> DataFrame:
    """Batch-vs-history match: encode + bucket the BATCH only, keyed
    join against the compact bucket table (semi-join-pruned to the
    batch's buckets when capping/telemetry is on), verify candidates
    with the family's exact pair score.  Returns
    (new_id, hist_id, <score_col>).  ``bucketize`` overrides the
    batch-side bucket kernel (the multi-probe dial)."""
    v = _v()
    primary, buckets, meta = load_index(spark, path, family)
    ctx = IndexCtx(spark, path, meta)
    id_col = meta["id_col"]
    # both sides of the batch plan are pinned lazily: the encode pass
    # (shingling/signing) feeds the verify join, the bucket kernel
    # feeds BOTH the touched-bucket prune and the candidate join —
    # without the pins either would recompute per consumer
    enc = family.encode(ctx, new_rows).localCheckpoint(eager=False)
    nb = (bucketize or family.bucketize)(ctx, enc).localCheckpoint(
        eager=False
    )
    keys = list(family.bucket_keys)
    hist = buckets.select(F.col(id_col).alias("hist_id"), *keys)
    if max_bucket_size is not None or telemetry is not None:
        touched = nb.select(*keys).distinct()
        hist = hist.join(touched, keys, "left_semi")
    if telemetry is not None:
        # PRE-cap skew over exactly the buckets this batch joins
        telemetry.update(
            v._bucket_witness_stats(hist, "hist_id", keys=tuple(keys))
        )
    if max_bucket_size is not None:
        w = Window.partitionBy(*keys).orderBy("hist_id")
        hist = (
            hist.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(max_bucket_size))
            .drop("_rn")
        )
    cands = (
        nb.select(F.col(id_col).alias("new_id"), *keys)
        .join(hist, keys)
        .select("new_id", "hist_id")
    )
    if not family.unique_assignment:
        cands = cands.distinct()
    vcol = family.value_col(meta)
    scored = (
        cands.join(
            enc.select(F.col(id_col).alias("new_id"),
                       F.col(vcol).alias("_v_n")),
            "new_id",
        )
        .join(
            primary.select(F.col(id_col).alias("hist_id"),
                           F.col(vcol).alias("_v_h")),
            "hist_id",
        )
        .withColumn("_s", family.pair_score(ctx, F.col("_v_n"),
                                            F.col("_v_h")))
    )
    thr = F.lit(float(threshold))
    if family.round_before_filter:
        scored = scored.withColumn("_s", F.round("_s", 6))
    cond = F.col("_s") >= thr if family.score_is_geq else F.col("_s") > thr
    return scored.filter(cond).select(
        "new_id", "hist_id", F.round("_s", 6).alias(family.score_col)
    )


def append_to_index(
    spark: SparkSession,
    path: str,
    family: BucketIndexFamily,
    new_rows: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
    stats_fn=None,
) -> dict:
    """Incremental insert with the crash-self-healing bucket sync:
    primary rows append BEFORE bucket rows, and the bucket append
    derives from the stored primary-vs-bucket id diff (a crash between
    the two appends is repaired by the next append; the steady state
    short-circuits the diff with two count-distinct aggregations since
    bucket ids are always a subset of primary ids).

    ``stats_fn(ctx, fresh)`` (opt-in): called with the encoded
    post-dedup batch; its dict merges into the report.  The hook is
    how a family surfaces append-time telemetry — the SemDeDup face
    reports per-batch assignment-similarity drift vs the train-time
    baseline (the ``pq_append_to_index`` batch-MSE pattern) — without
    the core knowing the family's statistics.  A replay-skipped batch
    never calls it."""
    v = _v()
    if v._batch_already_committed(spark, path, batch_id,
                                  op=family.append_op):
        return {"appended_rows": 0, "repaired_rows": 0,
                "skipped_replay": True}
    primary, buckets, meta = load_index(spark, path, family)
    ctx = IndexCtx(spark, path, meta)
    id_col = meta["id_col"]
    fresh = family.encode(ctx, new_rows)
    if dedup_ids:
        fresh = fresh.join(primary.select(id_col), id_col, "left_anti")
    extra = stats_fn(ctx, fresh) if stats_fn is not None else {}
    n_primary_before = primary.select(id_col).distinct().count()
    n_bucket_before = buckets.select(id_col).distinct().count()
    if n_primary_before == n_bucket_before:
        backlog = 0
    else:
        backlog = (
            primary.join(buckets.select(id_col).distinct(), id_col,
                         "left_anti")
            .select(id_col).distinct().count()
        )
    pp = os.path.join(path, family.primary_table)
    fresh.write.mode("append").parquet(pp)
    all_primary = spark.read.parquet(pp)
    missing = all_primary.join(
        buckets.select(id_col).distinct(), id_col, "left_anti"
    )
    w = family.bucketize(ctx, missing).write.mode("append")
    if family.partition_col:
        w = w.partitionBy(family.partition_col)
    w.parquet(os.path.join(path, family.bucket_table))
    synced = missing.select(id_col).distinct().count()
    v._update_meta_n_rows(
        spark, path,
        absolute=all_primary.select(id_col).distinct().count(),
    )
    v._record_batch(spark, path, batch_id, op=family.append_op)
    # extra merges FIRST: a stats_fn returning a colliding key (e.g.
    # "appended_rows") must not overwrite the core replay/sync fields
    # callers depend on — core wins on collision.
    return {
        **extra,
        "appended_rows": int(max(synced - backlog, 0)),
        "repaired_rows": int(backlog),
        "skipped_replay": False,
    }


def remove_from_index(
    spark: SparkSession,
    path: str,
    family: BucketIndexFamily,
    ids,
    batch_id: int | None = None,
    op: str | None = None,
) -> dict:
    """Physical delete — file-granular on BOTH tables, buckets FIRST
    (the bucket-ids-subset-of-primary-ids invariant then holds at
    every instant; a crash leaves a primary row with no buckets,
    which the next append's self-heal re-buckets)."""
    v = _v()
    op = op or family.name + "_remove"
    if v._batch_already_committed(spark, path, batch_id, op=op):
        return {family.removed_key: 0, "skipped_replay": True}
    meta = v._read_meta(spark, path)
    id_col = meta["id_col"]
    pp = os.path.join(path, family.primary_table)
    bp = os.path.join(path, family.bucket_table)
    v._recover_swap(spark, pp)
    v._recover_swap(spark, bp)
    if isinstance(ids, DataFrame):
        ids_df = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    else:
        ids_df = spark.createDataFrame(
            [(int(x),) for x in ids], f"{id_col} long"
        ).distinct()
    ids_df = ids_df.localCheckpoint(eager=True)
    v._remove_rows_by_file(spark, bp, ids_df, id_col=id_col)
    _, _, n_removed = v._remove_rows_by_file(spark, pp, ids_df,
                                             id_col=id_col)
    if n_removed:
        v._update_meta_n_rows(spark, path, delta=-n_removed)
    v._record_batch(spark, path, batch_id, op=op)
    return {family.removed_key: int(n_removed), "skipped_replay": False}


def compact_index(
    spark: SparkSession,
    path: str,
    family: BucketIndexFamily,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction: a no-op below ``min_file_ratio`` x the
    ideal file count; otherwise both tables rewrite through the
    crash-safe staged swap, dropping duplicate ids and re-deriving
    buckets FROM the compacted primary (re-syncs any drift in one
    pass, preserving the bucket partitioning)."""
    v = _v()
    pp = os.path.join(path, family.primary_table)
    bp = os.path.join(path, family.bucket_table)
    v._recover_swap(spark, pp)
    v._recover_swap(spark, bp)
    meta = v._read_meta(spark, path)
    ctx = IndexCtx(spark, path, meta)
    id_col = meta["id_col"]
    primary = spark.read.parquet(pp)
    n_files = primary.select(F.col("_metadata.file_path")).distinct().count()
    n_rows = primary.count()
    ideal = max(1, -(-n_rows // target_rows_per_file))
    if n_files <= min_file_ratio * ideal:
        return {"compacted": False, "files": n_files,
                "files_before": n_files, "rows": n_rows}
    rows = primary.dropDuplicates([id_col])

    def _write_primary(staging: str) -> None:
        rows.repartition(ideal).write.mode("overwrite").parquet(staging)

    v._replace_dir(spark, _write_primary, pp)
    compacted = spark.read.parquet(pp)
    bk = family.bucketize(ctx, compacted)

    def _write_buckets(staging: str) -> None:
        w = bk.repartition(
            ideal, *( [family.partition_col] if family.partition_col else [])
        ).write.mode("overwrite")
        if family.partition_col:
            w = w.partitionBy(family.partition_col)
        w.parquet(staging)

    v._replace_dir(spark, _write_buckets, bp)
    v._update_meta_n_rows(
        spark, path,
        absolute=compacted.select(id_col).distinct().count(),
    )
    return {"compacted": True, "files": n_files, "files_before": n_files,
            "rows": n_rows, "target_files": ideal}


def keep_from_pairs(
    universe: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Connected components over verified pairs → min-id representative
    per component; ``universe`` rows that joined no pair (singletons)
    keep themselves.  The shared tail of every retroactive sweep."""
    from astro_vectordb_spark.operators.dedup import connected_components

    comp = connected_components(pairs)
    keep = comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )
    singletons = universe.select(id_col).distinct().join(
        comp.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )
    return keep.unionByName(singletons)


def bucket_self_pairs(
    buckets: DataFrame,
    keys: tuple[str, ...],
    id_col: str,
    max_bucket_size: int | None = None,
    unique_assignment: bool = False,
) -> DataFrame:
    """(a_id < b_id) candidate pairs from a bucket-table self-join,
    with the optional deterministic per-bucket witness cap.
    ``unique_assignment`` (one bucket per id — SemDeDup cells) skips
    the pair dedup shuffle: the self-join provably emits each pair
    once."""
    scope = buckets.select(id_col, *keys)
    if max_bucket_size is not None:
        w = Window.partitionBy(*keys).orderBy(id_col)
        scope = (
            scope.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= int(max_bucket_size))
            .drop("_rn")
        )
    a = scope.select(F.col(id_col).alias("a_id"), *keys)
    b = scope.select(F.col(id_col).alias("b_id"), *keys)
    pairs = (
        a.join(b, list(keys))
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    return pairs if unique_assignment else pairs.distinct()


def verify_pairs(
    ctx: IndexCtx,
    family: BucketIndexFamily,
    cands: DataFrame,
    primary: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-verify (a_id, b_id) candidates against the stored primary
    values; returns the surviving (a_id, b_id) pairs."""
    id_col = ctx.meta["id_col"]
    vcol = family.value_col(ctx.meta)
    scored = (
        cands.join(
            primary.select(F.col(id_col).alias("a_id"),
                           F.col(vcol).alias("_v_a")),
            "a_id",
        )
        .join(
            primary.select(F.col(id_col).alias("b_id"),
                           F.col(vcol).alias("_v_b")),
            "b_id",
        )
        .withColumn("_s", family.pair_score(ctx, F.col("_v_a"),
                                            F.col("_v_b")))
    )
    thr = F.lit(float(threshold))
    if family.round_before_filter:
        scored = scored.withColumn("_s", F.round("_s", 6))
    cond = F.col("_s") >= thr if family.score_is_geq else F.col("_s") > thr
    return scored.filter(cond).select("a_id", "b_id")


def apply_groups(
    spark: SparkSession,
    path: str,
    family: BucketIndexFamily,
    keep_fn,
    batch_id: int | None = None,
) -> dict:
    """One-call retroactive sweep-APPLY: compute the keep set from the
    index alone (``keep_fn()``), physically remove every loser from
    both tables (file-granular, replay-logged under the family's sweep
    namespace), report {kept, <removed_key>, skipped_replay}.  After
    it returns the index is a fixpoint: re-running removes nothing."""
    v = _v()
    if v._batch_already_committed(spark, path, batch_id,
                                  op=family.sweep_op):
        return {"kept": 0, family.removed_key: 0, "skipped_replay": True}
    # eager checkpoint: the keep plan reads the index being rewritten
    keep = keep_fn().localCheckpoint(eager=True)
    meta = v._read_meta(spark, path)
    id_col = meta["id_col"]
    losers = (
        spark.read.parquet(os.path.join(path, family.primary_table))
        .select(id_col)
        .distinct()
        .join(keep, id_col, "left_anti")
    )
    rep = remove_from_index(
        spark, path, family, losers, batch_id=batch_id, op=family.sweep_op
    )
    return {
        "kept": v._post_sweep_kept(spark, path, family.primary_table,
                                   id_col),
        family.removed_key: rep[family.removed_key],
        "skipped_replay": rep.get("skipped_replay", False),
    }


# ---------------------------------------------------------------------------
# the three families


class MinhashFamily(BucketIndexFamily):
    """Text near-dup fingerprints: SQL-safe minhash signatures, LSH
    band buckets, signature-agreement verification (the unbiased
    k/num_hashes Jaccard estimate, exact rationals end to end)."""

    name = "minhash"
    primary_table = "sigs"
    bucket_table = "bands"
    bucket_keys = ("band_idx", "band_sig")
    partition_col = "band_idx"
    append_op = "minhash_append"
    sweep_op = "minhash_sweep"
    removed_key = "removed_docs"
    score_col = "est_jaccard"
    score_is_geq = True
    round_before_filter = True
    meta_schema = "num_hashes int, bands int, n int, id_col string, n_rows long"

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def value_col(self, meta: dict) -> str:
        return "sig"

    def encode(self, ctx: IndexCtx, df: DataFrame) -> DataFrame:
        from astro_vectordb_spark.operators.dedup import (
            minhash_signatures_sql_safe,
        )

        m = ctx.meta
        return minhash_signatures_sql_safe(
            df, num_hashes=int(m["num_hashes"]), n=int(m["n"]),
            text_col=self.text_col, id_col=m["id_col"],
        )

    def bucketize(self, ctx: IndexCtx, primary: DataFrame) -> DataFrame:
        from astro_vectordb_spark.operators.dedup import minhash_band_table

        m = ctx.meta
        return minhash_band_table(
            primary, num_hashes=int(m["num_hashes"]),
            bands=int(m["bands"]), id_col=m["id_col"],
        )

    def pair_score(self, ctx: IndexCtx, a, b):
        nh = int(ctx.meta["num_hashes"])
        return (
            F.size(
                F.filter(F.zip_with(a, b, lambda x, y: x == y),
                         lambda v: v)
            ).cast("double")
            / F.lit(float(nh))
        )


class RPFamily(BucketIndexFamily):
    """Embedding near-dup: multi-table random-hyperplane buckets
    (float64 element-at-a-time fold — bit-identical to the SQL twin),
    exact-cosine verification over the index's own vector copy."""

    name = "rp"
    primary_table = "vecs"
    bucket_table = "buckets"
    bucket_keys = ("tbl", "cell")
    partition_col = "tbl"
    append_op = "rp_append"
    sweep_op = "rp_sweep"
    removed_key = "removed_rows"
    score_col = "score"
    score_is_geq = False
    round_before_filter = False
    meta_schema = (
        "n_planes int, n_tables int, seed int, dim int, metric string, "
        "id_col string, vec_col string, n_rows long"
    )

    def value_col(self, meta: dict) -> str:
        return meta["vec_col"]

    def encode(self, ctx: IndexCtx, df: DataFrame) -> DataFrame:
        m = ctx.meta
        return df.select(m["id_col"], m["vec_col"])

    def bucketize(self, ctx: IndexCtx, primary: DataFrame) -> DataFrame:
        from astro_vectordb_spark.operators.dedup import rp_cell_table

        m = ctx.meta
        return rp_cell_table(
            primary, n_planes=int(m["n_planes"]),
            n_tables=int(m["n_tables"]), seed=int(m["seed"]),
            id_col=m["id_col"], vec_col=m["vec_col"], dim=int(m["dim"]),
        )

    def pair_score(self, ctx: IndexCtx, a, b):
        from astro_vectordb_spark.functions.vector_np import (
            make_exact_pair_score_udf,
        )

        # Arrow exact-fold kernel (round 16): bit-identical to the
        # expression fold (same float64 products, same sequential
        # accumulation — vector_np._fold_dot_rows), ~7x its per-core
        # throughput on the pair-verify shape; the earlier note that
        # the fold beats the UNROLLED CODEGEN chain still holds — this
        # replaces the fold with a vectorized kernel, not with the
        # unrolled chain.  Pinned bitwise by
        # tests/test_exact_kernels_r16.py.
        return make_exact_pair_score_udf("cosine")(a, b)


class SemDeDupFamily(BucketIndexFamily):
    """SemDeDup (Abbas et al. 2023) as a PERSISTED index: the blocking
    structure is the centroid assignment itself — one cell per vector,
    the stored ``centroids/`` table the hash family.  Assignment runs
    through the expression similarity kernel (broadcast centroid join
    + per-vector argmax, ties by cell_id ascending) so the whole
    steady-state face stays oracle-replayable when the centroids are
    caller-supplied literals; a map-side ``max_by`` aggregation keeps
    it one shuffle-free pass rather than a window over n x k rows."""

    name = "semdedup"
    primary_table = "vecs"
    bucket_table = "cells"
    bucket_keys = ("cell_id",)
    partition_col = "cell_id"
    unique_assignment = True
    append_op = "semdedup_append"
    sweep_op = "semdedup_sweep"
    removed_key = "removed_rows"
    score_col = "score"
    score_is_geq = False
    round_before_filter = False
    # train_sim_mean / train_sim_p95: the save/refresh-time baseline of
    # per-vector assigned-centroid similarity — the yardstick the
    # append-time drift report compares each batch against (legacy
    # indexes lack the columns; loaders see None and the report omits
    # the baseline).  probe_margin (round 15): when set, the cells
    # table persists a margin-gated SECOND cell per thin-margin row
    # (``cell_id_2``) so history-side faces (groups/sweep) catch
    # near-dup pairs straddling a cell boundary INSIDE the stored
    # corpus — the batch-vs-history dial (match n_probes=) cannot see
    # those.  None (and every legacy index) = argmax-1 cells only.
    meta_schema = (
        "k int, metric string, id_col string, vec_col string, dim int, "
        "train_sim_mean double, train_sim_p95 double, "
        "probe_margin double, n_rows long"
    )

    def __init__(self) -> None:
        self._centroids = None

    def centroids(self, ctx: IndexCtx) -> DataFrame:
        if self._centroids is None:
            self._centroids = _v()._read_maybe_swapped(
                ctx.spark, os.path.join(ctx.path, "centroids")
            )
        return self._centroids

    def value_col(self, meta: dict) -> str:
        return meta["vec_col"]

    def encode(self, ctx: IndexCtx, df: DataFrame) -> DataFrame:
        m = ctx.meta
        return df.select(m["id_col"], m["vec_col"])

    def bucketize(self, ctx: IndexCtx, primary: DataFrame) -> DataFrame:
        from astro_vectordb_spark.functions.vector import similarity

        m = ctx.meta
        id_col, vec_col, metric = m["id_col"], m["vec_col"], m["metric"]
        cents = self.centroids(ctx).select("cell_id", "centroid")
        scored = (
            primary.select(id_col, vec_col)
            .crossJoin(F.broadcast(cents))
            .withColumn(
                "_as", similarity(F.col(vec_col), F.col("centroid"), metric)
            )
        )
        margin = m.get("probe_margin")
        if margin is None:
            # argmax by (similarity desc, cell_id asc) as ONE map-side
            # combinable aggregation: max_by over the ordering struct
            # (_as, -cell_id) — identical tie rule to the window form
            # the oracle replays, without shuffling n x k rows by id
            return scored.groupBy(id_col).agg(
                F.max_by(
                    "cell_id", F.struct(F.col("_as"), -F.col("cell_id"))
                ).alias("cell_id")
            )
        # probe_margin set: also persist the margin-gated runner-up
        # cell.  Same collect/sort/slice aggregation shape as the
        # batch-side multi-probe kernel (map-side combinable, k structs
        # per id — k is control-plane sized by construction: the
        # centroids fit on the driver); slot 1 IS the argmax tie rule,
        # so ``cell_id`` is bit-identical to the max_by path and
        # ``cell_id_2`` is null unless sim_1 - sim_2 <= margin.
        top = scored.groupBy(id_col).agg(
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_as").alias("s"),
                                (-F.col("cell_id")).alias("nc"),
                                F.col("cell_id").alias("cell_id"),
                            )
                        )
                    )
                ),
                1, 2,
            ).alias("_t")
        )
        return top.select(
            id_col,
            F.col("_t")[0]["cell_id"].alias("cell_id"),
            F.when(
                (F.size("_t") > 1)
                & (F.col("_t")[0]["s"] - F.col("_t")[1]["s"]
                   <= F.lit(float(margin))),
                F.col("_t")[1]["cell_id"],
            ).alias("cell_id_2"),
        )

    def pair_score(self, ctx: IndexCtx, a, b):
        # Arrow exact-fold kernel (round 16): bit-identical to the
        # expression similarity fold — see RPFamily.pair_score note
        # and tests/test_exact_kernels_r16.py.
        from astro_vectordb_spark.functions.vector_np import (
            make_exact_pair_score_udf,
        )

        return make_exact_pair_score_udf(ctx.meta["metric"])(a, b)


class SimhashFamily(BucketIndexFamily):
    """Text near-dup via SimHash (Manku et al., WWW'07) as a PERSISTED
    index — the fourth family over this core, and the proof that a new
    signature scheme costs three kernels, not a re-implementation:
    signatures are the primary value, pigeonhole chunks the buckets,
    and the pair score is the exact rational (bits - hamming) / bits
    (so the generic >= threshold filter expresses hamming <=
    max_hamming at threshold (bits - max_hamming) / bits).

    Two hash families share the lifecycle: ``sql_safe31`` (31-bit
    char-polynomial hash — every face DuckDB-replayable, the driver
    gate rides it) and ``native64`` (xxhash64 — the production
    discrimination; see dedup.simhash_pairs_sql_safe's
    discrimination-gap note)."""

    name = "simhash"
    primary_table = "sigs"
    bucket_table = "chunks"
    bucket_keys = ("chunk_idx", "chunk_val")
    partition_col = "chunk_idx"
    append_op = "simhash_append"
    sweep_op = "simhash_sweep"
    removed_key = "removed_docs"
    score_col = "sim_frac"
    score_is_geq = True
    round_before_filter = True
    meta_schema = (
        "bits int, max_hamming int, hash_family string, id_col string, "
        "n_rows long"
    )

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col

    def value_col(self, meta: dict) -> str:
        return "sim"

    def encode(self, ctx: IndexCtx, df: DataFrame) -> DataFrame:
        from astro_vectordb_spark.operators.dedup import (
            simhash_sql_table,
            simhash_table,
        )

        m = ctx.meta
        if m["hash_family"] == "native64":
            return simhash_table(df, self.text_col, m["id_col"])
        return simhash_sql_table(df, text_col=self.text_col,
                                 id_col=m["id_col"])

    def _chunks(self, meta: dict) -> list[tuple[int, int]]:
        from astro_vectordb_spark.operators.dedup import (
            SIMHASH_SQL_CHUNKS,
            native_simhash_chunks,
        )

        if meta["hash_family"] == "native64":
            return native_simhash_chunks(int(meta["max_hamming"]))
        return SIMHASH_SQL_CHUNKS

    def bucketize(self, ctx: IndexCtx, primary: DataFrame) -> DataFrame:
        from astro_vectordb_spark.operators.dedup import simhash_chunk_table

        return simhash_chunk_table(
            primary, self._chunks(ctx.meta), id_col=ctx.meta["id_col"]
        )

    def pair_score(self, ctx: IndexCtx, a, b):
        bits = int(ctx.meta["bits"])
        return (
            F.lit(float(bits))
            - F.bit_count(a.bitwiseXOR(b)).cast("double")
        ) / F.lit(float(bits))
