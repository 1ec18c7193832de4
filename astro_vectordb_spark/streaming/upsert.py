"""Structured Streaming mutation path.

The reference's only "stream" is a FIFO mutation queue that serializes
every write (driver/driver.ts:25-80, SURVEY.md O32).  The Spark-native
equivalent is ``foreachBatch``: micro-batches are applied one at a
time, in order, with exactly-once semantics against the sink — the same
one-batch-at-a-time guarantee, minus the reference's
whole-index-rewrite-per-row write amplification (astrovault.ts:34-40).

``stream_sync_merge`` is the streaming face of the diff-aware merge
(syncVectorsFromCloud, driver/worker.ts:3-44): each micro-batch of
(id, vector) updates is merged into the versioned vector table with
insert / skip-unchanged / replace-changed / skip-empty routing.

Sink: versioned manifest-swap commits (sources.versioned) — each batch
writes a fresh immutable version directory and atomically swaps the
``_CURRENT`` pointer, so concurrent readers never race a commit and
the merge plan never overwrites the files it is reading.

Scale notes: per micro-batch the merge is one keyed shuffle of
(current x batch); watermarking/dedup of the update stream happens
upstream with ``withWatermark`` + ``dropDuplicates`` on the key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.crud import sync_merge, upsert_latest
from astro_vectordb_spark.sources.versioned import commit_version, read_current


def apply_upsert_batch(
    batch_df: DataFrame,
    target_path: str,
    batch_id: int,
    merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    id_col: str = "vec_id",
) -> None:
    """Apply ONE write batch to the versioned table — the body of the
    reference's FIFO mutation loop (driver/driver.ts:25-80): read the
    live snapshot, merge the batch, commit a new version atomically.
    ``foreach_batch_upsert`` runs exactly this per micro-batch; callers
    composing batch-mode pipelines (read-your-writes checks, backfills)
    apply writes through the same code path."""
    spark = batch_df.sparkSession
    current = read_current(spark, target_path)
    if current is None:
        current = spark.createDataFrame([], batch_df.schema)
    fn = merge_fn or (lambda cur, b: upsert_latest(cur, b, id_col=id_col))
    commit_version(fn(current, batch_df), target_path, int(batch_id))


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
      current = read_current(target);  merged = merge_fn(current, B);
      commit_version(merged) -> atomic pointer swap.
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(
            batch_df, target_path, batch_id, merge_fn=merge_fn, id_col=id_col
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_index_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    seed: int = 42,
    query_name: str = "astro_index_ingest",
):
    """Streaming face of the LIVE index: each micro-batch of new
    (vec_id, embedding) rows is inserted into the persisted sharded
    HNSW graph via ``vault.hnsw_append_to_index`` — the reference's
    addPoint-per-mutation FIFO loop (driver/driver.ts:25-80 routing
    into hnsw.ts:82-173), minus its whole-snapshot rewrite: only the
    shard partitions that received vectors rewrite per batch, and
    foreachBatch gives the same one-batch-at-a-time ordering as the
    reference's queue.

    The level-draw seed varies per batch so repeated batches don't
    correlate; inserts stay deterministic per (batch, shard).
    """
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from astro_vectordb_spark.sources.vault import hnsw_append_to_index

        if batch_df.isEmpty():
            return
        hnsw_append_to_index(
            spark, index_path, batch_df, seed=seed + int(batch_id)
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


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


def stream_pq_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_pq_ingest",
):
    """Streaming ingest into a persisted PQ index: each micro-batch of
    (vec_id, embedding) rows is encoded under the EXISTING codebooks
    and appended to the codes table (``vault.pq_append_to_index``) —
    append-only files, no rewrite, one batch at a time.  Drift is the
    caller's monitoring concern: the batch MSE each append returns is
    logged per batch under this query's name."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from astro_vectordb_spark.sources.vault import pq_append_to_index

        if batch_df.isEmpty():
            return
        # batch_id makes a redelivered micro-batch a no-op (the append
        # keeps a tiny _batches commit log) — foreachBatch is
        # at-least-once, and a blind append would double-insert
        rep = pq_append_to_index(
            spark, index_path, batch_df, batch_id=int(batch_id)
        )
        mse = rep.get("batch_mse")
        print(
            f"{query_name} batch {batch_id}: +{rep['appended_rows']} rows"
            + (f", batch_mse={mse:.5f}" if mse is not None else " (replay)")
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_bm25_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_bm25_ingest",
):
    """Streaming ingest into a persisted BM25 lexical index: each
    micro-batch of (doc_id, text) rows merges into the term/corpus
    statistics (``vault.bm25_append_to_index`` — vocabulary-sized
    versioned commit, additive df counts) — the same foreachBatch
    one-batch-at-a-time shape as the vector-index ingests, with the
    ``_batches`` log making redelivery a no-op."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from astro_vectordb_spark.sources.vault import bm25_append_to_index

        if batch_df.isEmpty():
            return
        rep = bm25_append_to_index(
            spark, index_path, batch_df, batch_id=int(batch_id)
        )
        print(f"{query_name} batch {batch_id}: +{rep['appended_docs']} docs")

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def _pq_remove_batch(
    spark,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    compact_every: int | None,
    query_name: str,
) -> dict:
    """One micro-batch of the streaming PQ delete (module-level so the
    per-batch semantics are directly unit-testable): remove the ids,
    then — every ``compact_every``-th batch — compact the codes table,
    since each remove rewrites its touched files into fresh appended
    ones and delete traffic grows the file count without bound."""
    from astro_vectordb_spark.sources.vault import (
        pq_compact_index,
        pq_remove_from_index,
    )

    rep = pq_remove_from_index(
        spark, index_path, batch_df.select("vec_id"), batch_id=int(batch_id)
    )
    print(
        f"{query_name} batch {batch_id}: -{rep['removed_rows']} rows "
        f"({rep['touched_files']} files rewritten)"
    )
    if (
        compact_every
        and not rep.get("skipped_replay")
        and int(batch_id) > 0
        and int(batch_id) % int(compact_every) == 0
    ):
        crep = pq_compact_index(spark, index_path)
        if crep.get("compacted"):
            print(
                f"{query_name} batch {batch_id}: compacted "
                f"{crep['files_before']} -> {crep['target_files']} files"
            )
        rep["compaction"] = crep
    return rep


def stream_pq_remove(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    compact_every: int | None = None,
    query_name: str = "astro_pq_remove",
):
    """Streaming DELETE face for a persisted PQ / IVF-PQ index — the
    lifecycle symmetry partner of ``stream_pq_ingest``: each
    micro-batch of (vec_id) rows is physically removed from the codes
    table via ``vault.pq_remove_from_index`` (touched-files-only
    rewrite), so a churn stream — GDPR erasure, retention expiry,
    upstream tombstones — keeps the compressed index from silently
    accumulating dead candidates.  ``batch_id`` rides the same
    ``_batches`` log as the appends, making at-least-once redelivery
    a no-op.  ``compact_every=N`` runs ``vault.pq_compact_index``
    after every Nth applied batch (remove rewrites touched files into
    fresh ones, so file count grows with delete traffic; compaction is
    a no-op while the table stays well-sized)."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _pq_remove_batch(
            spark, index_path, batch_df, batch_id, compact_every, query_name
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()

def stream_hnsw_remove(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_hnsw_remove",
    mode: str = "auto",
    min_degree_frac: float = 0.5,
    auto_repair: bool = False,
    repair_every: int | None = None,
    health_threshold: float | None = None,
):
    """Streaming DELETE face for a persisted sharded HNSW index — the
    graph-side partner of ``stream_pq_remove``: each micro-batch of
    (vec_id) rows is physically removed via
    ``vault.hnsw_remove_from_index`` (edge-sweep for small batches,
    touched-shard rebuild for heavy losses; ``mode`` as documented
    there).  Each applied batch's report carries the per-shard
    graph-health verdict, and ``auto_repair=True`` triggers
    ``hnsw_rebalance(min_degree_frac=...)`` the moment sweep churn
    degrades a shard below the floor — the continuous-churn deployment
    (GDPR erasure, retention expiry) keeps its recall without a
    scheduled maintenance job.  ``batch_id`` rides the namespaced
    ``_batches`` log (op='hnsw_remove'), so sharing the index with an
    ingest stream is safe and at-least-once redelivery is a no-op.

    ``repair_every=N`` adds a PERIODIC full-index maintenance pass:
    after every N batches this stream applies (replay-skipped batches
    don't count), ``vault.hnsw_rebalance`` sweeps ALL shards and
    rebuilds any whose mean live level-0 degree has fallen below
    ``health_threshold * m`` (default: ``min_degree_frac``) — the
    belt to per-batch ``auto_repair``'s suspenders: per-batch repair
    only examines the shards the batch touched at that batch's
    health, so erosion that accrues BELOW the threshold per batch but
    ABOVE it across many batches (the long-running erasure stream) is
    caught here instead of waiting for a manual maintenance run.
    The pass costs one graph-wide degree aggregation every N batches;
    size N to the erosion rate (a stream deleting ~1%% of a shard per
    batch is safe with N ~ 10)."""
    from astro_vectordb_spark.sources.vault import (
        hnsw_rebalance,
        hnsw_remove_from_index,
    )

    spark = stream_df.sparkSession
    applied = {"n": 0}
    floor = (
        float(health_threshold)
        if health_threshold is not None
        else float(min_degree_frac)
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rep = hnsw_remove_from_index(
            spark, index_path, batch_df.select("vec_id"),
            batch_id=int(batch_id), mode=mode,
            min_degree_frac=min_degree_frac, auto_repair=auto_repair,
        )
        flagged = rep.get("needs_repair", [])
        print(
            f"{query_name} batch {batch_id}: -{rep['removed_rows']} rows "
            f"(swept {rep.get('swept_shards', [])}, rebuilt "
            f"{rep.get('rebuilt_shards', [])}"
            + (f", repair needed on {flagged}" if flagged else "")
            + (", repaired" if rep.get("repaired") else "")
            + ")"
        )
        if rep.get("skipped_replay"):
            return
        applied["n"] += 1
        if repair_every and applied["n"] % int(repair_every) == 0:
            repaired = hnsw_rebalance(
                spark, index_path, min_degree_frac=floor
            )
            print(
                f"{query_name}: periodic health pass after "
                f"{applied['n']} batches -> "
                + (f"rebuilt shards {sorted(repaired)}" if repaired
                   else "all shards healthy")
            )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_ivf_remove(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_ivf_remove",
):
    """Streaming DELETE face for a persisted IVF index: each
    micro-batch of (vec_id) rows is physically removed via
    ``vault.ivf_remove_from_index`` (touched-files-only rewrite;
    touched cells' radius stats recomputed so exact-path pruning
    tightens back).  ``batch_id`` rides the namespaced ``_batches``
    log (op='ivf_remove') — safe beside an ingest stream on the same
    index, idempotent under redelivery."""
    from astro_vectordb_spark.sources.vault import ivf_remove_from_index

    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rep = ivf_remove_from_index(
            spark, index_path, batch_df.select("vec_id"),
            batch_id=int(batch_id),
        )
        print(
            f"{query_name} batch {batch_id}: -{rep['removed_rows']} rows "
            f"({rep['touched_files']} files, cells "
            f"{rep.get('touched_cells', [])})"
        )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_bm25_remove(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_bm25_remove",
):
    """Streaming DELETE face for a persisted BM25 lexical index — the
    lifecycle symmetry partner of ``stream_bm25_ingest``: each
    micro-batch of (doc_id, text) rows is subtracted from the
    term/corpus statistics via ``vault.bm25_remove_from_index``
    (exact decrements; vocabulary-sized versioned commit), so an
    erasure/retention stream keeps lexical scores consistent with the
    shrinking corpus.  The batch must carry the documents' ORIGINAL
    text (read it from the corpus table before deleting there).
    ``batch_id`` rides the op-namespaced applied-batch log
    (op='remove') — safe beside ``stream_bm25_ingest`` on the same
    index even though the two streams number micro-batches
    independently; redelivery is a no-op."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        from astro_vectordb_spark.sources.vault import bm25_remove_from_index

        if batch_df.isEmpty():
            return
        rep = bm25_remove_from_index(
            spark, index_path, batch_df, batch_id=int(batch_id)
        )
        print(f"{query_name} batch {batch_id}: -{rep['removed_docs']} docs")

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def _minhash_ingest_batch(
    spark,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    drop_dups: bool,
    threshold: float,
    query_name: str,
    max_bucket_size: int | None = None,
) -> dict:
    """One micro-batch of the streaming near-dup-index ingest
    (module-level so the per-batch semantics are directly
    unit-testable): with ``drop_dups``, the batch first dedups
    AGAINST ITSELF (two near-copies of a brand-new doc arriving in
    one micro-batch — neither is in the historical index, so the
    historical match alone would append both), then MATCHES against
    the persisted fingerprint index and appends only the novel docs —
    the steady-state dedup-at-ingest shape (new data dedups against
    everything ever ingested without re-reading any of it) — through
    the replayable ``minhash_append_to_index``.

    The intra-batch pass is one keyed self-join over batch-sized
    input: batch signatures under the index's stored hash family,
    rep-collapsed band self-join, signature-agreement verify at the
    SAME ``threshold`` as the historical match, connected components,
    min-id survivor per group.  Deterministic, so a replayed batch
    keeps the same survivors and the (op, batch_id) replay log stays
    sufficient.  ``max_bucket_size`` (opt-in, default None =
    the exact every-witness contract) caps the historical match's
    per-bucket witness count — set it for boilerplate-heavy corpora
    where one band bucket holds thousands of identical docs
    (decision-lossless for exact-dup clusters, the standard LSH
    recall trade for diverse hot buckets — see
    ``minhash_match_index``)."""
    from astro_vectordb_spark.operators.dedup import (
        connected_components,
        minhash_signatures_sql_safe,
    )
    from astro_vectordb_spark.sources.vault import (
        load_minhash_index,
        minhash_append_to_index,
        minhash_match_index,
        minhash_sig_self_pairs,
    )

    n_dups = 0
    n_intra = 0
    keep = batch_df
    if drop_dups:
        _, _, meta = load_minhash_index(spark, index_path)
        id_col = meta["id_col"]
        # 1) intra-batch: min-id survivor per near-dup group within
        #    the batch itself (docs with < n tokens have no signature
        #    and pass through — they cannot near-dup under the family)
        bsigs = minhash_signatures_sql_safe(
            batch_df,
            num_hashes=int(meta["num_hashes"]),
            n=int(meta["n"]),
            text_col="text",
            id_col=id_col,
        ).localCheckpoint(eager=False)
        reps, pairs = minhash_sig_self_pairs(
            bsigs,
            num_hashes=int(meta["num_hashes"]),
            bands=int(meta["bands"]),
            threshold=threshold,
            id_col=id_col,
        )
        comp = connected_components(pairs)
        survivors = reps.select(id_col).join(
            comp.filter(F.col("id") != F.col("component")).select(
                F.col("id").alias(id_col)
            ),
            id_col,
            "left_anti",
        )
        intra_losers = bsigs.select(id_col).distinct().join(
            survivors, id_col, "left_anti"
        )
        n_intra = intra_losers.count()
        if n_intra:
            keep = keep.join(intra_losers, id_col, "left_anti")
        # 2) historical: anything near-duplicating the ingested corpus
        dup_ids = (
            minhash_match_index(
                spark, index_path, keep, threshold=threshold,
                max_bucket_size=max_bucket_size,
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        n_dups = dup_ids.count()
        if n_dups:
            keep = keep.join(dup_ids, id_col, "left_anti")
    rep = minhash_append_to_index(
        spark, index_path, keep, batch_id=int(batch_id)
    )
    rep["dropped_dups"] = int(n_dups)
    rep["dropped_intra_batch"] = int(n_intra)
    print(
        f"{query_name} batch {batch_id}: +{rep['appended_rows']} docs, "
        f"{n_dups} hist dups + {n_intra} intra-batch dups dropped"
    )
    return rep


def _run_index_ingest_stream(
    stream_df: DataFrame,
    index_path: str,
    apply_batch,
    gc_ops: list[str],
    checkpoint: str | None,
    query_name: str,
    gc_every: int | None,
):
    """Shared foreachBatch runner for the four persisted-index ingest
    streams (minhash / rp / semdedup / simhash): apply one micro-batch
    via ``apply_batch(batch_df, batch_id)``, and every ``gc_every``
    applied batches compact the replay log SCOPED to this stream's own
    op namespaces (a horizon is only sound against the owning stream's
    micro-batch ordering; sibling streams' rows pass through verbatim,
    and a commit racing the swap is detected/carried — see vault.gc).
    Without gc a months-long ingest accretes one tiny log file per
    micro-batch."""
    from astro_vectordb_spark.sources.vault import gc as _vault_gc

    spark = stream_df.sparkSession
    applied = {"n": 0}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_batch(batch_df, batch_id)
        applied["n"] += 1
        if gc_every and applied["n"] % int(gc_every) == 0:
            rep = _vault_gc(spark, index_path, ops=gc_ops)
            if rep.get("compacted"):
                print(
                    f"{query_name}: replay-log gc "
                    f"{rep['files_before']} -> {rep['files_after']} files"
                )

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .outputMode("append")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def stream_minhash_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_minhash_ingest",
    drop_dups: bool = True,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
    gc_every: int | None = None,
):
    """Streaming ingest into the persisted near-dup fingerprint index:
    each micro-batch of (doc_id, text) rows is matched against
    EVERYTHING already ingested (compact sigs/bands tables — the
    historical text is never read) and, with ``drop_dups``, only the
    novel docs are appended; redelivered batches are no-ops via the
    (op, batch_id) replay log.  This is continuous corpus dedup as an
    index maintenance loop — the shape a 100 TB ingest pipeline runs
    daily — in the same foreachBatch one-batch-at-a-time form as the
    other index ingests.

    ``gc_every=N``: every N applied batches, compact the `_batches`
    replay log (``vault.gc``) from INSIDE foreachBatch, scoped to THIS
    stream's own op namespace (``ops=["minhash_append"]``) — so the
    horizon it writes is justified by this stream's own micro-batch
    ordering, and a sibling stream sharing the index (e.g. a paired
    remove stream) keeps its rows verbatim; a sibling commit racing
    the swap is detected and carried (vault.gc's concurrent-commit
    safety).  Without gc a months-long ingest accretes one tiny log
    file per micro-batch."""
    spark = stream_df.sparkSession
    return _run_index_ingest_stream(
        stream_df, index_path,
        lambda b, bid: _minhash_ingest_batch(
            spark, index_path, b, bid, drop_dups=drop_dups,
            threshold=threshold, query_name=query_name,
            max_bucket_size=max_bucket_size,
        ),
        gc_ops=["minhash_append"], checkpoint=checkpoint,
        query_name=query_name, gc_every=gc_every,
    )


def _rp_ingest_batch(
    spark,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    drop_dups: bool,
    threshold: float,
    query_name: str,
    max_bucket_size: int | None = None,
) -> dict:
    """One micro-batch of the streaming EMBEDDING near-dup-index
    ingest — the ``_minhash_ingest_batch`` semantics for the RP-LSH
    family (round-12 verdict item 4 completing its streaming face):
    with ``drop_dups``, the batch first near-dups AGAINST ITSELF
    (two copies of a brand-new vector arriving in one micro-batch —
    neither is in the index, so the historical match alone would
    append both), then matches against the persisted bucket index and
    appends only the novel vectors through the replayable
    ``rp_append_to_index``.

    The intra-batch pass is ``rp_block_pairs`` under the INDEX'S
    stored hyperplane family (same planes, same buckets) + connected
    components + min-id survivor; the historical pass is
    ``rp_match_index`` at the same ``threshold``.  Deterministic, so
    a replayed batch keeps the same survivors and the (op, batch_id)
    replay log stays sufficient."""
    from astro_vectordb_spark.operators.dedup import (
        connected_components,
        rp_block_pairs,
    )
    from astro_vectordb_spark.sources.vault import (
        _read_meta,
        rp_append_to_index,
        rp_match_index,
    )

    n_dups = 0
    n_intra = 0
    keep = batch_df
    if drop_dups:
        meta = _read_meta(spark, index_path)
        id_col = meta["id_col"]
        pairs = rp_block_pairs(
            batch_df, threshold=threshold,
            n_planes=int(meta["n_planes"]),
            n_tables=int(meta["n_tables"]), seed=int(meta["seed"]),
            id_col=id_col, vec_col=meta["vec_col"],
            dim=int(meta["dim"]), max_bucket_size=max_bucket_size,
        )
        comp = connected_components(pairs)
        intra_losers = comp.filter(
            F.col("id") != F.col("component")
        ).select(F.col("id").alias(id_col))
        n_intra = intra_losers.count()
        if n_intra:
            keep = keep.join(intra_losers, id_col, "left_anti")
        dup_ids = (
            rp_match_index(
                spark, index_path, keep, threshold=threshold,
                max_bucket_size=max_bucket_size,
            )
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        n_dups = dup_ids.count()
        if n_dups:
            keep = keep.join(dup_ids, id_col, "left_anti")
    rep = rp_append_to_index(
        spark, index_path, keep, batch_id=int(batch_id)
    )
    rep["dropped_dups"] = int(n_dups)
    rep["dropped_intra_batch"] = int(n_intra)
    print(
        f"{query_name} batch {batch_id}: +{rep['appended_rows']} vectors, "
        f"{n_dups} hist dups + {n_intra} intra-batch dups dropped"
    )
    return rep


def stream_rp_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_rp_ingest",
    drop_dups: bool = True,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
    gc_every: int | None = None,
):
    """Streaming ingest into the persisted embedding near-dup index:
    each micro-batch of (vec_id, embedding) rows is matched against
    EVERYTHING already ingested (compact bucket/vector tables — the
    corpus is never re-projected) and, with ``drop_dups``, only the
    novel vectors are appended; redelivered batches are no-ops via
    the (op='rp_append', batch_id) replay log.  The
    ``stream_minhash_ingest`` shape for the embedding family;
    ``gc_every=N`` compacts the replay log every N applied batches,
    scoped to this stream's own op namespace (``ops=["rp_append"]`` —
    see stream_minhash_ingest's gc_every note for why scoping
    matters with sibling streams on the same index)."""
    spark = stream_df.sparkSession
    return _run_index_ingest_stream(
        stream_df, index_path,
        lambda b, bid: _rp_ingest_batch(
            spark, index_path, b, bid, drop_dups=drop_dups,
            threshold=threshold, query_name=query_name,
            max_bucket_size=max_bucket_size,
        ),
        gc_ops=["rp_append"], checkpoint=checkpoint,
        query_name=query_name, gc_every=gc_every,
    )


def _semdedup_ingest_batch(
    spark,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    drop_dups: bool,
    eps: float,
    query_name: str,
    max_bucket_size: int | None = None,
) -> dict:
    """One micro-batch of the streaming SEMANTIC near-dup-index
    ingest — the ``_rp_ingest_batch`` semantics for the SemDeDup
    family: with ``drop_dups``, the batch first semantic-dedups
    AGAINST ITSELF (assign to the INDEX'S stored centroids, within-
    cell exact-cosine pairs among the batch, connected components,
    min-id survivor), then matches against the persisted cell index
    and appends only the novel vectors through the replayable
    ``semdedup_append_to_index``.  Deterministic, so a replayed batch
    keeps the same survivors and the (op, batch_id) replay log stays
    sufficient."""
    from astro_vectordb_spark.operators.dedup import connected_components
    from astro_vectordb_spark.sources.index_lifecycle import (
        IndexCtx,
        SemDeDupFamily,
        bucket_self_pairs,
        verify_pairs,
    )
    from astro_vectordb_spark.sources.semdedup_index import (
        semdedup_append_to_index,
        semdedup_match_index,
    )
    from astro_vectordb_spark.sources.vault import _read_meta

    fam = SemDeDupFamily()
    meta = _read_meta(spark, index_path)
    ctx = IndexCtx(spark, index_path, meta)
    id_col = meta["id_col"]
    keep = batch_df
    n_intra = 0
    n_dups = 0
    if drop_dups:
        enc = fam.encode(ctx, batch_df).localCheckpoint(eager=True)
        cells = fam.bucketize(ctx, enc)
        cand = bucket_self_pairs(cells, fam.bucket_keys, id_col,
                                 max_bucket_size=max_bucket_size,
                                 unique_assignment=True)
        pairs = verify_pairs(ctx, fam, cand, enc, eps)
        comp = connected_components(pairs)
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        n_intra = losers.count()
        keep = enc.join(losers, id_col, "left_anti")
        hits = semdedup_match_index(
            spark, index_path, keep, eps=eps,
            max_bucket_size=max_bucket_size,
        )
        dup_ids = hits.select(
            F.col("new_id").alias(id_col)
        ).distinct().localCheckpoint(eager=True)
        n_dups = dup_ids.count()
        keep = keep.join(dup_ids, id_col, "left_anti")
    rep = semdedup_append_to_index(
        spark, index_path, keep, batch_id=int(batch_id)
    )
    rep["dropped_dups"] = int(n_dups)
    rep["dropped_intra_batch"] = int(n_intra)
    print(
        f"{query_name} batch {batch_id}: +{rep['appended_rows']} vectors, "
        f"{n_dups} hist dups + {n_intra} intra-batch dups dropped"
    )
    return rep


def stream_semdedup_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_semdedup_ingest",
    drop_dups: bool = True,
    eps: float = 0.95,
    max_bucket_size: int | None = None,
    gc_every: int | None = None,
):
    """Streaming ingest into the persisted SemDeDup index: each
    micro-batch of (vec_id, embedding) rows assigns ONLY ITSELF
    against the stored centroids, is matched against everything
    already ingested (compact cell/vector tables), and with
    ``drop_dups`` only the novel vectors are appended; redelivered
    batches are no-ops via the (op='semdedup_append', batch_id) replay
    log.  The ``stream_rp_ingest`` shape for the semantic family;
    ``gc_every=N`` compacts the replay log every N applied batches,
    scoped to this stream's own op namespace."""
    spark = stream_df.sparkSession
    return _run_index_ingest_stream(
        stream_df, index_path,
        lambda b, bid: _semdedup_ingest_batch(
            spark, index_path, b, bid, drop_dups=drop_dups, eps=eps,
            query_name=query_name, max_bucket_size=max_bucket_size,
        ),
        gc_ops=["semdedup_append"], checkpoint=checkpoint,
        query_name=query_name, gc_every=gc_every,
    )


def _simhash_ingest_batch(
    spark,
    index_path: str,
    batch_df: DataFrame,
    batch_id: int,
    drop_dups: bool,
    max_hamming: int | None,
    query_name: str,
    max_bucket_size: int | None = None,
) -> dict:
    """One micro-batch of the streaming SimHash near-dup-index ingest
    (the shared shape, fourth family): with ``drop_dups``, the batch
    first near-dups AGAINST ITSELF (sign under the index's stored
    hash family, pigeonhole chunk self-join, popcount verify, CC,
    min-id survivor), then matches against the persisted chunk index
    and appends only the novel docs through the replayable
    ``simhash_append_to_index``."""
    from astro_vectordb_spark.operators.dedup import connected_components
    from astro_vectordb_spark.sources.index_lifecycle import (
        IndexCtx,
        bucket_self_pairs,
        verify_pairs,
    )
    from astro_vectordb_spark.sources.vault import (
        _read_meta,
        _simhash_family,
        _simhash_thr,
        simhash_append_to_index,
        simhash_match_index,
    )

    fam = _simhash_family()
    meta = _read_meta(spark, index_path)
    _, thr = _simhash_thr(meta, max_hamming)
    ctx = IndexCtx(spark, index_path, meta)
    id_col = meta["id_col"]
    keep = batch_df
    n_intra = 0
    n_dups = 0
    if drop_dups:
        enc = fam.encode(ctx, batch_df).localCheckpoint(eager=True)
        chunks = fam.bucketize(ctx, enc)
        cand = bucket_self_pairs(chunks, fam.bucket_keys, id_col,
                                 max_bucket_size=max_bucket_size)
        pairs = verify_pairs(ctx, fam, cand, enc, thr)
        comp = connected_components(pairs)
        losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        n_intra = losers.count()
        keep_ids = enc.select(id_col).join(losers, id_col, "left_anti")
        keep = batch_df.join(keep_ids, id_col, "left_semi")
        hits = simhash_match_index(
            spark, index_path, keep, max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        )
        dup_ids = hits.select(
            F.col("new_id").alias(id_col)
        ).distinct().localCheckpoint(eager=True)
        n_dups = dup_ids.count()
        keep = keep.join(dup_ids, id_col, "left_anti")
    rep = simhash_append_to_index(
        spark, index_path, keep, batch_id=int(batch_id)
    )
    rep["dropped_dups"] = int(n_dups)
    rep["dropped_intra_batch"] = int(n_intra)
    print(
        f"{query_name} batch {batch_id}: +{rep['appended_rows']} docs, "
        f"{n_dups} hist dups + {n_intra} intra-batch dups dropped"
    )
    return rep


def stream_simhash_ingest(
    stream_df: DataFrame,
    index_path: str,
    checkpoint: str | None = None,
    query_name: str = "astro_simhash_ingest",
    drop_dups: bool = True,
    max_hamming: int | None = None,
    max_bucket_size: int | None = None,
    gc_every: int | None = None,
):
    """Streaming ingest into the persisted SimHash index — the shared
    foreachBatch shape (see stream_minhash_ingest); ``gc_every=N``
    compacts the replay log every N applied batches, scoped to this
    stream's own op namespace."""
    spark = stream_df.sparkSession
    return _run_index_ingest_stream(
        stream_df, index_path,
        lambda b, bid: _simhash_ingest_batch(
            spark, index_path, b, bid, drop_dups=drop_dups,
            max_hamming=max_hamming, query_name=query_name,
            max_bucket_size=max_bucket_size,
        ),
        gc_ops=["simhash_append"], checkpoint=checkpoint,
        query_name=query_name, gc_every=gc_every,
    )
