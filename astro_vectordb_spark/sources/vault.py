"""Parquet-backed persistence — the Spark-native AstroVault.

Reference parity (astrovault.ts):
- ``create``/``initDB``   (astrovault.ts:20-32)  -> open_or_create
- ``saveIndex``           (astrovault.ts:34-40)  -> save_embeddings /
  save_ivf_index — but per *batch*, not per mutation: the reference
  rewrites the entire JSON snapshot after every single insert
  (driver/driver.ts:147), an O(N) write amplification we deliberately
  replace with partitioned parquet commits.
- ``loadIndex``           (astrovault.ts:45-69)  -> load_embeddings /
  load_ivf_index
- ``rebuildGraphNodes``   (astrovault.ts:87-132) -> rebuild_index (re-run
  the build over live rows)
- ``deleteIndex``         (astrovault.ts:134-146) -> overwrite/drop path
- tombstone compaction    (removeNodeFromGraph's intent,
  hnsw.ts:179-200) -> compact

Index metadata (k_cells, metric, dim — the analogue of M /
efConstruction / levelMax, hnsw.ts:781-792) is persisted as a one-row
``_meta`` parquet next to the data, so unlike the reference
(fromJSON drops the metric — hnsw.ts:794-810, SURVEY.md §1.2) a
reloaded index keeps its metric.

Scale notes: the vector table is written partitioned by ``cell_id``
when an IVF index exists — the cell filter of ivf_search then becomes
*partition pruning at the file listing* (PartitionFilters in the scan
node), so a 1000-executor job opens nprobe/k_cells of the files.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("deleted", BooleanType()),
    ]
)


def open_or_create(
    spark: SparkSession, path: str, schema: StructType = EMBEDDINGS_SCHEMA
) -> DataFrame:
    """Load the vector table, or create an empty one if absent
    (getAstroDB/createAstroDB, driver/driver.ts:28-48)."""
    if _fs_exists(spark, path):
        return spark.read.parquet(path)
    empty = spark.createDataFrame([], schema)
    empty.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def save_embeddings(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    sort_by: str | None = "vec_id",
) -> None:
    """Write the vector table; ``sort_by`` sorts within partitions so
    parquet row-group min/max stats make key lookups skip row groups
    (free data-skipping on top of PushedFilters)."""
    if sort_by and sort_by in df.columns:
        df = df.sortWithinPartitions(sort_by)
    df.write.mode(mode).parquet(path)


def compact_files(
    spark: SparkSession, path: str, target_partitions: int
) -> None:
    """Rewrite a table into ``target_partitions`` files — the
    small-files maintenance job (streaming upserts and per-batch
    appends fragment a table; scan cost at 100 TB tracks file count as
    much as byte count)."""
    df = spark.read.parquet(path).repartition(target_partitions)
    df.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def load_embeddings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def save_ivf_index(
    assigned: DataFrame,
    centroids: DataFrame,
    path: str,
    cell_stats: DataFrame | None = None,
    metric: str = "cosine",
) -> None:
    """Persist an IVF index: vectors partitioned by cell, centroids +
    cell radius stats + metric metadata alongside."""
    spark = assigned.sparkSession
    # cluster rows by cell before the partitioned write: without this,
    # partitionBy emits up to (cells x input-partitions) small files;
    # with it, one file per cell per final partition
    assigned.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(os.path.join(path, "vectors"))
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    if cell_stats is not None:
        cell_stats.write.mode("overwrite").parquet(os.path.join(path, "cell_stats"))
    k_cells = centroids.count()
    dim = centroids.select(F.size("centroid").alias("d")).first()["d"]
    # n_rows: exact distinct-id corpus count at commit time — read back
    # by the filtered serving faces for selectivity widening, so no
    # per-call count job (spill-redundant assignment duplicates rows,
    # hence the distinct)
    n_rows = assigned.select("vec_id").distinct().count()
    spark.createDataFrame(
        [(metric, int(k_cells), int(dim), int(n_rows))],
        "metric string, k_cells int, dim int, n_rows long",
    ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame | None, dict]:
    """Load (assigned, centroids, cell_stats|None, meta).  The metric
    survives the round trip (unlike the reference — hnsw.ts:794-810)."""
    assigned = spark.read.parquet(os.path.join(path, "vectors"))
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    stats_path = os.path.join(path, "cell_stats")
    if not _fs_exists(spark, stats_path):
        # read-only fallback: a writer crashed between _replace_dir's two
        # renames — the retired original is still intact; the next
        # maintenance op's _recover_swap restores it in place
        retired = _swap_sibling_paths(stats_path)[1]
        if _fs_exists(spark, retired):
            stats_path = retired
    cell_stats = (
        spark.read.parquet(stats_path) if _fs_exists(spark, stats_path) else None
    )
    return assigned, centroids, cell_stats, _read_meta(spark, path)


def ivf_append_to_index(
    spark: SparkSession, path: str, new_rows: DataFrame, spill: int = 1
) -> None:
    """Incremental insert into a PERSISTED IVF index: assign new rows
    under the existing centroids (``ann.ivf_append`` semantics at
    storage level), APPEND their files into the cell-partitioned
    vectors table (touched cells gain files; nothing rewrites), and
    refresh the cell radius stats so ``ivf_search_exact`` stays exact
    (the stale-stats pruning hazard).  Centroids are untouched —
    rebuild via ``rebuild_index`` when drift warrants."""
    import numpy as np

    from astro_vectordb_spark.operators.ann import (
        ivf_cell_stats,
        make_cell_assigner,
    )

    assigned_path = os.path.join(path, "vectors")
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    meta = _read_meta(spark, path)
    metric = meta["metric"]

    cents = centroids.orderBy("cell_id").collect()
    C = np.array([r["centroid"] for r in cents], dtype=np.float64)
    cell_ids = np.array([r["cell_id"] for r in cents])
    assign = make_cell_assigner(C, metric=metric, spill=spill, cell_ids=cell_ids)

    appended = new_rows.withColumn("cell_id", F.explode(assign(F.col("embedding"))))
    existing_cols = spark.read.parquet(assigned_path).columns
    missing = set(existing_cols) - set(appended.columns)
    if missing:
        raise ValueError(
            f"new_rows lacks columns {sorted(missing)} of the persisted "
            "vector table — align schemas before appending"
        )
    appended = appended.select(*existing_cols)
    (
        appended.repartition("cell_id")
        .write.mode("append")
        .partitionBy("cell_id")
        .parquet(assigned_path)
    )
    stats_path = os.path.join(path, "cell_stats")
    _recover_swap(spark, stats_path)
    if _fs_exists(spark, stats_path):
        old_stats = spark.read.parquet(stats_path)
        new_stats = ivf_cell_stats(appended, centroids, metric=metric)
        merge = (
            F.min("min_sim").alias("min_sim")
            if metric == "cosine"
            else F.max("max_dist").alias("max_dist")
        )
        merged = old_stats.unionByName(new_stats).groupBy("cell_id").agg(merge)
        # crash-safe swap: the merge reads the live stats files while
        # writing a staging sibling (see _replace_dir)
        _replace_dir(
            spark,
            lambda staging: merged.write.mode("overwrite").parquet(staging),
            stats_path,
        )
    # corpus counter for the filtered faces (insert-new-only contract:
    # distinct new ids == ids added; see _update_meta_n_rows)
    _update_meta_n_rows(
        spark, path, delta=new_rows.select("vec_id").distinct().count()
    )


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FileSystem API —
    resolves the scheme (``file://``, ``hdfs://``, ``s3a://``, ...)
    from the session's Hadoop conf, so every vault listing works on
    any Hadoop-compatible store, not just the local filesystem."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath = _hadoop_fs(spark, path)
    return bool(fs.exists(hpath))


def _is_path_not_found(e: AnalysisException) -> bool:
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def _swap_sibling_paths(path: str) -> tuple[str, str]:
    """(staging dir, retired dir) for a crash-safe directory swap."""
    return path.rstrip("/") + ".__swap_new", path.rstrip("/") + ".__swap_old"


def _recover_swap(spark: SparkSession, path: str) -> None:
    """Repair an interrupted :func:`_replace_dir` swap at ``path``.

    Crash states and their repair (old = retired original, new =
    staging):

    - ``path`` missing, old present (crash between the two renames):
      roll BACK — restore the original; the interrupted rewrite is
      simply redone later.
    - ``path`` present (crash before the first rename, or after the
      second): the live directory is authoritative; drop leftovers.

    Called at the top of every op that uses ``_replace_dir`` — the
    single-writer maintenance contract means the recovering caller is
    the only writer."""
    new, old = _swap_sibling_paths(path)
    fs, hpath = _hadoop_fs(spark, path)
    jvm = spark._jvm
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    p_new = jvm.org.apache.hadoop.fs.Path(new)
    if fs.exists(p_old) and not fs.exists(hpath):
        if not fs.rename(p_old, hpath):
            raise OSError(f"swap recovery failed: cannot restore {old} -> {path}")
    if fs.exists(p_new):
        fs.delete(p_new, True)
    if fs.exists(p_old):
        fs.delete(p_old, True)


def _replace_dir(spark: SparkSession, write_fn, path: str) -> None:
    """Crash-safe replacement of a live parquet directory.

    A plain ``mode('overwrite')`` on ``path`` clears the existing files
    BEFORE the new write commits, so a crash or executor loss
    mid-rewrite loses the table outright.  Instead: ``write_fn``
    materializes the full new contents into a staging sibling (reading
    the LIVE files — no checkpoint needed, the source is untouched),
    then two directory renames swap it in.  The vulnerable window
    shrinks from the whole rewrite job to the instant between two
    metadata renames, and every crash state is repaired by
    :func:`_recover_swap` (which this calls first, making the op
    re-runnable after any failure)."""
    _recover_swap(spark, path)
    new, old = _swap_sibling_paths(path)
    write_fn(new)
    fs, hpath = _hadoop_fs(spark, path)
    jvm = spark._jvm
    p_old = jvm.org.apache.hadoop.fs.Path(old)
    p_new = jvm.org.apache.hadoop.fs.Path(new)
    if fs.exists(hpath) and not fs.rename(hpath, p_old):
        raise OSError(f"swap failed: cannot retire {path}")
    if not fs.rename(p_new, hpath):
        raise OSError(f"swap failed: cannot promote {new} -> {path}")
    fs.delete(p_old, True)


def _qualified_uri(spark: SparkSession, path: str) -> str:
    """Scheme-qualified absolute URI for ``path`` (the object-store-safe
    replacement for ``os.path.abspath`` in cache tokens)."""
    fs, hpath = _hadoop_fs(spark, path)
    return str(fs.makeQualified(hpath).toString())


def _scan_graph_files(
    spark: SparkSession, graph_path: str
) -> tuple[list[int], int, int, int, int]:
    """(shard ids, max parquet file bytes, file count, max mtime ms,
    total bytes) from the partitioned graph directory — one recursive
    Hadoop listing (a single LIST round on object stores), zero Spark
    jobs.  File count + newest mtime + total size identify the graph
    VERSION: any append/rebalance/rewrite changes at least one (total
    size compensates for Hadoop's millisecond mtime resolution, where
    two rewrites in the same tick with equal file counts could
    otherwise collide)."""
    fs, hpath = _hadoop_fs(spark, graph_path)
    shard_ids: set[int] = set()
    max_bytes = 0
    n_files = 0
    max_mtime_ms = 0
    total_bytes = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        f = it.next()
        p = f.getPath()
        parent = p.getParent().getName()
        if not (
            parent.startswith("shard_id=") and p.getName().endswith(".parquet")
        ):
            continue
        shard_ids.add(int(parent.split("=", 1)[1]))
        size = int(f.getLen())
        max_bytes = max(max_bytes, size)
        total_bytes += size
        max_mtime_ms = max(max_mtime_ms, int(f.getModificationTime()))
        n_files += 1
    return sorted(shard_ids), max_bytes, n_files, max_mtime_ms, total_bytes


def max_partition_bytes(spark: SparkSession) -> int:
    """The session's ``spark.sql.files.maxPartitionBytes`` as an int
    (the conf value may carry a ``b``/``k``/``m``/``g`` suffix)."""
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    # Spark accepts both one-letter ("128m") and two-letter ("128mb")
    # byte strings — match the longer suffixes first.
    mult = {
        "tb": 1 << 40, "gb": 1 << 30, "mb": 1 << 20, "kb": 1 << 10,
        "t": 1 << 40, "g": 1 << 30, "m": 1 << 20, "k": 1 << 10, "b": 1,
    }
    low = raw.strip().lower()
    for suffix, factor in mult.items():
        if low.endswith(suffix):
            return int(low[: -len(suffix)]) * factor
    return int(low)


def save_hnsw_index(
    graph: DataFrame, path: str, m: int = 16, metric: str = "cosine"
) -> None:
    """Persist per-shard HNSW graph rows (operators.hnsw.GRAPH_SCHEMA)
    partitioned by shard — the reference's toJSON snapshot
    (hnsw.ts:781-792) as a queryable table, with metric metadata kept
    (the reference loses it on reload, hnsw.ts:794-810).

    ``_meta`` also records the shard-id list (so incremental inserts
    route without a control-plane Spark job) and the largest graph
    file's size (so serving can decide whether ``clustered=True`` is
    safe against the session's ``maxPartitionBytes``)."""
    spark = graph.sparkSession
    graph_path = os.path.join(path, "graph")
    graph.repartition("shard_id").write.mode("overwrite").partitionBy(
        "shard_id"
    ).parquet(graph_path)
    _write_hnsw_meta(spark, path, metric=metric, m=m)


def _write_hnsw_meta(spark: SparkSession, path: str, metric: str, m: int) -> None:
    """(Re)write ``_meta`` from the graph files on disk.  Every
    operation that changes the graph's partition layout (save, append,
    rebalance) must call this, or the persisted shard list / max file
    size go stale — a stale shard list makes the cogrouped serve path
    silently skip shards added later."""
    shard_ids, max_bytes, _, _, _ = _scan_graph_files(
        spark, os.path.join(path, "graph")
    )
    spark.createDataFrame(
        [(metric, int(m), shard_ids, int(max_bytes))],
        "metric string, m int, shard_ids array<int>, max_shard_file_bytes long",
    ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))


def load_hnsw_index(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load (graph, meta).  ``meta['clustered_safe']`` says whether
    ``hnsw_query_shards(clustered=True)`` is valid for THIS session: a
    graph file larger than ``spark.sql.files.maxPartitionBytes`` would
    be split across scan partitions, and a partial shard builds a
    graph with dangling neighbor ids.  Callers should pass
    ``clustered=meta['clustered_safe']`` instead of hard-coding True —
    serving then degrades to the (correct, one extra shuffle)
    re-shuffled path instead of failing.  Indexes saved by older
    versions lack the size metadata; their graph directory is scanned
    on load (same filesystem listing, no Spark job).

    ``meta['cache_token']`` identifies this graph VERSION (path + file
    count + newest file mtime) — pass it as
    ``hnsw_query_shards(index_cache_token=...)`` to enable the
    worker-level rebuilt-index cache for repeated serving; any
    append/rebalance/rewrite produces a different token, so mutated
    indexes never serve stale graphs."""
    graph_path = os.path.join(path, "graph")
    graph = spark.read.parquet(graph_path)
    meta = _read_meta(spark, path)
    shard_ids, max_bytes, n_files, max_mtime_ms, total_bytes = _scan_graph_files(
        spark, graph_path
    )
    if meta.get("max_shard_file_bytes") is None:
        meta["shard_ids"] = shard_ids
        meta["max_shard_file_bytes"] = max_bytes
    meta["shard_ids"] = sorted(int(s) for s in meta["shard_ids"])
    meta["clustered_safe"] = (
        0 < meta["max_shard_file_bytes"] < max_partition_bytes(spark)
    )
    meta["cache_token"] = (
        f"{_qualified_uri(spark, path)}:{n_files}:{max_mtime_ms}:{total_bytes}"
    )
    return graph, meta


def hnsw_append_to_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    seed: int = 42,
    on_conflict: str = "skip",
) -> list[int]:
    """Incremental insert into a PERSISTED sharded HNSW index — the
    reference's live ``addPoint`` (hnsw.ts:82-173) at storage level:
    only the shard partitions that received new vectors are rewritten
    (dynamic partition overwrite); every other shard keeps its files.
    ``on_conflict="update"`` makes an arriving id that already exists
    replace its vector in place (the reference's id-stable
    ``updatePoint``, hnsw.ts:497-517, without a rebuild); see
    ``hnsw_insert_shards`` for the full conflict contract.
    Returns the touched shard ids."""
    from astro_vectordb_spark.operators.hnsw import hnsw_insert_shards

    graph, meta = load_hnsw_index(spark, path)
    updated = hnsw_insert_shards(
        graph, new_rows, m=meta["m"], metric=meta["metric"], seed=seed,
        on_conflict=on_conflict, shard_ids=meta["shard_ids"],
    )
    # materialize before overwriting the path being read
    updated = updated.localCheckpoint(eager=True)
    touched = sorted(
        r["shard_id"] for r in updated.select("shard_id").distinct().collect()
    )
    (
        updated.repartition("shard_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(os.path.join(path, "graph"))
    )
    # refresh max-file-size metadata (an append can push a shard past
    # the clustered-serve safety bound; shard list is unchanged here)
    _write_hnsw_meta(spark, path, metric=meta["metric"], m=meta["m"])
    return touched


def hnsw_rebalance(
    spark: SparkSession,
    path: str,
    target_rows_per_shard: int = 250_000,
    skew_threshold: float = 2.0,
    seed: int = 42,
    min_degree_frac: float | None = None,
) -> dict[int, list[int]]:
    """Split oversized HNSW shards — the maintenance op for
    append-heavy growth (``hnsw_append_to_index`` routes by hash, so
    shards grow uniformly, but the shard COUNT fixed at build time
    eventually makes every shard oversized).

    A shard exceeding ``skew_threshold * target_rows_per_shard`` is
    split into ceil(n/target) new shards (its rows re-sharded, each
    split's graph rebuilt from vectors); one split keeps the old shard
    id so the dynamic partition overwrite replaces the old files, the
    rest get fresh ids.  Shards within budget keep their files
    untouched.  Returns {old_shard_id: [split shard ids]} (empty =
    nothing to do; a compacted-in-place shard maps to [itself]).
    Single-writer maintenance op, like compaction.

    ``min_degree_frac`` additionally rebuilds DEGRADED shards in
    place: ``on_conflict='update'`` batches erode a graph over time
    (an update is remove + re-add; the removed node's pruned incoming
    edges are never re-wired, so surviving nodes lose links batch
    after batch and recall decays).  A shard whose mean level-0
    out-degree falls below ``min_degree_frac * m`` is rebuilt from its
    vectors at full construction quality — same rows, same shard id,
    fresh wiring.  The degree statistic comes from the same one-pass
    aggregation as the row counts (no extra job); shards with
    ``n <= m`` rows are exempt (their degree is bounded by n-1, not
    m).  The reference never implemented its graph-cleaning TODO
    (README.md:78-81); this is that maintenance op, per shard and
    incremental."""
    from astro_vectordb_spark.operators.hnsw import hnsw_build_shards

    graph, meta = load_hnsw_index(spark, path)
    stats = {
        r["shard_id"]: (r["n"], r["deg"])
        for r in graph.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(F.element_at("neighbors", 1))).alias("deg"),
        ).collect()
    }
    counts = {s: n for s, (n, _) in stats.items()}
    limit = skew_threshold * target_rows_per_shard
    oversized = {s: n for s, n in counts.items() if n > limit}
    degraded = set()
    if min_degree_frac is not None:
        floor_deg = float(min_degree_frac) * meta["m"]
        degraded = {
            s
            for s, (n, deg) in stats.items()
            if s not in oversized and n > meta["m"] and deg < floor_deg
        }
    if not oversized and not degraded:
        return {}
    next_id = max(counts) + 1
    result: dict[int, list[int]] = {}
    updated_parts = []
    quantized = "qvec" in graph.columns
    for sid in sorted(set(oversized) | degraded):
        n = counts[sid]
        parts = -(-n // target_rows_per_shard) if sid in oversized else 1
        if quantized:
            # dequantize for the rebuild; re-quantizing on emit is
            # bit-stable (max|code| = 127 by construction recovers the
            # exact original scale), so codes survive the round trip
            rows = graph.filter(F.col("shard_id") == sid).select(
                "vec_id",
                F.transform(
                    F.col("qvec"),
                    lambda q: (q.cast("double") * F.col("qscale")).cast("float"),
                ).alias("embedding"),
            )
        else:
            rows = graph.filter(F.col("shard_id") == sid).select(
                "vec_id", "embedding"
            )
        split = hnsw_build_shards(
            rows, num_shards=parts, m=meta["m"], metric=meta["metric"],
            seed=seed + sid, quantize=quantized,
        )
        # remap split ids: 0 keeps the old shard id (overwrites its
        # partition), the rest get fresh ids
        new_ids = [sid] + [next_id + i for i in range(parts - 1)]
        next_id += parts - 1
        mapping = F.array(*[F.lit(int(x)) for x in new_ids])
        split = split.withColumn(
            "shard_id",
            F.element_at(mapping, F.col("shard_id") + 1).cast("int"),
        )
        updated_parts.append(split)
        result[sid] = new_ids
    updated = updated_parts[0]
    for p in updated_parts[1:]:
        updated = updated.unionByName(p)
    updated = updated.localCheckpoint(eager=True)
    (
        updated.repartition("shard_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(os.path.join(path, "graph"))
    )
    # splits created NEW shard partitions — the persisted shard list
    # must reflect them or later appends/cogrouped serves miss them
    _write_hnsw_meta(spark, path, metric=meta["metric"], m=meta["m"])
    return result


def save_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Persist bucketed by key — the scale lever for the mutation path.

    A keyed merge (upsert_latest / sync_merge) against a bucketed base
    table reads each bucket pre-hashed on the key: Catalyst drops the
    Exchange on the big side and only the (small) delta shuffles.  At
    100 TB the base-table shuffle IS the merge cost, so this turns the
    dominant term into zero.  Bucket count should match downstream
    ``spark.sql.shuffle.partitions`` (or divide it) for exchange reuse.
    """
    df.write.mode(mode).format("parquet").bucketBy(buckets, key).sortBy(
        key
    ).saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def compact(df: DataFrame, deleted_col: str = "deleted") -> DataFrame:
    """Physically drop tombstoned rows (the graph-cleaning TODO the
    reference never implemented, README.md:78-81) — run before a
    save to reclaim space."""
    if deleted_col not in df.columns:
        return df
    return df.filter(~F.coalesce(F.col(deleted_col), F.lit(False)))


def rebuild_index(
    df: DataFrame,
    k_cells: int = 16,
    metric: str = "cosine",
    deleted_col: str = "deleted",
    **kwargs,
):
    """Full re-index over live rows (rebuildGraphNodes,
    astrovault.ts:87-132): compact tombstones, re-fit IVF."""
    from astro_vectordb_spark.operators.ann import ivf_build, ivf_cell_stats

    live_rows = compact(df, deleted_col)
    assigned, centroids = ivf_build(live_rows, k_cells=k_cells, metric=metric, **kwargs)
    stats = ivf_cell_stats(assigned, centroids, metric=metric)
    return assigned, centroids, stats


def hnsw_index_stats(spark: SparkSession, path: str) -> dict:
    """Operational health report for a persisted HNSW index — the
    numbers an operator needs to decide WHEN to run
    ``hnsw_rebalance`` (oversized shards, degraded wiring) without
    reading any code: per-shard row counts, mean level-0 out-degree
    (erodes under ``on_conflict='update'`` churn; compare against m),
    max level, plus the metadata the serve path keys on (metric, m,
    quantized storage, clustered_safe, on-disk bytes).

    Cost: the `_meta` read, one Hadoop LIST, and ONE Spark aggregation
    over the graph (|shards| result rows — bounded control plane).
    The reference's astrovault has no introspection surface at all;
    this is the rebuildGraphNodes-era TODO (README.md:78-81) made
    observable."""
    graph, meta = load_hnsw_index(spark, path)
    _, _, _, _, total_bytes = _scan_graph_files(
        spark, os.path.join(path, "graph")
    )
    per_shard = {
        int(r["shard_id"]): {
            "rows": int(r["n"]),
            "mean_degree_l0": round(float(r["deg"]), 2),
            "max_level": int(r["max_lvl"]),
        }
        for r in graph.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(F.element_at("neighbors", 1))).alias("deg"),
            F.max("level").alias("max_lvl"),
        ).collect()
    }
    rows_per_shard = [s["rows"] for s in per_shard.values()]
    return {
        "path": path,
        "m": meta["m"],
        "metric": meta["metric"],
        "quantized": "qvec" in graph.columns,
        "clustered_safe": meta["clustered_safe"],
        "num_shards": len(per_shard),
        "total_rows": sum(rows_per_shard),
        "max_shard_rows": max(rows_per_shard, default=0),
        "min_shard_rows": min(rows_per_shard, default=0),
        "graph_file_bytes": total_bytes,
        "mean_degree_l0": round(
            sum(s["mean_degree_l0"] * s["rows"] for s in per_shard.values())
            / max(sum(rows_per_shard), 1),
            2,
        ),
        "shards": per_shard,
    }


def save_pq_index(
    encoded: DataFrame, model, path: str
) -> None:
    """Persist a product-quantized index: the compact (id, pq_code)
    table plus the tiny codebook table and metric/shape metadata.

    The code table is the ADC scan target (m bytes/vector); codebooks
    are m*ks rows of dsub floats — always driver-loadable regardless of
    corpus size.  Same portable-FS story as the other indexes (paths go
    through the Hadoop FileSystem API on read)."""
    spark = encoded.sparkSession
    encoded.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    spark.createDataFrame(
        model.to_rows(), "subspace int, code int, centroid array<float>"
    ).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    n_rows = encoded.select("vec_id").distinct().count()
    spark.createDataFrame(
        [(model.metric, int(model.m), int(model.ks), int(model.dim),
          int(n_rows))],
        "metric string, m int, ks int, dim int, n_rows long",
    ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))



def _read_maybe_swapped(spark: SparkSession, table_path: str) -> DataFrame:
    """Read a parquet dir that a crashed :func:`_replace_dir` swap may
    have left retired: if the live path is missing but the retired
    sibling exists, read the retired copy (read-only — the next
    maintenance op's ``_recover_swap`` restores it in place)."""
    if not _fs_exists(spark, table_path):
        retired = _swap_sibling_paths(table_path)[1]
        if _fs_exists(spark, retired):
            table_path = retired
    return spark.read.parquet(table_path)


def _read_meta(spark: SparkSession, path: str) -> dict:
    """Read an index's one-row ``_meta`` table, tolerating a crashed
    :func:`_update_meta_n_rows` swap: if the live dir is missing, the
    retired sibling (intact pre-update copy) is read instead, so the
    index never becomes unloadable; the next meta update's
    ``_recover_swap`` restores the live path."""
    return _read_maybe_swapped(spark, os.path.join(path, "_meta")).first().asDict()


def load_pq_index(spark: SparkSession, path: str):
    """Load (encoded, model, meta) — the codebooks collect to the
    driver (bounded: m*ks rows) and rebuild the PQModel; the code table
    stays distributed."""
    from astro_vectordb_spark.operators.pq import PQModel

    encoded = _read_maybe_swapped(spark, os.path.join(path, "codes"))
    cb_rows = [
        (r["subspace"], r["code"], r["centroid"])
        for r in spark.read.parquet(os.path.join(path, "codebooks")).collect()
    ]
    meta = _read_meta(spark, path)
    model = PQModel.from_rows(cb_rows, metric=meta["metric"], dim=meta["dim"])
    return encoded, model, meta


def save_ivf_pq_index(
    encoded: DataFrame, centroids: DataFrame, model, path: str
) -> None:
    """Persist an IVF-PQ index: codes partitioned by cell (probe ->
    file-level partition pruning), centroids, codebooks, meta."""
    spark = encoded.sparkSession
    encoded.repartition("cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(os.path.join(path, "codes"))
    centroids.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    spark.createDataFrame(
        model.to_rows(), "subspace int, code int, centroid array<float>"
    ).write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    k_cells = centroids.count()
    n_rows = encoded.select("vec_id").distinct().count()
    spark.createDataFrame(
        [(model.metric, int(model.m), int(model.ks), int(model.dim),
          int(k_cells), int(n_rows), bool(getattr(model, "residual", False)))],
        "metric string, m int, ks int, dim int, k_cells int, n_rows long, "
        "residual boolean",
    ).write.mode("overwrite").parquet(os.path.join(path, "_meta"))


def load_ivf_pq_index(spark: SparkSession, path: str):
    """Load (encoded, centroids, model, meta); codes stay distributed
    with their cell partitioning intact."""
    from astro_vectordb_spark.operators.pq import PQModel

    encoded = _read_maybe_swapped(spark, os.path.join(path, "codes"))
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    cb_rows = [
        (r["subspace"], r["code"], r["centroid"])
        for r in spark.read.parquet(os.path.join(path, "codebooks")).collect()
    ]
    meta = _read_meta(spark, path)
    model = PQModel.from_rows(
        cb_rows, metric=meta["metric"], dim=meta["dim"],
        residual=bool(meta.get("residual", False)),
    )
    return encoded, centroids, model, meta


def _update_meta_n_rows(
    spark: SparkSession,
    path: str,
    delta: int | None = None,
    absolute: int | None = None,
) -> None:
    """Maintain the ``n_rows`` corpus counter (DISTINCT vec_ids) in an
    index's one-row ``_meta`` table.

    The filtered serving faces widen their probe counts by
    1/selectivity = n_rows / |allowed| — without the persisted counter
    every filtered call would re-count the corpus (a full pass over
    the codes/vectors table per query).  Each save records the exact
    count; every append/remove adjusts it by the ids it actually
    added/deleted, so serving reads it back for free.  Indexes saved
    by older versions have no ``n_rows`` column; a delta update on
    them is a no-op (loaders fall back to counting once — the legacy
    path), and the next full ``save_*_index`` upgrades them.

    The rewrite is a crash-safe staged swap (:func:`_replace_dir`):
    the one-row replacement materializes into a staging sibling and two
    renames promote it, so a crash mid-update can never leave ``_meta``
    missing or partial (a plain ``mode('overwrite')`` clears the live
    files before the new commit — one crash there and every subsequent
    ``load_*_index`` fails).  Readers go through :func:`_read_meta`,
    which repairs/falls back on an interrupted swap.  The counter is
    exact under the index family's insert-new-only append contract
    (``dedup_ids=True`` anti-joins appends; removes count distinct
    matched ids); appending an id that already exists outside that
    contract drifts the counter conservatively (widening then
    over-probes, never under-probes recall away).
    """
    from pyspark.sql.types import LongType

    mp = os.path.join(path, "_meta")
    df = _read_maybe_swapped(spark, mp)
    row = df.first()
    d = row.asDict()
    if absolute is None:
        if d.get("n_rows") is None:
            return  # legacy meta: no counter to maintain
        absolute = int(d["n_rows"]) + int(delta)
    d["n_rows"] = max(int(absolute), 0)
    schema = df.schema
    if "n_rows" not in df.columns:
        schema = schema.add("n_rows", LongType())
    _replace_dir(
        spark,
        lambda staging: spark.createDataFrame(
            [tuple(d[f.name] for f in schema.fields)], schema
        ).write.mode("overwrite").parquet(staging),
        mp,
    )


def _batch_already_committed(
    spark: SparkSession, path: str, batch_id: int | None, op: str | None = None
) -> bool:
    """True when ``(op, batch_id)`` is recorded in the index's
    ``_batches`` commit log (tiny parquet, one row per applied batch).
    foreachBatch is at-least-once — a failed-then-retried micro-batch
    re-delivers the same (batch_id, rows), and a blind append would
    double-insert its vec_ids.  The log check is the O(1) fast path;
    callers without a batch_id fall back to the vec_id anti-join.

    The log is NAMESPACED per operation (``op``): each Structured
    Streaming query numbers its micro-batches independently from 0, so
    an ingest stream and a remove stream sharing one index would
    otherwise collide on batch_id alone — the remove stream's batch N
    would return skipped_replay because the INGEST already recorded N,
    silently dropping the deletion (and the reverse masks appends).
    Legacy log rows written before the ``op`` column existed carry a
    null op and keep their historical match-any-operation behavior;
    every new row disambiguates.

    HORIZON rows (written by :func:`gc` when it compacts the log):
    a row with ``horizon = true`` asserts every batch_id <= its
    batch_id for its op namespace is already applied, replacing the
    individually-pruned rows.  Sound because Structured Streaming
    numbers one query's micro-batches monotonically and the faces
    apply them in order — an id at-or-below a recorded horizon can
    only be a redelivery of an applied batch (that is also why each
    stream MUST own its op namespace; see the paragraph above)."""
    if batch_id is None:
        return False
    log_path = os.path.join(path, "_batches")
    try:
        # mergeSchema: the log may mix pre-op (batch_id-only) files
        # with namespaced ones; legacy rows surface with op = null
        seen = spark.read.option("mergeSchema", "true").parquet(log_path)
    except AnalysisException as e:
        # ONLY a missing log means "nothing applied yet".  A transient
        # read error must propagate so the micro-batch retries instead
        # of silently re-applying (which would double-insert).
        if _is_path_not_found(e):
            return False
        raise
    if "horizon" in seen.columns:
        match = F.col("batch_id") == int(batch_id)
        match = match | (
            F.coalesce(F.col("horizon"), F.lit(False))
            & (F.col("batch_id") >= int(batch_id))
        )
        hit = seen.filter(match)
    else:
        hit = seen.filter(F.col("batch_id") == int(batch_id))
    if op is not None and "op" in seen.columns:
        hit = hit.filter(F.col("op").isNull() | (F.col("op") == str(op)))
    return hit.limit(1).count() > 0


def _record_batch(
    spark: SparkSession, path: str, batch_id: int | None, op: str = "append"
) -> None:
    if batch_id is None:
        return
    spark.createDataFrame(
        [(int(batch_id), str(op))], "batch_id long, op string"
    ).write.mode("append").parquet(os.path.join(path, "_batches"))


def pq_append_to_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
) -> dict:
    """Incremental insert into a persisted PQ index: encode the new
    rows under the EXISTING codebooks and append their files to the
    codes table — nothing rewrites, same touched-files-only contract
    as ``ivf_append_to_index``/``hnsw_append_to_index``.

    Returns a drift report: the appended batch's mean squared
    quantization error vs the corpus baseline (recomputed over the
    pre-append codes' reconstruction error would need the floats, so
    the baseline is the batch-independent codebook variance proxy —
    we report the batch MSE and leave the retrain decision to the
    caller).  A batch MSE far above previous batches means the new
    data has drifted off the trained codebooks: searches stay correct
    (stage 2 re-ranks exactly) but stage-1 ordering degrades — rebuild
    via ``pq_train`` + ``save_pq_index`` when it matters.
    """
    from astro_vectordb_spark.operators.pq import (
        pq_encode,
        pq_reconstruction_mse,
    )

    if _batch_already_committed(spark, path, batch_id, op="pq_append"):
        return {"appended_rows": 0, "skipped_replay": True}
    existing, model, meta = load_pq_index(spark, path)
    if dedup_ids:
        # insert-new-only contract: an id already in the codes table
        # is skipped (updates go through rebuild), so an at-least-once
        # redelivery without a batch_id is still idempotent; intra-batch
        # duplicate ids collapse too — otherwise the duplicate code rows
        # land in the table and the physical count inflates the _meta
        # n_rows counter (defined as DISTINCT vec_ids) with no
        # reconciliation path.  The pick is DETERMINISTIC (min-struct),
        # not dropDuplicates' partition-order-arbitrary row
        new_rows = _dedup_ids_deterministic(new_rows).join(
            existing.select("vec_id"), on="vec_id", how="left_anti"
        )
    # meta delta is DISTINCT ids; with dedup_ids the physical count IS
    # distinct (one job), without it the distinct is computed explicitly
    n_appended = (
        new_rows.count()
        if dedup_ids
        else new_rows.select("vec_id").distinct().count()
    )
    batch_mse = (
        pq_reconstruction_mse(new_rows, model) if n_appended else None
    )
    if n_appended:
        pq_encode(new_rows, model).write.mode("append").parquet(
            os.path.join(path, "codes")
        )
        _update_meta_n_rows(spark, path, delta=n_appended)
    _record_batch(spark, path, batch_id, op="pq_append")
    return {
        "appended_rows": n_appended,
        "batch_mse": batch_mse,
        "m": meta["m"],
        "ks": meta["ks"],
        # report-shape parity with the replay-hit path and the minhash
        # append family: callers read rep["skipped_replay"] uniformly
        "skipped_replay": False,
    }


def ivf_pq_append_to_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
) -> dict:
    """Incremental insert into a persisted IVF-PQ index: assign new
    rows under the existing centroids, encode under the existing
    codebooks, and append files into only the touched cell partitions
    (dynamic partition append — untouched cells' files are never
    rewritten)."""
    import numpy as np

    from astro_vectordb_spark.operators.ann import make_cell_assigner
    from astro_vectordb_spark.operators.pq import (
        pq_encode,
        pq_reconstruction_mse,
    )

    if _batch_already_committed(spark, path, batch_id, op="ivf_pq_append"):
        return {"appended_rows": 0, "touched_cells": [], "skipped_replay": True}
    existing, centroids, model, meta = load_ivf_pq_index(spark, path)
    if dedup_ids:
        # anti-join vs the table AND intra-batch id collapse — keeps the
        # codes table duplicate-free and the _meta distinct-id counter
        # exact, with a deterministic min-struct pick (see
        # pq_append_to_index)
        new_rows = _dedup_ids_deterministic(new_rows).join(
            existing.select("vec_id"), on="vec_id", how="left_anti"
        )
    cents = centroids.orderBy("cell_id").collect()
    C = np.array([r["centroid"] for r in cents], dtype=np.float64)
    cell_ids = np.array([r["cell_id"] for r in cents])
    assign = make_cell_assigner(
        C, metric=meta["metric"], cell_ids=cell_ids
    )
    assigned = new_rows.withColumn(
        "cell_id", F.explode(assign(F.col("embedding")))
    )
    n_appended = (
        new_rows.count()
        if dedup_ids
        else new_rows.select("vec_id").distinct().count()
    )
    residual = bool(meta.get("residual", False)) or bool(
        getattr(model, "residual", False)
    )
    # drift report: raw indexes measure raw-space reconstruction MSE;
    # a residual index's fidelity is relative to each row's assigned
    # centroid, so its batch MSE is measured in RESIDUAL space (the
    # same space its persisted train_mse was measured in — pq_train on
    # the residual frame with identity prep), keeping the two
    # comparable for the retrain decision ivf_pq_refresh_index answers
    batch_mse = None
    if n_appended:
        if residual:
            from astro_vectordb_spark.operators.pq import (
                PQModel,
                ivf_pq_residual_frame,
            )

            resid = ivf_pq_residual_frame(
                assigned, centroids, meta["metric"]
            )
            shim = PQModel(
                model.codebooks, metric="dot", dim=model.dim,
                rotation=model.rotation,
            )
            batch_mse = pq_reconstruction_mse(resid, shim)
        else:
            batch_mse = pq_reconstruction_mse(new_rows, model)
    touched: list = []
    if n_appended:
        if residual:
            from astro_vectordb_spark.operators.pq import (
                ivf_pq_encode_residual,
            )

            out = ivf_pq_encode_residual(assigned, model, centroids)
        else:
            codes = pq_encode(new_rows, model)
            out = assigned.select("vec_id", "cell_id").join(codes, on="vec_id")
        touched = sorted(
            r["cell_id"] for r in out.select("cell_id").distinct().collect()
        )
        out.write.mode("append").partitionBy("cell_id").parquet(
            os.path.join(path, "codes")
        )
        _update_meta_n_rows(spark, path, delta=n_appended)
    _record_batch(spark, path, batch_id, op="ivf_pq_append")
    return {
        "appended_rows": n_appended,
        "touched_cells": touched,
        "batch_mse": batch_mse,
        "skipped_replay": False,
    }


def _dedup_ids_deterministic(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """One row per id, picked DETERMINISTICALLY: min by the struct of
    the remaining columns.  ``dropDuplicates`` keeps a partition-order-
    arbitrary row, so a batch carrying one id twice with different
    embeddings could persist DIFFERENT codes across two replays of the
    same logical batch — breaking the deterministic-replay contract
    the append family's replay log is built on."""
    others = [c for c in df.columns if c != id_col]
    if not others:
        return df.distinct()
    return (
        df.groupBy(id_col)
        .agg(F.min(F.struct(*others)).alias("_r"))
        .select(id_col, *[F.col(f"_r.{c}").alias(c) for c in others])
    )


def _as_ids_df(spark: SparkSession, vec_ids) -> DataFrame:
    """Normalize an id collection (iterable of longs or a DataFrame
    with a vec_id column) into a one-column DataFrame."""
    if isinstance(vec_ids, DataFrame):
        return vec_ids.select("vec_id").distinct()
    return spark.createDataFrame(
        [(int(v),) for v in vec_ids], "vec_id long"
    ).distinct()


def _remove_rows_by_file(
    spark: SparkSession,
    table_path: str,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> tuple[int, list[str], int]:
    """File-granular physical delete from a parquet table (flat or
    directory-partitioned): locate the files containing the ids via
    the hidden ``_metadata.file_path`` column (bounded by |ids|),
    rewrite ONLY those files' survivors as fresh appended files, then
    delete the old files.  Returns (rows removed, touched file paths,
    DISTINCT ids removed) — the id count feeds the ``n_rows`` corpus
    counter in ``_meta`` (spill-redundant IVF assignment makes
    physical rows > ids) and is computed over the touched files only.

    Shared core of the PQ and IVF remove faces — a 100-TB table with
    1k removed ids rewrites a handful of files, never the table.
    Write-then-delete ordering: a crash between the two leaves
    duplicate survivor rows (never lost rows); the next remove or
    compaction dedups them.

    Concurrent-reader contract: these are PLAIN parquet dirs, so a
    reader that planned its scan on a pre-delete file listing can hit
    FileNotFound when the rewrite lands mid-scan — such readers must
    retry (re-plan picks up the fresh listing).  Readers needing
    snapshot isolation should go through a ``sources.versioned``
    pointer table instead, which this race cannot touch."""
    table = spark.read.parquet(table_path)
    touched = [
        r["__file"]
        for r in table.select(
            F.col("_metadata.file_path").alias("__file"), id_col
        )
        .join(ids, id_col, "left_semi")
        .select("__file")
        .distinct()
        .collect()
    ]
    if not touched:
        return 0, [], 0
    partition_cols = [c for c in table.columns if f"/{c}=" in touched[0]]
    reader = spark.read.option("basePath", table_path)
    touched_df = reader.parquet(*touched)
    n_before = touched_df.count()
    n_ids_removed = (
        touched_df.join(ids, id_col, "left_semi")
        .select(id_col)
        .dropDuplicates()
        .count()
    )
    survivors = (
        touched_df.join(ids, id_col, "left_anti")
        .dropDuplicates([id_col, *partition_cols])
        .localCheckpoint(eager=True)  # materialize BEFORE mutating files
    )
    n_after = survivors.count()
    writer = survivors.write.mode("append")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if n_after:
        writer.parquet(table_path)
    fs, _ = _hadoop_fs(spark, table_path)
    jvm = spark._jvm
    for f in touched:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
    return n_before - n_after, touched, n_ids_removed


def ivf_remove_from_index(
    spark: SparkSession,
    path: str,
    vec_ids,
    batch_id: int | None = None,
) -> dict:
    """Physical delete from a persisted IVF index — the storage-level
    lifecycle op completing the append face (``ivf_append_to_index``):
    removed vec_ids leave the cell-partitioned vectors table entirely
    (touched-files-only rewrite, see ``_remove_rows_by_file``), and
    the cell radius stats of the touched cells are RECOMPUTED from
    their survivors so ``ivf_search_exact``'s pruning bound tightens
    back (a stale post-delete radius is merely conservative — correct
    but looser — unlike the append direction, where staleness would
    be a correctness hazard).  Emptied cells lose their stats row.
    Reference analogue: ``removePoint`` (hnsw.ts:179-226) at storage
    level."""
    from astro_vectordb_spark.operators.ann import ivf_cell_stats

    if _batch_already_committed(spark, path, batch_id, op="ivf_remove"):
        return {"removed_rows": 0, "touched_files": 0,
                "skipped_replay": True}
    _recover_swap(spark, os.path.join(path, "cell_stats"))
    ids = _as_ids_df(spark, vec_ids)
    vectors_path = os.path.join(path, "vectors")
    removed, touched, n_ids_removed = _remove_rows_by_file(
        spark, vectors_path, ids
    )
    touched_cells = sorted({
        int(seg.split("=", 1)[1])
        for f in touched
        for seg in f.split("/")
        if seg.startswith("cell_id=")
    })
    stats_path = os.path.join(path, "cell_stats")
    if touched_cells and _fs_exists(spark, stats_path):
        centroids = spark.read.parquet(os.path.join(path, "centroids"))
        meta = _read_meta(spark, path)
        survivors = spark.read.parquet(vectors_path).filter(
            F.col("cell_id").isin(touched_cells)
        )
        fresh = ivf_cell_stats(survivors, centroids, metric=meta["metric"])
        old = spark.read.parquet(stats_path)
        merged = old.filter(
            ~F.col("cell_id").isin(touched_cells)
        ).unionByName(fresh)
        # crash-safe swap, same contract as pq_compact_index: the merge
        # reads the live stats files while writing a staging sibling
        _replace_dir(
            spark,
            lambda staging: merged.write.mode("overwrite").parquet(staging),
            stats_path,
        )
    if n_ids_removed:
        _update_meta_n_rows(spark, path, delta=-n_ids_removed)
    _record_batch(spark, path, batch_id, op="ivf_remove")
    return {"removed_rows": removed, "touched_files": len(touched),
            "touched_cells": touched_cells}


def hnsw_remove_from_index(
    spark: SparkSession,
    path: str,
    vec_ids,
    batch_id: int | None = None,
    seed: int = 42,
    mode: str = "auto",
    sweep_max_frac: float = 0.2,
    max_sweep_ids: int = 100_000,
    min_degree_frac: float = 0.5,
    auto_repair: bool = False,
) -> dict:
    """Physical delete from a persisted sharded HNSW index — the
    storage-level face of the reference's ``removeNodeFromGraph``
    (hnsw.ts:179-226), which the tombstone path (``crud.
    tombstone_delete`` + ``live()``) deliberately avoids: tombstoned
    ids still occupy graph wiring and beam budget forever.

    Two per-shard strategies, chosen by removal fraction:

    - **sweep** (``operators.hnsw.hnsw_remove_shards``): load the
      shard adjacency, tombstone-unlink the ids, re-emit survivors —
      a scan + O(rows x M) edge sweep, the cheap path for SMALL
      removals (measured: seconds, vs a ~60 s/shard full rebuild at
      25k rows).  Wiring quality erodes under repeated sweeps; pair
      with ``hnsw_rebalance(min_degree_frac=...)`` for periodic
      repair.
    - **rebuild**: reconstruct the shard from its surviving vectors
      at full construction quality — the right call when a shard
      loses a large fraction of its rows (same rebuild
      ``hnsw_rebalance`` applies to degraded shards).

    ``mode="auto"`` (default) sweeps shards losing at most
    ``sweep_max_frac`` of their rows and rebuilds the rest;
    ``"sweep"``/``"rebuild"`` force one strategy.  Only touched
    shards' files are replaced (dynamic partition overwrite); a shard
    emptied entirely has its partition directory deleted; ``_meta``
    is rewritten so the shard list / cache token reflect the new
    layout.  Single-writer maintenance op; replayed ``batch_id`` is a
    no-op via the ``_batches`` log.

    The report carries a per-touched-shard graph-health block
    (``operators.hnsw.hnsw_shard_health``: mean live level-0 degree,
    fraction of nodes under ``min_degree_frac * M``, and a
    ``needs_repair`` verdict using the SAME rule ``hnsw_rebalance``
    repairs by) — so sweep erosion is measured at the moment it
    happens instead of discovered as a recall drop.  ``auto_repair=
    True`` triggers the rebalance immediately when any touched shard
    is flagged; ``max_sweep_ids`` bounds the driver-collected id set
    the sweep closure ships (larger sets force rebuild mode, which
    anti-joins distributed)."""
    from astro_vectordb_spark.operators.hnsw import (
        hnsw_build_shards,
        hnsw_remove_shards,
    )

    if mode not in ("auto", "sweep", "rebuild"):
        raise ValueError(
            f"mode must be 'auto', 'sweep' or 'rebuild', got {mode!r}"
        )
    if _batch_already_committed(spark, path, batch_id, op="hnsw_remove"):
        return {"removed_rows": 0, "touched_shards": [],
                "skipped_replay": True}
    ids = _as_ids_df(spark, vec_ids)
    graph_path = os.path.join(path, "graph")
    graph, meta = load_hnsw_index(spark, path)
    # one aggregation pass: per-shard hit counts + totals -> touched
    # set, removal fractions, emptied detection — no survivor rescans
    hit_counts = {
        r["shard_id"]: r["n"]
        for r in graph.join(ids, "vec_id", "left_semi")
        .groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    touched = sorted(hit_counts)
    if not touched:
        _record_batch(spark, path, batch_id, op="hnsw_remove")
        return {"removed_rows": 0, "touched_shards": []}
    totals = {
        r["shard_id"]: r["n"]
        for r in graph.filter(F.col("shard_id").isin(touched))
        .groupBy("shard_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    emptied = [s for s in touched if hit_counts[s] >= totals[s]]
    live_touched = [s for s in touched if s not in emptied]
    if mode == "sweep":
        sweep_shards = list(live_touched)
    elif mode == "rebuild":
        sweep_shards = []
    else:
        sweep_shards = [
            s for s in live_touched
            if hit_counts[s] / totals[s] <= sweep_max_frac
        ]
    rebuild_shards = [s for s in live_touched if s not in sweep_shards]
    quantized = "qvec" in graph.columns

    # closure-size guard: the sweep path collects the remove-id set to
    # the driver and ships it in every shard task — fine for the bounded
    # erasure batches it exists for, but nothing stops a caller passing
    # an unbounded DataFrame.  A set above max_sweep_ids forces rebuild
    # mode (rebuild anti-joins the ids distributed, never collecting).
    if sweep_shards and ids.limit(max_sweep_ids + 1).count() > max_sweep_ids:
        rebuild_shards = sorted(set(rebuild_shards) | set(sweep_shards))
        sweep_shards = []

    out_parts = []
    if sweep_shards:
        rm_ids = [r["vec_id"] for r in ids.collect()]  # bounded batch
        out_parts.append(
            hnsw_remove_shards(
                graph.filter(F.col("shard_id").isin(sweep_shards)),
                rm_ids, m=meta["m"], metric=meta["metric"],
            )
        )
    if rebuild_shards:
        in_rb = graph.filter(F.col("shard_id").isin(rebuild_shards))
        if quantized:
            survivors = in_rb.join(ids, "vec_id", "left_anti").select(
                "vec_id",
                "shard_id",
                F.transform(
                    F.col("qvec"),
                    lambda q: (q.cast("double") * F.col("qscale")).cast("float"),
                ).alias("embedding"),
            )
        else:
            survivors = in_rb.join(ids, "vec_id", "left_anti").select(
                "vec_id", "shard_id", "embedding"
            )
        survivors = survivors.localCheckpoint(eager=True)
        for sid in rebuild_shards:
            rows = survivors.filter(F.col("shard_id") == sid).select(
                "vec_id", "embedding"
            )
            out_parts.append(
                hnsw_build_shards(
                    rows, num_shards=1, m=meta["m"], metric=meta["metric"],
                    seed=seed + sid, quantize=quantized,
                ).withColumn("shard_id", F.lit(int(sid)).cast("int"))
            )
    if out_parts:
        updated = out_parts[0]
        for p in out_parts[1:]:
            updated = updated.unionByName(p)
        updated = updated.localCheckpoint(eager=True)
        (
            updated.repartition("shard_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard_id")
            .parquet(graph_path)
        )
    fs, _ = _hadoop_fs(spark, graph_path)
    jvm = spark._jvm
    for sid in emptied:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                os.path.join(graph_path, f"shard_id={sid}")
            ),
            True,
        )
    _write_hnsw_meta(spark, path, metric=meta["metric"], m=meta["m"])
    # graph-health verdict for the TOUCHED shards (the way
    # pq_append_to_index surfaces MSE drift): edge sweeps erode wiring —
    # a removed node's pruned incoming edges are never re-wired — so
    # every remove reports mean live degree / under-wired fraction and a
    # needs_repair verdict per touched shard (one codegen agg over the
    # rows just written; |touched| output rows).  auto_repair=True runs
    # hnsw_rebalance(min_degree_frac=...) immediately — same rows, same
    # shard ids, fresh wiring — so churn-heavy pipelines can't silently
    # decay; the default reports and leaves scheduling to the caller.
    health: list[dict] = []
    needs_repair: list[int] = []
    if out_parts:
        from astro_vectordb_spark.operators.hnsw import hnsw_shard_health

        health = [
            r.asDict()
            for r in hnsw_shard_health(
                updated, m=meta["m"], min_degree_frac=min_degree_frac
            )
            .orderBy("shard_id")
            .collect()
        ]
        needs_repair = [h["shard_id"] for h in health if h["needs_repair"]]
    repaired: dict[int, list[int]] = {}
    if auto_repair and needs_repair:
        repaired = hnsw_rebalance(
            spark, path, seed=seed, min_degree_frac=min_degree_frac
        )
    _record_batch(spark, path, batch_id, op="hnsw_remove")
    return {
        "removed_rows": int(sum(hit_counts.values())),
        "touched_shards": touched,
        "swept_shards": sweep_shards,
        "rebuilt_shards": rebuild_shards,
        "emptied_shards": emptied,
        "health": health,
        "needs_repair": needs_repair,
        "repaired": repaired,
    }


def pq_remove_from_index(
    spark: SparkSession,
    path: str,
    vec_ids,
    batch_id: int | None = None,
) -> dict:
    """Physical delete from a persisted PQ / IVF-PQ codes table —
    the lifecycle op the append family lacked: without it, deleted
    vec_ids sit in the codes table forever, permanently wasting ADC
    candidate budget (stage-2 re-rank hides them from RESULTS, but a
    heavily-churned index silently degrades recall-per-refine).
    Reference analogue: ``removePoint`` tombstone-compaction intent
    (hnsw.ts:179-226) applied to the quantized index.

    Touched-files-only, like the appends: the hidden
    ``_metadata.file_path`` column locates the parquet files that
    actually contain the removed ids (bounded by |vec_ids|), ONLY
    those files' survivors are rewritten (as fresh appended files),
    and the old files are deleted — a 100-TB codes table with 1k
    removed ids rewrites a handful of files, never the table.  Works
    identically for flat PQ and cell-partitioned IVF-PQ codes
    (``basePath`` keeps the cell_id partition column when re-reading
    the touched leaf files).

    Single-writer maintenance op (same contract as
    ``hnsw_rebalance``).  Crash between the survivor append and the
    old-file delete leaves duplicate survivor rows: serving is
    unaffected (``pq_topk``/``pq_batch_candidates`` dedup candidate
    ids) and ``pq_compact_index`` repairs the files; a replayed
    ``batch_id`` is a no-op via the ``_batches`` log recorded on
    completion.
    """
    if _batch_already_committed(spark, path, batch_id, op="pq_remove"):
        return {"removed_rows": 0, "touched_files": 0,
                "skipped_replay": True}
    _recover_swap(spark, os.path.join(path, "codes"))
    ids = _as_ids_df(spark, vec_ids)
    removed, touched, n_ids_removed = _remove_rows_by_file(
        spark, os.path.join(path, "codes"), ids
    )
    if n_ids_removed:
        _update_meta_n_rows(spark, path, delta=-n_ids_removed)
    _record_batch(spark, path, batch_id, op="pq_remove")
    return {"removed_rows": removed, "touched_files": len(touched)}


def pq_compact_index(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction for a persisted PQ / IVF-PQ codes table
    — the maintenance op mirroring ``hnsw_rebalance``: a long
    append/remove history leaves many small files (every streamed
    micro-batch appends at least one; every remove rewrites touched
    files into fresh ones), and file-count growth degrades scan task
    granularity and object-store listing.

    Trigger: compaction rewrites only when the file count exceeds
    ``min_file_ratio`` x the ideal count for ``target_rows_per_file``
    (so a well-sized table is a no-op — returns without a write).
    The rewrite coalesces to the ideal file count (per cell partition
    for IVF-PQ) and drops duplicate vec_ids, repairing any
    crashed-remove leftovers.  Codes are m bytes/vector, so even a
    full compaction is ~32x cheaper than rewriting the float table.
    """
    codes_path = os.path.join(path, "codes")
    _recover_swap(spark, codes_path)  # repair any interrupted prior swap
    codes = spark.read.parquet(codes_path)
    n_files = codes.select(
        F.col("_metadata.file_path")
    ).distinct().count()
    n_rows = codes.count()
    ideal = max(1, -(-n_rows // target_rows_per_file))
    if n_files <= min_file_ratio * ideal:
        return {"compacted": False, "files": n_files, "rows": n_rows}
    partitioned = "cell_id" in codes.columns
    dedup_keys = ["vec_id", "cell_id"] if partitioned else ["vec_id"]
    survivors = codes.dropDuplicates(dedup_keys)

    # crash-safe swap (not an in-place overwrite): the rewrite reads the
    # LIVE files while writing a staging sibling, then two renames swap
    # it in — a crash or executor loss mid-compaction (stream_pq_remove
    # triggers this automatically via compact_every) can no longer lose
    # the codes table, matching _remove_rows_by_file's write-then-delete
    # ordering.
    def _write(staging: str) -> None:
        writer = (
            survivors.repartition(ideal, "cell_id")
            .write.mode("overwrite").partitionBy("cell_id")
            if partitioned
            else survivors.repartition(ideal).write.mode("overwrite")
        )
        writer.parquet(staging)

    _replace_dir(spark, _write, codes_path)
    return {"compacted": True, "files_before": n_files, "rows": n_rows,
            "target_files": ideal}


def _write_codebooks(spark: SparkSession, model, path: str) -> None:
    """Staged-swap the tiny codebook table (codebooks + OPQ rotation
    sentinel rows + the ``train_mse`` baseline sentinel)."""

    def _write(staging: str) -> None:
        spark.createDataFrame(
            model.to_rows(), "subspace int, code int, centroid array<float>"
        ).write.mode("overwrite").parquet(staging)

    _replace_dir(spark, _write, os.path.join(path, "codebooks"))


def _refresh_corpus(
    spark: SparkSession,
    stored_ids: DataFrame,
    vectors: DataFrame,
    id_col: str,
    face: str,
) -> DataFrame:
    """The re-encode corpus for a PQ-family refresh: ``vectors``
    restricted to the ids currently in the codes table, duplicate ids
    collapsed deterministically.  Raises when coverage is incomplete —
    a stored id whose floats are missing cannot be re-encoded under
    new codebooks (and silently dropping it would shrink the index)."""
    corpus = _dedup_ids_deterministic(vectors, id_col=id_col).join(
        stored_ids, id_col
    )
    n_stored = stored_ids.count()
    n_corpus = corpus.count()
    if n_corpus < n_stored:
        raise ValueError(
            f"{face}: vectors frame covers {n_corpus}/{n_stored} stored "
            f"ids — every id in the codes table needs its float vector "
            f"to re-encode (pass the same corpus the index was built "
            f"and appended from)"
        )
    return corpus


def pq_refresh_index(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
    seed: int = 42,
    opq_iters: int | None = None,
) -> dict:
    """Retrain the codebooks and RE-ENCODE the stored codes table in
    place — the answer to ``pq_append_to_index``'s MSE drift report
    (the same report->refresh symmetry ``semdedup_refresh_index``
    gives the semantic family): when batch MSE climbs far above the
    ``train_mse`` baseline, the new data has drifted off the trained
    codebooks and stage-1 ADC ordering degrades; refresh refits and
    restores it WITHOUT a rebuild.

    What it does NOT pay: the float ``vectors`` table (the big one) is
    never rewritten, nothing re-ingests, and the ``_batches`` replay
    log is preserved verbatim — a stream appending through the refresh
    keeps its exactly-once contract.  What it does pay: one bounded
    codebook refit (``pq_train``'s driver-side hash-sample — never a
    corpus-scaling fit) and ONE corpus encode pass staged-swapped into
    ``codes/`` (m bytes/vector — ~32x smaller than the float table a
    rebuild also rewrites).  ``vectors`` must cover every stored id
    (the codes table defines membership; coverage is checked).

    ``opq_iters=None`` keeps the family: models persisted with an OPQ
    rotation refresh with OPQ (8 alternations), plain models refresh
    plain.  ``m``/``ks``/``metric`` come from ``_meta`` — refresh
    never changes the index shape (that is a rebuild).

    Crash ordering: the new codes swap first, then the codebooks.  A
    crash between the swaps leaves codes/codebooks mismatched — ADC
    stage-1 ordering is garbage until healed (stage-2 still re-ranks
    its candidates exactly) — and re-running the refresh (idempotent:
    deterministic sample + seed) heals it.  Single-writer maintenance
    op, same contract as ``pq_compact_index``.

    Returns ``{"reencoded_rows", "train_mse_before", "train_mse_after",
    "rotation"}``."""
    from astro_vectordb_spark.operators.pq import pq_encode, pq_train

    _recover_swap(spark, os.path.join(path, "codes"))
    encoded, old_model, meta = load_pq_index(spark, path)
    stored = encoded.select(id_col).distinct().localCheckpoint(eager=True)
    corpus = _refresh_corpus(spark, stored, vectors, id_col,
                             "pq_refresh_index")
    if opq_iters is None:
        opq_iters = 8 if old_model.rotation is not None else 0
    model = pq_train(
        corpus, m=int(meta["m"]), ks=int(meta["ks"]),
        metric=meta["metric"], vec_col=vec_col, id_col=id_col,
        max_rows=max_rows, seed=seed, opq_iters=opq_iters,
    )
    fresh = pq_encode(corpus, model, id_col=id_col, vec_col=vec_col)

    def _write(staging: str) -> None:
        fresh.write.mode("overwrite").parquet(staging)

    _replace_dir(spark, _write, os.path.join(path, "codes"))
    _write_codebooks(spark, model, path)
    return {
        "reencoded_rows": int(stored.count()),
        "train_mse_before": old_model.train_mse,
        "train_mse_after": model.train_mse,
        "rotation": model.rotation is not None,
    }


def ivf_pq_refresh_index(
    spark: SparkSession,
    path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
    seed: int = 42,
    opq_iters: int | None = None,
) -> dict:
    """:func:`pq_refresh_index` for a cell-partitioned IVF-PQ index:
    refit the codebooks (on cell RESIDUALS when the model is
    residual-encoded) and re-encode the codes table in place — the
    CENTROIDS and every row's cell assignment stay frozen, so the
    cell partitioning (the file-pruning contract serving relies on)
    is preserved verbatim and no assignment pass is paid.  Centroid
    drift is a different, cheaper signal with its own lifecycle
    answer (rebuild, or SemDeDup-style reassignment); codebook drift
    is what the per-batch MSE report measures.

    Same coverage check, crash ordering (codes swap, then codebooks;
    re-run to heal), replay-log preservation, and report shape as the
    flat face."""
    from astro_vectordb_spark.operators.pq import (
        PQModel,
        ivf_pq_encode_residual,
        ivf_pq_residual_frame,
        pq_encode,
        pq_train,
    )

    _recover_swap(spark, os.path.join(path, "codes"))
    encoded, centroids, old_model, meta = load_ivf_pq_index(spark, path)
    # one stored row per id with its frozen cell (duplicate code rows
    # from at-least-once appends collapse to the min cell)
    stored = (
        encoded.groupBy(id_col)
        .agg(F.min("cell_id").alias("cell_id"))
        .localCheckpoint(eager=True)
    )
    corpus = _refresh_corpus(
        spark, stored.select(id_col), vectors, id_col,
        "ivf_pq_refresh_index",
    )
    assigned = corpus.join(stored, id_col)
    if opq_iters is None:
        opq_iters = 8 if old_model.rotation is not None else 0
    if old_model.residual:
        resid = ivf_pq_residual_frame(
            assigned, centroids, meta["metric"], id_col=id_col,
            vec_col=vec_col,
        )
        base = pq_train(
            resid, m=int(meta["m"]), ks=int(meta["ks"]), metric="dot",
            vec_col=vec_col, id_col=id_col, max_rows=max_rows,
            seed=seed, opq_iters=opq_iters,
        )
        model = PQModel(
            base.codebooks, metric=meta["metric"], dim=base.dim,
            residual=True, rotation=base.rotation,
            train_mse=base.train_mse,
        )
        fresh = ivf_pq_encode_residual(
            assigned, model, centroids, id_col=id_col, vec_col=vec_col
        )
    else:
        model = pq_train(
            corpus, m=int(meta["m"]), ks=int(meta["ks"]),
            metric=meta["metric"], vec_col=vec_col, id_col=id_col,
            max_rows=max_rows, seed=seed, opq_iters=opq_iters,
        )
        fresh = assigned.select(id_col, "cell_id").join(
            pq_encode(corpus, model, id_col=id_col, vec_col=vec_col),
            id_col,
        )

    def _write(staging: str) -> None:
        fresh.repartition("cell_id").write.mode("overwrite").partitionBy(
            "cell_id"
        ).parquet(staging)

    _replace_dir(spark, _write, os.path.join(path, "codes"))
    _write_codebooks(spark, model, path)
    return {
        "reencoded_rows": int(stored.count()),
        "train_mse_before": old_model.train_mse,
        "train_mse_after": model.train_mse,
        "rotation": model.rotation is not None,
        "residual": bool(old_model.residual),
    }


# ---------------------------------------------------------------------------
# BM25 lexical index persistence — versioned manifest-swap tables, so a
# stats merge (append) never races a concurrent query's read.

def save_bm25_index(
    term_stats: DataFrame, corpus_stats: DataFrame, path: str
) -> None:
    """Persist BM25 statistics (vocabulary-sized ``term_stats(term,
    df)`` + 1-row ``corpus_stats(n, total_dl, avgdl)``) as ONE
    versioned multi-table commit (sources.versioned): term stats,
    corpus stats, and the applied-batch log live in the SAME version
    directory behind a single atomically-swapped pointer, so a reader
    can never observe a term_stats/corpus_stats pair from different
    merges, and a crash mid-append leaves the previous version fully
    intact."""
    from astro_vectordb_spark.sources.versioned import commit_version_multi

    spark = term_stats.sparkSession
    empty_log = spark.createDataFrame([], "batch_id long")
    commit_version_multi(
        {"term_stats": term_stats, "corpus_stats": corpus_stats,
         "batches": empty_log},
        os.path.join(path, "stats"), 0,
    )
    # a rebuild at the same path always commits v0 again — drop any
    # cached corpus-stats rows for the path (the pointer-mtime token
    # already re-keys them; this keeps the dead entries from lingering)
    ap = os.path.abspath(path)
    for k in [k for k in _BM25_CORPUS_STATS_CACHE if k[0] == ap]:
        del _BM25_CORPUS_STATS_CACHE[k]


def _read_bm25_tables(
    spark: SparkSession, path: str
) -> dict[str, DataFrame] | None:
    """Live BM25 statistic tables, reading the current ``stats/``
    multi-table layout OR the legacy (pre-multi-commit) layout of
    separate versioned ``term_stats/`` + ``corpus_stats/`` tables — an
    index persisted under the old layout stays loadable, and its first
    ``bm25_append_to_index`` migrates it (the merged tables commit into
    the new layout; the legacy directories become dead data)."""
    from astro_vectordb_spark.sources.versioned import (
        read_current,
        read_current_multi,
    )

    tables = read_current_multi(spark, os.path.join(path, "stats"))
    if tables is not None:
        return tables
    ts = read_current(spark, os.path.join(path, "term_stats"))
    cs = read_current(spark, os.path.join(path, "corpus_stats"))
    if ts is None or cs is None:
        return None
    out = {"term_stats": ts, "corpus_stats": cs}
    legacy_log = read_current(spark, os.path.join(path, "batches"))
    if legacy_log is not None:
        out["batches"] = legacy_log
    return out


# (abspath, version token) -> (rows, schema) of the 1-row corpus
# stats table.  Serving-path control plane: every BM25 query needs
# (n, avgdl) as literals, and reading a 1-row parquet per query costs
# a cluster job each time; pinning the row per COMMITTED VERSION makes
# those reads driver-local (LocalTableScan — no job) while any append/
# remove commit (which swaps the version pointer) naturally invalidates
# the entry.  The query itself still computes from the parquet corpus
# and term stats every invocation.
#
# Staleness discipline (round-16 ADVICE fix): the version string alone
# is NOT a content discriminator — ``save_bm25_index`` always commits
# v0, so rebuilding an index at the same path in one session reuses
# the version name.  The token therefore includes the POINTER FILE's
# mtime_ns (``os.replace`` installs a fresh inode per swap), it is
# read BEFORE the tables (so a concurrent commit between the two reads
# can't cache new stats under an old key), and the entry is only
# stored if the pointer is UNCHANGED after the collect (a swap during
# the read serves that call uncached and the next call re-keys).
_BM25_CORPUS_STATS_CACHE: dict[tuple, tuple] = {}


def _bm25_version_token(path: str):
    """(layout, version, pointer mtime_ns) of the committed BM25
    statistics at ``path`` — probing the same layouts in the same
    order as ``_read_bm25_tables`` — or None when nothing is
    committed."""
    from astro_vectordb_spark.sources.versioned import (
        CURRENT,
        current_version,
    )

    for sub in ("stats", "corpus_stats"):
        base = os.path.join(path, sub)
        ver = current_version(base)
        if ver is not None:
            try:
                mt = os.stat(os.path.join(base, CURRENT)).st_mtime_ns
            except OSError:
                mt = -1
            return (sub, ver, mt)
    return None


def load_bm25_index(spark: SparkSession, path: str):
    """(term_stats, corpus_stats) live snapshots (legacy layouts
    included — see ``_read_bm25_tables``).  ``corpus_stats`` comes back
    as a driver-local 1-row relation (same schema/values as the
    committed parquet) so downstream ``first()``/join consumers don't
    pay a cluster job per lookup; see ``_BM25_CORPUS_STATS_CACHE``."""
    token = _bm25_version_token(path)  # BEFORE the table reads
    tables = _read_bm25_tables(spark, path)
    if tables is None:
        raise FileNotFoundError(f"no committed BM25 index at {path}")
    ts, cs = tables["term_stats"], tables["corpus_stats"]
    key = (os.path.abspath(path), token)
    hit = _BM25_CORPUS_STATS_CACHE.get(key)
    if hit is None:
        hit = (cs.collect(), cs.schema)
        # cache only if no commit landed between the token read and
        # the collect — otherwise the rows may belong to the NEWER
        # version and would be served stale under the OLD key
        if token is not None and _bm25_version_token(path) == token:
            _BM25_CORPUS_STATS_CACHE[key] = hit
    cs_local = spark.createDataFrame(hit[0], hit[1])
    return ts, cs_local


def bm25_append_to_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental insert into a persisted BM25 index: merge the new
    batch's term/corpus statistics (``keyword.bm25_append_stats`` —
    additive df counts, exact integer totals) and commit the merged
    tables as a new version.  The rewrite is VOCABULARY-sized, never
    corpus-sized.

    Exactly-once under at-least-once redelivery: the applied-batch log
    is committed IN the same version as the merged statistics (one
    pointer swap covers all three tables), so there is no crash window
    where the stats reflect a batch the log does not — a replayed
    ``batch_id`` is either fully applied (and skipped) or not applied
    at all (and re-merged cleanly).  This is stronger than the PQ
    appends' side-car ``_batches`` log, which BM25 needs because
    statistics merges have no id-level anti-join fallback."""
    from astro_vectordb_spark.operators.keyword import bm25_append_stats

    def _merge(ts, cs):
        return bm25_append_stats(
            ts, cs, new_docs, id_col=id_col, text_col=text_col
        )

    return _bm25_apply_batch(
        spark, path, new_docs, batch_id, "append", "appended_docs", _merge
    )


def bm25_remove_from_index(
    spark: SparkSession,
    path: str,
    removed_docs: DataFrame,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strict: bool = True,
) -> dict:
    """Incremental DELETE from a persisted BM25 index — the lexical
    counterpart of ``pq/ivf/hnsw_remove_from_index``, completing the
    build → append → remove lifecycle for every index kind.  Subtracts
    the batch's term/corpus statistics exactly
    (``keyword.bm25_remove_stats`` — df decrements, exact integer
    totals; remove-then-query == rebuild-on-survivors bit-for-bit) and
    commits the decremented tables as a new version; the rewrite is
    VOCABULARY-sized, never corpus-sized.

    ``removed_docs`` must carry the documents' ORIGINAL (id, text)
    rows (the statistics store no postings — read the rows from the
    corpus table before deleting them there; the GDPR-erasure flow is
    remove-here-then-delete-there).  ``strict`` (default) fails the
    commit if any document frequency would go negative — see
    ``bm25_remove_stats``.

    The applied-batch log records ``(op, batch_id)`` — an ingest
    stream and a remove stream on the SAME index number their
    micro-batches independently from 0, so op-unaware replay detection
    would let ingest batch N mask remove batch N (silently dropping
    the erasure) and vice versa.  Legacy logs without the op column
    keep their historical match-any behavior."""
    from astro_vectordb_spark.operators.keyword import bm25_remove_stats

    def _merge(ts, cs):
        return bm25_remove_stats(
            ts, cs, removed_docs, id_col=id_col, text_col=text_col,
            strict=strict,
        )

    return _bm25_apply_batch(
        spark, path, removed_docs, batch_id, "remove", "removed_docs", _merge
    )


def _bm25_apply_batch(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    batch_id: int | None,
    op: str,
    count_key: str,
    merge_fn,
) -> dict:
    """Shared append/remove machinery: read the live tables (legacy
    layouts migrate), check the op-namespaced replay log, apply the
    statistics merge, and commit stats + log as ONE version (a single
    pointer swap — a replayed ``(op, batch_id)`` is either fully
    applied or not at all; there is no half-applied crash window)."""
    from astro_vectordb_spark.sources.versioned import (
        commit_version_multi,
        current_version,
    )

    stats_path = os.path.join(path, "stats")
    tables = _read_bm25_tables(spark, path)  # legacy layouts migrate here
    if tables is None:
        raise FileNotFoundError(f"no committed BM25 index at {path}")
    log = tables.get("batches")
    if log is not None and "op" not in log.columns:
        # legacy log rows predate op-namespacing: null op = match-any,
        # exactly their historical behavior
        log = log.withColumn("op", F.lit(None).cast("string"))
    if (
        batch_id is not None
        and log is not None
        and log.filter(
            (F.col("batch_id") == int(batch_id))
            & (F.col("op").isNull() | (F.col("op") == op))
        ).limit(1).count()
        > 0
    ):
        return {count_key: 0, "skipped_replay": True}
    ts, cs = tables["term_stats"], tables["corpus_stats"]
    n_docs = docs.count()
    if n_docs == 0 and batch_id is None:
        return {count_key: 0}
    mts, mcs = merge_fn(ts, cs) if n_docs else (ts, cs)
    if log is None:
        log = spark.createDataFrame([], "batch_id long, op string")
    mlog = (
        log.unionByName(
            spark.createDataFrame(
                [(int(batch_id), op)], "batch_id long, op string"
            )
        )
        if batch_id is not None
        else log
    )
    # materialize BEFORE the swap: the merge plans read the live
    # version the commit is about to garbage-collect
    mats = [t.cache() for t in (mts, mcs, mlog)]
    for t in mats:
        t.count()
    try:
        v = int((current_version(stats_path) or "v0")[1:]) + 1
        commit_version_multi(
            {"term_stats": mats[0], "corpus_stats": mats[1],
             "batches": mats[2]},
            stats_path, v,
        )
    finally:
        for t in mats:
            t.unpersist()
    return {count_key: n_docs}


# --------------------------------------------------------------------------
# persisted near-dup fingerprint index (MinHash-LSH vault face)
#
# The batch dedup operators (operators/dedup.py) re-shingle the WHOLE
# corpus per run — fine for a one-shot sweep, wrong for the steady
# state of a 100 TB training-data pipeline where each day's batch must
# be deduped against everything already ingested.  This face persists
# the corpus's minhash SIGNATURES (num_hashes longs per doc) and its
# LSH band-bucket table, so matching a new batch costs: shingle the
# BATCH + one keyed join against the compact bands table + signature
# verification on the candidates — the historical TEXT is never read
# again.  The SQL-safe hash family (minhash_lsh_pairs_sql_safe) makes
# the whole incremental path DuckDB-replayable, i.e. driver-hashable.


def save_minhash_index(
    docs: DataFrame,
    path: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Build + persist the near-dup fingerprint index: ``sigs/``
    (id, sig array<long>), ``bands/`` (id, band_idx, band_sig;
    partitioned by band_idx), one-row ``_meta`` carrying the hash
    family parameters and the exact indexed-doc count.  The band
    table is derived from the WRITTEN signature files (one
    computation of the expensive shingle/min pass; bands are a cheap
    fold over stored arrays).  Thin face over the shared lifecycle
    core (:mod:`..sources.index_lifecycle`)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        save_index,
    )

    params = {"num_hashes": int(num_hashes), "bands": int(bands),
              "n": int(n), "id_col": str(id_col)}
    save_index(
        docs, path, MinhashFamily(text_col=text_col), params,
        meta_values=(int(num_hashes), int(bands), int(n), str(id_col)),
    )


def load_minhash_index(spark: SparkSession, path: str):
    """-> (sigs df, bands df, meta dict)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        load_index,
    )

    return load_index(spark, path, MinhashFamily())


def minhash_bucket_telemetry(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame | None = None,
    text_col: str = "text",
) -> dict:
    """Witness-skew telemetry over the persisted band table: how many
    historical witnesses live in each (band_idx, band_sig) bucket —
    restricted to the buckets ``new_docs`` would touch when given
    (the exact join keys :func:`minhash_match_index` will hit), the
    whole index otherwise.

    Returns ``{"max_bucket_witnesses", "p99_bucket_witnesses",
    "p50_bucket_witnesses", "n_buckets", "n_witness_rows"}``.  The
    point (round-11 verdict, What's-wrong #2): the hot-bucket caps are
    opt-in, and without a signal an operator only learns a
    boilerplate-heavy corpus needs ``max_bucket_size`` when a
    straggler task appears.  ``max_bucket_witnesses >> p99`` is that
    signal — one boilerplate cluster of d exact copies shows up as a
    single bucket of d witnesses.  Cost: one aggregation over the
    compact bands table (fingerprints only, never text), pruned to
    the batch's buckets by a keyed semi-join when a batch is given."""
    from astro_vectordb_spark.operators.dedup import (
        minhash_band_table,
        minhash_signatures_sql_safe,
    )

    bands = spark.read.parquet(os.path.join(path, "bands"))
    meta = _read_meta(spark, path)
    scope = bands
    if new_docs is not None:
        nb = minhash_band_table(
            minhash_signatures_sql_safe(
                new_docs, num_hashes=int(meta["num_hashes"]),
                n=int(meta["n"]), text_col=text_col,
                id_col=meta["id_col"],
            ),
            num_hashes=int(meta["num_hashes"]), bands=int(meta["bands"]),
            id_col=meta["id_col"],
        )
        scope = bands.join(
            nb.select("band_idx", "band_sig").distinct(),
            ["band_idx", "band_sig"], "left_semi",
        )
    return _bucket_witness_stats(scope, meta["id_col"])


def _bucket_witness_stats(
    bands_scope: DataFrame, id_col: str,
    keys: tuple = ("band_idx", "band_sig"),
) -> dict:
    per_bucket = bands_scope.groupBy(*keys).agg(
        F.count(F.col(id_col)).alias("_w")
    )
    row = per_bucket.agg(
        F.max("_w").alias("mx"),
        F.percentile_approx("_w", 0.99).alias("p99"),
        F.percentile_approx("_w", 0.5).alias("p50"),
        F.count(F.lit(1)).alias("nb"),
        F.sum("_w").alias("nr"),
    ).first()
    if row["nb"] == 0:
        return {"max_bucket_witnesses": 0, "p99_bucket_witnesses": 0,
                "p50_bucket_witnesses": 0, "n_buckets": 0,
                "n_witness_rows": 0}
    return {
        "max_bucket_witnesses": int(row["mx"]),
        "p99_bucket_witnesses": int(row["p99"]),
        "p50_bucket_witnesses": int(row["p50"]),
        "n_buckets": int(row["nb"]),
        "n_witness_rows": int(row["nr"]),
    }


def minhash_match_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    max_bucket_size: int | None = None,
    telemetry: dict | None = None,
) -> DataFrame:
    """Match a NEW batch against the persisted index without touching
    the historical text: shingle/sign the batch under the index's
    stored hash family, bucket-join its bands against the persisted
    band table (keyed join on (band_idx, band_sig) — the only
    corpus-sized input is the compact bands table), and verify every
    candidate by SIGNATURE AGREEMENT: est_jaccard = |{i : sig_new[i]
    == sig_hist[i]}| / num_hashes, the standard unbiased minhash
    estimate (E[est] = true Jaccard).  Exact-set verification is
    impossible by design — the index deliberately does not store
    shingle sets (that would be the corpus text again).

    Returns ``(new_id, hist_id, est_jaccard)``, est rounded to 6 and
    filtered at ``threshold``.  Deterministic end to end (integer
    hashes; est is the exact rational k/num_hashes), so the whole
    incremental path is oracle-hashable.

    Hot-bucket guard (``max_bucket_size``, opt-in): a cluster of d
    identical boilerplate docs in the corpus puts d rows into each of
    its band buckets, so one probing copy joins d historical witnesses
    per bucket — O(d x batch) candidate rows through one hot key.
    When set, the historical side is first pruned to the buckets the
    batch actually touches (a keyed semi-join — the corpus bands table
    is never shuffled wholesale) and then capped at ``max_bucket_size``
    witnesses per bucket, id-ascending (deterministic).  For exact-dup
    clusters the cap is decision-lossless: every member of the cluster
    carries the identical signature, so the surviving witnesses give
    the same est as any dropped one.  For diverse hot buckets it is the
    standard LSH recall trade (mirrors ``rp_block_pairs``'s
    ``max_bucket_size``).  Default None = exact contract (every
    witness), which is what the oracle replays.

    Telemetry (opt-in, fills the caller's ``telemetry`` dict in
    place): PRE-cap witness-skew stats over the buckets this batch
    touches (``max_bucket_witnesses``/``p99_bucket_witnesses``/...,
    see :func:`minhash_bucket_telemetry`) — the signal for when to
    set ``max_bucket_size`` BEFORE a hot bucket becomes a straggler.
    One extra aggregation over the batch-pruned compact band table;
    zero cost when None."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        match_index,
    )

    return match_index(
        spark, path, MinhashFamily(text_col=text_col), new_docs,
        threshold=threshold, max_bucket_size=max_bucket_size,
        telemetry=telemetry,
    )


def minhash_append_to_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
    text_col: str = "text",
) -> dict:
    """Incremental insert: sign the new docs under the stored hash
    family and append their signature + band files — touched-files-
    only, (op, batch_id)-namespaced replay log, ``n_rows`` delta.

    Crash consistency: signatures append BEFORE bands, and the band
    append is derived from the SIGS-vs-BANDS id diff rather than the
    batch — so a crash between the two appends (sigs present, bands
    missing: those docs would silently never match) is REPAIRED by
    the next append, and a replayed batch whose sigs already landed
    still completes its missing bands."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        append_to_index,
    )

    return append_to_index(
        spark, path, MinhashFamily(text_col=text_col), new_docs,
        batch_id=batch_id, dedup_ids=dedup_ids,
    )


def minhash_compact_index(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction for the near-dup fingerprint index —
    the maintenance op completing its lifecycle (save -> match ->
    append/stream -> COMPACT): every streamed micro-batch appends at
    least one sig file and one band file per touched band partition,
    and file-count growth degrades the match join's scan granularity.

    Same contract as ``pq_compact_index``: a no-op below
    ``min_file_ratio`` x the ideal file count; otherwise both tables
    rewrite through the crash-safe staged swap (``_replace_dir`` —
    an interrupted prior swap is repaired first), dropping duplicate
    ids (crashed-append leftovers).  Sigs are num_hashes longs and
    bands three longs per row — compaction never touches text."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        compact_index,
    )

    return compact_index(
        spark, path, MinhashFamily(),
        target_rows_per_file=target_rows_per_file,
        min_file_ratio=min_file_ratio,
    )


def minhash_sig_self_pairs(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Signature-table self-pairs under the index's hash family, with
    the exact-duplicate hot-bucket collapse built in.

    Groups docs by their FULL signature and keeps the min-id
    representative per distinct sig (exact duplicates share every band
    bucket, so a d-copy cluster would otherwise push O(d^2 x bands)
    rows through one join key); bands are re-derived from the rep
    signatures (cheap stored-array fold, identical arithmetic to the
    persisted band table); candidates (a_id < b_id) are verified by
    signature agreement est = |matching positions| / num_hashes >=
    ``threshold``.

    Returns ``(reps, pairs)``: reps = (sig, id_col) one row per
    distinct signature; pairs = (a_id, b_id) verified rep-level pairs.
    Same-signature members est at exactly 1.0 against their rep, so
    rep-level connectivity is equivalent to doc-level connectivity for
    grouping, and a member can never head its component (the rep is
    the group minimum).  Shared by :func:`minhash_index_groups` (the
    retroactive sweep) and the streaming ingest's intra-batch dedup."""
    from astro_vectordb_spark.operators.dedup import minhash_band_table

    reps = sigs.groupBy("sig").agg(F.min(id_col).alias(id_col))
    rep_bands = minhash_band_table(
        reps, num_hashes=num_hashes, bands=bands,
        id_col=id_col, sig_col="sig",
    )
    a = rep_bands.select(F.col(id_col).alias("a_id"), "band_idx", "band_sig")
    b = rep_bands.select(F.col(id_col).alias("b_id"), "band_idx", "band_sig")
    cands = (
        a.join(b, ["band_idx", "band_sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
                lambda v: v,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    pairs = (
        cands.join(
            reps.select(
                F.col(id_col).alias("a_id"), F.col("sig").alias("_sig_a")
            ),
            "a_id",
        )
        .join(
            reps.select(
                F.col(id_col).alias("b_id"), F.col("sig").alias("_sig_b")
            ),
            "b_id",
        )
        .withColumn("_est", F.round(est, 6))
        .filter(F.col("_est") >= F.lit(float(threshold)))
        .select("a_id", "b_id")
    )
    return reps, pairs


def minhash_index_groups(
    spark: SparkSession,
    path: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Corpus-wide dedup of the ALREADY-INGESTED corpus from its
    fingerprint index alone — no text is read: LSH band self-join
    (a_id < b_id) proposes candidates, signature agreement verifies
    them at ``threshold``, connected components collapse transitive
    groups, and one representative (min id) per component survives —
    singletons keep themselves.  The retroactive sweep companion to
    :func:`minhash_match_index`'s per-batch face (run it when the
    threshold policy changes or after a backfill that skipped
    at-ingest dedup).

    Returns the KEEP set: one ``(id_col)`` row per surviving doc,
    over the indexed ids (docs with fewer than n tokens were never
    indexable and are not in scope).

    Hot-bucket guard (exact-duplicate collapse, always on, LOSSLESS):
    exact duplicates share their ENTIRE signature and therefore ALL
    band buckets, so a cluster of d identical boilerplate docs would
    put d rows into every one of its buckets and the self-join would
    emit O(d^2 x bands) candidate rows in one straggler task — the
    quadratic blowup :func:`rp_block_pairs`'s ``max_bucket_size``
    already guards against.  Here the collapse is exact, not lossy:
    the sweep first groups docs by their full signature (one shuffle
    of the compact sigs table), keeps the min-id REPRESENTATIVE per
    distinct signature, and runs banding/self-join/verify/CC over
    representatives only.  Same-signature members estimate at exactly
    1.0 >= any threshold, so in the uncollapsed algorithm every member
    joins its representative's component and can never win it (the rep
    IS the group minimum) — dropping them up front provably preserves
    the keep set while the candidate stage shrinks from O(d^2) to
    O(d).  Bands are re-derived from the representative signatures (a
    cheap stored-array fold — identical arithmetic to the persisted
    table), which also makes the sweep immune to sig/band drift."""
    from astro_vectordb_spark.sources.index_lifecycle import keep_from_pairs

    sigs, _, meta = load_minhash_index(spark, path)
    id_col = meta["id_col"]
    reps, pairs = minhash_sig_self_pairs(
        sigs,
        num_hashes=int(meta["num_hashes"]),
        bands=int(meta["bands"]),
        threshold=threshold,
        id_col=id_col,
    )
    # a rep survives unless it joined a component it doesn't head;
    # same-signature members never survive (their rep is the group
    # minimum), so the keep set over reps IS the keep set over docs
    return keep_from_pairs(reps, pairs, id_col)


def minhash_remove_from_index(
    spark: SparkSession,
    path: str,
    doc_ids,
    batch_id: int | None = None,
    op: str = "minhash_remove",
) -> dict:
    """Physical delete from the near-dup fingerprint index — the
    remove face completing its lifecycle (save -> match -> append ->
    REMOVE -> compact), mirroring ``pq_remove_from_index``:
    file-granular on BOTH tables (flat ``sigs/``; ``bands/`` keeps its
    band_idx partitioning via ``basePath``), touched-files-only, so a
    100 TB index with 1k removed docs rewrites a handful of files.
    The ``n_rows`` counter decrements by the DISTINCT sig ids actually
    removed; the (op='minhash_remove', batch_id) replay log makes
    redelivery a no-op.  ``doc_ids`` is an iterable of ids or a
    one-column DataFrame (it is pinned with an eager localCheckpoint
    first — a lazy plan reading THIS index would otherwise re-evaluate
    mid-rewrite and see its own deletions).  ``op`` namespaces the
    replay log (the _batch_already_committed contract): a targeted
    remove stream and the retroactive sweep each number batches
    independently, so they must not share a namespace — the sweep
    passes op='minhash_sweep'."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        remove_from_index,
    )

    return remove_from_index(
        spark, path, MinhashFamily(), doc_ids, batch_id=batch_id, op=op
    )


def minhash_apply_groups(
    spark: SparkSession,
    path: str,
    threshold: float = 0.8,
    batch_id: int | None = None,
) -> dict:
    """Apply the retroactive sweep in one call: compute the keep set
    (:func:`minhash_index_groups`) and REMOVE every other indexed doc
    from the index through the replay-logged
    :func:`minhash_remove_from_index` path — after it, matching a new
    batch serves against deduplicated history only (one witness per
    boilerplate cluster), and the dropped ids stop paying storage and
    join traffic.  The sweep's keep set is deterministic, so a
    replayed ``batch_id`` is a no-op even though the removal happened.
    The sweep keeps its OWN replay namespace (op='minhash_sweep'): a
    targeted remove stream's batch ids must never collide with a
    scheduled sweep's (the cross-operation collision the namespaced
    log exists to prevent).

    Returns ``{"kept": n, "removed_docs": n, ...}``.  Note this drops
    near-dup LOSERS by policy; :func:`minhash_compact_index` (file
    compaction) is orthogonal and still applies after heavy churn."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        MinhashFamily,
        apply_groups,
    )

    return apply_groups(
        spark, path, MinhashFamily(),
        keep_fn=lambda: minhash_index_groups(spark, path,
                                             threshold=threshold),
        batch_id=batch_id,
    )


# ---------------------------------------------------------------------------
# Persisted embedding near-dup index (RP-LSH) — round-12 verdict item 4.
#
# The text near-dup family has a full steady-state lifecycle
# (save_minhash_index -> match -> append -> remove -> compact); the
# EMBEDDING near-dup family (rp_block_pairs) recomputed its hyperplane
# buckets from scratch every run — at 100 TB that re-projects the whole
# corpus per batch.  These faces persist the bucket table once and let
# each new batch bucket ONLY ITSELF and join the compact index:
# per-batch cost is O(batch + touched buckets), independent of how much
# history has accumulated.
#
# Data model under ``path``:
#   vecs/      (id, embedding)     — the exact-verification side (an
#                                    index-owned compact copy, so a
#                                    match never re-reads the corpus)
#   buckets/   (id, tbl, cell)     — partitioned by tbl (8 tables
#                                    default): a batch's bucket join
#                                    prunes at file level per table
#   _meta      one row: n_planes, n_tables, seed, dim, metric, id_col,
#              vec_col, n_rows
#
# Same deterministic hash family as rp_block_pairs (dedup._rp_plane;
# the float64 element-at-a-time fold in dedup.rp_cell_table), so the
# whole incremental path stays DuckDB-replayable — the driver gate's
# oracle re-derives buckets for both sides from the same plane
# literals.  Reference analogue: toJSON/loadIndex persistence
# (astrovault.ts:86-116) applied to the near-dup blocking structure
# the reference lacks.


def save_rp_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> None:
    """Build + persist the embedding near-dup index: bucket the corpus
    once (the expensive hyperplane projection), store vectors +
    buckets + the hash-family parameters."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        save_index,
    )

    if dim is None:
        dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    params = {"n_planes": int(n_planes), "n_tables": int(n_tables),
              "seed": int(seed), "dim": int(dim), "metric": "cosine",
              "id_col": str(id_col), "vec_col": str(vec_col)}
    save_index(
        df, path, RPFamily(), params,
        meta_values=(int(n_planes), int(n_tables), int(seed), int(dim),
                     "cosine", str(id_col), str(vec_col)),
    )


def load_rp_index(spark: SparkSession, path: str):
    """-> (vecs df, buckets df, meta dict)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        load_index,
    )

    return load_index(spark, path, RPFamily())


def rp_match_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
    telemetry: dict | None = None,
    n_probes: int = 0,
) -> DataFrame:
    """Match a NEW batch of vectors against the persisted index
    without re-projecting the corpus: bucket the batch under the
    stored hash family, join its (tbl, cell) keys against the compact
    bucket table (the historical side is first semi-join-pruned to the
    buckets the batch touches), and verify every candidate with the
    EXACT cosine over the stored vectors.

    Returns ``(new_id, hist_id, score)``, score rounded to 6 and
    filtered at ``threshold``.  Deterministic end to end (the bucket
    kernel's float64 left-fold matches the SQL twin bit-for-bit; the
    verify is the same fold expression the one-shot face uses), so the
    incremental path is oracle-hashable.

    ``n_probes`` (opt-in, the RECALL dial): multi-probe lookup (Lv et
    al., VLDB 2007) — the batch side also probes, per table, the
    ``n_probes`` buckets one sign-flip away on its lowest-|projection|
    planes.  Raising recall this way costs batch-side work only; the
    alternative (more hash tables) multiplies the PERSISTED index —
    corpus-sized storage — which is the wrong trade at 100 TB.  Probes
    only add candidate buckets and the exact verify is unchanged, so
    results are a superset of the n_probes=0 contract with zero false
    positives (the default 0 keeps the oracle-replayable base
    behavior).

    ``max_bucket_size`` (opt-in, the hot-bucket valve): a boilerplate
    cluster of d near-identical vectors puts d rows into each of its
    buckets; the cap keeps the first ``max_bucket_size`` witnesses per
    (tbl, cell), id-ascending (deterministic) — the same recall trade
    as ``rp_block_pairs``/``minhash_match_index``.  ``telemetry``
    (opt-in dict, filled in place) reports PRE-cap witness skew over
    exactly the buckets this batch touches (max/p99/p50 witnesses), so
    operators see the skew before it becomes a straggler."""
    from astro_vectordb_spark.operators.dedup import rp_probe_cell_table
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        match_index,
    )

    bucketize = None
    if n_probes > 0:
        def bucketize(ctx, primary):
            m = ctx.meta
            return rp_probe_cell_table(
                primary, n_planes=int(m["n_planes"]),
                n_tables=int(m["n_tables"]), seed=int(m["seed"]),
                id_col=m["id_col"], vec_col=m["vec_col"],
                dim=int(m["dim"]), n_probes=n_probes,
            )

    return match_index(
        spark, path, RPFamily(), new_rows, threshold=threshold,
        max_bucket_size=max_bucket_size, telemetry=telemetry,
        bucketize=bucketize,
    )


def rp_append_to_index(
    spark: SparkSession,
    path: str,
    new_rows: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
) -> dict:
    """Incremental insert: bucket the new vectors under the stored
    hash family and append their vector + bucket files —
    touched-files-only, (op='rp_append', batch_id) replay log,
    ``n_rows`` recount.

    Crash consistency (the minhash_append recipe): vectors append
    BEFORE buckets, and the bucket append derives from the
    VECS-vs-BUCKETS id diff rather than the batch — a crash between
    the two appends (vectors present, buckets missing: those rows
    would silently never match) is repaired by the next append.  The
    steady state short-circuits the diff with two count-distinct
    aggregations (bucket ids are always a subset of vec ids)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        append_to_index,
    )

    return append_to_index(
        spark, path, RPFamily(), new_rows, batch_id=batch_id,
        dedup_ids=dedup_ids,
    )


def rp_remove_from_index(
    spark: SparkSession,
    path: str,
    ids,
    batch_id: int | None = None,
    op: str = "rp_remove",
) -> dict:
    """Physical delete from the embedding near-dup index —
    file-granular on BOTH tables (flat ``vecs/``; ``buckets/`` keeps
    its tbl partitioning), touched-files-only; (op, batch_id) replay
    log; ``n_rows`` decrements by the distinct vec ids removed."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        remove_from_index,
    )

    return remove_from_index(
        spark, path, RPFamily(), ids, batch_id=batch_id, op=op
    )


def rp_compact_index(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction for the embedding near-dup index (the
    ``minhash_compact_index`` contract): a no-op below
    ``min_file_ratio`` x the ideal file count; otherwise both tables
    rewrite through the crash-safe staged swap, dropping duplicate ids
    and re-deriving buckets FROM the compacted vectors (re-syncs any
    vec/bucket drift in one pass, preserving the tbl partitioning)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        compact_index,
    )

    return compact_index(
        spark, path, RPFamily(),
        target_rows_per_file=target_rows_per_file,
        min_file_ratio=min_file_ratio,
    )


# ---------------------------------------------------------------------------
# Retention / GC — round-12 verdict item 5.  A long-running
# ingest+remove stream appends one tiny parquet file to the index's
# ``_batches`` replay log per micro-batch; over months that is
# unbounded small-file metadata on every replay check.  ``gc``
# compacts the log to a bounded row set without weakening the
# replay contract, and prunes stale versioned-table directories.


def gc(
    spark: SparkSession,
    path: str,
    keep_last_batches: int | None = 64,
    prune_batch_log_before: int | None = None,
    compact_target_files: int = 1,
    ops: list[str] | None = None,
    max_retries: int = 3,
    lease_ttl_sec: float = 600.0,
) -> dict:
    """Compact the ``_batches`` replay log under ``path`` — the
    lease-guarded public face of :func:`_gc_locked` (which carries the
    full compaction contract: per-op horizons, ``ops`` scoping, the
    concurrent-COMMIT detection, and the checkpoint-reset hazard).

    GC-vs-GC concurrency: the pre-swap re-list detects racing
    micro-batch COMMITS, but two gcs interleaving the retire/promote
    rename pair could still corrupt the log layout (the loser renames
    its staging dir onto an already-promoted log).  So at most one gc
    may run per index at a time — and rather than leaving that as an
    undocumented discipline, this wrapper enforces it with a lease
    file (``<path>/_gc_lease``, created atomically): if another gc
    holds a lease younger than ``lease_ttl_sec`` the call is a no-op
    reporting ``{"compacted": False, "lease_held": True}`` (gc is
    maintenance; skipping is always safe).  A lease older than the TTL
    is presumed crashed and is broken.  The TTL break is best-effort
    (two callers breaking the same stale lease in the same instant can
    both proceed); the operational contract remains one gc owner per
    index — a stream's in-loop ``gc_every`` gc owns its index — with
    the lease turning accidental overlap into a safe no-op instead of
    silent corruption.

    Lease ownership is FENCED with a unique owner token written into
    the lease file: a gc outliving the TTL whose lease was broken by a
    second gc must not, on its way out, delete the SECOND owner's
    lease (which would let a third gc start while the second still
    runs — the overlap chain the lease exists to prevent).  The
    finally-clause re-reads the lease and deletes it only when it
    still carries this call's token; a mismatched token means
    ownership moved, so the file is left for its new owner."""
    import uuid

    max_retries = max(1, int(max_retries))
    fs, _ = _hadoop_fs(spark, path)
    HPath = spark._jvm.org.apache.hadoop.fs.Path
    lease = HPath(os.path.join(path, "_gc_lease"))
    token = uuid.uuid4().hex

    def _lease_held_report() -> dict:
        return {"compacted": False, "rows_before": 0, "rows_after": 0,
                "files_before": 0, "files_after": 0, "attempts": 0,
                "carried_files": 0, "lease_held": True}

    if not fs.createNewFile(lease):
        import time

        try:
            age_ms = (time.time() * 1000.0
                      - fs.getFileStatus(lease).getModificationTime())
        except Exception:
            age_ms = None  # vanished between create and stat: owner done
        if age_ms is not None and age_ms < float(lease_ttl_sec) * 1000.0:
            return _lease_held_report()
        fs.delete(lease, False)
        if not fs.createNewFile(lease):
            return _lease_held_report()
    # stamp the token AFTER the atomic claim (the freshly-created
    # lease's mtime protects the overwrite window: a TTL-honoring
    # breaker never breaks a lease this young)
    _lease_stamp(fs, lease, token)
    try:
        return _gc_locked(
            spark, path, keep_last_batches=keep_last_batches,
            prune_batch_log_before=prune_batch_log_before,
            compact_target_files=compact_target_files, ops=ops,
            max_retries=max_retries,
        )
    finally:
        if _lease_read(fs, lease) == token:
            fs.delete(lease, False)


def _lease_stamp(fs, lease, token: str) -> None:
    """Overwrite the (already-claimed) lease file with ``token``."""
    out = fs.create(lease, True)
    try:
        out.write(bytearray(token.encode("ascii")))
    finally:
        out.close()


def _lease_read(fs, lease) -> str | None:
    """Token currently in the lease file; None if unreadable/absent."""
    try:
        stream = fs.open(lease)
    except Exception:
        return None
    try:
        data = bytearray()
        b = stream.read()
        while b != -1 and len(data) < 64:
            data.append(b)
            b = stream.read()
        return data.decode("ascii", errors="replace")
    except Exception:
        return None
    finally:
        stream.close()


def _gc_locked(
    spark: SparkSession,
    path: str,
    keep_last_batches: int | None = 64,
    prune_batch_log_before: int | None = None,
    compact_target_files: int = 1,
    ops: list[str] | None = None,
    max_retries: int = 3,
) -> dict:
    """Compact the ``_batches`` replay log under ``path``.

    Per op namespace: rows with ``batch_id`` above the cutoff are kept
    verbatim; everything at-or-below collapses into ONE ``horizon``
    row asserting "all ids <= cutoff applied" (sound for ordered
    Structured Streaming redelivery — see
    :func:`_batch_already_committed`).  The cutoff is
    ``max(batch_id) - keep_last_batches`` per op, tightened by
    ``prune_batch_log_before`` when given (ids below it are always
    eligible); the per-op maximum row is never pruned.  Legacy
    null-op rows form their own namespace and keep their match-any
    behavior through a null-op horizon.

    The rewrite goes through the crash-safe staged swap (the
    ``_replace_dir`` rename pair, inlined here so the swap can check
    for concurrent commits — see below), coalesced to
    ``compact_target_files`` files — an interrupted GC leaves either
    the old or the new complete log (``_recover_swap`` repairs).
    Replays of retained ids and of pruned ids both stay no-ops; only
    ids ABOVE every horizon and absent from the kept rows apply.

    ``ops`` (opt-in): compact ONLY the named op namespaces — rows in
    every other namespace are passed through VERBATIM (no horizon is
    written for an op the caller does not own).  A stream scheduling
    gc from its own foreachBatch should pass its own namespaces
    (``stream_minhash_ingest(gc_every=)`` passes
    ``ops=["minhash_append"]`` etc.): a horizon asserts "every
    batch_id <= H applied", which is only sound against the ordering
    of the stream that OWNS that namespace.

    Concurrent-commit safety (this replaces the older blanket
    single-writer contract): a sibling stream's commit that lands in
    the log between gc's read and its swap is never silently dropped.
    gc pins the exact file set it read, re-lists immediately before
    the swap (a new file aborts the attempt and retries from a fresh
    read, ``max_retries`` times), and after the swap sweeps the
    retired directory for data files that appeared inside the rename
    race window, carrying them into the new log verbatim.  A commit
    that starts before the swap but finishes after it fails its own
    write job (the path re-resolves to the new directory mid-commit),
    so Structured Streaming retries that micro-batch — and since its
    log row never landed, the retry correctly re-applies.

    CHECKPOINT RESET hazard (horizon semantics): after gc, an op
    namespace may be represented only by a horizon row.  If that
    stream's checkpoint is later deleted or rebound (micro-batch ids
    restart at 0), every early batch is <= the horizon and silently
    no-ops — and unlike individually-logged ids there are no rows
    left to prune to recover.  When intentionally rebinding a stream
    to a fresh checkpoint, call :func:`reset_op_log` for its op
    namespace(s) first.

    Returns ``{"compacted", "rows_before", "rows_after",
    "files_before", "files_after", "attempts", "carried_files"}``;
    a missing or already-small log is a no-op.  If every attempt
    lost the pre-swap race the report carries
    ``"aborted_concurrent_writes": True`` (the log is untouched —
    gc is maintenance; skipping is always safe)."""
    log_path = os.path.join(path, "_batches")
    _recover_swap(spark, log_path)
    fs, hlog = _hadoop_fs(spark, log_path)
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path

    def _data_files() -> list[str]:
        if not fs.exists(hlog):
            return []
        out = []
        for st in fs.listStatus(hlog):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith(("_", ".")):
                out.append(name)
        return sorted(out)

    last_report = None
    for attempt in range(1, int(max_retries) + 1):
        # pin the file set FIRST, then read exactly those files: a
        # commit landing after this listing is caught by the pre-swap
        # re-list; one landing before it is included in the read.
        files_at_read = _data_files()
        if not files_at_read:
            return {"compacted": False, "rows_before": 0, "rows_after": 0,
                    "files_before": 0, "files_after": 0,
                    "attempts": attempt, "carried_files": 0}
        seen = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(log_path, f) for f in files_at_read]
        )
        files_before = len(files_at_read)
        rows = seen.select(
            F.col("batch_id").cast("long").alias("batch_id"),
            (F.col("op") if "op" in seen.columns
             else F.lit(None).cast("string")).alias("op"),
            (F.coalesce(F.col("horizon"), F.lit(False))
             if "horizon" in seen.columns else F.lit(False)).alias("horizon"),
        ).collect()  # bounded: one row per applied batch — control plane
        rows_before = len(rows)
        if rows_before == 0 or (
            files_before <= compact_target_files
            and keep_last_batches is not None
            and rows_before <= keep_last_batches
        ):
            return {"compacted": False, "rows_before": rows_before,
                    "rows_after": rows_before, "files_before": files_before,
                    "files_after": files_before, "attempts": attempt,
                    "carried_files": 0}
        own = None if ops is None else {str(o) for o in ops}
        by_op: dict = {}
        for r in rows:
            by_op.setdefault(r["op"], []).append(r)
        out_rows: list[tuple[int, str | None, bool]] = []
        for op_key, oprows in by_op.items():
            if own is not None and op_key not in own:
                # not ours: pass through verbatim (deduped), never
                # collapsed into a horizon we can't justify
                out_rows.extend(sorted(
                    {(int(r["batch_id"]), op_key, bool(r["horizon"]))
                     for r in oprows},
                    key=lambda t: t[0],
                ))
                continue
            mx = max(r["batch_id"] for r in oprows)
            cutoff = mx - 1  # default: everything below the max collapses
            if keep_last_batches is not None:
                cutoff = mx - int(keep_last_batches)
            if prune_batch_log_before is not None:
                cutoff = max(cutoff, int(prune_batch_log_before) - 1)
            cutoff = min(cutoff, mx - 1)  # the per-op max row always stays
            # prior horizons fold into the new one (a horizon at H >
            # cutoff must survive as a horizon, not a plain row)
            prior_h = [r["batch_id"] for r in oprows if r["horizon"]]
            horizon_val = max(
                [r["batch_id"] for r in oprows if r["batch_id"] <= cutoff]
                + prior_h,
                default=None,
            )
            kept = sorted(
                {r["batch_id"] for r in oprows
                 if r["batch_id"] > cutoff and not r["horizon"]}
            )
            if horizon_val is not None:
                out_rows.append((int(horizon_val), op_key, True))
                kept = [b for b in kept if b > horizon_val]
            out_rows.extend((int(b), op_key, False) for b in kept)
        compacted = spark.createDataFrame(
            out_rows, "batch_id long, op string, horizon boolean"
        )
        new, old = _swap_sibling_paths(log_path)
        p_new, p_old = HPath(new), HPath(old)
        compacted.coalesce(max(1, int(compact_target_files))).write.mode(
            "overwrite"
        ).parquet(new)
        # pre-swap conflict check: a commit landed since the pinned
        # read — this attempt's compaction is stale; retry fresh
        if _data_files() != files_at_read:
            fs.delete(p_new, True)
            last_report = {"compacted": False, "rows_before": rows_before,
                           "rows_after": rows_before,
                           "files_before": files_before,
                           "files_after": files_before,
                           "attempts": attempt,
                           "aborted_concurrent_writes": True,
                           "carried_files": 0}
            continue
        if fs.exists(hlog) and not fs.rename(hlog, p_old):
            raise OSError(f"swap failed: cannot retire {log_path}")
        if not fs.rename(p_new, hlog):
            raise OSError(f"swap failed: cannot promote {new} -> {log_path}")
        # post-swap sweep of the retired dir: data files committed in
        # the rename race window (after the re-list, before the
        # retirement rename) carry their rows into the new log —
        # parquet files are self-contained, the log read merges schema
        carried = 0
        known = set(files_at_read)
        for st in fs.listStatus(p_old):
            name = st.getPath().getName()
            if (st.isFile() and not name.startswith(("_", "."))
                    and name not in known):
                fs.rename(st.getPath(),
                          HPath(os.path.join(log_path, f"carried-{name}")))
                carried += 1
        fs.delete(p_old, True)
        after = spark.read.option("mergeSchema", "true").parquet(log_path)
        return {
            "compacted": True,
            "rows_before": rows_before,
            "rows_after": after.count(),
            "files_before": files_before,
            "files_after": after.select(
                F.col("_metadata.file_path")
            ).distinct().count(),
            "attempts": attempt,
            "carried_files": carried,
        }
    return last_report


def reset_op_log(spark: SparkSession, path: str, op: str | None) -> dict:
    """Escape hatch for an INTENTIONAL stream rebind: delete every
    ``_batches`` replay-log row (including horizon rows) for one op
    namespace, so a stream restarted on a fresh checkpoint — whose
    micro-batch ids restart at 0 — does not silently no-op its early
    batches against a stale horizon (see :func:`gc`'s checkpoint-reset
    note).  ``op=None`` targets the legacy null-op namespace.

    Only call this when the op's ALREADY-APPLIED effects are accounted
    for (e.g. the rebound stream replays from a source offset at or
    after the index's current state, or the faces' id-level
    ``dedup_ids`` anti-join is acceptable as the only guard).  The
    rewrite goes through the crash-safe staged swap.  Returns
    ``{"removed_rows", "rows_after"}``."""
    log_path = os.path.join(path, "_batches")
    _recover_swap(spark, log_path)
    try:
        seen = spark.read.option("mergeSchema", "true").parquet(log_path)
    except AnalysisException as e:
        if _is_path_not_found(e):
            return {"removed_rows": 0, "rows_after": 0}
        raise
    norm = seen.select(
        F.col("batch_id").cast("long").alias("batch_id"),
        (F.col("op") if "op" in seen.columns
         else F.lit(None).cast("string")).alias("op"),
        (F.coalesce(F.col("horizon"), F.lit(False))
         if "horizon" in seen.columns else F.lit(False)).alias("horizon"),
    )
    match = F.col("op").isNull() if op is None else (F.col("op") == str(op))
    n_removed = norm.filter(match).count()
    if n_removed == 0:
        return {"removed_rows": 0, "rows_after": norm.count()}
    survivors = norm.filter(~F.coalesce(match, F.lit(False))).collect()
    kept = spark.createDataFrame(
        [(int(r["batch_id"]), r["op"], bool(r["horizon"]))
         for r in survivors],
        "batch_id long, op string, horizon boolean",
    )

    def _write(staging: str) -> None:
        kept.coalesce(1).write.mode("overwrite").parquet(staging)

    _replace_dir(spark, _write, log_path)
    return {"removed_rows": int(n_removed), "rows_after": len(survivors)}


def _post_sweep_kept(
    spark: SparkSession, path: str, table: str, id_col: str
) -> int:
    """Post-sweep kept count: the _meta n_rows counter when present,
    else (legacy _meta without the column — loaders fall back to
    counting) the ground truth: distinct ids still in ``table``."""
    post_meta = _read_meta(spark, path)
    n_kept_raw = post_meta.get("n_rows")
    if n_kept_raw is not None:
        return int(n_kept_raw)
    return int(
        spark.read.parquet(os.path.join(path, table))
        .select(id_col).distinct().count()
    )


def rp_index_groups(
    spark: SparkSession,
    path: str,
    threshold: float = 0.9,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Corpus-wide embedding dedup of the ALREADY-INGESTED corpus from
    its persisted RP index alone — the corpus is never re-projected:
    the stored bucket table self-joins on (tbl, cell) to propose
    candidates (a_id < b_id), the stored vectors verify them with the
    EXACT cosine at ``threshold``, connected components collapse
    transitive groups, and one representative (min id) per component
    survives — singletons keep themselves.  The retroactive sweep
    companion to :func:`rp_match_index`'s per-batch face (the
    ``minhash_index_groups`` contract for the embedding family).

    Returns the KEEP set: one ``(id_col)`` row per surviving vector.

    ``max_bucket_size`` (opt-in): caps each bucket's contribution to
    the self-join at the first N ids (ascending — deterministic); an
    exact-duplicate cluster keeps its connectivity through any cap
    >= 2 (all members share every bucket, so the capped witnesses
    still chain), diverse hot buckets trade recall as usual."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        IndexCtx,
        RPFamily,
        bucket_self_pairs,
        keep_from_pairs,
        verify_pairs,
    )

    fam = RPFamily()
    vecs, buckets, meta = load_rp_index(spark, path)
    ctx = IndexCtx(spark, path, meta)
    id_col = meta["id_col"]
    cand = bucket_self_pairs(
        buckets, fam.bucket_keys, id_col, max_bucket_size=max_bucket_size
    )
    pairs = verify_pairs(ctx, fam, cand, vecs, threshold)
    return keep_from_pairs(vecs, pairs, id_col)


def rp_apply_groups(
    spark: SparkSession,
    path: str,
    threshold: float = 0.9,
    batch_id: int | None = None,
    max_bucket_size: int | None = None,
) -> dict:
    """One-call retroactive sweep-APPLY for the embedding near-dup
    index (the ``minhash_apply_groups`` contract): compute the keep
    set from the index alone (:func:`rp_index_groups`), physically
    remove every loser from vectors AND buckets
    (file-granular, replay-logged under op='rp_sweep'), and report
    {kept, removed_rows, skipped_replay}.  After it returns, the index
    is a fixpoint: re-running the sweep removes nothing."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        RPFamily,
        apply_groups,
    )

    return apply_groups(
        spark, path, RPFamily(),
        keep_fn=lambda: rp_index_groups(
            spark, path, threshold=threshold,
            max_bucket_size=max_bucket_size,
        ),
        batch_id=batch_id,
    )



# ---------------------------------------------------------------------------
# Persisted SimHash near-dup index — round 13: the fourth family over
# the shared lifecycle core (sources/index_lifecycle.py), closing the
# gap that SimHash was the one dedup scheme with only a one-shot face
# (simhash_pairs / simhash_pairs_sql_safe re-sign the WHOLE corpus per
# run).  Data model under ``path``: sigs/ (id, sim BIGINT), chunks/
# (id, chunk_idx, chunk_val; partitioned by chunk_idx — a batch's
# candidate join prunes at file level per chunk), _meta (bits,
# max_hamming, hash_family, id_col, n_rows).  hash_family
# 'sql_safe31' keeps every face DuckDB-replayable (the driver gate);
# 'native64' is the production-discrimination variant — see
# dedup.simhash_pairs_sql_safe's discrimination-gap note.


def _simhash_family(text_col: str = "text"):
    from astro_vectordb_spark.sources.index_lifecycle import SimhashFamily

    return SimhashFamily(text_col=text_col)


def _simhash_thr(meta: dict, max_hamming: int | None) -> tuple[int, float]:
    mh = int(meta["max_hamming"]) if max_hamming is None else int(max_hamming)
    if mh > int(meta["max_hamming"]):
        raise ValueError(
            f"simhash index built for max_hamming={meta['max_hamming']}; "
            f"querying at {mh} would lose the pigeonhole recall guarantee "
            f"(chunks = max_hamming + 1 at build time)"
        )
    bits = int(meta["bits"])
    return bits, (bits - mh) / bits


def _simhash_frac_to_hamming(df: DataFrame, bits: int) -> DataFrame:
    # exact: sim_frac is the 6-rounded rational (bits - h)/bits, and
    # bits <= 64 keeps the round-trip error far under 0.5
    return df.select(
        "new_id", "hist_id",
        F.round((F.lit(1.0) - F.col("sim_frac")) * bits, 0)
        .cast("int").alias("hamming"),
    )


def save_simhash_index(
    docs: DataFrame,
    path: str,
    max_hamming: int = 3,
    hash_family: str = "sql_safe31",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Build + persist the SimHash near-dup index: sign the corpus
    once, store signatures + the pigeonhole chunk table for
    ``max_hamming`` (chunks = max_hamming + 1 -> recall exactly 1.0
    for pairs within that distance; queries may use any smaller
    distance).

    ``sql_safe31`` caps ``max_hamming`` at 3: its chunk layout is the
    FIXED 4-chunk split the DuckDB twin replays
    (dedup.SIMHASH_SQL_CHUNKS), and 4 chunks only pigeonhole-guarantee
    recall up to hamming 3 — accepting a larger build distance would
    silently break the recall-exactly-1.0 promise above (and at
    hamming >= 8 on 31 bits the 6-decimal score rounding can drop
    pairs at exactly the threshold).  ``native64`` derives
    ``max_hamming + 1`` chunks, so any distance is honored there."""
    from astro_vectordb_spark.sources.index_lifecycle import save_index

    if hash_family not in ("sql_safe31", "native64"):
        raise ValueError(f"unknown simhash hash_family {hash_family!r}")
    if hash_family == "sql_safe31" and int(max_hamming) > 3:
        raise ValueError(
            "sql_safe31 simhash indexes support max_hamming <= 3 (the "
            "fixed 4-chunk SQL-replayable layout pigeonholes exactly "
            "that far); build with hash_family='native64' for larger "
            f"distances (got max_hamming={max_hamming})"
        )
    bits = 31 if hash_family == "sql_safe31" else 64
    params = {"bits": bits, "max_hamming": int(max_hamming),
              "hash_family": str(hash_family), "id_col": str(id_col)}
    save_index(
        docs, path, _simhash_family(text_col), params,
        meta_values=(bits, int(max_hamming), str(hash_family),
                     str(id_col)),
    )


def load_simhash_index(spark: SparkSession, path: str):
    """-> (sigs df, chunks df, meta dict)."""
    from astro_vectordb_spark.sources.index_lifecycle import load_index

    return load_index(spark, path, _simhash_family())


def simhash_match_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    max_hamming: int | None = None,
    text_col: str = "text",
    max_bucket_size: int | None = None,
    telemetry: dict | None = None,
) -> DataFrame:
    """Match a NEW batch against the persisted SimHash index without
    re-signing history: sign the batch under the stored hash family,
    join its pigeonhole chunks against the compact chunk table, verify
    candidates with the exact popcount hamming.  Returns
    ``(new_id, hist_id, hamming)`` filtered at ``max_hamming``
    (default: the index's build distance; larger values are rejected —
    the stored chunk count only guarantees recall up to the build
    distance).  Same hot-bucket cap + telemetry contract as the
    sibling families."""
    from astro_vectordb_spark.sources.index_lifecycle import match_index

    meta = _read_meta(spark, path)
    bits, thr = _simhash_thr(meta, max_hamming)
    out = match_index(
        spark, path, _simhash_family(text_col), new_docs, threshold=thr,
        max_bucket_size=max_bucket_size, telemetry=telemetry,
    )
    return _simhash_frac_to_hamming(out, bits)


def simhash_append_to_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    batch_id: int | None = None,
    dedup_ids: bool = True,
    text_col: str = "text",
) -> dict:
    """Incremental insert (the shared crash-self-healing contract:
    signatures append before chunks; the chunk append derives from the
    stored sigs-vs-chunks id diff)."""
    from astro_vectordb_spark.sources.index_lifecycle import append_to_index

    return append_to_index(
        spark, path, _simhash_family(text_col), new_docs,
        batch_id=batch_id, dedup_ids=dedup_ids,
    )


def simhash_remove_from_index(
    spark: SparkSession,
    path: str,
    doc_ids,
    batch_id: int | None = None,
    op: str = "simhash_remove",
) -> dict:
    """Physical delete — file-granular on both tables, chunks first."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        remove_from_index,
    )

    return remove_from_index(
        spark, path, _simhash_family(), doc_ids, batch_id=batch_id, op=op
    )


def simhash_compact_index(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 4_000_000,
    min_file_ratio: float = 2.0,
) -> dict:
    """Churn-aware compaction (shared contract): staged-swap rewrite,
    chunks re-derived from the compacted signatures."""
    from astro_vectordb_spark.sources.index_lifecycle import compact_index

    return compact_index(
        spark, path, _simhash_family(),
        target_rows_per_file=target_rows_per_file,
        min_file_ratio=min_file_ratio,
    )


def simhash_index_groups(
    spark: SparkSession,
    path: str,
    max_hamming: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Corpus-wide SimHash dedup of the ALREADY-INGESTED corpus from
    its persisted index alone — no text is re-signed: chunk self-join
    candidates (a_id < b_id), popcount-hamming verify, connected
    components, min-id representative; singletons keep themselves.
    Returns the KEEP set (one ``id_col`` row per survivor)."""
    from astro_vectordb_spark.sources.index_lifecycle import (
        IndexCtx,
        bucket_self_pairs,
        keep_from_pairs,
        verify_pairs,
    )

    fam = _simhash_family()
    sigs, chunks, meta = load_simhash_index(spark, path)
    _, thr = _simhash_thr(meta, max_hamming)
    ctx = IndexCtx(spark, path, meta)
    id_col = meta["id_col"]
    cand = bucket_self_pairs(
        chunks, fam.bucket_keys, id_col, max_bucket_size=max_bucket_size
    )
    pairs = verify_pairs(ctx, fam, cand, sigs, thr)
    return keep_from_pairs(sigs, pairs, id_col)


def simhash_apply_groups(
    spark: SparkSession,
    path: str,
    max_hamming: int | None = None,
    batch_id: int | None = None,
    max_bucket_size: int | None = None,
) -> dict:
    """One-call retroactive sweep-APPLY (the shared contract),
    replay-logged under op='simhash_sweep'; fixpoint after."""
    from astro_vectordb_spark.sources.index_lifecycle import apply_groups

    return apply_groups(
        spark, path, _simhash_family(),
        keep_fn=lambda: simhash_index_groups(
            spark, path, max_hamming=max_hamming,
            max_bucket_size=max_bucket_size,
        ),
        batch_id=batch_id,
    )
