"""Plan-shape tests: lock the physical plans the scale story needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.crud import point_lookup
from astro_vectordb_spark.operators.topk import (
    batch_topk,
    similarity_join,
    topk_search,
)
from astro_vectordb_spark.plans.explain import (
    has_broadcast_join,
    has_pushed_filter,
    has_take_ordered,
    whole_stage_codegen_spans,
)


# NOTE: plan tests must see real parquet scans. conftest caches the
# sf0.001 tables, and Spark substitutes a cached InMemoryRelation for
# any read of the same path — so these tests read sf0.01 instead.
PLAN_SF = "/root/testdata/sf0.01"


def _qv(embeddings, vec_id=0):
    return embeddings.filter(F.col("vec_id") == vec_id).first()["embedding"]


def test_topk_compiles_to_take_ordered(spark):
    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    df = topk_search(emb, _qv(emb), k=10, strength=20)
    assert has_take_ordered(df), "top-K must avoid a global sort"


def test_point_lookup_pushes_filter_to_scan(spark):
    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    df = point_lookup(emb, 42)
    assert has_pushed_filter(df, "vec_id")


def test_topk_is_single_stage(spark):
    """Single-query top-K must be one scan stage: no Exchange anywhere
    (TakeOrderedAndProject merges per-partition heaps on the driver)."""
    from astro_vectordb_spark.plans.explain import executed_plan

    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    df = topk_search(emb, _qv(emb), k=10, strength=20)
    assert "Exchange" not in executed_plan(df)


def test_batch_topk_broadcasts_queries(spark):
    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df = batch_topk(emb, queries, k=5)
    assert has_broadcast_join(df), "query set must broadcast, corpus must not shuffle for the join"


def test_similarity_join_broadcasts(spark):
    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet").limit(50)
    df = similarity_join(emb, threshold=0.5)
    assert has_broadcast_join(df)


def test_relational_star_join_broadcasts_dims(spark):
    from astro_vectordb_spark.operators.relational import revenue_topn

    li = spark.read.parquet(f"{PLAN_SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{PLAN_SF}/orders.parquet")
    cust = spark.read.parquet(f"{PLAN_SF}/customer.parquet")
    df = revenue_topn(li, orders, cust, n=10)
    assert has_broadcast_join(df)
    assert has_take_ordered(df)


def test_aqe_splits_skewed_join(spark):
    """A pathologically skewed join key must trigger AQE's skew-join
    splitting (isSkew=true in the final adaptive plan) instead of one
    straggler task."""
    from astro_vectordb_spark.plans.explain import executed_plan

    # left: 99% of rows share key 7; right: UNIQUE keys (so the join
    # output stays linear — the skew is in the shuffle, not a blow-up)
    left = spark.range(0, 2_000_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(0, 2_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
    try:
        j = left.join(right.hint("shuffle_merge"), "k").select(
            F.sum("v").alias("s")
        )
        # execute THIS plan instance so AQE finalizes it, then inspect
        j.collect()
        plan = executed_plan(j)
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:1500]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read all lineitem columns."""
    from astro_vectordb_spark.plans.explain import executed_plan

    li = spark.read.parquet(f"{PLAN_SF}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    plan = executed_plan(df)
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_returnflag" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs, f"column pruning failed: {rs}"


def test_rank_percentiles_prune_scan_and_avoid_full_buffer(spark):
    """The rank-percentile plan must read ONLY the profiled columns and
    contain no full-buffer percentile aggregate (the unscalable shape
    it replaced)."""
    from astro_vectordb_spark.operators.profiling import profile_numeric
    from astro_vectordb_spark.plans.explain import executed_plan

    li = spark.read.parquet(f"{PLAN_SF}/lineitem.parquet")
    df = profile_numeric(
        li, ["l_quantity", "l_discount"], percentiles="rank"
    )
    plan = executed_plan(df)
    for rs_part in plan.split("ReadSchema: ")[1:]:
        rs = rs_part.split("\n")[0]
        assert "l_extendedprice" not in rs, f"pruning failed: {rs}"
    assert "percentile(" not in plan.lower(), "full-buffer percentile present"


def test_filtered_topk_pushes_predicate_and_stays_single_stage(spark):
    """Metadata pre-filter must reach the parquet scan (PushedFilters)
    and the plan must stay shuffle-free (TakeOrderedAndProject)."""
    from astro_vectordb_spark.operators.topk import filtered_topk
    from astro_vectordb_spark.plans.explain import executed_plan

    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    df = filtered_topk(emb, F.col("label") == 2, _qv(emb, 5), k=10, strength=0)
    assert has_pushed_filter(df, "label")
    assert has_take_ordered(df)
    assert "Exchange" not in executed_plan(df)


def test_bm25_single_corpus_scan_lineage_no_corpus_shuffle(spark):
    """BM25's only exchanges are the 1-row stats aggregate and its
    broadcast — the corpus itself is never shuffled (no explode, no
    (doc, term) groupBy, no tf x doclen join)."""
    from astro_vectordb_spark.operators.keyword import bm25_topk
    from astro_vectordb_spark.plans.explain import executed_plan

    docs = spark.read.parquet(f"{PLAN_SF}/documents.parquet")
    plan = executed_plan(bm25_topk(docs, ["merge", "hash"], k=10))
    assert has_take_ordered(bm25_topk(docs, ["merge", "hash"], k=10))
    # the stats agg is a SinglePartition exchange; a HashPartitioning
    # exchange would mean the corpus is being shuffled
    assert "hashpartitioning" not in plan.lower(), plan


def test_hnsw_shard_health_pure_codegen_and_pruned(spark, tmp_path):
    """The graph-health metric must stay a no-UDF aggregation whose
    scan reads only (shard_id, neighbors) — at 100 TB it runs against
    the full persisted graph, so a Python stage or an unpruned vector
    column would make routine health checks cost like a serve."""
    from astro_vectordb_spark.operators.hnsw import (
        hnsw_build_shards,
        hnsw_shard_health,
    )
    from astro_vectordb_spark.plans.explain import executed_plan
    from astro_vectordb_spark.sources.vault import save_hnsw_index

    emb = spark.read.parquet(f"{PLAN_SF}/embeddings.parquet")
    path = str(tmp_path / "hh")
    save_hnsw_index(
        hnsw_build_shards(emb, num_shards=2, m=8, seed=3), path,
        m=8, metric="cosine",
    )
    graph = spark.read.parquet(f"{path}/graph")
    plan = executed_plan(hnsw_shard_health(graph, m=8))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "neighbors" in rs
    assert "qvec" not in rs and "embedding" not in rs, (
        f"vector column not pruned from the health scan: {rs}"
    )
