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
from astro_vectordb_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from astro_vectordb_spark.operators.text_analysis import (
    doc_fingerprints,
    language_id,
    quality_scores,
    text_stats,
)
from astro_vectordb_spark.operators.crud import (
    point_lookup,
    sync_merge,
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


def _q_facade_exact_topk(spark, sf_dir):
    # the one-call facade over a PLAIN parquet table: kind detection
    # must resolve to the exact scan and produce hash-identical
    # results to the explicit operator call (searchAstroDB parity,
    # driver/driver.ts:290-307)
    from astro_vectordb_spark.search import search

    return search(
        spark, f"{sf_dir}/embeddings.parquet", _qvec(spark, sf_dir, 5), k=10
    )


def _q_facade_hnsw_gate(spark, sf_dir):
    # facade over the PERSISTED sharded HNSW index at a full-recall
    # beam, exact-fold re-rank — the same hash-gate construction as
    # ann_hnsw_recall_gate, but the load + dispatch + serve path runs
    # through search(): a facade-dispatch regression (wrong kind,
    # dropped metric, broken meta plumbing) becomes a driver hash
    # mismatch
    from astro_vectordb_spark.functions.vector import similarity
    from astro_vectordb_spark.search import search

    emb = _emb(spark, sf_dir)
    hits = search(
        spark, hnsw_index_path(spark, sf_dir), _qvec(spark, sf_dir, 9),
        k=10, ef_search=400,
    )
    qv = F.array(*[F.lit(float(x)) for x in _qvec(spark, sf_dir, 9)])
    return (
        hits.select("vec_id")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .withColumn("score", similarity(F.col("embedding"), qv, "cosine"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("score", 6).alias("score"))
    )


def _q_facade_ivf_gate(spark, sf_dir):
    # facade over the PERSISTED IVF index at a full-recall probe budget
    # (nprobe = k_cells probes every cell; scoring inside the cells is
    # the exact fold), completing hash coverage of kind-detection /
    # metric / meta plumbing for the IVF kind: the facade must resolve
    # 'ivf' from the layout, read k_cells+metric from _meta, and serve
    # exactly the brute-force top-10 — any dispatch regression is a
    # driver hash mismatch.  (ann_ivf_recall_gate pins the ADAPTIVE
    # probe rule through the explicit operator; this gate pins the
    # facade path at the provably-exact budget.)
    from astro_vectordb_spark.search import search

    return search(
        spark, ivf_index_path(spark, sf_dir), _qvec(spark, sf_dir, 7),
        k=10, nprobe=12,
    )


def _q_facade_pq_gate(spark, sf_dir):
    # facade over the PERSISTED PQ index (built THROUGH remove-then-
    # append churn — see pq_index_path) at a full-recall refine budget:
    # stage-1 ADC must place every exact top-10 id inside the 64*k
    # candidate set (>= corpus size at the oracle scales, so provably
    # exact) and stage 2 re-ranks with the exact fold — the facade's
    # PQ dispatch, codebook reload, and vectors= plumbing all sit on
    # the hash path.
    from astro_vectordb_spark.search import search

    return search(
        spark, pq_index_path(spark, sf_dir), _qvec(spark, sf_dir, 11),
        k=10, vectors=_emb(spark, sf_dir), refine_factor=64,
    )


_IVFPQ_INDEX_CACHE: dict[str, str] = {}


def ivfpq_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted IVF-PQ index (KMeans cells x
    PQ codes, codes partitioned by cell so probing prunes at the file
    listing)."""
    if sf_dir in _IVFPQ_INDEX_CACHE:
        return _IVFPQ_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.pq import ivf_pq_build
    from astro_vectordb_spark.sources.vault import save_ivf_pq_index

    encoded, cents, model = ivf_pq_build(
        _emb(spark, sf_dir), k_cells=8, m=8, ks=64, max_rows=20_000
    )
    path = tempfile.mkdtemp(prefix="astro_ivfpq_idx_")
    save_ivf_pq_index(encoded, cents, model, path)
    _IVFPQ_INDEX_CACHE[sf_dir] = path
    return path


def _q_facade_ivfpq_gate(spark, sf_dir):
    # facade over the PERSISTED IVF-PQ index — serving with the
    # ADAPTIVE DEFAULT (nprobe unset -> None, round-10 verdict item
    # 2): at k_cells=8 the profile rule's standout test (s_max-mean)/
    # std >= 3 can NEVER fire (max attainable z over k values is
    # sqrt(k-1) = sqrt(7) ~ 2.65), so the adaptive path probes EVERY
    # cell by construction — the hash gate stays provably exact while
    # the default code path (profile computation, all-cells fallback,
    # two-stage dispatch) sits on the hash.  refine 64*k >= corpus at
    # the oracle scales, so stage 2 exact-re-ranks the whole corpus
    # and the output equals brute force.  With this, all FIVE index
    # kinds are facade-hash-gated.
    from astro_vectordb_spark.search import search

    return search(
        spark, ivfpq_index_path(spark, sf_dir), _qvec(spark, sf_dir, 13),
        k=10, vectors=_emb(spark, sf_dir), refine_factor=64,
    )


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
    from astro_vectordb_spark.operators.crud import tombstone_delete_df

    emb = _emb(spark, sf_dir)
    doomed = emb.filter(F.col("vec_id") % 97 == 0).select("vec_id")
    marked = tombstone_delete_df(emb, doomed)
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


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _docs_par(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_docs`` behind the conditional scan-parallelism guard.

    The testdata corpora ship as single-row-group parquet, so the scan
    is ONE task and every per-row stage above it (tokenization,
    higher-order folds, Arrow embed kernels) serializes on one core
    while 31 sit idle.  ``ensure_scan_parallelism`` is the guide-§2.5
    "repartition immediately after the read" remedy made conditional:
    on a normal 100 TB layout (scan splits >= cluster parallelism) it
    is a no-op and the plan is unchanged.

    Used ONLY by the queries where the round-15 interleaved A/B showed
    the exchange paying for itself (heavy per-row compute: signatures,
    BM25 folds, shingle explodes, Arrow embed kernels) — for cheap
    scans and many-small-job facades the added exchange measured as a
    net loss, so those keep the plain read.

    ROUND-ROBIN (no key) deliberately: hash-repartitioning on doc_id
    lets the downstream per-doc groupBys reuse the partitioning and
    drop their own exchange — which sounds like a win but removes the
    exchange that was the SHARED-SUBPLAN REUSE point, so e.g. a
    signature table consumed by both legs of a band self-join gets
    recomputed per leg (measured 1.5-3x task-time blowups).  Keyless
    repartition keeps those exchanges (and their ReusedExchange) in
    place while still parallelizing the scan-side compute."""
    from astro_vectordb_spark.operators.partitioning import (
        ensure_scan_parallelism,
    )

    return ensure_scan_parallelism(
        load_table(spark, sf_dir, "documents"),
        cache_key=f"{sf_dir}/documents",
    )


def _q_embedding_near_dup_blocked(spark, sf_dir):
    # RP-LSH blocked embedding near-dup on the FULL embeddings table:
    # multi-table hyperplane buckets -> id-only candidate join -> exact
    # cosine verify.  No cross join, no corpus broadcast (the 100 TB
    # shape).  Oracle = bit-exact SQL twin of the same pipeline (the
    # plane literals come from the same _rp_plane function).
    from astro_vectordb_spark.operators.dedup import embedding_near_dups

    return embedding_near_dups(
        _emb(spark, sf_dir), threshold=0.4, dim=64, method="blocked"
    )


def _q_embedding_dedup_groups(spark, sf_dir):
    # END-TO-END embedding dedup at scale shapes: RP-LSH blocked pairs
    # -> connected components -> keep min-id representative per group.
    # Every stage oracle-checked (pairs via the bit-exact SQL twin,
    # closure via a recursive CTE).
    from astro_vectordb_spark.operators.dedup import (
        dedup_groups,
        embedding_near_dups,
    )

    emb = _emb(spark, sf_dir)
    pairs = embedding_near_dups(emb, threshold=0.4, dim=64, method="blocked")
    return dedup_groups(emb, pairs, id_col="vec_id").select("vec_id")


def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(spark, sf_dir)).select("doc_id")


def _q_near_dup_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8, n=3)


def _q_near_dup_minhash(spark, sf_dir):
    # approximate (xxhash64-based) — no SQL oracle; rows-only check.
    # recall vs exact jaccard is asserted in tests/test_dedup.py.
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.8, num_hashes=32, bands=8
    )


def _q_near_dup_minhash_sql(spark, sf_dir):
    # the SAME LSH pipeline with an ANSI-SQL-expressible hash family —
    # the full approximate path is hash-checked by the oracle.
    from astro_vectordb_spark.operators.dedup import minhash_lsh_pairs_sql_safe

    return minhash_lsh_pairs_sql_safe(
        _docs_par(spark, sf_dir), threshold=0.8, num_hashes=32, bands=8
    )


def _q_near_dup_simhash(spark, sf_dir):
    # approximate (xxhash64-based) — no SQL oracle; rows-only check.
    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def _q_near_dup_simhash_sql(spark, sf_dir):
    # SQL-expressible hash family -> the SimHash pipeline is fully
    # oracle-checked (signature, chunking, hamming verify).
    from astro_vectordb_spark.operators.dedup import simhash_pairs_sql_safe

    return simhash_pairs_sql_safe(_docs(spark, sf_dir), max_hamming=3)


_SIMHASH_IDX_CACHE: dict[str, str] = {}


def simhash_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted SimHash index over the
    HISTORICAL corpus slice (doc_id % 5 != 4), built THROUGH the
    incremental lifecycle — save on 90%, APPEND the held-out 10% —
    the minhash_index_path recipe for the fourth family."""
    if sf_dir in _SIMHASH_IDX_CACHE:
        return _SIMHASH_IDX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.vault import (
        save_simhash_index,
        simhash_append_to_index,
    )

    hist = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") % 5 != 4
    )
    path = tempfile.mkdtemp(prefix="astro_sh_idx_")
    save_simhash_index(hist.filter(F.col("doc_id") % 10 != 7), path,
                       max_hamming=3)
    simhash_append_to_index(
        spark, path, hist.filter(F.col("doc_id") % 10 == 7), batch_id=0
    )
    _SIMHASH_IDX_CACHE[sf_dir] = path
    return path


def _q_simhash_index_incremental(spark, sf_dir):
    # round 13: INCREMENTAL SimHash near-dup — a new doc batch matched
    # against the persisted index (stored 31-bit SQL-safe signatures +
    # pigeonhole chunk table; history is never re-signed) as ONE
    # driver hash.  The batch = the held-out corpus slice (doc_id % 5
    # == 4) PLUS planted copies of 16 historical docs (ids +100000),
    # which must surface at hamming exactly 0; verification is the
    # popcount on the XOR of stored signatures.  The index is built
    # save -> APPEND, so drift in the signature votes, the chunk
    # layout, the append's chunk-sync, or the hamming arithmetic
    # shifts the (new_id, hist_id, hamming) hash.  Fourth family over
    # the shared index-lifecycle core.
    #
    # Round 14 (verdict What's-wrong #4): the batch is the doc_id % 20
    # == 4 slice (a subset of the held-out % 5 == 4 slice — still
    # disjoint from the indexed history) instead of the full held-out
    # 20%: the deliberately coarse 31-bit family emits pair volume
    # linear in batch size, and ~1/4 the batch still verifies the same
    # signature/chunk/popcount arithmetic while keeping the gate out
    # of the driver window's heavy tail.  Oracle changed in lockstep
    # (the gate was never driver-signed before this round).
    from astro_vectordb_spark.sources.vault import simhash_match_index

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 20 == 4).unionAll(
        docs.filter(
            (F.col("doc_id") < 20) & (F.col("doc_id") % 5 != 4)
        ).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return simhash_match_index(
        spark, simhash_index_path(spark, sf_dir), new, max_hamming=3
    )


def _q_near_dup_native_exactdup(spark, sf_dir):
    # Hash-checkable surface for the two NATIVE (xxhash64) near-dup
    # families, which are otherwise rows-only (the oracle cannot replay
    # xxhash).  Each family is restricted to pairs with IDENTICAL
    # feature sets, where its pipeline is deterministic REGARDLESS of
    # hash family:
    # - minhash: equal distinct 3-gram shingle sets give equal MinHash
    #   signatures (collide in every band, exact-Jaccard-verified at
    #   1.0), so the native jaccard==1.0 pair list must equal the
    #   SQL-computable equal-shingle-set pair list.  (n=1 here was a
    #   100x bench cliff: the word-soup corpus shares a tiny vocab, so
    #   unigram token SETS collide for 35k pairs and the banded
    #   candidate join explodes; 3-gram sets are near-unique.)
    # - simhash: equal distinct-token sets give equal signatures
    #   (hamming 0, shares every pigeonhole chunk), so semi-joining
    #   the native hamming<=3 pairs with the equal-token-set list must
    #   return exactly that list.
    # A recall or verification regression in either native path drops
    # or extends rows and hash-mismatches.
    from astro_vectordb_spark.functions.text import tokens, word_shingles
    from astro_vectordb_spark.operators.dedup import simhash_pairs

    docs = _docs(spark, sf_dir)
    mh = (
        minhash_lsh_pairs(docs, threshold=0.8, num_hashes=32, bands=8, n=3)
        .filter(F.col("jaccard") == 1.0)
        .select(F.lit("minhash").alias("family"), "a_id", "b_id")
    )
    toks = (
        docs.select(
            "doc_id",
            F.array_sort(
                F.array_distinct(tokens(F.lower(F.col("text"))))
            ).alias("_tk"),
        )
        .filter(F.size("_tk") > 0)
        .select("doc_id", F.array_join("_tk", "\x01").alias("_key"))
    )
    eq = (
        toks.select(F.col("doc_id").alias("a_id"), "_key")
        .join(toks.select(F.col("doc_id").alias("b_id"), "_key"), "_key")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    shq = (
        simhash_pairs(docs, max_hamming=3)
        .join(eq, ["a_id", "b_id"], "semi")
        .select(F.lit("simhash").alias("family"), "a_id", "b_id")
    )
    return mh.unionByName(shq)


def _q_dedup_groups(spark, sf_dir):
    # full near-dup dedup: exact jaccard pairs -> connected components
    # -> keep min-id per component (+ singletons).  The iterative label
    # propagation is oracle-checked via a recursive CTE.
    from astro_vectordb_spark.operators.dedup import dedup_groups

    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, n=3)
    return dedup_groups(docs, pairs).select("doc_id")


def _q_text_stats(spark, sf_dir):
    return text_stats(_docs_par(spark, sf_dir))


def _q_quality_scores(spark, sf_dir):
    return quality_scores(_docs_par(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return language_id(_docs_par(spark, sf_dir))


def _q_doc_fingerprints(spark, sf_dir):
    return doc_fingerprints(_docs_par(spark, sf_dir))


def _q_events_sliding(spark, sf_dir):
    # sliding window (2h window, 1h slide): each event lands in 2
    # windows; oracle = union of the two aligned tumbling assignments
    from astro_vectordb_spark.operators.events import windowed_counts

    events = load_table(spark, sf_dir, "events")
    out = windowed_counts(events, "2 hours", slide="1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _q_supplier_balance(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        sup.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            sup["s_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 6).alias("total_bal"),
            F.round(F.max("s_acctbal"), 6).alias("max_bal"),
        )
    )


def _q_part_brand_stats(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
            F.max("p_size").cast("long").alias("max_size"),
            F.count_distinct("p_type").alias("n_types"),
        )
    )


def _q_events_hourly(spark, sf_dir):
    from astro_vectordb_spark.operators.events import windowed_counts

    events = load_table(spark, sf_dir, "events")
    out = windowed_counts(events, "1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        "sum_value",
    )


def _q_event_rates(spark, sf_dir):
    from astro_vectordb_spark.operators.events import event_type_rates

    return event_type_rates(load_table(spark, sf_dir, "events"))


def _q_session_stats(spark, sf_dir):
    from astro_vectordb_spark.operators.events import session_stats

    return session_stats(load_table(spark, sf_dir, "events"), gap_minutes=30)


def _q_pricing_summary(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import pricing_summary

    return pricing_summary(load_table(spark, sf_dir, "lineitem"))


def _q_revenue_topn(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import revenue_topn

    return revenue_topn(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        n=10,
    )


def _q_customer_rank(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import customer_rank_in_nation

    return customer_rank_in_nation(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "nation")
    )


def _q_order_priority(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import order_priority_counts

    return order_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


def _q_knn_classify(spark, sf_dir):
    from astro_vectordb_spark.operators.classify import knn_classify

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_classify(emb, queries, k=10, exclude_self=True)


def _q_validate_dim(spark, sf_dir):
    from astro_vectordb_spark.operators.crud import validate_embeddings

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    corrupted = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 101 == 0, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") % 103 == 0, F.slice("embedding", 1, 3))
        .otherwise(F.col("embedding")),
    )
    return validate_embeddings(corrupted, 64).select("vec_id", "valid")


def _q_nation_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _array_digest(col: str):
    """Scalar digest columns for an array output — keeps the driver's
    canonicalizer scalar-only (module contract, lines 11-12): first
    element, length, and the element sum (a strict left fold, so the
    DuckDB twin reproduces it bit-for-bit; every element participates,
    no string casts whose formatting could diverge between engines).

    ``+ 0.0`` after each round normalizes IEEE signed zero: Spark's
    F.round goes through BigDecimal and yields +0.0 where DuckDB's
    round preserves -0.0 (e.g. round(-1e-7, 6)); the values are
    numerically equal but canonical hashes diverge.  Both this side and
    the oracle twins apply the same normalization."""
    total = F.aggregate(
        F.col(col),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return [
        (F.round(F.element_at(F.col(col), 1).cast("double"), 6) + 0.0).alias("e0"),
        F.size(col).alias("dim"),
        (F.round(total, 6) + 0.0).alias("el_sum"),
    ]


def _q_embed_docs(spark, sf_dir):
    # pluggable embedding hook — the stub encoder is deterministic hash
    # math (md5 feature hashing), so the FULL pipeline is oracle-checked
    # via scalar digests; the swap-in-a-real-model contract is tested
    # in pytest.
    from astro_vectordb_spark.functions.embed import embed_text

    return embed_text(_docs_par(spark, sf_dir)).select(
        "doc_id", *_array_digest("embedding")
    )


def _q_multimodal_decode(spark, sf_dir):
    # blob -> features mapInPandas plumbing; the stub codec is
    # deterministic sha256 math, so the pipeline (attach -> Arrow
    # batches -> decode) is oracle-checked via scalar digests.
    from astro_vectordb_spark.multimodal.binary import attach_blob, decode_features

    return decode_features(attach_blob(_docs(spark, sf_dir))).select(
        "doc_id", *_array_digest("features")
    )


def _q_token_counts(spark, sf_dir):
    from astro_vectordb_spark.functions.text import (
        bpe_ish_token_count,
        regex_token_count,
        token_count,
    )

    t = F.col("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count(t).cast("long").alias("n_ws_tokens"),
        regex_token_count(t).cast("long").alias("n_regex_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_subwords"),
    )


def _q_events_json(spark, sf_dir):
    # JSON property extraction + aggregation over the event stream table
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
    )


def _q_split_counts(spark, sf_dir):
    # deterministic hash-bucket train/val/test split — reproducible and
    # SQL-expressible, unlike random sampling
    from astro_vectordb_spark.operators.sampling import deterministic_split

    docs = _docs(spark, sf_dir)
    return (
        deterministic_split(docs, test_frac=0.1, val_frac=0.1)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))
    )


def _q_topk_quantized(spark, sf_dir):
    # int8 scalar quantization, two-stage serve: stage 1 scans ONLY the
    # compact (qvec, qscale) columns (4x less IO than the float
    # column), stage 2 exact-reranks the broadcast candidate ids
    # against full precision.  Quantization math (max-abs/127 scale,
    # floor(x/s + 0.5) codes) chosen for bit-parity with the DuckDB
    # oracle, which replays both stages.
    from astro_vectordb_spark.operators.quantize import (
        quantize_embeddings,
        topk_search_quantized,
    )

    emb = _emb(spark, sf_dir)
    return topk_search_quantized(
        quantize_embeddings(emb), emb, _qvec(spark, sf_dir, 0),
        k=10, refine_factor=4, strength=20,
    )


def _q_batch_topk_quantized(spark, sf_dir):
    # batch face of the quantized two-stage serve: stage 1 prunes
    # per-query candidates on the compact columns map-side, stage 2
    # exact-reranks the survivors against full precision
    from astro_vectordb_spark.operators.quantize import (
        batch_topk_quantized,
        quantize_embeddings,
    )

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return batch_topk_quantized(
        quantize_embeddings(emb), emb, queries, k=5, refine_factor=4
    ).withColumn("rank", F.col("rank").cast("long"))


def _q_stratified_sample(spark, sf_dir):
    # per-stratum deterministic sampling — the training-data
    # rebalancing primitive (keep all of rare languages, downsample the
    # dominant one); one codegen'd predicate on the scan, no shuffle
    from astro_vectordb_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir)
    kept = stratified_sample(
        docs, "lang", {"en": 0.2, "zh": 1.0, "fr": 0.5}, default_frac=0.05
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_id")
    )


def _q_profile_lineitem(spark, sf_dir):
    from astro_vectordb_spark.operators.profiling import profile_numeric

    # 'rank' = EXACT interpolated percentiles via distributed rank
    # arithmetic (histogram -> range-partitioned prefix sums): scale-
    # safe (no per-group value buffering) AND bit-parity with the
    # quantile_cont oracle — unlike the full-buffer F.percentile path
    # this used to pin.
    # NOTE (r15): repartitioning the single-row-group lineitem read
    # before the unpivot was tried and MEASURED SLOWER (interleaved
    # A/B 1.36x) — the raw-table exchange costs more than the unpivot
    # parallelism buys because the histogram's map-side partial agg
    # already collapses the explode before its shuffle.  Left plain.
    return profile_numeric(
        load_table(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
        percentiles="rank",
    )


def _q_read_your_writes(spark, sf_dir):
    """The reference's read path against queued writes
    (driver/driver.ts:290-312): a search issued after mutations must
    observe every batch already applied through the FIFO queue.
    Composes the real lifecycle end-to-end: versioned base commit ->
    two write batches applied one-at-a-time through the SAME code path
    the streaming sink runs per micro-batch (apply_upsert_batch:
    read_current -> keep-latest merge -> atomic manifest-swap commit)
    -> read_current -> exact top-K at a batch-2-updated vector.  The
    query vector is the UPDATED embedding of id 12, so the top hit
    (score 1.0) exists only if the read observed the write."""
    import os
    import tempfile

    from astro_vectordb_spark.sources.versioned import (
        commit_version,
        read_current,
    )
    from astro_vectordb_spark.streaming.upsert import apply_upsert_batch

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    table = os.path.join(tempfile.mkdtemp(prefix="astro_ryw_"), "table")
    commit_version(emb.filter(F.col("vec_id") >= 10), table, 0)
    # batch 1: brand-new ids (inserts)
    apply_upsert_batch(
        emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        ),
        table,
        1,
    )
    # batch 2: in-place vector updates (negated embeddings)
    apply_upsert_batch(
        emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20)).withColumn(
            "embedding", F.transform("embedding", lambda x: -x)
        ),
        table,
        2,
    )
    qv = [-float(x) for x in _qvec(spark, sf_dir, 12)]
    return topk_search(read_current(spark, table), qv, k=10, strength=20).select(
        "vec_id", "score"
    )


def _q_embed_then_search(spark, sf_dir):
    # pipeline composition: embed documents (stub encoder) -> exact
    # top-K over the embedded corpus; the stub's hash math is
    # SQL-expressible so the whole composition is oracle-checked.
    from astro_vectordb_spark.functions.embed import embed_text

    doc_vecs = embed_text(_docs(spark, sf_dir)).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    qv = doc_vecs.filter(F.col("vec_id") == 0).first()["embedding"]
    return topk_search(doc_vecs, qv, k=10, strength=0).select("vec_id", "score")


def _q_segment_no_orders(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import segment_without_orders

    return segment_without_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _q_revenue_rollup(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import revenue_rollup

    return revenue_rollup(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def _q_status_pivot(spark, sf_dir):
    from astro_vectordb_spark.operators.relational import order_status_pivot

    return order_status_pivot(load_table(spark, sf_dir, "orders"))


_IVF_INDEX_CACHE: dict[str, str] = {}


def ivf_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted IVF index (``save_ivf_index``
    writes the vector table partitioned by cell, so the nprobe cell
    filter becomes file-level partition pruning on every later
    query)."""
    if sf_dir in _IVF_INDEX_CACHE:
        return _IVF_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.ann import ivf_build_sampled
    from astro_vectordb_spark.sources.vault import save_ivf_index

    assigned, centroids = ivf_build_sampled(
        _emb(spark, sf_dir), k_cells=12, spill=2
    )
    path = tempfile.mkdtemp(prefix="astro_ivf_idx_")
    save_ivf_index(assigned.select("vec_id", "embedding", "cell_id"), centroids, path)
    _IVF_INDEX_CACHE[sf_dir] = path
    return path


def _q_ann_ivf_topk(spark, sf_dir):
    # approximate IVF (sample-fit KMeans cells + spill-2 redundant
    # assignment + nprobe pruning) at its measured Pareto point, served
    # from the PERSISTED cell-partitioned index: the nprobe IN-filter
    # prunes at the file listing (PartitionFilters), the reference's
    # loadIndex -> search lifecycle.  Rows-only check; recall vs exact
    # asserted in tests/test_ann.py.
    from astro_vectordb_spark.operators.ann import ivf_search
    from astro_vectordb_spark.sources.vault import load_ivf_index

    assigned, centroids, _, meta = load_ivf_index(
        spark, ivf_index_path(spark, sf_dir)
    )
    return ivf_search(
        assigned, centroids, _qvec(spark, sf_dir, 0), k=10, nprobe=3,
        metric=meta["metric"],
    ).select("vec_id", "score")


_HNSW_INDEX_CACHE: dict[str, str] = {}


def hnsw_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted HNSW index over the embeddings
    table (``save_hnsw_index``), keyed by sf_dir.  First call builds
    and saves; every later call returns the existing path — the
    reference's buildIndex -> saveIndex lifecycle (astrovault.ts:34-40)
    done once, with all queries served from the persisted graph."""
    if sf_dir in _HNSW_INDEX_CACHE:
        return _HNSW_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.hnsw import (
        auto_num_shards,
        hnsw_build_shards,
    )
    from astro_vectordb_spark.sources.vault import save_hnsw_index

    emb = _emb(spark, sf_dir)
    # floor the shard count at 4 so tiny corpora still build in
    # parallel; ef_construction=64 measured equal recall (0.98) to 100
    # (NOTES_r2)
    shards = auto_num_shards(emb.count(), min_parallelism=4)
    graph = hnsw_build_shards(emb, num_shards=shards, ef_construction=64)
    path = tempfile.mkdtemp(prefix="astro_hnsw_idx_")
    save_hnsw_index(graph, path, m=16, metric="cosine")
    # churn the index the way pq_index_path does (r9): edge-SWEEP a
    # deterministic id slice out, then re-append those rows — the live
    # id set ends value-identical to the fresh build, but every HNSW
    # gate now certifies build + sweep-remove (edge unlink + health
    # report) + append + persistence + serving end to end, so the
    # recall gates are served from a SWEPT index every round
    from astro_vectordb_spark.sources.vault import (
        hnsw_append_to_index,
        hnsw_remove_from_index,
    )

    churn = emb.filter(F.col("vec_id") % 17 == 3)
    churn_ids = [r["vec_id"] for r in churn.select("vec_id").collect()]
    if churn_ids:
        hnsw_remove_from_index(spark, path, churn_ids, mode="sweep")
        hnsw_append_to_index(
            spark, path, churn.select("vec_id", "embedding"), seed=23
        )
    _HNSW_INDEX_CACHE[sf_dir] = path
    return path


def _q_ann_hnsw_topk(spark, sf_dir):
    # sharded HNSW (the reference's own index structure, distributed:
    # per-partition NumPy graphs + global merge) served from the
    # PERSISTED index — the loadIndex -> search lifecycle
    # (astrovault.ts:45-69 -> hnsw.ts:241-299): load the
    # shard-partitioned graph table and beam-search it directly.
    # clustered comes from the loaded meta: True (skip the shard
    # re-shuffle) only while no graph file exceeds the session's
    # maxPartitionBytes; a split shard degrades to the re-shuffled
    # path instead of failing at task level.
    # Rows-only check; recall >= 0.9 asserted in tests/test_hnsw.py.
    from astro_vectordb_spark.operators.hnsw import hnsw_query_shards
    from astro_vectordb_spark.sources.vault import load_hnsw_index

    graph, meta = load_hnsw_index(spark, hnsw_index_path(spark, sf_dir))
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return hnsw_query_shards(
        graph, queries, k=10, m=meta["m"], metric=meta["metric"],
        ef_search=100, clustered=meta["clustered_safe"],
        index_cache_token=meta["cache_token"],
    ).withColumn("rank", F.col("rank").cast("long"))


_PQ_INDEX_CACHE: dict[str, str] = {}


def pq_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted PQ index (codebooks fit on a
    bounded driver-side sample, codes encoded distributed, both
    persisted via ``save_pq_index``)."""
    if sf_dir in _PQ_INDEX_CACHE:
        return _PQ_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.pq import pq_encode, pq_train
    from astro_vectordb_spark.sources.vault import save_pq_index

    from astro_vectordb_spark.sources.vault import (
        pq_append_to_index,
        pq_remove_from_index,
    )

    emb = _emb(spark, sf_dir)
    model = pq_train(emb, m=8, ks=64, metric="cosine", max_rows=20_000)
    path = tempfile.mkdtemp(prefix="astro_pq_idx_")
    save_pq_index(pq_encode(emb, model), model, path)
    # exercise the churn lifecycle the gate must survive: remove a
    # deterministic id slice, then re-append those rows — codes are
    # encoded under the same codebooks, so the SERVED index is
    # value-identical to the fresh build, but the recall gate now
    # certifies build + remove (touched-files-only rewrite) + append +
    # persistence + serving end to end
    churn = emb.filter(F.col("vec_id") % 17 == 3)
    churn_ids = [r["vec_id"] for r in churn.select("vec_id").collect()]
    if churn_ids:
        pq_remove_from_index(spark, path, churn_ids)
        pq_append_to_index(spark, path, churn.select("vec_id", "embedding"))
    _PQ_INDEX_CACHE[sf_dir] = path
    return path


def _q_ann_pq_topk(spark, sf_dir):
    # product-quantized two-stage search served from the PERSISTED
    # index: ADC scan over the m-bytes-per-vector code table (LUT
    # lookups, the float column never read) -> broadcast candidate ids
    # -> exact re-rank.  Rows-only check; recall >= 0.9 @ refine 32
    # asserted in tests/test_pq.py.
    from astro_vectordb_spark.operators.pq import pq_topk
    from astro_vectordb_spark.sources.vault import load_pq_index

    encoded, model, _ = load_pq_index(spark, pq_index_path(spark, sf_dir))
    return pq_topk(
        encoded, _emb(spark, sf_dir), _qvec(spark, sf_dir, 0), 10, model
    )


def _q_ann_ivf_exact(spark, sf_dir):
    # EXACT top-K with cell-bound pruning: provably identical to brute
    # force, so it shares the brute-force oracle.  Cells come from the
    # fit-free random-hyperplane builder — partition quality only
    # affects pruning rate, never correctness.
    from astro_vectordb_spark.operators.ann import (
        ivf_cell_stats,
        ivf_search_exact,
        rp_build,
    )

    emb = _emb(spark, sf_dir)
    assigned, centroids = rp_build(emb, n_planes=3, dim=64)
    stats = ivf_cell_stats(assigned, centroids)
    return ivf_search_exact(
        assigned, centroids, stats, _qvec(spark, sf_dir, 0), k=10, nprobe_seed=2
    ).select("vec_id", "score")


# words that actually occur in the synthetic documents table
_BM25_TERMS = ["merge", "hash", "spark"]
_RRF_C = 20  # per-list depth feeding the fusion


def _q_filtered_topk(spark, sf_dir):
    # metadata-filtered exact search (pre-filter): predicate reaches
    # the parquet scan as PushedFilters, then the usual
    # score -> TakeOrderedAndProject — no shuffle at any selectivity.
    from astro_vectordb_spark.operators.topk import filtered_topk

    return filtered_topk(
        _emb(spark, sf_dir), F.col("label") == 2, _qvec(spark, sf_dir, 5),
        k=10, strength=0,
    ).select("vec_id", "score")


def _q_bm25_topk(spark, sf_dir):
    # lexical retrieval: Lucene-variant BM25 as one shuffle-free
    # projection (per-term tf arrays) + a broadcast 1-row stats agg.
    from astro_vectordb_spark.operators.keyword import bm25_topk

    return bm25_topk(_docs_par(spark, sf_dir), _BM25_TERMS, k=10)


def _ranked_lists_for_hybrid(spark, sf_dir):
    """The two ranked lists hybrid search fuses: BM25 lexical and
    hash-embedding cosine, both ranked on UNROUNDED scores (bit-equal
    across engines under the fold contract) with ascending-id ties."""
    from pyspark.sql import Window

    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_score_all
    from astro_vectordb_spark.operators.topk import score_against

    docs = _docs(spark, sf_dir)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    lex = (
        bm25_score_all(docs, _BM25_TERMS)
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_C)
        .withColumn("rank", F.row_number().over(w))
    )
    doc_vecs = embed_text(docs).select("doc_id", "embedding")
    qv = doc_vecs.filter(F.col("doc_id") == 0).first()["embedding"]
    vec = (
        score_against(doc_vecs, qv)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_C)
        .withColumn("rank", F.row_number().over(w))
    )
    return lex.select("doc_id", "rank"), vec.select("doc_id", "rank")


def _q_hybrid_rrf(spark, sf_dir):
    # hybrid search: reciprocal-rank fusion of the lexical (BM25) and
    # vector (hash-embed cosine, query = doc 0) rankings — the
    # standard calibration-free way to combine the two retrieval
    # modalities in front of an LLM.
    from astro_vectordb_spark.operators.rerank import rrf_fuse

    lex, vec = _ranked_lists_for_hybrid(spark, sf_dir)
    return rrf_fuse([lex, vec], k=10)


def _q_hybrid_weighted(spark, sf_dir):
    # calibrated hybrid: min-max-normalized convex fusion (0.4 lexical
    # + 0.6 vector) of the same two top-20 lists RRF fuses — the
    # score-shape-aware alternative.
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_score_all
    from astro_vectordb_spark.operators.rerank import score_fusion
    from astro_vectordb_spark.operators.topk import score_against

    docs = _docs(spark, sf_dir)
    lex = (
        bm25_score_all(docs, _BM25_TERMS)
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_C)
    )
    doc_vecs = embed_text(docs).select("doc_id", "embedding")
    qv = doc_vecs.filter(F.col("doc_id") == 0).first()["embedding"]
    vec = (
        score_against(doc_vecs, qv)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RRF_C)
        .select("doc_id", "score")
    )
    return score_fusion([lex, vec], [0.4, 0.6], k=10)


def _q_mmr_rerank(spark, sf_dir):
    # MMR diversification of a top-30 candidate set (greedy
    # relevance-vs-redundancy tradeoff, lambda=0.7); the fold kernel
    # makes every pairwise cosine bit-equal to the SQL oracle's
    # unrolled greedy.
    from astro_vectordb_spark.operators.rerank import mmr_rerank
    from astro_vectordb_spark.operators.topk import score_against

    emb = _emb(spark, sf_dir)
    cand = (
        score_against(emb, _qvec(spark, sf_dir, 0))
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(30)
        .select("vec_id", "embedding", "score")
    )
    return mmr_rerank(cand, k=5, lam=0.7, kernel="fold")


def _q_ann_hnsw_filtered(spark, sf_dir):
    # filtered approximate search on the persisted graph: allowed-id
    # broadcast + result-set filter with selectivity-scaled beam
    # over-fetch. Rows-only (approximate); filtered recall pinned in
    # tests/test_hnsw.py.
    from astro_vectordb_spark.operators.hnsw import hnsw_query_shards
    from astro_vectordb_spark.sources.vault import load_hnsw_index

    graph, meta = load_hnsw_index(spark, hnsw_index_path(spark, sf_dir))
    emb = _emb(spark, sf_dir)
    allowed = [
        r["vec_id"]
        for r in emb.filter(F.col("label") == 2).select("vec_id").collect()
    ]
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return hnsw_query_shards(
        graph, queries, k=10, m=meta["m"], metric=meta["metric"],
        ef_search=100, clustered=meta["clustered_safe"],
        index_cache_token=meta["cache_token"], allowed_ids=allowed,
    )


# --------------------------------------------------------------------------
# ANN recall gates — hash-checkable surfaces for the approximate paths.
#
# Each gate serves from the SAME persisted, seed-deterministic index the
# rows-only query serves, but with a beam/probe/refine budget at which
# the index must achieve FULL recall on the gate queries.  The gate then
# exact-re-ranks the approximate candidates with the engine-side fold
# expression — so its output equals the brute-force exact top-K (the
# SQL-expressible side) if and only if every exact top-K id survived the
# approximate search.  A regression in build wiring, persistence, or
# serving shows up as a driver hash mismatch instead of a silent recall
# drop that only pytest would see.  Reference: searchKNNOptimized
# (hnsw.ts:241-299) — the flagship operator gets the flagship check.

def _q_ann_hnsw_recall_gate(spark, sf_dir):
    # persisted sharded HNSW at a full-recall beam (ef_search=400):
    # approximate ids -> exact fold re-rank -> must equal exact batch
    # top-10 for queries 0..2.
    from astro_vectordb_spark.functions.vector import similarity
    from astro_vectordb_spark.operators.hnsw import hnsw_query_shards
    from astro_vectordb_spark.operators.topk import rank_topk_per_query
    from astro_vectordb_spark.sources.vault import load_hnsw_index

    graph, meta = load_hnsw_index(spark, hnsw_index_path(spark, sf_dir))
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = hnsw_query_shards(
        graph, queries, k=10, m=meta["m"], metric=meta["metric"],
        ef_search=400, clustered=meta["clustered_safe"],
        index_cache_token=meta["cache_token"],
    )
    exact = (
        hits.select("query_id", "vec_id")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "score",
            similarity(F.col("embedding"), F.col("query_vec"), meta["metric"]),
        )
        .filter(F.col("score") > 0)
    )
    return rank_topk_per_query(exact, 10, num_salts=1).withColumn(
        "rank", F.col("rank").cast("long")
    )


def _q_ann_pq_recall_gate(spark, sf_dir):
    # persisted PQ index at a full-recall refine budget: the ADC scan
    # must put every exact top-10 id inside the candidate set; stage 2
    # re-ranks exactly, so the output equals the brute-force top-10.
    from astro_vectordb_spark.operators.pq import pq_topk
    from astro_vectordb_spark.sources.vault import load_pq_index

    encoded, model, _ = load_pq_index(spark, pq_index_path(spark, sf_dir))
    return pq_topk(
        encoded, _emb(spark, sf_dir), _qvec(spark, sf_dir, 7), 10, model,
        refine_factor=64,
    )


def _q_ann_ivf_recall_gate(spark, sf_dir):
    # persisted IVF index at a full-recall probe budget: the probed
    # cells must contain all exact top-10 ids; scoring inside is the
    # exact fold expression.  nprobe=None = ADAPTIVE probing from the
    # query's centroid-similarity profile (deterministic given the
    # seed-deterministic build): on the near-uniform test embeddings
    # no cell stands out, so the rule probes every cell — the graceful
    # degeneration that replaced round 7's row-count special case
    # (choose_probe_cells_adaptive; clustered corpora probe a handful
    # of cells instead, pytest-pinned).
    from astro_vectordb_spark.operators.ann import ivf_search
    from astro_vectordb_spark.sources.vault import load_ivf_index

    assigned, centroids, _, meta = load_ivf_index(
        spark, ivf_index_path(spark, sf_dir)
    )
    return ivf_search(
        assigned, centroids, _qvec(spark, sf_dir, 3), k=10, nprobe=None,
        metric=meta["metric"],
    ).select("vec_id", "score")


def _q_ann_hnsw_filtered_recall_gate(spark, sf_dir):
    # filtered approximate search at a full-recall beam: allowed-id
    # set (label = 2) + exact fold re-rank must equal the filtered
    # exact top-10.
    from astro_vectordb_spark.functions.vector import similarity
    from astro_vectordb_spark.operators.hnsw import hnsw_query_shards
    from astro_vectordb_spark.sources.vault import load_hnsw_index

    graph, meta = load_hnsw_index(spark, hnsw_index_path(spark, sf_dir))
    emb = _emb(spark, sf_dir)
    allowed = [
        r["vec_id"]
        for r in emb.filter(F.col("label") == 2).select("vec_id").collect()
    ]
    queries = emb.filter(F.col("vec_id") == 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = hnsw_query_shards(
        graph, queries, k=10, m=meta["m"], metric=meta["metric"],
        ef_search=400, clustered=meta["clustered_safe"],
        index_cache_token=meta["cache_token"], allowed_ids=allowed,
    )
    qv = F.array(*[F.lit(float(x)) for x in _qvec(spark, sf_dir, 5)])
    return (
        hits.select("vec_id")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .withColumn(
            "score", similarity(F.col("embedding"), qv, meta["metric"])
        )
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("score", 6).alias("score"))
    )


def _q_bm25_indexed(spark, sf_dir):
    # the lexical-INDEX path served from an APPENDED index: stats are
    # built on the even-id half, then the odd half merges in via
    # bm25_append_stats (additive df counts, exact integer totals) —
    # so the green hash also certifies append == rebuild.  The query
    # prices its terms with a |terms|-row lookup; the per-query plan
    # is ONE corpus scan.  Scores are expression-identical to
    # bm25_topk -> same oracle.
    from astro_vectordb_spark.operators.keyword import (
        bm25_append_stats,
        bm25_term_stats,
        bm25_topk_indexed,
    )

    docs = _docs(spark, sf_dir)
    term_stats, corpus_stats = bm25_term_stats(
        docs.filter(F.col("doc_id") % 2 == 0)
    )
    term_stats, corpus_stats = bm25_append_stats(
        term_stats, corpus_stats, docs.filter(F.col("doc_id") % 2 == 1)
    )
    return bm25_topk_indexed(
        docs, term_stats, corpus_stats, _BM25_TERMS, k=10
    )


def _q_doc_chunks(spark, sf_dir):
    # sliding-window token chunking — the training-pipeline primitive
    # feeding chunk-level embedding/dedup; pure codegen (sequence +
    # slice + posexplode), no UDF, no shuffle.
    from astro_vectordb_spark.operators.multivector import chunk_documents

    return chunk_documents(_docs(spark, sf_dir), chunk_tokens=10, stride=5)


def _q_chunk_maxsim(spark, sf_dir):
    # late-interaction retrieval over the chunked corpus: chunk ->
    # embed chunks (stub hash encoder) -> MaxSim (sum over query
    # vectors of per-doc max chunk similarity). Query vectors = doc
    # 0's first two chunk embeddings.
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.multivector import (
        chunk_documents,
        maxsim_topk,
    )

    chunks = chunk_documents(_docs_par(spark, sf_dir), chunk_tokens=10, stride=5)
    cvecs = embed_text(chunks, text_col="chunk_text")
    qrows = (
        cvecs.filter((F.col("doc_id") == 0) & (F.col("chunk_id") < 2))
        .orderBy("chunk_id")
        .collect()
    )
    qvs = [r["embedding"] for r in qrows]
    return maxsim_topk(cvecs, qvs, k=10)


def _q_repetition_stats(spark, sf_dir):
    # Gopher-style repetition profile: top unigram/bigram dominance and
    # duplicated-trigram fraction per document, all codegen n-gram
    # construction + two map-side-combined aggregations.
    from astro_vectordb_spark.operators.curation import repetition_stats

    return repetition_stats(_docs_par(spark, sf_dir))


def _q_gopher_filter(spark, sf_dir):
    # quality gate (Rae et al. 2021 rules family): per-rule boolean
    # flags + conjunction, so rejections are attributable.
    from astro_vectordb_spark.operators.curation import gopher_filter

    return gopher_filter(_docs_par(spark, sf_dir))


def _q_decontaminate(spark, sf_dir):
    # benchmark decontamination: flag training docs sharing any token
    # 5-gram with the held-out set (doc_id % 97 == 0 stands in for the
    # benchmark suite); benchmark gram set broadcast, corpus linear.
    from astro_vectordb_spark.operators.curation import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, n=5)


def _q_decontaminate_fuzzy(spark, sf_dir):
    # fuzzy decontamination: MinHash-banded Jaccard vs the benchmark
    # set catches paraphrased leakage that exact-gram membership
    # misses; the SQL-safe hash family keeps the whole pipeline
    # oracle-replayable.  Benchmark side broadcast, corpus linear.
    from astro_vectordb_spark.operators.curation import decontaminate_fuzzy

    # _docs_par (round-16 re-try of the r15 revert, which predates the
    # alternating A/B harness): the corpus-side shingle + poly-hash
    # projection is the query's dominant per-row compute and runs as
    # ONE task above the single-row-group scan without the exchange.
    # The benchmark side (~1% of docs) shares the read; its banding is
    # broadcast either way.
    docs = _docs_par(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate_fuzzy(docs, bench, threshold=0.5)


def _q_dup_rate_by_source(spark, sf_dir):
    # which ingestion sources feed duplicates: exact-fingerprint
    # distinct counts per source, integer math throughout.
    from astro_vectordb_spark.operators.curation import dup_rate_by_source

    return dup_rate_by_source(_docs(spark, sf_dir))


def _q_range_join(spark, sf_dir):
    # point-in-interval join (signup -> purchases within 2 h) via the
    # bin-explode equi-join — a naive non-equi join would compile to
    # BroadcastNestedLoop (quadratic).
    from astro_vectordb_spark.operators.events import range_join

    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter("event_type = 'signup'").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "value"
    )
    out = range_join(signups, purchases)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "signup_id",
        "user_id",
        F.date_format("start_ts", fmt).alias("start_ts"),
        F.date_format("pt_ts", fmt).alias("pt_ts"),
        F.col("pt_value"),
    )


def _q_asof_join(spark, sf_dir):
    # backward as-of join (clicks -> latest prior purchase per user):
    # tagged union + one windowed last() per key — the temporal
    # alignment operator Spark's join family lacks.
    from astro_vectordb_spark.operators.events import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev.filter("event_type = 'purchase'")
    out = asof_join(clicks, purchases)
    # timestamps serialize to strings (NaT-free) so the hash compare
    # is unit- and null-representation-independent
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        F.date_format("ts", fmt).alias("ts"),
        "user_id",
        "value",
        F.coalesce(F.date_format("ts_r", fmt), F.lit("")).alias("ts_r"),
        "value_r",
    )


def _q_mixture_weights(spark, sf_dir):
    # domain-mixing math: per-language sampling fractions that move
    # the corpus toward a target token distribution; budget = largest
    # kept-token total every group can supply its share of.
    from astro_vectordb_spark.operators.curation import mixture_weights

    return mixture_weights(
        _docs(spark, sf_dir),
        {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.2},
    )


def _q_corpus_summary(spark, sf_dir):
    # per-(lang, source) curation dashboard: volumes + quality ratios
    # as quotients of integer sums (bit-deterministic across engines).
    from astro_vectordb_spark.operators.curation import corpus_summary

    return corpus_summary(_docs(spark, sf_dir))


def _q_redact_pii(spark, sf_dir):
    # PII scrub (emails / IPv4 / phone shapes): sequential
    # regexp_replace chain + per-category counts, one narrow
    # projection, zero shuffles.
    from astro_vectordb_spark.operators.curation import redact_pii

    return redact_pii(_docs_par(spark, sf_dir))


def _q_pack_strict(spark, sf_dir):
    # capacity-strict packing: greedy next-fit per bucket — no pack
    # exceeds the token budget (vs pack_sequences' contiguous fill,
    # which lets one straddling doc overflow).  The id-ordered greedy
    # is deterministic, so the oracle replays it with a recursive CTE.
    # n_buckets is left at the AUTO-SIZED default: max(32,
    # ceil(rows / PACK_ROWS_PER_BUCKET)) = 32 at every test scale
    # (deterministic — depends only on the corpus row count), so the
    # oracle partitions by doc_id % 32.
    from astro_vectordb_spark.operators.curation import pack_documents_strict

    return pack_documents_strict(_docs(spark, sf_dir), max_tokens=200)


def _q_line_dup_stats(spark, sf_dir):
    # line-level repetition (the remaining Gopher A1.1 rules):
    # boilerplate repeats whole LINES that n-gram dominance
    # under-detects.  The corpus has no newlines, so multi-line docs
    # with known duplicate structure are PLANTED (same pattern as
    # curation_e2e's planted drops) — the hash pins both the
    # degenerate single-line case (frac 0.0 over the whole corpus)
    # and real duplicate-line arithmetic.
    from astro_vectordb_spark.operators.curation import (
        line_repetition_stats,
    )

    base = _docs(spark, sf_dir).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            # 4 lines, 'nav bar' twice: dup_line_frac 2/4
            (97_000, "nav bar\nreal content here\nnav bar\nfooter text"),
            # all 3 lines identical: frac 1.0
            (97_001, "cookie notice\ncookie notice\ncookie notice"),
            # blank/whitespace lines dropped; 2 distinct survive: 0.0
            (97_002, "alpha\n\n   \nbeta"),
            # empty text: n_lines 0, fracs 0.0
            (97_003, ""),
        ],
        "doc_id long, text string",
    )
    return line_repetition_stats(base.unionByName(planted))


def _q_dup_spans(spark, sf_dir):
    # substring-level duplication (the span statistic a suffix-array
    # dedup pass would act on; dedup.duplicate_spans docstring):
    # 8-token windows shared across documents.  The corpus's planted
    # near-dups give organic signal (~9% of positions at sf0.01);
    # PLANTED rows additionally pin the exact arithmetic — two docs
    # sharing one known 9-token run (98000/98001: positions 1..2 of 5
    # resp. 1..2 of 3 duplicated), and a doc shorter than k with
    # n_spans = 0, frac 0.0.
    from astro_vectordb_spark.operators.dedup import duplicate_spans

    base = _docs_par(spark, sf_dir).select("doc_id", "text")
    shared = "qq ww ee rr tt yy uu ii oo"  # 9 tokens: 2 dup 8-gram positions
    planted = spark.createDataFrame(
        [
            (98_000, shared + " aa bb cc"),    # 12 toks: 5 spans, 2 dup
            (98_001, shared + " zz"),          # 10 toks: 3 spans, 2 dup
            (98_002, "too short for spans"),   # 4 toks: 0 spans
        ],
        "doc_id long, text string",
    )
    return duplicate_spans(base.unionByName(planted), k=8)


def _q_dup_span_removal(spark, sf_dir):
    # the acting counterpart of dup_spans: rewrite documents dropping
    # every cross-doc 8-gram span outside its minimum-id keeper doc
    # (dedup.remove_duplicate_spans).  Same planted rows as dup_spans:
    # 98000 is the keeper (stays intact), 98001 loses its shared
    # 9-token prefix (-9 tokens), the short doc passes through.  The
    # hash covers the full rewritten text of every document.
    from astro_vectordb_spark.operators.dedup import remove_duplicate_spans

    base = _docs_par(spark, sf_dir).select("doc_id", "text")
    shared = "qq ww ee rr tt yy uu ii oo"
    planted = spark.createDataFrame(
        [
            (98_000, shared + " aa bb cc"),
            (98_001, shared + " zz"),
            (98_002, "too short for spans"),
        ],
        "doc_id long, text string",
    )
    return remove_duplicate_spans(base.unionByName(planted), k=8)


_HYBRID_INDEX_CACHE: dict[str, tuple[str, str]] = {}


def hybrid_index_paths(spark, sf_dir: str) -> tuple[str, str]:
    """Build-once-per-session (vector_path, bm25_path) pair for the
    hybrid facade gate.  The BM25 index is built THROUGH the full
    statistics lifecycle — save (90% of docs) -> append (held-out
    10%) -> REMOVE (every doc_id % 7 == 2) — so the gate's green hash
    certifies ``bm25_remove_from_index``'s exact decrements every
    round (remove == rebuild-on-survivors is what makes the DuckDB
    oracle expressible).  The vector side is the hash-embedded
    survivor corpus in the plain-parquet layout (facade kind
    'exact': fully deterministic, oracle-able)."""
    if sf_dir in _HYBRID_INDEX_CACHE:
        return _HYBRID_INDEX_CACHE[sf_dir]
    import os
    import tempfile

    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_term_stats
    from astro_vectordb_spark.sources.vault import (
        bm25_append_to_index,
        bm25_remove_from_index,
        save_bm25_index,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    survivors = docs.filter(F.col("doc_id") % 7 != 2)

    vec_path = os.path.join(
        tempfile.mkdtemp(prefix="astro_hyb_vec_"), "emb.parquet"
    )
    # plain _docs read (the _docs_par exchange was A/B'd a net loss on
    # this once-per-session build — NOTES r15 "facade legs"), and land
    # ONE parquet file: guide §6 output sizing — ~1 MB of vectors as
    # 32 shards makes every downstream single-query scan pay 32 task
    # launches for ~130 rows each (A/B'd: the single-face hybrid gates
    # regressed 1.3-1.5x against the sharded layout)
    embed_text(survivors).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).repartition(1).write.mode("overwrite").parquet(vec_path)

    bm25_path = tempfile.mkdtemp(prefix="astro_hyb_bm25_")
    ts, cs = bm25_term_stats(docs.filter(F.col("doc_id") % 10 != 3))
    save_bm25_index(ts, cs, bm25_path)
    bm25_append_to_index(
        spark, bm25_path, docs.filter(F.col("doc_id") % 10 == 3),
        batch_id=0,
    )
    bm25_remove_from_index(
        spark, bm25_path, docs.filter(F.col("doc_id") % 7 == 2),
        batch_id=0,
    )
    _HYBRID_INDEX_CACHE[sf_dir] = (vec_path, bm25_path)
    return vec_path, bm25_path


def _hyb_survivors(spark, sf_dir):
    """The hybrid gates' corpus leg (survivor docs) behind the
    conditional scan-parallelism guard.

    Round 16 re-try of the r15 revert: the r15 A/B that rejected
    ``_docs_par`` on the facade legs ran under the FIXED-order harness
    whose null test later measured a 2.9x bias against side B — and
    the instrumented breakdown shows the gates' task time concentrated
    in the interpreted BM25 fold + tokenize running as ONE task above
    the single-row-group scan (facade_hybrid_prf_batch_gate: 65.7 s of
    task time, ~0 shuffle).  The corpus legs (lexical pricing,
    feedback pool, snippet source) get the exchange; the bounded
    point-lookups that embed the query keep the plain pushed-filter
    read."""
    return _docs_par(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") % 7 != 2
    )


def _q_facade_hybrid_gate(spark, sf_dir):
    # one-call hybrid retrieval through BOTH persisted index families:
    # vector list via search() kind-detection over the embedded
    # survivor corpus, lexical list priced from BM25 statistics that
    # went through save -> append -> REMOVE churn, RRF-fused.  A
    # regression anywhere in that composition — facade dispatch, stats
    # decrements, replay masking, rank/tie policy, fusion arithmetic —
    # shifts the driver hash.
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.search import hybrid_search

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    survivors = _hyb_survivors(spark, sf_dir)
    qv = (
        embed_text(docs.filter(F.col("doc_id") == 0))
        .first()["embedding"]
    )
    return hybrid_search(
        spark, vec_path, bm25_path, survivors, qv, _BM25_TERMS,
        k=10, fetch_k=_RRF_C,
    )


_BM25_BATCH_CASES = [
    (0, ["merge", "spark"]),
    (1, ["hash", "table", "scan"]),
    (2, ["window", "agg"]),
    (3, ["merge", "zzz_unseen"]),  # df=0 pricing path
]


def _q_bm25_batch(spark, sf_dir):
    # batch lexical serving: ONE corpus scan prices every query in the
    # batch (explode+join only on the |Q| x terms query side; tf via a
    # nested higher-order fold — no (doc, term) shuffle).  Per-query
    # scores are bit-identical to bm25_topk_indexed, which the oracle
    # replays with a per-(query,term) contribution table folded in
    # term order.
    from astro_vectordb_spark.operators.keyword import (
        bm25_batch_topk_indexed,
        bm25_term_stats,
    )

    docs = _docs_par(spark, sf_dir)
    term_stats, corpus_stats = bm25_term_stats(docs)
    qs = spark.createDataFrame(
        _BM25_BATCH_CASES, "query_id long, terms array<string>"
    )
    return bm25_batch_topk_indexed(
        docs, term_stats, corpus_stats, qs, k=8
    ).withColumn("rank", F.col("rank").cast("long"))


_HYB_BATCH_TERMS = {0: ["merge", "spark"], 1: ["hash", "table"],
                    4: ["window", "agg"]}


def _q_facade_hybrid_batch_gate(spark, sf_dir):
    # whole-batch hybrid retrieval as ONE plan: batch vector lists
    # (search_batch over the survivor corpus), batch lexical lists
    # (bm25_batch_topk_indexed priced from the save->append->REMOVE
    # churned BM25 stats), grouped RRF — per-query semantics pinned to
    # the single-call facade by construction and by the oracle.
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.search import hybrid_search_batch

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    survivors = _hyb_survivors(spark, sf_dir)
    qids = sorted(_HYB_BATCH_TERMS)
    qv = embed_text(docs.filter(F.col("doc_id").isin(qids))).select(
        F.col("doc_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    terms = spark.createDataFrame(
        [(i, _HYB_BATCH_TERMS[i]) for i in qids],
        "query_id long, terms array<string>",
    )
    return hybrid_search_batch(
        spark, vec_path, bm25_path, survivors, qv.join(terms, "query_id"),
        k=10, fetch_k=_RRF_C,
    )


def _q_cross_rerank(spark, sf_dir):
    # retrieve-wide / rerank-narrow: BM25 top-C candidates -> joint
    # (query, doc) scoring by the registered cross-encoder
    # (functions/crossenc; the hash_cross stub's float64 tree is the
    # oracle's md5-hash-embedding cosine) -> top-10.  The expensive
    # pairwise stage touches |C| rows only, by Arrow batch.
    from astro_vectordb_spark.operators.keyword import bm25_topk
    from astro_vectordb_spark.operators.rerank import cross_encoder_rerank

    docs = _docs_par(spark, sf_dir)
    qtext = docs.filter(F.col("doc_id") == 0).first()["text"]
    cand = bm25_topk(docs, _BM25_TERMS, k=_RRF_C).select("doc_id").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    return cross_encoder_rerank(cand, qtext, k=10)


def _q_cross_rerank_batch(spark, sf_dir):
    # round 10: the BATCH face of retrieve-wide / rerank-narrow as one
    # hash — batch BM25 candidates (ONE corpus scan prices all three
    # queries), each query's candidate list joined to its doc text and
    # its QUERY text (query ids are doc ids, so the oracle's md5 embed
    # CTE covers both sides), then the batch pairwise kernel scores
    # every (query, doc) pair in one Arrow plan with the per-query
    # top-10 as a partitioned window.  Pins the query_text_col path of
    # cross_encoder_rerank, which was pytest-only at driver level.
    from astro_vectordb_spark.operators.keyword import (
        bm25_batch_topk_indexed,
        bm25_term_stats,
    )
    from astro_vectordb_spark.operators.rerank import cross_encoder_rerank

    docs = _docs(spark, sf_dir)
    term_stats, corpus_stats = bm25_term_stats(docs)
    qids = sorted(_HYB_BATCH_TERMS)
    qs = spark.createDataFrame(
        [(i, _HYB_BATCH_TERMS[i]) for i in qids],
        "query_id long, terms array<string>",
    )
    cand = bm25_batch_topk_indexed(
        docs, term_stats, corpus_stats, qs, k=_RRF_C
    ).select("query_id", "doc_id")
    qtext = docs.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    pairs = cand.join(docs.select("doc_id", "text"), "doc_id").join(
        qtext, "query_id"
    )
    return cross_encoder_rerank(
        pairs, None, k=10, query_id_col="query_id",
        query_text_col="query_text",
    )


def _q_facade_hybrid_text_gate(spark, sf_dir):
    # the text-in front door as ONE hash: a raw query STRING (mixed
    # case, irregular whitespace) is normalized/tokenized driver-side,
    # embedded through the encoder registry (driver-side kernel must
    # equal the distributed kernel and the md5 CTE), and drives both
    # hybrid lists over the churned indexes.  The oracle embeds the
    # canonical literal through the same CTE by unioning a -1 row
    # into the embedded corpus.
    from astro_vectordb_spark.search import hybrid_search_text

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    survivors = _hyb_survivors(spark, sf_dir)
    return hybrid_search_text(
        spark, vec_path, bm25_path, survivors, "Merge  HASH spark",
        k=10, fetch_k=_RRF_C,
    )


def _q_facade_hybrid_prf_gate(spark, sf_dir):
    # round 10: the FULL retrieve -> expand -> fuse -> highlight loop
    # as ONE driver hash.  The raw query string is embedded and
    # tokenized; PRF expansion runs against the save->append->REMOVE
    # churned BM25 statistics (feedback = top-10 survivors, expansion
    # = top-5 terms by feedback-df x corpus idf); the LEXICAL leg is
    # priced with the expanded term list (dynamic — the oracle
    # recomputes the expansion in SQL and folds the per-term BM25
    # contributions in the same position order); the vector leg keeps
    # the raw query embedding; RRF fusion; and every fused hit gets
    # its best window-of-8 snippet highlighted against the FINAL
    # (expanded) terms, '' for pure-vector hits.  A drift anywhere —
    # expansion selection, fold order, fusion, snippet argmax — shifts
    # the (doc_id, score, start, snippet) hash.
    from astro_vectordb_spark.search import hybrid_search_text

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    survivors = _hyb_survivors(spark, sf_dir)
    return hybrid_search_text(
        spark, vec_path, bm25_path, survivors, "Merge  HASH spark",
        k=10, fetch_k=_RRF_C, prf=True, n_feedback=10, n_expand=5,
        snippets=True, snippet_window=8,
    )


def _q_facade_hybrid_prf_batch_gate(spark, sf_dir):
    # round 11: the BATCH face of the full retrieve -> expand -> fuse
    # -> highlight loop as ONE driver hash (verdict item 8).  Three
    # query STRINGS are embedded distributed and tokenized in codegen;
    # per-query PRF expansion runs as one plan (batch BM25 feedback ->
    # per-query top-5 characteristic terms, partitioned-window cut);
    # each query's LEXICAL leg refolds with ITS expanded term list in
    # selection order; RRF fusion per query; snippets highlight each
    # hit against its own query's FINAL terms.  Per-query semantics ==
    # hybrid_search_text(prf=True, snippets=True) (pinned by pytest
    # parity); the oracle replays the whole batch loop in SQL.
    from astro_vectordb_spark.search import hybrid_search_text_batch

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    survivors = _hyb_survivors(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(i, " ".join(_HYB_BATCH_TERMS[i])) for i in sorted(_HYB_BATCH_TERMS)],
        "query_id long, query_text string",
    )
    return hybrid_search_text_batch(
        spark, vec_path, bm25_path, survivors, qdf,
        k=10, fetch_k=_RRF_C, prf=True, n_feedback=10, n_expand=5,
        snippets=True, snippet_window=8,
    )


_TEXT_BATCH_QUERIES = [
    (0, "Merge  HASH spark"),
    (1, "window   AGG  table"),
    (2, "scan Parquet files quickly"),
]


def _q_facade_text_batch_gate(spark, sf_dir):
    # round 12: the vector-only BATCH text face as ONE driver hash
    # (round-11 verdict item 6 — search_text_batch was pytest-only).
    # Three raw query STRINGS (mixed case, irregular whitespace) are
    # embedded DISTRIBUTED through the encoder registry
    # (embed.embed_text's Arrow-batched kernel must equal the
    # driver-side single-query kernel and the oracle's md5 CTE), then
    # the whole batch serves through search_batch's exact kind over
    # the embedded survivor corpus — one scan prices all queries with
    # the map-side prereduce.  The oracle embeds the canonical
    # lowercase literals via negative-id aug rows.
    from astro_vectordb_spark.search import search_text_batch

    vec_path, _ = hybrid_index_paths(spark, sf_dir)
    qs = spark.createDataFrame(
        _TEXT_BATCH_QUERIES, "query_id long, query_text string"
    )
    return search_text_batch(spark, vec_path, qs, k=10)


def _q_facade_hybrid_rerank_gate(spark, sf_dir):
    # round 10: retrieve -> fuse -> CROSS-ENCODER RERANK -> highlight
    # as ONE driver hash.  Fusion (over the churned BM25 stats +
    # survivor vectors) decides WHO gets reranked — the fused top-30,
    # wider than the final k so the rerank stage provably reorders a
    # set fusion alone would cut differently; the registered pairwise
    # model (hash_cross stub = the oracle's md5-hash-embedding cosine,
    # same float64 left-fold) scores every (query, doc) pair jointly
    # and decides the FINAL order; snippets highlight the reranked
    # winners.  A drift in depth selection, the Arrow rerank kernel,
    # the top-k cut on cross scores, or the snippet join shifts the
    # (doc_id, score, start, snippet) hash.
    from astro_vectordb_spark.search import hybrid_search_text

    vec_path, bm25_path = hybrid_index_paths(spark, sf_dir)
    survivors = _hyb_survivors(spark, sf_dir)
    return hybrid_search_text(
        spark, vec_path, bm25_path, survivors, "Merge  HASH spark",
        k=10, fetch_k=_RRF_C, rerank=True, rerank_depth=30,
        snippets=True, snippet_window=8,
    )


def _q_ann_ivfpq_salted_exact(spark, sf_dir):
    # round 10: the SKEW-BOUNDED cogroup face, hash-gated at a
    # provably-exact budget.  max_group_rows=32 forces every cell to
    # salt into multiple sub-groups (cells hold ~corpus/8 rows at the
    # oracle scales), the adaptive default probes every cell (k_cells=8
    # keeps the standout z below 3 by construction), and refine 64*k
    # >= corpus makes stage 2 an exact re-rank of everything — so the
    # salted plan (per-cell salt counts, id-hash splitting, query
    # replication across salts, the per-sub-group local cut and the
    # shared global cut) must reproduce brute force bit-for-bit.
    from astro_vectordb_spark.search import search_batch

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return search_batch(
        spark, ivfpq_index_path(spark, sf_dir), queries, k=10,
        vectors=emb, refine_factor=64, max_group_rows=32,
    )


_IVFPQ_RES_INDEX_CACHE: dict[str, str] = {}


def ivfpq_residual_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted RESIDUAL IVF-PQ index — codes
    quantize prep(v) - centroid[cell] (round-11 verdict item 4); the
    residual flag persists in _meta and the facade reads it back."""
    if sf_dir in _IVFPQ_RES_INDEX_CACHE:
        return _IVFPQ_RES_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.pq import ivf_pq_build
    from astro_vectordb_spark.sources.vault import save_ivf_pq_index

    encoded, cents, model = ivf_pq_build(
        _emb(spark, sf_dir), k_cells=8, m=8, ks=64, max_rows=20_000,
        residual=True,
    )
    path = tempfile.mkdtemp(prefix="astro_ivfpq_res_idx_")
    save_ivf_pq_index(encoded, cents, model, path)
    _IVFPQ_RES_INDEX_CACHE[sf_dir] = path
    return path


def _q_ann_ivfpq_residual_exact(spark, sf_dir):
    # round 11: RESIDUAL-encoded IVF-PQ, hash-gated at a provably-exact
    # budget (the ann_ivfpq_salted_exact recipe: adaptive probes all 8
    # cells by construction, refine 64*k >= corpus -> stage 2 re-ranks
    # everything exactly).  The residual plumbing — per-(query, cell)
    # ADC tables against the probed centroid, the cross-cell score
    # constants, the residual encode/persist/load round trip through
    # the facade's _meta flag — must reproduce brute force bit-for-bit;
    # salting rides along so the residual kernel's salted cut is gated
    # too.
    from astro_vectordb_spark.search import search_batch

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return search_batch(
        spark, ivfpq_residual_index_path(spark, sf_dir), queries, k=10,
        vectors=emb, refine_factor=64, max_group_rows=32,
    )


_IVFPQ_OPQ_INDEX_CACHE: dict[str, str] = {}


def ivfpq_opq_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted residual IVF-PQ index with an
    OPQ rotation (round-12 verdict item 3, Ge et al. CVPR 2013): codes
    quantize rot(prep(v) - centroid[cell]); the rotation persists as
    subspace=-1 rows of the codebook table and serving rotates queries
    and probed centroids transparently."""
    if sf_dir in _IVFPQ_OPQ_INDEX_CACHE:
        return _IVFPQ_OPQ_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.operators.pq import ivf_pq_build
    from astro_vectordb_spark.sources.vault import save_ivf_pq_index

    encoded, cents, model = ivf_pq_build(
        _emb(spark, sf_dir), k_cells=8, m=8, ks=64, max_rows=20_000,
        residual=True, opq_iters=8,
    )
    path = tempfile.mkdtemp(prefix="astro_ivfpq_opq_idx_")
    save_ivf_pq_index(encoded, cents, model, path)
    _IVFPQ_OPQ_INDEX_CACHE[sf_dir] = path
    return path


def _q_ann_ivfpq_opq_exact(spark, sf_dir):
    # round 12: OPQ-rotated residual IVF-PQ, hash-gated at a provably-
    # exact budget (the ann_ivfpq_residual_exact recipe on a DIFFERENT
    # query slice: adaptive probes all 8 cells, refine 64*k >= corpus
    # -> stage 2 re-ranks everything exactly).  Gates the whole OPQ
    # plumbing — the rotation's persistence round trip (subspace=-1
    # codebook rows), rotated residual encode, per-(query, cell) ADC
    # tables built from the ROTATED query and centroid, and the salted
    # cogroup cut — against brute force bit-for-bit.
    from astro_vectordb_spark.search import search_batch

    emb = _emb(spark, sf_dir)
    queries = emb.filter(
        (F.col("vec_id") >= 3) & (F.col("vec_id") < 6)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return search_batch(
        spark, ivfpq_opq_index_path(spark, sf_dir), queries, k=10,
        vectors=emb, refine_factor=64, max_group_rows=32,
    )


_RP_INDEX_CACHE: dict[str, str] = {}


def rp_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted RP-LSH embedding near-dup
    index over the HISTORICAL corpus slice (vec_id % 5 != 4), built
    THROUGH the incremental lifecycle — save on 90%, APPEND the
    held-out 10% (exercising the replay log and the vecs->buckets
    self-healing sync) — so the gate's green hash certifies the
    append path every round (round-12 verdict item 4; the minhash
    index recipe applied to the embedding family)."""
    if sf_dir in _RP_INDEX_CACHE:
        return _RP_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.vault import (
        rp_append_to_index,
        save_rp_index,
    )

    hist = _emb(spark, sf_dir).select("vec_id", "embedding").filter(
        F.col("vec_id") % 5 != 4
    )
    path = tempfile.mkdtemp(prefix="astro_rp_idx_")
    save_rp_index(hist.filter(F.col("vec_id") % 10 != 7), path, dim=64)
    rp_append_to_index(
        spark, path, hist.filter(F.col("vec_id") % 10 == 7), batch_id=0
    )
    _RP_INDEX_CACHE[sf_dir] = path
    return path


def _q_rp_index_incremental(spark, sf_dir):
    # round 12: INCREMENTAL embedding near-dup — a new vector batch
    # matched against the persisted RP-LSH index (hyperplane buckets +
    # the index's own vector copy; the corpus is never re-projected)
    # as ONE driver hash.  The new batch = the held-out corpus slice
    # (vec_id % 5 == 4) PLUS planted copies of 16 historical vectors
    # (ids shifted +100000), which must surface at score exactly 1.0;
    # verification is the exact cosine fold, deterministic end to end.
    # The index is built through save -> APPEND churn, so a drift in
    # the stored plane family, the bucket partitioning, the append's
    # bucket-sync, or the verify arithmetic shifts the
    # (new_id, hist_id, score) hash.
    from astro_vectordb_spark.sources.vault import rp_match_index

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    held_out = emb.filter(F.col("vec_id") % 5 == 4)
    planted = (
        emb.filter((F.col("vec_id") % 5 != 4) & (F.col("vec_id") < 20))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    batch = held_out.unionByName(planted)
    return rp_match_index(
        spark, rp_index_path(spark, sf_dir), batch, threshold=0.4
    )


def _q_rp_index_multiprobe(spark, sf_dir):
    # round 13 (verdict item 3): the multi-probe RECALL dial on the
    # persisted RP index, oracled — same churned index and batch as
    # rp_index_incremental, but the batch probes 2 extra sign-flip
    # buckets per table (its lowest-|projection| planes, Lv et al.
    # 2007).  The probed cells are deterministic from the same
    # _rp_plane float64 literals the base oracle embeds, so the whole
    # recall dial sits on one driver hash: a drift in the margin
    # ordering, the flip arithmetic, or the probe dedup shifts the
    # (new_id, hist_id, score) set.  Results are a superset of
    # rp_index_incremental by construction (probes only ADD candidate
    # buckets; the exact-cosine verify is unchanged).
    from astro_vectordb_spark.sources.vault import rp_match_index

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    held_out = emb.filter(F.col("vec_id") % 5 == 4)
    planted = (
        emb.filter((F.col("vec_id") % 5 != 4) & (F.col("vec_id") < 20))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    batch = held_out.unionByName(planted)
    return rp_match_index(
        spark, rp_index_path(spark, sf_dir), batch, threshold=0.4,
        n_probes=2,
    )


def _semdedup_cents16(spark):
    from astro_vectordb_spark.operators.dedup import _rp_plane

    return spark.createDataFrame(
        [(k, _rp_plane(777, k, 0, 64)) for k in range(16)],
        "cell_id int, centroid array<double>",
    )


_SEMDEDUP_FULL_CACHE: dict[str, str] = {}
_SEMDEDUP_IDX_CACHE: dict[str, str] = {}


def semdedup_full_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted SemDeDup index over the FULL
    corpus under the 16 fixed literal centroids — the round-13 answer
    to the r12 verdict's "semdedup_fixed times rebuild, not serving":
    assignment (the expensive pass) runs once; the gate serves the
    groups face from the stored cells/vectors every call."""
    if sf_dir in _SEMDEDUP_FULL_CACHE:
        return _SEMDEDUP_FULL_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.semdedup_index import (
        save_semdedup_index,
    )

    path = tempfile.mkdtemp(prefix="astro_sd_full_")
    save_semdedup_index(
        _emb(spark, sf_dir), path, centroids=_semdedup_cents16(spark),
        dim=64,
    )
    _SEMDEDUP_FULL_CACHE[sf_dir] = path
    return path


_SEMDEDUP_PROBED_CACHE: dict[str, str] = {}


def semdedup_probed_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted SemDeDup index over the FULL
    corpus with the round-15 stored boundary-probe dial
    (``store_probe_margin=0.02``): thin-margin rows persist their
    runner-up cell as ``cell_id_2``, so the GROUPS face can catch
    near-dup pairs straddling a cell boundary inside the stored
    corpus.  Kept separate from ``semdedup_full_index_path`` so the
    base ``semdedup_fixed`` gate's semantics stay byte-identical."""
    if sf_dir in _SEMDEDUP_PROBED_CACHE:
        return _SEMDEDUP_PROBED_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.semdedup_index import (
        save_semdedup_index,
    )

    path = tempfile.mkdtemp(prefix="astro_sd_probed_")
    save_semdedup_index(
        _emb(spark, sf_dir), path, centroids=_semdedup_cents16(spark),
        dim=64, store_probe_margin=0.02,
    )
    _SEMDEDUP_PROBED_CACHE[sf_dir] = path
    return path


def semdedup_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted SemDeDup index over the
    HISTORICAL corpus slice (vec_id % 5 != 4), built THROUGH the
    incremental lifecycle — save on 90%, APPEND the held-out 10%
    (replay log + the vecs->cells self-healing sync) — the
    minhash_index_path / rp_index_path recipe for the semantic
    family."""
    if sf_dir in _SEMDEDUP_IDX_CACHE:
        return _SEMDEDUP_IDX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.semdedup_index import (
        save_semdedup_index,
        semdedup_append_to_index,
    )

    hist = _emb(spark, sf_dir).select("vec_id", "embedding").filter(
        F.col("vec_id") % 5 != 4
    )
    path = tempfile.mkdtemp(prefix="astro_sd_idx_")
    save_semdedup_index(
        hist.filter(F.col("vec_id") % 10 != 7), path,
        centroids=_semdedup_cents16(spark), dim=64,
    )
    semdedup_append_to_index(
        spark, path, hist.filter(F.col("vec_id") % 10 == 7), batch_id=0
    )
    _SEMDEDUP_IDX_CACHE[sf_dir] = path
    return path


def _q_semdedup_fixed(spark, sf_dir):
    # round 12 (re-plumbed round 13, SAME oracle/hash): SemDeDup
    # (Abbas et al. 2023) on its ORACLE-REPLAYABLE face — 16 fixed
    # hash-derived literal centroids (dedup._rp_plane, the single
    # float64 source both sides embed).  Round 13 serves it from the
    # PERSISTED index (semdedup_full_index_path, built once per
    # session): the gate now times SERVING the stored assignment —
    # stored cells self-join within cells, stored vectors verify at
    # eps, CC + min-id keep — not re-assigning the corpus per call
    # (r12 verdict What's-wrong #1).  Assignment parity with the
    # one-shot semantic_dedup(centroids=...) face is pinned by
    # tests/test_semdedup_index.py; the kmeans face stays pytest-pinned.
    from astro_vectordb_spark.sources.semdedup_index import (
        semdedup_index_groups,
    )

    return semdedup_index_groups(
        spark, semdedup_full_index_path(spark, sf_dir), eps=0.4,
        keep="min_id",
    )


def _q_semdedup_groups_probed(spark, sf_dir):
    # round 15 (verdict item 4): HISTORY-side boundary probing,
    # oracled — the r14 multi-probe dial only helped batch-vs-history;
    # a near-dup pair straddling a cell boundary INSIDE the stored
    # corpus was invisible to groups()/sweep because both members sit
    # in their (different) argmax cells.  This gate serves
    # semdedup_index_groups from an index persisted with
    # store_probe_margin=0.02: every stored row whose assignment
    # margin is thin (sim_1 - sim_2 <= 0.02) ALSO persists its rank-2
    # cell (cell_id_2, computed in the same assignment pass), and the
    # pair search runs over the expanded membership.  The expanded
    # cells are deterministic from the same 16 centroid literals —
    # the DuckDB twin re-derives rank-1 + margin-gated rank-2 per id
    # with the identical (sim desc, cell_id asc) tie rule — so the
    # whole persisted dial sits on one driver hash.  The keep set is
    # a SUBSET of semdedup_fixed's (more pairs only merge groups).
    from astro_vectordb_spark.sources.semdedup_index import (
        semdedup_index_groups,
    )

    return semdedup_index_groups(
        spark, semdedup_probed_index_path(spark, sf_dir), eps=0.4,
        keep="min_id",
    )


def _q_semdedup_index_incremental(spark, sf_dir):
    # round 13 (verdict item 2): INCREMENTAL semantic near-dup — a new
    # vector batch matched against the persisted SemDeDup index
    # (stored centroids + per-cell assignments; the corpus is never
    # re-assigned) as ONE driver hash.  The batch = the held-out
    # corpus slice (vec_id % 5 == 4) PLUS planted copies of 16
    # historical vectors (ids shifted +100000), which must surface at
    # score exactly 1.0 against their originals; verification is the
    # exact cosine fold.  The index is built through save -> APPEND
    # churn, so drift in the stored centroid table, the argmax
    # assignment (ties by cell_id), the append's cell-sync, or the
    # verify arithmetic shifts the (new_id, hist_id, score) hash.
    from astro_vectordb_spark.sources.semdedup_index import (
        semdedup_match_index,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    held_out = emb.filter(F.col("vec_id") % 5 == 4)
    planted = (
        emb.filter((F.col("vec_id") % 5 != 4) & (F.col("vec_id") < 20))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    batch = held_out.unionByName(planted)
    return semdedup_match_index(
        spark, semdedup_index_path(spark, sf_dir), batch, eps=0.4
    )


def _q_semdedup_index_multiprobe(spark, sf_dir):
    # round 14 (verdict item 7): the BOUNDARY multi-probe recall dial
    # on the persisted SemDeDup index, oracled — same churned index
    # and batch as semdedup_index_incremental, but every batch row
    # whose assignment margin is thin (sim_1 - sim_2 <= 0.1) also
    # probes its runner-up centroid cell (the RP multi-probe pattern
    # applied to argmax cells; history stays argmax-1, so recall rises
    # with batch-side work only).  The probed cells are deterministic
    # from the same 16 centroid literals the base oracle embeds — the
    # DuckDB twin re-derives rank-1 AND margin-gated rank-2 cells with
    # the identical (sim desc, cell_id asc) tie rule — so the whole
    # dial sits on one driver hash.  Results are a superset of
    # semdedup_index_incremental by construction (probing only ADDS
    # candidate cells; the exact-cosine verify at eps is unchanged).
    from astro_vectordb_spark.sources.semdedup_index import (
        semdedup_match_index,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    held_out = emb.filter(F.col("vec_id") % 5 == 4)
    planted = (
        emb.filter((F.col("vec_id") % 5 != 4) & (F.col("vec_id") < 20))
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    batch = held_out.unionByName(planted)
    return semdedup_match_index(
        spark, semdedup_index_path(spark, sf_dir), batch, eps=0.4,
        n_probes=2, probe_margin=0.1,
    )


def _q_rp_index_groups(spark, sf_dir):
    # round 12: retroactive corpus-wide embedding dedup from the
    # persisted RP index ALONE — stored buckets self-join (a_id <
    # b_id), stored vectors verify with the exact cosine, connected
    # components collapse, min-id representative survives (singletons
    # keep themselves).  The corpus is never re-projected; the oracle
    # replays buckets -> pairs -> recursive-CTE closure -> min-id from
    # the same plane literals.
    from astro_vectordb_spark.sources.vault import rp_index_groups

    return rp_index_groups(
        spark, rp_index_path(spark, sf_dir), threshold=0.4
    )


_MINHASH_INDEX_CACHE: dict[str, str] = {}


def minhash_index_path(spark, sf_dir: str) -> str:
    """Build-once-per-session persisted MinHash-LSH near-dup index
    over the HISTORICAL corpus slice (doc_id % 5 != 4), built THROUGH
    the incremental lifecycle — save on 90%, APPEND the held-out 10%
    (exercising the replay log and the sigs->bands self-healing sync)
    — so the gate's green hash certifies the append path every
    round."""
    if sf_dir in _MINHASH_INDEX_CACHE:
        return _MINHASH_INDEX_CACHE[sf_dir]
    import tempfile

    from astro_vectordb_spark.sources.vault import (
        minhash_append_to_index,
        save_minhash_index,
    )

    hist = _docs(spark, sf_dir).select("doc_id", "text").filter(
        F.col("doc_id") % 5 != 4
    )
    path = tempfile.mkdtemp(prefix="astro_mh_idx_")
    save_minhash_index(hist.filter(F.col("doc_id") % 10 != 7), path)
    minhash_append_to_index(
        spark, path, hist.filter(F.col("doc_id") % 10 == 7), batch_id=0
    )
    _MINHASH_INDEX_CACHE[sf_dir] = path
    return path


def _q_minhash_index_incremental(spark, sf_dir):
    # round 10: INCREMENTAL near-dup — a new batch matched against the
    # persisted fingerprint index (signatures + LSH band buckets; the
    # historical text is never re-read) as ONE driver hash.  The new
    # batch = the held-out corpus slice PLUS planted copies of 16
    # historical docs (ids shifted +100000), which must surface at
    # est_jaccard exactly 1.0; verification is signature agreement
    # k/32, exact rationals end to end.  The index is built through
    # save -> APPEND churn, so a drift in the stored hash family, the
    # band fold, the append's bands-sync, or the estimate arithmetic
    # shifts the (new_id, hist_id, est_jaccard) hash.
    from astro_vectordb_spark.sources.vault import minhash_match_index

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 5 == 4).unionAll(
        docs.filter(
            (F.col("doc_id") < 20) & (F.col("doc_id") % 5 != 4)
        ).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return minhash_match_index(
        spark, minhash_index_path(spark, sf_dir), new, threshold=0.5
    )


def _q_minhash_index_groups(spark, sf_dir):
    # round 10: retroactive corpus-wide dedup FROM THE INDEX ALONE —
    # band self-join candidates, signature-agreement verification at
    # 0.8, connected components, min-id representative + singletons;
    # no document text is read.  Served from the save -> APPEND
    # churned index; the oracle recomputes signatures from text and
    # closes the components with a recursive CTE, so index storage,
    # the est arithmetic, and the label propagation all sit on one
    # hash.
    from astro_vectordb_spark.sources.vault import minhash_index_groups

    return minhash_index_groups(
        spark, minhash_index_path(spark, sf_dir), threshold=0.8
    )


_MH_SWEEP_CACHE: dict[str, str] = {}


def _q_minhash_apply_sweep(spark, sf_dir):
    # round 11: APPLY the retroactive sweep (verdict item 7) — build a
    # fresh fingerprint index, minhash_apply_groups removes every
    # near-dup loser through the replay-logged file-granular remove
    # path (sigs AND bands), then a probe batch of planted historical
    # copies is matched against the POST-SWEEP index.  The hash pins
    # the whole loop: a loser left behind emits extra witness rows; a
    # wrongly-removed keeper drops its pair; the est arithmetic rides
    # along.  Matching serves one witness per boilerplate group — the
    # deduplicated-history steady state.  Build+sweep are
    # once-per-session (same pattern as minhash_index_path); the swept
    # index is a fixpoint, so repeated calls serve the identical match.
    import tempfile

    from astro_vectordb_spark.sources.vault import (
        minhash_apply_groups,
        minhash_match_index,
        save_minhash_index,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    if sf_dir not in _MH_SWEEP_CACHE:
        hist = docs.filter(F.col("doc_id") % 7 == 0)
        path = tempfile.mkdtemp(prefix="astro_mh_sweep_")
        save_minhash_index(hist, path)
        minhash_apply_groups(spark, path, threshold=0.8, batch_id=0)
        _MH_SWEEP_CACHE[sf_dir] = path
    probe = docs.filter(
        (F.col("doc_id") < 70) & (F.col("doc_id") % 7 == 0)
    ).select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    return minhash_match_index(
        spark, _MH_SWEEP_CACHE[sf_dir], probe, threshold=0.5
    )


def _q_snippets(spark, sf_dir):
    # search highlighting: best window-of-8 query-term span per doc —
    # candidate starts / per-start hit counts / argmax all as codegen
    # higher-order expressions on the token array; narrow projection,
    # zero shuffles, scan-linear.
    from astro_vectordb_spark.operators.keyword import snippet_extract

    return snippet_extract(_docs_par(spark, sf_dir), _BM25_TERMS, window=8)


def _q_prf_expand(spark, sf_dir):
    # pseudo-relevance-feedback expansion: top-10 BM25 docs as the
    # relevance sample, every sample term scored df_feedback x
    # corpus idf (exact integer x the index's float64 idf), original
    # terms excluded; the explode/groupBy runs on the 10-row sample.
    from astro_vectordb_spark.operators.keyword import (
        bm25_term_stats,
        prf_expand_terms,
    )

    docs = _docs(spark, sf_dir)
    ts, cs = bm25_term_stats(docs)
    return prf_expand_terms(
        docs, ts, cs, _BM25_TERMS, n_feedback=10, n_expand=8
    )


def _q_curation_e2e(spark, sf_dir):
    # the composite training-data pipeline, oracled END TO END as one
    # hash: quality gate (gopher rules) -> exact dedup (min-id
    # representative per normalized text) -> capacity-strict packing.
    # Each stage is individually oracled elsewhere; this query pins
    # their COMPOSITION — a survivor-set drift in any stage cascades
    # into different pack assignments and a driver hash mismatch.
    from astro_vectordb_spark.operators.curation import (
        gopher_filter,
        pack_documents_strict,
    )
    from astro_vectordb_spark.operators.dedup import exact_dedup

    # _docs_par (round-16 re-try of the r15 revert, which predates the
    # alternating A/B harness): the gopher gate + fingerprint stages
    # are per-row tokenize/normalize compute serialized on the
    # single-row-group scan without the exchange.
    base = _docs_par(spark, sf_dir).select("doc_id", "text")
    # plant rows each stage must DROP (the clean corpus has no exact
    # dups and passes the gate, so without these the composite hash
    # would not pin survivor selection): 20 exact duplicates (dedup
    # keeps the min-id originals) and 10 repetition-spam docs (the
    # unigram-dominance rule kills them)
    dups = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 90_000).alias("doc_id"), "text"
    )
    junk = spark.range(10).select(
        (F.col("id") + 95_000).alias("doc_id"),
        F.lit("spam spam spam spam spam spam").alias("text"),
    )
    corpus = base.unionByName(dups).unionByName(junk)
    kept = gopher_filter(corpus).filter("keep").select("doc_id")
    survivors = exact_dedup(corpus.join(kept, "doc_id", "left_semi"))
    return pack_documents_strict(survivors, max_tokens=200, n_buckets=8)


_E2E_INDEX_CACHE: dict[str, str] = {}


def _retrieval_e2e_index(spark, sf_dir: str):
    """The retrieval_e2e lifecycle, run once per session per sf_dir:
    embed the documents -> build a sharded HNSW index on PART of the
    corpus -> APPEND the rest (plus a planted duplicate of the query
    doc) -> REMOVE a deterministic slice (plus a planted dup that was
    built in) -> return (index path, survivor vector table)."""
    if sf_dir in _E2E_INDEX_CACHE:
        path = _E2E_INDEX_CACHE[sf_dir]
        return path, _retrieval_e2e_survivors(spark, sf_dir)
    import tempfile

    from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
    from astro_vectordb_spark.sources.vault import (
        hnsw_append_to_index,
        hnsw_remove_from_index,
        save_hnsw_index,
    )

    emb = _e2e_embeddings(spark, sf_dir)
    dup_build = emb.filter(F.col("vec_id") == 0).select(
        F.lit(90_002).cast("long").alias("vec_id"), "embedding"
    )
    dup_append = emb.filter(F.col("vec_id") == 0).select(
        F.lit(90_001).cast("long").alias("vec_id"), "embedding"
    )
    base = emb.filter(F.col("vec_id") % 10 != 3).unionByName(dup_build)
    appended = emb.filter(F.col("vec_id") % 10 == 3).unionByName(dup_append)
    graph = hnsw_build_shards(
        base, num_shards=4, m=8, ef_construction=32, seed=13
    )
    path = tempfile.mkdtemp(prefix="astro_e2e_idx_")
    save_hnsw_index(graph, path, m=8, metric="cosine")
    hnsw_append_to_index(spark, path, appended, seed=17)
    remove_ids = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") % 7 == 2)
        .select("vec_id").collect()
    ] + [90_002]
    hnsw_remove_from_index(spark, path, remove_ids, mode="sweep")
    _E2E_INDEX_CACHE[sf_dir] = path
    return path, _retrieval_e2e_survivors(spark, sf_dir)


def _e2e_embeddings(spark, sf_dir: str):
    from astro_vectordb_spark.functions.embed import embed_text

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return embed_text(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )


def _retrieval_e2e_survivors(spark, sf_dir: str):
    emb = _e2e_embeddings(spark, sf_dir)
    dup_append = emb.filter(F.col("vec_id") == 0).select(
        F.lit(90_001).cast("long").alias("vec_id"), "embedding"
    )
    return emb.filter(F.col("vec_id") % 7 != 2).unionByName(dup_append)


def _q_retrieval_e2e(spark, sf_dir):
    # the index-lifecycle composite — curation_e2e's analogue for
    # retrieval, pinned as ONE driver hash: embed (hash embedder, the
    # oracle's md5 CTE twin) -> build sharded HNSW on 90% of the docs
    # -> APPEND the held-out 10% plus a planted exact duplicate of the
    # query doc (vec_id 90001 — lands at the top of the ranking, so a
    # dropped append shifts the hash) -> REMOVE every doc_id % 7 == 2
    # plus a planted built-in duplicate (90002 — would ALSO rank top if
    # the remove leaked) -> serve through the search() facade at a
    # full-recall beam with the exact-fold re-rank.  Every stage's
    # effect is observable in the final top-10; the pieces are
    # individually gated elsewhere, this pins their COMPOSITION.
    # Reference lifecycle: create -> addPoint -> removePoint -> search
    # (driver/driver.ts:28-307).
    from astro_vectordb_spark.functions.vector import similarity
    from astro_vectordb_spark.search import search

    path, survivors = _retrieval_e2e_index(spark, sf_dir)
    qv_row = survivors.filter(F.col("vec_id") == 0).first()["embedding"]
    hits = search(spark, path, qv_row, k=10, ef_search=400)
    qv = F.array(*[F.lit(float(x)) for x in qv_row])
    # NOTE: the join is what makes a LEAKED remove observable as a
    # row-count mismatch (a surviving 90002 fills a beam slot but has
    # no survivor row -> 9 output rows vs the oracle's 10), and a
    # dropped append as a value mismatch (90001 absent from the beam).
    return (
        hits.select("vec_id")
        .join(survivors, "vec_id")
        .withColumn("score", similarity(F.col("embedding"), qv, "cosine"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.round("score", 6).alias("score"))
    )


def _q_pack_sequences(spark, sf_dir):
    # sequence packing for LLM training: contiguous fill within
    # independent hash-bucket streams (per-bucket window cumsum — no
    # global single-partition window).
    from astro_vectordb_spark.operators.curation import pack_documents

    return pack_documents(_docs(spark, sf_dir), max_tokens=200, n_buckets=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Driver-window rotation, round 16 (the driver checks the FIRST 50
    # entries; ALL oracled entries are verified every round by the
    # full gate, scripts/check_oracle.py):
    #   - in (8, exactly NOTES_r15's promise): tombstone_delete,
    #     upsert_keep_latest, filtered_topk, topk_quantized,
    #     text_stats, validate_dim, dup_span_removal,
    #     facade_hybrid_batch_gate — the 8 rotated out in round 15,
    #     due back this round.
    #   - out (8, the r14 returning tranche, all two-round driver-
    #     green, families untouched this round or repped in-window):
    #     threshold_cap (topk: topk_exact/batch_topk + returning
    #     filtered_topk stay), near_dup_jaccard (one-shot jaccard is
    #     kernel-untouched this round; near_dup_native_exactdup +
    #     the SQL twins stay), quality_scores + doc_fingerprints
    #     (text analysis untouched; returning text_stats reps),
    #     batch_topk_quantized + embed_then_search (quantize/embed
    #     kernels untouched; returning topk_quantized + in-window
    #     facade_text_batch_gate rep), decontaminate + pack_sequences
    #     (exact-gram decontamination and packing untouched;
    #     returning dup_span_removal + gopher_filter/dup_spans rep
    #     curation).
    #   - held in-window because their code changed this round (the
    #     Arrow exact-fold pair verify + char-poly kernel + BM25
    #     stats-token fix): the SemDeDup family (semdedup_fixed,
    #     semdedup_groups_probed, semdedup_index_*), the RP family
    #     (rp_index_*), embedding_near_dup_blocked +
    #     embedding_dedup_groups + dedup_groups, the minhash/simhash
    #     SQL families (near_dup_*_sql, minhash_index_*,
    #     simhash_index_incremental, minhash_apply_sweep), bm25_topk
    #     and every hybrid facade gate.
    #   - due back round 17: the 8 rotated out this round.
    return {
        # -- stable core (driver-signed r11+r12, kept as family reps)
        "topk_exact": _q_topk_exact,
        "point_lookup": _q_point_lookup,
        "batch_topk": _q_batch_topk,
        "dedup_exact": _q_dedup_exact,
        "ann_ivf_exact": _q_ann_ivf_exact,
        "multimodal_decode": _q_multimodal_decode,
        "read_your_writes": _q_read_your_writes,
        "bm25_topk": _q_bm25_topk,
        "facade_hybrid_gate": _q_facade_hybrid_gate,
        "facade_hybrid_prf_gate": _q_facade_hybrid_prf_gate,
        "cross_rerank_batch": _q_cross_rerank_batch,
        "facade_hybrid_prf_batch_gate": _q_facade_hybrid_prf_batch_gate,
        "facade_text_batch_gate": _q_facade_text_batch_gate,
        "sync_merge": _q_sync_merge,
        "dedup_groups": _q_dedup_groups,
        "near_dup_simhash_sql": _q_near_dup_simhash_sql,
        # -- IVF-PQ reps HELD (persisted codebook table gained the
        # train_mse sentinel row; adaptive-refine shares the candidate
        # kernels)
        "facade_ivfpq_gate": _q_facade_ivfpq_gate,
        "ann_ivfpq_salted_exact": _q_ann_ivfpq_salted_exact,
        "ann_ivfpq_residual_exact": _q_ann_ivfpq_residual_exact,
        # -- minhash + RP + embedding families HELD (now thin faces
        # over the shared index-lifecycle core — keep driver-signed
        # hashes across the refactor)
        "near_dup_minhash_sql": _q_near_dup_minhash_sql,
        "near_dup_native_exactdup": _q_near_dup_native_exactdup,
        "minhash_index_incremental": _q_minhash_index_incremental,
        "minhash_index_groups": _q_minhash_index_groups,
        "minhash_apply_sweep": _q_minhash_apply_sweep,
        "embedding_near_dup_blocked": _q_embedding_near_dup_blocked,
        "embedding_dedup_groups": _q_embedding_dedup_groups,
        # -- HELD: signed once in r13; semdedup/rp/lifecycle families
        # changed this round (drift hook, refresh, multi-probe)
        "ann_ivfpq_opq_exact": _q_ann_ivfpq_opq_exact,
        "rp_index_incremental": _q_rp_index_incremental,
        "rp_index_groups": _q_rp_index_groups,
        "semdedup_fixed": _q_semdedup_fixed,
        "semdedup_groups_probed": _q_semdedup_groups_probed,
        "rp_index_multiprobe": _q_rp_index_multiprobe,
        "semdedup_index_incremental": _q_semdedup_index_incremental,
        # -- IN: first driver signing (landed late in r13, trimmed
        # batch this round) + the brand-new round-14 gate
        "simhash_index_incremental": _q_simhash_index_incremental,
        "semdedup_index_multiprobe": _q_semdedup_index_multiprobe,
        # -- IN (round 16): the 8 rotated out in round 15, back per
        # NOTES_r15's promise
        "tombstone_delete": _q_tombstone_delete,
        "upsert_keep_latest": _q_upsert_keep_latest,
        "filtered_topk": _q_filtered_topk,
        "topk_quantized": _q_topk_quantized,
        "text_stats": _q_text_stats,
        "validate_dim": _q_validate_dim,
        "dup_span_removal": _q_dup_span_removal,
        "facade_hybrid_batch_gate": _q_facade_hybrid_batch_gate,
        # -- kept from the r15 returning tranche (curation/retrieval
        # reps for families touched this round)
        "gopher_filter": _q_gopher_filter,
        "dup_spans": _q_dup_spans,
        "snippets": _q_snippets,
        "prf_expand": _q_prf_expand,
        "cross_rerank": _q_cross_rerank,
        "bm25_batch": _q_bm25_batch,
        "facade_hybrid_text_gate": _q_facade_hybrid_text_gate,
        # (window boundary: 50 entries above this line)
        # -- OUT this round (the r14 returning tranche, 2-round-green,
        # families untouched this round or repped in-window above):
        "threshold_cap": _q_threshold_cap,
        "near_dup_jaccard": _q_near_dup_jaccard,
        "quality_scores": _q_quality_scores,
        "doc_fingerprints": _q_doc_fingerprints,
        "batch_topk_quantized": _q_batch_topk_quantized,
        "embed_then_search": _q_embed_then_search,
        "decontaminate": _q_decontaminate,
        "pack_sequences": _q_pack_sequences,
        "topk_euclidean": _q_topk_euclidean,
        "null_semantics": _q_null_semantics,
        "similarity_join": _q_similarity_join,
        "knn_classify": _q_knn_classify,
        "lang_id": _q_lang_id,
        "stratified_sample": _q_stratified_sample,
        "range_join": _q_range_join,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "embed_docs": _q_embed_docs,
        "facade_hybrid_rerank_gate": _q_facade_hybrid_rerank_gate,
        # -- full-gate-only (oracled every round by check_oracle.py)
        "events_hourly": _q_events_hourly,
        "session_stats": _q_session_stats,
        "pricing_summary": _q_pricing_summary,
        "revenue_topn": _q_revenue_topn,
        "events_sliding": _q_events_sliding,
        "supplier_balance": _q_supplier_balance,
        "part_brand_stats": _q_part_brand_stats,
        "event_rates": _q_event_rates,
        "customer_rank": _q_customer_rank,
        "order_priority": _q_order_priority,
        "nation_revenue": _q_nation_revenue,
        "token_counts": _q_token_counts,
        "events_json": _q_events_json,
        "split_counts": _q_split_counts,
        "segment_no_orders": _q_segment_no_orders,
        "revenue_rollup": _q_revenue_rollup,
        "status_pivot": _q_status_pivot,
        "profile_lineitem": _q_profile_lineitem,
        "hybrid_weighted": _q_hybrid_weighted,
        "mmr_rerank": _q_mmr_rerank,
        "doc_chunks": _q_doc_chunks,
        "repetition_stats": _q_repetition_stats,
        "redact_pii": _q_redact_pii,
        "corpus_summary": _q_corpus_summary,
        "mixture_weights": _q_mixture_weights,
        "ann_hnsw_recall_gate": _q_ann_hnsw_recall_gate,
        "ann_pq_recall_gate": _q_ann_pq_recall_gate,
        "ann_ivf_recall_gate": _q_ann_ivf_recall_gate,
        "ann_hnsw_filtered_recall_gate": _q_ann_hnsw_filtered_recall_gate,
        "facade_exact_topk": _q_facade_exact_topk,
        "facade_hnsw_gate": _q_facade_hnsw_gate,
        "facade_ivf_gate": _q_facade_ivf_gate,
        "facade_pq_gate": _q_facade_pq_gate,
        "retrieval_e2e": _q_retrieval_e2e,
        "curation_e2e": _q_curation_e2e,
        "line_dup_stats": _q_line_dup_stats,
        "pack_strict": _q_pack_strict,
        "decontaminate_fuzzy": _q_decontaminate_fuzzy,
        "bm25_indexed": _q_bm25_indexed,
        "hybrid_rrf": _q_hybrid_rrf,
        "chunk_maxsim": _q_chunk_maxsim,
        "asof_join": _q_asof_join,
        # -- no_oracle entries LAST (native-xxhash dedup variants and
        # the recall-tested approximate ANN paths; their hash-checked
        # companions are the recall gates above)
        "near_dup_minhash": _q_near_dup_minhash,
        "near_dup_simhash": _q_near_dup_simhash,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_hnsw_topk": _q_ann_hnsw_topk,
        "ann_hnsw_filtered": _q_ann_hnsw_filtered,
        "ann_pq_topk": _q_ann_pq_topk,
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


# tokenization twins of functions/text.py (whitespace split on trimmed
# text, empty tokens dropped)
_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"
_LTOKS = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"
_STOP = {
    "de": "['der','die','und','das','ist','von','mit','den','nicht','ein']",
    "en": "['the','and','of','to','a','in','is','it','that','for']",
    "es": "['el','la','de','que','y','en','un','los','se','por']",
    "fr": "['le','la','et','les','des','un','une','du','est','pour']",
}


def _rp_cells_sql(seed: int = 42, n_planes: int = 8, n_tables: int = 8,
                  dim: int = 64, table: str = "embeddings") -> str:
    """UNION ALL of per-table bucket assignments with the SAME float64
    plane literals the Spark expression uses (single source:
    dedup._rp_plane; Python repr round-trips doubles exactly)."""
    from astro_vectordb_spark.operators.dedup import _rp_plane

    branches = []
    for t in range(n_tables):
        bits = []
        for p in range(n_planes):
            lit = "[" + ",".join(repr(x) for x in _rp_plane(seed, t, p, dim)) + "]"
            dot = (
                f"list_reduce(list_transform(generate_series(1, {dim}), "
                f"i -> embedding[i]::DOUBLE * ({lit})[i]), (acc, x) -> acc + x)"
            )
            bits.append(f"(CASE WHEN {dot} > 0 THEN {2**p} ELSE 0 END)")
        branches.append(
            f"SELECT vec_id, {t} AS tbl, ({' + '.join(bits)}) AS cell "
            f"FROM {table}"
        )
    return " UNION ALL ".join(branches)


def _rp_probe_cells_sql(seed: int = 42, n_planes: int = 8,
                        n_tables: int = 8, dim: int = 64,
                        table: str = "embeddings",
                        n_probes: int = 2) -> str:
    """Multi-probe bucket assignment for the BATCH side (Lv et al.
    VLDB 2007), as SQL: per hash table the base cell PLUS ``n_probes``
    cells one sign-flip away on the planes with the smallest
    |projection| — ties broken by plane index ascending, exactly the
    stable argsort in dedup.rp_probe_cell_table.  Same float64 plane
    literals and left-fold dot as _rp_cells_sql, so base cells match
    the persisted index bit-for-bit; the UNION with the probes is BY
    CONSTRUCTION a superset of the base assignment (probes only add
    candidate buckets; the exact-cosine verify downstream is
    unchanged, so no false positives can enter)."""
    from astro_vectordb_spark.operators.dedup import _rp_plane

    branches = []
    for t in range(n_tables):
        for p in range(n_planes):
            lit = "[" + ",".join(
                repr(x) for x in _rp_plane(seed, t, p, dim)
            ) + "]"
            dot = (
                f"list_reduce(list_transform(generate_series(1, {dim}), "
                f"i -> embedding[i]::DOUBLE * ({lit})[i]), "
                f"(acc, x) -> acc + x)"
            )
            branches.append(
                f"SELECT vec_id, {t} AS tbl, {p} AS p, {dot} AS d, "
                f"(CASE WHEN {dot} > 0 THEN {2**p} ELSE 0 END) AS bv "
                f"FROM {table}"
            )
    dots = " UNION ALL ".join(branches)
    return f"""
pdots AS ({dots}),
pbase AS (
  SELECT vec_id, tbl, sum(bv)::INT AS cell FROM pdots GROUP BY 1, 2
),
prk AS (
  SELECT vec_id, tbl, p,
         row_number() OVER (PARTITION BY vec_id, tbl
                            ORDER BY abs(d) ASC NULLS LAST, p ASC) AS r
  FROM pdots
),
pflip AS (
  SELECT b.vec_id, b.tbl, xor(b.cell, (1 << r.p))::INT AS cell
  FROM pbase b
  JOIN prk r ON r.vec_id = b.vec_id AND r.tbl = b.tbl
            AND r.r <= {int(n_probes)}
),
pcells AS (
  SELECT vec_id, tbl, cell FROM pbase
  UNION
  SELECT vec_id, tbl, cell FROM pflip
)"""


def _semdedup_cents_sql(seed: int = 777, k: int = 8, dim: int = 64) -> str:
    """UNION ALL of the semdedup gate's literal centroids — the SAME
    float64 values the Spark query builds from dedup._rp_plane
    (Python repr round-trips doubles exactly)."""
    from astro_vectordb_spark.operators.dedup import _rp_plane

    rows = []
    for c in range(k):
        lit = "[" + ",".join(repr(x) for x in _rp_plane(seed, c, 0, dim)) + "]"
        rows.append(f"SELECT {c} AS cell_id, {lit}::DOUBLE[] AS c")
    return " UNION ALL ".join(rows)


def _embed_cte(table: str = "documents") -> str:
    """CTE chain reproducing functions/embed.hash_embedder bit-for-bit:
    md5 feature hashing (little-endian u64 of md5[0:8]: bucket =
    byte0 % 64, sign bit = byte7 >> 7), exact-integer bucket sums,
    float64 L2 normalize, float32 cast.  ``table`` lets a gate embed a
    restricted corpus (e.g. post-remove survivors)."""
    return f"""toks AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM {table}
),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 2))::INT % 64 AS idx,
         CASE WHEN ('0x' || substr(md5(tok), 15, 2))::INT >= 128
              THEN 1.0 ELSE -1.0 END AS sign
  FROM toks
),
buckets AS (SELECT doc_id, idx, sum(sign) AS v FROM hashed GROUP BY 1, 2),
grid AS (
  SELECT d.doc_id, g.i AS idx, coalesce(b.v, 0.0) AS v
  FROM (SELECT doc_id FROM {table}) d
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
  LEFT JOIN buckets b ON b.doc_id = d.doc_id AND b.idx = g.i
),
vecs AS (SELECT doc_id, list(v ORDER BY idx) AS v FROM grid GROUP BY doc_id),
normed AS (
  SELECT doc_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (acc, x) -> acc + x)) AS n
  FROM vecs
),
emb AS (
  SELECT doc_id,
         list_transform(v, x -> CASE WHEN n > 0 THEN (x / n)::FLOAT
                                     ELSE 0.0::FLOAT END) AS e
  FROM normed
)"""


def _shingle_cte(table: str = "documents") -> str:
    """Distinct word-3-gram shingles per doc, matching word_shingles()."""
    return f"""
toks AS (SELECT doc_id, {_LTOKS} AS tk FROM {table}),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 3
              THEN list_distinct(list_transform(
                     generate_series(1, len(tk) - 2),
                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
              ELSE []::VARCHAR[] END AS shingles
  FROM toks
)"""


def _bm25_scored_cte(
    terms, k1: float = 1.2, b: float = 0.75, table: str = "documents"
) -> str:
    """CTE chain ending in ``bm25(doc_id, s)`` — same per-term tf
    arrays, 1-row stats, and left-to-right term-sum as
    operators/keyword.bm25_score_all.  ``table`` lets a gate score a
    restricted corpus (e.g. post-remove survivors)."""
    tf_exprs = ", ".join(
        f"len(list_filter(tk, x -> x = '{t}'))" for t in terms
    )
    df_exprs = ", ".join(
        f"sum(CASE WHEN tfs[{i + 1}] > 0 THEN 1 ELSE 0 END)::DOUBLE AS df{i}"
        for i in range(len(terms))
    )
    score_terms = " + ".join(
        f"(ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tfs[{i + 1}]"
        f" * {k1 + 1.0} / (tfs[{i + 1}] + {k1} * (1.0 - {b} + {b} * dl / avgdl)))"
        for i in range(len(terms))
    )
    return f"""btoks AS (SELECT doc_id, {_LTOKS} AS tk FROM {table}),
bbase AS (SELECT doc_id, len(tk)::DOUBLE AS dl,
          [{tf_exprs}]::DOUBLE[] AS tfs FROM btoks),
bstats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl, {df_exprs}
           FROM bbase),
bm25 AS (SELECT doc_id, {score_terms} AS s
         FROM bbase CROSS JOIN bstats)"""


def _bm25_batch_cte(
    cases, k1: float = 1.2, b: float = 0.75, table: str = "documents"
) -> str:
    """CTE chain ending in ``branked(query_id, doc_id, s, rank)`` —
    the batch analogue of ``_bm25_scored_cte``, replaying
    keyword.bm25_batch_topk_indexed bit-for-bit: per-(query, term)
    idf rows with df = 0 for unseen terms (the LEFT join), per-doc tf
    via the same token filter, and the per-doc score folded LEFT TO
    RIGHT in the query's term order (``list_reduce`` over a
    pos-ordered list, 0.0 prepended = the fold's init).  ``rank`` is
    the per-query row_number on the UNROUNDED score (desc, id asc) —
    the operator's internal selection order."""
    vals = ", ".join(
        f"({qid}, {pos}, '{t}')"
        for qid, terms in cases
        for pos, t in enumerate(terms)
    )
    return f"""qbtoks AS (SELECT doc_id, {_LTOKS} AS tk FROM {table}),
qbase AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM qbtoks),
qcstat AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM qbase),
qt(query_id, pos, term) AS (VALUES {vals}),
qdfs AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
         FROM (SELECT doc_id, unnest(tk) AS term FROM qbtoks)
         GROUP BY term),
qpriced AS (SELECT q.query_id, q.pos, q.term,
                   ln(1.0 + (c.n - COALESCE(d.df, 0.0) + 0.5)
                            / (COALESCE(d.df, 0.0) + 0.5)) AS idf
            FROM qt q CROSS JOIN qcstat c
            LEFT JOIN qdfs d ON d.term = q.term),
qcontrib AS (SELECT p.query_id, b.doc_id, p.pos, p.idf, b.dl,
                    len(list_filter(b.tk, x -> x = p.term))::DOUBLE AS tf
             FROM qbase b CROSS JOIN qpriced p),
qsum AS (SELECT query_id, doc_id,
                list_reduce(list_prepend(0.0::DOUBLE,
                  list(idf * tf * {k1 + 1.0}
                       / (tf + {k1} * ({1.0 - b} + {b} * dl / avgdl))
                       ORDER BY pos)),
                  (a, x) -> a + x) AS s
         FROM qcontrib CROSS JOIN qcstat
         GROUP BY query_id, doc_id),
branked AS (SELECT query_id, doc_id, s,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY s DESC, doc_id) AS rank
            FROM qsum WHERE s > 0.0)"""


def _mmr_oracle(query_vec_id: int, c: int, k: int, lam: float) -> str:
    """Unrolled greedy MMR (k fixed steps): candidates = top-C cosine,
    pairwise sims as one C x C cross join, each step an
    argmax-over-remaining CTE.  Same float64 op order as the fold
    kernel in operators/rerank.mmr_rerank."""
    qcos = _cos("e.embedding", "qv")
    pcos = _cos("a.embedding", "b.embedding")
    steps = [
        f"sel1 AS (SELECT vec_id, {lam} * rel AS m, 1 AS rank "
        f"FROM cand ORDER BY {lam} * rel DESC, vec_id LIMIT 1)"
    ]
    union = ["SELECT vec_id, m, rank FROM sel1"]
    for step in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{i}" for i in range(1, step)
        )
        steps.append(
            f"sel{step} AS (SELECT c.vec_id, "
            f"{lam} * c.rel - (1.0 - {lam}) * max(p.s) AS m, {step} AS rank "
            f"FROM cand c JOIN pairs p ON p.ia = c.vec_id AND p.ib IN ({prev}) "
            f"WHERE c.vec_id NOT IN ({prev}) "
            f"GROUP BY c.vec_id, c.rel ORDER BY m DESC, c.vec_id LIMIT 1)"
        )
        union.append(f"SELECT vec_id, m, rank FROM sel{step}")
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT e.vec_id, e.embedding, {qcos} AS rel
  FROM embeddings e CROSS JOIN q
  ORDER BY rel DESC, e.vec_id LIMIT {c}
),
pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib, {pcos} AS s
          FROM cand a CROSS JOIN cand b),
{", ".join(steps)}
SELECT vec_id, rank, round(m, 6) AS mmr
FROM ({" UNION ALL ".join(union)})
"""


def _chunks_cte(chunk: int = 10, stride: int = 5) -> str:
    """CTE ending in ``chunks(doc_id, chunk_id, ctk)`` — same sliding
    token windows as operators/multivector.chunk_documents (lowercased
    whitespace tokens; last window partial; empty docs dropped)."""
    return f"""ctoks AS (SELECT doc_id, {_LTOKS} AS tk FROM documents),
cstarts AS (
  SELECT doc_id, tk,
         unnest(generate_series(0, greatest(len(tk) - {chunk}, 0), {stride}))
           AS s
  FROM ctoks
),
chunks AS (
  SELECT doc_id, (s / {stride})::INT AS chunk_id,
         list_slice(tk, s + 1, s + {chunk}) AS ctk
  FROM cstarts
  WHERE len(list_slice(tk, s + 1, s + {chunk})) > 0
)"""


def _chunk_embed_cte() -> str:
    """Hash-embed every chunk — functions/embed.hash_embedder keyed by
    (doc_id, chunk_id), same md5 bucket/sign math as ``_embed_cte``."""
    return """chtok AS (
  SELECT doc_id, chunk_id, unnest(ctk) AS tok FROM chunks
),
chashed AS (
  SELECT doc_id, chunk_id,
         ('0x' || substr(md5(tok), 1, 2))::INT % 64 AS idx,
         CASE WHEN ('0x' || substr(md5(tok), 15, 2))::INT >= 128
              THEN 1.0 ELSE -1.0 END AS sign
  FROM chtok
),
cbuckets AS (
  SELECT doc_id, chunk_id, idx, sum(sign) AS v
  FROM chashed GROUP BY 1, 2, 3
),
cgrid AS (
  SELECT c.doc_id, c.chunk_id, g.i AS idx, coalesce(b.v, 0.0) AS v
  FROM (SELECT DISTINCT doc_id, chunk_id FROM chunks) c
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
  LEFT JOIN cbuckets b
    ON b.doc_id = c.doc_id AND b.chunk_id = c.chunk_id AND b.idx = g.i
),
cvecs AS (
  SELECT doc_id, chunk_id, list(v ORDER BY idx) AS v
  FROM cgrid GROUP BY doc_id, chunk_id
),
cnormed AS (
  SELECT doc_id, chunk_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x),
                          (acc, x) -> acc + x)) AS n
  FROM cvecs
),
cemb AS (
  SELECT doc_id, chunk_id,
         list_transform(v, x -> CASE WHEN n > 0 THEN (x / n)::FLOAT
                                     ELSE 0.0::FLOAT END) AS e
  FROM cnormed
)"""


def oracle_sql() -> dict[str, str]:
    cos = _cos("e.embedding", "qv")
    euc = f"(1.0 / (1.0 + {_eucdist('e.embedding', 'qv')}))"
    hits = {
        lang: f"len(list_filter({_LTOKS}, x -> list_contains({_STOP[lang]}, x)))"
        for lang in _STOP
    }
    return {
        "topk_exact": _topk_oracle(0, 0.2, 10, cos),
        "facade_exact_topk": _topk_oracle(5, 0.0, 10, cos),
        "facade_hnsw_gate": _topk_oracle(9, 0.0, 10, cos),
        # facade dispatch gates for the remaining kinds (round 9): both
        # serve at provably-exact budgets (IVF probes every cell; PQ's
        # refine budget >= corpus size at the oracle scales), so the
        # brute-force oracle is the exact expected output
        "facade_ivf_gate": _topk_oracle(7, 0.0, 10, cos),
        "facade_pq_gate": _topk_oracle(11, 0.0, 10, cos),
        "facade_ivfpq_gate": _topk_oracle(13, 0.0, 10, cos),
        # retrieval_e2e: the lifecycle's NET corpus — every doc except
        # the removed doc_id % 7 == 2 slice, plus the planted appended
        # duplicate of doc 0 (vec_id 90001); the built-then-removed
        # duplicate (90002) must NOT appear.  Embeddings via the same
        # md5 feature-hash CTE the embed_docs oracle uses.
        "retrieval_e2e": f"""
WITH {_embed_cte()},
corpus AS (
  SELECT doc_id AS vec_id, e FROM emb WHERE doc_id % 7 <> 2
  UNION ALL
  SELECT 90001::BIGINT AS vec_id, e FROM emb WHERE doc_id = 0
),
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
scored AS (
  SELECT c.vec_id, {_cos("c.e", "qv")} AS s
  FROM corpus c CROSS JOIN q
)
SELECT vec_id, round(s, 6) AS score
FROM scored WHERE s > 0
ORDER BY s DESC, vec_id LIMIT 10
""",
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
        "ann_ivf_exact": _topk_oracle(0, 0.0, 10, cos),
        "embedding_near_dup_blocked": f"""
WITH cells AS ({_rp_cells_sql()}),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM cells a JOIN cells b
    ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT c.a_id, c.b_id,
       round({_cos('ea.embedding', 'eb.embedding')}, 6) AS score
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a_id
JOIN embeddings eb ON eb.vec_id = c.b_id
WHERE {_cos('ea.embedding', 'eb.embedding')} > 0.4
""",
        # incremental RP index gate: hist = the indexed slice
        # (vec_id % 5 != 4, built through save+append churn), batch =
        # the held-out slice + planted +100000-shifted copies of 16
        # historical vectors; buckets re-derived from the same plane
        # literals, verify = exact cosine at threshold 0.4
        "rp_index_incremental": f"""
WITH hist AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
),
newb AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id % 5 <> 4 AND vec_id < 20
),
hcells AS ({_rp_cells_sql(table="hist")}),
ncells AS ({_rp_cells_sql(table="newb")}),
cand AS (
  SELECT DISTINCT n.vec_id AS new_id, h.vec_id AS hist_id
  FROM ncells n JOIN hcells h ON n.tbl = h.tbl AND n.cell = h.cell
)
SELECT c.new_id, c.hist_id,
       round({_cos('nv.embedding', 'hv.embedding')}, 6) AS score
FROM cand c
JOIN newb nv ON nv.vec_id = c.new_id
JOIN hist hv ON hv.vec_id = c.hist_id
WHERE {_cos('nv.embedding', 'hv.embedding')} > 0.4
""",
        # multi-probe RP match gate: hist cells = base assignment of
        # the indexed slice; batch cells = base + 2 lowest-|margin|
        # sign-flips per table (pcells CTE) — a SUPERSET of the
        # rp_index_incremental candidates by construction
        "rp_index_multiprobe": f"""
WITH hist AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
),
newb AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id % 5 <> 4 AND vec_id < 20
),
hcells AS ({_rp_cells_sql(table="hist")}),
{_rp_probe_cells_sql(table="newb").lstrip()},
cand AS (
  SELECT DISTINCT n.vec_id AS new_id, h.vec_id AS hist_id
  FROM pcells n JOIN hcells h ON n.tbl = h.tbl AND n.cell = h.cell
)
SELECT c.new_id, c.hist_id,
       round({_cos('nv.embedding', 'hv.embedding')}, 6) AS score
FROM cand c
JOIN newb nv ON nv.vec_id = c.new_id
JOIN hist hv ON hv.vec_id = c.hist_id
WHERE {_cos('nv.embedding', 'hv.embedding')} > 0.4
""",
        # SemDeDup fixed-centroids gate: assignment = per-vector argmax
        # cosine over the 16 literal centroids (ties by cell_id),
        # within-cell pairs at eps, recursive closure, min-id keep
        "semdedup_fixed": f"""
WITH RECURSIVE cents AS ({_semdedup_cents_sql(k=16)}),
ascore AS (
  SELECT e.vec_id, ct.cell_id, {_cos('e.embedding', 'ct.c')} AS s
  FROM embeddings e CROSS JOIN cents ct
),
arank AS (
  SELECT vec_id, cell_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell_id)
           AS rk
  FROM ascore
),
asg AS (SELECT vec_id, cell_id FROM arank WHERE rk = 1),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id
  FROM asg a JOIN asg b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE {_cos('ea.embedding', 'eb.embedding')} > 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS vec_id FROM comp WHERE id = component
UNION ALL
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM comp)
""",
        # history-side boundary probes (round 15): every stored row's
        # cell membership expands to rank-1 PLUS the margin-gated
        # rank-2 cell (s1 - s2 <= 0.02, same tie rule); pairs over the
        # expanded membership, exact cosine at eps, closure, min-id
        "semdedup_groups_probed": f"""
WITH RECURSIVE cents AS ({_semdedup_cents_sql(k=16)}),
ascore AS (
  SELECT e.vec_id, ct.cell_id, {_cos('e.embedding', 'ct.c')} AS s
  FROM embeddings e CROSS JOIN cents ct
),
arank AS (
  SELECT vec_id, cell_id, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell_id)
           AS rk
  FROM ascore
),
a1 AS (SELECT vec_id, cell_id, s FROM arank WHERE rk = 1),
asg AS (
  SELECT vec_id, cell_id FROM a1
  UNION
  SELECT r.vec_id, r.cell_id
  FROM arank r JOIN a1 ON r.vec_id = a1.vec_id
  WHERE r.rk = 2 AND a1.s - r.s <= 0.02
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM asg a JOIN asg b
    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.a_id, c.b_id
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a_id
  JOIN embeddings eb ON eb.vec_id = c.b_id
  WHERE {_cos('ea.embedding', 'eb.embedding')} > 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS vec_id FROM comp WHERE id = component
UNION ALL
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM comp)
""",
        # incremental SimHash gate (fourth lifecycle family): both
        # sides sign under the SQL-safe 31-bit char-poly family, the
        # batch's pigeonhole chunks join the indexed side's, popcount
        # verifies at hamming <= 3
        "simhash_index_incremental": f"""
WITH hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4
),
newb AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 4
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
  WHERE doc_id % 5 <> 4 AND doc_id < 20
),
hhs AS (
  SELECT doc_id,
    list_transform(list_distinct({_LTOKS}), tok ->
      list_reduce(
        list_transform(generate_series(1, len(tok)), i -> ord(tok[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM hist WHERE len(list_distinct({_LTOKS})) > 0
),
hsig AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, 30), j ->
      CASE WHEN list_sum(list_transform(h, x -> ((x >> j) & 1) * 2 - 1)) > 0
           THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS sim
  FROM hhs
),
nhs AS (
  SELECT doc_id,
    list_transform(list_distinct({_LTOKS}), tok ->
      list_reduce(
        list_transform(generate_series(1, len(tok)), i -> ord(tok[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM newb WHERE len(list_distinct({_LTOKS})) > 0
),
nsig AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, 30), j ->
      CASE WHEN list_sum(list_transform(h, x -> ((x >> j) & 1) * 2 - 1)) > 0
           THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS sim
  FROM nhs
),
ch AS (SELECT * FROM (VALUES (0, 0, 255), (1, 8, 255), (2, 16, 255), (3, 24, 127))
       AS c(ci, off, mask)),
hblk AS (SELECT doc_id, sim, ci, (sim >> off) & mask AS cv
         FROM hsig CROSS JOIN ch),
nblk AS (SELECT doc_id, sim, ci, (sim >> off) & mask AS cv
         FROM nsig CROSS JOIN ch),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS hist_id,
         n.sim AS ns, h.sim AS hs
  FROM nblk n JOIN hblk h ON n.ci = h.ci AND n.cv = h.cv
)
SELECT new_id, hist_id, bit_count(xor(ns, hs))::INT AS hamming
FROM cand WHERE bit_count(xor(ns, hs)) <= 3
""",
        # incremental SemDeDup gate: both sides assign by argmax cosine
        # over the 16 literal centroids (ties by cell_id) — the same
        # rule the persisted index's cells table stores; candidates =
        # same-cell (new, hist); verify = exact cosine at eps 0.4
        "semdedup_index_incremental": f"""
WITH cents AS ({_semdedup_cents_sql(k=16)}),
hist AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
),
newb AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id % 5 <> 4 AND vec_id < 20
),
hrank AS (
  SELECT h.vec_id, ct.cell_id,
         row_number() OVER (
           PARTITION BY h.vec_id
           ORDER BY {_cos('h.embedding', 'ct.c')} DESC, ct.cell_id
         ) AS rk
  FROM hist h CROSS JOIN cents ct
),
hasg AS (SELECT vec_id, cell_id FROM hrank WHERE rk = 1),
nrank AS (
  SELECT n.vec_id, ct.cell_id,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_cos('n.embedding', 'ct.c')} DESC, ct.cell_id
         ) AS rk
  FROM newb n CROSS JOIN cents ct
),
nasg AS (SELECT vec_id, cell_id FROM nrank WHERE rk = 1),
cand AS (
  SELECT DISTINCT n.vec_id AS new_id, h.vec_id AS hist_id
  FROM nasg n JOIN hasg h ON n.cell_id = h.cell_id
)
SELECT c.new_id, c.hist_id,
       round({_cos('nv.embedding', 'hv.embedding')}, 6) AS score
FROM cand c
JOIN newb nv ON nv.vec_id = c.new_id
JOIN hist hv ON hv.vec_id = c.hist_id
WHERE {_cos('nv.embedding', 'hv.embedding')} > 0.4
""",
        # boundary multi-probe gate: the batch side additionally
        # probes its rank-2 centroid cell when the assignment margin
        # is thin (s1 - s2 <= 0.1) — same tie rule, same eps verify;
        # history stays rank-1 (the stored assignment)
        "semdedup_index_multiprobe": f"""
WITH cents AS ({_semdedup_cents_sql(k=16)}),
hist AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
),
newb AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings
  WHERE vec_id % 5 <> 4 AND vec_id < 20
),
hrank AS (
  SELECT h.vec_id, ct.cell_id,
         row_number() OVER (
           PARTITION BY h.vec_id
           ORDER BY {_cos('h.embedding', 'ct.c')} DESC, ct.cell_id
         ) AS rk
  FROM hist h CROSS JOIN cents ct
),
hasg AS (SELECT vec_id, cell_id FROM hrank WHERE rk = 1),
nrank AS (
  SELECT n.vec_id, ct.cell_id, {_cos('n.embedding', 'ct.c')} AS s,
         row_number() OVER (
           PARTITION BY n.vec_id
           ORDER BY {_cos('n.embedding', 'ct.c')} DESC, ct.cell_id
         ) AS rk
  FROM newb n CROSS JOIN cents ct
),
n1 AS (SELECT vec_id, cell_id, s FROM nrank WHERE rk = 1),
nasg AS (
  SELECT vec_id, cell_id FROM n1
  UNION
  SELECT r.vec_id, r.cell_id
  FROM nrank r JOIN n1 ON r.vec_id = n1.vec_id
  WHERE r.rk = 2 AND n1.s - r.s <= 0.1
),
cand AS (
  SELECT DISTINCT n.vec_id AS new_id, h.vec_id AS hist_id
  FROM nasg n JOIN hasg h ON n.cell_id = h.cell_id
)
SELECT c.new_id, c.hist_id,
       round({_cos('nv.embedding', 'hv.embedding')}, 6) AS score
FROM cand c
JOIN newb nv ON nv.vec_id = c.new_id
JOIN hist hv ON hv.vec_id = c.hist_id
WHERE {_cos('nv.embedding', 'hv.embedding')} > 0.4
""",
        # retroactive sweep gate: keep set over the indexed hist slice
        # from buckets + exact-cosine pairs + recursive closure
        "rp_index_groups": f"""
WITH RECURSIVE hist AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
),
cells AS ({_rp_cells_sql(table="hist")}),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM cells a JOIN cells b
    ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.a_id, c.b_id
  FROM cand c
  JOIN hist ea ON ea.vec_id = c.a_id
  JOIN hist eb ON eb.vec_id = c.b_id
  WHERE {_cos('ea.embedding', 'eb.embedding')} > 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS vec_id FROM comp WHERE id = component
UNION ALL
SELECT vec_id FROM hist
WHERE vec_id NOT IN (SELECT id FROM comp)
""",
        "embedding_dedup_groups": f"""
WITH RECURSIVE cells AS ({_rp_cells_sql()}),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM cells a JOIN cells b
    ON a.tbl = b.tbl AND a.cell = b.cell AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.a_id, c.b_id
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a_id
  JOIN embeddings eb ON eb.vec_id = c.b_id
  WHERE {_cos('ea.embedding', 'eb.embedding')} > 0.4
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS vec_id FROM comp WHERE id = component
UNION ALL
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT id FROM comp)
""",
        "dedup_exact": f"""
SELECT min(doc_id) AS doc_id
FROM (SELECT doc_id, array_to_string({_LTOKS}, ' ') AS norm FROM documents)
GROUP BY norm
""",
        "near_dup_jaccard": f"""
WITH {_shingle_cte()},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS s FROM sh)
SELECT a_id, b_id,
       round(i::DOUBLE / (sa.s + sb.s - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = a_id
JOIN sz sb ON sb.doc_id = b_id
WHERE round(i::DOUBLE / (sa.s + sb.s - i), 6) >= 0.8
""",
        "dedup_groups": f"""
WITH RECURSIVE {_shingle_cte().lstrip()},
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS s FROM sh),
pairs AS (
  SELECT a_id, b_id
  FROM inter
  JOIN sz sa ON sa.doc_id = a_id
  JOIN sz sb ON sb.doc_id = b_id
  WHERE round(i::DOUBLE / (sa.s + sb.s - i), 6) >= 0.8
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS doc_id FROM comp WHERE id = component
UNION ALL
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id FROM comp)
""",
        "near_dup_minhash_sql": f"""
WITH {_shingle_cte()},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s ->
      list_reduce(
        list_transform(generate_series(1, len(s)), i -> ord(s[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id, shingles,
    list_transform(generate_series(0, 31), i ->
      list_min(list_transform(h, x -> ((2*i+1) * x + 7919*i) % 2147483647))) AS s
  FROM hs
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
    list_reduce(
      list_prepend(0::BIGINT, s[b.b*4+1 : b.b*4+4]),
      (acc, x) -> (acc * 1000003 + x) % 2147483647) AS band_sig
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, bb.doc_id AS b_id
  FROM bands a JOIN bands bb
    ON a.band_idx = bb.band_idx AND a.band_sig = bb.band_sig
   AND a.doc_id < bb.doc_id
),
verified AS (
  SELECT c.a_id, c.b_id,
    round(
      len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id
)
SELECT a_id, b_id, jaccard FROM verified WHERE jaccard >= 0.8
""",
        "near_dup_simhash_sql": f"""
WITH t AS (SELECT doc_id, list_distinct({_LTOKS}) AS tk FROM documents),
hs AS (
  SELECT doc_id,
    list_transform(tk, tok ->
      list_reduce(
        list_transform(generate_series(1, len(tok)), i -> ord(tok[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM t WHERE len(tk) > 0
),
sig AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, 30), j ->
      CASE WHEN list_sum(list_transform(h, x -> ((x >> j) & 1) * 2 - 1)) > 0
           THEN (1::BIGINT << j) ELSE 0 END))::BIGINT AS sim
  FROM hs
),
ch AS (SELECT * FROM (VALUES (0, 0, 255), (1, 8, 255), (2, 16, 255), (3, 24, 127))
       AS c(ci, off, mask)),
blocked AS (
  SELECT doc_id, sim, ci, (sim >> off) & mask AS cv FROM sig CROSS JOIN ch
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.sim AS sa, b.sim AS sb
  FROM blocked a JOIN blocked b
    ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
""",
        "near_dup_native_exactdup": f"""
WITH {_shingle_cte().lstrip()},
sk AS (
  SELECT doc_id, array_to_string(list_sort(shingles), chr(1)) AS key
  FROM sh WHERE len(shingles) > 0
),
eq3 AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sk a JOIN sk b ON a.key = b.key AND a.doc_id < b.doc_id
),
tk AS (
  SELECT doc_id, list_sort(list_distinct({_LTOKS})) AS tkl FROM documents
),
k AS (
  SELECT doc_id, array_to_string(tkl, chr(1)) AS key
  FROM tk WHERE len(tkl) > 0
),
eq1 AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
)
SELECT 'minhash' AS family, a_id, b_id FROM eq3
UNION ALL
SELECT 'simhash' AS family, a_id, b_id FROM eq1
""",
        "text_stats": f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk, {_LTOKS} AS ltk FROM documents
)
SELECT doc_id,
  len(tk)::BIGINT AS n_tokens,
  coalesce(list_sum(list_transform(tk, x -> ceil(len(x) / 4.0)::INT)), 0)::BIGINT
    AS n_subwords,
  length(text)::BIGINT AS n_chars_m,
  len(regexp_extract_all(text, '[.,!?;:]'))::BIGINT AS n_punct,
  len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digits,
  round(CASE WHEN len(tk) > 0
        THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
        ELSE 0.0 END, 6) AS avg_token_len,
  round(CASE WHEN len(tk) > 0
        THEN len(list_filter(ltk, x -> list_contains({_STOP['en']}, x)))::DOUBLE
             / len(tk)
        ELSE 0.0 END, 6) AS stopword_ratio
FROM t
""",
        "quality_scores": f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk, {_LTOKS} AS ltk FROM documents
),
c AS (
  SELECT doc_id,
    len(tk) AS tc,
    CASE WHEN len(tk) > 0
         THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
         ELSE 0.0 END AS atl,
    CASE WHEN len(tk) > 0
         THEN len(list_filter(ltk, x -> list_contains({_STOP['en']}, x)))::DOUBLE
              / len(tk)
         ELSE 0.0 END AS swr,
    len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE
      / greatest(length(text), 1) AS pr,
    len(regexp_extract_all(text, '[0-9]'))::DOUBLE
      / greatest(length(text), 1) AS dr
  FROM t
)
SELECT doc_id, round(
    0.25 * (CASE WHEN tc BETWEEN 5 AND 5000 THEN 1.0 ELSE 0.5 END)
  + 0.25 * (CASE WHEN atl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END)
  + 0.25 * least(1.0, swr * 4.0)
  + 0.25 * (1.0 - least(1.0, (pr + dr) * 5.0)), 6) AS quality
FROM c
""",
        "lang_id": f"""
WITH h AS (
  SELECT doc_id,
    {hits['de']}::BIGINT AS hits_de,
    {hits['en']}::BIGINT AS hits_en,
    {hits['es']}::BIGINT AS hits_es,
    {hits['fr']}::BIGINT AS hits_fr
  FROM documents
)
SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
  CASE
    WHEN greatest(hits_de, hits_en, hits_es, hits_fr) <= 0 THEN 'und'
    WHEN hits_fr >= hits_es AND hits_fr >= hits_en AND hits_fr >= hits_de THEN 'fr'
    WHEN hits_es >= hits_en AND hits_es >= hits_de THEN 'es'
    WHEN hits_en >= hits_de THEN 'en'
    ELSE 'de'
  END AS lang_pred
FROM h
""",
        "doc_fingerprints": f"""
WITH t AS (SELECT doc_id, {_LTOKS} AS ltk FROM documents),
th AS (
  SELECT doc_id, ltk,
    list_transform(ltk, tok ->
      list_reduce(
        list_transform(generate_series(1, len(tok)), i -> ord(tok[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS hs
  FROM t
)
SELECT doc_id,
  md5(array_to_string(ltk, ' ')) AS fp_exact,
  md5(array_to_string(list_sort(list_distinct(ltk)), ' ')) AS fp_sorted,
  CASE WHEN len(hs) > 0
       THEN list_reduce(hs, (acc, x) -> (acc * 1000003 + x) % 2147483647)
       ELSE 0 END AS fp_rolling
FROM th
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY 1, 2
""",
        "events_sliding": """
WITH assigned AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
         event_type, value FROM events
  UNION ALL
  SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
                  '%Y-%m-%d %H:%M:%S') AS win_start,
         event_type, value FROM events
)
SELECT win_start, event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM assigned
GROUP BY win_start, event_type
""",
        "supplier_balance": """
SELECT n.n_name,
       count(*) AS n_suppliers,
       round(sum(s.s_acctbal), 6) AS total_bal,
       round(max(s.s_acctbal), 6) AS max_bal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "part_brand_stats": """
SELECT p_brand,
       count(*) AS n_parts,
       round(avg(p_retailprice), 6) AS avg_price,
       max(p_size)::BIGINT AS max_size,
       count(DISTINCT p_type) AS n_types
FROM part
GROUP BY p_brand
""",
        "event_rates": """
WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
SELECT event_type, n,
       round(n::DOUBLE / (SELECT sum(n) FROM c), 6) AS share
FROM c
""",
        "session_stats": """
WITH ordered AS (
  SELECT user_id, event_id, value, ts,
         floor(epoch(ts))::BIGINT AS tsec,
         lag(floor(epoch(ts))::BIGINT) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev IS NULL OR tsec - prev > 1800 THEN 1 ELSE 0 END AS new_s
  FROM ordered
),
numbered AS (
  SELECT *, sum(new_s) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sess_n
  FROM flagged
)
SELECT user_id,
       user_id::VARCHAR || '#' || sess_n::VARCHAR AS session_id,
       count(*) AS n_events,
       max(tsec) - min(tsec) AS span_sec,
       round(sum(value), 6) AS sum_value
FROM numbered
GROUP BY user_id, session_id
""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_topn": """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 10
""",
        "customer_rank": """
SELECT * FROM (
  SELECT n.n_name, c.c_custkey,
         round(c.c_acctbal, 6) AS acctbal,
         row_number() OVER (
           PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey
         ) AS rank_in_nation
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rank_in_nation <= 3
""",
        "order_priority": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate >= TIMESTAMP '1997-01-01'
)
GROUP BY o_orderpriority
""",
        "knn_classify": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id, e.label, {cos} AS s
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rnk
  FROM scored WHERE s > 0.0
),
votes AS (
  SELECT query_id, label, count(*) AS votes
  FROM ranked WHERE rnk <= 10
  GROUP BY query_id, label
),
best AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY votes DESC, label) AS rn
  FROM votes
)
SELECT query_id, label AS pred_label, votes FROM best WHERE rn = 1
""",
        "validate_dim": """
SELECT vec_id,
  CASE
    WHEN vec_id % 101 = 0 THEN FALSE
    WHEN vec_id % 103 = 0 THEN FALSE
    ELSE TRUE
  END AS valid
FROM embeddings
""",
        "nation_revenue": """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "split_counts": """
WITH b AS (
  SELECT doc_id,
    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS bucket
  FROM documents
),
s AS (
  SELECT doc_id,
    CASE WHEN bucket < 100 THEN 'test'
         WHEN bucket < 200 THEN 'val'
         ELSE 'train' END AS split
  FROM b
)
SELECT split, count(*) AS n, min(doc_id) AS min_id
FROM s GROUP BY split
""",
        "topk_quantized": """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qt AS (
  SELECT vec_id, embedding,
    greatest(list_max(list_transform(embedding, v -> abs(v::DOUBLE))), 1e-30)
      / 127.0 AS s
  FROM embeddings
),
deq AS (
  SELECT vec_id, embedding,
    list_transform(embedding, v -> floor(v::DOUBLE / s + 0.5) * s) AS xhat
  FROM qt
),
stage1 AS (
  SELECT d.vec_id,
    (list_reduce(list_transform(generate_series(1, len(d.xhat)), i -> d.xhat[i] * qv[i]::DOUBLE), (acc, x) -> acc + x)
     / (sqrt(list_reduce(list_transform(generate_series(1, len(d.xhat)), i -> d.xhat[i] * d.xhat[i]), (acc, x) -> acc + x))
        * sqrt(list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)))) AS qs
  FROM deq d CROSS JOIN q
  ORDER BY qs DESC, d.vec_id LIMIT 40
),
exact AS (
  SELECT e.vec_id,
    (list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> e.embedding[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)
     / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (acc, x) -> acc + x))
        * sqrt(list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)))) AS sc
  FROM embeddings e JOIN stage1 USING (vec_id) CROSS JOIN q
)
SELECT vec_id, round(sc, 6) AS score
FROM exact WHERE sc > 0.2
ORDER BY sc DESC, vec_id LIMIT 10
""",
        "batch_topk_quantized": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3
),
qt AS (
  SELECT vec_id, embedding,
    greatest(list_max(list_transform(embedding, v -> abs(v::DOUBLE))), 1e-30)
      / 127.0 AS s
  FROM embeddings
),
deq AS (
  SELECT vec_id, embedding,
    list_transform(embedding, v -> floor(v::DOUBLE / s + 0.5) * s) AS xhat
  FROM qt
),
stage1 AS (
  SELECT q.query_id, d.vec_id,
    (list_reduce(list_transform(generate_series(1, len(d.xhat)), i -> d.xhat[i] * qv[i]::DOUBLE), (acc, x) -> acc + x)
     / (sqrt(list_reduce(list_transform(generate_series(1, len(d.xhat)), i -> d.xhat[i] * d.xhat[i]), (acc, x) -> acc + x))
        * sqrt(list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)))) AS qs
  FROM deq d CROSS JOIN q
),
cand AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY qs DESC, vec_id) AS r
    FROM stage1
  ) WHERE r <= 20
),
exact AS (
  SELECT c.query_id, e.vec_id,
    (list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> e.embedding[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)
     / (sqrt(list_reduce(list_transform(generate_series(1, len(e.embedding)), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), (acc, x) -> acc + x))
        * sqrt(list_reduce(list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * qv[i]::DOUBLE), (acc, x) -> acc + x)))) AS sc
  FROM cand c
  JOIN embeddings e USING (vec_id)
  JOIN q ON q.query_id = c.query_id
),
ranked AS (
  SELECT query_id, vec_id, sc,
         row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, vec_id) AS rank
  FROM exact WHERE sc > 0.0
)
SELECT query_id, vec_id, round(sc, 6) AS score, rank
FROM ranked WHERE rank <= 5
""",
        "stratified_sample": """
WITH b AS (
  SELECT doc_id, lang,
    ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS bucket
  FROM documents
),
kept AS (
  SELECT doc_id, lang FROM b
  WHERE bucket < CASE lang
    WHEN 'en' THEN 200 WHEN 'zh' THEN 1000 WHEN 'fr' THEN 500
    ELSE 50 END
)
SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id
FROM kept GROUP BY lang
""",
        "profile_lineitem": """
SELECT c.column, c.n, c.n_null, c.min_v, c.max_v, c.mean_v, c.p50, c.p90
FROM (
  SELECT 'l_quantity' AS column, count(l_quantity) AS n,
         sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
         round(min(l_quantity)::DOUBLE, 6) AS min_v,
         round(max(l_quantity)::DOUBLE, 6) AS max_v,
         round(avg(l_quantity), 6) AS mean_v,
         round(quantile_cont(l_quantity, 0.5)::DOUBLE, 6) AS p50,
         round(quantile_cont(l_quantity, 0.9)::DOUBLE, 6) AS p90
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', count(l_extendedprice),
         sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
         round(min(l_extendedprice)::DOUBLE, 6),
         round(max(l_extendedprice)::DOUBLE, 6),
         round(avg(l_extendedprice), 6),
         round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 6),
         round(quantile_cont(l_extendedprice, 0.9)::DOUBLE, 6)
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(l_discount),
         sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT,
         round(min(l_discount)::DOUBLE, 6),
         round(max(l_discount)::DOUBLE, 6),
         round(avg(l_discount), 6),
         round(quantile_cont(l_discount, 0.5)::DOUBLE, 6),
         round(quantile_cont(l_discount, 0.9)::DOUBLE, 6)
  FROM lineitem
) c
""",
        "segment_no_orders": """
SELECT c_custkey, c_name
FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
""",
        "revenue_rollup": """
SELECT n.n_name, o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       grouping(n.n_name, o.o_orderpriority)::BIGINT AS gid
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, o.o_orderpriority)
""",
        "status_pivot": """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders
GROUP BY o_orderpriority
""",
        "token_counts": rf"""
SELECT doc_id,
  len({_TOKS})::BIGINT AS n_ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT
    AS n_regex_tokens,
  coalesce(list_sum(list_transform({_TOKS}, x -> ceil(len(x) / 4.0)::INT)), 0)::BIGINT
    AS n_subwords
FROM documents
""",
        "embed_docs": f"""
WITH {_embed_cte()}
SELECT doc_id,
       round(e[1]::DOUBLE, 6) + 0.0 AS e0,
       64 AS dim,
       round(list_reduce(list_transform(e, x -> x::DOUBLE),
                         (acc, x) -> acc + x), 6) + 0.0 AS el_sum
FROM emb
""",
        "read_your_writes": f"""
WITH merged AS (
  SELECT vec_id,
         CASE WHEN vec_id BETWEEN 10 AND 19
              THEN list_transform(embedding, x -> (-x)::FLOAT)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id >= 10
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding
  FROM embeddings WHERE vec_id < 10
),
q AS (SELECT list_transform(embedding, x -> (-x)::FLOAT) AS qv
      FROM embeddings WHERE vec_id = 12),
scored AS (
  SELECT e.vec_id, {_cos("e.embedding", "qv")} AS s
  FROM merged e CROSS JOIN q
)
SELECT vec_id, round(s, 6) AS score
FROM scored WHERE s > 0.2
ORDER BY s DESC, vec_id LIMIT 10
""",
        "embed_then_search": f"""
WITH {_embed_cte()},
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
scored AS (
  SELECT emb.doc_id AS vec_id, {_cos('emb.e', 'qv')} AS s
  FROM emb CROSS JOIN q
)
SELECT vec_id, round(s, 6) AS score
FROM scored WHERE s > 0.0
ORDER BY s DESC, vec_id LIMIT 10
""",
        "multimodal_decode": """
WITH f AS (
  SELECT doc_id,
         list_transform(generate_series(0, 15),
           i -> (('0x' || substr(sha256(text), 2 * i + 1, 2))::BIGINT)::DOUBLE
                / cast(255.0 as double)) AS feats
  FROM documents
)
SELECT doc_id,
       round(feats[1], 6) + 0.0 AS e0,
       16 AS dim,
       round(list_reduce(feats, (acc, x) -> acc + x), 6) + 0.0 AS el_sum
FROM f
""",
        "events_json": """
SELECT event_type,
       count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
       sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
       round(avg(CAST(props->>'$.k' AS BIGINT)), 6) AS avg_k
FROM events
GROUP BY event_type
""",
        "filtered_topk": _topk_oracle(
            5, 0.0, 10, cos, extra_where="WHERE e.label = 2"
        ),
        # ANN recall gates: the approximate path (persisted index at a
        # full-recall budget) exact-re-ranks its candidates, so its
        # output must EQUAL the brute-force exact top-K — the oracle is
        # the plain exact-search SQL, and a hash mismatch means the
        # index lost recall.
        "ann_hnsw_recall_gate": f"""
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
FROM ranked WHERE rank <= 10
""",
        "ann_pq_recall_gate": _topk_oracle(7, 0.0, 10, cos),
        "ann_ivf_recall_gate": _topk_oracle(3, 0.0, 10, cos),
        "ann_hnsw_filtered_recall_gate": _topk_oracle(
            5, 0.0, 10, cos, extra_where="WHERE e.label = 2"
        ),
        "bm25_topk": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)}
SELECT doc_id, round(s, 6) AS score
FROM bm25 WHERE s > 0 ORDER BY s DESC, doc_id LIMIT 10
""",
        # indexed path computes the SAME float64 expression tree
        # (stats enter as literals) -> same oracle
        "bm25_indexed": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)}
SELECT doc_id, round(s, 6) AS score
FROM bm25 WHERE s > 0 ORDER BY s DESC, doc_id LIMIT 10
""",
        "hybrid_rrf": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)},
lex AS (SELECT doc_id, s FROM bm25 WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY s DESC, doc_id) AS rank
         FROM lex),
{_embed_cte()},
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s FROM emb CROSS JOIN q),
vtop AS (SELECT doc_id, s FROM vsc ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY s DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM vr
)
SELECT doc_id, round(sum(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""",
        "hybrid_weighted": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)},
lex AS (SELECT doc_id, s FROM bm25 WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lstat AS (SELECT min(s) AS mn, max(s) AS mx FROM lex),
lc AS (SELECT doc_id,
              0.4 * (CASE WHEN mx > mn THEN (s - mn) / (mx - mn)
                          ELSE 1.0 END) AS c
       FROM lex CROSS JOIN lstat),
{_embed_cte()},
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s FROM emb CROSS JOIN q),
vtop AS (SELECT doc_id, s FROM vsc ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vstat AS (SELECT min(s) AS mn, max(s) AS mx FROM vtop),
vc AS (SELECT doc_id,
              0.6 * (CASE WHEN mx > mn THEN (s - mn) / (mx - mn)
                          ELSE 1.0 END) AS c
       FROM vtop CROSS JOIN vstat),
contrib AS (SELECT doc_id, c FROM lc UNION ALL SELECT doc_id, c FROM vc)
SELECT doc_id, round(sum(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""",
        "mmr_rerank": _mmr_oracle(0, 30, 5, 0.7),
        "doc_chunks": f"""
WITH {_chunks_cte(10, 5)}
SELECT doc_id, chunk_id,
       len(ctk)::INT AS n_tokens,
       array_to_string(ctk, ' ') AS chunk_text
FROM chunks
""",
        "chunk_maxsim": f"""
WITH {_chunks_cte(10, 5)},
{_chunk_embed_cte()},
q0 AS (SELECT e AS v FROM cemb WHERE doc_id = 0 AND chunk_id = 0),
q1 AS (SELECT e AS v FROM cemb WHERE doc_id = 0 AND chunk_id = 1),
sims AS (
  SELECT c.doc_id,
         {_cos("c.e", "q0.v")} AS s0,
         {_cos("c.e", "q1.v")} AS s1
  FROM cemb c CROSS JOIN q0 CROSS JOIN q1
),
agg AS (
  SELECT doc_id, max(s0) AS m0, max(s1) AS m1 FROM sims GROUP BY doc_id
)
SELECT doc_id, round(m0 + m1, 6) AS score
FROM agg ORDER BY m0 + m1 DESC, doc_id LIMIT 10
""",
        "repetition_stats": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
uni AS (SELECT doc_id, 1 AS n, u.g AS gram FROM toks, unnest(tk) AS u(g)),
bi AS (
  SELECT doc_id, 2 AS n, tk[i] || ' ' || tk[i+1] AS gram
  FROM toks, unnest(range(1, len(tk))) AS r(i)
),
tri AS (
  SELECT doc_id, 3 AS n, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks, unnest(range(1, len(tk)-1)) AS r(i)
),
grams AS (
  SELECT * FROM uni UNION ALL SELECT * FROM bi UNION ALL SELECT * FROM tri
),
per_gram AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM grams GROUP BY ALL
),
per_doc AS (
  SELECT doc_id,
    coalesce(sum(cnt) FILTER (n = 1), 0) AS tot1,
    coalesce(max(cnt) FILTER (n = 1), 0) AS top1,
    coalesce(sum(cnt) FILTER (n = 2), 0) AS tot2,
    coalesce(max(cnt) FILTER (n = 2), 0) AS top2,
    coalesce(sum(cnt) FILTER (n = 3), 0) AS tot3,
    coalesce(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) FILTER (n = 3), 0)
      AS dup3
  FROM per_gram GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(tot1, 0)::BIGINT AS n_tokens,
  coalesce(round(CASE WHEN tot1 > 0 THEN top1::DOUBLE / tot1
                 ELSE 0.0 END, 6), 0.0) AS top_unigram_frac,
  coalesce(round(CASE WHEN tot2 > 0 THEN top2::DOUBLE / tot2
                 ELSE 0.0 END, 6), 0.0) AS top_bigram_frac,
  coalesce(round(CASE WHEN tot3 > 0 THEN dup3::DOUBLE / tot3
                 ELSE 0.0 END, 6), 0.0) AS dup_trigram_frac
FROM documents d LEFT JOIN per_doc USING (doc_id)
""",
        "gopher_filter": f"""
WITH toks AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
),
uni AS (SELECT doc_id, 1 AS n, u.g AS gram FROM toks, unnest(tk) AS u(g)),
tri AS (
  SELECT doc_id, 3 AS n, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks, unnest(range(1, len(tk)-1)) AS r(i)
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM tri),
per_gram AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM grams GROUP BY ALL
),
per_doc AS (
  SELECT doc_id,
    coalesce(sum(cnt) FILTER (n = 1), 0) AS tot1,
    coalesce(max(cnt) FILTER (n = 1), 0) AS top1,
    coalesce(sum(cnt) FILTER (n = 3), 0) AS tot3,
    coalesce(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) FILTER (n = 3), 0)
      AS dup3
  FROM per_gram GROUP BY doc_id
),
stats AS (
  SELECT t.doc_id,
    len(tk) AS tc,
    CASE WHEN len(tk) > 0
         THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
         ELSE 0.0 END AS atl,
    len(regexp_extract_all(text, '[.,!?;:]')) AS punct,
    coalesce(round(CASE WHEN tot1 > 0 THEN top1::DOUBLE / tot1
                   ELSE 0.0 END, 6), 0.0) AS uni_frac,
    coalesce(round(CASE WHEN tot3 > 0 THEN dup3::DOUBLE / tot3
                   ELSE 0.0 END, 6), 0.0) AS tri_frac
  FROM toks t LEFT JOIN per_doc USING (doc_id)
)
SELECT doc_id,
  (tc >= 5 AND tc <= 100000) AS len_ok,
  (atl >= 2.0 AND atl <= 12.0) AS word_len_ok,
  (uni_frac <= 0.30) AS unigram_ok,
  (tri_frac <= 0.60) AS trigram_ok,
  (punct::DOUBLE / greatest(tc, 1) <= 0.10) AS symbol_ok,
  ((tc >= 5 AND tc <= 100000) AND (atl >= 2.0 AND atl <= 12.0)
   AND uni_frac <= 0.30 AND tri_frac <= 0.60
   AND punct::DOUBLE / greatest(tc, 1) <= 0.10) AS keep
FROM stats
""",
        "decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' '
      || tk[i+4] AS gram
  FROM toks, unnest(range(1, len(tk)-3)) AS r(i)
),
bg AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM grams g JOIN bg USING (gram) GROUP BY g.doc_id
)
SELECT d.doc_id,
  coalesce(h.n_hits, 0)::BIGINT AS n_hits,
  coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
        "pack_sequences": f"""
WITH toks AS (
  SELECT doc_id, (doc_id % 8)::INT AS bucket,
         len({_TOKS})::BIGINT AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, bucket, n_tokens,
    coalesce(
      sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
        - n_tokens, 0)::BIGINT AS start_offset
  FROM toks
)
SELECT doc_id, bucket,
  floor(start_offset / 200.0)::BIGINT AS pack_id,
  n_tokens, start_offset
FROM off
""",
        # same SQL-safe minhash family as near_dup_minhash_sql, with
        # the benchmark side (doc_id % 97 = 0) as the band-join probe
        "decontaminate_fuzzy": f"""
WITH {_shingle_cte()},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s ->
      list_reduce(
        list_transform(generate_series(1, len(s)), i -> ord(s[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id, shingles,
    list_transform(generate_series(0, 31), i ->
      list_min(list_transform(h, x -> ((2*i+1) * x + 7919*i) % 2147483647))) AS s
  FROM hs
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
    list_reduce(
      list_prepend(0::BIGINT, s[b.b*2+1 : b.b*2+2]),
      (acc, x) -> (acc * 1000003 + x) % 2147483647) AS band_sig
  FROM sig, (SELECT unnest(generate_series(0, 15)) AS b) b
),
cand AS (
  SELECT DISTINCT d.doc_id, bb.doc_id AS bench_id
  FROM bands d JOIN bands bb
    ON d.band_idx = bb.band_idx AND d.band_sig = bb.band_sig
  WHERE bb.doc_id % 97 = 0
),
verified AS (
  SELECT c.doc_id,
    round(
      len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
      / (len(sa.shingles) + len(sb.shingles)
         - len(list_intersect(sa.shingles, sb.shingles))), 6) AS j
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_id
  JOIN sh sb ON sb.doc_id = c.bench_id
),
hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_matches, max(j) AS mx
  FROM verified WHERE j >= 0.5 GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(h.n_matches, 0)::BIGINT AS n_matches,
       coalesce(h.mx, 0.0) AS max_jaccard,
       coalesce(h.n_matches, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
""",
        # strict next-fit greedy, replayed sequentially per bucket:
        # the recursive CTE advances every bucket in rn-lockstep,
        # carrying (pack_id, fill) exactly like the Spark per-bucket
        # counters
        # line-level repetition over corpus + planted multi-line docs
        "line_dup_stats": """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT * FROM (VALUES
    (97000, 'nav bar' || chr(10) || 'real content here' || chr(10)
            || 'nav bar' || chr(10) || 'footer text'),
    (97001, 'cookie notice' || chr(10) || 'cookie notice' || chr(10)
            || 'cookie notice'),
    (97002, 'alpha' || chr(10) || chr(10) || '   ' || chr(10) || 'beta'),
    (97003, '')
  ) AS v(doc_id, text)
),
lines AS (
  SELECT doc_id, trim(l) AS line
  FROM corpus, unnest(string_split(coalesce(text, ''), chr(10))) AS u(l)
  WHERE trim(l) <> ''
),
per_line AS (
  SELECT doc_id, line, count(*) AS cnt, len(line) AS chars
  FROM lines GROUP BY doc_id, line
),
per_doc AS (
  SELECT doc_id,
    sum(cnt) AS tot,
    sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup,
    sum(cnt * chars) AS tot_chars,
    sum(CASE WHEN cnt > 1 THEN cnt * chars ELSE 0 END) AS dup_chars
  FROM per_line GROUP BY doc_id
)
SELECT c.doc_id,
  coalesce(tot, 0)::BIGINT AS n_lines,
  coalesce(round(CASE WHEN tot > 0 THEN dup::DOUBLE / tot
                 ELSE 0.0 END, 6), 0.0) AS dup_line_frac,
  coalesce(round(CASE WHEN tot_chars > 0 THEN dup_chars::DOUBLE / tot_chars
                 ELSE 0.0 END, 6), 0.0) AS dup_line_char_frac
FROM corpus c LEFT JOIN per_doc USING (doc_id)
""",
        # composite pipeline: gopher keep -> min-id exact dedup ->
        # strict next-fit packing, replayed stage by stage
        "curation_e2e": f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 90000, text FROM documents WHERE doc_id < 20
  UNION ALL
  SELECT 95000 + i, 'spam spam spam spam spam spam' AS text
  FROM range(10) AS r(i)
),
toks0 AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM corpus
),
uni AS (SELECT doc_id, 1 AS n, u.g AS gram FROM toks0, unnest(tk) AS u(g)),
tri AS (
  SELECT doc_id, 3 AS n, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS gram
  FROM toks0, unnest(range(1, len(tk)-1)) AS r(i)
),
grams AS (SELECT * FROM uni UNION ALL SELECT * FROM tri),
per_gram AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM grams GROUP BY ALL
),
per_doc AS (
  SELECT doc_id,
    coalesce(sum(cnt) FILTER (n = 1), 0) AS tot1,
    coalesce(max(cnt) FILTER (n = 1), 0) AS top1,
    coalesce(sum(cnt) FILTER (n = 3), 0) AS tot3,
    coalesce(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) FILTER (n = 3), 0)
      AS dup3
  FROM per_gram GROUP BY doc_id
),
stats AS (
  SELECT t.doc_id,
    len(tk) AS tc,
    CASE WHEN len(tk) > 0
         THEN list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
         ELSE 0.0 END AS atl,
    len(regexp_extract_all(text, '[.,!?;:]')) AS punct,
    coalesce(round(CASE WHEN tot1 > 0 THEN top1::DOUBLE / tot1
                   ELSE 0.0 END, 6), 0.0) AS uni_frac,
    coalesce(round(CASE WHEN tot3 > 0 THEN dup3::DOUBLE / tot3
                   ELSE 0.0 END, 6), 0.0) AS tri_frac
  FROM toks0 t LEFT JOIN per_doc USING (doc_id)
),
kept AS (
  SELECT doc_id FROM stats
  WHERE (tc >= 5 AND tc <= 100000) AND (atl >= 2.0 AND atl <= 12.0)
    AND uni_frac <= 0.30 AND tri_frac <= 0.60
    AND punct::DOUBLE / greatest(tc, 1) <= 0.10
),
norm AS (
  SELECT d.doc_id,
    array_to_string(list_filter(
      string_split_regex(trim(lower(d.text)), '\\s+'), x -> x <> ''), ' ')
      AS norm
  FROM corpus d JOIN kept USING (doc_id)
),
reps AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY norm),
ptoks AS (
  SELECT t.doc_id, (t.doc_id % 8)::INT AS bucket,
         len(t.tk)::BIGINT AS n_tokens
  FROM toks0 t JOIN reps USING (doc_id)
),
seq AS (
  SELECT doc_id, bucket, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM ptoks
),
packed AS (
  SELECT bucket, rn, doc_id, n_tokens, 0::BIGINT AS pack_id,
         n_tokens AS fill
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.bucket, s.rn, s.doc_id, s.n_tokens,
         CASE WHEN p.fill > 0 AND p.fill + s.n_tokens > 200
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.fill > 0 AND p.fill + s.n_tokens > 200
              THEN s.n_tokens ELSE p.fill + s.n_tokens END
  FROM seq s JOIN packed p ON s.bucket = p.bucket AND s.rn = p.rn + 1
)
SELECT doc_id, bucket, pack_id, n_tokens FROM packed
""",
        "pack_strict": f"""
WITH RECURSIVE toks AS (
  -- 32 = the operator's auto-sized bucket count at every test scale
  -- (max(32, ceil(rows / 250k)))
  SELECT doc_id, (doc_id % 32)::INT AS bucket,
         len({_TOKS})::BIGINT AS n_tokens
  FROM documents
),
seq AS (
  SELECT doc_id, bucket, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM toks
),
packed AS (
  SELECT bucket, rn, doc_id, n_tokens, 0::BIGINT AS pack_id,
         n_tokens AS fill
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.bucket, s.rn, s.doc_id, s.n_tokens,
         -- fill > 0 replays the exact greedy: an empty pack accepts
         -- its first doc even when oversized (matches the Spark
         -- operator's zero-token-prefix behavior)
         CASE WHEN p.fill > 0 AND p.fill + s.n_tokens > 200
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.fill > 0 AND p.fill + s.n_tokens > 200
              THEN s.n_tokens ELSE p.fill + s.n_tokens END
  FROM seq s JOIN packed p ON s.bucket = p.bucket AND s.rn = p.rn + 1
)
SELECT doc_id, bucket, pack_id, n_tokens FROM packed
""",
        "redact_pii": r"""
WITH p AS (
  SELECT doc_id, text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS pe,
    '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b' AS pi,
    '\+?[0-9][0-9()\-\s]{7,}[0-9]' AS pp
  FROM documents
),
s1 AS (
  SELECT doc_id, pi, pp,
    len(regexp_extract_all(text, pe))::BIGINT AS n_email,
    regexp_replace(text, pe, '[EMAIL]', 'g') AS t1
  FROM p
),
s2 AS (
  SELECT doc_id, pp, n_email,
    len(regexp_extract_all(t1, pi))::BIGINT AS n_ipv4,
    regexp_replace(t1, pi, '[IPV4]', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
    len(regexp_extract_all(t2, pp))::BIGINT AS n_phone,
    regexp_replace(t2, pp, '[PHONE]', 'g') AS text_redacted
  FROM s2
)
SELECT doc_id, text_redacted, n_email, n_ipv4, n_phone,
  (n_email + n_ipv4 + n_phone)::BIGINT AS n_pii
FROM s3
""",
        "corpus_summary": f"""
WITH t AS (
  SELECT lang, source, text, {_TOKS} AS tk FROM documents
),
a AS (
  SELECT lang, source,
    count(*)::BIGINT AS n_docs,
    sum(len(tk))::BIGINT AS n_tokens,
    sum(length(text))::BIGINT AS n_chars,
    sum(coalesce(list_sum(list_transform(tk, x -> len(x))), 0))::BIGINT
      AS tok_chars,
    min(length(text))::BIGINT AS min_chars,
    max(length(text))::BIGINT AS max_chars
  FROM t GROUP BY lang, source
)
SELECT lang, source, n_docs, n_tokens, n_chars,
  round(n_tokens::DOUBLE / n_docs, 6) AS avg_tokens,
  round(CASE WHEN n_tokens > 0
        THEN tok_chars::DOUBLE / n_tokens ELSE 0.0 END, 6)
    AS avg_token_len,
  min_chars, max_chars
FROM a
""",
        "mixture_weights": f"""
WITH t AS (
  SELECT lang, len({_TOKS})::BIGINT AS ntok FROM documents
),
g AS (
  SELECT lang, sum(ntok)::BIGINT AS n_tokens FROM t GROUP BY lang
),
s AS (
  SELECT lang, n_tokens,
    CASE lang WHEN 'de' THEN 0.2 WHEN 'en' THEN 0.4
              WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.2
              ELSE 0.0 END AS target_share
  FROM g
),
b AS (
  SELECT min(n_tokens::DOUBLE / target_share) AS budget
  FROM s WHERE target_share > 0
)
SELECT lang, n_tokens, target_share,
  round(CASE WHEN target_share > 0 AND n_tokens > 0
        THEN least(1.0, target_share * b.budget / n_tokens::DOUBLE)
        ELSE 0.0 END, 6) AS frac
FROM s CROSS JOIN b
""",
        "asof_join": """
WITH l AS (
  SELECT event_id, ts, user_id, value FROM events
  WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, value, event_id FROM events
  WHERE event_type = 'purchase'
)
SELECT l.event_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       l.user_id, l.value,
       coalesce(strftime(m.ts, '%Y-%m-%d %H:%M:%S.%f'), '') AS ts_r,
       m.value AS value_r
FROM l LEFT JOIN LATERAL (
  SELECT ts, value FROM r
  WHERE r.user_id = l.user_id AND r.ts <= l.ts
  ORDER BY ts DESC, event_id DESC LIMIT 1
) m ON true
""",
        "range_join": """
WITH s AS (
  SELECT event_id AS signup_id, user_id, ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT s.signup_id, s.user_id,
       strftime(s.start_ts, '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS pt_ts,
       p.value AS pt_value
FROM s JOIN p
  ON s.user_id = p.user_id
 AND p.ts >= s.start_ts AND p.ts <= s.end_ts
""",
        "dup_rate_by_source": """
WITH fp AS (
  SELECT source,
    md5(array_to_string(
      list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> x <> ''), ' ')) AS f
  FROM documents
),
per AS (SELECT source, f, count(*) AS n FROM fp GROUP BY source, f)
SELECT source,
  sum(n)::BIGINT AS n_docs,
  count(*)::BIGINT AS n_unique,
  round((sum(n) - count(*))::DOUBLE / sum(n), 6) AS dup_rate
FROM per GROUP BY source
""",
        "dup_spans": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT * FROM (VALUES
    (98000, 'qq ww ee rr tt yy uu ii oo aa bb cc'),
    (98001, 'qq ww ee rr tt yy uu ii oo zz'),
    (98002, 'too short for spans')) v(doc_id, text)
),
tk AS (SELECT doc_id, {_LTOKS} AS toks FROM corpus),
spans AS (
  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
  FROM tk, LATERAL (
    SELECT unnest(generate_series(1, len(toks) - 7)) AS i
  ) g
  WHERE len(toks) >= 8
),
per AS (SELECT doc_id, gram, count(*) AS pc FROM spans GROUP BY 1, 2),
d AS (SELECT gram FROM per GROUP BY gram HAVING count(*) >= 2),
dup AS (
  SELECT p.doc_id, sum(p.pc)::BIGINT AS ds
  FROM per p JOIN d USING (gram) GROUP BY 1
),
base AS (
  SELECT doc_id, greatest(len(toks) - 7, 0)::BIGINT AS n_spans FROM tk
)
SELECT b.doc_id, b.n_spans,
  COALESCE(u.ds, 0)::BIGINT AS dup_spans,
  CASE WHEN b.n_spans > 0
    THEN floor(COALESCE(u.ds, 0)::DOUBLE / b.n_spans * 1e6 + 0.5) / 1e6
    ELSE 0.0 END AS dup_span_frac
FROM base b LEFT JOIN dup u USING (doc_id)
""",
        "dup_span_removal": f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT * FROM (VALUES
    (98000, 'qq ww ee rr tt yy uu ii oo aa bb cc'),
    (98001, 'qq ww ee rr tt yy uu ii oo zz'),
    (98002, 'too short for spans')) v(doc_id, text)
),
tk AS (SELECT doc_id, {_LTOKS} AS toks FROM corpus),
pos AS (
  SELECT doc_id, i - 1 AS p, array_to_string(toks[i:i+7], ' ') AS gram
  FROM tk, LATERAL (
    SELECT unnest(generate_series(1, len(toks) - 7)) AS i
  ) g
  WHERE len(toks) >= 8
),
dg AS (SELECT DISTINCT doc_id, gram FROM pos),
meta AS (
  SELECT doc_id, gram,
         count(*) OVER (PARTITION BY gram) AS nd,
         min(doc_id) OVER (PARTITION BY gram) AS keeper
  FROM dg
),
droppers AS (
  SELECT doc_id, gram FROM meta WHERE nd >= 2 AND doc_id <> keeper
),
rem AS (
  SELECT p.doc_id, p.p FROM pos p JOIN droppers d USING (doc_id, gram)
),
tok AS (
  SELECT doc_id, i - 1 AS ti, toks[i] AS tok
  FROM tk, LATERAL (
    SELECT unnest(generate_series(1, len(toks))) AS i
  ) u
),
kept AS (
  SELECT t.doc_id, t.ti, t.tok
  FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM rem r
    WHERE r.doc_id = t.doc_id AND t.ti BETWEEN r.p AND r.p + 7
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
base AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM tk)
SELECT b.doc_id, COALESCE(a.text, '') AS text, b.n_tokens,
       (b.n_tokens - COALESCE(a.n_kept, 0))::BIGINT AS n_removed
FROM base b LEFT JOIN agg a USING (doc_id)
""",
        # hybrid facade over the post-remove survivor corpus: BM25
        # statistics after save -> append -> remove equal a rebuild on
        # survivors BIT-FOR-BIT (keyword.bm25_remove_stats), so the
        # oracle simply scores survivors directly.  Each list selects
        # its top-C on unrounded scores (the operators' internal
        # ranking) and RANKS on round(s, 6) with ascending-id ties
        # (the facade's cross-engine determinism contract); <= 2 RRF
        # contributions per doc, so the float sum is order-free
        # (commutativity, single addition).
        "facade_hybrid_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_scored_cte(_BM25_TERMS, table="sdocs")},
lex AS (SELECT doc_id, s FROM bm25 WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lex),
{_embed_cte(table="sdocs")},
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s FROM emb CROSS JOIN q),
vtop AS (SELECT doc_id, s FROM vsc WHERE s > 0.0
         ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM vr
)
SELECT doc_id, round(sum(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""",
        # batch lexical serving: the batch operator's per-query scores
        # equal the single face's (same float64 tree, same term-order
        # fold), replayed by _bm25_batch_cte
        "bm25_batch": f"""
WITH {_bm25_batch_cte(_BM25_BATCH_CASES)}
SELECT query_id::BIGINT AS query_id, doc_id, round(s, 6) AS score, rank
FROM branked WHERE rank <= 8
""",
        # whole-batch hybrid retrieval over the post-remove survivor
        # corpus: per-query top-C on unrounded scores (the operators'
        # internal selection), ranks on round(s, 6) with ascending-id
        # ties (the facade's determinism contract), <= 2 RRF
        # contributions per (query, doc) so the float sum is
        # order-free; final per-query top-10 on the unrounded RRF sum
        # (rrf_fuse ranks unrounded, rounds for output).
        "facade_hybrid_batch_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_batch_cte(sorted(_HYB_BATCH_TERMS.items()), table="sdocs")},
lextop AS (SELECT query_id, doc_id, s FROM branked WHERE rank <= {_RRF_C}),
lexr AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lextop),
{_embed_cte(table="sdocs")},
qv AS (SELECT doc_id AS query_id, e AS qvec FROM emb
       WHERE doc_id IN ({", ".join(str(i) for i in sorted(_HYB_BATCH_TERMS))})),
vsc AS (SELECT q.query_id, emb.doc_id, {_cos("emb.e", "q.qvec")} AS s
        FROM emb CROSS JOIN qv q),
vru AS (SELECT query_id, doc_id, s,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS ru
        FROM vsc WHERE s > 0.0),
vtop AS (SELECT query_id, doc_id, s FROM vru WHERE ru <= {_RRF_C}),
vr AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM vr
),
fused AS (SELECT query_id, doc_id, sum(c) AS sc
          FROM contrib GROUP BY query_id, doc_id),
fr AS (SELECT query_id, doc_id, sc,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY sc DESC, doc_id) AS rn
       FROM fused)
SELECT query_id::BIGINT AS query_id, doc_id, round(sc, 6) AS score
FROM fr WHERE rn <= 10
""",
        # vector-only batch text face: each raw query string's
        # canonical lowercase form rides a negative-id aug row through
        # the SAME md5 embed CTE as the corpus (the distributed
        # Arrow-batched query embedding must equal it bit-for-bit),
        # then per-query exact cosine top-10 over the embedded
        # survivor corpus
        "facade_text_batch_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
aug AS (SELECT doc_id, text FROM sdocs
        UNION ALL SELECT -1, 'merge hash spark'
        UNION ALL SELECT -2, 'window agg table'
        UNION ALL SELECT -3, 'scan parquet files quickly'),
{_embed_cte(table="aug")},
qv AS (SELECT (-1 - doc_id)::BIGINT AS query_id, e AS qvec
       FROM emb WHERE doc_id < 0),
corpus AS (SELECT doc_id AS vec_id, e FROM emb WHERE doc_id >= 0),
vsc AS (SELECT q.query_id, c.vec_id, {_cos("c.e", "q.qvec")} AS s
        FROM corpus c CROSS JOIN qv q),
ranked AS (SELECT query_id, vec_id, s,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, vec_id) AS rn
           FROM vsc WHERE s > 0.0)
SELECT query_id, vec_id, round(s, 6) AS score
FROM ranked WHERE rn <= 10
""",
        # cross-encoder rerank: candidates = BM25 top-C on unrounded
        # scores; the hash_cross stub score is EXACTLY the cosine of
        # the two texts' md5-hash embeddings (same float64 left-fold),
        # which _embed_cte already materializes for every doc — the
        # query text IS doc 0's text, so its embedding is emb[0]
        "cross_rerank": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)},
cand AS (SELECT doc_id FROM bm25 WHERE s > 0
         ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
{_embed_cte()},
q AS (SELECT e AS qv FROM emb WHERE doc_id = 0),
scored AS (SELECT c.doc_id, {_cos("emb.e", "qv")} AS s
           FROM cand c JOIN emb ON emb.doc_id = c.doc_id CROSS JOIN q)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
""",
        # best window-of-8: per-start hit counts over 1-based
        # inclusive list slices; list_position = FIRST maximal start
        # (the operator's array_position), so earliest-span ties match
        "snippets": f"""
WITH tkt AS (SELECT doc_id, {_LTOKS} AS tk FROM documents),
sc AS (SELECT doc_id, tk,
              list_transform(generate_series(1, greatest(1, len(tk) - 7)),
                s -> len(list_filter(tk[s : s + 7],
                         x -> list_contains({_BM25_TERMS!r}, x)))) AS scores
       FROM tkt),
pick AS (SELECT doc_id, tk,
                list_aggregate(scores, 'max') AS best,
                list_position(scores, list_aggregate(scores, 'max')) AS pos
         FROM sc)
SELECT doc_id, best::BIGINT AS n_hits, pos::BIGINT AS start,
       array_to_string(tk[pos : pos + 7], ' ') AS snippet
FROM pick WHERE best > 0
""",
        # PRF expansion: feedback = BM25 top-10 on unrounded scores;
        # score = (distinct-doc count within feedback) x corpus idf
        "prf_expand": f"""
WITH {_bm25_scored_cte(_BM25_TERMS)},
fb AS (SELECT doc_id FROM bm25 WHERE s > 0
       ORDER BY s DESC, doc_id LIMIT 10),
ftk AS (SELECT doc_id, {_LTOKS} AS tk
        FROM fb JOIN documents USING (doc_id)),
fdf AS (SELECT term, count(*)::DOUBLE AS dffb
        FROM (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM ftk)
        WHERE term NOT IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
        GROUP BY term),
cdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM (SELECT doc_id, unnest(tk) AS term
              FROM (SELECT doc_id, {_LTOKS} AS tk FROM documents))
        GROUP BY term),
cst AS (SELECT count(*)::DOUBLE AS n FROM documents),
priced AS (SELECT f.term,
                  f.dffb * ln(1.0 + (n - COALESCE(c.df, 0.0) + 0.5)
                                    / (COALESCE(c.df, 0.0) + 0.5)) AS score
           FROM fdf f CROSS JOIN cst LEFT JOIN cdf c USING (term))
SELECT term, round(score, 6) AS score FROM priced
ORDER BY score DESC, term LIMIT 8
""",
        # text-in hybrid: the raw string 'Merge  HASH spark' tokenizes
        # to exactly _BM25_TERMS and its hash embedding equals the
        # canonical literal's (lowercase + \\s+ split inside the
        # embedder), replayed by unioning a -1 row into the embed CTE
        "facade_hybrid_text_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_scored_cte(_BM25_TERMS, table="sdocs")},
lex AS (SELECT doc_id, s FROM bm25 WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lex),
aug AS (SELECT doc_id, text FROM sdocs
        UNION ALL SELECT -1, 'merge hash spark'),
{_embed_cte(table="aug")},
q AS (SELECT e AS qv FROM emb WHERE doc_id = -1),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s
        FROM emb CROSS JOIN q WHERE emb.doc_id >= 0),
vtop AS (SELECT doc_id, s FROM vsc WHERE s > 0.0
         ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM vr
)
SELECT doc_id, round(sum(c), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 10
""",
        # retrieve -> PRF-expand -> fuse -> highlight, end to end:
        # expansion recomputed in SQL (feedback = churned-stats BM25
        # top-10 over survivors; terms scored dffb x corpus idf, top-5
        # unrounded), the lexical leg refolds per-term contributions
        # LEFT TO RIGHT in [original..expanded] position order (the
        # indexed operator's + chain == the 0.0-init fold for
        # non-negative contributions), vector leg = raw query
        # embedding via the -1 aug row, RRF as the single facade, and
        # snippets = earliest maximal window-of-8 against the FINAL
        # term list ('' / 0 for hits with no term anywhere)
        "facade_hybrid_prf_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_scored_cte(_BM25_TERMS, table="sdocs")},
fb AS (SELECT doc_id FROM bm25 WHERE s > 0
       ORDER BY s DESC, doc_id LIMIT 10),
ftk AS (SELECT doc_id, {_LTOKS} AS tk FROM fb JOIN sdocs USING (doc_id)),
fdf AS (SELECT term, count(*)::DOUBLE AS dffb
        FROM (SELECT doc_id, unnest(list_distinct(tk)) AS term FROM ftk)
        WHERE term NOT IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
        GROUP BY term),
dtoks AS (SELECT doc_id, {_LTOKS} AS tk FROM sdocs),
cdf AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
        FROM (SELECT doc_id, unnest(tk) AS term FROM dtoks)
        GROUP BY term),
cst AS (SELECT count(*)::DOUBLE AS n FROM sdocs),
expt AS (SELECT f.term,
                f.dffb * ln(1.0 + (n - COALESCE(c.df, 0.0) + 0.5)
                                  / (COALESCE(c.df, 0.0) + 0.5)) AS score
         FROM fdf f CROSS JOIN cst LEFT JOIN cdf c USING (term)
         ORDER BY score DESC, term LIMIT 5),
qt AS (
  {" UNION ALL ".join(f"SELECT {i} AS pos, '{t}' AS term"
                      for i, t in enumerate(_BM25_TERMS))}
  UNION ALL
  SELECT {len(_BM25_TERMS) - 1} + row_number()
           OVER (ORDER BY score DESC, term) AS pos, term
  FROM expt
),
dbase AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM dtoks),
dstat AS (SELECT count(*)::DOUBLE AS n2, avg(dl) AS avgdl FROM dbase),
dpriced AS (SELECT q.pos, q.term,
                   ln(1.0 + (s.n2 - COALESCE(c.df, 0.0) + 0.5)
                            / (COALESCE(c.df, 0.0) + 0.5)) AS idf
            FROM qt q CROSS JOIN dstat s LEFT JOIN cdf c USING (term)),
dcontrib AS (SELECT b.doc_id, p.pos, p.idf, b.dl,
                    len(list_filter(b.tk, x -> x = p.term))::DOUBLE AS tf
             FROM dbase b CROSS JOIN dpriced p),
dsum AS (SELECT doc_id,
                list_reduce(list_prepend(0.0::DOUBLE,
                  list(idf * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       ORDER BY pos)),
                  (a, x) -> a + x) AS s
         FROM dcontrib CROSS JOIN dstat GROUP BY doc_id),
lex AS (SELECT doc_id, s FROM dsum WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lex),
aug AS (SELECT doc_id, text FROM sdocs
        UNION ALL SELECT -1, 'merge hash spark'),
{_embed_cte(table="aug")},
q AS (SELECT e AS qv FROM emb WHERE doc_id = -1),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s
        FROM emb CROSS JOIN q WHERE emb.doc_id >= 0),
vtop AS (SELECT doc_id, s FROM vsc WHERE s > 0.0
         ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM vr
),
fused AS (SELECT doc_id, round(sum(c), 6) AS score
          FROM contrib GROUP BY doc_id
          ORDER BY score DESC, doc_id LIMIT 10),
tlist AS (SELECT list(term ORDER BY pos) AS tl FROM qt),
stoks AS (SELECT f.doc_id, f.score, d.tk
          FROM fused f JOIN dtoks d USING (doc_id)),
ssc AS (SELECT doc_id, score, tk,
               list_transform(generate_series(1, greatest(1, len(tk) - 7)),
                 w -> len(list_filter(tk[w : w + 7],
                          x -> list_contains(tl, x)))) AS scores
        FROM stoks CROSS JOIN tlist),
pick AS (SELECT doc_id, score, tk,
                list_aggregate(scores, 'max') AS best,
                list_position(scores, list_aggregate(scores, 'max')) AS pos
         FROM ssc)
SELECT doc_id, score,
       (CASE WHEN best > 0 THEN pos ELSE 0 END)::BIGINT AS start,
       CASE WHEN best > 0 THEN array_to_string(tk[pos : pos + 7], ' ')
            ELSE '' END AS snippet
FROM pick
""",
        # batch PRF loop: per-query feedback from the batch BM25 CTE
        # (branked, rank <= 10), per-query top-5 expansion terms
        # (feedback-df x corpus idf), each query's lexical leg refolded
        # with its ORIGINAL + expansion terms in position order, vector
        # leg = md5-hash embedding of each raw query string (aug rows),
        # RRF per query, snippets against each query's final term list
        "facade_hybrid_prf_batch_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_batch_cte(sorted(_HYB_BATCH_TERMS.items()), table="sdocs")},
fb AS (SELECT query_id, doc_id FROM branked WHERE rank <= 10),
ftk AS (SELECT f.query_id, f.doc_id, b.tk
        FROM fb f JOIN qbtoks b USING (doc_id)),
fdf AS (SELECT query_id, term, count(*)::DOUBLE AS dffb
        FROM (SELECT query_id, doc_id,
                     unnest(list_distinct(tk)) AS term FROM ftk) u
        WHERE NOT EXISTS (SELECT 1 FROM qt o
                          WHERE o.query_id = u.query_id
                            AND o.term = u.term)
        GROUP BY query_id, term),
expt AS (
  SELECT query_id, term, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, term) AS rn
  FROM (SELECT f.query_id, f.term,
               f.dffb * ln(1.0 + (c.n - COALESCE(d.df, 0.0) + 0.5)
                                 / (COALESCE(d.df, 0.0) + 0.5)) AS score
        FROM fdf f CROSS JOIN qcstat c LEFT JOIN qdfs d USING (term))
  QUALIFY rn <= 5
),
qorig(query_id, npos) AS (VALUES {", ".join(
    f"({qid}, {len(terms)})"
    for qid, terms in sorted(_HYB_BATCH_TERMS.items())
)}),
qt2 AS (
  SELECT query_id, pos, term FROM qt
  UNION ALL
  SELECT e.query_id, o.npos - 1 + e.rn AS pos, e.term
  FROM expt e JOIN qorig o USING (query_id)
),
dpriced AS (SELECT q.query_id, q.pos, q.term,
                   ln(1.0 + (c.n - COALESCE(d.df, 0.0) + 0.5)
                            / (COALESCE(d.df, 0.0) + 0.5)) AS idf
            FROM qt2 q CROSS JOIN qcstat c
            LEFT JOIN qdfs d ON d.term = q.term),
dcontrib AS (SELECT p.query_id, b.doc_id, p.pos, p.idf, b.dl,
                    len(list_filter(b.tk, x -> x = p.term))::DOUBLE AS tf
             FROM qbase b CROSS JOIN dpriced p),
dsum AS (SELECT query_id, doc_id,
                list_reduce(list_prepend(0.0::DOUBLE,
                  list(idf * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       ORDER BY pos)),
                  (a, x) -> a + x) AS s
         FROM dcontrib CROSS JOIN qcstat GROUP BY query_id, doc_id),
lex AS (SELECT query_id, doc_id, s,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS r
        FROM dsum WHERE s > 0.0 QUALIFY r <= {_RRF_C}),
lexr AS (SELECT query_id, doc_id,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lex),
aug AS (SELECT doc_id, text FROM sdocs
        {" ".join(
            f"UNION ALL SELECT {-(i + 1)}, '{' '.join(terms)}'"
            for i, (qid, terms) in enumerate(sorted(_HYB_BATCH_TERMS.items()))
        )}),
{_embed_cte(table="aug")},
qmapv(query_id, aug_id) AS (VALUES {", ".join(
    f"({qid}, {-(i + 1)})"
    for i, (qid, terms) in enumerate(sorted(_HYB_BATCH_TERMS.items()))
)}),
qvec AS (SELECT m.query_id, e.e AS qe
         FROM qmapv m JOIN emb e ON e.doc_id = m.aug_id),
vsc AS (SELECT q.query_id, emb.doc_id, {_cos("emb.e", "q.qe")} AS s
        FROM emb CROSS JOIN qvec q WHERE emb.doc_id >= 0),
vru AS (SELECT query_id, doc_id, s,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id) AS ru
        FROM vsc WHERE s > 0.0),
vtop AS (SELECT query_id, doc_id, s FROM vru WHERE ru <= {_RRF_C}),
vr AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60.0 + rank) AS c FROM vr
),
fused0 AS (SELECT query_id, doc_id, sum(c) AS sc
           FROM contrib GROUP BY query_id, doc_id),
fused AS (SELECT query_id, doc_id, round(sc, 6) AS score
          FROM fused0
          QUALIFY row_number() OVER (PARTITION BY query_id
                                     ORDER BY sc DESC, doc_id) <= 10),
tlist AS (SELECT query_id, list(term ORDER BY pos) AS tl
          FROM qt2 GROUP BY query_id),
stoks AS (SELECT f.query_id, f.doc_id, f.score, d.tk
          FROM fused f JOIN qbtoks d USING (doc_id)),
ssc AS (SELECT s.query_id, s.doc_id, s.score, s.tk,
               list_transform(generate_series(1, greatest(1, len(s.tk) - 7)),
                 w -> len(list_filter(s.tk[w : w + 7],
                          x -> list_contains(t.tl, x)))) AS scores
        FROM stoks s JOIN tlist t USING (query_id)),
pick AS (SELECT query_id, doc_id, score, tk,
                list_aggregate(scores, 'max') AS best,
                list_position(scores, list_aggregate(scores, 'max')) AS pos
         FROM ssc)
SELECT query_id::BIGINT AS query_id, doc_id, score,
       (CASE WHEN best > 0 THEN pos ELSE 0 END)::BIGINT AS start,
       CASE WHEN best > 0 THEN array_to_string(tk[pos : pos + 7], ' ')
            ELSE '' END AS snippet
FROM pick
""",
        # salted-cogroup IVF-PQ at the provably-exact budget: adaptive
        # probes every cell (k_cells=8), refine 64*k >= corpus, so the
        # salted face must equal brute-force batch top-10 exactly
        "ann_ivfpq_salted_exact": f"""
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
SELECT query_id, vec_id, round(s, 6) AS score
FROM ranked WHERE rank <= 10
""",
        # residual IVF-PQ at the provably-exact budget: identical
        # brute-force oracle — the residual encode/serve path must be
        # indistinguishable from exact at full probe + full refine
        "ann_ivfpq_residual_exact": f"""
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
SELECT query_id, vec_id, round(s, 6) AS score
FROM ranked WHERE rank <= 10
""",
        # OPQ gate: exact at its budget, so the oracle is brute-force
        # top-10 on the gate's own query slice (vec_id 3..5)
        "ann_ivfpq_opq_exact": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id >= 3 AND vec_id < 6
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
SELECT query_id, vec_id, round(s, 6) AS score
FROM ranked WHERE rank <= 10
""",
        # retrieve -> fuse -> cross-encoder rerank -> highlight: the
        # fused top-30 (unrounded fused score — the facade's cut) is
        # rescored by the stub cross-encoder (= cosine of the two
        # texts' md5-hash embeddings; the query's embedding is the -1
        # aug row), final order = cross score, snippets against the
        # raw query terms
        "facade_hybrid_rerank_gate": f"""
WITH sdocs AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 2),
{_bm25_scored_cte(_BM25_TERMS, table="sdocs")},
lex AS (SELECT doc_id, s FROM bm25 WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
lexr AS (SELECT doc_id,
                row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
         FROM lex),
aug AS (SELECT doc_id, text FROM sdocs
        UNION ALL SELECT -1, 'merge hash spark'),
{_embed_cte(table="aug")},
q AS (SELECT e AS qv FROM emb WHERE doc_id = -1),
vsc AS (SELECT emb.doc_id, {_cos("emb.e", "qv")} AS s
        FROM emb CROSS JOIN q WHERE emb.doc_id >= 0),
vtop AS (SELECT doc_id, s FROM vsc WHERE s > 0.0
         ORDER BY s DESC, doc_id LIMIT {_RRF_C}),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS rank
       FROM vtop),
contrib AS (
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM lexr
  UNION ALL
  SELECT doc_id, 1.0 / (60.0 + rank) AS c FROM vr
),
fused AS (SELECT doc_id, sum(c) AS fsc FROM contrib GROUP BY doc_id
          ORDER BY fsc DESC, doc_id LIMIT 30),
xsc AS (SELECT f.doc_id, {_cos("emb.e", "qv")} AS s
        FROM fused f JOIN emb ON emb.doc_id = f.doc_id CROSS JOIN q),
xtop AS (SELECT doc_id, s FROM xsc WHERE s IS NOT NULL
         ORDER BY s DESC, doc_id LIMIT 10),
stoks AS (SELECT t.doc_id, t.s, d.tk
          FROM xtop t
          JOIN (SELECT doc_id, {_LTOKS} AS tk FROM sdocs) d USING (doc_id)),
ssc AS (SELECT doc_id, s, tk,
               list_transform(generate_series(1, greatest(1, len(tk) - 7)),
                 w -> len(list_filter(tk[w : w + 7],
                          x -> list_contains({_BM25_TERMS!r}, x)))) AS scores
        FROM stoks),
pick AS (SELECT doc_id, s, tk,
                list_aggregate(scores, 'max') AS best,
                list_position(scores, list_aggregate(scores, 'max')) AS pos
         FROM ssc)
SELECT doc_id, round(s, 6) AS score,
       (CASE WHEN best > 0 THEN pos ELSE 0 END)::BIGINT AS start,
       CASE WHEN best > 0 THEN array_to_string(tk[pos : pos + 7], ' ')
            ELSE '' END AS snippet
FROM pick
""",
        # incremental near-dup vs the PERSISTED fingerprint index:
        # signatures/bands recomputed from text for BOTH sides (the
        # index stores exactly the text-derived SQL-safe family, so a
        # storage/append drift breaks equality), candidates = band
        # bucket join new-side x hist-side, verification = signature
        # agreement k/32 (exact rationals)
        "minhash_index_incremental": f"""
WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4),
newd AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id < 20 AND doc_id % 5 <> 4
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4
),
alln AS (SELECT * FROM hist UNION ALL SELECT * FROM newd),
{_shingle_cte(table="alln")},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s ->
      list_reduce(
        list_transform(generate_series(1, len(s)), i -> ord(s[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 31), i ->
      list_min(list_transform(h, x -> ((2*i+1) * x + 7919*i) % 2147483647))) AS s
  FROM hs
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
    list_reduce(
      list_prepend(0::BIGINT, s[b.b*4+1 : b.b*4+4]),
      (acc, x) -> (acc * 1000003 + x) % 2147483647) AS band_sig
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, h2.doc_id AS hist_id
  FROM bands a JOIN bands h2
    ON a.band_idx = h2.band_idx AND a.band_sig = h2.band_sig
  WHERE a.doc_id IN (SELECT doc_id FROM newd)
    AND h2.doc_id IN (SELECT doc_id FROM hist)
),
est AS (
  SELECT c.new_id, c.hist_id,
    round(len(list_filter(generate_series(1, 32),
                          i -> sn.s[i] = sh2.s[i]))::DOUBLE / 32, 6)
      AS est_jaccard
  FROM cand c
  JOIN sig sn ON sn.doc_id = c.new_id
  JOIN sig sh2 ON sh2.doc_id = c.hist_id
)
SELECT new_id, hist_id, est_jaccard FROM est WHERE est_jaccard >= 0.5
""",
        # retroactive index-only dedup: same signature/band CTEs over
        # the HISTORICAL slice, candidate pairs verified by signature
        # agreement >= 0.8, transitive closure as a recursive CTE,
        # min-id representative per component + singletons (docs with
        # no shingles were never indexable and are out of scope on
        # both sides)
        "minhash_index_groups": f"""
WITH RECURSIVE hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4
),
{_shingle_cte(table="hist").lstrip()},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s ->
      list_reduce(
        list_transform(generate_series(1, len(s)), i -> ord(s[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 31), i ->
      list_min(list_transform(h, x -> ((2*i+1) * x + 7919*i) % 2147483647))) AS s
  FROM hs
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
    list_reduce(
      list_prepend(0::BIGINT, s[b.b*4+1 : b.b*4+4]),
      (acc, x) -> (acc * 1000003 + x) % 2147483647) AS band_sig
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, bb.doc_id AS b_id
  FROM bands a JOIN bands bb
    ON a.band_idx = bb.band_idx AND a.band_sig = bb.band_sig
   AND a.doc_id < bb.doc_id
),
pairs AS (
  SELECT c.a_id, c.b_id
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id
  WHERE round(len(list_filter(generate_series(1, 32),
                              i -> sa.s[i] = sb.s[i]))::DOUBLE / 32, 6)
        >= 0.8
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id)
SELECT id AS doc_id FROM comp WHERE id = component
UNION ALL
SELECT doc_id FROM sig
WHERE doc_id NOT IN (SELECT id FROM comp)
""",
        # apply-the-sweep: keep set over the historical slice (same
        # signature/band/closure CTEs), then the probe batch matched
        # against ONLY the keepers — replays
        # save -> minhash_apply_groups -> minhash_match_index
        "minhash_apply_sweep": f"""
WITH RECURSIVE hist AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
),
newd AS (
  SELECT doc_id + 200000 AS doc_id, text FROM documents
  WHERE doc_id < 70 AND doc_id % 7 = 0
),
alln AS (SELECT * FROM hist UNION ALL SELECT * FROM newd),
{_shingle_cte(table="alln").lstrip()},
hs AS (
  SELECT doc_id, shingles,
    list_transform(shingles, s ->
      list_reduce(
        list_transform(generate_series(1, len(s)), i -> ord(s[i])::BIGINT),
        (acc, x) -> (acc * 131 + x) % 2147483647)) AS h
  FROM sh WHERE len(shingles) > 0
),
sig AS (
  SELECT doc_id,
    list_transform(generate_series(0, 31), i ->
      list_min(list_transform(h, x -> ((2*i+1) * x + 7919*i) % 2147483647))) AS s
  FROM hs
),
bands AS (
  SELECT doc_id, b.b AS band_idx,
    list_reduce(
      list_prepend(0::BIGINT, s[b.b*4+1 : b.b*4+4]),
      (acc, x) -> (acc * 1000003 + x) % 2147483647) AS band_sig
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS b) b
),
hcand AS (
  SELECT DISTINCT a.doc_id AS a_id, bb.doc_id AS b_id
  FROM bands a JOIN bands bb
    ON a.band_idx = bb.band_idx AND a.band_sig = bb.band_sig
   AND a.doc_id < bb.doc_id
  WHERE a.doc_id IN (SELECT doc_id FROM hist)
    AND bb.doc_id IN (SELECT doc_id FROM hist)
),
hpairs AS (
  SELECT c.a_id, c.b_id
  FROM hcand c
  JOIN sig sa ON sa.doc_id = c.a_id
  JOIN sig sb ON sb.doc_id = c.b_id
  WHERE round(len(list_filter(generate_series(1, 32),
                              i -> sa.s[i] = sb.s[i]))::DOUBLE / 32, 6)
        >= 0.8
),
edges AS (
  SELECT a_id AS s, b_id AS d FROM hpairs
  UNION SELECT b_id, a_id FROM hpairs
),
nodes AS (SELECT DISTINCT s AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.s, r.comp FROM edges e JOIN reach r ON e.d = r.id
),
comp AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
keep AS (
  SELECT id AS doc_id FROM comp WHERE id = component
  UNION ALL
  SELECT doc_id FROM sig
  WHERE doc_id NOT IN (SELECT id FROM comp)
    AND doc_id IN (SELECT doc_id FROM hist)
),
mcand AS (
  SELECT DISTINCT a.doc_id AS new_id, h2.doc_id AS hist_id
  FROM bands a JOIN bands h2
    ON a.band_idx = h2.band_idx AND a.band_sig = h2.band_sig
  WHERE a.doc_id IN (SELECT doc_id FROM newd)
    AND h2.doc_id IN (SELECT doc_id FROM keep)
),
est AS (
  SELECT c.new_id, c.hist_id,
    round(len(list_filter(generate_series(1, 32),
                          i -> sn.s[i] = sh2.s[i]))::DOUBLE / 32, 6)
      AS est_jaccard
  FROM mcand c
  JOIN sig sn ON sn.doc_id = c.new_id
  JOIN sig sh2 ON sh2.doc_id = c.hist_id
)
SELECT new_id, hist_id, est_jaccard FROM est WHERE est_jaccard >= 0.5
""",
        # batch cross-encoder rerank: batch BM25 candidate lists cut
        # at the operator's internal rank (unrounded score, id-asc
        # ties), pairwise stub scores = cosine of the md5-hash
        # embeddings of (query doc's text, candidate doc's text),
        # per-query top-10 on the unrounded cross score
        "cross_rerank_batch": f"""
WITH {_bm25_batch_cte(sorted(_HYB_BATCH_TERMS.items()))},
cand AS (SELECT query_id, doc_id FROM branked WHERE rank <= {_RRF_C}),
{_embed_cte()},
qv AS (SELECT doc_id AS query_id, e AS qvec FROM emb
       WHERE doc_id IN ({", ".join(str(i) for i in sorted(_HYB_BATCH_TERMS))})),
scored AS (SELECT c.query_id, c.doc_id, {_cos("emb.e", "q.qvec")} AS s
           FROM cand c
           JOIN emb ON emb.doc_id = c.doc_id
           JOIN qv q ON q.query_id = c.query_id),
rr AS (SELECT query_id, doc_id, s,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, doc_id) AS rn
       FROM scored)
SELECT query_id, doc_id, round(s, 6) AS score FROM rr WHERE rn <= 10
""",
    }
