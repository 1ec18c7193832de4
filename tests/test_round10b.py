"""Round-10 second wave: skew-bounded salted cogroups on the IVF-PQ
batch face (``max_group_rows`` — a giant/hot cell can never become one
straggler task) and the cross-encoder stage in the hybrid text facade
(the full retrieve -> fuse -> RERANK -> highlight loop in one call)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

N, DIM = 900, 16


def _rows(df):
    return sorted(
        (int(r[0]), int(r[1]), round(float(r[2]), 6))
        for r in df.select("query_id", "vec_id", "score").collect()
    )


@pytest.fixture(scope="module")
def skewed(spark):
    """Clustered corpus with ONE dominant cluster: 60% of points sit
    on center 0, the rest spread over 7 others — after ivf_pq_build
    the dominant cell dwarfs its siblings, the exact shape salting
    exists for."""
    rng = np.random.RandomState(11)
    C = rng.normal(size=(8, DIM))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    which = np.where(np.arange(N) % 10 < 6, 0, np.arange(N) % 8)
    pts = (C[which] + 0.05 * rng.normal(size=(N, DIM))).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(N)],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    yield df, pts
    df.unpersist()


@pytest.fixture(scope="module")
def ivfpq(spark, skewed):
    from astro_vectordb_spark.operators.pq import ivf_pq_build

    df, _ = skewed
    encoded, cents, model = ivf_pq_build(
        df, k_cells=8, m=4, ks=16, max_rows=2_000
    )
    encoded = encoded.cache()
    encoded.count()
    yield encoded, cents, model
    encoded.unpersist()


@pytest.fixture(scope="module")
def queries(spark, skewed):
    _, pts = skewed
    # half the queries target the DOMINANT cluster -> a hot cell on
    # the query axis too
    qs = [(int(i), [float(x) for x in pts[i]]) for i in range(0, 40)]
    return spark.createDataFrame(
        qs, "query_id long, query_vec array<float>"
    )


class TestSaltedCogroup:
    def test_salted_equals_unsalted(self, spark, skewed, ivfpq, queries):
        from astro_vectordb_spark.operators.pq import (
            ivf_pq_batch_topk_cogrouped,
        )

        df, _ = skewed
        encoded, cents, model = ivfpq
        base = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=3, refine_factor=8,
        )
        salted = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=3, refine_factor=8, max_group_rows=50,
        )
        assert _rows(salted) == _rows(base)

    def test_salted_equals_unsalted_adaptive_and_filtered(
        self, spark, skewed, ivfpq, queries
    ):
        from astro_vectordb_spark.operators.pq import (
            ivf_pq_batch_topk_cogrouped,
        )

        df, _ = skewed
        encoded, cents, model = ivfpq
        allowed = [int(i) for i in range(0, N, 3)]
        base = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=None, refine_factor=8, allowed_ids=allowed, n_total=N,
        )
        salted = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=None, refine_factor=8, allowed_ids=allowed, n_total=N,
            max_group_rows=40,
        )
        assert _rows(salted) == _rows(base)

    def test_salt_counts_bound_group_sizes(self, spark, ivfpq):
        """The dominant cell must split into >1 sub-group and no
        sub-group may hold much more than max_group_rows (id-hash
        uniformity: allow 1.8x slack at these sizes)."""
        encoded, _, _ = ivfpq
        cap = 60
        counts = encoded.groupBy("cell_id").agg(
            F.count(F.lit(1)).alias("_cn")
        )
        salts = counts.select(
            "cell_id",
            F.greatest(
                F.lit(1), F.ceil(F.col("_cn") / F.lit(cap))
            ).cast("int").alias("_nsalt"),
        )
        big = counts.orderBy(F.col("_cn").desc()).first()
        assert int(big["_cn"]) > 300  # the skew is real
        salted = (
            encoded.join(salts, "cell_id")
            .withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.col("vec_id")), F.col("_nsalt")).cast(
                    "int"
                ),
            )
            .groupBy("cell_id", "_salt")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        mx = salted.agg(F.max("n")).first()[0]
        nsalt_big = salts.orderBy(F.col("_nsalt").desc()).first()["_nsalt"]
        assert nsalt_big > 1
        assert mx <= int(cap * 1.8)

    def test_facade_passthrough(self, spark, skewed, ivfpq, queries, tmp_path):
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        df, _ = skewed
        encoded, cents, model = ivfpq
        path = str(tmp_path / "idx")
        save_ivf_pq_index(encoded, cents, model, path)
        base = search_batch(
            spark, path, queries, k=5, vectors=df, refine_factor=8,
            nprobe=3,
        )
        salted = search_batch(
            spark, path, queries, k=5, vectors=df, refine_factor=8,
            nprobe=3, max_group_rows=50,
        )
        assert _rows(salted) == _rows(base)

    def test_precomputed_cell_counts(self, spark, skewed, ivfpq, queries):
        """cell_counts= (control-plane metadata) skips the counting
        job and still serves identically."""
        from astro_vectordb_spark.operators.pq import (
            ivf_pq_batch_topk_cogrouped,
        )

        df, _ = skewed
        encoded, cents, model = ivfpq
        counts = encoded.groupBy("cell_id").agg(
            F.count(F.lit(1)).alias("_cn")
        )
        base = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=3, refine_factor=8,
        )
        salted = ivf_pq_batch_topk_cogrouped(
            encoded, cents, df, queries, 5, model,
            nprobe=3, refine_factor=8, max_group_rows=50,
            cell_counts=counts,
        )
        assert _rows(salted) == _rows(base)


class TestHybridRerankFacade:
    @pytest.fixture(scope="class")
    def hybrid_paths(self, spark, tmp_path_factory):
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.sources.vault import save_bm25_index

        words = ["merge", "hash", "spark", "join", "scan", "sort", "row"]
        rows = [
            (
                i,
                " ".join(
                    words[(i + j) % len(words)] for j in range(3 + i % 5)
                ),
            )
            for i in range(80)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        root = tmp_path_factory.mktemp("hyb")
        vec_path = str(root / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.mode("overwrite").parquet(vec_path)
        bm25_path = str(root / "bm25")
        ts, cs = bm25_term_stats(docs)
        save_bm25_index(ts, cs, bm25_path)
        return vec_path, bm25_path, docs

    def test_rerank_equals_manual_composition(self, spark, hybrid_paths):
        from astro_vectordb_spark.operators.rerank import (
            cross_encoder_rerank,
        )
        from astro_vectordb_spark.search import (
            hybrid_search_text,
        )

        vec_path, bm25_path, docs = hybrid_paths
        got = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "merge hash",
            k=5, fetch_k=20, rerank=True, rerank_depth=15,
        )
        wide = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "merge hash",
            k=15, fetch_k=20,
        )
        cand = docs.join(wide.select("doc_id"), "doc_id", "left_semi")
        want = cross_encoder_rerank(cand, "merge hash", 5)
        assert [
            (int(r.doc_id), round(float(r.score), 6)) for r in got.collect()
        ] == [
            (int(r.doc_id), round(float(r.score), 6)) for r in want.collect()
        ]

    def test_rerank_reorders_vs_fusion(self, spark, hybrid_paths):
        """The cross stage must actually change the contract: scores
        are cross scores (cosine in [-1, 1]), not RRF sums."""
        from astro_vectordb_spark.search import hybrid_search_text

        vec_path, bm25_path, docs = hybrid_paths
        plain = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "merge hash", k=5, fetch_k=20
        ).collect()
        rr = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "merge hash",
            k=5, fetch_k=20, rerank=True, rerank_depth=15,
        ).collect()
        assert all(float(r.score) <= 1.0 for r in rr)
        # RRF sums live in (0, 2/61]; cross cosines on these corpora
        # are far larger — the score column provably switched meaning
        assert max(float(r.score) for r in rr) > max(
            float(r.score) for r in plain
        )

    def test_batch_rerank_equals_single(self, spark, hybrid_paths):
        """The batch face's rerank stage must match the single call's
        per query — embed + fuse + cross-score + per-query cut."""
        from astro_vectordb_spark.search import (
            hybrid_search_text,
            hybrid_search_text_batch,
        )

        vec_path, bm25_path, docs = hybrid_paths
        texts = ["merge hash", "join scan row", "sort spark"]
        qdf = spark.createDataFrame(
            list(enumerate(texts)), "query_id long, query_text string"
        )
        got = {
            (int(r.query_id), int(r.doc_id), round(float(r.score), 6))
            for r in hybrid_search_text_batch(
                spark, vec_path, bm25_path, docs, qdf,
                k=4, fetch_k=20, rerank=True, rerank_depth=12,
            ).collect()
        }
        want = set()
        for qid, t in enumerate(texts):
            for r in hybrid_search_text(
                spark, vec_path, bm25_path, docs, t,
                k=4, fetch_k=20, rerank=True, rerank_depth=12,
            ).collect():
                want.add((qid, int(r.doc_id), round(float(r.score), 6)))
        assert got == want

    def test_rerank_with_snippets_schema(self, spark, hybrid_paths):
        from astro_vectordb_spark.search import hybrid_search_text

        vec_path, bm25_path, docs = hybrid_paths
        out = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "merge hash",
            k=5, fetch_k=20, rerank=True, rerank_depth=15,
            snippets=True, snippet_window=4,
        )
        assert out.columns == ["doc_id", "score", "start", "snippet"]
        rows = out.collect()
        assert len(rows) == 5
        # every corpus doc contains a query term -> every snippet hits
        assert all(r.snippet for r in rows)
