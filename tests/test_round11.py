"""Round-11: batch PRF/snippets parity on the text facade, and the
batch PRF term-expansion operator itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def hybrid_paths(spark, tmp_path_factory):
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_term_stats
    from astro_vectordb_spark.sources.vault import save_bm25_index

    words = ["merge", "hash", "spark", "join", "scan", "sort", "row",
             "plan", "codegen", "shuffle"]
    rows = [
        (
            i,
            " ".join(
                words[(i * 3 + j) % len(words)] for j in range(4 + i % 6)
            ),
        )
        for i in range(90)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    root = tmp_path_factory.mktemp("hyb11")
    vec_path = str(root / "emb.parquet")
    embed_text(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).write.mode("overwrite").parquet(vec_path)
    bm25_path = str(root / "bm25")
    ts, cs = bm25_term_stats(docs)
    save_bm25_index(ts, cs, bm25_path)
    return vec_path, bm25_path, docs


TEXTS = ["merge hash", "join scan row", "sort spark codegen"]


def _qdf(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "query_id long, query_text string"
    )


class TestPrfExpandBatch:
    def test_batch_expansion_equals_single_per_query(
        self, spark, hybrid_paths
    ):
        from astro_vectordb_spark.operators.keyword import (
            prf_expand_terms,
            prf_expand_terms_batch,
        )
        from astro_vectordb_spark.sources.vault import load_bm25_index

        _, bm25_path, docs = hybrid_paths
        ts, cs = load_bm25_index(spark, bm25_path)
        queries = spark.createDataFrame(
            [(i, t.split()) for i, t in enumerate(TEXTS)],
            "query_id long, terms array<string>",
        )
        got = {
            (int(r.query_id), int(r.rank)): (r.term, float(r.score))
            for r in prf_expand_terms_batch(
                docs, ts, cs, queries, n_feedback=8, n_expand=4
            ).collect()
        }
        for qid, t in enumerate(TEXTS):
            single = prf_expand_terms(
                docs, ts, cs, t.split(), n_feedback=8, n_expand=4
            ).collect()
            assert len(single) > 0
            for rank, r in enumerate(single, start=1):
                assert got[(qid, rank)] == (r.term, float(r.score))
        assert len(got) == sum(
            len(
                prf_expand_terms(
                    docs, ts, cs, t.split(), n_feedback=8, n_expand=4
                ).collect()
            )
            for t in TEXTS
        )


class TestBatchFacadeOptionParity:
    """Each single-face option, mirrored on the batch face, must give
    per-query results identical to the single call (verdict item 8)."""

    def _single(self, spark, paths, **kw):
        from astro_vectordb_spark.search import hybrid_search_text

        vec_path, bm25_path, docs = paths
        want = set()
        for qid, t in enumerate(TEXTS):
            for r in hybrid_search_text(
                spark, vec_path, bm25_path, docs, t, k=4, fetch_k=20, **kw
            ).collect():
                row = [qid, int(r.doc_id), round(float(r.score), 6)]
                if "snippets" in kw:
                    row += [int(r.start), r.snippet]
                want.add(tuple(row))
        return want

    def _batch(self, spark, paths, **kw):
        from astro_vectordb_spark.search import hybrid_search_text_batch

        vec_path, bm25_path, docs = paths
        out = set()
        for r in hybrid_search_text_batch(
            spark, vec_path, bm25_path, docs, _qdf(spark),
            k=4, fetch_k=20, **kw,
        ).collect():
            row = [int(r.query_id), int(r.doc_id), round(float(r.score), 6)]
            if "snippets" in kw:
                row += [int(r.start), r.snippet]
            out.add(tuple(row))
        return out

    def test_prf_batch_equals_single(self, spark, hybrid_paths):
        kw = dict(prf=True, n_feedback=8, n_expand=3)
        assert self._batch(spark, hybrid_paths, **kw) == self._single(
            spark, hybrid_paths, **kw
        )

    def test_snippets_batch_equals_single(self, spark, hybrid_paths):
        kw = dict(snippets=True, snippet_window=4)
        got = self._batch(spark, hybrid_paths, **kw)
        assert got == self._single(spark, hybrid_paths, **kw)
        assert any(t[4] for t in got)  # snippets actually highlight

    def test_full_loop_batch_equals_single(self, spark, hybrid_paths):
        """PRF + rerank + snippets together: the whole retrieve ->
        expand -> fuse -> cross-score -> highlight loop, batch ==
        single per query."""
        kw = dict(
            prf=True, n_feedback=8, n_expand=3,
            rerank=True, rerank_depth=12,
            snippets=True, snippet_window=4,
        )
        assert self._batch(spark, hybrid_paths, **kw) == self._single(
            spark, hybrid_paths, **kw
        )

    def test_prf_changes_results(self, spark, hybrid_paths):
        """PRF must actually expand the lexical leg (not a no-op):
        expanded term lists change at least one query's hit set or
        scores on this corpus."""
        plain = self._batch(spark, hybrid_paths)
        prf = self._batch(spark, hybrid_paths, prf=True, n_feedback=8,
                          n_expand=3)
        assert plain != prf
