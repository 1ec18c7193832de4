"""Unified ANN/lexical index maintenance facade (round-15 verdict
item 6): ``index.open(spark, path)`` auto-detects ivf / hnsw / pq /
ivf_pq / bm25 from the on-disk layout and dispatches append / remove /
compact / rebalance / health / refresh / gc / search to that kind's
faces — the maintenance analogue of ``search.search`` and
``neardup.open``."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark import index

DIM = 16
N = 400


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.RandomState(5)
    C = rng.randn(8, DIM)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = (C[rng.randint(0, 8, N)] + 0.05 * rng.randn(N, DIM)).astype(
        np.float32
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def _extra(spark, n=5, start=9000):
    rng = np.random.RandomState(99)
    return spark.createDataFrame(
        [(start + i, [float(x) for x in rng.randn(DIM)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )


class TestKindMatrix:
    def test_ivf(self, spark, embeddings, tmp_path):
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import save_ivf_index

        assigned, cents = ivf_build(embeddings, k_cells=4)
        path = str(tmp_path / "ivf")
        save_ivf_index(assigned, cents, path)
        idx = index.open(spark, path)
        assert idx.kind == "ivf"
        idx.append(_extra(spark))
        rep = idx.remove([9000, 9001])
        assert rep["removed_rows"] >= 2
        qv = embeddings.first()["embedding"]
        assert len(idx.search(qv, k=5, nprobe=4).collect()) == 5
        with pytest.raises(ValueError, match="refresh"):
            idx.refresh(embeddings)

    def test_hnsw(self, spark, embeddings, tmp_path):
        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.sources.vault import save_hnsw_index

        graph = hnsw_build_shards(embeddings, num_shards=2,
                                  ef_construction=40)
        path = str(tmp_path / "hnsw")
        save_hnsw_index(graph, path, m=16, metric="cosine")
        idx = index.open(spark, path)
        assert idx.kind == "hnsw"
        stats = idx.health()
        assert stats["num_shards"] == 2 and "m" in stats
        idx.append(_extra(spark), seed=3)
        idx.remove([9000])
        rep = idx.rebalance(target_rows_per_shard=100_000)
        assert "rebalanced" in rep or isinstance(rep, dict)
        with pytest.raises(ValueError, match="rebalance"):
            idx.compact()

    def test_pq(self, spark, embeddings, tmp_path):
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.sources.vault import save_pq_index

        model = pq_train(embeddings, m=8, ks=16, max_rows=N, seed=3)
        path = str(tmp_path / "pq")
        save_pq_index(pq_encode(embeddings, model), model, path)
        idx = index.open(spark, path)
        assert idx.kind == "pq"
        rep = idx.append(_extra(spark), batch_id=1)
        assert rep["appended_rows"] == 5 and rep["batch_mse"] is not None
        idx.remove([9000], batch_id=2)
        rep = idx.compact(target_rows_per_file=1, min_file_ratio=0.0)
        assert rep["compacted"] in (True, False)
        out = idx.refresh(
            embeddings.unionByName(_extra(spark)).filter(
                ~F.col("vec_id").isin([9000])
            ),
            seed=3,
        )
        assert out["reencoded_rows"] == N + 4
        gc_rep = idx.gc(keep_last_batches=1)
        assert "compacted" in gc_rep
        qv = embeddings.first()["embedding"]
        got = idx.search(qv, k=5, vectors=embeddings)
        assert len(got.collect()) == 5

    def test_ivf_pq(self, spark, embeddings, tmp_path):
        from astro_vectordb_spark.operators.pq import ivf_pq_build
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        enc, cents, model = ivf_pq_build(embeddings, k_cells=4, m=8,
                                         ks=16, max_rows=N, seed=3)
        path = str(tmp_path / "ivfpq")
        save_ivf_pq_index(enc, cents, model, path)
        idx = index.open(spark, path)
        assert idx.kind == "ivf_pq"
        rep = idx.append(_extra(spark), batch_id=1)
        assert rep["appended_rows"] == 5
        idx.remove([9000], batch_id=2)
        out = idx.refresh(
            embeddings.unionByName(_extra(spark)).filter(
                ~F.col("vec_id").isin([9000])
            ),
            seed=3,
        )
        assert out["reencoded_rows"] == N + 4

    def test_bm25(self, spark, tmp_path):
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.sources.vault import save_bm25_index

        docs = spark.createDataFrame(
            [(i, f"spark shuffle join plan row {i % 7}")
             for i in range(40)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "bm25")
        ts, cs = bm25_term_stats(docs.filter("doc_id < 30"))
        save_bm25_index(ts, cs, path)
        idx = index.open(spark, path)
        assert idx.kind == "bm25"
        rep = idx.append(docs.filter("doc_id >= 30"), batch_id=1)
        assert rep["appended_docs"] == 10
        rep2 = idx.remove(docs.filter("doc_id >= 35"), batch_id=2)
        assert rep2["removed_docs"] == 5
        with pytest.raises(ValueError, match="refresh|trained"):
            idx.refresh(docs)
        # lexical serving through the handle needs the corpus frame
        got = idx.search("spark shuffle", k=3, docs=docs).collect()
        assert len(got) == 3
        with pytest.raises(ValueError, match="docs="):
            idx.search("spark shuffle", k=3)


class TestStreamDispatch:
    def test_stream_ingest_and_remove_via_handle(self, spark, embeddings,
                                                 tmp_path):
        """One kind exercises each streaming dispatch (per-kind
        semantics are pinned by the streaming suites); unsupported
        kinds raise with the supported shape named."""
        import time

        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.sources.vault import (
            save_ivf_index,
            save_pq_index,
        )

        model = pq_train(embeddings, m=8, ks=16, max_rows=N, seed=3)
        path = str(tmp_path / "pq_stream")
        save_pq_index(pq_encode(embeddings, model), model, path)
        idx = index.open(spark, path)
        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "5")
            .load()
            .select(
                (F.col("value") + 900_000).alias("vec_id"),
                F.array(*[F.lit(float(i)) for i in range(DIM)]).alias(
                    "embedding"
                ),
            )
        )
        q = idx.stream_ingest(
            stream, checkpoint=str(tmp_path / "ckpt")
        )
        try:
            deadline = time.time() + 40
            while time.time() < deadline:
                time.sleep(3)
                if (q.lastProgress or {}).get("batchId", 0) >= 2:
                    break
        finally:
            q.stop()
        assert spark.read.parquet(path + "/codes").filter(
            F.col("vec_id") >= 900_000
        ).count() > 0
        # ivf has no ingest stream: the error names the alternative
        assigned, cents = ivf_build(embeddings, k_cells=4)
        ivf_path = str(tmp_path / "ivf_stream")
        save_ivf_index(assigned, cents, ivf_path)
        with pytest.raises(ValueError, match="foreachBatch"):
            index.open(spark, ivf_path).stream_ingest(stream)


class TestDetection:
    def test_non_index_path_raises(self, spark, embeddings, tmp_path):
        path = str(tmp_path / "plain")
        embeddings.write.parquet(path)
        with pytest.raises(ValueError, match="no maintained index"):
            index.open(spark, path)

    def test_neardup_index_rejected(self, spark, tmp_path):
        from astro_vectordb_spark.sources.vault import save_minhash_index

        docs = spark.createDataFrame(
            [(i, f"one two three four five six {i}") for i in range(20)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "mh")
        save_minhash_index(docs, path)
        with pytest.raises(ValueError, match="neardup"):
            index.open(spark, path)
