"""One-call search facade: kind detection + dispatch across all four
persisted index kinds plus the exact path (reference parity:
searchAstroDB, driver/driver.ts:290-307)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.topk import topk_search
from astro_vectordb_spark.search import detect_index_kind, search

N, DIM = 600, 32


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(5)
    C = rng.normal(size=(8, DIM))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    pts = (C[np.arange(N) % 8] + 0.05 * rng.normal(size=(N, DIM))).astype(
        np.float32
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(N)],
        "vec_id long, embedding array<float>",
    ).cache()
    df.count()
    yield df, pts
    df.unpersist()


@pytest.fixture(scope="module")
def qv(corpus):
    _, pts = corpus
    return [float(x) for x in pts[17]]


def _exact_ids(df, qv, k=10):
    return [r.vec_id for r in topk_search(df, qv, k, strength=0).collect()]


class TestFacade:
    def test_exact_path_plain_parquet(self, spark, corpus, qv, tmp_path):
        df, _ = corpus
        path = str(tmp_path / "plain")
        df.write.parquet(path)
        assert detect_index_kind(spark, path) == "exact"
        got = [r.vec_id for r in search(spark, path, qv, 10).collect()]
        assert got == _exact_ids(df, qv)

    def test_ivf_kind(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import save_ivf_index

        df, _ = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        path = str(tmp_path / "ivf")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path
        )
        assert detect_index_kind(spark, path) == "ivf"
        # adaptive probing (nprobe=None) on a clustered corpus: full
        # recall through the facade
        got = [r.vec_id for r in search(spark, path, qv, 10).collect()]
        exact = _exact_ids(df, qv)
        assert len(set(got) & set(exact)) >= 9

    def test_hnsw_kind(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.sources.vault import save_hnsw_index

        df, _ = corpus
        graph = hnsw_build_shards(df, num_shards=2, m=8, seed=11)
        path = str(tmp_path / "hnsw")
        save_hnsw_index(graph, path, m=8, metric="cosine")
        assert detect_index_kind(spark, path) == "hnsw"
        got = [r.vec_id for r in search(
            spark, path, qv, 10, ef_search=200
        ).collect()]
        exact = _exact_ids(df, qv)
        assert len(set(got) & set(exact)) >= 9

    def test_pq_kind_requires_vectors(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.sources.vault import save_pq_index

        df, _ = corpus
        model = pq_train(df, m=8, ks=32, metric="cosine", max_rows=N, seed=2)
        path = str(tmp_path / "pq")
        save_pq_index(pq_encode(df, model), model, path)
        assert detect_index_kind(spark, path) == "pq"
        with pytest.raises(ValueError, match="vectors"):
            search(spark, path, qv, 10)
        got = [r.vec_id for r in search(
            spark, path, qv, 10, vectors=df, refine_factor=16
        ).collect()]
        exact = _exact_ids(df, qv)
        assert len(set(got) & set(exact)) >= 9

    def test_ivf_pq_kind(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.pq import ivf_pq_build
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        df, _ = corpus
        encoded, cents, model = ivf_pq_build(
            df, k_cells=8, m=8, ks=16, max_rows=N
        )
        path = str(tmp_path / "ivfpq")
        save_ivf_pq_index(encoded, cents, model, path)
        assert detect_index_kind(spark, path) == "ivf_pq"
        got = [r.vec_id for r in search(
            spark, path, qv, 10, vectors=df, nprobe=4, refine_factor=16
        ).collect()]
        exact = _exact_ids(df, qv)
        assert len(set(got) & set(exact)) >= 8

    def test_allowed_ids_exact_and_pq(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.sources.vault import save_pq_index

        df, _ = corpus
        allowed = list(range(0, N, 3))
        plain = str(tmp_path / "plain_f")
        df.write.parquet(plain)
        got = [r.vec_id for r in search(
            spark, plain, qv, 5, allowed_ids=allowed
        ).collect()]
        assert got and all(v % 3 == 0 for v in got)

        model = pq_train(df, m=8, ks=32, metric="cosine", max_rows=N, seed=2)
        pqp = str(tmp_path / "pq_f")
        save_pq_index(pq_encode(df, model), model, pqp)
        got_pq = [r.vec_id for r in search(
            spark, pqp, qv, 5, vectors=df, allowed_ids=allowed,
            refine_factor=16,
        ).collect()]
        assert got_pq and all(v % 3 == 0 for v in got_pq)

    def test_allowed_ids_ivf_widens_probes(self, spark, corpus, qv, tmp_path):
        # r9: the IVF path supports filtered search — candidate rows are
        # restricted to the allowed set inside the probed cells, and the
        # probe count widens by 1/selectivity (a 1/3 filter probes ~3x
        # the cells), so recall on the allowed subset holds
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import save_ivf_index

        df, _ = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        path = str(tmp_path / "ivf_f")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path
        )
        allowed = list(range(0, N, 3))
        got = [r.vec_id for r in search(
            spark, path, qv, 5, allowed_ids=allowed, nprobe=2
        ).collect()]
        assert got and all(v % 3 == 0 for v in got)
        exact_allowed = [
            r.vec_id
            for r in topk_search(
                df.filter(F.col("vec_id") % 3 == 0), qv, 5, strength=0
            ).collect()
        ]
        assert len(set(got) & set(exact_allowed)) >= 4

    def test_allowed_ids_ivf_selective_10pct(self, spark, corpus, qv,
                                             tmp_path):
        # the verdict's recall check: a 10% allowed set — widening takes
        # the probe set to every cell, so the result EQUALS the exact
        # top-k over the allowed subset
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import save_ivf_index

        df, _ = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        path = str(tmp_path / "ivf_f10")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path
        )
        allowed = list(range(0, N, 10))
        got = [r.vec_id for r in search(
            spark, path, qv, 5, allowed_ids=allowed, nprobe=2
        ).collect()]
        exact_allowed = [
            r.vec_id
            for r in topk_search(
                df.filter(F.col("vec_id") % 10 == 0), qv, 5, strength=0
            ).collect()
        ]
        assert got == exact_allowed

    def test_allowed_ids_ivf_pq_widens_probes(self, spark, corpus, qv,
                                              tmp_path):
        # r9: the last kind gains filtered search — allowed candidates
        # restricted inside probed cells (before the ADC ranking), the
        # probe count widened by 1/selectivity; at 10% selectivity the
        # widening reaches every cell and with a refine budget >= the
        # allowed set the result EQUALS the filtered exact top-5
        from astro_vectordb_spark.operators.pq import ivf_pq_build
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        df, _ = corpus
        encoded, cents, model = ivf_pq_build(
            df, k_cells=8, m=8, ks=16, max_rows=N
        )
        path = str(tmp_path / "ivfpq_f")
        save_ivf_pq_index(encoded, cents, model, path)
        allowed = list(range(0, N, 10))
        got = [r.vec_id for r in search(
            spark, path, qv, 5, vectors=df, allowed_ids=allowed,
            nprobe=2, refine_factor=16,
        ).collect()]
        exact_allowed = [
            r.vec_id
            for r in topk_search(
                df.filter(F.col("vec_id") % 10 == 0), qv, 5, strength=0
            ).collect()
        ]
        assert got == exact_allowed

    def test_metric_comes_from_index_meta(self, spark, corpus, qv, tmp_path):
        # an index saved with euclidean serves euclidean even though the
        # facade's metric default is cosine — metric loss was a real
        # reference bug (hnsw.ts:794-810)
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import save_ivf_index

        df, _ = corpus
        assigned, cents = ivf_build(df, k_cells=4, metric="euclidean")
        path = str(tmp_path / "ivf_euc")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path,
            metric="euclidean",
        )
        exact = [
            r.vec_id
            for r in topk_search(df, qv, 10, strength=0, metric="euclidean")
            .collect()
        ]
        got = [r.vec_id for r in search(spark, path, qv, 10).collect()]
        assert len(set(got) & set(exact)) >= 9


class TestBatchFacade:
    def _queries(self, spark, corpus, qids=(3, 17, 40)):
        df, pts = corpus
        return spark.createDataFrame(
            [(int(q), [float(x) for x in pts[q]]) for q in qids],
            "query_id long, query_vec array<float>",
        )

    def test_exact_batch(self, spark, corpus, tmp_path):
        df, pts = corpus
        path = str(tmp_path / "b_plain")
        df.write.parquet(path)
        from astro_vectordb_spark.search import search_batch

        out = search_batch(spark, path, self._queries(spark, corpus), 10)
        pdf = out.toPandas()
        assert set(pdf.query_id) == {3, 17, 40}
        for q in (3, 17, 40):
            got = pdf[pdf.query_id == q].sort_values(
                "score", ascending=False
            ).vec_id.tolist()
            exact = _exact_ids(df, [float(x) for x in pts[q]])
            assert got == exact

    def test_hnsw_batch(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_hnsw_index

        df, pts = corpus
        graph = hnsw_build_shards(df, num_shards=2, m=8, seed=11)
        path = str(tmp_path / "b_hnsw")
        save_hnsw_index(graph, path, m=8, metric="cosine")
        out = search_batch(
            spark, path, self._queries(spark, corpus), 10, ef_search=200
        ).toPandas()
        for q in (3, 17, 40):
            got = set(out[out.query_id == q].vec_id)
            exact = set(_exact_ids(df, [float(x) for x in pts[q]]))
            assert len(got & exact) >= 9

    def test_pq_batch_cogrouped(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_pq_index

        df, pts = corpus
        model = pq_train(df, m=8, ks=32, metric="cosine", max_rows=N, seed=2)
        path = str(tmp_path / "b_pq")
        save_pq_index(pq_encode(df, model), model, path)
        out = search_batch(
            spark, path, self._queries(spark, corpus), 10, vectors=df,
            refine_factor=16,
        ).toPandas()
        for q in (3, 17, 40):
            got = set(out[out.query_id == q].vec_id)
            exact = set(_exact_ids(df, [float(x) for x in pts[q]]))
            assert len(got & exact) >= 9

    def test_batch_allowed_ids_all_kinds(self, spark, corpus, tmp_path):
        # r9: filtered BATCH search — every kind honors allowed_ids;
        # exact/PQ restrict the scan (provably exact on the allowed
        # subset), HNSW widens the beam, IVF widens per-query probes
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import (
            save_hnsw_index,
            save_ivf_index,
            save_pq_index,
        )

        df, pts = corpus
        allowed = list(range(0, N, 3))
        queries = self._queries(spark, corpus)

        def exact_allowed(q):
            return [
                r.vec_id
                for r in topk_search(
                    df.filter(F.col("vec_id") % 3 == 0),
                    [float(x) for x in pts[q]], 10, strength=0,
                ).collect()
            ]

        paths = {}
        plain = str(tmp_path / "ba_plain")
        df.write.parquet(plain)
        paths["exact"] = (plain, {})
        assigned, cents = ivf_build(df, k_cells=8)
        ivfp = str(tmp_path / "ba_ivf")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, ivfp
        )
        paths["ivf"] = (ivfp, {"nprobe": 2})
        hp = str(tmp_path / "ba_hnsw")
        save_hnsw_index(
            hnsw_build_shards(df, num_shards=2, m=8, seed=11), hp,
            m=8, metric="cosine",
        )
        paths["hnsw"] = (hp, {"ef_search": 200})
        model = pq_train(df, m=8, ks=32, metric="cosine", max_rows=N, seed=2)
        pqp = str(tmp_path / "ba_pq")
        save_pq_index(pq_encode(df, model), model, pqp)
        paths["pq"] = (pqp, {"vectors": df, "refine_factor": 16})

        for kind, (path, kw) in paths.items():
            out = search_batch(
                spark, path, queries, 10, allowed_ids=allowed, **kw
            ).toPandas()
            assert (out.vec_id % 3 == 0).all(), kind
            for q in (3, 17, 40):
                got = set(out[out.query_id == q].vec_id)
                want = set(exact_allowed(q))
                assert len(got & want) >= 9, (kind, q)

    def test_ivf_batch(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_ivf_index

        df, pts = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        path = str(tmp_path / "b_ivf")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path
        )
        out = search_batch(
            spark, path, self._queries(spark, corpus), 10, nprobe=4
        ).toPandas()
        for q in (3, 17, 40):
            got = set(out[out.query_id == q].vec_id)
            exact = set(_exact_ids(df, [float(x) for x in pts[q]]))
            assert len(got & exact) >= 8


class TestStorageRemoves:
    """Storage-level deletes for IVF and HNSW — lifecycle symmetry with
    the append faces (every index kind now has build/append/remove)."""

    def test_ivf_remove_refreshes_stats(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.ann import (
            ivf_build,
            ivf_cell_stats,
        )
        from astro_vectordb_spark.sources.vault import (
            ivf_remove_from_index,
            load_ivf_index,
            save_ivf_index,
        )

        df, pts = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        stats = ivf_cell_stats(assigned, cents)
        path = str(tmp_path / "ivf_rm")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path,
            cell_stats=stats,
        )
        remove_ids = [0, 8, 16, 24, 32]
        rep = ivf_remove_from_index(spark, path, remove_ids)
        assert rep["removed_rows"] == len(remove_ids)
        assert rep["touched_cells"]
        vec2, _, stats2, _ = load_ivf_index(spark, path)
        assert vec2.filter(vec2.vec_id.isin(remove_ids)).count() == 0
        assert vec2.count() == N - len(remove_ids)
        # stats recomputed for touched cells from survivors: the bound
        # can only tighten (min_sim rises or holds per touched cell)
        old = {r["cell_id"]: r["min_sim"] for r in stats.collect()}
        new = {r["cell_id"]: r["min_sim"] for r in stats2.collect()}
        for c in rep["touched_cells"]:
            assert new[c] >= old[c] - 1e-9

    def test_ivf_remove_replay_noop(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.ann import ivf_build
        from astro_vectordb_spark.sources.vault import (
            ivf_remove_from_index,
            save_ivf_index,
        )

        df, _ = corpus
        assigned, cents = ivf_build(df, k_cells=8)
        path = str(tmp_path / "ivf_rm2")
        save_ivf_index(
            assigned.select("vec_id", "embedding", "cell_id"), cents, path
        )
        assert ivf_remove_from_index(spark, path, [1, 2], batch_id=5)[
            "removed_rows"
        ] == 2
        rep = ivf_remove_from_index(spark, path, [1, 2], batch_id=5)
        assert rep.get("skipped_replay")

    def test_hnsw_remove_rebuilds_touched_shards(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.hnsw import (
            hnsw_build_shards,
            hnsw_query_shards,
        )
        from astro_vectordb_spark.sources.vault import (
            hnsw_remove_from_index,
            load_hnsw_index,
            save_hnsw_index,
        )

        df, pts = corpus
        graph = hnsw_build_shards(df, num_shards=2, m=8, seed=11)
        path = str(tmp_path / "hnsw_rm")
        save_hnsw_index(graph, path, m=8, metric="cosine")
        # remove the exact top-3 neighbors of query 17
        exact = _exact_ids(df, [float(x) for x in pts[17]])
        remove_ids = exact[:3]
        rep = hnsw_remove_from_index(spark, path, remove_ids)
        assert rep["removed_rows"] == len(remove_ids)
        g2, meta2 = load_hnsw_index(spark, path)
        assert g2.filter(g2.vec_id.isin(remove_ids)).count() == 0
        # removed ids can never be served, and recall vs the POST-DELETE
        # exact top-10 stays high (fresh wiring, not an edge sweep)
        queries = spark.createDataFrame(
            [(17, [float(x) for x in pts[17]])],
            "query_id long, query_vec array<float>",
        )
        got = {
            r["vec_id"]
            for r in hnsw_query_shards(
                g2, queries, k=10, m=meta2["m"], metric=meta2["metric"],
                ef_search=200, clustered=meta2["clustered_safe"],
                index_cache_token=meta2["cache_token"],
            ).collect()
        }
        assert not (got & set(remove_ids))
        survivors = df.join(
            spark.createDataFrame([(i,) for i in remove_ids], "vec_id long"),
            "vec_id", "left_anti",
        )
        exact_after = set(_exact_ids(survivors, [float(x) for x in pts[17]]))
        assert len(got & exact_after) >= 9

    def test_hnsw_remove_empties_shard(self, spark, tmp_path):
        import numpy as np

        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.sources.vault import (
            hnsw_remove_from_index,
            load_hnsw_index,
            save_hnsw_index,
        )

        rng = np.random.RandomState(2)
        df = spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(size=16)]) for i in range(100)],
            "vec_id long, embedding array<float>",
        )
        graph = hnsw_build_shards(df, num_shards=2, m=8, seed=3)
        spark_path = str(tmp_path / "hnsw_empty")
        save_hnsw_index(graph, spark_path, m=8, metric="cosine")
        g0, meta0 = load_hnsw_index(spark, spark_path)
        shard0_ids = [
            r["vec_id"] for r in g0.filter("shard_id = 0").collect()
        ]
        rep = hnsw_remove_from_index(spark, spark_path, shard0_ids)
        assert rep["emptied_shards"] == [0]
        g2, meta2 = load_hnsw_index(spark, spark_path)
        assert g2.filter("shard_id = 0").count() == 0
        assert meta2["shard_ids"] == [1]
        assert g2.count() == 100 - len(shard0_ids)


class TestBatchFacadeIvfPq:
    def test_ivf_pq_batch_serves_all_queries(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.pq import ivf_pq_build
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        df, pts = corpus
        encoded, cents, model = ivf_pq_build(
            df, k_cells=8, m=8, ks=16, max_rows=N
        )
        path = str(tmp_path / "b_ivfpq")
        save_ivf_pq_index(encoded, cents, model, path)
        queries = spark.createDataFrame(
            [(int(q), [float(x) for x in pts[q]]) for q in (3, 17, 40)],
            "query_id long, query_vec array<float>",
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="vectors"):
            search_batch(spark, path, queries, 10)
        out = search_batch(
            spark, path, queries, 10, vectors=df, refine_factor=16
        ).toPandas()
        from astro_vectordb_spark.operators.topk import topk_search

        for q in (3, 17, 40):
            got = set(out[out.query_id == q].vec_id)
            exact = {
                r.vec_id
                for r in topk_search(
                    df, [float(x) for x in pts[q]], 10, strength=0
                ).collect()
            }
            assert len(got & exact) >= 9


class TestHnswRemoveModes:
    def _index(self, spark, tmp_path, name, quantize=False):
        import numpy as np

        from astro_vectordb_spark.operators.hnsw import hnsw_build_shards
        from astro_vectordb_spark.sources.vault import save_hnsw_index

        rng = np.random.RandomState(7)
        C = rng.normal(size=(8, 24))
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        pts = (C[np.arange(400) % 8] + 0.05 * rng.normal(size=(400, 24)))
        df = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(400)],
            "vec_id long, embedding array<float>",
        )
        graph = hnsw_build_shards(
            df, num_shards=2, m=8, seed=5, quantize=quantize
        )
        path = str(tmp_path / name)
        save_hnsw_index(graph, path, m=8, metric="cosine")
        return df, pts, path

    def test_auto_sweeps_small_rebuilds_large(self, spark, tmp_path):
        from astro_vectordb_spark.sources.vault import (
            hnsw_remove_from_index,
            load_hnsw_index,
        )

        df, pts, path = self._index(spark, tmp_path, "modes")
        g0, _ = load_hnsw_index(spark, path)
        shard_of = {r["vec_id"]: r["shard_id"] for r in
                    g0.select("vec_id", "shard_id").collect()}
        by_shard = {}
        for v, s in shard_of.items():
            by_shard.setdefault(s, []).append(v)
        # small removal from shard A (sweep), >20% of shard B (rebuild)
        small = sorted(by_shard[0])[:3]
        big = sorted(by_shard[1])[: int(0.5 * len(by_shard[1]))]
        rep = hnsw_remove_from_index(spark, path, small + big)
        assert rep["swept_shards"] == [0]
        assert rep["rebuilt_shards"] == [1]
        assert rep["removed_rows"] == len(small) + len(big)
        g2, _ = load_hnsw_index(spark, path)
        assert g2.filter(g2.vec_id.isin(small + big)).count() == 0

    def test_forced_rebuild_mode(self, spark, tmp_path):
        from astro_vectordb_spark.sources.vault import hnsw_remove_from_index

        _, _, path = self._index(spark, tmp_path, "forced")
        rep = hnsw_remove_from_index(spark, path, [1, 2], mode="rebuild")
        assert rep["swept_shards"] == [] and rep["rebuilt_shards"]

    def test_quantized_sweep_serves_correctly(self, spark, tmp_path):
        from astro_vectordb_spark.operators.hnsw import hnsw_query_shards
        from astro_vectordb_spark.sources.vault import (
            hnsw_remove_from_index,
            load_hnsw_index,
        )

        df, pts, path = self._index(spark, tmp_path, "qsweep", quantize=True)
        rep = hnsw_remove_from_index(spark, path, [10, 20, 30], mode="sweep")
        assert rep["removed_rows"] == 3 and rep["swept_shards"]
        g2, meta2 = load_hnsw_index(spark, path)
        assert "qvec" in g2.columns  # codes survive the sweep losslessly
        queries = spark.createDataFrame(
            [(0, [float(x) for x in pts[0]])],
            "query_id long, query_vec array<float>",
        )
        got = {
            r["vec_id"]
            for r in hnsw_query_shards(
                g2, queries, k=10, m=meta2["m"], metric=meta2["metric"],
                ef_search=200, clustered=meta2["clustered_safe"],
                index_cache_token=meta2["cache_token"],
            ).collect()
        }
        assert got and not (got & {10, 20, 30})


class TestHybridFacade:
    """hybrid_search: one-call vector + BM25 + RRF through persisted
    indexes of both families."""

    def _build(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.sources.vault import save_bm25_index

        docs = spark.createDataFrame(
            [
                (0, "spark merge join table"),
                (1, "merge join row group"),
                (2, "hash table scan filter"),
                (3, "spark spark merge hash"),
                (4, "window agg sort spill"),
                (5, "join merge spark batch"),
                (6, "vector index graph beam"),
                (7, "scan filter merge spark"),
            ],
            "doc_id long, text string",
        )
        vec_path = str(tmp_path / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec_path)
        bm25_path = str(tmp_path / "bm25")
        ts, cs = bm25_term_stats(docs)
        save_bm25_index(ts, cs, bm25_path)
        return docs, vec_path, bm25_path

    def test_matches_manual_composition(self, spark, tmp_path):
        from pyspark.sql import Window

        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import bm25_topk
        from astro_vectordb_spark.operators.rerank import rrf_fuse
        from astro_vectordb_spark.operators.topk import topk_search
        from astro_vectordb_spark.search import hybrid_search

        docs, vec_path, bm25_path = self._build(spark, tmp_path)
        qv = embed_text(docs.filter("doc_id = 0")).first()["embedding"]
        terms = ["merge", "spark"]

        got = hybrid_search(
            spark, vec_path, bm25_path, docs, qv, terms, k=5, fetch_k=6
        ).collect()

        w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        emb = spark.read.parquet(vec_path).withColumnRenamed(
            "vec_id", "doc_id"
        )
        vec = topk_search(
            emb, qv, 6, strength=0.0, id_col="doc_id"
        ).select("doc_id", "score").withColumn(
            "rank", F.row_number().over(w)
        )
        lex = bm25_topk(docs, terms, 6).withColumn(
            "rank", F.row_number().over(w)
        )
        want = rrf_fuse([lex, vec], 5).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_lexical_respects_removed_stats(self, spark, tmp_path):
        # removing docs from the BM25 index changes idf exactly as if
        # the index were rebuilt on survivors — the facade must price
        # with the decremented stats
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import (
            bm25_term_stats,
            bm25_topk_indexed,
        )
        from astro_vectordb_spark.search import hybrid_search
        from astro_vectordb_spark.sources.vault import (
            bm25_remove_from_index,
            load_bm25_index,
        )

        docs, vec_path, bm25_path = self._build(spark, tmp_path)
        removed = docs.filter("doc_id in (6, 7)")
        bm25_remove_from_index(spark, bm25_path, removed)
        survivors = docs.filter("doc_id not in (6, 7)")
        # the survivor corpus must also drop the removed vectors: use
        # allowed_ids-free plain re-write for the vector side
        vec2 = str(tmp_path / "emb2.parquet")
        embed_text(survivors).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec2)

        qv = embed_text(docs.filter("doc_id = 0")).first()["embedding"]
        got = hybrid_search(
            spark, vec2, bm25_path, survivors, qv, ["merge", "spark"],
            k=4, fetch_k=5,
        ).collect()

        ts, cs = load_bm25_index(spark, bm25_path)
        ref_ts, ref_cs = bm25_term_stats(survivors)
        assert sorted((r["term"], r["df"]) for r in ts.collect()) == sorted(
            (r["term"], r["df"]) for r in ref_ts.collect()
        )
        # and the fused list is non-empty, sorted, within k
        assert 0 < len(got) <= 4
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)
        # doc 0 (the query doc itself, strong on both lists) wins
        assert got[0]["doc_id"] == 0


class TestHybridBatchFacade:
    """hybrid_search_batch: whole-batch hybrid retrieval, per-query
    identical to the single-call facade."""

    def test_matches_single_hybrid_per_query(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.search import (
            hybrid_search,
            hybrid_search_batch,
        )
        from astro_vectordb_spark.sources.vault import save_bm25_index

        docs = spark.createDataFrame(
            [
                (0, "spark merge join table"),
                (1, "merge join row group"),
                (2, "hash table scan filter"),
                (3, "spark spark merge hash"),
                (4, "window agg sort spill"),
                (5, "join merge spark batch"),
                (6, "vector index graph beam"),
                (7, "scan filter merge spark"),
            ],
            "doc_id long, text string",
        )
        vec_path = str(tmp_path / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec_path)
        bm25_path = str(tmp_path / "bm25")
        ts, cs = bm25_term_stats(docs)
        save_bm25_index(ts, cs, bm25_path)

        emb = {
            r["doc_id"]: r["embedding"]
            for r in embed_text(docs.filter("doc_id in (0, 2, 4)")).collect()
        }
        cases = [
            (0, emb[0], ["merge", "spark"]),
            (1, emb[2], ["hash", "scan"]),
            (2, emb[4], ["window", "agg", "sort"]),
        ]
        qs = spark.createDataFrame(
            cases, "query_id long, query_vec array<float>, terms array<string>"
        )
        got = hybrid_search_batch(
            spark, vec_path, bm25_path, docs, qs, k=4, fetch_k=6
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"])
            )
        for qid, qv, terms in cases:
            want = hybrid_search(
                spark, vec_path, bm25_path, docs, qv, terms,
                k=4, fetch_k=6,
            ).collect()
            assert sorted(by_q[qid]) == sorted(
                (r["doc_id"], r["score"]) for r in want
            ), f"query {qid} diverges from single-call hybrid"


class TestHybridFusionAndFilter:
    """fusion='weighted' and allowed_ids on both hybrid faces."""

    def _build(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.sources.vault import save_bm25_index

        docs = spark.createDataFrame(
            [
                (0, "spark merge join table"),
                (1, "merge join row group"),
                (2, "hash table scan filter"),
                (3, "spark spark merge hash"),
                (4, "window agg sort spill"),
                (5, "join merge spark batch"),
                (6, "vector index graph beam"),
                (7, "scan filter merge spark"),
            ],
            "doc_id long, text string",
        )
        vec_path = str(tmp_path / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec_path)
        bm25_path = str(tmp_path / "bm25")
        ts, cs = bm25_term_stats(docs)
        save_bm25_index(ts, cs, bm25_path)
        qv = embed_text(docs.filter("doc_id = 0")).first()["embedding"]
        return docs, vec_path, bm25_path, qv

    def test_weighted_matches_manual_score_fusion(self, spark, tmp_path):
        from astro_vectordb_spark.operators.keyword import bm25_topk
        from astro_vectordb_spark.operators.rerank import score_fusion
        from astro_vectordb_spark.operators.topk import topk_search
        from astro_vectordb_spark.search import hybrid_search

        docs, vec_path, bm25_path, qv = self._build(spark, tmp_path)
        got = hybrid_search(
            spark, vec_path, bm25_path, docs, qv, ["merge", "spark"],
            k=5, fetch_k=6, fusion="weighted", weights=(0.3, 0.7),
        ).collect()

        emb = spark.read.parquet(vec_path).withColumnRenamed(
            "vec_id", "doc_id"
        )
        vec = topk_search(
            emb, qv, 6, strength=0.0, id_col="doc_id"
        ).select("doc_id", "score")
        lex = bm25_topk(docs, ["merge", "spark"], 6)
        want = score_fusion([lex, vec], [0.3, 0.7], 5).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_unknown_fusion_raises(self, spark, tmp_path):
        from astro_vectordb_spark.search import hybrid_search

        docs, vec_path, bm25_path, qv = self._build(spark, tmp_path)
        with pytest.raises(ValueError, match="fusion"):
            hybrid_search(
                spark, vec_path, bm25_path, docs, qv, ["merge"],
                fusion="borda",
            )

    def test_allowed_ids_restricts_both_lists(self, spark, tmp_path):
        from astro_vectordb_spark.search import hybrid_search

        docs, vec_path, bm25_path, qv = self._build(spark, tmp_path)
        allowed = [1, 2, 5, 7]
        got = hybrid_search(
            spark, vec_path, bm25_path, docs, qv, ["merge", "spark"],
            k=8, fetch_k=8, allowed_ids=allowed,
        ).collect()
        ids = {r["doc_id"] for r in got}
        assert ids and ids <= set(allowed)
        # equals the unfiltered hybrid over the pre-restricted corpus
        # (exact kind + full-index stats both ways)
        from astro_vectordb_spark.functions.embed import embed_text

        sub = docs.filter(F.col("doc_id").isin(allowed))
        vec2 = str(tmp_path / "emb_sub.parquet")
        embed_text(sub).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec2)
        from astro_vectordb_spark.operators.keyword import (
            bm25_topk_indexed,
        )
        from astro_vectordb_spark.operators.rerank import rrf_fuse
        from astro_vectordb_spark.operators.topk import topk_search
        from astro_vectordb_spark.sources.vault import load_bm25_index
        from pyspark.sql import Window

        w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        emb = spark.read.parquet(vec2).withColumnRenamed("vec_id", "doc_id")
        vec = topk_search(emb, qv, 8, strength=0.0, id_col="doc_id").select(
            "doc_id", "score"
        ).withColumn("rank", F.row_number().over(w))
        ts, cs = load_bm25_index(spark, bm25_path)
        lex = bm25_topk_indexed(
            sub, ts, cs, ["merge", "spark"], 8
        ).withColumn("rank", F.row_number().over(w))
        want = rrf_fuse([lex, vec], 8).collect()
        assert sorted((r["doc_id"], r["score"]) for r in got) == sorted(
            (r["doc_id"], r["score"]) for r in want
        )

    def test_batch_weighted_and_filtered_match_single(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import embed_text
        from astro_vectordb_spark.search import (
            hybrid_search,
            hybrid_search_batch,
        )

        docs, vec_path, bm25_path, _ = self._build(spark, tmp_path)
        emb = {
            r["doc_id"]: r["embedding"]
            for r in embed_text(docs.filter("doc_id in (0, 2)")).collect()
        }
        cases = [(0, emb[0], ["merge", "spark"]), (1, emb[2], ["hash", "scan"])]
        qs = spark.createDataFrame(
            cases, "query_id long, query_vec array<float>, terms array<string>"
        )
        for kwargs in (
            {"fusion": "weighted", "weights": (0.4, 0.6)},
            {"allowed_ids": [0, 2, 3, 5, 7]},
        ):
            got = hybrid_search_batch(
                spark, vec_path, bm25_path, docs, qs, k=4, fetch_k=6,
                **kwargs,
            ).collect()
            by_q = {}
            for r in got:
                by_q.setdefault(r["query_id"], []).append(
                    (r["doc_id"], r["score"])
                )
            for qid, qv, terms in cases:
                want = hybrid_search(
                    spark, vec_path, bm25_path, docs, qv, terms,
                    k=4, fetch_k=6, **kwargs,
                ).collect()
                assert sorted(by_q.get(qid, [])) == sorted(
                    (r["doc_id"], r["score"]) for r in want
                ), f"{kwargs} query {qid}"


class TestTextQueryFaces:
    """search_text / hybrid_search_text: text-in front doors through
    the encoder registry."""

    def test_search_text_equals_embedded_vector(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import embed_query_text
        from astro_vectordb_spark.search import search, search_text

        docs = spark.createDataFrame(
            [(i, f"tok{i} merge spark") for i in range(6)],
            "doc_id long, text string",
        )
        from astro_vectordb_spark.functions.embed import embed_text

        vec_path = str(tmp_path / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec_path)

        got = search_text(spark, vec_path, "merge spark", k=3).collect()
        qv = embed_query_text("merge spark")
        want = search(spark, vec_path, qv, 3).collect()
        assert [(r["vec_id"], r["score"]) for r in got] == [
            (r["vec_id"], r["score"]) for r in want
        ]

    def test_hybrid_text_tokenizes_and_matches_explicit(self, spark, tmp_path):
        from astro_vectordb_spark.functions.embed import (
            embed_query_text,
            embed_text,
        )
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.search import (
            hybrid_search,
            hybrid_search_text,
        )
        from astro_vectordb_spark.sources.vault import save_bm25_index

        docs = spark.createDataFrame(
            [
                (0, "spark merge join table"),
                (1, "merge join row group"),
                (2, "hash table scan filter"),
                (3, "window agg sort spill"),
            ],
            "doc_id long, text string",
        )
        vec_path = str(tmp_path / "emb.parquet")
        embed_text(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        ).write.parquet(vec_path)
        bm25_path = str(tmp_path / "bm25")
        ts, cs = bm25_term_stats(docs)
        save_bm25_index(ts, cs, bm25_path)

        got = hybrid_search_text(
            spark, vec_path, bm25_path, docs, "  Merge   SPARK ", k=3,
        ).collect()
        qv = embed_query_text("  Merge   SPARK ")
        want = hybrid_search(
            spark, vec_path, bm25_path, docs, qv, ["merge", "spark"], k=3,
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in want
        ]

    def test_hybrid_text_empty_query_raises(self, spark, tmp_path):
        from astro_vectordb_spark.search import hybrid_search_text

        docs = spark.createDataFrame(
            [(0, "a")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="no tokens"):
            hybrid_search_text(
                spark, str(tmp_path), str(tmp_path), docs, "   ", k=3
            )

    def test_injected_encoder_drives_search_text(self, spark, tmp_path):
        # registry contract end to end: a custom model name changes
        # the query vector the facade searches with
        import numpy as np
        import pandas as pd

        from astro_vectordb_spark.functions.embed import register_encoder
        from astro_vectordb_spark.search import search_text

        def one_hot_factory(dim=4, **_):
            def kernel(texts: pd.Series) -> pd.Series:
                out = []
                for t in texts:
                    v = np.zeros(dim, dtype=np.float32)
                    v[len(str(t)) % dim] = 1.0
                    out.append(v)
                return pd.Series(out)
            return kernel

        register_encoder("onehot4", one_hot_factory)
        vecs = spark.createDataFrame(
            [(i, [1.0 if j == i else 0.0 for j in range(4)])
             for i in range(4)],
            "vec_id long, embedding array<float>",
        )
        vec_path = str(tmp_path / "oh.parquet")
        vecs.write.parquet(vec_path)
        got = search_text(
            spark, vec_path, "ab", k=1, dim=4, model="onehot4"
        ).collect()
        assert got[0]["vec_id"] == 2  # len("ab") % 4


def test_hybrid_text_batch_matches_single_text_face(spark, tmp_path):
    from astro_vectordb_spark.functions.embed import embed_text
    from astro_vectordb_spark.operators.keyword import bm25_term_stats
    from astro_vectordb_spark.search import (
        hybrid_search_text,
        hybrid_search_text_batch,
    )
    from astro_vectordb_spark.sources.vault import save_bm25_index

    docs = spark.createDataFrame(
        [
            (0, "spark merge join table"),
            (1, "merge join row group"),
            (2, "hash table scan filter"),
            (3, "window agg sort spill"),
            (4, "join merge spark batch"),
        ],
        "doc_id long, text string",
    )
    vec_path = str(tmp_path / "emb.parquet")
    embed_text(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    ).write.parquet(vec_path)
    bm25_path = str(tmp_path / "bm25")
    ts, cs = bm25_term_stats(docs)
    save_bm25_index(ts, cs, bm25_path)

    texts = {0: "Merge  SPARK", 1: "hash table scan", 2: "window agg"}
    qs = spark.createDataFrame(
        list(texts.items()), "query_id long, query_text string"
    )
    got = hybrid_search_text_batch(
        spark, vec_path, bm25_path, docs, qs, k=3, fetch_k=6
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, qt in texts.items():
        want = hybrid_search_text(
            spark, vec_path, bm25_path, docs, qt, k=3, fetch_k=6
        ).collect()
        assert sorted(by_q.get(qid, [])) == sorted(
            (r["doc_id"], r["score"]) for r in want
        ), f"query {qid}"


class TestAdaptiveRefinePassThrough:
    """Round-14: adaptive_refine= threads through both facades to the
    PQ / IVF-PQ serving paths; on separable data the adaptive result
    equals the fixed-pool result exactly."""

    def _queries(self, spark, corpus, qids=(3, 77, 200)):
        _, pts = corpus
        return spark.createDataFrame(
            [(q, [float(x) for x in pts[q]]) for q in qids],
            "query_id long, query_vec array<float>",
        )

    def test_single_and_batch_pq(self, spark, corpus, qv, tmp_path):
        from astro_vectordb_spark.operators.pq import pq_encode, pq_train
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_pq_index

        df, _ = corpus
        model = pq_train(df, m=8, ks=32, metric="cosine", max_rows=N,
                         seed=2)
        assert model.train_mse is not None
        path = str(tmp_path / "pq_ar")
        save_pq_index(pq_encode(df, model), model, path)
        fixed = [(r.vec_id, r.score) for r in search(
            spark, path, qv, 10, vectors=df).collect()]
        adapt = [(r.vec_id, r.score) for r in search(
            spark, path, qv, 10, vectors=df, adaptive_refine=True
        ).collect()]
        assert adapt == fixed
        qdf = self._queries(spark, corpus)
        bf = sorted((r.query_id, r.vec_id, r.score) for r in search_batch(
            spark, path, qdf, 10, vectors=df).collect())
        ba = sorted((r.query_id, r.vec_id, r.score) for r in search_batch(
            spark, path, qdf, 10, vectors=df, adaptive_refine=True
        ).collect())
        assert ba == bf

    def test_batch_ivf_pq(self, spark, corpus, tmp_path):
        from astro_vectordb_spark.operators.pq import ivf_pq_build
        from astro_vectordb_spark.search import search_batch
        from astro_vectordb_spark.sources.vault import save_ivf_pq_index

        df, _ = corpus
        encoded, cents, model = ivf_pq_build(
            df, k_cells=8, m=8, ks=32, metric="cosine", max_rows=N,
        )
        path = str(tmp_path / "ivfpq_ar")
        save_ivf_pq_index(encoded, cents, model, path)
        qdf = self._queries(spark, corpus)
        bf = sorted((r.query_id, r.vec_id, r.score) for r in search_batch(
            spark, path, qdf, 10, vectors=df, nprobe=8).collect())
        ba = sorted((r.query_id, r.vec_id, r.score) for r in search_batch(
            spark, path, qdf, 10, vectors=df, nprobe=8,
            adaptive_refine=True,
        ).collect())
        assert ba == bf
