"""Adaptive refine (round-13 verdict item 5): the error-bound
reorder-list cut for PQ / IVF-PQ serving.

Contract under test: ``adaptive_refine_cut`` keeps the safety floor
(rank <= k*refine_min) plus everything within sigma_mult*sigma of the
rank-k ADC score and nothing else; ``adc_sigma`` derives the per-query
error scale from the model's training MSE; end-to-end the adaptive
faces never lose the exact top-k on separable data while shrinking the
stage-2 pool; legacy models (no stored MSE) degrade to the fixed pool
bit-identically; the MSE survives the vault round trip.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.pq import (
    PQModel,
    adaptive_refine_cut,
    adc_sigma,
    ivf_pq_build,
    ivf_pq_topk,
    pq_candidates,
    pq_encode,
    pq_topk,
    pq_train,
)

DIM = 32
N = 3000


def _clustered(seed=9):
    rng = np.random.RandomState(seed)
    C = rng.randn(12, DIM)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    return C[rng.randint(0, 12, N)] + 0.05 * rng.randn(N, DIM)


@pytest.fixture(scope="module")
def data(spark):
    X = _clustered()
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    yield df, X
    df.unpersist()


@pytest.fixture(scope="module")
def model_enc(spark, data):
    df, _ = data
    model = pq_train(df, m=8, ks=64, metric="cosine", max_rows=N)
    enc = pq_encode(df, model).cache()
    enc.count()
    yield model, enc
    enc.unpersist()


def _exact_topk(df, q, k):
    from astro_vectordb_spark.functions.vector import similarity

    qv = F.array(*[F.lit(float(x)) for x in q])
    return [
        r["vec_id"]
        for r in df.withColumn(
            "s", similarity(F.col("embedding"), qv, "cosine")
        ).orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(k).collect()
    ]


class TestSigma:
    def test_train_mse_populated_and_roundtrips(self, model_enc):
        model, _ = model_enc
        assert model.train_mse is not None and model.train_mse > 0
        m2 = PQModel.from_rows(model.to_rows(), metric=model.metric,
                               dim=model.dim)
        assert m2.train_mse == model.train_mse

    def test_vault_roundtrip_preserves_mse(self, spark, model_enc,
                                           tmp_path):
        from astro_vectordb_spark.sources.vault import (
            load_pq_index,
            save_pq_index,
        )

        model, enc = model_enc
        path = str(tmp_path / "pq")
        save_pq_index(enc, model, path)
        _, m2, _ = load_pq_index(spark, path)
        assert m2.train_mse == model.train_mse
        np.testing.assert_array_equal(m2.codebooks, model.codebooks)

    def test_sigma_scales_with_query_norm(self, model_enc):
        model, _ = model_enc
        q = list(np.ones(DIM))
        # cosine preps the query to unit norm -> sigma is norm-invariant
        assert adc_sigma(model, q) == pytest.approx(
            adc_sigma(model, [2.0 * x for x in q])
        )
        dot_model = PQModel(model.codebooks, metric="dot", dim=model.dim,
                            train_mse=model.train_mse)
        assert adc_sigma(dot_model, [2.0 * x for x in q]) == pytest.approx(
            2.0 * adc_sigma(dot_model, q)
        )

    def test_sigma_none_for_legacy_and_euclidean(self, model_enc):
        model, _ = model_enc
        legacy = PQModel(model.codebooks, metric="cosine", dim=model.dim)
        assert adc_sigma(legacy, [1.0] * DIM) is None
        euc = PQModel(model.codebooks, metric="euclidean", dim=model.dim,
                      train_mse=model.train_mse)
        assert adc_sigma(euc, [1.0] * DIM) is None


class TestCutRule:
    def _pool(self, spark, scores):
        return spark.createDataFrame(
            [(i, float(s)) for i, s in enumerate(scores)],
            "vec_id long, adc_score double",
        )

    def test_keeps_floor_margin_and_drops_tail(self, spark):
        # k=2, floor=2*2=4, sigma=0.1, mult=1: kth score (rank 2) = 8.0
        # -> cut at 7.9.  scores: ranks 1..8
        scores = [9.0, 8.0, 7.95, 7.91, 7.5, 7.2, 7.0, 6.0]
        kept = {
            r["vec_id"]
            for r in adaptive_refine_cut(
                self._pool(spark, scores), k=2, sigma=0.1,
                refine_min=2, sigma_mult=1.0,
            ).collect()
        }
        # ranks 1-4 = floor; 7.95/7.91 >= 7.9 already in floor;
        # 7.5 and below dropped
        assert kept == {0, 1, 2, 3}

    def test_margin_extends_past_floor(self, spark):
        scores = [9.0, 8.0, 7.99, 7.98, 7.97, 7.96, 5.0]
        kept = {
            r["vec_id"]
            for r in adaptive_refine_cut(
                self._pool(spark, scores), k=2, sigma=0.1,
                refine_min=2, sigma_mult=1.0,
            ).collect()
        }
        # everything within 0.1 of rank-2 (8.0) survives: ids 0..5
        assert kept == {0, 1, 2, 3, 4, 5}

    def test_pool_smaller_than_k_kept_whole(self, spark):
        scores = [3.0, 2.0]
        kept = adaptive_refine_cut(
            self._pool(spark, scores), k=5, sigma=0.01,
            refine_min=1, sigma_mult=1.0,
        ).count()
        assert kept == 2

    def test_sigma_none_is_identity(self, spark):
        pool = self._pool(spark, [3.0, 2.0, 1.0])
        assert adaptive_refine_cut(pool, k=1, sigma=None).count() == 3


class TestEndToEnd:
    def test_adaptive_matches_exact_and_shrinks_pool(self, spark, data,
                                                     model_enc):
        df, X = data
        model, enc = model_enc
        rng = np.random.RandomState(4)
        for _ in range(3):
            q = [float(x) for x in X[rng.randint(0, N)] + 0.01]
            want = _exact_topk(df, q, 10)
            got = [
                r["vec_id"]
                for r in pq_topk(
                    enc, df, q, 10, model, refine_factor=32,
                    adaptive_refine=True,
                ).collect()
            ]
            assert got == want
            pool = adaptive_refine_cut(
                pq_candidates(enc, model, q, 320, with_scores=True),
                10, adc_sigma(model, q),
            ).count()
            assert pool < 320  # strictly below the fixed budget

    def test_legacy_model_identical_to_fixed(self, spark, data,
                                             model_enc):
        df, X = data
        model, enc = model_enc
        legacy = PQModel(model.codebooks, metric="cosine", dim=model.dim)
        q = [float(x) for x in X[7]]
        fixed = pq_topk(enc, df, q, 10, legacy, refine_factor=16)
        adapt = pq_topk(enc, df, q, 10, legacy, refine_factor=16,
                        adaptive_refine=True)
        assert [r.asDict() for r in fixed.collect()] == [
            r.asDict() for r in adapt.collect()
        ]

    def test_ivf_pq_residual_adaptive(self, spark, data):
        df, X = data
        enc, cents, model = ivf_pq_build(
            df, k_cells=8, m=8, ks=64, metric="cosine", residual=True,
            max_rows=N,
        )
        enc = enc.cache()
        enc.count()
        assert model.train_mse is not None
        q = [float(x) for x in X[42]]
        want = _exact_topk(df, q, 10)
        got = [
            r["vec_id"]
            for r in ivf_pq_topk(
                enc, cents, df, q, 10, model, nprobe=8,
                refine_factor=32, adaptive_refine=True,
            ).collect()
        ]
        # all 8 cells probed -> candidate pool covers the truth; the
        # adaptive cut must not lose exact top-10 members
        assert set(got) == set(want)
        enc.unpersist()


class TestEuclideanAdaptive:
    def test_euclidean_cut_exact_and_shrinks(self, spark, data):
        df, X = data
        model = pq_train(df, m=8, ks=64, metric="euclidean", max_rows=N)
        assert model.train_mse is not None
        enc = pq_encode(df, model).cache()
        enc.count()
        from astro_vectordb_spark.functions.vector import similarity

        rng = np.random.RandomState(11)
        for _ in range(2):
            q = [float(x) for x in X[rng.randint(0, N)] + 0.01]
            qv = F.array(*[F.lit(float(x)) for x in q])
            want = [
                r["vec_id"]
                for r in df.withColumn(
                    "s", similarity(F.col("embedding"), qv, "euclidean")
                ).orderBy(F.col("s").desc(), F.col("vec_id").asc())
                .limit(10).collect()
            ]
            got = [
                r["vec_id"]
                for r in pq_topk(
                    enc, df, q, 10, model, refine_factor=32,
                    adaptive_refine=True,
                ).collect()
            ]
            assert got == want
            pool = adaptive_refine_cut(
                pq_candidates(enc, model, q, 320, with_scores=True),
                10, None, model=model,
            ).count()
            assert pool < 320
        enc.unpersist()

    def test_euclidean_legacy_degrades_to_fixed(self, spark, data):
        df, X = data
        model = pq_train(df, m=8, ks=64, metric="euclidean", max_rows=N)
        legacy = PQModel(model.codebooks, metric="euclidean",
                         dim=model.dim)
        enc = pq_encode(df, legacy).cache()
        enc.count()
        q = [float(x) for x in X[5]]
        fixed = pq_topk(enc, df, q, 10, legacy, refine_factor=16)
        adapt = pq_topk(enc, df, q, 10, legacy, refine_factor=16,
                        adaptive_refine=True)
        assert [r.asDict() for r in fixed.collect()] == [
            r.asDict() for r in adapt.collect()
        ]
        enc.unpersist()
