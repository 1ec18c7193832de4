"""Random-hyperplane cell builder tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.ann import (
    ivf_cell_stats,
    ivf_search_exact,
    rp_build,
)
from astro_vectordb_spark.operators.topk import topk_search


def test_rp_build_deterministic_and_total(spark, embeddings):
    a1, c1 = rp_build(embeddings, n_planes=3, dim=64)
    a2, _ = rp_build(embeddings, n_planes=3, dim=64)
    assert a1.count() == embeddings.count()
    m1 = {r["vec_id"]: r["cell_id"] for r in a1.collect()}
    m2 = {r["vec_id"]: r["cell_id"] for r in a2.collect()}
    assert m1 == m2
    assert set(m1.values()) <= set(range(8))
    assert c1.count() == a1.select("cell_id").distinct().count()
    # centroids have the right dimensionality
    assert c1.select(F.size("centroid").alias("d")).first()["d"] == 64


def test_rp_exact_search_matches_brute_force(spark, embeddings):
    assigned, centroids = rp_build(embeddings, n_planes=3, dim=64)
    stats = ivf_cell_stats(assigned, centroids)
    for qid in [0, 11, 42]:
        qv = embeddings.filter(F.col("vec_id") == qid).first()["embedding"]
        exact = topk_search(embeddings, qv, 10, strength=0).collect()
        pruned = ivf_search_exact(
            assigned, centroids, stats, qv, 10, nprobe_seed=2
        ).collect()
        assert [r["vec_id"] for r in pruned] == [r["vec_id"] for r in exact]
