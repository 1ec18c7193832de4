"""SemDeDup (Abbas et al. 2023) — cluster-then-prune semantic dedup.

Parity is pinned against a NumPy reference that replicates the full
pipeline exactly: the same deterministic sampled-Lloyd centroids
(via the shared ivf machinery), within-cluster eps-pairs, transitive
closure, and both keep rules.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.dedup import semantic_dedup

DIM = 16
N = 600


def _corpus(seed=9):
    rng = np.random.RandomState(seed)
    C = rng.randn(12, DIM)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    X = C[rng.randint(0, 12, N)] + 0.15 * rng.normal(size=(N, DIM))
    # planted near-dup groups: ids N..N+4 copy id 3 with tiny jitter,
    # N+5..N+7 copy id 17 exactly
    extra = [X[3] + 1e-4 * rng.normal(size=DIM) for _ in range(5)]
    extra += [X[17].copy() for _ in range(3)]
    return np.vstack([X, np.array(extra)])


@pytest.fixture(scope="module")
def data(spark):
    X = _corpus()
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    ).cache()
    df.count()
    yield df, X
    df.unpersist()


def _reference(spark, df, X, eps, k_cells, seed, keep):
    """NumPy replay of the exact pipeline: reuse the SAME assignment
    the Spark path computes (sampled-Lloyd centroids are driver-side
    deterministic), then brute-force pairs/closure/keep-rule."""
    from astro_vectordb_spark.operators.ann import ivf_build_sampled

    assigned, centroids = ivf_build_sampled(
        df, k_cells=k_cells, seed=seed
    )
    cell_of = {
        int(r["vec_id"]): int(r["cell_id"]) for r in assigned.collect()
    }
    cents = {
        int(r["cell_id"]): np.asarray(r["centroid"], dtype=np.float64)
        for r in centroids.collect()
    }
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    n = len(X)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if cell_of[i] != cell_of[j]:
                continue
            if float(Xn[i] @ Xn[j]) > eps:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    keep_ids = set()
    for members in groups.values():
        if len(members) == 1:
            keep_ids.add(members[0])
            continue
        if keep == "min_id":
            keep_ids.add(min(members))
        else:
            def centroid_cos(i):
                c = cents[cell_of[i]]
                cn = c / (np.linalg.norm(c) or 1.0)
                return (float(Xn[i] @ cn), i)

            keep_ids.add(min(members, key=centroid_cos))
    return keep_ids


@pytest.mark.parametrize("keep", ["farthest", "min_id"])
def test_matches_numpy_reference(spark, data, keep):
    df, X = data
    got = {
        r["vec_id"]
        for r in semantic_dedup(
            df, eps=0.98, k_cells=8, seed=5, keep=keep
        ).collect()
    }
    want = _reference(spark, df, X, eps=0.98, k_cells=8, seed=5, keep=keep)
    assert got == want
    # the planted groups collapsed
    assert len(got) < len(X)


def test_exact_copies_collapse_to_one(spark, data):
    df, X = data
    got = {
        r["vec_id"]
        for r in semantic_dedup(
            df, eps=0.999999, k_cells=8, seed=5
        ).collect()
    }
    grp = {17, N + 5, N + 6, N + 7}
    assert len(got & grp) == 1


def test_cluster_cap_only_under_dedups(spark, data):
    """max_cluster_rows caps pair volume; capped-out members keep
    themselves — never silently dropped."""
    df, X = data
    uncapped = {
        r["vec_id"]
        for r in semantic_dedup(
            df, eps=0.98, k_cells=4, seed=5, max_cluster_rows=None
        ).collect()
    }
    capped = {
        r["vec_id"]
        for r in semantic_dedup(
            df, eps=0.98, k_cells=4, seed=5, max_cluster_rows=50
        ).collect()
    }
    assert uncapped <= capped
    all_ids = {r["vec_id"] for r in df.select("vec_id").collect()}
    assert capped <= all_ids


def test_unknown_keep_raises(spark, data):
    df, _ = data
    with pytest.raises(ValueError, match="keep rule"):
        semantic_dedup(df, keep="median")


def test_fixed_centroids_matches_reference(spark, data):
    """The bring-your-own-centroids face: expression-kernel assignment
    (broadcast join + window argmax) must equal the NumPy replay with
    the same literal centroids, under both keep rules."""
    from astro_vectordb_spark.operators.dedup import _rp_plane

    df, X = data
    K = 6
    cent_rows = [(k, _rp_plane(123, k, 0, DIM)) for k in range(K)]
    cents_df = spark.createDataFrame(
        cent_rows, "cell_id int, centroid array<double>"
    )
    C = np.array([c for _, c in cent_rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    # reference assignment: argmax cosine, ties by cell_id (none in
    # practice with hash-derived centroids)
    cell_of = (Xn @ Cn.T).argmax(axis=1)
    n = len(X)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        for j in range(i + 1, n):
            if cell_of[i] == cell_of[j] and float(Xn[i] @ Xn[j]) > 0.9:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    groups: dict = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    for keep in ("min_id", "farthest"):
        want = set()
        for members in groups.values():
            if len(members) == 1 or keep == "min_id":
                want.add(min(members))
            else:
                want.add(
                    min(
                        members,
                        key=lambda i: (float(Xn[i] @ Cn[cell_of[i]]), i),
                    )
                )
        got = {
            r["vec_id"]
            for r in semantic_dedup(
                df, eps=0.9, keep=keep, max_cluster_rows=None,
                centroids=cents_df,
            ).collect()
        }
        assert got == want, keep
