"""IVF ANN recall tests — statistical check vs the exact path
(SURVEY.md §5.2: recall@K, not hash equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.ann import (
    ivf_batch_search,
    ivf_build,
    ivf_search,
)
from astro_vectordb_spark.operators.topk import batch_topk, topk_search


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


def test_ivf_build_assigns_every_vector(spark, embeddings):
    assigned, centroids = ivf_build(embeddings, k_cells=8)
    assert assigned.count() == embeddings.count()
    assert centroids.count() == 8
    assert assigned.filter(F.col("cell_id").isNull()).count() == 0
    # cells cover all vectors exactly once
    assert assigned.select("vec_id").distinct().count() == embeddings.count()


def test_ivf_recall_at_10(spark, embeddings):
    assigned, centroids = ivf_build(embeddings, k_cells=8)
    recalls = []
    for qid in [0, 5, 11, 17, 23]:
        qv = embeddings.filter(F.col("vec_id") == qid).first()["embedding"]
        exact = [r["vec_id"] for r in topk_search(embeddings, qv, 10, strength=0).collect()]
        approx = [
            r["vec_id"]
            for r in ivf_search(assigned, centroids, qv, 10, nprobe=6).collect()
        ]
        recalls.append(_recall(approx, exact))
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.85, f"IVF recall@10 {avg} (per-query {recalls})"


def test_ivf_exact_pruned_matches_brute_force(spark, embeddings):
    """Bound-based pruning must return EXACTLY the brute-force top-K."""
    from astro_vectordb_spark.operators.ann import ivf_cell_stats, ivf_search_exact

    assigned, centroids = ivf_build(embeddings, k_cells=8)
    stats = ivf_cell_stats(assigned, centroids)
    for qid in [0, 5, 17]:
        qv = embeddings.filter(F.col("vec_id") == qid).first()["embedding"]
        exact = topk_search(embeddings, qv, 10, strength=0).collect()
        pruned = ivf_search_exact(
            assigned, centroids, stats, qv, 10, nprobe_seed=2
        ).collect()
        assert [r["vec_id"] for r in pruned] == [r["vec_id"] for r in exact]
        for a, b in zip(pruned, exact):
            assert abs(a["score"] - b["score"]) < 1e-9


def test_ivf_exact_pruned_euclidean(spark, embeddings):
    from astro_vectordb_spark.operators.ann import ivf_cell_stats, ivf_search_exact

    assigned, centroids = ivf_build(embeddings, k_cells=8, metric="euclidean")
    stats = ivf_cell_stats(assigned, centroids, metric="euclidean")
    qv = embeddings.filter(F.col("vec_id") == 5).first()["embedding"]
    exact = topk_search(embeddings, qv, 10, strength=0, metric="euclidean").collect()
    pruned = ivf_search_exact(
        assigned, centroids, stats, qv, 10, nprobe_seed=2, metric="euclidean"
    ).collect()
    assert [r["vec_id"] for r in pruned] == [r["vec_id"] for r in exact]


def test_ivf_candidate_reduction(spark, embeddings):
    """nprobe/k_cells of the corpus is actually scanned (>=2x reduction
    at nprobe=4, k=8; BASELINE.md targets >=5x at nprobe=2, k=16)."""
    assigned, centroids = ivf_build(embeddings, k_cells=8)
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    from astro_vectordb_spark.operators.ann import choose_probe_cells

    cells = choose_probe_cells(centroids, qv, nprobe=2)
    scanned = assigned.filter(F.col("cell_id").isin(cells)).count()
    assert scanned < embeddings.count() / 2


def test_ivf_batch_matches_single(spark, embeddings):
    assigned, centroids = ivf_build(embeddings, k_cells=8)
    queries = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = ivf_batch_search(assigned, centroids, queries, k=5, nprobe=4)
    rows = batch.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, qrows in by_q.items():
        qv = embeddings.filter(F.col("vec_id") == qid).first()["embedding"]
        single = ivf_search(assigned, centroids, qv, 5, nprobe=4).collect()
        assert sorted(r["vec_id"] for r in qrows) == sorted(
            r["vec_id"] for r in single
        )


def test_ivf_build_sampled_same_contract(spark, embeddings):
    from astro_vectordb_spark.operators.ann import ivf_build_sampled

    assigned, centroids = ivf_build_sampled(embeddings, k_cells=8)
    assert assigned.count() == embeddings.count()
    assert centroids.count() == 8
    assert assigned.filter(F.col("cell_id").isNull()).count() == 0
    # deterministic across runs
    a2, _ = ivf_build_sampled(embeddings, k_cells=8)
    m1 = {r["vec_id"]: r["cell_id"] for r in assigned.collect()}
    m2 = {r["vec_id"]: r["cell_id"] for r in a2.collect()}
    assert m1 == m2
    # search works on top of it with reasonable recall
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = [r["vec_id"] for r in topk_search(embeddings, qv, 10, strength=0).collect()]
    approx = [
        r["vec_id"] for r in ivf_search(assigned, centroids, qv, 10, nprobe=6).collect()
    ]
    assert _recall(approx, exact) >= 0.6


def test_ivf_append_incremental(spark, embeddings):
    """New rows join the index under existing centroids; searches see
    them; old assignments untouched."""
    from astro_vectordb_spark.operators.ann import ivf_append, ivf_build_sampled

    old = embeddings.filter(F.col("vec_id") < 400)
    new = embeddings.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    assigned, centroids = ivf_build_sampled(old, k_cells=8)
    combined = ivf_append(
        assigned.select("vec_id", "embedding", "cell_id"), centroids, new
    )
    assert combined.count() == embeddings.count()
    # a query equal to an appended vector finds it (full-probe search)
    probe = embeddings.filter(F.col("vec_id") == 450).first()["embedding"]
    hits = ivf_search(combined, centroids, probe, 3, nprobe=8).collect()
    assert hits[0]["vec_id"] == 450
    # existing rows kept their assignment
    before = {r["vec_id"]: r["cell_id"] for r in assigned.select("vec_id", "cell_id").collect()}
    after = {r["vec_id"]: r["cell_id"]
             for r in combined.filter(F.col("vec_id") < 400).collect()}
    assert before == after


def test_ivf_spill_assignment(spark, embeddings):
    """spill=2: each vector in its 2 nearest cells; searches dedupe and
    recall does not regress vs single assignment at equal nprobe."""
    from astro_vectordb_spark.operators.ann import ivf_build_sampled

    a1, c1 = ivf_build_sampled(embeddings, k_cells=8, spill=1)
    a2, c2 = ivf_build_sampled(embeddings, k_cells=8, spill=2)
    n = embeddings.count()
    assert a1.count() == n
    assert a2.count() == 2 * n
    assert a2.select("vec_id").distinct().count() == n

    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = [r["vec_id"] for r in topk_search(embeddings, qv, 10, strength=0).collect()]
    r1 = [r["vec_id"] for r in ivf_search(a1, c1, qv, 10, nprobe=4).collect()]
    r2 = [r["vec_id"] for r in ivf_search(a2, c2, qv, 10, nprobe=4).collect()]
    assert len(r2) == len(set(r2))  # deduped
    assert _recall(r2, exact) >= _recall(r1, exact)


def test_brp_lsh_topk_recall(spark, embeddings):
    from astro_vectordb_spark.operators.ann import brp_lsh_topk

    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    exact = [
        r["vec_id"]
        for r in topk_search(embeddings, qv, 10, strength=0, metric="euclidean").collect()
    ]
    approx = [r["vec_id"] for r in brp_lsh_topk(embeddings, qv, 10).collect()]
    assert len(approx) == 10
    assert _recall(approx, exact) >= 0.5  # stock-LSH baseline, loose bar


def test_ivf_batch_recall_vs_exact_batch(spark, embeddings):
    assigned, centroids = ivf_build(embeddings, k_cells=8)
    queries = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = batch_topk(embeddings, queries, k=10)
    approx = ivf_batch_search(assigned, centroids, queries, k=10, nprobe=6)
    e, a = {}, {}
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(a.get(q, set()) & e[q]) / len(e[q]) for q in e]
    assert sum(recalls) / len(recalls) >= 0.85, recalls


def test_ivf_batch_search_dedupes_spill_copies(spark, embeddings):
    """spill=2 batch path: a vector probed via two cells by the same
    query appears at most once in that query's top-K."""
    from astro_vectordb_spark.operators.ann import ivf_build_sampled

    assigned, centroids = ivf_build_sampled(embeddings, k_cells=8, spill=2)
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_batch_search(assigned, centroids, queries, k=10, nprobe=4)
    rows = out.collect()
    seen = {}
    for r in rows:
        key = (r["query_id"], r["vec_id"])
        assert key not in seen, f"duplicate {key} in batch top-K"
        seen[key] = True
    # self-match survives dedup and still ranks first
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, hits in by_q.items():
        best = min(hits, key=lambda r: r["rank"])
        assert best["vec_id"] == q


def test_ivf_append_refreshes_cell_stats(spark, embeddings):
    """ivf_append(cell_stats=...) widens radii so ivf_search_exact
    stays exact after an append (the stale-stats pruning hazard)."""
    from astro_vectordb_spark.operators.ann import (
        ivf_append,
        ivf_build_sampled,
        ivf_cell_stats,
        ivf_search_exact,
    )

    old = embeddings.filter(F.col("vec_id") < 400)
    new = embeddings.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    assigned, centroids = ivf_build_sampled(old, k_cells=8)
    assigned = assigned.select("vec_id", "embedding", "cell_id")
    stats0 = ivf_cell_stats(assigned, centroids)
    combined, stats1 = ivf_append(
        assigned, centroids, new, cell_stats=stats0
    )
    # updated stats: radius never shrinks (min_sim never grows)
    s0 = {r["cell_id"]: r["min_sim"] for r in stats0.collect()}
    s1 = {r["cell_id"]: r["min_sim"] for r in stats1.collect()}
    assert set(s1) >= set(s0)
    for cid, v in s0.items():
        assert s1[cid] <= v + 1e-12
    # exact search with refreshed stats matches brute force
    qv = embeddings.filter(F.col("vec_id") == 450).first()["embedding"]
    exact = [
        r["vec_id"]
        for r in topk_search(embeddings, qv, 10, strength=0).collect()
    ]
    got = [
        r["vec_id"]
        for r in ivf_search_exact(
            combined, centroids, stats1, qv, 10, nprobe_seed=2
        ).collect()
    ]
    assert got == exact


def test_ivf_exact_pruned_engages_on_clustered_corpus(spark):
    """On a clustered corpus the spherical bound actually prunes:
    scan fraction < 0.5 (vs ~1.0 on random data), while results stay
    exactly equal to brute force (the guarantee is unconditional)."""
    import numpy as np

    from astro_vectordb_spark.operators.ann import (
        ivf_cell_stats,
        ivf_exact_pruned_cells,
        ivf_search_exact,
        rp_build,
    )

    rng = np.random.RandomState(0)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = [
        (i, [float(x) for x in centers[i % 16] + 0.01 * rng.normal(size=64)])
        for i in range(1000)
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>").cache()
    assigned, cents = rp_build(df, n_planes=5, dim=64)
    assigned = assigned.cache()
    stats = ivf_cell_stats(assigned, cents)

    fracs = []
    for q in (0, 7, 11):
        scanned, total = ivf_exact_pruned_cells(
            assigned, cents, stats, pts[q][1], 10, nprobe_seed=2
        )
        fracs.append(scanned / total)
        exact = [
            r["vec_id"]
            for r in topk_search(df, pts[q][1], 10, strength=0).collect()
        ]
        got = [
            r["vec_id"]
            for r in ivf_search_exact(
                assigned, cents, stats, pts[q][1], 10, nprobe_seed=2
            ).collect()
        ]
        assert got == exact
    assert sum(fracs) / len(fracs) < 0.5, fracs


def test_ivf_baseline_target_retirement_pareto_pin(spark, embeddings):
    """BASELINE.md's ANN row (recall@10 >= 0.9 AND >= 5x candidate
    reduction) is carried by the sharded HNSW path (0.98 @ 8x, see
    bench ann_metrics); the IVF-approx path is formally RETIRED from
    that obligation on near-random corpora — coarse quantization is
    dimensionality-limited when the data has no cluster structure
    (measured grid, NOTES_r2.md).  This test pins both halves so the
    claim stays measured, not asserted:

    1. the bench corpus's Pareto point cannot silently regress
       (recall and candidate fraction stay inside the measured band);
    2. on a corpus WITH cluster structure, the same IVF operator DOES
       meet the full >= 5x @ >= 0.9 target — the limitation is the
       corpus, not the implementation.
    """
    import numpy as np

    from astro_vectordb_spark.operators.ann import (
        choose_probe_cells,
        ivf_build,
        ivf_build_sampled,
        ivf_search,
    )

    # --- 1. Pareto pin at bench parameters on the near-random corpus
    n_corpus = embeddings.count()
    assigned, centroids = ivf_build_sampled(embeddings, k_cells=12, spill=2)
    assigned = assigned.cache()
    qids = [0, 5, 11, 17, 23]
    recalls, fracs = [], []
    for qid in qids:
        qv = embeddings.filter(F.col("vec_id") == qid).first()["embedding"]
        exact = [
            r["vec_id"]
            for r in topk_search(embeddings, qv, 10, strength=0).collect()
        ]
        got = [
            r["vec_id"]
            for r in ivf_search(assigned, centroids, qv, 10, nprobe=3).collect()
        ]
        recalls.append(_recall(got, exact))
        cells = choose_probe_cells(centroids, qv, 3)
        n_cand = (
            assigned.filter(F.col("cell_id").isin(cells))
            .select("vec_id").distinct().count()
        )
        fracs.append(n_cand / n_corpus)
    avg_rec, avg_frac = sum(recalls) / len(recalls), sum(fracs) / len(fracs)
    # measured band at THIS fixture scale (sf0.001: 500 rows, ~40/cell,
    # avg recall 0.72 — small cells punish coarse quantization harder
    # than sf0.1's 0.90): silent recall loss or fraction blow-up fails
    # loudly; improving either is fine
    assert avg_rec >= 0.6, (avg_rec, recalls)
    assert avg_frac <= 0.6, (avg_frac, fracs)

    # --- 2. full BASELINE target met on a clustered corpus
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = [
        (i, [float(x) for x in centers[i % 16] + 0.02 * rng.normal(size=64)])
        for i in range(2000)
    ]
    cdf = spark.createDataFrame(pts, "vec_id long, embedding array<float>").cache()
    ca, cc = ivf_build(cdf, k_cells=16, seed=3)
    ca = ca.cache()
    crec, cfrac = [], []
    for q in (0, 3, 7, 11, 13):
        qv = pts[q][1]
        exact = [
            r["vec_id"] for r in topk_search(cdf, qv, 10, strength=0).collect()
        ]
        got = [
            r["vec_id"] for r in ivf_search(ca, cc, qv, 10, nprobe=2).collect()
        ]
        crec.append(_recall(got, exact))
        cells = choose_probe_cells(cc, qv, 2)
        cfrac.append(
            ca.filter(F.col("cell_id").isin(cells)).count() / 2000
        )
    assert sum(crec) / len(crec) >= 0.9, crec
    assert sum(cfrac) / len(cfrac) <= 0.2, cfrac  # >= 5x reduction


class TestAdaptiveNprobe:
    """nprobe=None derives probed cells from the query's
    centroid-similarity profile instead of a fixed count — the rule
    that replaced the recall gate's small-corpus special case."""

    def _clustered(self, spark, n=1000, centers=16, sigma=0.01):
        import numpy as np

        rng = np.random.RandomState(3)
        C = rng.normal(size=(centers, 64))
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        pts = [
            (i, [float(x) for x in C[i % centers] + sigma * rng.normal(size=64)])
            for i in range(n)
        ]
        return (
            spark.createDataFrame(pts, "vec_id long, embedding array<float>"),
            pts,
        )

    def test_clustered_probes_few_cells_full_recall(self, spark):
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
        )

        df, pts = self._clustered(spark)
        assigned, cents = ivf_build(df, k_cells=16)
        k_cells = cents.count()
        for qid in (0, 5, 9):
            cells = choose_probe_cells_adaptive(cents, pts[qid][1])
            # tight clusters: a handful of standout cells, not all
            assert len(cells) < k_cells / 2, (qid, len(cells))
            exact = [
                r["vec_id"]
                for r in topk_search(df, pts[qid][1], 10, strength=0).collect()
            ]
            got = [
                r["vec_id"]
                for r in ivf_search(
                    assigned, cents, pts[qid][1], 10, nprobe=None
                ).collect()
            ]
            assert _recall(got, exact) == 1.0

    def test_uniform_probes_all_cells_equals_exact(self, spark, embeddings):
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
        )

        assigned, cents = ivf_build(embeddings, k_cells=8)
        qv = embeddings.filter(F.col("vec_id") == 3).first()["embedding"]
        cells = choose_probe_cells_adaptive(cents, qv)
        # near-uniform vectors: no standout cell -> every cell probed,
        # search degenerates gracefully to the exact scan
        assert len(cells) == 8
        exact = [
            r["vec_id"] for r in topk_search(embeddings, qv, 10, strength=0).collect()
        ]
        got = [
            r["vec_id"]
            for r in ivf_search(assigned, cents, qv, 10, nprobe=None).collect()
        ]
        assert got == exact

    def test_deterministic(self, spark):
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
        )

        df, pts = self._clustered(spark, n=400)
        _, cents = ivf_build(df, k_cells=8)
        a = choose_probe_cells_adaptive(cents, pts[1][1])
        b = choose_probe_cells_adaptive(cents, pts[1][1])
        assert a == b


class TestAdaptiveBatchNprobe:
    """nprobe=None on the BATCH face: the adaptive profile rule as one
    distributed window over the (|Q| x k_cells) ranking table — no
    driver-side per-query loop, so it scales to unbounded query sets."""

    def test_batch_adaptive_matches_single_adaptive(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        C = rng.normal(size=(16, 64))
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        pts = [
            (i, [float(x) for x in C[i % 16] + 0.01 * rng.normal(size=64)])
            for i in range(800)
        ]
        df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
        assigned, cents = ivf_build(df, k_cells=16)
        queries = spark.createDataFrame(
            [(q, pts[q][1]) for q in (0, 5, 9)],
            "query_id long, query_vec array<float>",
        )
        batch = ivf_batch_search(
            assigned, cents, queries, 10, nprobe=None
        ).toPandas()
        for q in (0, 5, 9):
            single = [
                r["vec_id"]
                for r in ivf_search(
                    assigned, cents, pts[q][1], 10, nprobe=None
                ).collect()
            ]
            got = (
                batch[batch.query_id == q]
                .sort_values(["score", "vec_id"], ascending=[False, True])
                .vec_id.tolist()
            )
            assert got == single, q

    def test_batch_adaptive_uniform_equals_exact(self, spark, embeddings):
        assigned, cents = ivf_build(embeddings, k_cells=8)
        qrows = embeddings.filter(F.col("vec_id").isin([2, 7])).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        batch = ivf_batch_search(
            assigned, cents, qrows, 10, nprobe=None
        ).toPandas()
        for q in (2, 7):
            qv = embeddings.filter(F.col("vec_id") == q).first()["embedding"]
            exact = [
                r["vec_id"] for r in topk_search(embeddings, qv, 10, strength=0).collect()
            ]
            got = (
                batch[batch.query_id == q]
                .sort_values(["score", "vec_id"], ascending=[False, True])
                .vec_id.tolist()
            )
            # uniform corpus -> the rule probes all cells -> exact
            assert got == exact, q


class TestAdaptiveProbeCap:
    """Round-11 ADVICE: the adaptive default's all-cells fallback is
    recall-first (and load-bearing for the small-k exactness gates);
    max_probe_frac is the opt-in cost ceiling for serving."""

    def test_cap_bounds_fallback_on_uniform_corpus(self, spark, embeddings):
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
        )

        _, cents = ivf_build(embeddings, k_cells=8)
        qv = embeddings.filter(F.col("vec_id") == 3).first()["embedding"]
        # uncapped: no standout -> all 8 cells (the default contract)
        assert len(choose_probe_cells_adaptive(cents, qv)) == 8
        capped = choose_probe_cells_adaptive(cents, qv, max_probe_frac=0.25)
        assert len(capped) == 2  # ceil(0.25 * 8), >= min_probe floor
        # the cap keeps the TOP-similarity cells: they must be a prefix
        # of the similarity-ordered uncapped ranking
        from astro_vectordb_spark.operators.ann import choose_probe_cells

        assert capped == choose_probe_cells(cents, qv, 2)

    def test_cap_does_not_loosen_structured_selection(self, spark):
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
        )

        df, pts = TestAdaptiveNprobe._clustered(
            TestAdaptiveNprobe(), spark
        )
        _, cents = ivf_build(df, k_cells=16)
        qv = pts[0][1]
        base = choose_probe_cells_adaptive(cents, qv)
        wide = choose_probe_cells_adaptive(cents, qv, max_probe_frac=1.0)
        assert sorted(base) == sorted(wide)  # frac=1.0 is a no-op
        tight = choose_probe_cells_adaptive(cents, qv, max_probe_frac=0.125)
        assert len(tight) <= max(2, -(-16 // 8))
        assert set(tight) <= set(base) or len(tight) == 2

    def test_batch_cap_matches_driver_rule(self, spark, embeddings):
        """The distributed window cap == the driver-side rule's cap,
        per query."""
        from astro_vectordb_spark.operators.ann import (
            choose_probe_cells_adaptive,
            probe_table_batch,
        )

        _, cents = ivf_build(embeddings, k_cells=8)
        qrows = [
            (int(r["vec_id"]), r["embedding"])
            for r in embeddings.filter(F.col("vec_id") < 4).collect()
        ]
        queries = spark.createDataFrame(
            qrows, "query_id long, query_vec array<float>"
        )
        got = {}
        for r in probe_table_batch(
            queries, cents, None, max_probe_frac=0.25
        ).collect():
            got.setdefault(int(r["query_id"]), set()).add(int(r["cell_id"]))
        for qid, qv in qrows:
            want = set(
                choose_probe_cells_adaptive(cents, qv, max_probe_frac=0.25)
            )
            assert got[qid] == want, qid

    def test_facade_cap_passthrough_serves(self, spark, embeddings, tmp_path):
        """search(max_probe_frac=) reaches the IVF path and still
        returns k well-formed rows."""
        from astro_vectordb_spark.search import search
        from astro_vectordb_spark.sources.vault import save_ivf_index

        assigned, cents = ivf_build(embeddings, k_cells=8)
        path = str(tmp_path / "ivf")
        save_ivf_index(assigned, cents, path)
        qv = embeddings.filter(F.col("vec_id") == 3).first()["embedding"]
        out = search(spark, path, qv, k=5, max_probe_frac=0.25).collect()
        assert len(out) == 5
