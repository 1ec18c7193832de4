"""Int8 quantization tests: code validity, bounded score error,
two-stage exact-rerank agreement, and the plan property that stage 1
never reads the float column."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.operators.quantize import (
    dequantize_expr,
    quantize_embeddings,
    topk_search_quantized,
)
from astro_vectordb_spark.operators.topk import topk_search


def test_quantize_codes_and_reconstruction(spark, embeddings):
    q = quantize_embeddings(embeddings)
    rows = q.select(
        "vec_id",
        "qvec",
        "qscale",
        dequantize_expr().alias("xhat"),
    ).join(embeddings, "vec_id").collect()
    assert len(rows) == embeddings.count()
    for r in rows[:50]:
        assert all(-127 <= c <= 127 for c in r["qvec"]), r["vec_id"]
        assert r["qscale"] > 0
        # reconstruction error per coordinate <= s/2 (half-up rounding)
        for x, xh in zip(r["embedding"], r["xhat"]):
            assert abs(float(x) - xh) <= r["qscale"] / 2 + 1e-12


def test_quantized_scores_close_to_exact(spark, embeddings):
    """Cosine on dequantized vectors stays within the int8 error band
    of the exact score (the bound stage-2's refine_factor relies on)."""
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    q = quantize_embeddings(embeddings)
    from astro_vectordb_spark.functions.vector import similarity

    lit_q = F.array(*[F.lit(float(x)) for x in qv])
    approx = {
        r["vec_id"]: r["qs"]
        for r in q.select(
            "vec_id", similarity(dequantize_expr(), lit_q).alias("qs")
        ).collect()
    }
    exact = {
        r["vec_id"]: r["score"]
        for r in topk_search(
            embeddings, qv, k=embeddings.count(), strength=0
        ).collect()
    }
    errs = [abs(approx[v] - exact[v]) for v in exact]
    assert max(errs) < 0.02, max(errs)


def test_topk_quantized_matches_exact_topk(spark, embeddings):
    """Two-stage (quantized scan -> exact rerank) returns the same ids
    and scores as full-precision brute force at refine_factor=4."""
    qv = embeddings.filter(F.col("vec_id") == 7).first()["embedding"]
    got = topk_search_quantized(
        quantize_embeddings(embeddings), embeddings, qv, k=10, strength=0
    ).collect()
    want = topk_search(embeddings, qv, k=10, strength=0).select(
        "vec_id", "score"
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]


def test_topk_quantized_stage1_reads_only_compact_columns(
    spark, embeddings, tmp_path
):
    """The point of quantization is IO: when the quantized table is
    persisted, stage 1's scan must read ONLY (vec_id, qvec, qscale) —
    the float embedding column appears in no parquet ReadSchema except
    the (broadcast-bounded) stage-2 fetch."""
    import re

    from astro_vectordb_spark.plans.explain import executed_plan

    qp = str(tmp_path / "quantized")
    ep = str(tmp_path / "orig")
    quantize_embeddings(embeddings).write.parquet(qp)
    embeddings.select("vec_id", "embedding").write.parquet(ep)
    qdf = spark.read.parquet(qp)
    edf = spark.read.parquet(ep)
    qv = embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    df = topk_search_quantized(qdf, edf, qv, k=10, strength=0)
    assert df.count() == 10
    plan = executed_plan(df)
    schemas = re.findall(r"ReadSchema: (struct<[^>]*>)", plan)
    assert schemas, plan
    emb_scans = [s for s in schemas if "embedding" in s]
    compact_scans = [s for s in schemas if "qvec" in s]
    # the compact scan never includes the float column
    assert compact_scans and all("embedding" not in s for s in compact_scans)
    # exactly one scan (stage 2) touches the float column
    assert len(emb_scans) == 1, schemas


def test_topk_quantized_euclidean_metric(spark, embeddings):
    """Metric dispatch works through both stages (euclidean similarity
    1/(1+d)): two-stage matches exact brute force."""
    qv = embeddings.filter(F.col("vec_id") == 3).first()["embedding"]
    got = topk_search_quantized(
        quantize_embeddings(embeddings), embeddings, qv, k=5,
        strength=0, metric="euclidean",
    ).collect()
    want = topk_search(
        embeddings, qv, k=5, strength=0, metric="euclidean"
    ).select("vec_id", "score").collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in want
    ]


def test_batch_topk_quantized_matches_batch_topk(spark, embeddings):
    """Batch two-stage matches full-precision batch_topk per query at
    refine_factor=4 (ids, scores, ranks)."""
    from astro_vectordb_spark.operators.quantize import batch_topk_quantized
    from astro_vectordb_spark.operators.topk import batch_topk

    queries = embeddings.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["score"])
        for r in batch_topk_quantized(
            quantize_embeddings(embeddings), embeddings, queries, k=5
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["score"])
        for r in batch_topk(embeddings, queries, k=5).collect()
    )
    assert got == want
