"""Tests: embedding hook, kNN classify, validation, bucketed storage."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.functions.embed import embed_text
from astro_vectordb_spark.operators.classify import knn_classify
from astro_vectordb_spark.operators.crud import validate_embeddings


def test_embed_text_contract(spark, documents):
    out = embed_text(documents.limit(30), dim=32)
    rows = out.select("doc_id", "embedding").collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["embedding"]) == 32
        n = sum(x * x for x in r["embedding"]) ** 0.5
        assert abs(n - 1.0) < 1e-5  # unit-normalized
    # deterministic
    again = {r["doc_id"]: r["embedding"] for r in
             embed_text(documents.limit(30), dim=32).select("doc_id", "embedding").collect()}
    assert all(again[r["doc_id"]] == r["embedding"] for r in rows)


def test_embedding_similarity_structure(spark):
    """Near-identical token bags must embed closer than disjoint ones."""
    from astro_vectordb_spark.functions.vector import cosine_similarity

    df = spark.createDataFrame(
        [
            (0, "spark engine query plan optimizer"),
            (1, "spark engine query plan optimizers"),
            (2, "unrelated words entirely different topic"),
        ],
        "doc_id long, text string",
    )
    emb = embed_text(df)
    e = {r["doc_id"]: r["embedding"] for r in emb.collect()}
    base = spark.createDataFrame([(e[0], e[1], e[2])], "a array<float>, b array<float>, c array<float>")
    row = base.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("near"),
        cosine_similarity(F.col("a"), F.col("c")).alias("far"),
    ).first()
    assert row["near"] > row["far"]


def test_knn_classify_self_consistent(spark, embeddings):
    """With k=1 and self included, every query predicts its own label."""
    queries = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pred = knn_classify(embeddings, queries, k=1, exclude_self=False)
    truth = {r["vec_id"]: r["label"] for r in embeddings.filter(F.col("vec_id") < 20).collect()}
    got = {r["query_id"]: r["pred_label"] for r in pred.collect()}
    assert got == truth


def test_knn_classify_excludes_self(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pred = knn_classify(embeddings, queries, k=10, exclude_self=True).collect()
    assert len(pred) == 5
    for r in pred:
        assert 1 <= r["votes"] <= 10


def test_validate_embeddings(spark, embeddings):
    bad = embeddings.limit(5).withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0, F.lit(None).cast("array<float>"))
        .when(F.col("vec_id") == 1, F.array(F.lit(1.0)).cast("array<float>"))
        .otherwise(F.col("embedding")),
    )
    flagged = {r["vec_id"]: r["valid"] for r in validate_embeddings(bad, 64).collect()}
    assert flagged[0] is False and flagged[1] is False and flagged[2] is True
    assert validate_embeddings(bad, 64, mode="drop").count() == 3


def test_bucketed_join_avoids_exchange_on_base(spark, embeddings, tmp_path):
    from astro_vectordb_spark.plans.explain import executed_plan
    from astro_vectordb_spark.sources.vault import load_bucketed, save_bucketed

    # session warehouse dir is set in conftest (static conf)
    save_bucketed(embeddings.select("vec_id", "embedding"), "emb_bucketed", buckets=8)
    try:
        base = load_bucketed(spark, "emb_bucketed")
        delta = embeddings.select("vec_id", "embedding").limit(10)
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = base.join(delta.hint("shuffle_hash"), "vec_id")
            plan = executed_plan(joined)
            # bucketed side must not re-shuffle: exactly one Exchange (delta side)
            assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS emb_bucketed")


class TestEncoderRegistry:
    """Pluggable model hook: register_encoder(name, factory) ->
    embed_text(model=name) — drop in a real encoder without touching
    any operator (the Spark analogue of the reference's external
    vectorizer recommendation, README.md:99-109)."""

    def test_injected_model_end_to_end(self, spark, documents):
        import numpy as np
        import pandas as pd

        from astro_vectordb_spark.functions import embed as E

        def toy_factory(dim=4, scale=1.0, **_):
            # trivial injected model: [n_chars, n_tokens, 1, scale],
            # lazily "loaded" per worker like a real encoder would be
            def kernel(texts: pd.Series) -> pd.Series:
                if not hasattr(kernel, "_loaded"):
                    kernel._loaded = True
                return pd.Series([
                    np.array(
                        [len(t or ""), len((t or "").split()), 1.0, scale],
                        dtype=np.float32,
                    )
                    for t in texts
                ])
            return kernel

        E.register_encoder("toy", toy_factory)
        try:
            out = {
                r["doc_id"]: r["embedding"]
                for r in E.embed_text(
                    documents.limit(5), model="toy", dim=4, scale=2.5
                ).select("doc_id", "embedding").collect()
            }
            docs = {
                r["doc_id"]: r["text"]
                for r in documents.limit(5).collect()
            }
            for did, text in docs.items():
                assert out[did] == [
                    float(len(text or "")),
                    float(len((text or "").split())),
                    1.0,
                    2.5,
                ]
        finally:
            E._ENCODER_REGISTRY.pop("toy", None)

    def test_unknown_model_raises_with_registry_listing(self, spark, documents):
        import pytest as _pytest

        from astro_vectordb_spark.functions.embed import embed_text

        with _pytest.raises(ValueError, match="hash"):
            embed_text(documents.limit(1), model="no-such-model")

    def test_hash_is_registered_default(self, spark, documents):
        from astro_vectordb_spark.functions.embed import embed_text

        stub = {r["doc_id"]: r["embedding"] for r in
                embed_text(documents.limit(5), dim=16)
                .select("doc_id", "embedding").collect()}
        named = {r["doc_id"]: r["embedding"] for r in
                 embed_text(documents.limit(5), model="hash", dim=16)
                 .select("doc_id", "embedding").collect()}
        assert stub == named
