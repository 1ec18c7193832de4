"""Tests for text functions and text-analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from astro_vectordb_spark.functions import text as T
from astro_vectordb_spark.operators.text_analysis import (
    doc_fingerprints,
    language_id,
    quality_scores,
    text_stats,
)


def _one(spark, col, text):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col.alias("v"))
        .first()["v"]
    )


def test_tokens_and_counts(spark):
    assert _one(spark, T.token_count(F.col("text")), "  a  bb   ccc ") == 3
    assert _one(spark, T.token_count(F.col("text")), "") == 0
    assert _one(spark, T.avg_token_len(F.col("text")), "a bb ccc") == 2.0


def test_bpe_ish_token_count(spark):
    # ceil(1/4)+ceil(2/4)+ceil(8/4) = 1+1+2
    assert _one(spark, T.bpe_ish_token_count(F.col("text")), "a bb abcdefgh") == 4


def test_shingles(spark):
    got = _one(spark, T.word_shingles(F.col("text"), 2), "a b c d")
    assert got == ["a b", "b c", "c d"]
    # short doc -> no shingles (guard against sequence() descending)
    assert _one(spark, T.word_shingles(F.col("text"), 3), "a b") == []
    # distinctness
    got = _one(spark, T.word_shingles(F.col("text"), 2), "x y x y x")
    assert sorted(got) == ["x y", "y x"]


def test_fingerprint_normalization(spark):
    a = _one(spark, T.fingerprint(F.col("text")), "Hello   World")
    b = _one(spark, T.fingerprint(F.col("text")), "  hello world ")
    assert a == b
    c = _one(spark, T.sorted_token_fingerprint(F.col("text")), "world hello")
    d = _one(spark, T.sorted_token_fingerprint(F.col("text")), "hello world hello")
    assert c == d


def test_lang_id(spark):
    assert _one(spark, T.lang_id(F.col("text")), "the cat and the dog is here") == "en"
    assert _one(spark, T.lang_id(F.col("text")), "el perro y la casa de que") == "es"
    assert _one(spark, T.lang_id(F.col("text")), "zzz qqq www") == "und"


def test_text_stats_operator(spark, documents):
    stats = text_stats(documents)
    rows = stats.limit(5).collect()
    assert {r["doc_id"] for r in rows} is not None
    for r in rows:
        assert r["n_tokens"] > 0
        assert r["n_subwords"] >= r["n_tokens"]  # pieces >= words
        assert 0 <= r["stopword_ratio"] <= 1


def test_quality_scores_bounded(spark, documents):
    q = quality_scores(documents)
    bad = q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_language_id_operator(spark, documents):
    out = language_id(documents).limit(20).collect()
    for r in out:
        total = sum(r[f"hits_{lang}"] for lang in sorted(T.STOPWORDS))
        if total == 0:
            assert r["lang_pred"] == "und"
        else:
            assert r["lang_pred"] in T.STOPWORDS


def test_doc_fingerprints_unique_per_distinct_text(spark, documents):
    fp = doc_fingerprints(documents)
    n_text = documents.select("text").distinct().count()
    assert fp.select("fp_exact").distinct().count() == n_text
