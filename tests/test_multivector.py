"""Chunking + late-interaction MaxSim retrieval."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from astro_vectordb_spark.operators.multivector import (
    chunk_documents,
    maxsim_score_all,
    maxsim_topk,
)


@pytest.fixture(scope="module")
def chunky_docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(23))),  # 23 tokens
        (1, "a b c"),                               # shorter than window
        (2, ""),                                    # empty -> no chunks
        (3, " ".join(f"w{i}" for i in range(10))),  # exactly one window
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_boundaries(chunky_docs):
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(chunky_docs, chunk_tokens=10, stride=5).collect()
    }
    # doc 0: starts 0,5,10 -> windows [0:10],[5:15],[10:20] and the
    # greatest() cap puts the last start at len-chunk rounded to
    # stride grid: starts = sequence(0, 13, 5) = 0,5,10
    assert got[(0, 0)][0] == 10 and got[(0, 0)][1].startswith("w0 w1")
    assert got[(0, 1)][1].startswith("w5 w6")
    assert got[(0, 2)][0] == 10
    assert (0, 3) not in got
    # doc 1: one partial window
    assert got[(1, 0)] == (3, "a b c")
    # doc 2: no chunks at all
    assert not any(d == 2 for d, _ in got)
    # doc 3: exactly one full window
    assert got[(3, 0)][0] == 10 and (3, 1) not in got


def test_chunking_lowercases_tokens(spark):
    docs = spark.createDataFrame([(0, "Foo BAR baz")], "doc_id long, text string")
    r = chunk_documents(docs, 10, 5).collect()[0]
    assert r["chunk_text"] == "foo bar baz"


def test_maxsim_matches_manual(spark):
    # 3 docs x up-to-3 chunks with hand-set 4-d vectors
    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (0, 1, [0.0, 1.0, 0.0, 0.0]),
        (1, 0, [0.7, 0.7, 0.0, 0.0]),
        (2, 0, [0.0, 0.0, 1.0, 0.0]),
    ]
    cv = spark.createDataFrame(
        rows, "doc_id long, chunk_id int, embedding array<float>"
    )
    q = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    got = {
        r["doc_id"]: r["score"]
        for r in maxsim_score_all(cv, q).collect()
    }
    # doc 0: max cos q0 = 1 (chunk 0), max cos q1 = 1 (chunk 1) -> 2
    assert got[0] == pytest.approx(2.0, abs=1e-9)
    # doc 1: single chunk at 45 degrees to both -> 2 * cos(45)
    assert got[1] == pytest.approx(2 * 0.7 / np.sqrt(0.98), abs=1e-9)
    # doc 2: orthogonal to both -> 0
    assert got[2] == pytest.approx(0.0, abs=1e-9)
    top = maxsim_topk(cv, q, k=2).collect()
    assert [r["doc_id"] for r in top] == [0, 1]


def test_maxsim_self_query_ranks_source_doc_first(spark, documents):
    from astro_vectordb_spark.functions.embed import embed_text

    chunks = chunk_documents(documents.limit(100), chunk_tokens=10, stride=5)
    cvecs = embed_text(chunks, text_col="chunk_text")
    qvs = [
        r["embedding"]
        for r in cvecs.filter(
            (F.col("doc_id") == 0) & (F.col("chunk_id") < 2)
        ).orderBy("chunk_id").collect()
    ]
    top = maxsim_topk(cvecs, qvs, k=3).collect()
    assert top[0]["doc_id"] == 0
    # both query chunks match themselves exactly -> score ~= |Q|
    assert top[0]["score"] == pytest.approx(2.0, abs=1e-5)


def test_maxsim_empty_queries_raises(spark):
    cv = spark.createDataFrame(
        [(0, 0, [1.0, 0.0])], "doc_id long, chunk_id int, embedding array<float>"
    )
    with pytest.raises(ValueError):
        maxsim_topk(cv, [], k=3)


def test_chunk_bad_params_raise(chunky_docs):
    with pytest.raises(ValueError):
        chunk_documents(chunky_docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(chunky_docs, stride=0)
