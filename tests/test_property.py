"""Property/metamorphic tests (SURVEY.md §5.3) with hypothesis.

Strategy note: one Spark job per hypothesis example would be very slow,
so each property generates a BATCH of cases, runs one DataFrame job,
and checks all rows against numpy.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from astro_vectordb_spark.functions.vector import (
    cosine_similarity,
    euclidean_similarity,
)

finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
)
vec = st.lists(finite, min_size=4, max_size=4)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(
        [(list(map(float, a)), list(map(float, b))) for a, b in pairs],
        "a array<float>, b array<float>",
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=20))
def test_cosine_properties(spark, pairs):
    df = _pairs_df(spark, pairs)
    rows = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("ab"),
        cosine_similarity(F.col("b"), F.col("a")).alias("ba"),
        "a",
        "b",
    ).collect()
    for r in rows:
        a = np.array(r["a"], dtype=np.float64)
        b = np.array(r["b"], dtype=np.float64)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            # zero-norm contract: NULL score (reference computes NaN;
            # ANSI Spark would throw on a plain division)
            assert r["ab"] is None and r["ba"] is None
            continue
        # symmetry
        assert math.isclose(r["ab"], r["ba"], rel_tol=1e-9, abs_tol=1e-12)
        # range (float32 storage can overshoot |1| by ~1e-7)
        assert -1.0 - 1e-6 <= r["ab"] <= 1.0 + 1e-6
        # numpy agreement on the float32-rounded inputs
        expected = float(a @ b / (na * nb))
        assert math.isclose(r["ab"], expected, rel_tol=1e-6, abs_tol=1e-9)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=20))
def test_euclidean_similarity_properties(spark, pairs):
    df = _pairs_df(spark, pairs)
    rows = df.select(
        euclidean_similarity(F.col("a"), F.col("b")).alias("s"), "a", "b"
    ).collect()
    for r in rows:
        # range (0, 1]
        assert 0.0 < r["s"] <= 1.0
        a = np.array(r["a"], dtype=np.float64)
        b = np.array(r["b"], dtype=np.float64)
        # identity of indiscernibles
        if np.array_equal(a, b):
            assert r["s"] == 1.0


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=50), vec),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_upsert_idempotent(spark, rows):
    """Applying the same update twice == applying it once."""
    from astro_vectordb_spark.operators.crud import upsert_latest

    base = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(10)], "vec_id long, embedding array<float>"
    )
    upd = spark.createDataFrame(
        [(int(i), list(map(float, v))) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    once = upsert_latest(base, upd)
    twice = upsert_latest(once, upd)
    a = sorted((r["vec_id"], tuple(r["embedding"])) for r in once.collect())
    b = sorted((r["vec_id"], tuple(r["embedding"])) for r in twice.collect())
    assert a == b


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rank_percentiles_match_numpy(spark, values):
    """exact_percentiles_rank == numpy linear-interpolation quantiles
    (the quantile_cont contract) on arbitrary value sets, including
    duplicates, negatives, and single-value columns."""
    from astro_vectordb_spark.operators.profiling import exact_percentiles_rank

    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = {
        round(r["p"], 2): r["value"]
        for r in exact_percentiles_rank(df, ["x"], [0.25, 0.5, 0.9]).collect()
    }
    for p in (0.25, 0.5, 0.9):
        want = float(np.percentile(np.array(values, dtype=np.float64), p * 100))
        assert math.isclose(got[round(p, 2)], want, rel_tol=1e-12, abs_tol=1e-12), (
            p, got[round(p, 2)], want, values,
        )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vec, min_size=1, max_size=20))
def test_quantize_roundtrip_bound(spark, vectors):
    """Int8 quantization: codes stay in [-127, 127] and per-coordinate
    reconstruction error is bounded by half the step (s/2) for
    arbitrary finite vectors, including all-zero and constant ones."""
    from astro_vectordb_spark.operators.quantize import (
        dequantize_expr,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )
    rows = (
        quantize_embeddings(df)
        .select("vec_id", "qvec", "qscale", dequantize_expr().alias("xhat"))
        .join(df, "vec_id")
        .collect()
    )
    assert len(rows) == len(vectors)
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["qvec"])
        for x, xh in zip(r["embedding"], r["xhat"]):
            assert abs(float(x) - xh) <= r["qscale"] / 2 + 1e-9, (
                float(x), xh, r["qscale"],
            )


# --------------------------------------------------------------------------
# curation properties

word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7A),
    min_size=1,
    max_size=6,
)
doc_words = st.lists(word, min_size=0, max_size=30)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(doc_words, min_size=1, max_size=12))
def test_repetition_stats_match_python(spark, docs_words):
    from collections import Counter

    from astro_vectordb_spark.operators.curation import repetition_stats

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string",
    )
    got = {
        int(r.doc_id): r for r in repetition_stats(df).toPandas().itertuples()
    }
    for i, ws in enumerate(docs_words):
        r = got[i]
        assert r.n_tokens == len(ws)
        for frac in (
            r.top_unigram_frac, r.top_bigram_frac, r.dup_trigram_frac
        ):
            assert 0.0 <= frac <= 1.0
        if ws:
            c = Counter(ws)
            assert r.top_unigram_frac == round(
                c.most_common(1)[0][1] / len(ws), 6
            )
        tris = [" ".join(ws[j : j + 3]) for j in range(len(ws) - 2)]
        if tris:
            tc = Counter(tris)
            dup = sum(v for v in tc.values() if v > 1)
            assert r.dup_trigram_frac == round(dup / len(tris), 6)
        else:
            assert r.dup_trigram_frac == 0.0


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
    st.integers(min_value=10, max_value=100),
)
def test_pack_documents_invariants(spark, token_counts, budget):
    from astro_vectordb_spark.operators.curation import pack_documents

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)],
        "doc_id long, text string",
    )
    out = (
        pack_documents(df, max_tokens=budget, n_buckets=3)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # token mass conserved, every doc present exactly once
    assert sorted(out.doc_id) == list(range(len(token_counts)))
    assert out.n_tokens.sum() == sum(token_counts)
    # per bucket: offsets are the prefix sums in id order, pack ids
    # are the offset div and therefore nondecreasing
    for b, sub in out.groupby("bucket"):
        sub = sub.sort_values("doc_id")
        run = 0
        for r in sub.itertuples():
            assert r.start_offset == run
            assert r.pack_id == run // budget
            run += r.n_tokens
