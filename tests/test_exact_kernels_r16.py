"""Round-16 exact-kernel pins: the Arrow kernels that replaced the
interpreted folds on the verify/signature hot paths must be
BIT-IDENTICAL to their expression twins — these tests compare raw
float64 bit patterns (``view(uint64)``) and exact integers, not
approximate equality, because the DuckDB oracle hash-checks every
downstream consumer."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from astro_vectordb_spark.functions.vector import similarity
from astro_vectordb_spark.functions.vector_np import (
    make_exact_pair_score_udf,
)
from astro_vectordb_spark.operators.dedup import (
    POLY_MOD,
    _char_poly_hash,
    _char_poly_hash_expr,
    _char_poly_hash_py,
)


def _bits(vals):
    return [
        None if v is None else np.float64(v).view(np.uint64).item()
        for v in vals
    ]


class TestExactPairScore:
    def _pairs(self, spark, embeddings, n=40):
        a = embeddings.filter(F.col("vec_id") < n).select(
            F.col("vec_id").alias("a_id"), F.col("embedding").alias("a")
        )
        b = embeddings.filter(
            F.col("vec_id").between(n, 2 * n - 1)
        ).select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("b"))
        return a.crossJoin(b)

    def test_cosine_bitwise_equal_to_expression_fold(self, spark, embeddings):
        pairs = self._pairs(spark, embeddings)
        got = pairs.select(
            "a_id", "b_id",
            make_exact_pair_score_udf("cosine")(F.col("a"), F.col("b")).alias("s"),
        ).orderBy("a_id", "b_id").collect()
        want = pairs.select(
            "a_id", "b_id",
            similarity(F.col("a"), F.col("b"), "cosine").alias("s"),
        ).orderBy("a_id", "b_id").collect()
        assert _bits([r["s"] for r in got]) == _bits([r["s"] for r in want])

    def test_euclidean_bitwise_equal_to_expression_fold(self, spark, embeddings):
        pairs = self._pairs(spark, embeddings, n=25)
        got = pairs.select(
            make_exact_pair_score_udf("euclidean")(F.col("a"), F.col("b")).alias("s"),
        ).orderBy("s").collect()
        want = pairs.select(
            similarity(F.col("a"), F.col("b"), "euclidean").alias("s"),
        ).orderBy("s").collect()
        assert _bits([r["s"] for r in got]) == _bits([r["s"] for r in want])

    def test_null_and_zero_norm_contracts(self, spark):
        rows = [
            (1, [1.0, 2.0], [1.0, 2.0]),   # normal
            (2, None, [1.0, 2.0]),         # NULL side -> -1.0
            (3, [1.0, 2.0], None),         # NULL side -> -1.0
            (4, [0.0, 0.0], [1.0, 2.0]),   # zero norm -> NULL (try_divide)
        ]
        df = spark.createDataFrame(
            rows, "id long, a array<float>, b array<float>"
        )
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id",
                make_exact_pair_score_udf("cosine")(
                    F.col("a"), F.col("b")
                ).alias("s"),
            ).collect()
        }
        want = {
            r["id"]: r["s"]
            for r in df.select(
                "id",
                similarity(F.col("a"), F.col("b"), "cosine").alias("s"),
            ).collect()
        }
        assert got == want
        assert got[2] == -1.0 and got[3] == -1.0 and got[4] is None


class TestCharPolyHashKernel:
    # non-ASCII pin: Spark ascii() == Python ord() (code point, incl.
    # astral plane), empirically verified — a first-UTF-8-byte reading
    # would break every one of these
    NON_ASCII = [
        "ü", "héllo", "日本語テスト", "emoji 🎉 tail", "Ā€ÿ mix",
        "", " ", "plain ascii", "a" * 300,
    ]

    def test_kernel_equals_expression_on_corpus_tokens(self, spark, documents):
        toks = documents.select(
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.trim(F.lower("text")), r"\s+"),
                        lambda t: t != "",
                    )
                )
            ).alias("s")
        )
        rows = toks.select(
            "s",
            _char_poly_hash(F.col("s")).alias("k"),
            _char_poly_hash_expr(F.col("s")).alias("e"),
        ).collect()
        assert len(rows) > 100
        for r in rows:
            assert r["k"] == r["e"], r["s"]

    def test_kernel_equals_expression_on_non_ascii(self, spark):
        df = spark.createDataFrame([(s,) for s in self.NON_ASCII], "s string")
        rows = df.select(
            "s",
            _char_poly_hash(F.col("s")).alias("k"),
            _char_poly_hash_expr(F.col("s")).alias("e"),
        ).collect()
        for r in rows:
            assert r["k"] == r["e"], repr(r["s"])
            assert r["k"] == _char_poly_hash_py(r["s"])

    def test_kernel_null_in_null_out(self, spark):
        df = spark.createDataFrame([(None,), ("x",)], "s string")
        rows = {
            r["s"]: (r["k"], r["e"])
            for r in df.select(
                "s",
                _char_poly_hash(F.col("s")).alias("k"),
                _char_poly_hash_expr(F.col("s")).alias("e"),
            ).collect()
        }
        assert rows[None] == (None, None)
        assert rows["x"] == (ord("x") % POLY_MOD, ord("x"))

    def test_python_twin_horner(self):
        s = "héllo wörld 🎉"
        acc = 0
        for c in s:
            acc = (acc * 131 + ord(c)) % POLY_MOD
        assert _char_poly_hash_py(s) == acc


class TestBm25StatsCacheStaleness:
    """Round-16 ADVICE (medium): save_bm25_index always commits v0, so
    a same-path rebuild within one session used to serve the OLD
    cached (n, avgdl) under the reused (path, 'v0') key.  The cache
    key now carries the version pointer's mtime_ns, read BEFORE the
    tables."""

    def test_same_path_rebuild_serves_fresh_corpus_stats(
        self, spark, tmp_path
    ):
        from astro_vectordb_spark.operators.keyword import bm25_term_stats
        from astro_vectordb_spark.sources.vault import (
            load_bm25_index,
            save_bm25_index,
        )

        path = str(tmp_path / "bm25")
        docs1 = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(4)],
            "doc_id long, text string",
        )
        ts, cs = bm25_term_stats(docs1)
        save_bm25_index(ts, cs, path)
        _, cs_local = load_bm25_index(spark, path)
        assert cs_local.first()["n"] == 4

        # rebuild at the SAME path (commits v0 again) with a corpus of
        # a different size — the loaded stats must reflect it
        docs2 = spark.createDataFrame(
            [(i, "delta epsilon") for i in range(9)],
            "doc_id long, text string",
        )
        ts2, cs2 = bm25_term_stats(docs2)
        save_bm25_index(ts2, cs2, path)
        _, cs_local2 = load_bm25_index(spark, path)
        assert cs_local2.first()["n"] == 9
