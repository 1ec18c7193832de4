"""Round 15: the vectorized embed / cross-score kernels must be
BIT-identical to the original per-row loops (the oracle hashes float64
score trees, so even a last-ulp drift would break the driver gates)."""

from __future__ import annotations

import hashlib
import math
import re
import struct

import numpy as np
import pandas as pd
import pytest

from astro_vectordb_spark.functions.crossenc import hash_cross_scorer
from astro_vectordb_spark.functions.embed import hash_embedder


def _reference_hash_embedder(texts: pd.Series, dim: int = 64) -> pd.Series:
    """The pre-round-15 per-row loop, verbatim."""
    out = []
    for t in texts:
        v = np.zeros(dim, dtype=np.float64)
        if t is None or (isinstance(t, float) and np.isnan(t)):
            out.append(v.astype(np.float32))
            continue
        for tok in (x for x in re.split(r"\s+", str(t).lower()) if x):
            h = hashlib.md5(tok.encode()).digest()
            (u,) = struct.unpack("<Q", h[:8])
            idx = u % dim
            sign = 1.0 if (u >> 63) & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        out.append(v.astype(np.float32))
    return pd.Series(out)


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _reference_cross_scorer(
    queries: pd.Series, docs: pd.Series, dim: int = 64
) -> pd.Series:
    qv = _reference_hash_embedder(queries, dim)
    dv = _reference_hash_embedder(docs, dim)
    out = []
    for a, b in zip(qv, dv):
        denom = math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
        out.append(_fold_dot(a, b) / denom if denom > 0 else None)
    return pd.Series(out, dtype="float64")


def _word_soup(rng: np.random.RandomState, n_rows: int) -> list:
    vocab = [f"tok{i}" for i in range(200)] + ["Mixed", "CASE", "x", "été"]
    rows = []
    for _ in range(n_rows):
        n = rng.randint(0, 60)
        rows.append(" ".join(rng.choice(vocab, size=n)) if n else "")
    return rows


class TestHashEmbedderBitIdentity:
    def test_matches_reference_loop_bitwise(self):
        rng = np.random.RandomState(7)
        texts = _word_soup(rng, 300)
        texts[0] = None
        texts[1] = float("nan")
        texts[2] = "   \t  "  # whitespace only -> zero vector
        texts[3] = "repeat repeat repeat repeat"
        got = hash_embedder(pd.Series(texts, dtype="object"))
        want = _reference_hash_embedder(pd.Series(texts, dtype="object"))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.dtype == np.float32 and w.dtype == np.float32
            assert np.array_equal(
                g.view(np.uint32), w.view(np.uint32)
            ), "vectorized embedding drifted from the per-row loop"

    def test_nondefault_dim(self):
        texts = pd.Series(["a b c", "c c c", ""])
        got = hash_embedder(texts, dim=17)
        want = _reference_hash_embedder(texts, dim=17)
        for g, w in zip(got, want):
            assert np.array_equal(g.view(np.uint32), w.view(np.uint32))

    def test_empty_batch(self):
        got = hash_embedder(pd.Series([], dtype="object"))
        assert len(got) == 0


class TestCrossScorerBitIdentity:
    def test_matches_reference_fold_bitwise(self):
        rng = np.random.RandomState(11)
        qs = _word_soup(rng, 120)
        ds = _word_soup(rng, 120)
        ds[5] = ""  # zero-norm doc -> None/NaN score
        qs[6] = None
        got = hash_cross_scorer(pd.Series(qs), pd.Series(ds))
        want = _reference_cross_scorer(pd.Series(qs), pd.Series(ds))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            if w is None or (isinstance(w, float) and math.isnan(w)):
                assert math.isnan(g)
            else:
                assert struct.pack("<d", g) == struct.pack("<d", w), (
                    f"score drifted: {g!r} vs {w!r}"
                )

    def test_empty_batch(self):
        got = hash_cross_scorer(
            pd.Series([], dtype="object"), pd.Series([], dtype="object")
        )
        assert len(got) == 0 and got.dtype == np.float64


@pytest.mark.parametrize("n_tokens", [0, 1, 1000])
def test_single_doc_extremes(n_tokens):
    text = " ".join(["tok"] * n_tokens)
    got = hash_embedder(pd.Series([text]))
    want = _reference_hash_embedder(pd.Series([text]))
    assert np.array_equal(got[0].view(np.uint32), want[0].view(np.uint32))
