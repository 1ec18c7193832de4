"""Vectorized (Arrow + NumPy) similarity kernels.

Measured at 1M x 64-dim rows per scoring pass: single-core, the NumPy
BLAS kernel does ~2 us/row vs ~15 us/row for the interpreted fold
expression (higher-order functions disable whole-stage codegen) — for
dense float math the usual "UDFs are the slow path" rule inverts.
Fully parallel and warm the two are comparable (scan/schedule overhead
dominates), and the UDF path pays a one-time Python-worker spawn cost
per executor.  See ARCHITECTURE.md "Kernel economics".

The engine therefore carries two kernel families:

* expression kernels (functions.vector) — strict left-fold float64,
  bit-reproducible by the DuckDB oracle; the default, and what every
  correctness-gated query uses.
* this module — same math via BLAS (summation order differs in the
  last ~ulp; not oracle-hash-safe, numerically identical for ranking);
  best per-core throughput on warm executors (`kernel='numpy'`).

Both return float64 scores; ranking ties are broken by id downstream
either way.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def _to_matrix(v: pd.Series) -> np.ndarray:
    # Arrow gives each element as np.ndarray(float32); stacking is much
    # cheaper than tolist()
    return np.stack(v.to_numpy()).astype(np.float64, copy=False)


def make_score_udf(query_vector: Sequence[float], metric: str = "cosine"):
    """pandas_udf scoring a vector column against one query vector."""
    q = np.asarray(list(query_vector), dtype=np.float64)
    qn = float(np.linalg.norm(q))

    if metric == "cosine":

        @pandas_udf("double")
        def score(v: pd.Series) -> pd.Series:
            m = _to_matrix(v)
            norms = np.linalg.norm(m, axis=1) * qn
            # zero-norm guard: match the expression kernel's try_divide
            # contract (NULL, row dropped by score>threshold) instead of
            # NaN, which Spark sorts ABOVE every real score
            out = np.divide(
                m @ q, norms, out=np.full(len(norms), np.nan), where=norms != 0
            )
            return pd.Series(out).astype("Float64")

    elif metric == "euclidean":

        @pandas_udf("double")
        def score(v: pd.Series) -> pd.Series:
            m = _to_matrix(v)
            return pd.Series(1.0 / (1.0 + np.linalg.norm(m - q, axis=1)))

    else:
        raise ValueError(f"unsupported metric {metric!r}")
    return score


def _fold_dot_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise left-fold float64 dot, vectorized: ``np.cumsum`` is a
    strictly sequential running total, so its last prefix equals the
    expression kernel's ``F.aggregate`` left fold bit-for-bit (float32
    operands convert to float64 exactly; the products are the same
    float64 values accumulated in the same order).  Same argument as
    ``functions.crossenc._fold_dot_rows``, pinned bitwise by
    tests/test_exact_kernels_r16.py.  (The only representable
    difference is the SIGN of a zero sum — the fold seeds with +0.0 —
    which cannot survive the strictly-positive threshold filters every
    verify path applies.)"""
    return np.cumsum(a * b, axis=1)[:, -1]


def make_exact_pair_score_udf(metric: str = "cosine"):
    """BIT-EXACT pandas_udf twin of the expression pair kernel
    (``functions.vector.similarity(a, b, metric)`` with the
    interpreted fold): same float64 products in the same sequential
    order (see ``_fold_dot_rows``), same ``sqrt``/divide tree, the
    try_divide zero-denominator convention (NULL, dropped by every
    score>threshold filter), and the similarity NULL-input contract
    (either side NULL -> -1.0).  Unlike :func:`make_pair_score_udf`
    (BLAS order, last-ulp drift) this kernel is oracle-hash-safe, so
    the correctness-gated verify paths (RP / SemDeDup pair
    verification) can run it: ~7x the per-core throughput of the
    interpreted fold at 64 dims (module header numbers), with the
    Python boundary paid once per Arrow batch (guide §4.2)."""
    if metric not in ("cosine", "euclidean"):
        raise ValueError(f"unsupported metric {metric!r}")

    @pandas_udf("double")
    def score(a: pd.Series, b: pd.Series) -> pd.Series:
        valid = a.notna().to_numpy() & b.notna().to_numpy()
        # NULL-input contract: similarity() returns -1.0, not NULL
        out = np.full(len(a), -1.0, dtype=np.float64)
        if valid.any():
            ma = np.stack(a[valid].to_numpy()).astype(np.float64)
            mb = np.stack(b[valid].to_numpy()).astype(np.float64)
            if metric == "cosine":
                dots = _fold_dot_rows(ma, mb)
                den = np.sqrt(_fold_dot_rows(ma, ma)) * np.sqrt(
                    _fold_dot_rows(mb, mb)
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    sub = dots / den
                # try_divide: zero denominator -> NULL (NaN -> null
                # through the nullable Float64 conversion below)
                sub = np.where(den != 0, sub, np.nan)
            else:  # euclidean
                d = ma - mb
                sub = 1.0 / (1.0 + np.sqrt(_fold_dot_rows(d, d)))
            out[valid] = sub
        return pd.Series(pd.array(out, dtype="Float64"))

    return score


def make_pair_score_udf(metric: str = "cosine"):
    """pandas_udf scoring two vector columns elementwise (similarity
    join / batch top-K shape): both sides arrive as Arrow batches."""
    if metric == "cosine":

        @pandas_udf("double")
        def score(a: pd.Series, b: pd.Series) -> pd.Series:
            ma, mb = _to_matrix(a), _to_matrix(b)
            dots = np.einsum("ij,ij->i", ma, mb)
            norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            # zero-norm guard: NULL (dropped), matching try_divide
            out = np.divide(
                dots, norms, out=np.full(len(norms), np.nan), where=norms != 0
            )
            return pd.Series(out).astype("Float64")

    elif metric == "euclidean":

        @pandas_udf("double")
        def score(a: pd.Series, b: pd.Series) -> pd.Series:
            ma, mb = _to_matrix(a), _to_matrix(b)
            return pd.Series(1.0 / (1.0 + np.linalg.norm(ma - mb, axis=1)))

    else:
        raise ValueError(f"unsupported metric {metric!r}")
    return score
