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
