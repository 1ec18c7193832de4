"""Pluggable cross-encoder (pairwise relevance) hook — the RERANK
stage of the retrieval stack.

``functions.embed`` injects the *bi-encoder* (one vector per text,
scored by a metric); this module injects the *cross-encoder*: a model
that reads the (query_text, doc_text) PAIR jointly and emits a single
relevance score — the standard last stage after hybrid fusion
(retrieve wide with cheap scorers, rerank the bounded top-C with the
expensive pairwise model).  The reference stops at vector scoring
(similarity.ts); this stage is what a production retrieval user adds
on top, so the engine owns the plumbing — Arrow batching, the
bounded-candidate contract, per-query grouping — and the model is
injected, mirroring ``embed.register_encoder``.

No model runtime exists in this container, so the default scorer is a
STUB: the cosine between the two texts' deterministic hash embeddings
(``embed.hash_embedder``), accumulated with the exact float64
left-fold the DuckDB oracle evaluates — so the rerank operator is
hash-gated end-to-end without any model dependency.  Swap in a real
cross-encoder via ``register_cross_scorer``; the Spark side is
unchanged.

Factory contract (mirror of the encoder registry, see
``functions/embed.py`` for the full rationale):

* ``factory(**config)`` returns the batch kernel
  ``(pd.Series[str], pd.Series[str]) -> pd.Series[float64]`` —
  queries and docs are aligned element-wise (one pair per row).
* Lazy-load the model INSIDE the kernel on first batch (cache on a
  function attribute): the kernel is cloudpickled to every executor
  python worker; lazy loading means one load per long-lived worker.
* The kernel sees Arrow batches of
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows; set it near
  the model's optimal batch for transformer cross-encoders.
* Return float64; emit None for undefined pairs (dropped downstream).

sentence-transformers example (runs wherever the package exists)::

    def ce_factory(model_name="cross-encoder/ms-marco-MiniLM-L-6-v2",
                   **_):
        def kernel(qs: pd.Series, ds: pd.Series) -> pd.Series:
            if not hasattr(kernel, "_m"):
                from sentence_transformers import CrossEncoder
                kernel._m = CrossEncoder(model_name)
            scores = kernel._m.predict(
                list(zip(qs.fillna(""), ds.fillna(""))))
            return pd.Series(scores, dtype="float64")
        return kernel
    register_cross_scorer("msmarco", ce_factory)
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np
import pandas as pd

from astro_vectordb_spark.functions.embed import DEFAULT_DIM, hash_embedder

CrossKernel = Callable[[pd.Series, pd.Series], pd.Series]


def _fold_dot(a, b) -> float:
    """Left-fold float64 dot — the accumulation order of the DuckDB
    oracle's list_reduce (and of functions/vector.dot_product), so
    stub scores hash-match."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _fold_dot_rows(a: "np.ndarray", b: "np.ndarray") -> "np.ndarray":
    """Row-wise left-fold float64 dot, vectorized: ``np.cumsum`` is a
    strictly sequential running total, so its last prefix equals the
    per-element ``acc += x * y`` loop bit-for-bit (float32 operands
    convert to float64 exactly; the products are the same float64
    values in the same order)."""
    return np.cumsum(a * b, axis=1)[:, -1]


def hash_cross_scorer(
    queries: pd.Series, docs: pd.Series, dim: int = DEFAULT_DIM
) -> pd.Series:
    """STUB pairwise scorer: cosine between the hash embeddings of
    query and doc text, float64 tree identical to the SQL twin
    ``dot / (sqrt(dot_aa) * sqrt(dot_bb))``.  Zero-norm sides (empty
    or NULL text) score None — the try_divide convention, dropped by
    the rerank operator.  Batch-vectorized (guide §4.2): the whole
    Arrow batch folds through NumPy with the exact sequential
    accumulation the scalar loop used (see ``_fold_dot_rows``)."""
    qv = hash_embedder(queries, dim)
    dv = hash_embedder(docs, dim)
    if len(qv) == 0:
        return pd.Series([], dtype="float64")
    a = np.stack(qv.to_numpy()).astype(np.float64)
    b = np.stack(dv.to_numpy()).astype(np.float64)
    denom = np.sqrt(_fold_dot_rows(a, a)) * np.sqrt(_fold_dot_rows(b, b))
    with np.errstate(divide="ignore", invalid="ignore"):
        scores = _fold_dot_rows(a, b) / denom
    # denom == 0 -> None (NaN -> null through Arrow), the try_divide
    # convention the scalar loop implemented with an explicit None
    scores = np.where(denom > 0, scores, np.nan)
    return pd.Series(scores, dtype="float64")


_SCORER_REGISTRY: dict[str, Callable[..., CrossKernel]] = {}


def register_cross_scorer(
    name: str, factory: Callable[..., CrossKernel]
) -> None:
    """Register a model-name -> pairwise-kernel factory (contract in
    the module docstring).  Re-registering a name replaces it."""
    _SCORER_REGISTRY[name] = factory


def cross_scorer_for(model: str, **config) -> CrossKernel:
    """Resolve a registered cross-encoder name to its batch kernel."""
    if model not in _SCORER_REGISTRY:
        raise ValueError(
            f"unknown cross-encoder {model!r}; registered: "
            f"{sorted(_SCORER_REGISTRY)} (register_cross_scorer to add)"
        )
    return _SCORER_REGISTRY[model](**config)


register_cross_scorer(
    "hash_cross",
    lambda dim=DEFAULT_DIM, **_: (
        lambda q, d: hash_cross_scorer(q, d, dim)
    ),
)
