"""Pluggable embedding-ingestion hook.

The reference recommends an external vectorizer (Transformers.js
all-MiniLM-L6-v2, README.md:99-109) and stores whatever vectors users
pass in — the DB itself never embeds.  The Spark-native analogue is an
Arrow-batched pandas_udf hook at ingestion: the engine owns the
plumbing (batching, schema, dimension contract), the model is injected.

No model runtime exists in this container, so the default embedder is
a STUB — a deterministic hash-based projection with the same contract
(text -> float32[dim], unit-normalized) so every downstream operator
(top-K, IVF, near-dup) can run end-to-end on its output.  Swap
``embed_fn`` for a real encoder in production; the Spark side is
unchanged.
"""

from __future__ import annotations

import hashlib
import re
import struct as _struct
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DEFAULT_DIM = 64


_WS_RE = re.compile(r"\s+")

# token -> 64-bit md5 prefix, memoized per python worker: natural-
# language batches repeat tokens heavily, so the md5 (the kernel's
# dominant cost) runs once per DISTINCT token per worker instead of
# once per occurrence.  Module-level so a reused worker keeps it across
# tasks (the function lives in an importable module — guide §4.5);
# bounded so a 100 TB vocabulary can't grow worker RSS without limit.
_TOKEN_U_CACHE: dict[str, int] = {}
_TOKEN_U_CACHE_MAX = 1 << 20


def _token_u(tok: str) -> int:
    u = _TOKEN_U_CACHE.get(tok)
    if u is None:
        (u,) = _struct.unpack("<Q", hashlib.md5(tok.encode()).digest()[:8])
        if len(_TOKEN_U_CACHE) >= _TOKEN_U_CACHE_MAX:
            _TOKEN_U_CACHE.clear()
        _TOKEN_U_CACHE[tok] = u
    return u


def hash_embedder(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    """STUB embedder: deterministic feature-hashed bag-of-words,
    L2-normalized.  Tokens are hashed into ``dim`` buckets with a sign
    bit — the classic hashing trick, so similar token bags get similar
    vectors (exercises real similarity structure downstream).

    Vectorized batch kernel (bit-identical to the original per-row
    loop): bucket votes are ±1.0 float64 additions — exact integers,
    so accumulation order cannot change the counts — gathered with one
    ``np.bincount`` over (row, bucket) pairs; each row's norm is
    ``sqrt`` of an exact integer sum of squares, so the vectorized
    reduction equals the per-row ``np.linalg.norm``; the final divide
    and float32 cast are the same elementwise ops as before.  Tokens
    are md5-hashed once per distinct token per worker (``_token_u``)."""
    n_rows = len(texts)
    rows: list[int] = []
    cols: list[int] = []
    signs: list[float] = []
    for i, t in enumerate(texts):
        if t is None or (isinstance(t, float) and np.isnan(t)):
            # NULL text -> zero vector, matching the SQL twin where a
            # NULL row yields no tokens (str(None) would tokenize the
            # literal "none")
            continue
        # \s+ regex split (empties dropped) rather than str.split() so
        # the tokenizer is the same function the DuckDB oracle twin
        # (string_split_regex(..., '\s+')) evaluates
        for tok in _WS_RE.split(str(t).lower()):
            if not tok:
                continue
            u = _token_u(tok)
            rows.append(i)
            cols.append(u % dim)
            signs.append(1.0 if (u >> 63) & 1 else -1.0)
    if rows:
        flat = np.asarray(rows, dtype=np.int64) * dim + np.asarray(
            cols, dtype=np.int64
        )
        m = np.bincount(
            flat, weights=np.asarray(signs), minlength=n_rows * dim
        ).reshape(n_rows, dim)
    else:
        m = np.zeros((n_rows, dim), dtype=np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", m, m))
    nz = norms > 0
    m[nz] /= norms[nz, None]
    m32 = m.astype(np.float32)
    return pd.Series(list(m32))


# --------------------------------------------------------------------------
# Encoder registry: model-name -> pandas_udf-kernel factory.
#
# The documented drop-in interface for real models: a FACTORY takes
# keyword config (at minimum ``dim``) and returns the batch kernel
# ``pd.Series[str] -> pd.Series[np.ndarray float32[dim]]`` that
# ``embed_text`` wraps in an Arrow-batched pandas_udf.  Rules a real
# encoder must follow:
#
# * Lazy-load the model INSIDE the kernel on first batch (cache it on
#   a function attribute / module global): the factory's return value
#   is cloudpickled to every executor python worker, and shipping
#   model weights through the closure would serialize them per task.
#   Loading lazily means one load per long-lived python worker.
# * Output float32 arrays of exactly ``dim``; unit-normalize if
#   downstream cosine search should reduce to dot products.
# * Arrow batch sizing: the kernel sees batches of
#   ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default
#   10k).  For transformer encoders set it near the model's optimal
#   GPU batch (e.g. 256-1024) so the kernel never has to re-chunk;
#   for the hash stub the default is fine.
#
# sentence-transformers example (runs wherever the package exists):
#
#     def st_factory(dim=384, model_name="all-MiniLM-L6-v2", **_):
#         def kernel(texts: pd.Series) -> pd.Series:
#             if not hasattr(kernel, "_m"):
#                 from sentence_transformers import SentenceTransformer
#                 kernel._m = SentenceTransformer(model_name)
#             vecs = kernel._m.encode(
#                 ["" if t is None else str(t) for t in texts],
#                 normalize_embeddings=True,
#             ).astype("float32")
#             return pd.Series(list(vecs))
#         return kernel
#     register_encoder("minilm", st_factory)
#     embed_text(df, model="minilm", dim=384)
#
# The stub stays the default so CI and the oracle never depend on a
# model runtime.

_ENCODER_REGISTRY: dict[str, Callable[..., Callable[[pd.Series], pd.Series]]] = {}


def register_encoder(
    name: str, factory: Callable[..., Callable[[pd.Series], pd.Series]]
) -> None:
    """Register a model-name -> kernel factory (see module notes for
    the factory contract).  Re-registering a name replaces it."""
    _ENCODER_REGISTRY[name] = factory


def encoder_for(model: str, **config) -> Callable[[pd.Series], pd.Series]:
    """Resolve a registered model name to its batch kernel."""
    if model not in _ENCODER_REGISTRY:
        raise ValueError(
            f"unknown encoder {model!r}; registered: "
            f"{sorted(_ENCODER_REGISTRY)} (register_encoder to add)"
        )
    return _ENCODER_REGISTRY[model](**config)


register_encoder("hash", lambda dim=DEFAULT_DIM, **_: (
    lambda s: hash_embedder(s, dim)
))


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    embed_fn: Callable[[pd.Series], pd.Series] | None = None,
    model: str | None = None,
    **model_config,
) -> DataFrame:
    """Append an embedding column via an Arrow-batched pandas_udf.

    The kernel comes from (highest precedence first) ``embed_fn`` (a
    direct callable), ``model`` (a ``register_encoder`` name, resolved
    with ``dim`` + ``model_config``), else the deterministic hash
    stub.  The hook is a narrow map — no shuffle; constant memory per
    Arrow batch; a GPU-backed kernel slots in unchanged (Spark >=3.4
    schedules pandas_udf stages onto GPU executors via stage-level
    scheduling if configured)."""
    if embed_fn is not None:
        fn = embed_fn
    elif model is not None:
        fn = encoder_for(model, dim=dim, **model_config)
    else:
        fn = lambda s: hash_embedder(s, dim)  # noqa: E731

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        return fn(texts)

    return df.withColumn(out_col, _embed(F.col(text_col)))


def embed_query_text(
    text: str,
    dim: int = DEFAULT_DIM,
    embed_fn: Callable[[pd.Series], pd.Series] | None = None,
    model: str | None = None,
    **model_config,
) -> list[float]:
    """Embed ONE query string driver-side with the same kernel
    resolution as :func:`embed_text` — the query vector is bounded
    control plane (one row), so no Spark job is the right cost.
    Returns a plain float list ready for the search faces."""
    if embed_fn is not None:
        fn = embed_fn
    elif model is not None:
        fn = encoder_for(model, dim=dim, **model_config)
    else:
        fn = lambda s: hash_embedder(s, dim)  # noqa: E731
    vec = fn(pd.Series([text])).iloc[0]
    return [float(x) for x in vec]
