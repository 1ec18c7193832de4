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


def hash_embedder(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    """STUB embedder: deterministic feature-hashed bag-of-words,
    L2-normalized.  Tokens are hashed into ``dim`` buckets with a sign
    bit — the classic hashing trick, so similar token bags get similar
    vectors (exercises real similarity structure downstream)."""
    out = []
    for t in texts:
        v = np.zeros(dim, dtype=np.float64)
        if t is None or (isinstance(t, float) and np.isnan(t)):
            # NULL text -> zero vector, matching the SQL twin where a
            # NULL row yields no tokens (str(None) would tokenize the
            # literal "none")
            out.append(v.astype(np.float32))
            continue
        # \s+ regex split (empties dropped) rather than str.split() so
        # the tokenizer is the same function the DuckDB oracle twin
        # (string_split_regex(..., '\s+')) evaluates
        for tok in (x for x in re.split(r"\s+", str(t).lower()) if x):
            h = hashlib.md5(tok.encode()).digest()
            (u,) = _struct.unpack("<Q", h[:8])
            idx = u % dim
            sign = 1.0 if (u >> 63) & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        out.append(v.astype(np.float32))
    return pd.Series(out)


def embed_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    embed_fn: Callable[[pd.Series], pd.Series] | None = None,
) -> DataFrame:
    """Append an embedding column via an Arrow-batched pandas_udf.

    The hook is a narrow map — no shuffle; constant memory per Arrow
    batch; a GPU-backed ``embed_fn`` slots in unchanged (Spark >=3.4
    schedules pandas_udf stages onto GPU executors via stage-level
    scheduling if configured)."""
    fn = embed_fn or (lambda s: hash_embedder(s, dim))

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        return fn(texts)

    return df.withColumn(out_col, _embed(F.col(text_col)))
