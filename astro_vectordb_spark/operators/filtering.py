"""Shared allow-list plumbing for metadata-filtered search.

Every filtered face (exact / PQ / IVF / IVF-PQ / HNSW / the hybrid
lexical leg) restricts a table to a caller-supplied set of permitted
ids.  Two shapes are accepted everywhere:

* a small Python sequence — becomes an ``isin`` literal predicate
  (pushable into the parquet scan; plan size grows with the list, so
  keep it to the documented bounded filter sets), or
* a one-column DataFrame of ids — routed as a **broadcast left-semi
  join**, so the physical plan is one BroadcastHashJoin regardless of
  how many ids the allow-list holds (a 100k-row allow-list no longer
  inflates the plan with a 100k-literal IN).

The reference's filtered search is a JS predicate over candidates
(driver/driver.ts:290-307 filters hits client-side); these helpers are
the scan-level, scale-safe form of that contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AllowedIds = "Sequence[int] | DataFrame | None"


def allowed_ids_df(allowed, id_col: str = "vec_id") -> DataFrame | None:
    """Normalize a DataFrame allow-list to one distinct ``id_col``
    column (first column wins when the name differs).  Returns None
    for sequence allow-lists."""
    if not isinstance(allowed, DataFrame):
        return None
    src = id_col if id_col in allowed.columns else allowed.columns[0]
    return allowed.select(
        F.col(src).cast("long").alias(id_col)
    ).dropDuplicates()


def restrict_to_allowed(
    df: DataFrame, allowed, id_col: str = "vec_id"
) -> DataFrame:
    """Restrict ``df`` to the allowed ids: ``isin`` for a sequence,
    broadcast left-semi join for a DataFrame allow-list."""
    ids = allowed_ids_df(allowed, id_col=id_col)
    if ids is not None:
        return df.join(F.broadcast(ids), id_col, "left_semi")
    return df.filter(F.col(id_col).isin([int(i) for i in allowed]))


def allowed_count(allowed) -> int:
    """|allowed| for selectivity widening.  A DataFrame allow-list
    costs one tiny job over the allow-list itself (never the corpus);
    a sequence is counted driver-side."""
    if isinstance(allowed, DataFrame):
        return allowed.dropDuplicates([allowed.columns[0]]).count()
    return len({int(i) for i in allowed})


def allowed_as_list(allowed) -> list[int]:
    """Materialize the allow-list as a Python id list — for the faces
    whose filter is inherently a broadcast SET (the HNSW beam filter
    ships a frozenset to executors).  A DataFrame allow-list collects
    here; it must be bounded (the same contract the list path already
    imposes — for unbounded filters, pre-filter the corpus and use the
    exact path)."""
    if isinstance(allowed, DataFrame):
        col = allowed.columns[0]
        return [int(r[0]) for r in allowed.select(col).dropDuplicates().collect()]
    return [int(i) for i in allowed]
