"""Unified ANN / lexical index MAINTENANCE facade — round-15 verdict
item 6, completing the symmetry: serving has one entry point
(:func:`astro_vectordb_spark.search.search` auto-detects the kind),
the four near-dup families have one maintenance handle
(:func:`astro_vectordb_spark.neardup.open`), but the five persisted
retrieval index kinds — IVF, sharded HNSW, flat PQ, IVF-PQ, BM25 —
still exposed per-family append/remove/compact/rebalance/refresh
functions with no dispatch.  :func:`open` is the maintenance analogue
of ``search.search``:

    idx = index.open(spark, path)      # kind auto-detected from layout
    idx.append(new_rows, batch_id=7)   # incremental insert
    idx.remove([3, 5], batch_id=8)     # physical delete
    idx.compact()                      # churn-aware rewrite (PQ kinds)
    idx.rebalance()                    # shard re-split (HNSW)
    idx.health()                       # operational stats (HNSW)
    idx.refresh(vectors=corpus)        # codebook retrain (PQ kinds)
    idx.gc()                           # replay-log compaction
    idx.search([...], k=10)            # serving, via search.search

Every method forwards kind-specific keywords verbatim (``spill`` for
IVF, ``seed``/``on_conflict`` for HNSW, ``dedup_ids`` for the PQ
appends, ``id_col``/``text_col`` for BM25, ...) — the handle binds
(spark, path) and dispatches; semantics, replay contracts, and crash
orderings are the underlying faces', documented there.  Detection is
one filesystem existence probe per candidate subdir (the
``search.detect_index_kind`` rule plus the BM25 layouts); the handle
is stateless beyond the kind string.

The reference keeps one in-memory HNSW and rebuilds it wholesale
(astrovault.ts toJSON/fromJSON); this facade exists because this
engine has five persisted lifecycles — an operator should not need to
know which physical index a path holds to maintain it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["open", "MaintainedIndex"]

_APPEND = {
    "ivf": "ivf_append_to_index",
    "hnsw": "hnsw_append_to_index",
    "pq": "pq_append_to_index",
    "ivf_pq": "ivf_pq_append_to_index",
    "bm25": "bm25_append_to_index",
}
_REMOVE = {
    "ivf": "ivf_remove_from_index",
    "hnsw": "hnsw_remove_from_index",
    "pq": "pq_remove_from_index",
    "ivf_pq": "pq_remove_from_index",  # shared codes-table remover
    "bm25": "bm25_remove_from_index",
}
_REFRESH = {
    "pq": "pq_refresh_index",
    "ivf_pq": "ivf_pq_refresh_index",
}


def _detect_kind(spark: SparkSession, path: str) -> str:
    from astro_vectordb_spark.search import detect_index_kind
    from astro_vectordb_spark.sources.vault import _fs_exists

    # BM25 first: its layouts (versioned stats/ multi-table, or the
    # legacy split term_stats/ + corpus_stats/) are disjoint from the
    # vector kinds' subdirs
    if _fs_exists(spark, os.path.join(path, "stats")) or _fs_exists(
        spark, os.path.join(path, "term_stats")
    ):
        return "bm25"
    kind = detect_index_kind(spark, path)
    if kind == "exact":
        raise ValueError(
            f"no maintained index found at {path!r} (layout matches "
            "none of ivf/hnsw/pq/ivf_pq/bm25); plain vector tables are "
            "maintained via sources.vault save/upsert faces, near-dup "
            "indexes via astro_vectordb_spark.neardup.open"
        )
    return kind


class MaintainedIndex:
    """A kind-dispatched maintenance handle over one persisted
    retrieval index.  Attributes: ``kind`` (one of ``ivf | hnsw | pq |
    ivf_pq | bm25``), ``path``."""

    def __init__(self, spark: SparkSession, path: str, kind: str) -> None:
        self.spark = spark
        self.path = path
        self.kind = kind

    def _vault(self, name: str):
        from astro_vectordb_spark.sources import vault

        return getattr(vault, name)

    # -- lifecycle -------------------------------------------------------
    def append(self, new_rows: DataFrame, **kw):
        """Incremental insert (touched-partitions-only on every kind).
        Replay-logged kinds (pq/ivf_pq/bm25) take ``batch_id=``; HNSW
        takes ``seed=``/``on_conflict=``; IVF takes ``spill=`` —
        keywords forward verbatim."""
        return self._vault(_APPEND[self.kind])(
            self.spark, self.path, new_rows, **kw
        )

    def remove(self, ids_or_docs, **kw):
        """Physical delete (file-granular where the kind supports it).
        Vector kinds take an id collection; BM25 takes the removed
        docs frame (statistics need the text)."""
        return self._vault(_REMOVE[self.kind])(
            self.spark, self.path, ids_or_docs, **kw
        )

    def compact(self, **kw) -> dict:
        """Churn-aware codes-table compaction (PQ kinds; a well-sized
        table is a no-op).  HNSW compacts via :meth:`rebalance`."""
        if self.kind not in ("pq", "ivf_pq"):
            hint = (
                "use rebalance() for HNSW shard maintenance"
                if self.kind == "hnsw"
                else f"the {self.kind} kind has no compaction face"
            )
            raise ValueError(f"compact: {hint}")
        return self._vault("pq_compact_index")(self.spark, self.path, **kw)

    def rebalance(self, **kw) -> dict:
        """HNSW shard re-split + rewire (skew/degradation repair)."""
        if self.kind != "hnsw":
            raise ValueError(
                f"rebalance is an HNSW face; the {self.kind} kind "
                "maintains layout via compact()/refresh()"
            )
        return self._vault("hnsw_rebalance")(self.spark, self.path, **kw)

    def health(self, **kw) -> dict:
        """Operational stats (HNSW: per-shard counts, wiring degree,
        the rebalance decision inputs)."""
        if self.kind != "hnsw":
            raise ValueError(
                f"health stats are an HNSW face; {self.kind} drift "
                "telemetry rides the append report (batch_mse)"
            )
        return self._vault("hnsw_index_stats")(self.spark, self.path, **kw)

    def refresh(self, vectors: DataFrame, **kw) -> dict:
        """Codebook retrain-in-place (PQ kinds): refit on a bounded
        sample of ``vectors`` (must cover every stored id), re-encode
        the codes table via staged swap — the answer to the append
        report's batch-MSE drift signal.  IVF/HNSW/BM25 have no
        trained state with a cheaper-than-rebuild refresh."""
        fn = _REFRESH.get(self.kind)
        if fn is None:
            raise ValueError(
                f"the {self.kind} kind has no refresh face (IVF "
                "centroid drift -> rebuild_index; HNSW -> rebalance; "
                "BM25 statistics are exact by construction)"
            )
        return self._vault(fn)(self.spark, self.path, vectors, **kw)

    def gc(self, **kw) -> dict:
        """Compact the ``_batches`` replay log (vault.gc,
        lease-guarded).  BM25 versions its log inside the stats
        commit, so its gc is a no-op here."""
        return self._vault("gc")(self.spark, self.path, **kw)

    # -- streaming -------------------------------------------------------
    _STREAM_INGEST = {
        "hnsw": "stream_index_ingest",
        "pq": "stream_pq_ingest",
        "bm25": "stream_bm25_ingest",
    }
    _STREAM_REMOVE = {
        "ivf": "stream_ivf_remove",
        "hnsw": "stream_hnsw_remove",
        "pq": "stream_pq_remove",
        "ivf_pq": "stream_pq_remove",  # shared codes-table remover
        "bm25": "stream_bm25_remove",
    }

    def stream_ingest(self, stream_df: DataFrame, **kw):
        """Start the kind's Structured-Streaming ingest into this
        index (replayable per-micro-batch appends).  Returns the
        StreamingQuery.  IVF/IVF-PQ ingest streams are not wired —
        batch ``append`` per micro-batch via ``foreachBatch`` is the
        supported shape for those kinds."""
        from astro_vectordb_spark.streaming import upsert as streaming

        name = self._STREAM_INGEST.get(self.kind)
        if name is None:
            raise ValueError(
                f"the {self.kind} kind has no streaming-ingest face; "
                "drive append() from your own foreachBatch"
            )
        return getattr(streaming, name)(stream_df, self.path, **kw)

    def stream_remove(self, stream_df: DataFrame, **kw):
        """Start the kind's streaming DELETE face (physical removes,
        replay-logged).  Returns the StreamingQuery."""
        from astro_vectordb_spark.streaming import upsert as streaming

        return getattr(streaming, self._STREAM_REMOVE[self.kind])(
            stream_df, self.path, **kw
        )

    # -- serving ---------------------------------------------------------
    def search(self, query, k: int = 10, *, docs: DataFrame | None = None,
               **kw) -> DataFrame:
        """Serve one query through this index.  Vector kinds route to
        the kind-detecting ``search.search`` (a string query embeds
        first via ``search.search_text``).  A BM25 index serves the
        query's terms against its persisted statistics
        (``bm25_topk_indexed``) — pass ``docs=`` (the corpus frame;
        the index stores vocabulary-sized statistics, never the
        text)."""
        from astro_vectordb_spark import search as s

        if self.kind == "bm25":
            if docs is None:
                raise ValueError(
                    "bm25 search needs docs= (the corpus frame; the "
                    "index persists statistics only)"
                )
            from astro_vectordb_spark.operators.keyword import (
                bm25_topk_indexed,
            )
            from astro_vectordb_spark.sources.vault import load_bm25_index

            ts, cs = load_bm25_index(self.spark, self.path)
            terms = (
                s._query_tokens(query) if isinstance(query, str)
                else [str(t) for t in query]
            )
            return bm25_topk_indexed(docs, ts, cs, terms, k, **kw)
        if isinstance(query, str):
            return s.search_text(self.spark, self.path, query, k, **kw)
        return s.search(self.spark, self.path, query, k, **kw)

    def search_batch(self, queries: DataFrame, k: int = 10,
                     **kw) -> DataFrame:
        """Serve a query batch: a frame with a string ``query_text``
        column routes to ``search.search_text_batch``; a vector
        ``query_vec`` frame routes to ``search.search_batch``."""
        from pyspark.sql.types import StringType

        from astro_vectordb_spark import search as s

        text = any(
            f.name == "query_text" and isinstance(f.dataType, StringType)
            for f in queries.schema.fields
        )
        if text:
            return s.search_text_batch(self.spark, self.path, queries, k,
                                       **kw)
        return s.search_batch(self.spark, self.path, queries, k, **kw)

    def __repr__(self) -> str:  # pragma: no cover - debug sugar
        return f"MaintainedIndex(kind={self.kind!r}, path={self.path!r})"


def open(spark: SparkSession, path: str) -> MaintainedIndex:  # noqa: A001
    """Open a persisted retrieval index of ANY kind: detects ``ivf |
    hnsw | pq | ivf_pq | bm25`` from the on-disk layout and returns a
    :class:`MaintainedIndex` handle whose append/remove/compact/
    rebalance/health/refresh/gc delegate to that kind's faces."""
    return MaintainedIndex(spark, path, _detect_kind(spark, path))
