"""Streaming deduplication — the continuous-ingest face of
``operators/dedup.exact_dedup``.

A 100 TB corpus is not loaded once; it arrives as a stream (crawl
batches, log shippers).  Dedup at ingest is much cheaper than dedup
after landing: state is one fingerprint per distinct document, checked
per micro-batch, instead of a full-corpus groupBy later.

Two tools, two retention contracts:

- ``stream_dedup_exact``: Spark's watermarked dedup
  (``dropDuplicatesWithinWatermark``) — duplicates arriving within the
  watermark horizon of their first occurrence are dropped, state is
  evicted beyond it.  The right tool when duplicate arrivals cluster
  in time (re-sent batches, retried uploads).
- ``first_seen_filter``: an ``applyInPandasWithState`` operator that
  keeps a per-fingerprint seen-count — emits only each fingerprint's
  FIRST occurrence as ``is_first`` and counts suppressed repeats, so
  the ingest pipeline can report dedup rates.  With
  ``timeout_minutes`` set, idle fingerprints are evicted on a
  processing-time timeout, bounding state by active-set size instead
  of corpus size.

Both key on a content fingerprint, not raw text: ``fingerprint_expr``
is xxhash64 of the token-normalized text — the same normalization
notion as the batch ``exact_dedup`` (operators/dedup.py), so batch and
stream agree on what "duplicate" means.

Reference analogue: none (the reference is single-process,
request-at-a-time — FIFO queue at best, queue.ts); SURVEY.md §2.6
lists streaming as an extension slot.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def fingerprint_expr(text_col: str = "text") -> Column:
    """Content fingerprint: xxhash64 over whitespace-normalized,
    lowercased text — byte-format differences (padding, case, runs of
    spaces) don't defeat dedup."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return F.xxhash64(normalized)


def stream_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate documents arriving within ``watermark`` of the
    first occurrence.  State per distinct fingerprint is evicted once
    the watermark passes — bounded by arrival rate x horizon, never by
    corpus size."""
    return (
        stream.withColumn("_fp", fingerprint_expr(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


FIRST_SEEN_SCHEMA = "fp long, n_dups long, is_first boolean"
_STATE_SCHEMA = "seen long"


def _make_first_seen_update(timeout_ms: int | None):
    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (fp,) = key
        if timeout_ms is not None and state.hasTimedOut:
            # idle fingerprint: evict, emit nothing — a later repeat
            # re-registers as first (the retention contract)
            state.remove()
            return
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        first = not state.exists
        seen = 0 if first else state.get[0]
        state.update((seen + n,))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "fp": [fp],
                "n_dups": [n - 1 if first else n],
                "is_first": [first],
            }
        )

    return update


def first_seen_filter(
    stream: DataFrame,
    text_col: str = "text",
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Per-fingerprint first-seen tracking across micro-batches.

    Output: (fp, n_dups, is_first) per fingerprint per batch —
    ``is_first`` rows are the unique-document stream (join back on fp
    to recover payloads), repeat rows carry the suppressed count for
    dedup-rate monitoring.  State is one long per distinct
    fingerprint, partitioned by fp across the executor state stores;
    ``timeout_minutes`` bounds it to the active set via
    processing-time eviction.
    """
    timeout_ms = None if timeout_minutes is None else timeout_minutes * 60_000
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    keyed = stream.withColumn("fp", fingerprint_expr(text_col)).groupBy("fp")
    return keyed.applyInPandasWithState(
        _make_first_seen_update(timeout_ms),
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )
