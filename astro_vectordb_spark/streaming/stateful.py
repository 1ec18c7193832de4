"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming state at all (SURVEY.md §2.6); this is
the extended-capability slot the task brief names explicitly
("applyInPandasWithState for custom stateful operators").  The example
operator is a per-user running profile — event count, value sum, last
event time — maintained across micro-batches with a processing-time
timeout to expire idle users.

Scale notes: state is partitioned by the group key (user_id), lives in
the executor state store, and is bounded by the timeout eviction; the
per-batch work is one shuffle on the key (same as a batch groupBy).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_ts timestamp"
)
STATE_SCHEMA = "n long, s double"


def _update_profile(key, pdfs, state: GroupState):
    n, s = (state.get if state.exists else (0, 0.0))
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n, s))
    state.setTimeoutDuration(60 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [last_ts],
        }
    )


def user_profiles_stream(events_stream: DataFrame) -> DataFrame:
    """events (ts, user_id, value) stream -> running per-user profile.

    Emits the updated profile row for every user seen in each
    micro-batch (update semantics)."""
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
