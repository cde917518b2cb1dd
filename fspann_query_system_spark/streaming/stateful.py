"""Custom stateful streaming operator (mandate: `applyInPandasWithState`
for operators Structured Streaming lacks natively).

Gap-based sessionization as a stateful per-user operator: state carries
(last event time, open session count); each micro-batch folds its events
into the state and emits the running totals.  The batch twin
(``workloads.q_sessionization``) is the verifiable spec — on a finite
input the stream's final counts equal the batch plan's output (tested).

Ordering contract: events are sorted by event time WITHIN each
micro-batch, but the fold assumes batches arrive in event-time order
relative to each other (an event older than the state's ``last_ts``
would move time backwards).  That holds for availableNow over a static
source and for append-ordered file streams; for genuinely out-of-order
sources, put a watermark-sorted stage upstream or widen the state to a
buffered event list flushed past the watermark.

State size is O(active users) × 16 bytes — bounded by the watermark-style
timeout at scale (users idle past the gap can be evicted because any
future event necessarily opens a new session; eviction changes no
output)."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SEC = 30 * 60

OUTPUT_SCHEMA = "user_id BIGINT, n_sessions BIGINT, n_events BIGINT"
STATE_SCHEMA = "last_ts DOUBLE, n_sessions BIGINT, n_events BIGINT"


def _fold_sessions(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    last_ts, n_sessions, n_events = state.get if state.exists else (None, 0, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # fold in event-time order; ties broken by event_id like the batch twin
    rows = rows.sort_values(["ts", "event_id"])
    for ts in rows["ts"]:
        t = ts.timestamp()
        if last_ts is None or t - last_ts > SESSION_GAP_SEC:
            n_sessions += 1
        last_ts = t
        n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions],
                        "n_events": [n_events]})


def stateful_sessionize(events_stream):
    """events stream (user_id, event_id, ts) → running per-user session
    counts.  Update mode: each batch emits the users it touched."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _fold_sessions,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
