"""Custom stateful streaming operator via applyInPandasWithState.

Session windows / tumbling windows cover the declarative cases
(streaming/events.py); this is the escape hatch for state machines the
built-ins can't express — here, a per-user running profile that emits
a summary row when the user goes quiet (processing-time timeout):

state   = (n_events, total_value, first_ts, last_ts)
input   = the user's new events in this micro-batch
output  = 0 rows while active; 1 summary row on timeout

State is per-key and bounded; GroupStateTimeout handles eviction, so
long-tail users don't accumulate state forever — the property that
matters when the key space is 10⁹ users.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, total double, first_ts timestamp, last_ts timestamp"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "first_ts timestamp, last_ts timestamp"
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    (user_id,) = key
    if state.hasTimedOut:
        n, total, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )
        return

    n, total, first_ts, last_ts = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, total, first_ts, last_ts))
    state.setTimeoutDuration(2000)  # ms of processing-time quiet
    return
    yield  # pragma: no cover — generator form required by the API


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """events stream → per-user summaries emitted on inactivity timeout."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
