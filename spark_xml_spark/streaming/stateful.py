"""Custom stateful streaming operators via ``applyInPandasWithState``.

The brief's canonical example: event-time sessionization with a silence
gap. State per key = the open session (start, last-seen, count); a
microbatch extends or closes it; closed sessions are emitted downstream.
Works identically on a real stream and on a batch DataFrame run through
``availableNow`` — the tests drive both.

Scale shape: state is partitioned by key in the state store (RocksDB/HDFS
backed on a real cluster); each microbatch shuffles only that batch's
events by key; the pandas function sees bounded per-key groups.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("count", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts_sec",
    key_col: str = "user_id",
    expire_open_sessions: bool = True,
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session (a session
    closes when a later event for the same key arrives more than
    ``gap_seconds`` after the previous one, or — with
    ``expire_open_sessions`` — when the state times out).

    ``expire_open_sessions=False`` disables the processing-time timeout:
    open sessions are simply never emitted. Use this for availableNow /
    replay jobs — with a timeout configured, Spark keeps the query alive
    until the timeout fires, so an availableNow trigger blocks ~gap_seconds
    after the last batch instead of terminating.

    ``events`` must carry ``key_col`` (long) and ``ts_col`` (epoch seconds,
    long). Works on streaming and batch DataFrames alike.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start, last, count = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [start],
                    "session_end": [last],
                    "n_events": [count],
                }
            )
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(x) for x in pdf[ts_col])
        ts.sort()
        if state.exists:
            start, last, count = state.get
        else:
            start = last = ts[0]
            count = 0
        closed = []
        for t in ts:
            if t - last > gap_seconds:
                closed.append((start, last, count))
                start, count = t, 0
            last = max(last, t)
            count += 1
        state.update((start, last, count))
        if expire_open_sessions:
            # expire the open session after the gap passes with no events
            state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_open_sessions
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
