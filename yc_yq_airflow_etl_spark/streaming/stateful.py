"""Custom stateful streaming operators via ``applyInPandasWithState``
— the escape hatch for per-key logic Spark's built-in window/agg state
can't express (running aggregates that must survive across
micro-batches with custom update rules, timeouts, or emission
policies).

Example operator: a per-user running activity tracker that maintains
(event count, value sum, last event time) across the lifetime of the
stream and emits the updated row for each key touched by a
micro-batch. The state schema is explicit and narrow — at 1000
executors, state store size per key is what decides feasibility, so
operators here keep O(1) state per key (never per-event buffers).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRACKER_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("last_ts_epoch", T.LongType(), False),
    ]
)

TRACKER_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("last_ts_epoch", T.LongType(), False),
    ]
)


def _track(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1_000_000_000))
    state.update((n, round(total, 6), last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 6)],
            "last_ts_epoch": [last],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Attach the running per-user tracker to an event stream (or a
    batch DataFrame in tests via a single 'micro-batch'). Emits one
    updated row per user per micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=TRACKER_OUTPUT,
        stateStructType=TRACKER_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
