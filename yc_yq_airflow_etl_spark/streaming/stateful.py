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
from pyspark.sql import functions as F
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
        if not len(pdf):  # empty chunks occur; int(nan.max()) raises
            continue
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
    updated row per user per micro-batch (update mode). Malformed
    events (NULL ts, non-finite value) are dropped before the
    stateful function — same poison-pill rationale as
    :func:`user_spend_alerts`."""
    events = events.filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=TRACKER_OUTPUT,
        stateStructType=TRACKER_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- spend-threshold alerts (second custom stateful operator) -----------
#
# Emission depends on ALL history per key (lifetime cumulative spend
# crossing multiples of a threshold) — exactly what fixed windows
# cannot express. State is two longs per key: O(1), cents-integer so
# the arithmetic is bit-identical across engines and micro-batch
# boundaries (no float accumulation-order hazards).
#
# Note on API choice: Spark 4's transformWithStateInPandas is the
# successor API for this shape, but its Python state client needs the
# protobuf package, which this environment lacks — so the operator
# rides applyInPandasWithState (same state-store machinery, GroupState
# flavor). The call-site contract below is API-agnostic.

SPEND_ALERT_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("alert_level", T.LongType(), False),
        T.StructField("cum_cents", T.LongType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
    ]
)

SPEND_ALERT_STATE = T.StructType(
    [
        T.StructField("cents", T.LongType(), False),
        T.StructField("alerts", T.LongType(), False),
    ]
)


def _make_spend_alert_fn(threshold_cents: int):
    def _alerts(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        cents, alerts = state.get if state.exists else (0, 0)
        out: dict[str, list] = {
            "user_id": [],
            "alert_level": [],
            "cum_cents": [],
            "ts_epoch": [],
        }
        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs).sort_values(["ts", "event_id"])
            for ts, v in zip(pdf["ts"], pdf["value"]):
                cents += int(round(float(v) * 100))
                while alerts < cents // threshold_cents:
                    alerts += 1
                    out["user_id"].append(user_id)
                    out["alert_level"].append(alerts)
                    out["cum_cents"].append(cents)
                    out["ts_epoch"].append(
                        int(pd.Timestamp(ts).value // 1_000_000_000)
                    )
        state.update((cents, alerts))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return _alerts


def user_spend_alerts(
    events: DataFrame, threshold_cents: int = 50_000
) -> DataFrame:
    """Per-user spend-threshold alerts: one row each time a user's
    lifetime ``purchase`` total crosses another multiple of
    ``threshold_cents`` (several rows if one purchase jumps several
    multiples). Rows are processed in (ts, event_id) order within a
    key, so output is deterministic.

    Works over a stream (state persists across micro-batches) or a
    batch DataFrame (single state lifetime — the oracle-checkable
    face, registered as ``stateful_spend_alerts``).

    Malformed events — NULL/NaN/±Inf value, NULL ts — are DROPPED
    before the stateful function (JVM-side filter, r14): inside the
    function, int(round(NaN * 100)) raises, the streaming query dies,
    and the restart replays the SAME micro-batch into the same death —
    one poison-pill event permanently wedges the pipeline. Cleansing
    malformed rows is the admission gate's job; a stateful alerting
    operator must tolerate them."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs("value") != float("inf"))
        )
        .select("user_id", "event_id", "ts", "value")
    )
    return purchases.groupBy("user_id").applyInPandasWithState(
        _make_spend_alert_fn(threshold_cents),
        outputStructType=SPEND_ALERT_OUTPUT,
        stateStructType=SPEND_ALERT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- inactivity detection via EventTimeTimeout --------------------------
#
# The third stateful shape, and the one neither windows nor the two
# operators above can express: emit when a key STOPS producing events
# (session-end / user-churn / sensor-silence detection). Timers are the
# distinguishing state-store feature: each key arms an event-time
# timeout at (last event + gap); when the WATERMARK passes that mark,
# Spark invokes the function with ``hasTimedOut`` and no data, the
# closure row is emitted, and the state is removed — so state size is
# bounded by the number of concurrently-active keys, and silence is
# detected without any polling scan of the state store.
#
# EventTimeTimeout (not ProcessingTimeTimeout) on purpose: firing is a
# pure function of the DATA's timestamps and the watermark, so replays
# and catch-up runs produce the same alerts — wall-clock timers do not.

INACTIVITY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts_epoch", T.LongType(), False),
    ]
)

INACTIVITY_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts_epoch", T.LongType(), False),
    ]
)


def _make_inactivity_fn(gap_seconds: int):
    def _monitor(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, last = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "last_ts_epoch": [last],
                }
            )
            return
        n, last = state.get if state.exists else (0, 0)
        for pdf in batches:
            if len(pdf):
                n += len(pdf)
                last = max(
                    last,
                    int(pdf["ts"].astype("int64").max() // 1_000_000_000),
                )
        state.update((n, last))
        # arm (or re-arm) the silence timer at last-seen + gap; epoch ms
        state.setTimeoutTimestamp((last + gap_seconds) * 1000)

    return _monitor


def user_inactivity_alerts(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit ONE row per user when they fall silent for ``gap_seconds``
    of event time: (user_id, n_events, last_ts_epoch) at the moment
    the watermark passes their silence deadline. The state (two longs
    per key) is removed on emission — churned keys cost nothing."""
    # NULL-ts rows carry no event time: they can neither advance the
    # watermark nor define "silence", and a key whose only rows are
    # NULL-ts would arm a timer at epoch+gap — behind the watermark,
    # which Spark rejects, killing the query (same poison-pill shape
    # as the NaN value in user_spend_alerts)
    w = (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .select("user_id", "ts")
    )
    return w.groupBy("user_id").applyInPandasWithState(
        _make_inactivity_fn(gap_seconds),
        outputStructType=INACTIVITY_OUTPUT,
        stateStructType=INACTIVITY_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
