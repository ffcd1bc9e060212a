"""Batch replays of the streaming window semantics over ``events``,
oracle-checked. The identical plan functions
(streaming/windows.py) run unchanged under a streaming source — the
live micro-batch/watermark behavior is covered by
tests/test_streaming.py, which the driver's rows-only check can't see.

Oracle notes: Spark's tumbling/sliding windows align to the epoch, as
does DuckDB ``time_bucket``; session windows have no DuckDB builtin,
so the oracle derives them with the lag/cumsum idiom (new session when
the gap from the previous event is >= the timeout — matching
session_window's 'absorb strictly-before last+gap' rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_testdata
from ..streaming.windows import (
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    return tumbling_window_counts(t["events"]).orderBy("window_start", "event_type")


TUMBLING_ORACLE = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    return sliding_window_counts(t["events"]).orderBy(
        "window_start", "event_type"
    )


SLIDING_ORACLE = """
WITH starts AS (
    SELECT event_type,
           unnest([CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT),
                   CAST(epoch(time_bucket(INTERVAL '30 minutes', ts)) AS BIGINT)
                   - 1800]) AS window_start
    FROM events
)
SELECT window_start, event_type, count(*) AS n
FROM starts GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_testdata(spark, sf_dir)
    return session_window_stats(t["events"]).orderBy("user_id", "session_start")


SESSION_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       CAST(epoch_ns(min(ts)) // 1000000000 AS BIGINT) AS session_start,
       CAST(epoch_ns(max(ts)) // 1000000000 + 300
            - epoch_ns(min(ts)) // 1000000000 AS BIGINT) AS duration_s,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-stream interval join
    (streaming/joins.py): per-user attributed purchases within 30
    minutes of a click. The same ``click_purchase_join`` condition
    runs live over two watermarked streams in
    tests/test_streaming.py::test_stream_stream_interval_join."""
    from ..streaming.joins import attributed_purchases_per_user

    t = load_testdata(spark, sf_dir)
    return attributed_purchases_per_user(t["events"]).orderBy("user_id")


CLICK_PURCHASE_ORACLE = """
SELECT c.user_id AS user_id,
       count(*) AS n_pairs,
       count(DISTINCT p.event_id) AS n_purchases,
       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events c
JOIN events p
  ON c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.user_id = c.user_id
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL '30 minutes'
GROUP BY 1 ORDER BY user_id
"""


def register_all() -> None:
    from .registry import register

    register("events_tumbling_hourly", events_tumbling_hourly, TUMBLING_ORACLE)
    register("events_sliding_counts", events_sliding_counts, SLIDING_ORACLE)
    register("events_session_stats", events_session_stats, SESSION_ORACLE)
    register(
        "stream_click_purchase_join",
        stream_click_purchase_join,
        CLICK_PURCHASE_ORACLE,
    )
