"""Structured Streaming surface: windowed aggregations over event
streams and the cooling pipeline as a continuously-triggered stream.

The reference has no true streaming — its 'stream' is an hourly
Airflow tick polling a manual watermark (yq_dag.py:13-14,47; SURVEY.md
§2.10 C5/C8). This package is where that pattern becomes real
Structured Streaming: checkpointed state, event-time watermarks,
tumbling/sliding/session windows, and foreachBatch for the
transactional load-reconcile-retire step."""

from .windows import (  # noqa: F401
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)
