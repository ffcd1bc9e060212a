"""Batch-replayable streaming semantics over the events table
(tumbling/sliding/session windows); the live Structured Streaming
variants live in ``yc_yq_airflow_etl_spark.streaming``."""

from __future__ import annotations


def register_all() -> None:
    pass
