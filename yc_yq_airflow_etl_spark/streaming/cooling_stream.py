"""The cooling pipeline as a Structured Streaming job.

Reference mapping (SURVEY.md §2.10): the Airflow schedule policy
``@hourly, max_active_runs=1, catchup=False`` (yq_dag.py:47-51)
becomes a single streaming query with a processing-time trigger — one
concurrent run by construction; the manual EXP_DATE watermark (C5)
becomes the checkpointed source offset, advanced exactly-once by the
engine instead of by a post-success Variable.set.

Two entry points:

- :func:`stream_events_to_lake` — generic continuous ingestion:
  file-source stream → event-time watermark → partitioned parquet
  sink with checkpointing (exactly-once file sink semantics).
- :func:`cooling_foreach_batch` — the reference's transactional
  load→reconcile→branch step run per micro-batch via foreachBatch,
  preserving the safety property (a failed reconcile raises inside
  the batch, failing the query before anything is retired).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators import exclusion_join
from ..plans.cooling import RECONCILE_KEY, ReconciliationError
from ..sources.lake import LakeTable


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def stream_events_to_lake(
    events: DataFrame,
    lake_path: str,
    checkpoint: str,
    partition_by: str = "event_type",
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Continuous append of an event stream into a partitioned lake
    table. The file sink's transaction log makes restarts
    exactly-once; the watermark bounds state for any downstream
    aggregation reading this stage."""
    return (
        events.withWatermark("ts", watermark)
        .writeStream.format("parquet")
        .option("path", lake_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(partition_by)
        .outputMode("append")
        .start()
    )


def cooling_foreach_batch(
    lake: LakeTable,
    year_col: Callable[[DataFrame], F.Column] = lambda df: F.year("payment_date"),
    on_diff: Callable[[int, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the per-micro-batch body: write the batch's partitions
    (dynamic overwrite keeps re-delivered batches idempotent), then
    reconcile the written partitions against the batch — the
    EXCLUSION JOIN safety check (yq_dag.py:93-94) applied at
    micro-batch granularity.

    Contract: micro-batches must be partition-aligned (a Hive
    partition never spans two batches) — the same alignment the
    reference guarantees with its one-year-per-run window. Overwrite
    then makes redelivery idempotent; unaligned sources need the
    append+dedup variant instead."""

    def body(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from pyspark import StorageLevel

        # persist ONCE: the batch plan is otherwise re-evaluated three
        # times per trigger (partition write, distinct-years collect,
        # exclusion join) — tripling source-read cost on the hot path
        staged = batch.withColumn(
            "payment_year", year_col(batch).cast("int")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            lake.overwrite_partitions(staged)

            spark = batch.sparkSession
            years = [
                r[0]
                for r in staged.select("payment_year").distinct().collect()
            ]
            # NULL-aware readback: a NULL year lands in Hive's default
            # partition; `isin([None, ...])` is never true for NULL
            # rows, so without the isNull branch those rows would show
            # up only on the staged side of the symmetric diff — a
            # FALSE ReconciliationError that poison-pills the stream
            # (replay reproduces it forever). The reconcile's job is
            # verifying the write, and the write did succeed.
            year_filter = F.col("payment_year").isin(
                [y for y in years if y is not None]
            )
            if any(y is None for y in years):
                year_filter = year_filter | F.col("payment_year").isNull()
            readback = lake.read(spark).filter(year_filter)
            diff = exclusion_join(
                staged.select(*RECONCILE_KEY),
                readback.select(*RECONCILE_KEY),
                RECONCILE_KEY,
            ).count()
        finally:
            staged.unpersist(blocking=False)
        if on_diff is not None:
            on_diff(batch_id, diff)
        if diff != 0:
            raise ReconciliationError(
                f"Data are not equal! diff={diff} in micro-batch {batch_id}"
            )

    return body


def run_cooling_stream(
    payments_stream: DataFrame,
    lake: LakeTable,
    checkpoint: str,
    trigger_seconds: int | None = None,
    on_diff: Callable[[int, int], None] | None = None,
) -> StreamingQuery:
    """Wire the micro-batch body to a stream. ``trigger_seconds=None``
    → availableNow (process backlog then stop: the batch-pipeline
    parity mode used in tests); otherwise a processing-time trigger —
    the reference's @hourly tick is ``trigger_seconds=3600``."""
    writer = payments_stream.writeStream.foreachBatch(
        cooling_foreach_batch(lake, on_diff=on_diff)
    ).option("checkpointLocation", checkpoint)
    if trigger_seconds is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
