"""Structured Streaming sink into a ManifestTable — exactly-once.

``foreachBatch`` gives at-least-once delivery: after a crash between
the batch's write and the checkpoint commit, the SAME micro-batch
(same ``batch_id``) is replayed. Parquet-append sinks deduplicate by
directory convention; a ManifestTable does it transactionally — the
batch id rides the manifest as a carried-forward high-water mark, so
a replayed batch is detected from the latest manifest alone and
skipped BEFORE any files are written. Rows therefore land exactly
once, and each micro-batch is one atomic snapshot (readers never see
a partial batch — the same guarantee every commit through the table
has).

This composes the two scale pieces: bounded-state streaming in front,
snapshot-committed lake behind — the standard shape of a production
ingestion path (Kafka → stream → Delta/Iceberg), built here from the
engine's own primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.manifest import ManifestTable


def commit_batch(table: ManifestTable, batch_df: DataFrame, batch_id: int) -> bool:
    """Idempotently commit one micro-batch: skip (returning False) if
    ``batch_id`` is at or below the table's committed high-water mark,
    else append-commit with the id recorded. Exposed separately from
    the query wiring so replay semantics are directly testable."""
    spark = batch_df.sparkSession
    if batch_id <= table.last_batch_id(spark):
        return False
    table.append(batch_df, batch_id=batch_id)
    return True


def stream_to_manifest_table(
    stream: DataFrame, table: ManifestTable, checkpoint: str
) -> StreamingQuery:
    """Start the exactly-once ingestion query: every micro-batch is an
    atomic manifest commit, replays are skipped by batch id."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, bid: commit_batch(table, df, bid)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
