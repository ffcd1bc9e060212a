"""Kafka-wire-format adapter.

No broker exists in the test environment, but Spark's Kafka connector
has a fixed output shape — ``key binary, value binary, topic string,
partition int, offset long, timestamp timestamp, timestampType int``.
This module implements the part that is engine logic rather than
transport: turning that wire shape into typed event rows (and back),
so a real ``spark.readStream.format("kafka")`` source drops in with
zero changes downstream. Tests drive it with parquet fixtures shaped
exactly like the connector's output; the same functions run on the
real connector DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def decode_events(wire: DataFrame, value_schema: T.StructType) -> DataFrame:
    """Kafka wire rows → typed event rows: UTF-8 decode the value
    payload, parse JSON against the declared schema, keep the
    (topic, partition, offset) provenance columns that exactly-once
    consumers de-duplicate on."""
    parsed = wire.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("_v"),
    )
    return parsed.select(
        "topic", "partition", "offset", "kafka_ts", "_v.*"
    )


def encode_events(
    events: DataFrame, topic: str, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """Typed rows → Kafka producer shape (``key``/``value`` binary +
    ``topic``) accepted by ``df.write.format("kafka")``."""
    cols = value_cols or [c for c in events.columns]
    return events.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    )


def latest_per_key(wire: DataFrame, value_schema: T.StructType, key_cols: list[str]) -> DataFrame:
    """Log-compaction semantics: keep each key's highest-offset record
    (per topic/partition ordering, the connector's delivery order)."""
    from pyspark.sql import Window

    decoded = decode_events(wire, value_schema)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("offset").desc(), F.col("partition").asc()
    )
    return (
        decoded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
