"""Kafka wire-format adapter tests: connector-shaped fixtures through
decode/encode/compaction, batch and streaming."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from yc_yq_airflow_etl_spark.sources.kafka_format import (
    KAFKA_WIRE_SCHEMA,
    decode_events,
    encode_events,
    latest_per_key,
)

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def wire(spark):
    rows = [
        (
            str(uid).encode(),
            f'{{"user_id": {uid}, "event_type": "{et}", "value": {v}}}'.encode(),
            "events",
            uid % 2,
            off,
            datetime(2024, 1, 1, 10, 0, off),
            0,
        )
        for off, (uid, et, v) in enumerate(
            [(1, "click", 1.0), (2, "view", 2.0), (1, "purchase", 9.5)]
        )
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_decode_wire_to_typed_rows(wire):
    out = decode_events(wire, VALUE_SCHEMA).collect()
    assert len(out) == 3
    byoff = {r.offset: r for r in out}
    assert byoff[0].user_id == 1 and byoff[0].event_type == "click"
    assert byoff[2].value == 9.5
    assert all(r.topic == "events" for r in out)


def test_encode_roundtrip(spark, wire):
    decoded = decode_events(wire, VALUE_SCHEMA)
    encoded = encode_events(
        decoded, "out-topic", "user_id", ["user_id", "event_type", "value"]
    )
    assert set(encoded.columns) == {"key", "value", "topic"}
    back = decode_events(
        encoded.withColumn("partition", F.lit(0))
        .withColumn("offset", F.monotonically_increasing_id())
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0)),
        VALUE_SCHEMA,
    )
    assert {(r.user_id, r.event_type, r.value) for r in back.collect()} == {
        (1, "click", 1.0),
        (2, "view", 2.0),
        (1, "purchase", 9.5),
    }


def test_log_compaction_latest_per_key(wire):
    latest = latest_per_key(wire, VALUE_SCHEMA, ["user_id"]).collect()
    got = {r.user_id: r.event_type for r in latest}
    assert got == {1: "purchase", 2: "view"}  # offset 2 beats offset 0


def test_wire_stream_decode(spark, wire, tmp_path):
    """The same decode runs on a readStream of connector-shaped files
    (what the real Kafka source emits per micro-batch)."""
    src = str(tmp_path / "wire")
    wire.write.parquet(src)
    stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(src)
    q = (
        decode_events(stream, VALUE_SCHEMA)
        .writeStream.format("memory")
        .queryName("kafka_decode")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) c FROM kafka_decode").first().c == 3
