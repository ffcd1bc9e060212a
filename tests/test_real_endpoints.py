"""Real-endpoint smoke tests — skipped unless the matching env vars
are set (see yc_yq_airflow_etl_spark/profiles.py for the contract).

Each test drives the SAME source/sink code path the in-tree stand-ins
exercise (local-fs parquet / embedded Derby / broker-less Kafka wire
format), so a green run here proves the stand-ins are config-only
swaps. In CI containers without endpoints these all skip — that is
the expected default."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark import profiles


@pytest.mark.skipif(
    not profiles.s3a_available(), reason="SG_S3_* / AWS_* env vars not set"
)
def test_s3a_parquet_roundtrip(spark):
    """Hive-partitioned write + partition-pruned read against a real
    S3-compatible store — identical LakeTable code path as the
    local-fs tests."""
    from yc_yq_airflow_etl_spark.sources.lake import LakeTable

    hconf = spark._jsc.hadoopConfiguration()
    for k, v in profiles.s3a_hadoop_conf().items():
        hconf.set(k, v)
    path = f"{profiles.s3a_bucket()}/smoke_{int(time.time())}"
    lake = LakeTable(path=path, partition_columns=("p",))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    lake.overwrite_partitions(df)
    back = lake.read(spark).filter(F.col("p") == 2)
    assert back.count() == 25


@pytest.mark.skipif(
    not profiles.pg_available(), reason="SG_PG_* env vars not set"
)
def test_pg_jdbc_roundtrip(spark):
    """Distributed JDBC write + partitioned read against real
    PostgreSQL — same JdbcConnection class as the Derby federation
    tests; only the URL/driver differ."""
    table = f"sg_smoke_{int(time.time())}"
    conn = profiles.pg_connection(table)
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    conn.write(df.coalesce(4), mode="overwrite")
    back = profiles.pg_connection(table)
    assert back.read(spark).count() == 1000


@pytest.mark.skipif(
    not profiles.kafka_available(), reason="SG_KAFKA_* env vars not set"
)
def test_kafka_format_roundtrip(spark):
    """format('kafka') batch write + read against a real broker, with
    the engine's broker-less wire encode/decode on both ends."""
    from pyspark.sql import types as T

    from yc_yq_airflow_etl_spark.sources.kafka_format import (
        decode_events,
        encode_events,
    )

    opts = profiles.kafka_options()
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    df = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("msg-"), F.col("id")).alias("v")
    )
    wire = encode_events(df, topic=opts["subscribe"], key_col="k")
    (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", opts["kafka.bootstrap.servers"])
        .save()
    )
    back = (
        spark.read.format("kafka")
        .options(**opts)
        .load()
    )
    decoded = decode_events(back, schema)
    assert decoded.count() >= 50
