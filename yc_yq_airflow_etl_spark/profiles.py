"""Real-endpoint config profiles.

The engine's sources are exercised in-tree against stand-ins that
share the exact Spark code path with the real services: local-fs
parquet for the S3 object-store binding (reference: the bucket
binding shown in img/YQLink1.png), embedded Derby for PostgreSQL
(reference: managed PG behind a :6432 pooler, src/tf/pg.tf:47), and
the Kafka *wire format* without a broker (sources/kafka_format.py).

This module is the proof that those stand-ins are CONFIG-ONLY swaps:
each profile turns environment variables into the exact conf/options
object the existing source code consumes — no other code changes.
tests/test_real_endpoints.py contains one skipped-by-default
integration test per profile that runs when the variables are set.

Environment contract (each profile raises ProfileUnavailable with the
missing names otherwise):

S3-compatible object store (``s3a://``):
    SG_S3_BUCKET            s3a://bucket/prefix to read/write under
    SG_S3_ENDPOINT          endpoint URL (any S3-API store)
    AWS_ACCESS_KEY_ID, AWS_SECRET_ACCESS_KEY (standard AWS vars)
    The cluster must ship hadoop-aws + aws sdk jars (standard on any
    managed Spark; not bundled here).

PostgreSQL:
    SG_PG_URL               jdbc:postgresql://host:6432/db
    SG_PG_USER, SG_PG_PASSWORD
    The cluster must ship the postgresql JDBC driver jar.

Kafka:
    SG_KAFKA_BOOTSTRAP      host:9092[,host2:9092]
    SG_KAFKA_TOPIC          topic for the smoke round-trip
    The cluster must ship spark-sql-kafka.
"""

from __future__ import annotations

import os


class ProfileUnavailable(RuntimeError):
    """Raised when a profile's environment variables are not set."""


def _require(*names: str) -> list[str]:
    missing = [n for n in names if not os.environ.get(n)]
    if missing:
        raise ProfileUnavailable(
            "endpoint profile needs env vars: " + ", ".join(missing)
        )
    return [os.environ[n] for n in names]


def s3a_available() -> bool:
    return all(
        os.environ.get(n)
        for n in ("SG_S3_BUCKET", "SG_S3_ENDPOINT", "AWS_ACCESS_KEY_ID",
                  "AWS_SECRET_ACCESS_KEY")
    )


def s3a_bucket() -> str:
    """The s3a:// URI to run the smoke round-trip under."""
    (bucket,) = _require("SG_S3_BUCKET")
    return bucket.rstrip("/")


def s3a_hadoop_conf() -> dict[str, str]:
    """fs.s3a.* settings for an S3-compatible store. Apply to a live
    session via ``spark._jsc.hadoopConfiguration().set(...)`` (fs
    settings are read per-path, not at session build) or pass through
    ``build_session(extra_conf={'spark.hadoop.' + k: v})``."""
    endpoint, key, secret = _require(
        "SG_S3_ENDPOINT", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"
    )
    return {
        "fs.s3a.endpoint": endpoint,
        "fs.s3a.access.key": key,
        "fs.s3a.secret.key": secret,
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.ssl.enabled": str(
            endpoint.startswith("https")
        ).lower(),
    }


def pg_available() -> bool:
    return all(
        os.environ.get(n) for n in ("SG_PG_URL", "SG_PG_USER", "SG_PG_PASSWORD")
    )


def pg_connection(table: str, name: str = "pg"):
    """A catalog.JdbcConnection pointed at real PostgreSQL — the SAME
    class every Derby-backed federation/maintenance test drives, which
    is the whole point: swapping Derby for PG is this function."""
    from .catalog import JdbcConnection

    url, user, password = _require("SG_PG_URL", "SG_PG_USER", "SG_PG_PASSWORD")
    return JdbcConnection(
        name=name,
        url=url,
        table=table,
        properties={
            "user": user,
            "password": password,
            "driver": "org.postgresql.Driver",
        },
    )


def kafka_available() -> bool:
    return all(os.environ.get(n) for n in ("SG_KAFKA_BOOTSTRAP", "SG_KAFKA_TOPIC"))


def kafka_options() -> dict[str, str]:
    """Options for ``spark.read/readStream.format('kafka')``. The
    payload en/decoding on top is sources/kafka_format.py — already
    exercised broker-less; these options are the only broker-specific
    piece."""
    bootstrap, topic = _require("SG_KAFKA_BOOTSTRAP", "SG_KAFKA_TOPIC")
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }
