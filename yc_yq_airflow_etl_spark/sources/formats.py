"""Multi-format source/sink helpers (SURVEY.md §2.12 'other formats').

The reference reads exactly two formats (PG via federation, Parquet on
S3). Real pipelines also land CSV/JSON drops and ORC archives; these
wrappers standardize the engine's conventions: explicit schema always
(inference is both slow — a full pre-scan — and nondeterministic),
UTC timestamps, and Hive partitioning on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_OPTIONS: dict[str, dict[str, str]] = {
    # mode=FAILFAST (r15 degenerate-input sweep): Spark's PERMISSIVE
    # default silently turns a malformed CSV/JSON row into all-NULLs —
    # at corpus scale that is undetectable data corruption, the exact
    # failure class the loud-or-quarantine doctrine exists for. Callers
    # running a quarantine flow override with
    # ``mode="PERMISSIVE", columnNameOfCorruptRecord="_corrupt"``.
    "csv": {
        "header": "true",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss",
        "mode": "FAILFAST",
    },
    "json": {"mode": "FAILFAST"},
    "orc": {},
    "parquet": {},
}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    if fmt not in READ_OPTIONS:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(READ_OPTIONS)}")
    reader = spark.read.format(fmt).schema(schema)
    for k, v in {**READ_OPTIONS[fmt], **options}.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    **options: str,
) -> None:
    if fmt not in READ_OPTIONS:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(READ_OPTIONS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true").option(
            "timestampFormat", "yyyy-MM-dd HH:mm:ss"
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
