"""Mergeable distinct-count sketches (DataSketches HLL, built into
Spark 4's ``hll_sketch_agg`` family).

Why this exists in a cooling pipeline: the reference DESTROYS source
partitions after export (drop_copied_partition, yq_dag.py:106-122).
Any global statistic that needs the raw rows — "distinct debit
accounts across all years" — becomes a full-lake scan afterwards, and
at 100 TB that scan is the most expensive query in the system. A
persisted HLL sketch per retired partition makes the statistic
incremental: each pipeline run adds one ~4 KB binary row, and the
all-time answer is a union of sketches — kilobytes, not terabytes.

The sketch column is plain BINARY in parquet, so the store is just a
LakeTable-style path: no custom serialization, readable by any Spark
or DataSketches-compatible engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One row per group: a mergeable HLL sketch of ``value_col``'s
    distinct values plus the exact row count. lgK=12 → ~1.6% relative
    standard error in ~4 KB per sketch."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_estimate(
    sketches: DataFrame, by: Sequence[str] = ()
) -> DataFrame:
    """Union sketches (optionally per ``by`` group) and return the
    distinct-count estimate. Input is the persisted sketch table —
    the raw data is not touched."""
    agg = [
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").alias("n_rows"),
    ]
    if by:
        return sketches.groupBy(*list(by)).agg(*agg)
    return sketches.agg(*agg)


class SketchStore:
    """Parquet-backed store of per-partition sketches, appended by the
    pipeline as each partition is exported/retired."""

    def __init__(self, path: str):
        self.path = path

    def add(self, sketches: DataFrame) -> None:
        sketches.write.mode("append").parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    def estimate(
        self, spark: SparkSession, by: Sequence[str] = ()
    ) -> DataFrame:
        return merge_estimate(self.read(spark), by)
