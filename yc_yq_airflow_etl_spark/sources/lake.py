"""Partitioned Parquet lake table — the engine's equivalent of the
reference's Object Storage binding (``etl_object_storage``: bucket
``etl-bucket``, prefix ``etl/``, Hive layout
``payment_year=${payment_year}/`` — img/YQLink1.png–YQLink4.png).

The reference makes re-runs idempotent with an explicit
list-and-delete of the target prefix before INSERT
(yq_dag.py:16-19,54-59). Spark subsumes that whole step: a
``mode("overwrite")`` write with
``spark.sql.sources.partitionOverwriteMode=dynamic`` replaces exactly
the partitions present in the incoming data and leaves the rest of
the table untouched — same contract, atomic per partition, no
bespoke S3 listing code.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class LakeTable:
    path: str
    partition_columns: tuple[str, ...] = ("payment_year",)
    schema: T.StructType | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            # partition columns come from directory names, not footers
            data_fields = [
                f for f in self.schema.fields if f.name not in self.partition_columns
            ]
            reader = reader.schema(T.StructType(data_fields))
        df = reader.parquet(self.path)
        return df

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Replace exactly the Hive partitions present in ``df``
        (reference steps S3+S4 fused). Requires the session conf
        ``partitionOverwriteMode=dynamic`` (set by build_session); we
        also set it per-write so driver-owned sessions behave."""
        spark = df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            df.write.mode("overwrite")
            .partitionBy(*self.partition_columns)
            .parquet(self.path)
        )

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(*self.partition_columns).parquet(self.path)
