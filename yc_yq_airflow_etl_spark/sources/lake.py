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

import math
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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

    def overwrite_partitions(
        self, df: DataFrame, sort_by: tuple[str, ...] | None = None
    ) -> None:
        """Replace exactly the Hive partitions present in ``df``
        (reference steps S3+S4 fused). Requires the session conf
        ``partitionOverwriteMode=dynamic`` (set by build_session); we
        also set it per-write so driver-owned sessions behave.

        ``sort_by``: cluster rows inside each task's output file by
        these columns (``sortWithinPartitions`` — a per-task sort, no
        extra shuffle). Sorted layout makes the parquet row-group
        min/max statistics (zone maps) disjoint on the sort key, so a
        later range filter — e.g. the reconciliation readback's
        ``payment_date`` window (yq_dag.py:89-91) — skips whole row
        groups instead of decoding them. At 100 TB this is the
        difference between scanning a partition and scanning the few
        megabytes the filter touches."""
        spark = df.sparkSession
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        # set per-write, RESTORED after: leaking dynamic into the
        # shared session would silently change unrelated overwrite
        # writes (static full-table rewrites would keep stale
        # partitions absent from the new frame)
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "dynamic")
        try:
            if sort_by:
                df = self._cluster(df, sort_by)
            (
                df.write.mode("overwrite")
                .partitionBy(*self.partition_columns)
                .parquet(self.path)
            )
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)

    def append(
        self, df: DataFrame, sort_by: tuple[str, ...] | None = None
    ) -> None:
        if sort_by:
            df = self._cluster(df, sort_by)
        df.write.mode("append").partitionBy(*self.partition_columns).parquet(self.path)

    def _cluster(self, df: DataFrame, sort_by: tuple[str, ...]) -> DataFrame:
        # The partition columns MUST lead the sort key: a partitioned
        # write requires rows ordered by partition columns (one open
        # file at a time per task) and inserts its own — unstable —
        # sort if the incoming order doesn't already satisfy that,
        # which would scramble the data-column clustering we're after.
        return df.sortWithinPartitions(*self.partition_columns, *sort_by)

    def partition_stats(self, spark: SparkSession) -> dict[str, tuple[int, int]]:
        """Driver-side metadata scan: ``{partition_dir_name: (bytes,
        n_data_files)}`` via the Hadoop FileSystem API (the same
        listing a query's file index performs). Metadata-only — cost
        scales with partition/file count, not data size."""
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
        out: dict[str, tuple[int, int]] = {}
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory() or "=" not in name:
                continue
            files = [
                f
                for f in fs.listStatus(st.getPath())
                if f.isFile() and not f.getPath().getName().startswith("_")
            ]
            out[name] = (sum(f.getLen() for f in files), len(files))
        return out

    def compact_partitions(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
    ) -> dict[str, tuple[int, int]]:
        """Small-file compaction — the lake maintenance step every
        append-mode pipeline at scale needs (each incremental load
        S3/yq_dag.py:71-73 adds files; a year of hourly micro-batches
        is ~9k files/partition, and 100 TB tables die by file-listing
        and per-file open cost long before they die by bytes).

        For every Hive partition whose data-file count exceeds
        ``ceil(bytes / target_file_bytes)``, rewrite that partition's
        rows into that many ~target-size files. The rewrite is one
        distributed job for all affected partitions: rows get a group
        id assigned by hashing within their partition (group counts
        arrive via a broadcast map), one shuffle co-locates each
        output file's rows, and the result lands in a staging dir
        that is swapped in per-partition with filesystem renames.

        On HDFS the rename swap is atomic per partition; on S3-like
        stores rename is copy+delete, so production deployments put a
        table format's commit protocol (Delta/Iceberg snapshot) over
        the same rewrite plan. The rewrite job itself — the scalable
        part — is identical either way.

        Returns ``{partition_dir: (files_before, files_after)}`` for
        the partitions rewritten. Only single-column partitioning is
        supported (all tables in this engine use one).
        """
        if len(self.partition_columns) != 1:
            raise ValueError("compact_partitions supports 1 partition column")
        pcol = self.partition_columns[0]

        stats = self.partition_stats(spark)
        plan: dict[str, int] = {}  # partition value -> target file count
        before: dict[str, int] = {}
        for dirname, (nbytes, nfiles) in stats.items():
            target = max(1, math.ceil(nbytes / target_file_bytes))
            if nfiles > target:
                raw = dirname.split("=", 1)[1]
                if raw == "__HIVE_DEFAULT_PARTITION__":
                    # NULL partition value: isin(NULL) can never select
                    # it, so a rewrite would stage nothing and the swap
                    # below would destroy the partition. Leave it alone.
                    continue
                # Hive escapes special chars (space, '%', ':', ...) in
                # directory names; the column holds the unescaped value.
                plan[urllib.parse.unquote(raw)] = target
                before[dirname] = nfiles
        if not plan:
            return {}

        # isin on the partition column → PartitionFilters: only the
        # affected partitions are scanned (literals coerce to the
        # column's inferred type, keeping pruning intact)
        df = self.read(spark).filter(F.col(pcol).isin(list(plan)))
        targets = spark.createDataFrame(
            [(v, n) for v, n in plan.items()], "_pv string, _groups int"
        )
        data_cols = [c for c in df.columns if c != pcol]
        grouped = (
            df.join(F.broadcast(targets), df[pcol].cast("string") == F.col("_pv"))
            .withColumn(
                "_g", F.pmod(F.xxhash64(*data_cols), F.col("_groups"))
            )
            .drop("_pv", "_groups")
        )
        staging = self.path.rstrip("/") + "/_compacting"
        (
            grouped.repartition(sum(plan.values()), F.col(pcol), F.col("_g"))
            .drop("_g")
            .write.mode("overwrite")
            .partitionBy(pcol)
            .parquet(staging)
        )

        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(self.path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # Verify every staged replacement exists BEFORE deleting any
        # live partition — a partition value that fails to round-trip
        # through the isin() filter would otherwise be silently lost.
        missing = [
            d
            for d in before
            if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{staging}/{d}"))
        ]
        if missing:
            fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)
            raise RuntimeError(
                f"compaction staged no data for partitions {missing}; "
                "aborting swap (live data untouched)"
            )
        for dirname in before:
            _swap_partition_dir(jvm, fs, self.path, staging, dirname)
        fs.delete(jvm.org.apache.hadoop.fs.Path(staging), True)

        after = self.partition_stats(spark)
        return {d: (before[d], after[d][1]) for d in before}


def _swap_partition_dir(
    jvm, fs, base: str, staging: str, dirname: str
) -> None:
    """Swap one live partition dir for its staged replacement via two
    renames (r15): the old ``delete(old) → rename(new, old)`` order
    left a crash window where the ORIGINAL data was already deleted
    before the replacement landed — the partition was simply gone from
    the live tree (the rewrite survived only as unreferenced staging
    debris). Rename-aside first: the original moves to
    ``<staging>/_replaced_<dirname>`` (rename refuses an existing
    destination, so delete-first was never required — moving it is),
    then the replacement renames in; on failure the original renames
    BACK, loudly. A crash between the two renames leaves BOTH copies
    on disk (recover by renaming ``_replaced_*`` back); nothing is
    deleted until the staging cleanup after every partition swapped.
    Readers racing the window still see a missing partition — the
    documented trade of the Hive-layout lake vs the manifest table's
    snapshot protocol (this module's docstring)."""
    old = jvm.org.apache.hadoop.fs.Path(f"{base}/{dirname}")
    new = jvm.org.apache.hadoop.fs.Path(f"{staging}/{dirname}")
    trash = jvm.org.apache.hadoop.fs.Path(f"{staging}/_replaced_{dirname}")
    if not fs.rename(old, trash):
        raise RuntimeError(
            f"compaction swap could not move live partition {dirname} "
            "aside; live data untouched"
        )
    # Hadoop rename signals failure EITHER by returning false OR by
    # raising (RawLocalFileSystem throws FileNotFoundException for a
    # missing source) — the rollback must cover both, or the original
    # would be stranded in the trash slot exactly when restoring it
    # matters most
    try:
        ok = bool(fs.rename(new, old))
    except Exception:
        ok = False
    if not ok:
        fs.rename(trash, old)
        raise RuntimeError(
            f"compaction swap rename failed for {dirname}; original "
            f"partition restored, rewritten data preserved at {staging}"
        )
