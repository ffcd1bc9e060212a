"""Snapshot-manifest committed parquet table.

``LakeTable.compact_partitions`` documents the S3 caveat honestly: a
directory-swap commit relies on atomic rename, which object stores do
not have (rename = copy + delete, and a reader listing the directory
mid-swap sees a torn table). The industry answer — the core of what a
Delta/Iceberg snapshot does — is to make the FILE LIST the unit of
commit instead of the directory:

- data files are immutable and write-once, under unique names;
- a manifest (one small JSON) lists the files of a snapshot;
- a commit writes new data files, writes manifest v(N+1), then
  atomically advances a single pointer; readers resolve the pointer
  and read exactly that manifest's files, never a directory listing.

Every mutation — overwrite, append, compaction — reduces to "write
files, publish manifest, advance pointer", so concurrent readers
always see a complete snapshot (old or new, never a mix), failed
writers leave only unreferenced garbage for vacuum, and time travel is
free (old manifests still resolve).

On HDFS/local-fs the pointer advance below (write temp + rename) is
atomic. On S3 the same advance is a conditional PUT (If-Match) or a
DynamoDB-style lock — single-object commit either way; the layout and
reader protocol need no change. Single-writer is assumed, as in the
reference's `max_active_runs=1` schedule (yq_dag.py:105).

Layout::

    <path>/data/<uuid>.parquet      immutable data files
    <path>/_manifests/v{N}.json     {"files": [...], "rows": R, ...}
    <path>/_latest                  text file holding N

Reference: the reference pipeline's idempotency contract
(yq_dag.py:16-19 delete-prefix-then-insert) is subsumed — re-running a
failed commit re-publishes the same logical snapshot and the orphaned
files of the failed attempt are vacuumed, never read.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class ManifestTable:
    path: str

    # -- internal layout helpers ----------------------------------------

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, "_manifests")

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_latest")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version}.json")) as fh:
            return json.load(fh)

    # -- write path ------------------------------------------------------

    def _write_files(self, df: DataFrame) -> tuple[list[str], int]:
        """Land df as immutable uniquely-named parquet files under
        data/ and return (relative file names, row count). Uses a
        staging dir for the Spark job output, then gives each part
        file a content-unique name — renaming UNPUBLISHED files is
        safe on any store because no manifest references them yet."""
        os.makedirs(self._data_dir, exist_ok=True)
        staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        names: list[str] = []
        for f in sorted(os.listdir(staging)):
            if f.endswith(".parquet"):
                name = f"{uuid.uuid4().hex}.parquet"
                os.rename(
                    os.path.join(staging, f), os.path.join(self._data_dir, name)
                )
                names.append(name)
        # drop job-control files (_SUCCESS etc.) with the staging dir
        for f in os.listdir(staging):
            os.remove(os.path.join(staging, f))
        os.rmdir(staging)
        return names, 0

    def _publish(self, files: list[str], rows: int, op: str) -> int:
        os.makedirs(self._manifest_dir, exist_ok=True)
        prev = self.current_version()
        version = 0 if prev is None else prev + 1
        manifest = {
            "version": version,
            "files": files,
            "rows": rows,
            "op": op,
            "committed_at": time.time(),
        }
        mpath = os.path.join(self._manifest_dir, f"v{version}.json")
        with open(mpath, "w") as fh:
            json.dump(manifest, fh)
        # atomic pointer advance: temp write + rename (HDFS/local).
        # On S3: conditional PUT of _latest with If-Match on the old
        # version — same single-object commit point.
        tmp = self._pointer + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._pointer)
        return version

    def overwrite(self, df: DataFrame) -> int:
        """Commit df as a full-replacement snapshot."""
        files, _ = self._write_files(df)
        rows = self._count_files(df.sparkSession, files)
        return self._publish(files, rows, "overwrite")

    def append(self, df: DataFrame) -> int:
        """Commit df's rows on top of the current snapshot: new files
        plus the previous snapshot's files — no rewrite of old data."""
        files, _ = self._write_files(df)
        prev = self.current_version()
        old = self._manifest(prev)["files"] if prev is not None else []
        rows = self._count_files(df.sparkSession, old + files)
        return self._publish(old + files, rows, "append")

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current snapshot into ``target_files`` files and
        commit. The OLD files stay on disk (still referenced by the
        previous manifest — readers mid-flight keep a complete table)
        until vacuum() retires them. This is the S3-safe version of
        LakeTable.compact_partitions' directory swap."""
        df = self.read(spark).coalesce(target_files)
        files, _ = self._write_files(df)
        rows = self._count_files(spark, files)
        return self._publish(files, rows, "compact")

    # -- read path -------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """The snapshot's DataFrame: reads exactly the manifest's file
        list (time travel via ``version``) — never a directory
        listing, so concurrent commits cannot tear it."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        files = [
            os.path.join(self._data_dir, f) for f in self._manifest(v)["files"]
        ]
        return spark.read.parquet(*files)

    def _count_files(self, spark: SparkSession, files: list[str]) -> int:
        if not files:
            return 0
        return spark.read.parquet(
            *[os.path.join(self._data_dir, f) for f in files]
        ).count()

    # -- maintenance -----------------------------------------------------

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files referenced ONLY by manifests older than
        the newest ``keep_versions`` snapshots (plus stray uncommitted
        files), and drop the retired manifests. Returns deleted file
        names. With keep_versions=1 only the live snapshot survives —
        run after readers of old snapshots have drained (retention
        windows in production)."""
        latest = self.current_version()
        if latest is None:
            return []
        keep_from = max(0, latest - keep_versions + 1)
        live: set[str] = set()
        for v in range(keep_from, latest + 1):
            live.update(self._manifest(v)["files"])
        deleted = []
        for f in os.listdir(self._data_dir):
            if f not in live:
                os.remove(os.path.join(self._data_dir, f))
                deleted.append(f)
        for mf in os.listdir(self._manifest_dir):
            v = int(mf[1:-5])  # v{N}.json
            if v < keep_from:
                os.remove(os.path.join(self._manifest_dir, mf))
        return sorted(deleted)
