"""SparkSession builder with the engine's scale-oriented defaults.

The reference delegates planning to Yandex Query / PostgreSQL; our
equivalent of its observed behavior (column pruning, predicate
pushdown, partition pruning — SURVEY.md §4) is Catalyst with AQE on.
The settings below are the ones that matter at 100 TB:

- AQE: runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic broadcast demotion — replaces hand-tuned partition counts.
- ``partitionOverwriteMode=dynamic``: the reference's
  delete-prefix-then-insert idempotency step (yq_dag.py:16-19) becomes
  an atomic per-partition overwrite.
- UTC session timezone: the reference's minute-grid data is TZ-naive;
  fixing UTC keeps parity with the DuckDB oracle.
- Arrow enabled: every Pandas-UDF operator (similarity, multimodal)
  rides Arrow batches, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "yc-yq-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else ``*``)
    so the same entry point works in tests, bench, and a real cluster
    (where ``master`` is injected by spark-submit and must be None).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    # Python WORKER importability, independent of cwd: the driver can
    # import this package because the entry script put the repo root on
    # sys.path (or cwd happened to be the checkout), but executor-side
    # Python workers inherit neither — any Pandas UDF that references
    # package code then dies with ModuleNotFoundError when the session
    # is built from a foreign cwd (caught by tools/examples_smoke.py).
    # Local-mode workers DO inherit the process environment, so putting
    # the repo root on PYTHONPATH before the JVM starts fixes every
    # local entry point; on a real cluster ship the package with
    # --py-files / pip install as usual (this prepend is then inert).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI posture is PINNED, not inherited: Spark 4 defaults ANSI
        # on, Spark 3 defaulted it off, and operator semantics differ
        # materially across the flag — cast overflow and div-by-zero
        # throw vs return NULL, and degenerate-input failure modes
        # flip between loud and silent (the z-order NaN domain hole
        # was CAST_OVERFLOW under ANSI but SILENT de-clustering under
        # ANSI-off; invariant #30). The engine's loud-or-quarantine
        # doctrine assumes ANSI-on: unguarded arithmetic on corrupt
        # data must fail the job, never fabricate NULLs. Operators
        # that must tolerate bad rows carry their own explicit guards
        # (try_cast/when-isnan/quarantine), so they behave identically
        # either way — pinning `true` makes that the TESTED posture on
        # every Spark version rather than whatever the build defaults.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Write timestamps as INT64 micros, not legacy INT96: INT96
        # row groups carry no min/max statistics, which silently
        # disables row-group skipping for every time-range filter on
        # the lake (the cooling pipeline's main access pattern).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # Files-first workloads: pack small test files but keep 128 MiB
        # splits so a 100 TB lake scan parallelizes across executors.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
