"""Named connection/binding registry.

The reference separates *connections* (a named federated source, e.g.
the PG cluster ``pg-finance`` — img/YQPGConnection.png) from
*bindings* (a schema-declared table over a connection, e.g. the
Parquet binding ``etl_object_storage`` over bucket ``etl-bucket``,
prefix ``etl/``, Hive-partitioned by ``payment_year`` —
img/YQLink1.png–YQLink4.png). Queries then refer to both by name
(``yq_dag.py:67,89``).

We keep the same two-level model: a :class:`Catalog` maps names to
source descriptors; ``plans``/``sources`` resolve names to DataFrames.
For tests the ``pg-finance`` connection is backed by a parquet fixture
standing in for JDBC (same schema, same semantics); against a real
cluster it is a JDBC descriptor with partitioned-read options.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class JdbcConnection:
    """Federated JDBC source (reference S1; yq_dag.py:67).

    ``partition_column``/``num_partitions`` give Spark a partitioned
    read — the reference reads through one PG connection, which cannot
    feed 1000 executors; at scale every JDBC scan must be split.
    """

    name: str
    url: str
    table: str
    properties: dict[str, str] = field(default_factory=dict)
    partition_column: str | None = None
    lower_bound: str | None = None
    upper_bound: str | None = None
    num_partitions: int = 32

    def read(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .option("pushDownPredicate", "true")
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column:
            # Spark requires all four partitioned-read options
            # together; a None bound reaches the JVM as the string
            # "None" and dies deep in the JDBC relation with an error
            # naming none of them (r16)
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    f"JDBC source {self.name!r}: partition_column "
                    f"{self.partition_column!r} needs explicit "
                    "lower_bound AND upper_bound"
                )
            if self.num_partitions < 1:
                raise ValueError(
                    f"JDBC source {self.name!r}: num_partitions must "
                    f"be >= 1, got {self.num_partitions}"
                )
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", self.lower_bound)
                .option("upperBound", self.upper_bound)
                .option("numPartitions", str(self.num_partitions))
            )
        return reader.load()

    def write(
        self,
        df: DataFrame,
        table: str | None = None,
        mode: str = "append",
        batch_size: int = 10_000,
    ) -> None:
        """JDBC sink (extension — the reference only reads from PG).
        Distributed INSERT: every task opens its own connection and
        writes its partition in ``batch_size`` batches, so write
        parallelism equals the DataFrame's partition count. Writing
        back a 1000-partition DataFrame to one PG instance will melt
        it — ``df.coalesce(n)`` to the connection budget first."""
        writer = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table or self.table)
            .option("batchsize", str(batch_size))
        )
        for k, v in self.properties.items():
            writer = writer.option(k, v)
        writer.mode(mode).save()


@dataclass(frozen=True)
class ParquetTable:
    """A path-backed Parquet table, optionally Hive-partitioned
    (reference S2/S3 binding; img/YQLink4.png)."""

    name: str
    path: str
    schema: T.StructType | None = None
    partition_columns: tuple[str, ...] = ()

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(self.path)


Source = JdbcConnection | ParquetTable


class Catalog:
    """Name → source registry (the engine's analog of the YQ
    connection list plus Airflow's connection bootstrap,
    yq_dag.py:35-43: registering is idempotent-upsert)."""

    def __init__(self) -> None:
        self._sources: dict[str, Source] = {}

    def register(self, source: Source) -> None:
        self._sources[source.name] = source

    def get(self, name: str) -> Source:
        try:
            return self._sources[name]
        except KeyError:
            raise KeyError(
                f"unknown source {name!r}; registered: {sorted(self._sources)}"
            ) from None

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return self.get(name).read(spark)

    def __contains__(self, name: str) -> bool:
        return name in self._sources


def testdata_catalog(sf_dir: str) -> Catalog:
    """Catalog over the driver-generated testdata directory."""
    from . import schemas

    cat = Catalog()
    for name, schema in schemas.TESTDATA_TABLES.items():
        cat.register(ParquetTable(name, f"{sf_dir}/{name}.parquet", schema))
    return cat


def _events_ts_unit(path: str) -> tuple[str, bool]:
    """(unit, annotated) of the events ``ts`` column, read from ONE
    parquet footer — metadata only, no data scan. The fixture
    generator has shipped this column as TIMESTAMP(NANOS) in some
    refreshes and TIMESTAMP(MICROS) in others, and the bench's 10x
    scale copies write it as plain INT64 — so the unit is DETECTED,
    never assumed. For unannotated INT64 the row-group max decides:
    ns epochs are ~1e18, µs ~1e15 (three orders of magnitude apart —
    unambiguous for any date after 1973)."""
    import glob
    import os

    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        cands = sorted(glob.glob(os.path.join(p, "*.parquet"))) or sorted(
            glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True)
        )
        if not cands:
            return "ns", True
        p = cands[0]
    f = pq.ParquetFile(p)
    t = f.schema_arrow.field("ts").type
    unit = getattr(t, "unit", None)
    if unit in ("ns", "us", "ms"):
        return unit, True
    try:
        i = list(f.schema_arrow.names).index("ts")  # flat schema: same order
        mx = f.metadata.row_group(0).column(i).statistics.max
        if mx is not None:
            return ("ns" if int(mx) > 10**17 else "us"), False
    except Exception:
        pass
    return "ns", False


def read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table with a unit-adaptive ``ts`` path:

    - TIMESTAMP(MICROS)/(MILLIS): Spark-native — plain schema read.
    - TIMESTAMP(NANOS): illegal for Spark's vectorized reader; flip
      the runtime conf ``spark.sql.legacy.parquet.nanosAsLong`` (works
      on a session we do not own, e.g. the verify driver's), read
      ns-as-long, truncate to microsecond TimestampType.
    - plain INT64 (the bench's scale copies): read as long, scale by
      the footer-detected unit."""
    from pyspark.sql import functions as F

    from . import schemas

    unit, annotated = _events_ts_unit(path)
    if annotated and unit in ("us", "ms"):
        return spark.read.schema(schemas.EVENTS).parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(schemas.EVENTS_RAW).parquet(path)
    # integer arithmetic: a float division would lose ns precision at
    # 2^60. FLOOR division, not `div` (which truncates toward zero):
    # DuckDB's epoch_ns // 1000 floors, so a pre-1970 ns timestamp
    # must land on the same µs on both engines — the µs-precision
    # oracle contract (plans/registry.py) is structural only if the
    # read-side conversion floors too.
    to_us = {
        "ns": "(ts - (((ts % 1000) + 1000) % 1000)) div 1000",
        "us": "ts",
        "ms": "ts * 1000",
    }[unit]
    return raw.withColumn("ts", F.timestamp_micros(F.expr(to_us)))


_TESTDATA_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all testdata tables and register them as temp views.

    Memoized per (session, sf_dir): the tables are immutable driver
    fixtures, and re-building 10 readers + re-registering views put a
    fixed ~0.3 s floor under every registry query."""
    from . import schemas

    key = (id(spark), sf_dir)
    if key in _TESTDATA_CACHE:
        return _TESTDATA_CACHE[key]

    # The DuckDB oracle is timezone-naive; every timestamp-derived
    # value (year(), date_format, window starts) must be computed in
    # UTC regardless of who built this session (the verify driver
    # builds its own). Runtime-settable, so safe on foreign sessions.
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    out: dict[str, DataFrame] = {}
    for name in schemas.TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            df = read_events(spark, path)
        else:
            df = spark.read.schema(schemas.TESTDATA_TABLES[name]).parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    _TESTDATA_CACHE[key] = out
    return out


def data_tag(sf_dir: str, table: str) -> str:
    """Cache tag for demo artifacts derived from a testdata table —
    tied to the dataset GENERATION, not just its path: the source
    parquet's mtime is hashed in, so artifacts parked in the (round-
    surviving) temp dir are rebuilt when the fixture generator
    refreshes the data under the same path instead of silently serving
    stale rows against a fresh oracle."""
    import hashlib
    import os

    key = os.path.abspath(sf_dir)
    try:
        mt = int(os.path.getmtime(os.path.join(key, f"{table}.parquet")))
    except OSError:
        mt = 0
    return hashlib.md5(f"{key}:{mt}".encode()).hexdigest()[:12]
