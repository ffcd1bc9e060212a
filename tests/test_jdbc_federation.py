"""Live federated-JDBC tests (reference S1/S5/C6) using the embedded
Derby database bundled with Spark — a real external SQL store reached
through the same spark.read.format('jdbc') path a PostgreSQL cluster
would use, no network required.

Covers: JDBC scan through a named catalog connection, predicate
pushdown to the remote store, partitioned parallel JDBC read, the
federation union across JDBC + parquet, and catalog-introspected
partition retirement (the drop_copied_partition equivalent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import Catalog, JdbcConnection
from yc_yq_airflow_etl_spark.plans.federation import federated_counts_by_year
from yc_yq_airflow_etl_spark.sources.generator import generate_payments
from yc_yq_airflow_etl_spark.sources.maintenance import (
    JdbcStatementRunner,
    SourceMaintenance,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "hotstore")
    url = f"jdbc:derby:{db};create=true"
    payments = generate_payments(spark, minutes=20 * 1440)  # 20 days of 2020
    (
        payments.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "payments")
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    return url, payments


def test_jdbc_scan_through_catalog(spark, derby):
    url, payments = derby
    cat = Catalog()
    cat.register(
        JdbcConnection(
            name="pg-finance",
            url=url,
            table="payments",
            properties={"driver": DERBY_DRIVER},
        )
    )
    remote = cat.read(spark, "pg-finance")
    assert remote.count() == payments.count()
    assert set(remote.columns) == set(payments.columns)


def test_jdbc_predicate_pushdown(spark, derby):
    url, payments = derby
    conn = JdbcConnection(
        "pg-finance", url, "payments", {"driver": DERBY_DRIVER}
    )
    df = conn.read(spark).filter(F.col("id") <= 100)
    plan = df._jdf.queryExecution().toString()
    # the filter must reach the JDBC relation, not run Spark-side only
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:120]
    assert df.count() == 100


def test_jdbc_partitioned_parallel_read(spark, derby):
    url, payments = derby
    n = payments.count()
    conn = JdbcConnection(
        "pg-finance",
        url,
        "payments",
        {"driver": DERBY_DRIVER},
        partition_column="id",
        lower_bound="1",
        upper_bound=str(n),
        num_partitions=4,
    )
    df = conn.read(spark)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == n


def test_federation_union_jdbc_plus_parquet(spark, derby, tmp_path):
    """The actual federation query shape: hot side over JDBC, cold
    side over parquet, union + group-by-year (README_en.md:238-246)."""
    url, payments = derby
    cold_path = str(tmp_path / "cold")
    # pretend an earlier year was already cooled to parquet
    cold = payments.withColumn(
        "payment_date", F.col("payment_date") - F.expr("INTERVAL 365 DAYS")
    )
    cold.write.parquet(cold_path)

    hot = JdbcConnection(
        "pg-finance", url, "payments", {"driver": DERBY_DRIVER}
    ).read(spark)
    cold_back = spark.read.parquet(cold_path)
    out = federated_counts_by_year(hot, cold_back).collect()
    got = {(r.dyear, r.src): r.cnt for r in out}
    n = payments.count()
    assert got == {(2020, "pg"): n, (2019, "s3"): n}


def test_source_maintenance_drop_year(spark, derby):
    """C6: catalog introspection + dynamic DROP through JDBC — the
    Derby twin of the reference's pg_tables loop (yq_dag.py:107-118)."""
    url, _ = derby
    runner = JdbcStatementRunner(spark, url, driver=DERBY_DRIVER)
    # create two fake year-partition child tables
    runner.execute('create table "payments_y2020m01" (id bigint)')
    runner.execute('create table "payments_y2020m02" (id bigint)')

    maint = SourceMaintenance(
        runner,
        list_partitions_sql=(
            "select tablename from sys.systables "
            "where tablename like 'payments_y{year}%'"
        ),
        drop_template='drop table "{table}"',
    )
    assert sorted(maint.partitions_for_year(2020)) == [
        "payments_y2020m01",
        "payments_y2020m02",
    ]
    dropped = maint.drop_year(2020)
    assert len(dropped) == 2
    assert maint.partitions_for_year(2020) == []


def test_jdbc_write_back_round_trip(spark, derby):
    """JDBC sink (JdbcConnection.write): distributed append into the
    external store, read back through the same connection and compare
    counts + a content checksum."""
    url, payments = derby
    conn = JdbcConnection(
        name="pg-finance",
        url=url,
        table="exported_payments",
        properties={"driver": DERBY_DRIVER},
    )
    sample = payments.limit(500).coalesce(4)
    conn.write(sample, mode="overwrite")
    back = conn.read(spark)
    agg = lambda df: tuple(  # noqa: E731
        df.agg(
            F.count(F.lit(1)),
            F.sum("id"),
            F.sum(F.crc32(F.col("doc_num").cast("binary"))),
        ).first()
    )
    assert agg(back) == agg(sample)


def test_partitioned_read_requires_explicit_bounds(spark):
    """r16 degenerate-param sweep: partition_column without bounds
    reached the JVM as the string "None" and died deep in the JDBC
    relation naming none of the four options; now refused loudly at
    the descriptor, before any connection is opened."""
    import pytest

    bad = JdbcConnection(
        name="pg-finance",
        url="jdbc:derby:memory:unused",
        table="t",
        partition_column="id",
    )
    with pytest.raises(ValueError, match="lower_bound AND upper_bound"):
        bad.read(spark)
    bad2 = JdbcConnection(
        name="pg-finance",
        url="jdbc:derby:memory:unused",
        table="t",
        partition_column="id",
        lower_bound="0",
        upper_bound="10",
        num_partitions=0,
    )
    with pytest.raises(ValueError, match="num_partitions"):
        bad2.read(spark)
