"""Deterministic payments/accounts generator — the reference's
``src/sql/db_init.sql`` fixture re-expressed as a distributed Spark
plan (no driver-side loops; ``spark.range`` parallelizes the grid).

Generator rules (db_init.sql:40-66):
- one payment per minute from 2020-01-01 00:00, id sequential from 1
- ``doc_num = id::varchar``, ``descr = 'payment '||id``, ``state='done'``
- ``accdt = floor(random()*acc_pool)``, ``acckt = acc_pool - accdt``,
  ``amount = accdt`` (an int stored in float8 — what makes the
  reference's float equality join safe, SURVEY.md §2.4)
- accounts: ids 0..pool, ``num = lpad(id, 20, '0')``, saldo 0

The reference leaves ``random()`` unseeded; our fixtures fix seed=42
so every run (and the DuckDB oracle side, which reads our parquet
output rather than regenerating) is reproducible.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ACCOUNT_POOL = 1000  # variables.tf:22-26 default


def generate_payments(
    spark: SparkSession,
    start: str = "2020-01-01",
    # 2020-01-01 .. 2025-01-31 grid: leap 2020/2024 (527,040) +
    # common 2021-23 (525,600 each) + Jan 2025 (44,640) = 2,675,520
    # (BASELINE.md); NOT 527040*5 — that would treat every year as
    # leap and spill 3 days into 2025-02
    minutes: int = 527040 * 2 + 525600 * 3 + 44640,
    account_pool: int = ACCOUNT_POOL,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Minute-grid payments; closed-form row counts per year
    (527,040 leap / 525,600 common — BASELINE.md)."""
    # degenerate-param sweep (r16): each of these produced silent
    # junk, not an error — the generator seeds every fixture, so junk
    # here poisons everything downstream.
    if minutes < 0:
        # spark.range(1, 0) is silently EMPTY — a caller bug would
        # produce a zero-row "payments" table that every consumer
        # happily aggregates to zeros
        raise ValueError(f"minutes must be >= 0, got {minutes}")
    if account_pool < 1:
        # floor(rand()*0) = 0 for every row (all payments on account
        # 0, amount 0); a NEGATIVE pool yields negative account ids —
        # both are junk data, not errors, without this guard
        raise ValueError(f"account_pool must be >= 1, got {account_pool}")
    if num_partitions is not None and num_partitions < 1:
        raise ValueError(
            f"num_partitions must be >= 1 when given, got {num_partitions}"
        )
    start_dt = datetime.strptime(start, "%Y-%m-%d")
    rng = spark.range(1, minutes + 1, 1, num_partitions or spark.sparkContext.defaultParallelism)
    accdt = F.floor(F.rand(seed) * account_pool).cast("long")
    return (
        rng.withColumnRenamed("id", "_i")
        .select(
            F.col("_i").alias("id"),
            F.col("_i").cast("string").alias("doc_num"),
            accdt.alias("accdt"),
            F.expr(
                f"timestampadd(MINUTE, CAST(_i - 1 AS INT), "
                f"TIMESTAMP'{start_dt:%Y-%m-%d %H:%M:%S}')"
            ).alias("payment_date"),
        )
        .select(
            "id",
            "doc_num",
            "accdt",
            (F.lit(account_pool) - F.col("accdt")).alias("acckt"),
            F.col("accdt").cast("double").alias("amount"),
            "payment_date",
            F.concat(F.lit("payment "), F.col("id").cast("string")).alias("descr"),
            F.lit("done").alias("state"),
        )
    )


def generate_accounts(
    spark: SparkSession, account_pool: int = 10000
) -> DataFrame:
    """db_init.sql:5-14: ids 0..pool inclusive (10,001 rows — the
    reference seeds accounts over generate_series(0, 10000), which is
    DELIBERATELY wider than the payments generator's ACCOUNT_POOL of
    1000: payments only ever reference accounts 0..999 / 1..1000,
    exactly as in the reference fixtures)."""
    if account_pool < 0:
        # range(0, 0) would be silently empty — the FK side of every
        # payments join vanishing without a sound
        raise ValueError(f"account_pool must be >= 0, got {account_pool}")
    return spark.range(0, account_pool + 1).select(
        F.col("id"),
        F.lpad(F.col("id").cast("string"), 20, "0").alias("num"),
        F.lit(0).cast("decimal(10,2)").alias("saldo"),
        F.current_timestamp().alias("open_date"),
    )
