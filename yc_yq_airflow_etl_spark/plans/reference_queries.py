"""The reference's query semantics phrased over the driver testdata
(mapping per FIXTURES.md §3: ``orders`` plays ``payments``), each with
a DuckDB oracle in ``registry.py``.

Reference query sites:
- load query        yq_dag.py:65-74
- reconcile query   yq_dag.py:82-95 (EXCLUSION JOIN)
- federation query  README_en.md:238-246
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_testdata
from ..functions import get_year, unwrap
from ..operators import exclusion_join
from .federation import federated_counts_by_year, split_hot_cold

COLD_BEFORE_YEAR = 1998  # testdata stand-in for the reference's 3-cooled/2-hot split


def federation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README_en.md:238-246 over the orders hot/cold split."""
    t = load_testdata(spark, sf_dir)
    hot, cold = split_hot_cold(t["orders"], "o_orderdate", COLD_BEFORE_YEAR)
    return federated_counts_by_year(hot, cold, "o_orderkey", "o_orderdate")


def cooling_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load query's one-year half-open window extract
    (yq_dag.py:66-70): P1 projection+alias, P2 computed column, P4
    range filter, F1 unwrap, F3 cast."""
    t = load_testdata(spark, sf_dir)
    o = t["orders"]
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select(
        unwrap("o_orderkey", "o_orderkey").alias("id"),
        F.col("o_custkey").alias("cust"),
        F.col("o_orderstatus").alias("state"),
        F.col("o_totalprice").alias("amount"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        get_year("o_orderdate").alias("payment_year"),
    )


def _recon_sides(t: dict[str, DataFrame]) -> tuple[DataFrame, DataFrame]:
    """Hot side = 1998 orders; 'cold written copy' = same rows with a
    deterministic corruption of every 97th key — the mutation the
    reference's reconciliation exists to catch (README_en.md:223)."""
    s = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    d = s.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + F.lit(1.0))
        .otherwise(F.col("o_totalprice")),
    )
    return s, d


RECON_KEYS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def exclusion_join_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUSION JOIN (yq_dag.py:93-94) surfacing the corrupted rows
    from both sides, tagged with provenance.

    strategy='auto' so the driver's hard signal exercises the skew
    probe on the reference's own reconcile shape: the keys here are
    PK-like, so the probe should find no hot key and pick the
    single-shuffle 'union' plan — the probe running (and degrading to
    the same plan) is exactly what this row pins."""
    t = load_testdata(spark, sf_dir)
    s, d = _recon_sides(t)
    return exclusion_join(
        s, d, RECON_KEYS, tag_column="side", strategy="auto"
    ).orderBy("o_orderkey", "side")


def exclusion_join_clean_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual reconciliation check: identical sides → count 0
    (yq_dag.py:93; consumed as a branch signal, yq_dag.py:23-26).
    strategy='auto': same probe-on-the-hard-signal rationale as
    exclusion_join_diff.

    Deepened pin (r12): ``cnt = 0`` alone is vacuously true on an
    EMPTY input (a broken year filter would pass the old check), so
    the result also carries ``n_input`` and ``input_key_sum`` — the
    clean verdict is "0 diffs out of THESE rows", not "0 diffs out of
    nothing". 1×1 scalar-aggregate fusion, same pattern as the other
    branch signals."""
    t = load_testdata(spark, sf_dir)
    s, _ = _recon_sides(t)
    diff = exclusion_join(s, s, RECON_KEYS, strategy="auto")
    return diff.agg(F.count(F.lit(1)).alias("cnt")).crossJoin(
        s.agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum("o_orderkey").cast("long").alias("input_key_sum"),
        )
    )


def register_all() -> None:
    from .registry import register

    register(
        "federation_counts",
        federation_counts,
        f"""
        WITH a AS (
            SELECT o_orderkey AS id, o_orderdate AS pdate, 'pg' AS src
            FROM orders WHERE year(o_orderdate) >= {COLD_BEFORE_YEAR}
            UNION ALL
            SELECT o_orderkey, o_orderdate, 's3'
            FROM orders WHERE year(o_orderdate) < {COLD_BEFORE_YEAR}
        )
        SELECT CAST(year(pdate) AS INTEGER) AS dyear, src, count(*) AS cnt,
               CAST(sum(id) AS BIGINT) AS id_sum
        FROM a GROUP BY 1, 2 ORDER BY dyear, src
        """,
    )
    register(
        "cooling_window_filter",
        cooling_window_filter,
        """
        SELECT o_orderkey AS id, o_custkey AS cust, o_orderstatus AS state,
               o_totalprice AS amount,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               CAST(year(o_orderdate) AS INTEGER) AS payment_year
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        """,
    )
    register(
        "exclusion_join_diff",
        exclusion_join_diff,
        """
        WITH s AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE year(o_orderdate) = 1998
        ), d AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
                        ELSE o_totalprice END AS o_totalprice
            FROM s
        )
        SELECT * FROM (
            SELECT s.*, 'left' AS side FROM s
            WHERE NOT EXISTS (
                SELECT 1 FROM d WHERE d.o_orderkey = s.o_orderkey
                  AND d.o_custkey = s.o_custkey
                  AND d.o_orderstatus = s.o_orderstatus
                  AND d.o_totalprice = s.o_totalprice)
            UNION ALL
            SELECT d.*, 'right' AS side FROM d
            WHERE NOT EXISTS (
                SELECT 1 FROM s WHERE s.o_orderkey = d.o_orderkey
                  AND s.o_custkey = d.o_custkey
                  AND s.o_orderstatus = d.o_orderstatus
                  AND s.o_totalprice = d.o_totalprice)
        ) ORDER BY o_orderkey, side
        """,
    )
    register(
        "exclusion_join_clean_count",
        exclusion_join_clean_count,
        """
        WITH s AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
            FROM orders WHERE year(o_orderdate) = 1998
        )
        SELECT
            (SELECT count(*) FROM (
                SELECT * FROM s s1 WHERE NOT EXISTS (
                    SELECT 1 FROM s s2 WHERE s2.o_orderkey = s1.o_orderkey
                      AND s2.o_custkey = s1.o_custkey
                      AND s2.o_orderstatus = s1.o_orderstatus
                      AND s2.o_totalprice = s1.o_totalprice)
            )) AS cnt,
            (SELECT count(*) FROM s) AS n_input,
            (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM s) AS input_key_sum
        """,
    )
    register(
        "scalar_expressions",
        scalar_expressions,
        """
        SELECT o_orderkey AS id,
               lpad(CAST(o_orderkey AS VARCHAR), 20, '0') AS num,
               'payment ' || CAST(o_orderkey AS VARCHAR) AS descr,
               CAST(floor(o_totalprice) AS BIGINT) AS amount_floor,
               CAST(o_orderkey % 12 AS INTEGER) AS mth_mod,
               strftime(make_date(year(o_orderdate), month(o_orderdate), 1),
                        '%Y-%m-%d') AS month_start,
               strftime(make_date(year(o_orderdate), month(o_orderdate), 1)
                        + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_start,
               CAST(year(o_orderdate) AS INTEGER) AS yr
        FROM orders
        """,
    )


def scalar_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generator/expression layer (db_init.sql:12-14,52-66;
    SURVEY.md §2.9): lpad, ::varchar casts, || concat, floor, %,
    make_date, add-interval, year extraction — one projection."""
    t = load_testdata(spark, sf_dir)
    o = t["orders"]
    return o.select(
        F.col("o_orderkey").alias("id"),
        F.lpad(F.col("o_orderkey").cast("string"), 20, "0").alias("num"),
        F.concat(F.lit("payment "), F.col("o_orderkey").cast("string")).alias("descr"),
        F.floor(F.col("o_totalprice")).cast("long").alias("amount_floor"),
        (F.col("o_orderkey") % 12).cast("int").alias("mth_mod"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)),
            "yyyy-MM-dd",
        ).alias("month_start"),
        F.date_format(
            F.add_months(
                F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), F.lit(1)), 1
            ),
            "yyyy-MM-dd",
        ).alias("next_month_start"),
        F.year("o_orderdate").alias("yr"),
    )
