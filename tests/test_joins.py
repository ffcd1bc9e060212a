"""Unit tests for the custom join operators (range/as-of) — SURVEY.md
§2.12 'range / as-of / interval joins: ext'."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.operators import asof_join, range_join


def test_range_join_point_in_interval(spark):
    events = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 25), (4, 35)], "id int, point int"
    )
    intervals = spark.createDataFrame(
        [("a", 0, 10), ("b", 10, 30)], "name string, lo int, hi int"
    )
    out = range_join(events, intervals, "point", "lo", "hi").select("id", "name")
    assert {(r.id, r.name) for r in out.collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "b"),
    }


def test_range_join_left_outer_keeps_unmatched(spark):
    events = spark.createDataFrame([(1, 5), (2, 99)], "id int, point int")
    intervals = spark.createDataFrame([("a", 0, 10)], "name string, lo int, hi int")
    out = range_join(events, intervals, "point", "lo", "hi", how="left").collect()
    assert {(r.id, r.name) for r in out} == {(1, "a"), (2, None)}


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M")


def test_asof_join_latest_quote_per_trade(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00"), 100.0),
            ("A", _ts("2024-01-01 10:05"), 101.0),
            ("B", _ts("2024-01-01 10:03"), 200.0),
            ("B", _ts("2024-01-01 09:00"), 199.0),  # before any quote
        ],
        "sym string, ts timestamp, trade_px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59"), 99.5),
            ("A", _ts("2024-01-01 10:04"), 100.5),
            ("B", _ts("2024-01-01 10:00"), 198.5),
        ],
        "sym string, ts timestamp, quote_px double",
    )
    out = asof_join(trades, quotes, on_time="ts", by=["sym"])
    got = {(r.sym, r.trade_px): r.r_quote_px for r in out.collect()}
    assert got == {
        ("A", 100.0): 99.5,
        ("A", 101.0): 100.5,
        ("B", 200.0): 198.5,
        ("B", 199.0): None,
    }


def test_asof_join_equal_timestamps_match(spark):
    """A right row at exactly the left time IS eligible (<= semantics)."""
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00"), 1.0)], "sym string, ts timestamp, x double"
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00"), 7.0)], "sym string, ts timestamp, y double"
    )
    out = asof_join(left, right, on_time="ts", by=["sym"]).collect()
    assert out[0].r_y == 7.0


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01 10:00"), 1.0)], "sym string, ts timestamp, x double"
    )
    right = spark.createDataFrame(
        [("A", _ts("2024-01-01 08:00"), 7.0)], "sym string, ts timestamp, y double"
    )
    wide = asof_join(left, right, on_time="ts", by=["sym"], tolerance="3 HOURS")
    assert wide.collect()[0].r_y == 7.0
    narrow = asof_join(left, right, on_time="ts", by=["sym"], tolerance="30 MINUTES")
    assert narrow.collect()[0].r_y is None


def test_interval_overlap_join_matches_naive(spark, testdata):
    """Bucket-equi interval-overlap join must produce exactly the
    naive non-equi join's pairs (including multi-bucket spanners,
    which the emit-once guard must not duplicate)."""
    from yc_yq_airflow_etl_spark.operators.joins import interval_overlap_join

    ev = testdata["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_timestamp("ts").alias("c_lo"),
        (F.unix_timestamp("ts") + 1500).alias("c_hi"),  # spans >2 buckets
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.unix_timestamp("ts").alias("p_lo"),
        (F.unix_timestamp("ts") + 300).alias("p_hi"),
    )
    naive = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("c_lo") < F.col("p_hi"))
        & (F.col("p_lo") < F.col("c_hi")),
    )
    expected = {(r.click_id, r.purchase_id) for r in naive.collect()}

    got_df = interval_overlap_join(
        clicks,
        purchases.withColumnRenamed("p_user", "user_id"),
        "c_lo", "c_hi", "p_lo", "p_hi",
        on=["user_id"], bucket_width=600,
    )
    got = [(r.click_id, r.purchase_id) for r in got_df.collect()]
    assert len(got) == len(set(got))  # emit-once really deduplicates
    assert set(got) == expected and expected
