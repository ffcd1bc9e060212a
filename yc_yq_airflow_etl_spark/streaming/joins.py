"""Stream-stream interval join: click→purchase attribution over the
``events`` stream.

The reference has no streaming joins (its only join is the batch
EXCLUSION JOIN, yq_dag.py:93-94); this is part of the mandated
Structured Streaming extension surface. The plan function is written
once and runs unchanged over batch DataFrames (oracle-checked via
plans/streaming_queries.py) or over two watermarked streams (live
micro-batch behavior covered in tests/test_streaming.py).

Scale notes: a stream-stream inner join keeps both sides in the state
store until the watermark plus the join-window passes, so the time
bound below is REQUIRED — an unbounded-time stream join never evicts
state. The join condition carries the ``user_id`` equality, so the
state store is hash-partitioned on user_id and each task holds only
its key range; the time-range predicate is evaluated within the
partition. In batch mode the same condition is an equi-join on
user_id with a residual range filter — a plain shuffled hash/SMJ,
no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two event subtypes into join-ready relations with
    disjoint column names (stream-stream joins need unambiguous
    references on both sides)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
) -> DataFrame:
    """All (click, purchase) pairs for the same user where the
    purchase lands in ``[click_ts, click_ts + within)``.

    Works on batch inputs as-is; for streams, apply
    ``withWatermark`` to BOTH inputs first (the time-range condition
    then bounds the state retention on each side).
    """
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            < clicks["click_ts"] + F.expr(f"interval {within}")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def attributed_purchases_per_user(
    events: DataFrame, within: str = "30 minutes"
) -> DataFrame:
    """Batch rollup of the join: per-user count of attributed
    (click, purchase) pairs and the decimal-exact sum of purchase
    value — the oracle-checkable face of the streaming join."""
    clicks, purchases = split_clicks_purchases(events)
    pairs = click_purchase_join(clicks, purchases, within)
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.sum(F.col("purchase_value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
        # deepened pin (r12): the attributed purchase SET, not just its
        # size — a purchase attributed to the wrong user can keep both
        # users' counts and (with offsetting values) their sums, but
        # not both distinct-id checksums. Distinct because one
        # purchase may pair with several clicks of its user.
        F.sum_distinct(F.col("purchase_id")).cast("long").alias(
            "purchase_id_sum"
        ),
    )


def click_purchase_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, attributed or not.

    Semantically distinct from the inner join in streaming execution:
    an unmatched click emits (with NULL purchase columns) only once
    the watermark proves no future purchase can land in its window —
    i.e. on STATE EVICTION, a batch after the matching window closes.
    The time bound is therefore doubly required here: it bounds both
    state size and result latency. Batch mode is an ordinary left
    join; tests/test_streaming.py drives the live eviction behavior
    and asserts it equals this plan's batch run."""
    cond = (
        (clicks["user_id"] == purchases["p_user_id"])
        & (purchases["purchase_ts"] >= clicks["click_ts"])
        & (
            purchases["purchase_ts"]
            < clicks["click_ts"] + F.expr(f"interval {within}")
        )
    )
    return clicks.join(purchases, cond, "left_outer").select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def attributed_and_orphan_clicks(
    events: DataFrame, within: str = "30 minutes"
) -> DataFrame:
    """Batch rollup of the left-outer join: per-user total join rows
    and attributed count — the oracle-checkable face (orphan clicks =
    n_rows with NULL purchase). The distinct click-id checksum (r12
    pin) fixes WHICH clicks each user's rows came from — a left join
    that dropped an orphan and duplicated an attributed click would
    keep n_rows balanced but not the id sum."""
    clicks, purchases = split_clicks_purchases(events)
    j = click_purchase_left_join(clicks, purchases, within)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("purchase_id").alias("n_attributed"),
        F.sum_distinct(F.col("click_id")).cast("bigint").alias("click_id_sum"),
        # deepened pin (r14): WHICH purchases matched — a join that
        # attributed the wrong purchase inside the window keeps n_rows,
        # n_attributed, and the click-side sum all balanced; only the
        # purchase-side membership moves. 0 for all-orphan users.
        F.coalesce(F.sum_distinct(F.col("purchase_id")), F.lit(0))
        .cast("bigint")
        .alias("purchase_id_sum"),
    )
