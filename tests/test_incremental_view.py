"""Change-feed-driven view maintenance: the stored aggregate chained
through fold_changes_into_view must equal a fresh GROUP BY of every
snapshot — across COW merges, MOR merges and DV-only delete commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.operators.incremental import (
    fold_changes_into_view,
    view_from_snapshot,
)
from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable


@pytest.fixture(scope="module")
def spark():
    from yc_yq_airflow_etl_spark.session import build_session

    s = build_session(app_name="test-incremental-view")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _rows(df):
    return {
        tuple(r[c] for c in ("grp",)): (r["_n"], float(r["amount"]))
        for r in df.collect()
    }


def test_view_chains_through_cow_and_mor_commits(spark, tmp_path):
    mt = ManifestTable(str(tmp_path / "t"), stat_cols=("id",))
    base = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 10).cast("double").alias("amount"),
    )
    mt.overwrite(base.coalesce(2))
    versions = [mt.current_version(spark)]

    state = view_from_snapshot(mt.read(spark), ["grp"], ["amount"])

    # v1: COW merge (update 3 rows, insert 2)
    mt.merge(
        spark.createDataFrame(
            [(1, "0", 999.0), (2, "1", 0.0), (200, "9", 5.0), (201, "9", 7.0)],
            "id long, grp string, amount double",
        ),
        "id",
    )
    versions.append(mt.current_version(spark))
    # v2: MOR merge (update + delete keys, append-only)
    mt.merge(
        spark.createDataFrame(
            [(3, "2", -50.0), (300, "8", 1.0)],
            "id long, grp string, amount double",
        ),
        "id",
        delete_keys=spark.createDataFrame([(200,), (4,)], "id long"),
        mode="merge-on-read",
    )
    versions.append(mt.current_version(spark))
    # v3: DV-only commit (no file added or removed)
    mt.delete_where(spark, "grp = '9'", mode="merge-on-read")
    versions.append(mt.current_version(spark))
    # v4: delete an entire group COW — its view row must disappear
    mt.delete_where(spark, "grp = '8'")
    versions.append(mt.current_version(spark))

    for v_from, v_to in zip(versions, versions[1:]):
        changes = mt.table_changes(spark, v_from, v_to)
        state = fold_changes_into_view(state, changes, ["grp"], ["amount"])
        expect = view_from_snapshot(
            mt.read(spark, version=v_to), ["grp"], ["amount"]
        )
        assert _rows(state) == _rows(expect), (v_from, v_to)

    # the emptied groups are gone, not zero-rows
    grps = {r.grp for r in state.collect()}
    assert "8" not in grps and "9" not in grps


def test_signed_delta_rejects_unknown_change_type(spark):
    """r15 degenerate-input sweep: a change row whose _change_type is
    neither 'insert' nor 'delete' (a Delta-style 'update_preimage', a
    typo, a NULL) must fail the job naming the value — the old code
    silently counted it as +1 and the view diverged forever with no
    error to trace back. Mutation-verified red on the permissive
    otherwise(+1) form."""
    import pytest as _pytest

    from yc_yq_airflow_etl_spark.operators.incremental import signed_delta

    changes = spark.createDataFrame(
        [("g", 1.0, "insert"), ("g", 2.0, "update_preimage")],
        "grp string, v double, _change_type string",
    )
    with _pytest.raises(Exception, match="update_preimage"):
        signed_delta(changes, ["grp"], ["v"]).collect()
    null_type = spark.createDataFrame(
        [("g", 1.0, None)], "grp string, v double, _change_type string"
    )
    with _pytest.raises(Exception, match="unknown"):
        signed_delta(null_type, ["grp"], ["v"]).collect()


def test_fold_fails_loud_on_negative_live_count(spark):
    """r15 degenerate-input sweep: a delete the state never saw (a
    double-applied batch, a feed read from the wrong version range)
    drives a group's live count NEGATIVE — proof of corruption. The
    old `> 0` filter silently dropped the group, erasing the evidence;
    the fold must fail loudly instead. An exactly-zero group still
    drops (correct full retraction). Mutation-verified: the filter-only
    form returns an empty, healthy-looking view."""
    import pytest as _pytest

    from yc_yq_airflow_etl_spark.operators.incremental import (
        fold_changes_into_view,
        view_from_snapshot,
    )

    snap = spark.createDataFrame([("g", 1.0)], "grp string, v double")
    state = view_from_snapshot(snap, ["grp"], ["v"])
    one_delete = spark.createDataFrame(
        [("g", 1.0, "delete")], "grp string, v double, _change_type string"
    )
    # full retraction: group drops cleanly
    assert (
        fold_changes_into_view(state, one_delete, ["grp"], ["v"]).count()
        == 0
    )
    # the same delete applied TWICE: count would hit -1 — fail loud
    twice = one_delete.unionAll(one_delete)
    with _pytest.raises(Exception, match="negative"):
        fold_changes_into_view(state, twice, ["grp"], ["v"]).collect()


def test_signed_delta_reserves_live_count_tag(spark):
    """r16: `_n` is the view's live-count column — a group or sum
    column with that name silently collided with it in the fold
    (same reserved-tag convention as joins/manifest/zorder)."""
    import pytest

    from yc_yq_airflow_etl_spark.operators.incremental import signed_delta

    ch = spark.createDataFrame(
        [("a", 1.0, "insert")], "_n string, v double, _change_type string"
    )
    with pytest.raises(ValueError, match="reserved internal tags"):
        signed_delta(ch, ["_n"], ["v"])
