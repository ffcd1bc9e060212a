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
