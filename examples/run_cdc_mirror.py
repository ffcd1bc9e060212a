"""Demo: a CDC mirror — replicating an upstream OLTP table's
changelog into a snapshot-committed lake table, append-only.

The production loop this models (Debezium/DMS → Kafka → lake): every
micro-batch carries (key, row, seq, op) change events; the sink
collapses each key to its LAST change, applies inserts/updates/deletes
as ONE atomic merge-on-read commit (positional deletes + appended
files — no data file rewritten, O(batch) write cost however many
files the keys scatter across), and a maintenance call compacts when
deletion-vector debt crosses a threshold. Readers always see a
complete consistent snapshot; replayed batch ids are skipped, so
at-least-once delivery lands exactly once.

    python examples/run_cdc_mirror.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.operators.incremental import (
    fold_changes_into_view,
    view_from_snapshot,
)
from yc_yq_airflow_etl_spark.session import build_session
from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable
from yc_yq_airflow_etl_spark.streaming.manifest_sink import apply_cdc_batch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    workdir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="cdc_")
    )

    spark = build_session(app_name="cdc-mirror")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_testdata(spark, sf_dir)["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    mirror = ManifestTable(f"{workdir}/orders_mirror", stat_cols=("o_orderkey",))
    mirror.overwrite(orders.repartition(16))  # initial full snapshot
    print(
        f"bootstrap: {mirror.read(spark).count()} rows in 16 files "
        f"(v{mirror.current_version(spark)})"
    )

    # downstream consumer: a per-customer revenue view maintained from
    # the change feed — bootstrapped once, then refreshed at O(churn)
    # per day via the signed retraction fold (never a full recompute)
    view = view_from_snapshot(
        mirror.read(spark), ["o_custkey"], ["o_totalprice"]
    ).localCheckpoint()
    consumed_v = mirror.current_version(spark)

    # three synthetic changelog batches over scattered keys: updates
    # (price change), inserts (new keys), deletes — op + seq are
    # transport columns and never land in the mirror
    key = F.col("o_orderkey")
    for day in (1, 2, 3):
        upd = orders.filter(key % 997 == day).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + day).alias("o_totalprice"),
            F.lit(day * 10 + 1).alias("seq"),
            F.lit("U").alias("op"),
        )
        ins = orders.filter(key % 997 == day).select(
            (key + 900_000_000 + day).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            F.lit(day * 10 + 2).alias("seq"),
            F.lit("I").alias("op"),
        )
        dele = orders.filter(key % 1009 == day).select(
            "o_orderkey",
            "o_custkey",
            # a key hit by both the update and the delete stream gets
            # the delete as its LAST change (higher seq) — legal CDC
            "o_totalprice",
            F.lit(day * 10 + 3).alias("seq"),
            F.lit("D").alias("op"),
        )
        batch = upd.unionByName(ins).unionByName(dele)
        t0 = time.time()
        applied = apply_cdc_batch(
            mirror, batch, day, key="o_orderkey", order_col="seq",
            mode="merge-on-read",
        )
        m = mirror._manifest(spark, mirror.current_version(spark))
        dead = sum(int(e["rows"]) for e in m.get("dvs", {}).values())
        print(
            f"day {day}: applied={applied} in {time.time() - t0:.2f}s — "
            f"{len(m['files'])} files, {m['rows']} live rows, "
            f"{dead} dv-dead rows (append-only: nothing rewritten)"
        )
        # replay protection: the same batch id is a no-op
        assert not apply_cdc_batch(
            mirror, batch, day, key="o_orderkey", order_col="seq",
            mode="merge-on-read",
        )
        # refresh the downstream view from the change feed alone
        new_v = mirror.current_version(spark)
        view = fold_changes_into_view(
            view,
            mirror.table_changes(spark, consumed_v, new_v),
            ["o_custkey"],
            ["o_totalprice"],
        ).localCheckpoint()  # cut the lineage between refreshes
        consumed_v = new_v
        full = view_from_snapshot(
            mirror.read(spark), ["o_custkey"], ["o_totalprice"]
        )
        diff = view.exceptAll(full).count() + full.exceptAll(view).count()
        print(
            f"  view refresh: {view.count()} customer rows, "
            f"diff vs full recompute = {diff}"
        )
        assert diff == 0

    # maintenance: compact when DV debt or file count crosses policy
    v = mirror.maybe_compact(spark, max_files=20, max_dv_fraction=0.001)
    m = mirror._manifest(spark, mirror.current_version(spark))
    print(
        f"maintenance: compacted={'v' + str(v) if v is not None else 'no'} — "
        f"{len(m['files'])} files, {m['rows']} rows, dvs cleared="
        f"{'dvs' not in m}"
    )
    removed = mirror.vacuum(spark, keep_versions=1)
    print(f"vacuum: retired {len(removed)} unreferenced files")
    print(f"final mirror rows: {mirror.read(spark).count()}")
    spark.stop()


if __name__ == "__main__":
    main()
