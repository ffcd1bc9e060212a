"""Fresh-session reuse audits for every persisted artifact (r9 verdict
item 7).

The bug class fired twice already: a reuse path that silently never
fires (ANN index `_INDEX_READY` sentinel in r9, centroid persistence in
r8) makes every new session silently rebuild an artifact the previous
session already paid for — correctness stays green, the bench and the
driver's per-round session eat the rebuild. These tests simulate the
second session the cheapest honest way: clear the in-process caches,
then make every build/write primitive RAISE — the reuse path must
succeed purely from what is on disk.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _fail(msg):
    def _raise(*a, **k):
        raise AssertionError(msg)

    return _raise


def test_manifest_demo_fixtures_fresh_session_reuse(spark, monkeypatch):
    """Every ManifestTable-backed bench/demo fixture must be found on
    disk by a fresh process (the driver's correctness and bench
    sessions both are one) instead of rebuilt: after a first build,
    with the in-process caches cleared and EVERY write primitive
    poisoned, each ensure_* must still return its path. A reuse check
    that can never be true (the ANN `_SUCCESS` bug class) fails here
    immediately."""
    from yc_yq_airflow_etl_spark.plans import analytics as an
    from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable

    ensures = [
        ("_MANIFEST_DEMO_CACHE", an.ensure_manifest_demo),
        ("_MANIFEST_STATS_DEMO_CACHE", an.ensure_manifest_stats_demo),
        ("_MANIFEST_BUCKET_DEMO_CACHE", an.ensure_manifest_bucket_demo),
        ("_MANIFEST_SPECEVO_DEMO_CACHE", an.ensure_manifest_specevo_demo),
        ("_MERGE_BASE_CACHE", an.ensure_merge_base_demo),
        ("_CDF_DEMO_CACHE", an.ensure_cdf_demo),
        ("_SCHEMA_EVO_DEMO_CACHE", an.ensure_schema_evolution_demo),
    ]
    first = {}
    for _, fn in ensures:
        first[fn.__name__] = fn(spark, SF_DIR)  # build (or find) once

    # "fresh session": no in-process memo survives...
    for cache_name, _ in ensures:
        monkeypatch.setattr(an, cache_name, {})
    # ...and no build can run — reuse must come entirely from disk
    monkeypatch.setattr(
        ManifestTable, "_write_files",
        _fail("demo fixture rewrote data files despite a complete "
              "on-disk build — the reuse check never fires"),
    )
    monkeypatch.setattr(
        ManifestTable, "_publish",
        _fail("demo fixture re-committed despite a complete on-disk "
              "build — the reuse check never fires"),
    )
    for _, fn in ensures:
        assert fn(spark, SF_DIR) == first[fn.__name__]


def test_file_demo_fixtures_fresh_session_reuse(spark, monkeypatch):
    """Same audit for the plain-parquet demo fixtures (z-order twins,
    bucketed warehouse tables, format copies): second session, caches
    cleared, every DataFrameWriter output format poisoned — the
    ensure_* calls must resolve from disk."""
    from pyspark.sql.readwriter import DataFrameWriter

    from yc_yq_airflow_etl_spark.plans import analytics as an

    first = {
        "zorder": an.ensure_zorder_demo(spark, SF_DIR),
        "bucketed": an.ensure_bucketed_demo(spark, SF_DIR),
        "formats": an.ensure_formats_demo(spark, SF_DIR),
    }
    for cache_name in (
        "_ZORDER_DEMO_CACHE", "_BUCKETED_DEMO_CACHE", "_FORMATS_DEMO_CACHE"
    ):
        monkeypatch.setattr(an, cache_name, {})
    for meth in ("parquet", "orc", "json", "csv", "saveAsTable", "save"):
        monkeypatch.setattr(
            DataFrameWriter, meth,
            _fail(f"demo fixture re-ran DataFrameWriter.{meth} despite "
                  "a complete on-disk build"),
        )
    assert an.ensure_zorder_demo(spark, SF_DIR) == first["zorder"]
    assert an.ensure_bucketed_demo(spark, SF_DIR) == first["bucketed"]
    assert an.ensure_formats_demo(spark, SF_DIR) == first["formats"]


def test_ingest_dedup_index_fresh_session_probes_not_rebuilds(
    spark, monkeypatch, tmp_path
):
    """The streaming ingest loop's minhash fingerprint index: a second
    session facing the persisted index must take the PROBE path — not
    the day-zero bootstrap (blind admit) and not a `sync_minhash_index`
    corpus re-hash. Pins that `write_minhash_index`'s overwrite really
    leaves the `_SUCCESS` sentinel `_index_exists` looks for (the exact
    property the ANN index lost under dynamic partitionOverwriteMode)."""
    from yc_yq_airflow_etl_spark.catalog import load_testdata
    from yc_yq_airflow_etl_spark.operators import dedup as dedup_ops
    from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable
    from yc_yq_airflow_etl_spark.streaming import ingest_dedup

    docs = (
        load_testdata(spark, SF_DIR)["documents"]
        .select("doc_id", "text")
        .limit(12)
    )
    table = ManifestTable(str(tmp_path / "corpus"))
    idx = str(tmp_path / "mh_index")
    assert ingest_dedup.dedup_ingest_batch(table, idx, docs, 1) is True

    # session 2: same disk state, no rebuild primitive may run
    monkeypatch.setattr(
        dedup_ops, "write_minhash_index",
        _fail("index bootstrap re-ran despite a persisted index — "
              "_index_exists never fires"),
    )
    monkeypatch.setattr(
        ingest_dedup, "sync_minhash_index",
        _fail("index resync re-ran despite an intact index"),
    )
    dup = docs.limit(4)  # redelivered: must be dropped via the probe
    novel = docs.limit(1).select(
        (F.col("doc_id") + 7777).alias("doc_id"),
        F.lit("an entirely novel second-session document").alias("text"),
    )
    assert ingest_dedup.dedup_ingest_batch(
        table, idx, dup.unionByName(novel), 2
    ) is True
    assert table.read(spark).count() == 13  # 12 committed + 1 novel


def test_sketch_store_fresh_session_estimate_reads_persisted(
    spark, monkeypatch, tmp_path
):
    """The HLL sketch store exists so distinct-count questions stay
    answerable AFTER the raw partitions are retired — so a fresh
    session's estimate must be a pure parquet read of the persisted
    sketches: no re-sketching (the raw rows are gone), and appends
    never rewrite landed sketch files."""
    from yc_yq_airflow_etl_spark.operators import sketches as sk
    from yc_yq_airflow_etl_spark.sources.generator import generate_payments

    pay = generate_payments(spark, minutes=2 * 1440).withColumn(
        "payment_year", F.year("payment_date")
    )
    store_path = str(tmp_path / "sketches")
    store = sk.SketchStore(store_path)
    store.add(sk.build_sketches(pay, ["payment_year"], "accdt"))
    want = store.estimate(spark).first().distinct_estimate
    landed = {
        f: os.path.getsize(os.path.join(store_path, f))
        for f in os.listdir(store_path)
        if f.endswith(".parquet")
    }

    # session 2: raw partitions retired, sketch building impossible
    monkeypatch.setattr(
        sk, "build_sketches",
        _fail("estimate path re-sketched raw rows — the store must be "
              "a pure read of persisted sketches"),
    )
    store2 = sk.SketchStore(store_path)
    assert store2.estimate(spark).first().distinct_estimate == want

    # appends extend the store without touching landed files
    monkeypatch.undo()
    extra = generate_payments(spark, minutes=1440).withColumn(
        "payment_year", F.year("payment_date") + 50
    )
    store2.add(sk.build_sketches(extra, ["payment_year"], "accdt"))
    after = {
        f: os.path.getsize(os.path.join(store_path, f))
        for f in os.listdir(store_path)
        if f.endswith(".parquet")
    }
    assert set(landed) <= set(after) and len(after) > len(landed)
    for f, size in landed.items():
        assert after[f] == size, "append rewrote a landed sketch file"
    assert (
        store2.estimate(spark, by=["payment_year"]).count() >= 2
    )  # old + new groups both served
