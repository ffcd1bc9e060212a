"""End-to-end training-corpus pipeline (plans/corpus.py): gates →
near-dup removal → chunking → partitioned landed corpus."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.plans.corpus import (
    build_training_corpus,
    drop_near_duplicates,
    quality_filter,
)
from yc_yq_airflow_etl_spark.sources.lake import LakeTable

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_pipeline_end_to_end(spark, testdata, tmp_path):
    docs = testdata["documents"]
    lake = LakeTable(str(tmp_path / "corpus"), partition_columns=("lang",))
    report = build_training_corpus(docs, lake)

    # funnel is monotone and non-degenerate
    assert report["total_docs"] == docs.count()
    assert 0 < report["after_quality_filter"] <= report["total_docs"]
    assert 0 < report["after_near_dedup"] <= report["after_quality_filter"]
    assert report["chunks_landed"] >= report["after_near_dedup"]  # ≥1 chunk/doc

    # landed layout: Hive dirs by lang, only 'en' survives the gate
    dirs = {p.split("/")[-1] for p in glob.glob(str(tmp_path / "corpus" / "lang=*"))}
    assert dirs == {"lang=en"}

    # every landed chunk belongs to a surviving doc
    landed = lake.read(spark)
    surviving = drop_near_duplicates(quality_filter(docs)).select("doc_id")
    orphans = landed.join(surviving, "doc_id", "left_anti").count()
    assert orphans == 0

    # chunk grid is consistent: stride-24 windows per doc token count
    per_doc = landed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    toks = surviving.join(
        docs.select("doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_toks")),
        "doc_id",
    )
    joined = per_doc.join(toks, "doc_id")
    bad = joined.filter(
        F.col("n_chunks") != (F.greatest(F.col("n_toks") - 1, F.lit(0)) / 24).cast("int") + 1
    ).count()
    assert bad == 0

    # deterministic: a second run overwrites to the same counts
    report2 = build_training_corpus(docs, lake)
    assert report2 == report
