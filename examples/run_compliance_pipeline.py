"""Demo: the round-3 compliance/curation ops composed into one flow —
near-dup CLUSTERS (keep one doc per cluster), benchmark
decontamination (drop verbatim-overlap docs), PII redaction, and an
exactly-once landing into a snapshot-committed ManifestTable.

    python examples/run_compliance_pipeline.py [sf_dir] [workdir]

Every stage is a DataFrame plan — one corpus scan feeds the gates, the
cluster keep-set and the contamination drop-set arrive as (small)
broadcastable key sets, and the landed table is readable at any
committed snapshot (time travel).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.functions.text import word_shingles
from yc_yq_airflow_etl_spark.operators.dedup import (
    dedup_cluster_assignments,
    simhash_dup_pairs,
)
from yc_yq_airflow_etl_spark.plans.llm_queries import (
    _PII_EMAIL,
    _PII_IP,
    _PII_PHONE,
)
from yc_yq_airflow_etl_spark.session import build_session
from yc_yq_airflow_etl_spark.sources.manifest import ManifestTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    workdir = (
        sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="compliance_")
    )

    spark = build_session(app_name="compliance-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_testdata(spark, sf_dir)["documents"]
    t0 = time.time()
    n_in = docs.count()

    # 1. near-dup clusters -> keep only each cluster's keeper
    pairs = simhash_dup_pairs(docs, max_hamming=8).select("id_a", "id_b")
    assign = dedup_cluster_assignments(docs, pairs)
    drop_dups = assign.filter(F.col("doc_id") != F.col("keeper_id")).select(
        "doc_id"
    )
    deduped = docs.join(drop_dups, "doc_id", "left_anti")
    n_dedup = deduped.count()

    # 2. benchmark decontamination: drop docs sharing a verbatim
    #    8-gram with the benchmark sample (doc_id % 97 == 0 stand-in)
    grams = docs.select("doc_id", F.explode(word_shingles("text", 8)).alias("g"))
    bench = F.broadcast(
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "g")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    n_clean = clean.count()

    # 3. PII redaction (JVM regex, all three patterns in one pass)
    redacted = clean.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("text", _PII_EMAIL, "[EMAIL]"),
                _PII_PHONE,
                "[PHONE]",
            ),
            _PII_IP,
            "[IP]",
        ),
    )

    # 4. snapshot-committed landing (conditional-create publish — the
    #    S3-safe putIfAbsent commit)
    table = ManifestTable(
        f"{workdir}/curated", publish_mode="conditional-create"
    )
    version = table.overwrite(redacted)
    wall = time.time() - t0

    print(f"curated corpus committed as v{version} at {table.path} in {wall:.1f}s")
    print(f"  input docs            {n_in:>10,}")
    print(f"  after near-dup keep   {n_dedup:>10,}")
    print(f"  after decontamination {n_clean:>10,}")
    print(f"  landed rows           {table.read(spark).count():>10,}")
    spark.stop()


if __name__ == "__main__":
    main()
