"""Demo: incremental ingest dedup — the production loop where a live
corpus admits daily batches without re-deduplicating itself.

Day 0 bootstraps the corpus with a full self-join near-dup pass
(minhash_lsh_pairs); each following "day" fingerprints ONLY its batch
(operators/dedup.incremental_minhash_dedup) and probes the corpus
index with one equi-join, admitting novel docs and reporting the
near-dups it blocked. Per-ingest cost is O(batch) hashing, never
O(corpus) — the property that keeps a 100 TB corpus's ingest path
flat as the corpus grows.

    python examples/run_incremental_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_lsh_pairs,
)
from yc_yq_airflow_etl_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="incremental-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_testdata(spark, sf_dir)["documents"]
    # day 0 = 70% bootstrap corpus; days 1-3 = rolling 10% ingests
    corpus = docs.filter(F.col("doc_id") % 10 < 7)
    t0 = time.time()
    boot_pairs = minhash_lsh_pairs(corpus)
    n_boot = boot_pairs.count()
    print(
        f"day 0 bootstrap: {corpus.count()} docs, {n_boot} near-dup pairs "
        f"(full self-join pass, {time.time() - t0:.2f}s)"
    )
    boot_pairs.unpersist()

    for day, bucket in enumerate((7, 8, 9), start=1):
        batch = docs.filter(F.col("doc_id") % 10 == bucket)
        t0 = time.time()
        links = incremental_minhash_dedup(corpus, batch)
        dup_ids = {r.new_id for r in links.select("new_id").collect()}
        n_batch = batch.count()
        print(
            f"day {day}: batch={n_batch} docs -> "
            f"{n_batch - len(dup_ids)} admitted, "
            f"{len(dup_ids)} blocked as near-dups of the corpus "
            f"({links.count()} links, {time.time() - t0:.2f}s, "
            f"O(batch) fingerprinting only)"
        )
        links.unpersist()
        admitted = batch.join(
            links.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        corpus = corpus.unionByName(admitted).localCheckpoint()

    print(f"final corpus: {corpus.count()} docs")
    spark.stop()


if __name__ == "__main__":
    main()
