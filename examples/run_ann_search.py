"""Demo: the ANN index lifecycle over the synthetic embeddings table —
train integer-exact IVF centroids, materialize the index (cluster id
as a Hive partition column + stored hyperplane sketch), then serve
queries three ways and compare against the exact answer.

    python examples/run_ann_search.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk_indexed,
    lsh_topk_indexed,
    md5_bucket,
    train_ivf_centroids,
    write_ann_index,
)
from yc_yq_airflow_etl_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="ann_")

    spark = build_session(app_name="ann-search")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_testdata(spark, sf_dir)["embeddings"]
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first().embedding
    ]

    t0 = time.time()
    sample = emb.filter(md5_bucket(F.col("vec_id"), 4) == 0)
    cents = train_ivf_centroids(sample, k_clusters=8, iters=2)
    print(f"trained {len(cents)} centroids in {time.time() - t0:.2f}s")

    t0 = time.time()
    idx_path = f"{workdir}/ann_index"
    write_ann_index(emb, idx_path, cents)
    index = spark.read.parquet(idx_path)
    print(f"materialized index at {idx_path} in {time.time() - t0:.2f}s")

    for name, df in [
        ("exact (brute force)", brute_force_topk(emb, query, k=5)),
        ("ivf nprobe=3 (partition-pruned)",
         ivf_topk_indexed(index, query, cents, k=5, nprobe=3)),
        ("lsh hamming<=3 (stored sketch)",
         lsh_topk_indexed(index, query, k=5, max_hamming=3)),
    ]:
        t0 = time.time()
        rows = df.collect()
        hits = ", ".join(f"{r.vec_id}:{r.cosine:.4f}" for r in rows)
        print(f"{name:35s} [{time.time() - t0:.2f}s]  {hits}")

    print("\npruned IVF plan (note PartitionFilters on _c):")
    ivf_topk_indexed(index, query, cents, k=5, nprobe=3).explain()


if __name__ == "__main__":
    main()
