"""Demo: the training-corpus pipeline end to end over the synthetic
documents table — quality gates → MinHash near-dup removal →
context-window chunking → Hive-partitioned chunk corpus.

    python examples/run_corpus_pipeline.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yc_yq_airflow_etl_spark.catalog import load_testdata
from yc_yq_airflow_etl_spark.plans.corpus import build_training_corpus
from yc_yq_airflow_etl_spark.session import build_session
from yc_yq_airflow_etl_spark.sources.lake import LakeTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="corpus_")

    spark = build_session(app_name="corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_testdata(spark, sf_dir)["documents"]
    lake = LakeTable(f"{workdir}/corpus", partition_columns=("lang",))

    t0 = time.time()
    report = build_training_corpus(docs, lake)
    wall = time.time() - t0

    print(f"corpus landed at {lake.path} in {wall:.1f}s")
    for stage, n in report.items():
        print(f"  {stage:24s} {n:>10,}")
    spark.stop()


if __name__ == "__main__":
    main()
