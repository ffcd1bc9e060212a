"""Demo: the full cooling pipeline, end to end, against a generated
hot store — the reference's DAG walkthrough (README_en.md) as one
script.

Generates the reference's minute-grid payments (2 years), then runs
the pipeline year by year: load → reconcile → retire → advance
watermark; prints the federation verification counts after each run.

    python examples/run_cooling.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yc_yq_airflow_etl_spark.plans.cooling import CoolingPipeline
from yc_yq_airflow_etl_spark.plans.federation import federated_counts_by_year
from yc_yq_airflow_etl_spark.session import build_session
from yc_yq_airflow_etl_spark.sources.generator import generate_payments
from yc_yq_airflow_etl_spark.sources.lake import LakeTable
from yc_yq_airflow_etl_spark.sources.state import PipelineState


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cooling_")
    spark = build_session(app_name="cooling-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # hot store: 2020 (leap, 527040 rows) + 2021 (525600 rows)
    hot = generate_payments(spark, minutes=527040 + 525600)
    hot.cache().count()
    retired: list[int] = []

    pipe = CoolingPipeline(
        spark=spark,
        source=lambda: hot.filter(~F.year("payment_date").isin(retired)),
        lake=LakeTable(f"{workdir}/lake"),
        state=PipelineState(f"{workdir}/state.json"),
        initial_watermark="2020-01-01",
        retire=retired.append,
    )

    for _ in range(2):
        result = pipe.run_once()
        lo, hi = result["window"]
        print(
            f"run: window=[{lo:%Y-%m-%d}, {hi:%Y-%m-%d}) diff={result['diff']} "
            f"retired_year={result['retired_year']}"
        )
        remaining_hot = hot.filter(~F.year("payment_date").isin(retired))
        cold = pipe.lake.read(spark)
        print("federation verification:")
        federated_counts_by_year(remaining_hot, cold).show()

    print(f"workdir: {workdir}")
    spark.stop()


if __name__ == "__main__":
    main()
