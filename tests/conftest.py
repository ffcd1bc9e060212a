from __future__ import annotations

import pytest

from yc_yq_airflow_etl_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pytest", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def testdata(spark):
    from yc_yq_airflow_etl_spark.catalog import load_testdata

    return load_testdata(spark, SF_DIR)
