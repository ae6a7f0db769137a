import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pisa_spark.session import get_spark

    spark = get_spark(app_name="pisa-spark-tests", cores=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
