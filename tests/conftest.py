import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REFERENCE_TESTDATA = "/root/reference/testdata"
DRIVER_TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def ref_testdata():
    return REFERENCE_TESTDATA


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(DRIVER_TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    from go_shapefile_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
