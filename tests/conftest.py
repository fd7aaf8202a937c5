import sys

sys.path.insert(0, "/root/repo")

import pytest


@pytest.fixture(scope="session")
def spark():
    from osm_spark.session import get_spark

    s = get_spark("osm-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
