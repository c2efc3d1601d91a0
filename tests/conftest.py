import os
import sys

import pytest

# make `tests.golden` importable and keep Spark workers on this python
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from geographiclib_go_spark.session import build_session
    s = build_session(app="engine-tests", master="local[4]",
                      shuffle_partitions=8,
                      extra={"spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
