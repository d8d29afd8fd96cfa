import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running dev-scan tests (kept small in CI)")


@pytest.fixture(scope="session")
def spark():
    from jsonschema_spark.session import get_spark
    s = get_spark("jsonschema-spark-tests", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
