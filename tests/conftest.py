import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    # SPARK_GRAFT_FULL_TESTS=1 clears pytest.ini's default
    # `-m "not slow"` filter so one env var runs the whole suite
    # (CI-style) without remembering the -m override syntax.
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") and config.option.markexpr == "not slow":
        config.option.markexpr = ""

from nypd_arrest_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir():
    return SF_DIR_ORACLE
