from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crab_spark.session import get_spark  # noqa: E402
from crab_spark.store import TableStore  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="crab_spark_tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_TEST_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(tmp_path / "warehouse", spark)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
