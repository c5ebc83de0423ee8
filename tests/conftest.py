from __future__ import annotations

import os

import pytest

from hive_processor_spark import get_spark
from tools.check import duck_connect

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    return get_spark(shuffle_partitions=8)


@pytest.fixture(scope="session")
def duck():
    return duck_connect(SF_DIR)
