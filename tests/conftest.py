from __future__ import annotations

import os

import pytest

os.environ.setdefault("CRUSTY_SPARK_DRIVER_MEM", "6g")


@pytest.fixture(scope="session")
def spark():
    from crusty_spark.session import get_spark

    s = get_spark(app="crusty_spark_tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
