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


@pytest.fixture(autouse=True)
def _spark_cache_hygiene(request):
    """Cached plans live in the CacheManager for the whole session
    (Python GC never uncaches) and every live entry taxes each later
    query's plan canonicalization; localCheckpoint blocks free only on
    a JVM GC. Tests cache images/frontier tables liberally, so without
    per-test cleanup the suite gets monotonically slower (measured:
    late-suite crawls several times slower than fresh). Caches here are
    performance-only — recompute after clearCache is always correct."""
    yield
    if "spark" in request.fixturenames:
        spark = request.getfixturevalue("spark")
        try:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        except Exception:
            pass  # session already stopped
