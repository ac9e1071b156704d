from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crusty_spark.hashing import (
    bloom_lanes,
    crc32_str,
    spark_xxhash64_chain,
    spark_xxhash64_str,
)

SAMPLES = [
    "",
    "a",
    "abc",
    "http://example.com/",
    "x" * 31,
    "y" * 32,
    "z" * 100,
    "日本語teststring-with-→unicode",
    "http://www.sub.domain.io/path/to/page?q=1&r=2",
]


def test_xxhash64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    rows = df.select(
        "s",
        F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(1)).alias("h2"),
        F.xxhash64(F.lit(7).cast("long"), F.col("s")).alias("h3"),
        F.crc32(F.col("s").cast("binary")).alias("c"),
    ).collect()
    for r in rows:
        assert r.h1 == spark_xxhash64_str(r.s)
        assert r.h2 == spark_xxhash64_chain([r.s, np.int32(1)])
        assert r.h3 == spark_xxhash64_chain([7, r.s])
        assert r.c == crc32_str(r.s)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxhash64_stable(s):
    # pure determinism + signed-64 range
    h = spark_xxhash64_str(s)
    assert h == spark_xxhash64_str(s)
    assert -(2**63) <= h < 2**63


def test_bloom_lanes_shape_and_range():
    h1 = np.array([1, -5, 2**62], dtype=np.int64)
    h2 = np.array([7, 8, -9], dtype=np.int64)
    lanes = bloom_lanes(h1, h2, k=5, n_bits=1 << 20)
    assert lanes.shape == (5, 3)
    assert lanes.max() < (1 << 20)
    # distinct keys land on distinct lane patterns with overwhelming prob.
    assert len({tuple(lanes[:, i]) for i in range(3)}) == 3
