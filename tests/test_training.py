"""Unit tests for the training-data operators that need adversarial
inputs the fixture tables don't contain (the happy paths are covered by
the DuckDB oracle gate in test_entry.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crusty_spark.training import dedup as D


def _identical_docs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact text repeated for every single document here").alias("text"),
    )


def test_minhash_bucket_cap_bounds_candidates(spark):
    """N identical docs land in ONE band bucket per band. Uncapped that
    is C(N,2) candidate pairs; with max_bucket=m the self-join must stay
    ~C(m,2)-bounded while still surfacing the duplicate cluster."""
    docs = _identical_docs(spark, 300)
    rows = D.minhash_lsh_pairs(docs, threshold=0.5, max_bucket=20).collect()
    # hash-sampling keeps ~20 of 300 docs; allow generous slack but
    # require a hard bound far below the quadratic 44,850
    assert 0 < len(rows) <= 1000
    # every surviving pair is a true duplicate (identical text)
    assert all(r.jaccard == 1.0 for r in rows)


def test_minhash_cap_noop_below_bound(spark, sf_dir):
    """On the real fixture (all buckets tiny) the cap must not change
    the result at all."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=10_000).collect()
    uncapped = D.minhash_lsh_pairs(docs, threshold=0.3, max_bucket=None).collect()
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))
