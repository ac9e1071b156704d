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


def test_phash_bucket_cap_bounds_candidates(spark):
    """300 identical phashes (e.g. flat images) share every band bucket.
    Uncapped that is C(300,2)=44,850 pairs; the cap must bound the
    candidate count while still surfacing the duplicate cluster."""
    imgs = spark.range(300).select(
        F.col("id").alias("image_id"), F.lit(0x0F0F0F0F).cast("long").alias("phash")
    )
    rows = D.phash_near_dup(imgs, max_hamming=3, max_bucket=20).collect()
    assert 0 < len(rows) <= 1000
    assert all(r.hamming == 0 for r in rows)


def test_phash_cap_noop_below_bound(spark):
    """Distinct hashes with planted 1-bit twins: cap on vs off must
    agree exactly when no bucket exceeds the cap."""
    base = F.xxhash64(F.col("id") % 50)
    ph = F.when(F.col("id") % 2 == 0, base).otherwise(
        base.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), 7))
    )
    imgs = spark.range(100).select(F.col("id").alias("image_id"), ph.alias("phash"))
    key = lambda r: (r.id_a, r.id_b, r.hamming)  # noqa: E731
    capped = sorted(map(key, D.phash_near_dup(imgs, max_bucket=10_000).collect()))
    uncapped = sorted(map(key, D.phash_near_dup(imgs, max_bucket=None).collect()))
    assert capped == uncapped and len(capped) > 0


def test_bucket_cap_bounds_collected_array(spark):
    """The thinning stage must bound the per-bucket collect_list (the
    grouped member array is the peak memory of the shared candidate
    skeleton): with 5,000 members in ONE bucket and cap 2,000, the kept
    set — and hence the generated pairs — stays ~cap-sized."""
    bands = spark.range(5000).select(
        F.struct(F.col("id").cast("long").alias("vec_id")).alias("m"),
        F.lit(0).alias("sig"),
    )
    n_pairs = D.banded_candidate_pairs(bands, ["sig"], "m", "vec_id", 2000).count()
    # kept ~ Binomial(5000, 1/keep_every=1/3): pairs ~ C(kept, 2)
    assert (0.5 * 2000) ** 2 / 2 <= n_pairs <= (1.6 * 2000) ** 2 / 2


def test_dedup_clusters_raises_when_not_converged(spark):
    """Min-label propagation advances one hop per round: a similarity
    chain longer than max_iter must raise, not silently return split
    clusters (the DuckDB recursive-CTE oracle would diverge)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dedup_clusters(chain, max_iter=3)
    got = {r.cluster_id for r in D.dedup_clusters(chain, max_iter=15).collect()}
    assert got == {0}
    # max_iter=0 is rejected up front (it could neither propagate nor
    # confirm convergence — previously a NameError in the raise path)
    with pytest.raises(ValueError, match="max_iter"):
        D.dedup_clusters(chain, max_iter=0)


def test_dedup_clusters_transitive_chain(spark):
    """A chain 1~2, 2~3, 3~4 (no direct 1~4 pair) must collapse into
    ONE cluster labeled by the min id — the transitivity the raw pair
    list doesn't give — and disjoint components stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (11, 12)],
        ["doc_a", "doc_b"],
    )
    got = {r.doc_id: r.cluster_id for r in D.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_embedding_bucket_cap_bounds_candidates(spark):
    """300 identical embeddings land in ONE sign bucket — the exact
    correlated-corpus pile-up; the cap must bound the within-bucket
    pair generation while keeping the duplicate cluster visible."""
    emb = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in (0.5, -0.25, 0.125, 1.0)]).alias("embedding"),
    )
    rows = D.embedding_near_dup(emb, threshold=0.95, sign_bits=4, max_bucket=20).collect()
    assert 0 < len(rows) <= 1000
    assert all(abs(r.cos - 1.0) < 1e-9 for r in rows)
