from __future__ import annotations

from pyspark.sql import functions as F

from crusty_spark.bloom import (
    bloom_filter_unseen,
    bloom_insert,
    bloom_params,
    bloom_probe,
    empty_bloom,
)


def _names(spark, items):
    return spark.createDataFrame([(s % 4, f"d{i}.com") for i, s in items], ["shard", "name"])


def test_bloom_params_sane():
    m, k = bloom_params(10_000_000, 0.001)
    assert 130_000_000 < m < 160_000_000
    assert 8 <= k <= 12


def test_no_false_negatives_and_fp_rate(spark):
    inserted = _names(spark, [(i, i) for i in range(2000)])
    bloom = bloom_insert(empty_bloom(spark), inserted, capacity=5000, err=0.001)
    bloom = bloom.cache()

    probed = bloom_probe(bloom, inserted).collect()
    assert all(r.seen for r in probed), "bloom must never false-negative"

    fresh = _names(spark, [(i, i) for i in range(10_000, 14_000)])
    fp = bloom_probe(bloom, fresh).filter("seen").count()
    assert fp / 4000 < 0.01  # err=0.001 with headroom


def test_insert_idempotent_and_counts(spark):
    names = _names(spark, [(i, i) for i in range(100)])
    b1 = bloom_insert(empty_bloom(spark), names, capacity=1000, err=0.01)
    n1 = {(r.shard, r.level): r.n_items for r in b1.collect()}
    b2 = bloom_insert(b1, names, capacity=1000, err=0.01)
    n2 = {(r.shard, r.level): r.n_items for r in b2.collect()}
    assert n1 == n2, "re-inserting the same keys must not grow n_items"
    assert sum(n1.values()) == 100


def test_scaling_opens_new_level(spark):
    names = spark.createDataFrame([(0, f"d{i}.com") for i in range(300)], ["shard", "name"])
    bloom = bloom_insert(empty_bloom(spark), names, capacity=100, err=0.01, expansion=2).cache()
    rows = sorted(bloom.collect(), key=lambda r: r.level)
    assert [r.level for r in rows] == [0, 1]  # 100 + 200 fits exactly
    assert [r.capacity for r in rows] == [100, 200]
    assert sum(r.n_items for r in rows) == 300
    # one more insert overflows into level 2 (capacity x2 again)
    more = spark.createDataFrame([(0, f"x{i}.com") for i in range(10)], ["shard", "name"])
    bloom2 = bloom_insert(bloom, more, capacity=100, err=0.01, expansion=2).cache()
    rows2 = sorted(bloom2.collect(), key=lambda r: r.level)
    assert [r.level for r in rows2] == [0, 1, 2]
    assert rows2[2].capacity == 400
    # everything still findable across levels
    assert all(r.seen for r in bloom_probe(bloom2, names.union(more)).collect())


def test_filter_unseen_anti_join(spark):
    seen = spark.createDataFrame([(0, "a.com"), (1, "b.com")], ["shard", "name"])
    bloom = bloom_insert(empty_bloom(spark), seen, capacity=100, err=0.001)
    incoming = spark.createDataFrame(
        [(0, "a.com", 1), (1, "b.com", 2), (0, "c.com", 3), (2, "d.com", 4)],
        ["shard", "domain", "x"],
    )
    out = bloom_filter_unseen(bloom, incoming, "domain").collect()
    assert sorted(r.domain for r in out) == ["c.com", "d.com"]
    assert {r.x for r in out} == {3, 4}
