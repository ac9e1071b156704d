"""Decayed per-TLD top-K heavy hitters.

Reproduces the reference's RedisBloom TOPK pipeline (reference
workspace/redis-calc/src/lib.rs:33-136; params k=100, decay=0.92 at
conf/default.yaml:172-178) as exact grouped aggregation + ranking —
exact is cheaper than a sketch under Spark because the (tld, domain)
key space per epoch is bounded and the agg is map-side combinable. A
"" TLD row mirrors the reference's global bucket
(redis-calc/src/lib.rs:42-45).

State: ``domain_hits(tld, domain, hits:double, epoch:int)`` — the
cumulative decayed counts. Each merge applies decay^(Δepoch) to the
prior state then adds the new epoch's counts (TOPK.INCRBY + decay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

HITS_SCHEMA = T.StructType(
    [
        T.StructField("tld", T.StringType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("hits", T.DoubleType(), False),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)


def empty_hits(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], HITS_SCHEMA)


def add_hits(
    state: DataFrame,
    new_counts: DataFrame,
    epoch: int,
    decay: float,
    k: int | None = None,
    headroom: int = 250,
    eps: float | None = 1e-9,
) -> DataFrame:
    """state + new (tld, domain, hits) counts for `epoch`, decaying the
    prior state by decay^(epoch - state.epoch). Also folds every count
    into the global "" bucket (redis-calc/src/lib.rs:42-45).

    State bound (the reference's analog is a FIXED-WIDTH sketch: k=100
    over width 25,000 slots, redis-calc/src/lib.rs:59-66 +
    conf/default.yaml:172-178 — rows can never exceed the width): when
    ``k`` is given, the merged state keeps only rank <= k*headroom per
    tld (and drops hits < eps), so `domain_hits` is bounded by
    n_tlds x k x headroom rows instead of growing with every domain the
    crawl ever discovered (reference plans for 25M+). The default
    headroom 250 mirrors the reference's width/k ratio.

    Approximation bound, like the sketch's: a pruned domain forfeits
    its accumulated decayed count, which was <= the rank-(k*headroom)
    hits at prune time; for the pruning to perturb the top-k list that
    domain must later out-accumulate the rank-k survivor from zero,
    i.e. the error per domain is bounded by hits_at_prune * decay^t —
    negligible for headroom >> 1 exactly as sketch eviction error is.
    The per-merge ranking window runs over the already-bounded state
    (<= k*headroom rows per tld partition), not the whole crawl."""
    with_global = new_counts.select("tld", "domain", "hits").unionByName(
        new_counts.select(F.lit("").alias("tld"), "domain", "hits")
    )
    fresh = with_global.groupBy("tld", "domain").agg(F.sum("hits").alias("hits"))
    decayed = state.select(
        "tld",
        "domain",
        (F.col("hits") * F.pow(F.lit(decay), F.lit(epoch) - F.col("epoch"))).alias("hits"),
    )
    merged = (
        decayed.unionByName(fresh)
        .groupBy("tld", "domain")
        .agg(F.sum("hits").alias("hits"))
        .withColumn("epoch", F.lit(epoch).cast("int"))
    )
    if eps is not None:
        merged = merged.filter(F.col("hits") >= eps)
    if k is not None:
        w = Window.partitionBy("tld").orderBy(F.desc("hits"), F.asc("domain"))
        merged = (
            merged.withColumn("prune_rk", F.row_number().over(w))
            .filter(F.col("prune_rk") <= k * headroom)
            .drop("prune_rk")
        )
    return merged


def topk(state: DataFrame, k: int = 100) -> DataFrame:
    """TOPK.LIST equivalent: rank per TLD, keep k (crusty's consume
    path, redis-calc/src/lib.rs:78-136). Deterministic tie-break on
    domain name."""
    w = Window.partitionBy("tld").orderBy(F.desc("hits"), F.asc("domain"))
    return (
        state.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("tld", "domain", "hits", "rank")
    )
