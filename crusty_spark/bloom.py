"""Partitioned scaling Bloom filter — the URL/domain-seen set.

Mirrors the reference's ``in-history-{N}`` RedisBloom scaling filter
(reference workspace/redis-queue/src/lib.rs:17-19,187-194; options
capacity=10M, err=0.001, expansion x2 at conf/default.yaml:69-75), as
data instead of a service:

- state = a DataFrame ``seen_bloom(shard, level, bits, n_bits,
  n_hashes, n_items, capacity)`` — one bitset blob per (shard, level);
  levels implement the *scaling* part: when a level fills past its
  capacity, inserts open a new level with capacity x expansion, and
  probes check every level (exactly RedisBloom's SBF behavior).
- the two 64-bit hash lanes per key are computed JVM-side
  (``F.xxhash64(name)``, ``F.xxhash64(name, lit(1))``) and expanded to
  k Kirsch-Mitzenmacher lanes in numpy — whole Arrow batches, no
  per-row Python (north_rule).
- build = ``union(blobs, keys).groupBy(shard).applyInPandas`` (each
  shard's bitset is built/extended by one task → embarrassingly
  parallel, no shuffle beyond the shard hash).
- probe = ``keys.cogroup(blobs).applyInPandas`` — the blob crosses the
  wire once per shard, not once per row (a broadcast-join would
  duplicate the multi-MB bitset onto every row).

At 10^10-URL scale: 10M-capacity err-0.001 levels are ~18 MB each;
with 256 shards a full seen-set is a few GB of blobs total, read and
written only for shards touched in a micro-batch (partition pruning on
``shard``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import bloom_lanes

DEFAULT_CAPACITY = 10_000_000
DEFAULT_ERR = 0.001
DEFAULT_EXPANSION = 2

BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
        T.StructField("n_bits", T.LongType(), False),
        T.StructField("n_hashes", T.IntegerType(), False),
        T.StructField("n_items", T.LongType(), False),
        T.StructField("capacity", T.LongType(), False),
    ]
)


def bloom_params(capacity: int, err: float) -> tuple[int, int]:
    """(n_bits, n_hashes) for a target capacity/error rate."""
    m = math.ceil(-capacity * math.log(err) / (math.log(2) ** 2))
    m = (m + 7) // 8 * 8  # byte-align
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def empty_bloom(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], BLOOM_SCHEMA)


def _with_lanes(names: DataFrame, name_col: str) -> DataFrame:
    return names.select(
        F.col("shard"),
        F.col(name_col).alias("name"),
        F.xxhash64(name_col).alias("h1"),
        F.xxhash64(name_col, F.lit(1)).alias("h2"),
    )


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, n_bits: int) -> None:
    lanes = bloom_lanes(h1, h2, k, n_bits).ravel()
    np.bitwise_or.at(bits, (lanes >> np.uint64(3)).astype(np.int64), (np.uint8(1) << (lanes & np.uint64(7)).astype(np.uint8)))


def _test_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    lanes = bloom_lanes(h1, h2, k, n_bits)  # (k, n)
    byte_idx = (lanes >> np.uint64(3)).astype(np.int64)
    masks = (np.uint8(1) << (lanes & np.uint64(7)).astype(np.uint8))
    return ((bits[byte_idx] & masks) != 0).all(axis=0)


def bloom_insert(
    bloom: DataFrame,
    names: DataFrame,
    name_col: str = "name",
    capacity: int = DEFAULT_CAPACITY,
    err: float = DEFAULT_ERR,
    expansion: int = DEFAULT_EXPANSION,
) -> DataFrame:
    """Insert distinct (shard, name) keys; returns the new bloom state.

    Dedup before insert keeps n_items meaningful; the scaling decision
    (open level L+1 at capacity*expansion^L) happens inside the grouped
    UDF with only that shard's blobs in memory.
    """
    keyed = _with_lanes(names, name_col).dropDuplicates(["shard", "name"])
    # h1/h2 must stay non-null: a nullable int64 column converts to
    # float64 in pandas and silently rounds 64-bit hashes.
    blobs = bloom.select(
        "shard", "level", "bits", "n_bits", "n_hashes", "n_items", "capacity",
        F.lit(0).cast("long").alias("h1"),
        F.lit(0).cast("long").alias("h2"),
    )
    keys = keyed.select(
        "shard",
        F.lit(-1).cast("int").alias("level"),
        F.lit(None).cast("binary").alias("bits"),
        F.lit(0).cast("long").alias("n_bits"),
        F.lit(0).cast("int").alias("n_hashes"),
        F.lit(0).cast("long").alias("n_items"),
        F.lit(0).cast("long").alias("capacity"),
        "h1",
        "h2",
    )
    base_cap, base_err = capacity, err

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        blobs_pdf = pdf[pdf["level"] >= 0]
        keys_pdf = pdf[pdf["level"] < 0]
        levels: dict[int, dict] = {}
        for _, r in blobs_pdf.iterrows():
            levels[int(r["level"])] = {
                "bits": np.frombuffer(bytes(r["bits"]), dtype=np.uint8).copy(),
                "n_bits": int(r["n_bits"]),
                "n_hashes": int(r["n_hashes"]),
                "n_items": int(r["n_items"]),
                "capacity": int(r["capacity"]),
            }
        if not levels:
            m, k = bloom_params(base_cap, base_err)
            levels[0] = {
                "bits": np.zeros(m // 8, dtype=np.uint8),
                "n_bits": m, "n_hashes": k, "n_items": 0, "capacity": base_cap,
            }
        h1 = keys_pdf["h1"].to_numpy(dtype=np.int64)
        h2 = keys_pdf["h2"].to_numpy(dtype=np.int64)
        # skip keys already present at any level (idempotent insert)
        present = np.zeros(len(h1), dtype=bool)
        for lv in sorted(levels):
            st = levels[lv]
            if len(h1):
                present |= _test_bits(st["bits"], h1, h2, st["n_hashes"], st["n_bits"])
        h1, h2 = h1[~present], h2[~present]
        i = 0
        while i < len(h1):
            top = max(levels)
            st = levels[top]
            room = st["capacity"] - st["n_items"]
            if room <= 0:
                new_cap = st["capacity"] * expansion
                m, k = bloom_params(new_cap, base_err)
                levels[top + 1] = {
                    "bits": np.zeros(m // 8, dtype=np.uint8),
                    "n_bits": m, "n_hashes": k, "n_items": 0, "capacity": new_cap,
                }
                continue
            take = min(room, len(h1) - i)
            _set_bits(st["bits"], h1[i : i + take], h2[i : i + take], st["n_hashes"], st["n_bits"])
            st["n_items"] += take
            i += take
        out = [
            (shard, lv, st["bits"].tobytes(), st["n_bits"], st["n_hashes"], st["n_items"], st["capacity"])
            for lv, st in sorted(levels.items())
        ]
        return pd.DataFrame(out, columns=BLOOM_SCHEMA.fieldNames())

    return blobs.unionByName(keys).groupBy("shard").applyInPandas(build, BLOOM_SCHEMA)


PROBE_SCHEMA_SUFFIX = T.StructField("seen", T.BooleanType(), False)


def bloom_probe(bloom: DataFrame, names: DataFrame, name_col: str = "name") -> DataFrame:
    """(shard, name) -> (shard, name, seen). Cogrouped so each shard's
    blobs deserialize once per task, not per row."""
    keyed = _with_lanes(names, name_col)

    out_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType(), False),
            T.StructField("name", T.StringType(), False),
            PROBE_SCHEMA_SUFFIX,
        ]
    )

    def probe(keys_pdf: pd.DataFrame, blobs_pdf: pd.DataFrame) -> pd.DataFrame:
        if keys_pdf.empty:
            return pd.DataFrame(columns=["shard", "name", "seen"])
        h1 = keys_pdf["h1"].to_numpy(dtype=np.int64)
        h2 = keys_pdf["h2"].to_numpy(dtype=np.int64)
        seen = np.zeros(len(keys_pdf), dtype=bool)
        for _, r in blobs_pdf.iterrows():
            bits = np.frombuffer(bytes(r["bits"]), dtype=np.uint8)
            seen |= _test_bits(bits, h1, h2, int(r["n_hashes"]), int(r["n_bits"]))
        return pd.DataFrame({"shard": keys_pdf["shard"], "name": keys_pdf["name"], "seen": seen})

    return (
        keyed.groupBy("shard")
        .cogroup(bloom.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )


def bloom_filter_unseen(bloom: DataFrame, df: DataFrame, name_col: str) -> DataFrame:
    """LEFT ANTI the df against the bloom: keep rows whose name is not
    (probabilistically) in the seen set — the J1 gate of the reference's
    enqueue (redis-queue/src/lib.rs:65-76)."""
    probed = bloom_probe(bloom, df.select("shard", F.col(name_col)), name_col=name_col)
    unseen = probed.filter(~F.col("seen")).select("shard", F.col("name").alias(name_col))
    return df.join(unseen, ["shard", name_col], "left_semi")
