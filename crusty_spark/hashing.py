"""64-bit hashing kernels, bit-compatible with Spark SQL's builtins.

The engine's canonical URL id is ``xxhash64(url)`` (Spark's
``F.xxhash64``, seed 42) and the shard function is
``crc32(addr_key) % shard_total`` — mirroring the reference's
crc32-of-addr_key sharding (reference: workspace/main/src/types.rs:51-53)
and its 64-bit URL hashing requirement (BASELINE.json input_hint).

This module provides the *driver/oracle-side* implementations used by
the pure-Python reference simulator and by numpy-vectorized UDFs; the
hot path in Spark jobs always uses the JVM builtins ``F.xxhash64`` /
``F.crc32``. Bit-equality between the two is asserted in
tests/test_hashing.py.

The XXH64 algorithm is public (Yann Collet, BSD); the string/long/int
one-shot variants below follow the same specialization Spark's
``org.apache.spark.sql.catalyst.expressions.XxHash64`` uses so that
multi-column hashes (hash chaining via the seed argument) also match.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42  # Spark's fixed seed for xxhash64/hash


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_HASH_SEED) -> int:
    """One-shot XXH64 over bytes. Returns unsigned 64-bit."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            for _ in range(1):
                k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
                v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
                v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
                v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
                v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 of a single 64-bit integer, matching Spark's hashLong path."""
    value &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((value * _P2) & _M64, 31) * _P1) & _M64
    h = ((_rotl(h, 27) * _P1) + _P4) & _M64
    return _fmix(h)


def xxh64_int(value: int, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 of a 32-bit integer, matching Spark's hashInt path."""
    value &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M64
    h ^= (value * _P1) & _M64
    h = ((_rotl(h, 23) * _P2) + _P3) & _M64
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64_str(s: str, seed: int = SPARK_HASH_SEED) -> int:
    """Signed result identical to Spark `F.xxhash64(lit(s))`."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_chain(values, seed: int = SPARK_HASH_SEED) -> int:
    """Multi-column xxhash64: Spark folds each column's hash into the
    next column's seed (HashExpression.eval). Supports str/int values;
    ints are hashed via the long specialization like Spark LongType."""
    h = seed
    for v in values:
        if isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, np.int32):
            # Spark IntegerType columns take the hashInt specialization
            h = xxh64_int(int(v), h)
        elif isinstance(v, (int, np.integer)):
            h = xxh64_long(int(v), h)
        else:
            raise TypeError(f"unsupported type for spark hash: {type(v)}")
    return _signed(h)


def crc32_str(s: str) -> int:
    """Unsigned crc32 of utf-8 bytes — equals Spark `F.crc32(cast binary)`
    and the reference's crc32 sharding input (types.rs:51-53)."""
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def shard_of(addr_key: str, shard_total: int) -> int:
    """shard = crc32(addr_key) % shard_total (types.rs:51-53)."""
    return crc32_str(addr_key) % shard_total


def xxh64_long_np(values: np.ndarray, seed: int = SPARK_HASH_SEED) -> np.ndarray:
    """Vectorized xxh64_long over an int64/uint64 array (wraparound
    uint64 arithmetic). Bit-equal to the scalar xxh64_long — used for
    deterministic link derivation in fetch UDF batches and mirrored by
    the pure-Python simulator."""
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        p1, p2, p4, p5 = (np.uint64(_P1), np.uint64(_P2), np.uint64(_P4), np.uint64(_P5))
        h = np.uint64((seed + _P5 + 8) & _M64)
        k = v * p2
        k = (k << np.uint64(31)) | (k >> np.uint64(33))
        h = h ^ (k * p1)
        h = ((h << np.uint64(27)) | (h >> np.uint64(37))) * p1 + p4
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
        return h


# --- numpy-vectorized double hashing for Bloom lanes -------------------
#
# Bloom probes need k independent hash lanes per key. We derive them by
# double hashing (Kirsch-Mitzenmacher): lane_i = h1 + i*h2 mod m, where
# h1 = xxhash64(name) and h2 = xxhash64(name, 1) are computed JVM-side
# (two F.xxhash64 columns) and the lane expansion happens in numpy.

def bloom_lanes(h1: np.ndarray, h2: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(n,) int64 arrays -> (k, n) uint64 bit positions."""
    h1u = h1.astype(np.uint64)
    h2u = h2.astype(np.uint64) | np.uint64(1)  # force odd so lanes cycle
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return (h1u[None, :] + ks * h2u[None, :]) % np.uint64(n_bits)
