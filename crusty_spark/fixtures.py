"""Deterministic synthetic fixtures (seed=42, no wall clock, no network).

Shapes follow FIXTURES.md; semantics mirror the reference:

- ``images`` — the (image, caption) payload table from BASELINE.json's
  input_hint: (image_id, bytes, w, h, fmt, caption, phash).
- ``seeds`` — seed URL list (CRUSTY_SEEDS analog, reference
  workspace/main/src/config.rs:283-292).
- ``robots`` — per-domain disallow rules standing in for robots.txt
  fetch+cache (reference workspace/main/src/rules.rs:71-73,88-93).
- TLD whitelist — the full IANA root-zone list (data/tld.txt, public
  data, same vintage as the reference's tld.txt, crusty.rs:83-88).

Synthesis is numpy-vectorized; images are built in batches so the
generator itself scales (mapInPandas over spark.range for big scales).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import encode_image, phash64

SEED = 42

def _load_tld_whitelist() -> list[str]:
    """The full 1,498-entry IANA root-zone TLD list (public data,
    data.iana.org/TLD/tlds-alpha-by-domain.txt, version 2021062101 —
    the same vintage the reference embeds at crusty.rs:83-88 /
    workspace/main/tld.txt), so discovery-filter selectivity matches the
    reference. Falls back to a 20-entry subset if the data file is
    missing (e.g. a partial deployment)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "tld.txt")
    try:
        with open(path) as f:
            tlds = [ln.strip().lower() for ln in f if ln.strip() and not ln.startswith("#")]
        if tlds:
            return tlds
    except OSError:
        pass
    return [
        "com", "net", "org", "io", "dev", "app", "edu", "gov", "info", "biz",
        "co", "us", "uk", "de", "fr", "jp", "ru", "br", "in", "au",
    ]


TLD_WHITELIST = _load_tld_whitelist()

FMTS = ["png", "jpeg", "bmp"]
SIZES = [32, 64, 128]

_VOCAB = (
    "amber basalt cedar delta ember fjord galley harbor inlet juniper "
    "kestrel lagoon marble nectar orchid pylon quartz rivet shale tundra "
    "umber vellum willow xenon yarrow zephyr"
).split()

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def gen_image_row(i: int, sizes: list[int] | None = None) -> tuple:
    """Deterministic image row i (used by tests and the Spark generator).
    `sizes` narrows the (h, w) choices — the bench uses [64] so its
    payload stage stays compute-dense per byte (BASELINE.md)."""
    if sizes is None:
        sizes = SIZES
    rng = np.random.default_rng(SEED + i)
    h = sizes[int(rng.integers(len(sizes)))]
    w = sizes[int(rng.integers(len(sizes)))]
    fmt = FMTS[i % len(FMTS)]
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # phash is computed over the *decoded* pixels so the stored value is
    # exactly recomputable from bytes (lossy fmts quantize first).
    if fmt == "jpeg":
        from .codec import JPEG_Q_STEP as q

        dec = ((px.astype(np.int32) // q) * q + q // 2).clip(0, 255).astype(np.uint8)
    else:
        dec = px
    words = [_VOCAB[int(x)] for x in rng.integers(0, len(_VOCAB), size=5)]
    caption = f"caption {i}: " + " ".join(words)
    return (f"img-{i:012d}", encode_image(px, fmt), w, h, fmt, caption, phash64(dec))


def images_df(
    spark: SparkSession, n: int, partitions: int = 8, sizes: list[int] | None = None
) -> DataFrame:
    """Distributed deterministic image table: spark.range -> mapInPandas.
    Each partition synthesizes its own rows — no driver materialization,
    so the same generator works at any scale."""

    def gen(batches):
        for pdf in batches:
            rows = [gen_image_row(int(i), sizes) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=IMAGES_SCHEMA.fieldNames())

    return spark.range(0, n, 1, partitions).mapInPandas(gen, IMAGES_SCHEMA)


def seed_urls(n_domains: int = 50) -> list[str]:
    """Deterministic seed list incl. the reference's edge cases
    (www-prefix, uppercase host, path, a host-less URL that must be
    skipped — crusty.rs:498-507)."""
    rng = np.random.default_rng(SEED)
    urls = []
    for k in range(n_domains):
        tld = TLD_WHITELIST[int(rng.integers(len(TLD_WHITELIST)))]
        host = f"site{k}.{tld}"
        if k % 7 == 1:
            host = "www." + host
        if k % 11 == 3:
            host = host.upper()
        path = "/" if k % 3 else f"/start/{k}"
        urls.append(f"http://{host}{path}")
    urls.append("not-a-url")  # must be skipped
    return urls


def seeds_df(spark: SparkSession, n_domains: int = 50) -> DataFrame:
    return spark.createDataFrame([(u,) for u in seed_urls(n_domains)], ["url"])


ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_epochs", T.IntegerType(), False),
    ]
)


def robots_rules_for(domain: str) -> tuple[list[str], int]:
    """Deterministic per-domain robots policy: ~20% partial disallow,
    ~5% fully blocked, ~25% crawl-delay 1 (FIXTURES.md §6)."""
    from .hashing import xxh64

    h = xxh64(domain.encode("utf-8"), seed=7)
    r = h % 100
    if r < 5:
        dis = ["/"]
    elif r < 25:
        dis = ["/private", "/tmp"]
    else:
        dis = []
    delay = 1 if (h >> 8) % 4 == 0 else 0
    return dis, delay


def robots_df(spark: SparkSession, domains: list[str]) -> DataFrame:
    rows = [(d, *robots_rules_for(d)) for d in sorted(set(domains))]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def tld_whitelist_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(t.upper(),) for t in TLD_WHITELIST], ["tld"])
