"""Synthetic fetch + parse + link expansion + admission filter chain.

The reference's fetch pipeline per TASK is: task_filters -> HTTP fetch
-> status_filters -> load_filters -> DocumentParser -> task_expanders
(reference workspace/main/src/rules.rs:56-101, crusty.rs:514-592). The
sandbox has no network, so "fetch" resolves the URL deterministically
to a row of the images (payload) table — ``url_hash -> image_idx`` is
an equi-join Spark executes as broadcast or shuffle join by size — and
"parse" decodes the image payload and derives outlinks as a pure
function of (url_hash, phash). All per-row compute runs in
``mapInPandas`` over Arrow batches with numpy kernels (no per-row
Python); the admission filters are JVM column predicates.

Filter chain parity map (reference file:line in parens):
- status filter: synthetic status from hash bits; only 200 proceeds
  (status_filters::ContentType/Redirect, rules.rs:79-86)
- robots gating: path-prefix match against the domain's disallow list
  via the higher-order F.exists — JVM-side, no UDF needed
  (task_filters::RobotsTxt, rules.rs:71-73,88-93)
- nofollow: rel='nofollow' links dropped (SkipNoFollowLinks,
  rules.rs:64-66)
- same-domain split: internal links continue the job, external hosts
  go to discovery (SameDomain rules.rs:63; discovery filter
  crusty.rs:250-274)
- depth cap 25 (PageLevel, rules.rs:69), links-per-page cap
  (LinkPerPageBudget, rules.rs:68) applied at expansion
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import phash64_batch, _to_gray_32  # noqa: F401  (gray used in tests)
from .fixtures import TLD_WHITELIST
from .hashing import xxh64_long_np

# ---------------------------------------------------------------------
# Synthetic status (what the network would have said)
# ---------------------------------------------------------------------


def status_of(url_hash):
    """Deterministic HTTP status from hash bits: ~94% 200, 4% 404, 2% 500.
    (Stand-in for status_filters, rules.rs:79-86.)"""
    r = F.pmod(F.shiftrightunsigned(url_hash, 17), F.lit(50))
    return (
        F.when(r == 0, F.lit(404)).when(r == 1, F.lit(500)).otherwise(F.lit(200))
    )


def py_status_of(url_hash: int) -> int:
    r = ((url_hash & ((1 << 64) - 1)) >> 17) % 50
    return 404 if r == 0 else 500 if r == 1 else 200


# ---------------------------------------------------------------------
# Deterministic link derivation (the "DocumentParser + task_expanders")
# ---------------------------------------------------------------------
#
# Link targets are a pure function of (url_hash, phash, domain): the
# decoded payload determines what the page "contains". The same numpy
# kernel drives the Spark UDF and (scalar-wise) the simulator, so
# crawl-ordering equality is exact by construction.

MAX_INTERNAL = 4  # internal outlinks per page: 0..3
MAX_EXTERNAL = 3  # external discovered domains per page: 0..2
EXT_UNIVERSE = 10_000  # external domain id space
INTERNAL_PATHS = 500  # internal page id space per domain


def derive_links_np(url_hash: np.ndarray, phash: np.ndarray) -> tuple[list[list[str]], list[list[str]]]:
    """-> (internal_paths per row, external_domains per row).

    internal paths look like "/p123"; some carry a "#nofollow" marker
    that the expansion stage turns into rel=nofollow (then drops, per
    SkipNoFollowLinks). external entries are bare domains
    "ext{n}.{tld}" routed to discovery.
    """
    uh = url_hash.astype(np.uint64)
    ph = phash.astype(np.uint64)
    mix0 = xxh64_long_np((uh ^ ph).view(np.int64), seed=101)
    n_int = (mix0 % np.uint64(MAX_INTERNAL)).astype(np.int64)
    n_ext = ((mix0 >> np.uint64(8)) % np.uint64(MAX_EXTERNAL)).astype(np.int64)

    # per-slot mixes, computed as a (rows, slots) matrix in one shot
    slots_i = [xxh64_long_np(uh.view(np.int64), seed=1000 + k) for k in range(MAX_INTERNAL)]
    slots_e = [xxh64_long_np(ph.view(np.int64), seed=2000 + k) for k in range(MAX_EXTERNAL)]

    internal: list[list[str]] = []
    external: list[list[str]] = []
    n_tld = len(TLD_WHITELIST)
    for i in range(len(uh)):
        ints = []
        for k in range(int(n_int[i])):
            m = int(slots_i[k][i])
            path = f"/p{m % INTERNAL_PATHS}"
            if (m >> 20) % 10 == 0:  # ~10% nofollow links
                path += "#nofollow"
            ints.append(path)
        exts = []
        for k in range(int(n_ext[i])):
            m = int(slots_e[k][i])
            exts.append(f"ext{m % EXT_UNIVERSE}.{TLD_WHITELIST[(m >> 32) % n_tld]}")
        internal.append(ints)
        external.append(exts)
    return internal, external


def py_derive_links(url_hash: int, phash: int) -> tuple[list[str], list[str]]:
    """Scalar twin for the simulator — delegates to the numpy kernel."""
    ints, exts = derive_links_np(
        np.array([url_hash], dtype=np.int64), np.array([phash], dtype=np.int64)
    )
    return ints[0], exts[0]


# ---------------------------------------------------------------------
# The fetch+parse stage as a DataFrame transform
# ---------------------------------------------------------------------

PARSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("domain", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("phash_ok", T.BooleanType(), True),
        T.StructField("read_size_b", T.LongType(), True),
        T.StructField("internal_paths", T.ArrayType(T.StringType()), True),
        T.StructField("external_domains", T.ArrayType(T.StringType()), True),
    ]
)


def fetch_and_parse(tasks: DataFrame, images: DataFrame, n_images: int) -> DataFrame:
    """tasks(url, url_hash, domain, depth, ...) -> PARSE_SCHEMA rows.

    The payload join is a plain equi-join on image_idx = pmod(url_hash,
    n_images); Catalyst broadcasts the images side when small, shuffles
    by key otherwise. Decode + phash-verify + link derivation run once
    per Arrow batch in numpy.
    """
    t = tasks.withColumn("status", status_of(F.col("url_hash"))).withColumn(
        "image_idx", F.pmod(F.col("url_hash"), F.lit(n_images))
    )
    im = images.withColumn(
        "image_idx", F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    ).select("image_idx", "image_id", "bytes", "fmt", "caption", F.col("phash").alias("phash_stored"))
    # only 200s fetch a payload; errors keep task metadata for metrics
    joined = t.join(im, "image_idx", "left")

    def parse(batches):
        from .codec import decode_image

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            phash = np.zeros(n, dtype=np.int64)
            phash_ok = np.zeros(n, dtype=bool)
            size = np.zeros(n, dtype=np.int64)
            ok200 = (pdf["status"] == 200).to_numpy()
            grays, idxs = [], []
            for i, (b, st) in enumerate(zip(pdf["bytes"], pdf["status"])):
                if st != 200 or b is None:
                    continue
                px, _ = decode_image(bytes(b))
                size[i] = len(b)
                grays.append(_to_gray_32(px))
                idxs.append(i)
            if idxs:
                hs = phash64_batch(np.stack(grays))
                phash[idxs] = hs
                phash_ok[idxs] = hs == pdf["phash_stored"].to_numpy(dtype=np.int64)[idxs]
            uh = pdf["url_hash"].to_numpy(dtype=np.int64)
            ints, exts = derive_links_np(uh, phash)
            out = pd.DataFrame(
                {
                    "url": pdf["url"],
                    "url_hash": pdf["url_hash"],
                    "domain": pdf["domain"],
                    "depth": pdf["depth"],
                    "status": pdf["status"],
                    "image_id": pdf["image_id"].where(ok200, None),
                    "caption": pdf["caption"].where(ok200, None),
                    "phash": phash,
                    "phash_ok": phash_ok,
                    "read_size_b": size,
                    "internal_paths": [i if o else [] for i, o in zip(ints, ok200)],
                    "external_domains": [e if o else [] for e, o in zip(exts, ok200)],
                }
            )
            yield out

    return joined.mapInPandas(parse, PARSE_SCHEMA)


# ---------------------------------------------------------------------
# Link expansion + admission filters (JVM column predicates)
# ---------------------------------------------------------------------


def expand_internal_links(
    parsed: DataFrame,
    links_per_page: int = 100,
    max_depth: int = 25,
) -> DataFrame:
    """parsed -> candidate same-domain task rows (url, depth).

    Order of gates mirrors rules.rs:56-93: per-page cap (F7) ->
    nofollow (F5) -> depth (F8). Robots disallow (F10/S6) is applied
    once at enqueue admission via robots_blocked_col.
    """
    links = (
        parsed.select(
            "domain",
            (F.col("depth") + 1).alias("link_depth"),
            F.posexplode("internal_paths").alias("pos", "path"),
        )
        .filter(F.col("pos") < links_per_page)
        .filter(~F.col("path").endswith("#nofollow"))
        .filter(F.col("link_depth") <= max_depth)
        .select("domain", "path", F.col("link_depth").alias("depth"))
    )
    return links.select(
        F.concat(F.lit("http://"), F.col("domain"), F.col("path")).alias("url"),
        "depth",
    )


def robots_blocked_col(tasks: DataFrame, robots: DataFrame) -> DataFrame:
    """Mark tasks whose URL path matches a robots disallow prefix
    (task_filters::RobotsTxt, rules.rs:71-73). JVM-side higher-order
    predicate; unknown domains are unblocked (no robots = allow)."""
    path = F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    return (
        tasks.join(F.broadcast(robots.select("domain", "disallow")), "domain", "left")
        .withColumn(
            "blocked",
            F.coalesce(
                F.exists("disallow", lambda d: path.startswith(d)), F.lit(False)
            ),
        )
        .drop("disallow")
    )


def discovery_candidates(parsed: DataFrame, tld_whitelist: DataFrame) -> DataFrame:
    """parsed -> external domain discovery stream, filtered per
    crusty.rs:250-274: len>=4, contains '.', != task domain, TLD in
    whitelist. Returns (domain) rows (deduped within batch — the LRU
    analog J7; the cross-epoch gate is the Bloom J1)."""
    ext = parsed.select(
        F.col("domain").alias("src_domain"), F.explode("external_domains").alias("domain")
    )
    filtered = (
        ext.filter(F.length("domain") >= 4)
        .filter(F.col("domain").contains("."))
        .filter(F.col("domain") != F.col("src_domain"))
        .withColumn("tld", F.upper(F.element_at(F.split(F.col("domain"), r"\."), -1)))
        .join(F.broadcast(tld_whitelist), "tld", "left_semi")
    )
    return filtered.select("domain").dropDuplicates(["domain"])
