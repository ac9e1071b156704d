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
    """Deterministic HTTP status from hash bits: ~90% 200, 2% 404,
    2% 500, 4% 301 (redirect). (Stand-in for status_filters,
    rules.rs:79-86.)"""
    r = F.pmod(F.shiftrightunsigned(url_hash, 17), F.lit(50))
    return (
        F.when(r == 0, F.lit(404))
        .when(r == 1, F.lit(500))
        .when((r == 2) | (r == 3), F.lit(301))
        .otherwise(F.lit(200))
    )


def py_status_of(url_hash: int) -> int:
    r = ((url_hash & ((1 << 64) - 1)) >> 17) % 50
    if r == 0:
        return 404
    if r == 1:
        return 500
    if r in (2, 3):
        return 301
    return 200


# F9 redirect chain (status_filters::Redirect, rules.rs:79-86; hop
# budget `max_redirect: 5`, conf/default.yaml:196). The synthetic
# "Location" of a 301 is hash-derived: the next hop's url_hash is
# xxhash64(current hash) — deterministic, JVM-computable, and shared
# bit-for-bit with the simulator via hashing.xxh64_long.
MAX_REDIRECT = 5
STATUS_REDIRECT_EXCEEDED = 599  # chain longer than the budget: error


def status_of_np(uh: np.ndarray) -> np.ndarray:
    """Vectorized twin of status_of / py_status_of."""
    r = ((uh.astype(np.uint64) >> np.uint64(17)) % np.uint64(50)).astype(np.int64)
    st = np.full(uh.shape, 200, dtype=np.int64)
    st[r == 0] = 404
    st[r == 1] = 500
    st[(r == 2) | (r == 3)] = 301
    return st


def resolve_redirects_np(
    uh: np.ndarray, max_redirect: int = MAX_REDIRECT
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized <=max_redirect-hop chain -> (final_hash, status, hops).

    Runs inside the Arrow batch kernel rather than as unrolled column
    CASE expressions: a when-chain where hop k's expression embeds hop
    k-1's TWICE grows the Catalyst tree exponentially — 5 hops made
    plan optimization take minutes. Only ~4% of rows iterate past hop
    0, so the numpy loop is O(active) per hop. Bit-parity with Spark's
    xxhash64(bigint) via hashing.xxh64_long_np (unit-tested)."""
    cur = uh.astype(np.int64).copy()
    st = status_of_np(cur)
    hops = np.zeros(len(cur), dtype=np.int64)
    for _ in range(max_redirect):
        m = st == 301
        if not m.any():
            break
        cur[m] = xxh64_long_np(cur[m])
        st[m] = status_of_np(cur[m])
        hops[m] += 1
    st[st == 301] = STATUS_REDIRECT_EXCEEDED
    return cur, st, hops


def py_resolve_redirects(url_hash: int, max_redirect: int = MAX_REDIRECT) -> tuple[int, int, int]:
    """Scalar twin of resolve_redirects_np -> (final_hash, status, hops)."""
    from .hashing import _signed, xxh64_long

    cur, hops = url_hash, 0
    st = py_status_of(cur)
    while st == 301 and hops < max_redirect:
        cur = _signed(xxh64_long(cur))
        st = py_status_of(cur)
        hops += 1
    if st == 301:
        st = STATUS_REDIRECT_EXCEEDED
    return cur, st, hops


# F9 (second half) content-type admission (status_filters::ContentType /
# load_filters::ContentType, rules.rs:83-97): the reference admits only
# text/html|text/plain to its HTML parser; this engine's DocumentParser
# is an IMAGE parser, so the admitted family is image/*. ~4% of fetched
# documents synthesize a non-image type and are terminated after the
# read: the task is still consumed (counted, marked done) but yields no
# payload fields and no links.
CONTENT_TYPES = ("image/png", "text/html")  # [admitted, rejected]


def content_type_np(final_hash: np.ndarray) -> np.ndarray:
    """Vectorized synthetic Content-Type from hash bits: True = image/*
    (admitted)."""
    return ((final_hash.astype(np.uint64) >> np.uint64(33)) % np.uint64(25)) != 0


def py_content_ok(final_hash: int) -> bool:
    return ((final_hash & ((1 << 64) - 1)) >> 33) % 25 != 0


# ---------------------------------------------------------------------
# Fetch-phase timings/sizes + response caps
# ---------------------------------------------------------------------
#
# The reference bounds every fetch with `max_response_size: 2mib`,
# `status_timeout` and `load_timeout` (conf/default.yaml:201-211) and
# records the phase breakdown per task in metrics_task:
# write_size_b / wait_time_ms / status_time_ms / load_time_ms /
# parse_time_micro (infra/clickhouse/init.sql:43-52, types.rs:170-197).
# The sandbox has no network, so the phase quantities are deterministic
# hash draws — identical in the Arrow kernel and the simulator — and
# the caps terminate a task AFTER the read but BEFORE the parser: the
# task is consumed (counted, marked done) but yields no payload fields
# and no links, exactly like the content-type rejection above.
MAX_RESPONSE_SIZE = 2 * 1024 * 1024  # max_response_size: 2mib (default.yaml:201)
STATUS_TIMEOUT_MS = 390  # synthetic status wait ~U[0,400) -> ~2.5% trip
LOAD_TIMEOUT_MS = 780  # synthetic body load ~U[0,800) -> ~2.5% trip
OVERSIZE_EVERY = 50  # ~2% of successful responses exceed the size cap
STATUS_STATUS_TIMEOUT = 597  # no status line within status_timeout
STATUS_LOAD_TIMEOUT = 598  # body read exceeded load_timeout


def fetch_phase_np(fh: np.ndarray, uh: np.ndarray):
    """Vectorized synthetic fetch-phase draws from hash bits ->
    (status_time_ms, load_time_ms, oversize, wait_time_ms,
    write_size_b). Response-side quantities key on the REDIRECT-FOLLOWED
    hash (the response actually read); request-side (wait, TX bytes) on
    the original url_hash."""
    fu = fh.astype(np.uint64)
    uu = uh.astype(np.uint64)
    st_ms = ((fu >> np.uint64(23)) % np.uint64(400)).astype(np.int64)
    ld_ms = ((fu >> np.uint64(31)) % np.uint64(800)).astype(np.int64)
    oversz = ((fu >> np.uint64(41)) % np.uint64(OVERSIZE_EVERY)) == 0
    wait_ms = ((uu >> np.uint64(19)) % np.uint64(200)).astype(np.int64)
    write_b = (np.uint64(160) + (uu >> np.uint64(9)) % np.uint64(480)).astype(np.int64)
    return st_ms, ld_ms, oversz, wait_ms, write_b


def py_fetch_phase(final_hash: int, url_hash: int):
    """Scalar twin of fetch_phase_np (same tuple, same bit draws)."""
    m = (1 << 64) - 1
    fu, uu = final_hash & m, url_hash & m
    return (
        (fu >> 23) % 400,
        (fu >> 31) % 800,
        ((fu >> 41) % OVERSIZE_EVERY) == 0,
        (uu >> 19) % 200,
        160 + (uu >> 9) % 480,
    )


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
    """-> (internal hrefs per row, external_domains per row).

    Internal links are RAW hrefs the way a real parser sees them —
    root-relative "/p123", document-relative "p123", or dot-relative
    "./p123" (hash-chosen form) — and the expansion stage resolves them
    against the page's base URL with urls.canonicalize_series (F2: the
    canonicalizer runs in the crawl loop, parsers/lolhtml.rs:25-38).
    Some carry a "#nofollow" fragment marker that expansion treats as
    rel=nofollow (then drops, per SkipNoFollowLinks). External entries
    are bare domains "ext{n}.{tld}" routed to discovery.
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
            page = m % INTERNAL_PATHS
            form = (m >> 24) % 10
            if form < 6:
                path = f"/p{page}"
            elif form < 8:
                path = f"p{page}"
            else:
                path = f"./p{page}"
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
        T.StructField("final_url", T.StringType(), True),
        T.StructField("n_redirects", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("phash_ok", T.BooleanType(), True),
        T.StructField("read_size_b", T.LongType(), True),
        # fetch-phase breakdown + caps (init.sql:43-52, types.rs:170-197)
        T.StructField("write_size_b", T.LongType(), True),
        T.StructField("wait_time_ms", T.IntegerType(), True),
        T.StructField("status_time_ms", T.IntegerType(), True),
        T.StructField("load_time_ms", T.IntegerType(), True),
        T.StructField("parse_time_micro", T.LongType(), True),
        T.StructField("oversize", T.BooleanType(), False),
        T.StructField("internal_paths", T.ArrayType(T.StringType()), True),
        T.StructField("external_domains", T.ArrayType(T.StringType()), True),
    ]
)


def payload_store(images: DataFrame):
    """Collect a (small) payload table into a worker-side dict keyed by
    image_idx — the broadcast handle for ``fetch_and_parse``'s
    UDF-resident fetch mode.

    Why this exists: the join mode ships every task's payload bytes
    JVM->Arrow->Python (~3 KB/row — tens of GB per epoch at bench
    scale), which only measures one box's memory bus. A REAL fetch
    materializes the payload *inside* the fetcher (HTTP read happens in
    the worker), so the UDF-resident mode is both the faithful model
    and the one that scales: only small task columns cross Arrow. Use
    it whenever the synthetic payload universe fits a broadcast; use
    the join mode when the payload is a genuine table."""
    rows = images.select("image_id", "bytes", "fmt", "caption", "phash").collect()
    n = 1 + max(int(r.image_id.rsplit("-", 1)[-1]) for r in rows)
    ids = np.empty(n, dtype=object)
    captions = np.empty(n, dtype=object)
    phashes = np.zeros(n, dtype=np.int64)
    blobs: list[bytes | None] = [None] * n
    for r in rows:
        idx = int(r.image_id.rsplit("-", 1)[-1])
        ids[idx] = r.image_id
        captions[idx] = r.caption
        phashes[idx] = int(r.phash)
        blobs[idx] = bytes(r.bytes)
    store = {"image_id": ids, "bytes": blobs, "caption": captions, "phash": phashes}
    return images.sparkSession.sparkContext.broadcast(store)


def _parse_batches(batches, n_images: int, store_bc=None, max_redirect: int = MAX_REDIRECT):
    """Shared numpy kernel for both fetch modes. Each batch: follow the
    redirect chain (rules.rs:79-86), resolve payload (from the joined
    columns or the broadcast store), decode, batched gray+phash, derive
    links. Payload + links resolve against the REDIRECT-FOLLOWED hash —
    the document actually fetched."""
    from .codec import decode_image, to_gray_32_batch

    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        uh = pdf["url_hash"].to_numpy(dtype=np.int64)
        if "final_hash" in pdf.columns:  # join mode: chain already added
            fh = pdf["final_hash"].to_numpy(dtype=np.int64)
            status = pdf["status"].to_numpy(dtype=np.int64)
            hops = pdf["n_redirects"].to_numpy(dtype=np.int64)
        else:
            fh, status, hops = resolve_redirects_np(uh, max_redirect)
        # fetch-phase draws + caps (default.yaml:201-211): timeouts fire
        # only on fetches that would otherwise succeed (an error status
        # already ended the exchange); status timeout precedes the body
        # read, which precedes the size check
        st_ms, ld_ms, oversz, wait_ms, write_b = fetch_phase_np(fh, uh)
        status = np.where(
            (status == 200) & (st_ms >= STATUS_TIMEOUT_MS), STATUS_STATUS_TIMEOUT, status
        )
        status = np.where(
            (status == 200) & (ld_ms >= LOAD_TIMEOUT_MS), STATUS_LOAD_TIMEOUT, status
        )
        ok200 = status == 200
        # response declared > max_response_size: read capped, task
        # terminated before the parser (load_filters analog)
        oversize = ok200 & oversz
        # F9 content-type admission: only image/* reaches the parser
        ct_ok = content_type_np(fh)
        admit = ok200 & ct_ok & ~oversize
        if store_bc is not None:
            store = store_bc.value
            # pmod semantics, shared with the join mode (F.pmod on the
            # signed long) and the simulator (Python %): numpy int64 %
            # positive divisor is already non-negative. The previous
            # unsigned-u64 modulo only agreed when n_images was a power
            # of two — for any other n_images, negative final hashes
            # resolved to a different image than the join mode.
            idx_arr = np.mod(fh, np.int64(n_images))
            blob_list = store["bytes"]
            blobs = [blob_list[ix] if ok else None for ix, ok in zip(idx_arr, admit)]
            image_id = pd.Series(np.where(admit, store["image_id"][idx_arr], None))
            caption = pd.Series(np.where(admit, store["caption"][idx_arr], None))
            phash_stored = store["phash"][idx_arr]
        else:
            blobs = [
                bytes(b) if (ok and b is not None) else None
                for b, ok in zip(pdf["bytes"], admit)
            ]
            image_id = pdf["image_id"].where(admit, None)
            caption = pdf["caption"].where(admit, None)
            phash_stored = pdf["phash_stored"].to_numpy(dtype=np.int64)
        phash = np.zeros(n, dtype=np.int64)
        phash_ok = np.zeros(n, dtype=bool)
        size = np.zeros(n, dtype=np.int64)
        pxs, idxs = [], []
        for i, b in enumerate(blobs):
            if b is None:
                continue
            px, _ = decode_image(b)
            size[i] = len(b)
            pxs.append(px)
            idxs.append(i)
        if idxs:
            hs = phash64_batch(to_gray_32_batch(pxs))
            phash[idxs] = hs
            phash_ok[idxs] = hs == phash_stored[idxs]
        # oversize reads are capped at the limit, then terminated
        size[oversize] = MAX_RESPONSE_SIZE
        parse_us = np.where(
            admit,
            size * 3
            + ((fh.astype(np.uint64) >> np.uint64(11)) % np.uint64(500)).astype(np.int64),
            0,
        )
        ints, exts = derive_links_np(fh, phash)
        # final_url: synthesized Location of the last hop (same-domain
        # "/r{idx}" page); only ~4% of rows redirect, so the string
        # build loop touches few rows
        red_idx = np.nonzero(hops > 0)[0]
        if len(red_idx):
            fu = pdf["url"].to_numpy(dtype=object, copy=True)
            doms = pdf["domain"]
            for i in red_idx:
                fu[i] = f"http://{doms.iat[i]}/r{int(fh[i]) % INTERNAL_PATHS}"
            final_url = pd.Series(fu)
        else:
            final_url = pdf["url"]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "url_hash": pdf["url_hash"],
                "domain": pdf["domain"],
                "depth": pdf["depth"],
                "status": status.astype(np.int32),
                "final_url": final_url,
                "n_redirects": hops.astype(np.int32),
                "content_type": np.where(ct_ok, CONTENT_TYPES[0], CONTENT_TYPES[1]),
                "image_id": image_id,
                "caption": caption,
                "phash": phash,
                "phash_ok": phash_ok,
                "read_size_b": size,
                "write_size_b": write_b,
                "wait_time_ms": wait_ms.astype(np.int32),
                "status_time_ms": st_ms.astype(np.int32),
                "load_time_ms": ld_ms.astype(np.int32),
                "parse_time_micro": parse_us,
                "oversize": oversize,
                "internal_paths": [i if o else [] for i, o in zip(ints, admit)],
                "external_domains": [e if o else [] for e, o in zip(exts, admit)],
            }
        )


def _with_chain_cols(df: DataFrame, max_redirect: int) -> DataFrame:
    """Join-mode helper: append final_hash/status/n_redirects via one
    Arrow-batched pass so the payload equi-join can key on the
    redirect-followed hash."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("final_hash", T.LongType(), False),
            T.StructField("status", T.IntegerType(), False),
            T.StructField("n_redirects", T.IntegerType(), False),
        ]
    )

    def add(batches):
        for pdf in batches:
            uh = pdf["url_hash"].to_numpy(dtype=np.int64)
            fh, st, hops = resolve_redirects_np(uh, max_redirect)
            yield pdf.assign(
                final_hash=fh,
                status=st.astype(np.int32),
                n_redirects=hops.astype(np.int32),
            )

    return df.mapInPandas(add, schema)


def fetch_and_parse(
    tasks: DataFrame,
    images: DataFrame,
    n_images: int,
    store_bc=None,
    max_redirect: int = MAX_REDIRECT,
) -> DataFrame:
    """tasks(url, url_hash, domain, depth, ...) -> PARSE_SCHEMA rows.

    Two payload modes with identical results (tested):
    - ``store_bc`` given (see :func:`payload_store`): the UDF resolves
      payload bytes worker-side — the faithful model of a fetcher, and
      no payload bytes cross the JVM->Arrow boundary.
    - otherwise: plain equi-join on image_idx = pmod(url_hash,
      n_images); Catalyst broadcasts the images side when small,
      shuffles by key otherwise — for payload-as-a-table deployments.
    """
    if store_bc is not None:

        def parse_store(batches):
            yield from _parse_batches(batches, n_images, store_bc, max_redirect)

        return tasks.mapInPandas(parse_store, PARSE_SCHEMA)

    t = _with_chain_cols(tasks, max_redirect)
    t = t.withColumn("image_idx", F.pmod(F.col("final_hash"), F.lit(n_images)))
    im = images.withColumn(
        "image_idx", F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    ).select("image_idx", "image_id", "bytes", "fmt", "caption", F.col("phash").alias("phash_stored"))
    # only 200s fetch a payload; errors keep task metadata for metrics.
    # coalesce the stored hash JVM-side: a nullable long becomes float64
    # in pandas and silently corrupts int64 hash values beyond 2^53
    joined = t.join(im, "image_idx", "left").withColumn(
        "phash_stored", F.coalesce("phash_stored", F.lit(0))
    )

    def parse_joined(batches):
        yield from _parse_batches(batches, n_images, None, max_redirect)

    return joined.mapInPandas(parse_joined, PARSE_SCHEMA)


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
    nofollow (F5, on the RAW href's fragment marker, before the
    canonicalizer strips fragments) -> depth (F8) -> F2 canonicalize
    the raw href against the fetched page's base URL (the redirect-
    followed final_url) with the vectorized resolver. Robots disallow
    (F10/S6) is applied once at enqueue admission via
    robots_blocked_col.
    """
    from pyspark.sql.functions import pandas_udf

    from .urls import canonicalize_series

    @pandas_udf("string")
    def canon(href: pd.Series, base: pd.Series) -> pd.Series:
        return canonicalize_series(href, base)

    links = (
        parsed.select(
            F.coalesce("final_url", "url").alias("base"),
            (F.col("depth") + 1).alias("link_depth"),
            F.posexplode("internal_paths").alias("pos", "path"),
        )
        .filter(F.col("pos") < links_per_page)
        .filter(~F.col("path").endswith("#nofollow"))
        .filter(F.col("link_depth") <= max_depth)
    )
    return links.select(
        canon(F.col("path"), F.col("base")).alias("url"),
        F.col("link_depth").alias("depth"),
    )


def robots_blocked_col(tasks: DataFrame, robots: DataFrame) -> DataFrame:
    """Mark tasks whose URL path matches a robots disallow prefix
    (task_filters::RobotsTxt, rules.rs:71-73). JVM-side higher-order
    predicate; unknown domains are unblocked (no robots = allow).

    No broadcast hint: the robots cache grows with every discovered
    domain (the reference sizes it at 25M domains, conf/default.yaml:
    249-254) — a forced broadcast of that with disallow arrays OOMs the
    driver. AQE broadcasts while it is actually small and switches to a
    shard-partitioned shuffle join once it isn't; tests/test_plans.py
    pins the large-side behaviour."""
    path = F.coalesce(F.parse_url("url", F.lit("PATH")), F.lit("/"))
    path = F.when(path == "", "/").otherwise(path)
    return (
        tasks.join(robots.select("domain", "disallow"), "domain", "left")
        .withColumn(
            "blocked",
            F.coalesce(
                F.exists("disallow", lambda d: path.startswith(d)), F.lit(False)
            ),
        )
        .drop("disallow")
    )


def discovery_candidates(
    parsed: DataFrame, tld_whitelist: DataFrame, second_level_only: bool = False
) -> DataFrame:
    """parsed -> external domain discovery stream, filtered per
    crusty.rs:250-274: len>=4, contains '.', != task domain, TLD in
    whitelist. Returns (domain) rows (deduped within batch — the LRU
    analog J7; the cross-epoch gate is the Bloom J1).

    Linked names pass through JobState::transform_domain first
    (rules.rs:28-43): under ``second_level_only`` both the linked and
    the task domain collapse to SLDs before the self-link comparison,
    so e.g. blog.foo.com never re-discovers foo.com."""
    from .urls import transform_domain

    ext = parsed.select(
        transform_domain(F.col("domain"), second_level_only).alias("src_domain"),
        F.explode("external_domains").alias("linked"),
    ).select(
        "src_domain", transform_domain(F.col("linked"), second_level_only).alias("domain")
    )
    filtered = (
        ext.filter(F.length("domain") >= 4)
        .filter(F.col("domain").contains("."))
        .filter(F.col("domain") != F.col("src_domain"))
        .withColumn("tld", F.upper(F.element_at(F.split(F.col("domain"), r"\."), -1)))
        .join(F.broadcast(tld_whitelist), "tld", "left_semi")
    )
    return filtered.select("domain").dropDuplicates(["domain"])
