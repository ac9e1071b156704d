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


# --- vectorized link derivation (Arrow kernel twin of derive_links_np) -
#
# The link universe is tiny (500 internal pages x 3 href forms x
# {plain, #nofollow} = 3,000 strings; 10,000 external stems x the TLD
# list), so the per-row f-string formatting of derive_links_np is
# replaced by lookup-table gathers: compute integer indices with numpy,
# gather the strings with pyarrow take (all C-speed), and assemble the
# per-row lists as one Arrow ListArray from (offsets, flat values) —
# zero per-row Python. Equality with derive_links_np is unit-tested
# (tests/test_fetch_kernel.py).

# href form by (m >> 24) % 10: <6 root-relative, <8 doc-relative, else ./
_FCLASS = np.array([0, 0, 0, 0, 0, 0, 1, 1, 2, 2], dtype=np.int64)
_LINK_LUTS = None


def _link_luts():
    """(internal-path LUT, 'extN.' LUT, TLD LUT, '/rN' LUT) as pyarrow
    string arrays, built once per worker process."""
    global _LINK_LUTS
    if _LINK_LUTS is None:
        import pyarrow as pa

        paths = []
        for page in range(INTERNAL_PATHS):
            for form in (f"/p{page}", f"p{page}", f"./p{page}"):
                paths.append(form)
                paths.append(form + "#nofollow")
        _LINK_LUTS = (
            pa.array(paths, type=pa.string()),
            pa.array([f"ext{m}." for m in range(EXT_UNIVERSE)], type=pa.string()),
            pa.array(list(TLD_WHITELIST), type=pa.string()),
            pa.array([f"/r{i}" for i in range(INTERNAL_PATHS)], type=pa.string()),
        )
    return _LINK_LUTS


def derive_links_flat(fh: np.ndarray, ph: np.ndarray, admit: np.ndarray):
    """Vectorized derive_links_np restricted to admitted rows ->
    (offsets_int, values_int, offsets_ext, values_ext): int32 offset
    arrays (len n+1) plus flat pyarrow string values in row-major link
    order — the (offsets, values) pair of an Arrow ListArray. Rows with
    admit=False contribute zero links (the kernel emits [] for them,
    exactly like the pandas path did)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    int_lut, ext_num_lut, tld_lut, _ = _link_luts()
    uh = fh.astype(np.uint64)
    phu = ph.astype(np.uint64)
    mix0 = xxh64_long_np((uh ^ phu).view(np.int64), seed=101)
    n_int = np.where(admit, (mix0 % np.uint64(MAX_INTERNAL)).astype(np.int64), 0)
    n_ext = np.where(
        admit, ((mix0 >> np.uint64(8)) % np.uint64(MAX_EXTERNAL)).astype(np.int64), 0
    )

    mi = np.empty((len(uh), MAX_INTERNAL), dtype=np.uint64)
    for k in range(MAX_INTERNAL):
        mi[:, k] = xxh64_long_np(uh.view(np.int64), seed=1000 + k)
    valid_i = np.arange(MAX_INTERNAL, dtype=np.int64)[None, :] < n_int[:, None]
    mflat = mi[valid_i]  # row-major: row i's slots k=0..n_int[i]-1 in order
    page = (mflat % np.uint64(INTERNAL_PATHS)).astype(np.int64)
    fclass = _FCLASS[((mflat >> np.uint64(24)) % np.uint64(10)).astype(np.int64)]
    nofollow = (((mflat >> np.uint64(20)) % np.uint64(10)) == 0).astype(np.int64)
    values_int = pc.take(int_lut, pa.array(page * 6 + fclass * 2 + nofollow))
    offsets_int = np.concatenate(([0], np.cumsum(n_int))).astype(np.int32)

    me = np.empty((len(uh), MAX_EXTERNAL), dtype=np.uint64)
    for k in range(MAX_EXTERNAL):
        me[:, k] = xxh64_long_np(phu.view(np.int64), seed=2000 + k)
    valid_e = np.arange(MAX_EXTERNAL, dtype=np.int64)[None, :] < n_ext[:, None]
    eflat = me[valid_e]
    num = (eflat % np.uint64(EXT_UNIVERSE)).astype(np.int64)
    tld_idx = ((eflat >> np.uint64(32)) % np.uint64(len(TLD_WHITELIST))).astype(np.int64)
    values_ext = pc.binary_join_element_wise(
        pc.take(ext_num_lut, pa.array(num)), pc.take(tld_lut, pa.array(tld_idx)), ""
    )
    offsets_ext = np.concatenate(([0], np.cumsum(n_ext))).astype(np.int32)
    return offsets_int, values_int, offsets_ext, values_ext


# --- per-store decode cache --------------------------------------------
#
# The payload universe of the store mode is a fixed table: each distinct
# payload needs decoding ONCE per worker, not once per fetched row (the
# pandas kernel decoded ~every row: at bench scale that was ~12,000
# identical zlib+gray+phash pipelines per distinct image per epoch).
# The decoded digest (phash, byte size) attaches to the broadcast value
# dict, so its lifetime is exactly the broadcast's and reused across
# tasks by the worker's broadcast registry. phash64_batch is per-item
# deterministic (same contract phash_ok already relies on), so results
# are bit-identical to the per-row path.


def _store_decoded(store: dict) -> dict:
    dec = store.get("_decoded")
    if dec is None:
        import pyarrow as pa

        from .codec import decode_image, to_gray_32_batch

        blobs = store["bytes"]
        n_st = len(blobs)
        phash = np.zeros(n_st, dtype=np.int64)
        size = np.zeros(n_st, dtype=np.int64)
        present = np.zeros(n_st, dtype=bool)
        pxs, idxs = [], []
        for i, b in enumerate(blobs):
            if b is None:
                continue
            px, _ = decode_image(b)
            size[i] = len(b)
            pxs.append(px)
            idxs.append(i)
        if idxs:
            phash[idxs] = phash64_batch(to_gray_32_batch(pxs))
            present[idxs] = True
        dec = {
            "phash": phash,
            "size": size,
            "present": present,
            "phash_stored": np.asarray(store["phash"], dtype=np.int64),
            "ids_pa": pa.array(list(store["image_id"]), type=pa.string()),
            "caps_pa": pa.array(list(store["caption"]), type=pa.string()),
        }
        store["_decoded"] = dec
    return dec


_PARSE_SCHEMA_PA = None


def _parse_arrow_schema():
    global _PARSE_SCHEMA_PA
    if _PARSE_SCHEMA_PA is None:
        from pyspark.sql.pandas.types import to_arrow_schema

        _PARSE_SCHEMA_PA = to_arrow_schema(PARSE_SCHEMA)
    return _PARSE_SCHEMA_PA


def _parse_arrow(batches, n_images: int, store_bc=None, max_redirect: int = MAX_REDIRECT):
    """Arrow-native kernel for both fetch modes (operates on
    pyarrow.RecordBatch — url/domain strings pass through untouched, no
    pandas object columns). Each batch: follow the redirect chain
    (rules.rs:79-86), resolve payload (from the joined columns or the
    broadcast store's decode cache), derive links via LUT gathers.
    Payload + links resolve against the REDIRECT-FOLLOWED hash — the
    document actually fetched. Values are bit-identical to the previous
    pandas kernel (modes + simulator equality tests pin this)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .codec import decode_image, to_gray_32_batch

    schema = _parse_arrow_schema()
    t_int_paths = schema.field("internal_paths").type
    t_ext_doms = schema.field("external_domains").type

    for rb in batches:
        n = rb.num_rows
        if n == 0:
            continue
        names = rb.schema.names
        col = {nm: rb.column(i) for i, nm in enumerate(names)}
        uh = col["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        join_mode = "final_hash" in names
        if join_mode:  # chain already added by _with_chain_cols
            fh = col["final_hash"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            status = col["status"].to_numpy(zero_copy_only=False).astype(np.int64)
            hops = col["n_redirects"].to_numpy(zero_copy_only=False).astype(np.int64)
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
        phash = np.zeros(n, dtype=np.int64)
        phash_ok = np.zeros(n, dtype=bool)
        size = np.zeros(n, dtype=np.int64)
        if store_bc is not None:
            dec = _store_decoded(store_bc.value)
            # pmod semantics, shared with the join mode (F.pmod on the
            # signed long) and the simulator (Python %): numpy int64 %
            # positive divisor is already non-negative
            idx_arr = np.mod(fh, np.int64(n_images))
            decoded = admit & dec["present"][idx_arr]
            phash[decoded] = dec["phash"][idx_arr[decoded]]
            phash_ok[decoded] = (
                dec["phash"][idx_arr[decoded]] == dec["phash_stored"][idx_arr[decoded]]
            )
            size[decoded] = dec["size"][idx_arr[decoded]]
            take_idx = pa.array(idx_arr, mask=~admit)
            image_id = pc.take(dec["ids_pa"], take_idx)
            caption = pc.take(dec["caps_pa"], take_idx)
        else:
            bytes_col = col["bytes"]
            phash_stored = col["phash_stored"].to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            bvalid = admit & ~bytes_col.is_null().to_numpy(zero_copy_only=False)
            valid_idx = np.nonzero(bvalid)[0]
            if len(valid_idx):
                # decode each DISTINCT payload once (image_id is the
                # payload table's unique key), scatter to rows
                ids_valid = np.array(
                    pc.take(col["image_id"], pa.array(valid_idx)).to_pylist(), dtype=object
                )
                u_ids, first, inv = np.unique(
                    ids_valid, return_index=True, return_inverse=True
                )
                rep_blobs = pc.take(bytes_col, pa.array(valid_idx[first])).to_pylist()
                pxs = [decode_image(b)[0] for b in rep_blobs]
                ph_u = phash64_batch(to_gray_32_batch(pxs))
                size_u = np.array([len(b) for b in rep_blobs], dtype=np.int64)
                phash[valid_idx] = ph_u[inv]
                phash_ok[valid_idx] = ph_u[inv] == phash_stored[valid_idx]
                size[valid_idx] = size_u[inv]
            null_str = pa.scalar(None, pa.string())
            admit_pa = pa.array(admit)
            image_id = pc.if_else(admit_pa, col["image_id"], null_str)
            caption = pc.if_else(admit_pa, col["caption"], null_str)
        # oversize reads are capped at the limit, then terminated
        size[oversize] = MAX_RESPONSE_SIZE
        parse_us = np.where(
            admit,
            size * 3
            + ((fh.astype(np.uint64) >> np.uint64(11)) % np.uint64(500)).astype(np.int64),
            0,
        )
        off_i, val_i, off_e, val_e = derive_links_flat(fh, phash, admit)
        # final_url: synthesized Location of the last hop (same-domain
        # "/r{idx}" page), gathered from the '/rN' LUT and spliced over
        # the passthrough url array
        red_mask = hops > 0
        if red_mask.any():
            r_lut = _link_luts()[3]
            repl = pc.binary_join_element_wise(
                "http://",
                col["domain"],
                pc.take(r_lut, pa.array(np.mod(fh, np.int64(INTERNAL_PATHS)))),
                "",
            )
            final_url = pc.if_else(pa.array(red_mask), repl, col["url"])
        else:
            final_url = col["url"]
        arrays = [
            col["url"],
            col["url_hash"],
            col["domain"],
            col["depth"],
            pa.array(status.astype(np.int32)),
            final_url,
            pa.array(hops.astype(np.int32)),
            pc.if_else(pa.array(ct_ok), pa.scalar(CONTENT_TYPES[0]), pa.scalar(CONTENT_TYPES[1])),
            image_id,
            caption,
            pa.array(phash),
            pa.array(phash_ok),
            pa.array(size),
            pa.array(write_b),
            pa.array(wait_ms.astype(np.int32)),
            pa.array(st_ms.astype(np.int32)),
            pa.array(ld_ms.astype(np.int32)),
            pa.array(parse_us),
            pa.array(oversize),
            pa.ListArray.from_arrays(pa.array(off_i, type=pa.int32()), val_i).cast(t_int_paths),
            pa.ListArray.from_arrays(pa.array(off_e, type=pa.int32()), val_e).cast(t_ext_doms),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=schema)


def _with_chain_cols(df: DataFrame, max_redirect: int) -> DataFrame:
    """Join-mode helper: append final_hash/status/n_redirects via one
    Arrow-batched pass so the payload equi-join can key on the
    redirect-followed hash. Arrow-native: every input column passes
    through untouched."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("final_hash", T.LongType(), False),
            T.StructField("status", T.IntegerType(), False),
            T.StructField("n_redirects", T.IntegerType(), False),
        ]
    )

    def add(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            uh = (
                rb.column(rb.schema.get_field_index("url_hash"))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            fh, st, hops = resolve_redirects_np(uh, max_redirect)
            yield pa.RecordBatch.from_arrays(
                list(rb.columns)
                + [pa.array(fh), pa.array(st.astype(np.int32)), pa.array(hops.astype(np.int32))],
                names=list(rb.schema.names) + ["final_hash", "status", "n_redirects"],
            )

    return df.mapInArrow(add, schema)


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

    Only the columns the kernel reads are shipped across Arrow (an
    opaque map function defeats Catalyst's column pruning, so the
    projection is explicit — guide §4.1).
    """
    if store_bc is not None:

        def parse_store(batches):
            yield from _parse_arrow(batches, n_images, store_bc, max_redirect)

        return tasks.select("url", "url_hash", "domain", "depth").mapInArrow(
            parse_store, PARSE_SCHEMA
        )

    t = _with_chain_cols(tasks, max_redirect)
    t = t.withColumn("image_idx", F.pmod(F.col("final_hash"), F.lit(n_images)))
    im = images.withColumn(
        "image_idx", F.regexp_extract("image_id", r"(\d+)$", 1).cast("long")
    ).select("image_idx", "image_id", "bytes", "fmt", "caption", F.col("phash").alias("phash_stored"))
    # only 200s fetch a payload; errors keep task metadata for metrics.
    # coalesce the stored hash JVM-side: a nullable long becomes float64
    # in pandas and silently corrupts int64 hash values beyond 2^53
    joined = (
        t.join(im, "image_idx", "left")
        .withColumn("phash_stored", F.coalesce("phash_stored", F.lit(0)))
        .select(
            "url", "url_hash", "domain", "depth", "final_hash", "status",
            "n_redirects", "image_id", "bytes", "caption", "phash_stored",
        )
    )

    def parse_joined(batches):
        yield from _parse_arrow(batches, n_images, None, max_redirect)

    return joined.mapInArrow(parse_joined, PARSE_SCHEMA)


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
